"""``python -m smore_tpu <model> ...`` -- see smore_tpu/cli/main.py."""

import sys

from smore_tpu.cli.main import main

sys.exit(main())
