"""Checkpoint / resume.

The reference's only persistence is the final text dump + warm start
(SURVEY.md 5.4; proNet::LoadPreTrain, /root/reference/src/proNet.cpp:
238-286 -- covered by smore_tpu/io/embeddings.py). For production
training this module adds native checkpoints of the FULL training state
(embedding tables, optimizer state, PRNG key, progress counter) via
orbax, so a run can resume mid-train after preemption.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Dict[str, Any],
                    step: int = 0, extra: Optional[dict] = None) -> None:
    """Write a native checkpoint. ``state`` is any pytree of arrays."""
    payload = {
        "state": state,
        "step": np.int64(step),
    }
    if extra:
        payload["extra"] = extra
    path = os.path.abspath(path)
    _checkpointer().save(path, payload, force=True)


def load_checkpoint(path: str):
    """Returns (state, step, extra)."""
    payload = _checkpointer().restore(os.path.abspath(path))
    return (
        jax.tree.map(lambda x: x, payload["state"]),
        int(payload.get("step", 0)),
        payload.get("extra"),
    )


def checkpoint_exists(path: str) -> bool:
    """True when ``path`` holds a restorable checkpoint (orbax writes a
    directory; an empty/missing dir means no checkpoint)."""
    path = os.path.abspath(path)
    return os.path.isdir(path) and bool(os.listdir(path))
