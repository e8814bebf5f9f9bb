from smore_tpu.ops import update  # noqa: F401
