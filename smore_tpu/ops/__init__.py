from smore_tpu.ops import community, update  # noqa: F401
