"""smore-tpu: a TPU-native graph-embedding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SMORe
(RainBoltz/smore): sampling-based weighted-graph embedding with pluggable
samplers, walk/pair mappers, and SGD loss kernels over shared embedding
tables.

Architecture (vs. the reference's single-node hogwild CPU engine):

- Graph storage and loaders are host-side (numpy CSR + C++ native parsing).
- Alias tables are built once on host, then live on-device; every draw
  (source, per-vertex context, negative, walk step) is a batched gather
  inside the jitted training step -- there is no per-sample host loop.
- All ~25 reference SGD kernels (``proNet::Opt_*`` / ``Update*``,
  /root/reference/src/proNet.cpp:991-3371) collapse into fused
  gather->dot->loss-grad->scatter-add steps parameterized by loss.
- Multi-device scaling uses ``jax.sharding`` meshes (data-parallel sampling
  with replicated or row-sharded tables) instead of OpenMP threads.
"""

__version__ = "0.1.0"

from smore_tpu.graph.graph import Graph  # noqa: F401
