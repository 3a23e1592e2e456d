"""DiffDock-Pocket-TPU: a TPU-native (JAX/XLA/Pallas) framework for pocket-level
molecular docking with flexible protein side chains.

This is a from-scratch rebuild of the capabilities of plainerman/DiffDock-Pocket
(score-based generative docking over R^3 x SO(3) x T^m x T^k manifolds with an
SE(3)-equivariant tensor-product GNN), re-designed TPU-first:

- static shapes everywhere (padded ``ComplexGraph`` pytrees, bucketed),
- the full reverse diffusion loop jitted on device (``lax.scan``),
- dense pair-block message passing instead of dynamic radius graphs,
- SO(3)/torus diffusion tables resident in HBM (no host round trips),
- data parallelism via ``jax.sharding.Mesh`` + ``shard_map`` over ICI.

Reference layout citations in docstrings point into /root/reference (the
original PyTorch implementation) and are included for parity auditing only;
no code is shared.
"""

__version__ = "0.1.0"
