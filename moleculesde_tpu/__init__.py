"""MoleculeSDE-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for group-symmetric
SDE-based molecule multi-modal pretraining.

Re-designed from scratch with the capabilities of chao1224/MoleculeSDE
(ICML 2023), built TPU-first:

- Fixed-shape, size-bucketed padded graph batches (``core.batch.GraphBatch``)
  replace PyG's ragged concatenated-graph layout so every training / sampling
  step is a single statically-shaped XLA program.
- One broadcasting-agnostic SDE library (``sde``) replaces the reference's
  duplicated sparse/dense SDE files (reference: Geom3D/models/MoleculeSDE/
  SDE_sparse.py + SDE_dense.py).
- Encoders (GIN / SchNet / PaiNN), score networks (2D->3D equivariant,
  3D->2D dense) and contrastive heads are Flax modules over padded batches.
- Reverse-SDE predictor-corrector samplers run under ``lax.scan``.
- Data parallelism is a ``jax.sharding.Mesh`` + ``jax.jit`` with sharded
  batches (``parallel.mesh``), scalable to multi-chip/multi-host over ICI.
"""

__version__ = "0.1.0"

from moleculesde_tpu.core.batch import GraphBatch  # noqa: F401
