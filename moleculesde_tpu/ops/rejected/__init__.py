"""Quarantined non-production kernels — measured-and-rejected or superseded.

Nothing in this package is on a default code path.  Each module is kept as a
lab notebook: real, tested code with the A/B measurement that rejected it, so
a future hardware generation (or XLA release) can re-run the comparison
without re-deriving the kernel.  Production namespaces (`moleculesde_tpu.ops`
top level) contain only default-on or opt-in-viable kernels.

Contents and their losing numbers (TPU v5e-1, batch 256, n_max 32):

- ``attn_bank``: fused Pallas attention-map bank for the 3D->2D edge layers.
  1.3x faster in-kernel, but boundary relayouts cost -3.6 ms/step end-to-end
  vs the stacked XLA einsum bank.  Opt-in via ``attn_impl="pallas"``.
- ``attn_qk_bank``: fully-fused q/k MLP + tanh attention bank.  Serializes
  64 small dots that XLA runs as one big batched einsum; -4.0 ms/step.
  Opt-in via ``attn_impl="fused"``.
- ``frames_edgelist``: edge-list (PyG-style) per-edge frame construction,
  the direct analogue of the reference's ``coord2basis``
  (SDE_model_2D_to_3D.py:35-47).  Superseded by the dense masked-pair
  formulation (``models.score_2d3d.dense_frames``) which avoids gather /
  scatter entirely; retained as the readable spec + property-test oracle.

Lesson recorded from the two attention rejections: on TPU, one big batched
einsum beats VMEM residency whenever fusing would split a large contraction
into many small ones.
"""
