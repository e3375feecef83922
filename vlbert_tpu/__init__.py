"""vlbert_tpu — a TPU-native (JAX/XLA/Pallas/pjit) visual-linguistic BERT framework.

Re-designed from scratch with the capabilities of jackroos/VL-BERT (the
reference implementation lives outside this tree and is cited per-file as
`ref: <path>:<lines>` in docstrings). The compute path is JAX/XLA with Pallas
TPU kernels for the hot ops (ROIAlign, fused attention); parallelism is
expressed through `jax.sharding.Mesh` + jit sharding annotations instead of
NCCL/DDP; shapes are static everywhere so XLA can tile onto the MXU.

Top-level layout:
  models/    — Flax modules: BERT encoder, VisualLinguisticBert, ResNet, FastRCNN, task heads
  ops/       — Pallas/XLA kernels: roi_align, fused attention, coordinate embeddings
  parallel/  — mesh construction, sharding rules, distributed init
  training/  — train step, optimizers/schedules, metrics, callbacks, checkpointing
  data/      — tokenizer, transforms, collation, datasets, host loader
  utils/     — config system, logging, bbox/mask helpers
"""

__version__ = "0.1.0"
