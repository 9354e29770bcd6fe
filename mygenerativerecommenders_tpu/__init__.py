"""mygenerativerecommenders_tpu — a TPU-native generative-recommender framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
yinleung/MyGenerativeRecommenders (a PyTorch-Lightning HSTU stack):

- HSTU / SASRec sequential encoders over fixed-shape masked batches
  (the TPU-native replacement for the reference's jagged fbgemm tensors).
- Retrieval (sampled-softmax + MIPS top-k eval) and Ranking task heads.
- A jit-compiled training loop (replaces lightning.Trainer) with AdamW /
  Muon / Scion optimizers expressed as optax transformations.
- SPMD scaling via jax.sharding.Mesh: data-parallel batches, row-sharded
  embedding tables with shard_map all-to-all lookup.
- Pallas TPU kernels for the hot ops (HSTU attention).

Layer map (mirrors SURVEY.md L1-L6, rebuilt TPU-first):
  data/      — ETL + host-side batch loader (L1)
  ops/       — sequence ops + Pallas kernels (L2)
  models/    — pluggable component families (L3)
  train/     — jit train/eval driver, optimizers, checkpoints (L4)
  configs/   — dataclass config tree + presets + CLI overrides (L5)
  cli/       — train/eval/predict/prepare_data entry points (L6)
"""

__version__ = "0.1.0"
