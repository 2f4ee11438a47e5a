"""zero_tpu: a TPU-native neural machine translation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of bzhangGo/zero
(TF1 research NMT toolkit): Transformer model zoo, deep RNN seq2seq,
on-device static-shape beam search, token-bucketed data pipeline,
data-parallel + tensor-parallel training over `jax.sharding.Mesh`,
LR schedule zoo, EMA, best-k checkpointing, BLEU-driven training control.

Layer map (mirrors SURVEY.md §1 of the reference):
  config.py / vocab.py           L6 config & vocabulary
  data.py / pipeline.py          Lx host data pipeline
  dtypes.py                      L0 precision policy
  ops/                           L1 tensor-op library (+ Pallas kernels)
  rnns/                          L1 RNN cell zoo + scan drivers
  models/                        L2 model zoo (registry by name)
  search.py                      L3 decoding engine
  parallel/ optimizers.py lrs.py L4 parallel execution & optimization
  train.py evalu.py              L5 drivers
  run.py                         L6 CLI
"""

__version__ = "0.1.0"
