"""tpukaldi — a TPU-native hybrid DNN/HMM speech-recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
mravanelli/pytorch-kaldi (reference mounted read-only at /root/reference):
Kaldi ark/scp data plane, INI+proto config system, a model-composition DSL
compiled to jitted pure functions, an MLP/CNN/RNN/LSTM/GRU/Li-GRU/SincNet/
quaternion model zoo with recurrent cells as fused scans, chunked
train/valid/forward scheduling with ledger-based crash recovery, and a
posterior-ark forward stage that feeds the (delegated) Kaldi WFST decoder.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  tools/    experiment driver CLI                (reference: run_exp.py)
  config/   INI + proto schema + DSL parse       (reference: utils.py config part)
  plan/     chunk planner + ledger               (reference: utils.py create_*)
  data/     host pipeline -> device batches      (reference: data_io.py chunk load)
  graph/    DSL -> jitted pure function          (reference: utils.py forward_model)
  models/   model zoo (functional JAX)           (reference: neural_networks.py)
  kernels/  Pallas fused recurrent scans         (new; perf core)
  train/    chunk runtime, optax, checkpoints    (reference: core.py run_nn)
  forward/  posterior ark emission               (reference: core.py forward mode)
  decode/   Kaldi latgen bridge + WER harvest    (reference: kaldi_decoding_scripts)
  dist/     mesh / sharding / collectives        (reference: DataParallel)
  io/       kaldi ark/scp codecs + feature ops   (reference: data_io.py kaldi-io part)
"""

__version__ = "0.1.0"
