"""TwoTowerMLRetrieval-TPU: a TPU-native two-tower retrieval framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
jpe17/TwoTowerMLRetrieval reference (PyTorch, single-device):

- word-level tokenizer + GloVe embedding table   (ref: backend/tokenizer.py)
- MS MARCO triplet data pipeline                 (ref: backend/data_loader.py)
- dual GRU/LSTM/RNN (and transformer) towers     (ref: backend/model.py)
- triplet + in-batch contrastive training, pjit  (ref: backend/main.py)
- evaluators: batch / corpus / test protocols    (ref: backend/evaluators.py)
- device-side brute-force top-k retrieval        (replaces ChromaDB)
- hybrid dense+TF-IDF serving                    (ref: frontend/main.py)

The compute path is pure JAX (jit/pjit/shard_map + Pallas kernels); the
data/runtime path is host Python + optional C bits. Nothing is a port:
all modules are designed TPU-first (static shapes, masked scans, MXU-sized
matmuls, mesh sharding with XLA collectives).
"""

__version__ = "0.1.0"

from twotowermlretrieval_tpu.config import Config  # noqa: F401
