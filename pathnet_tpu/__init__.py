"""pathnet_tpu — a TPU-native path-aggregation GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of PathNet
("Beyond Homophily: Structure-aware Path Aggregation Graph Neural Network",
IJCAI 2022; reference implementation surveyed in SURVEY.md):

- ``pathnet_tpu.data``     — graph containers, file-format interop, splits,
  dataset registry, synthetic stand-ins.
- ``pathnet_tpu.merw``     — maximal-entropy random-walk (MERW) transition
  probabilities via on-device power iteration (reference:
  preprocess/compute_merw.py).
- ``pathnet_tpu.sample``   — on-device path sampling: alias tables, walk
  kernels, truncated-BFS hop distances (reference: preprocess/gen_merw.cpp,
  gen_epoch_merw.cpp — offline C++ text pipelines become in-HBM tensors
  regenerated per epoch under a folded PRNG key).
- ``pathnet_tpu.nn``       — torch-semantics RNN cells, initializers, metrics.
- ``pathnet_tpu.models``   — the PAGG model family (hetero/homo variants and
  paper ablations) plus a baseline zoo.
- ``pathnet_tpu.train``    — the 10-round / 1000-epoch best-on-validation
  protocol as fully-jitted scans, checkpointing, result logging.
- ``pathnet_tpu.parallel`` — SPMD mesh runtime (pjit/shard_map over
  jax.sharding.Mesh) for node/path-partitioned execution.
"""

__version__ = "0.1.0"
