"""llp_tpu — a TPU-native framework for Linkless Link Prediction (LLP).

A from-scratch JAX/XLA/Pallas re-design of the capability set of
snap-research/linkless-link-prediction (ICML 2023): GraphSAGE/GCN teacher
training for link prediction, MLP students trained with relational knowledge
distillation (LLP_D distribution matching + LLP_R rank matching over sampled
node-pair contexts), transductive and production (unseen-node) splits,
negative/context sampling, and Hits@K / AUC evaluation.

Everything on the compute path is functional JAX: static shapes, jit-compiled
train steps, Pallas kernels for the sparse hot ops, and shard_map/pjit over a
device mesh for multi-chip scaling.

Subpackages
-----------
core      immutable padded graph containers (COO + CSR)
ops       numerics: SpMM, fused edge scoring, losses, metrics (+ Pallas kernels)
models    pytree-parameter modules: MLP, GCN, SAGE, LinkPredictor
data      dataset registry, synthetic graphs, transductive/production splitters
sample    PRNG-keyed fixed-shape samplers: negatives, random-walk contexts
train     jit'd teacher/student train steps + epoch/run drivers
evaln     transductive/production evaluators + run loggers
parallel  mesh setup, edge-partitioned sharded SpMM, DP train steps
utils     config, checkpointing, logging
"""

__version__ = "0.7.0"  # keep in sync with pyproject.toml

# Persistent XLA compilation cache: compiles of the big scan-per-epoch
# programs are expensive (remote Mosaic service on axon); cache them across
# processes. Harmless no-op if jax was already initialized.
import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/llp-jax-cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
del _os
