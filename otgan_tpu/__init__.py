"""otgan_tpu — a TPU-native OT-GAN framework (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of the capabilities of openai/ot-gan ("Improving GANs
Using Optimal Transport", Salimans et al. 2018, arXiv:1803.05573) designed for
TPU hardware:

* the mini-batch energy distance (MED) core — cosine cost matrices + log-domain
  Sinkhorn — is a batched, jittable, shardable pure function (reference:
  ``utils/matching.py``), with a fused Pallas kernel for the hot loop;
* models (DCGAN / DenseNet generator + critic, reference ``models/``) are pure
  functional pytree modules with weight normalization and real data-dependent
  init (reference ``utils/nn.py``);
* distribution is a single SPMD program over a ``jax.sharding.Mesh`` (data
  axis), replacing the reference's per-GPU tower loop (``train.py:67-139``)
  with ``shard_map`` + XLA collectives over ICI.

Subpackages
-----------
ops       Sinkhorn, cost functions, matching, MED losses (the OT core)
nn        layer library (weight-norm dense/conv), optimizers, EMA, init
models    DCGAN, DenseNet, toy MLP model families
parallel  mesh helpers and sharded (multi-chip) matching
data      CIFAR-10 loader + 8-Gaussians toy data
eval      Inception score / metrics
utils     plotting, checkpointing, metric logging
"""

__version__ = "0.1.0"

# convenience top-level API
from otgan_tpu.config import TrainConfig, parse_args  # noqa: E402
from otgan_tpu.engine import Engine, TrainState, StepMetrics  # noqa: E402
