"""embeddingnet_tpu — a TPU-native metric-learning framework.

A ground-up JAX / Flax / Pallas / pjit re-design with the full capability
surface of the reference EmbeddingNet library (RocketFlash/EmbeddingNet):
triplet / siamese embedding training with online mining, a configurable
backbone zoo, config-driven CLI, encodings-database export, kNN inference
and visualization hooks — built TPU-first:

* mining happens **inside** the jitted train step (the reference mines on
  host with a model round-trip per batch, ``embedding_net/datagenerators.py:214``);
* augmentations are fused on-device batch kernels (the reference applies
  albumentations per image on host, ``embedding_net/datagenerators.py:154``);
* scaling is a ``jax.sharding.Mesh`` + XLA collectives, not host loops.
"""

__version__ = "0.1.0"

from embeddingnet_tpu.config import parse_params  # noqa: F401

__all__ = ["parse_params", "__version__"]
