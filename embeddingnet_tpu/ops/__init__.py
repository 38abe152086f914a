"""Compute ops: distances, losses, online mining, kNN, augmentations.

All ops are pure jittable functions over fixed-shape arrays — the TPU-native
replacement for the reference's host-side sklearn/numpy compute
(``embedding_net/datagenerators.py:219-244``, ``embedding_net/losses_and_accuracies.py``).
"""

from embeddingnet_tpu.ops.distances import (  # noqa: F401
    pairwise_l2, pairwise_sq_l2, pairwise_l1, pairwise_cosine)
from embeddingnet_tpu.ops.losses import (  # noqa: F401
    contrastive_loss, triplet_loss, accuracy)
from embeddingnet_tpu.ops.mining import (  # noqa: F401
    mined_triplet_loss, batch_hard_loss, batch_all_loss, MiningStats)
