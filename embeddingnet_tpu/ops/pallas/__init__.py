"""Pallas TPU kernels for the mining hot path."""

from embeddingnet_tpu.ops.pallas.mining_kernel import (  # noqa: F401
    pallas_batch_hard_loss, fused_hard_indices)
