"""Utilities: visualization, structured logging."""

from embeddingnet_tpu.utils.viz import (  # noqa: F401
    plot_tsne, plot_tsne_interactive, plot_grapths, plot_batch,
    plot_batch_simple)
