"""Backbone zoo + embedding model architectures (Flax).

TPU-native re-design of ``embedding_net/backbones.py`` and
``embedding_net/models.py``: every backbone is a Flax module compiled by
XLA:TPU under jit/pjit; the (base_model, backbone_model) pair of the
reference becomes one module with an ``embed`` call and a ``features``
call sharing parameters.
"""

from embeddingnet_tpu.models.registry import (  # noqa: F401
    get_backbone, list_backbones, EmbeddingModule)
from embeddingnet_tpu.models.api import (  # noqa: F401
    EmbeddingNet, TripletNet, SiameseNet)
