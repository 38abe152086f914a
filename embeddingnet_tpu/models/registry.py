"""Backbone factory + the embedding module that composes backbone and head.

TPU-native equivalent of ``get_backbone`` (``embedding_net/backbones.py:12-125``):
the reference returns a ``(base_model, backbone_model)`` Keras pair; here one
Flax module exposes the embedding path (``__call__``) and the raw feature
path (``features`` / ``return_features=True``) over shared parameters.

Supported names mirror the reference dispatch:
``simple`` / ``simple2`` (hand-built CNNs, ``backbones.py:19-81``),
``efficientnet-b0..b7`` (``backbones.py:83-98``), ResNets and other zoo
names (``backbones.py:100-104``), plus ``vit-*`` (stretch — modern
embedding backbones through the same config API).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from embeddingnet_tpu.models import efficientnet as _efn
from embeddingnet_tpu.models import resnet as _resnet
from embeddingnet_tpu.models.heads import (EmbeddingHead, ClassificationHead,
                                           SiameseL1Head, SoftmaxHead,
                                           siamese_l2_distance)
from embeddingnet_tpu.models.simple import SimpleCNN, SimpleCNN2

Dtype = Any

_RESNETS = {
    "resnet18": _resnet.resnet18,
    "resnet34": _resnet.resnet34,
    "resnet50": _resnet.resnet50,
    "resnet101": _resnet.resnet101,
    "resnet152": _resnet.resnet152,
    "seresnet18": _resnet.seresnet18,
    "seresnet34": _resnet.seresnet34,
    "seresnet50": _resnet.seresnet50,
    "seresnet101": _resnet.seresnet101,
    "seresnet152": _resnet.seresnet152,
    "resnext50": _resnet.resnext50,
    "resnext101": _resnet.resnext101,
    "seresnext50": _resnet.seresnext50,
    "seresnext101": _resnet.seresnext101,
    "senet154": _resnet.senet154,
}


def list_backbones():
    return (["simple", "simple2"] + sorted(_RESNETS)
            + sorted(_efn.SCALINGS)
            + ["mobilenet", "mobilenetv2", "inceptionv3", "inceptionresnetv2",
               "xception", "nasnetmobile", "nasnetlarge",
               "densenet121", "densenet169", "densenet201",
               "vgg16", "vgg19", "vit-b16", "vit-l14",
               "clip-vit-b16", "clip-vit-b32"])


def _build_backbone(name: str, encodings_len: int,
                    embeddings_normalization: bool, dtype,
                    bn_momentum: float = 0.99, fast_conv: bool = False):
    """Backbone module + whether it has an integrated embedding head.

    ``fast_conv`` enables the Pallas small-spatial 3x3 conv path
    (``PERFORMANCE.pallas_conv``) on the backbones that have one;
    other families silently ignore it (their convs are grouped,
    depthwise, or non-3x3 — ineligible by construction)."""
    if name == "simple":
        return SimpleCNN(encodings_len, embeddings_normalization,
                         dtype=dtype), True
    if name == "simple2":
        return SimpleCNN2(encodings_len, embeddings_normalization,
                          bn_momentum=bn_momentum, dtype=dtype), True
    if name in _RESNETS:
        kw = {} if name == "senet154" else {"fast_conv": fast_conv}
        return _RESNETS[name](bn_momentum=bn_momentum, dtype=dtype,
                              **kw), False
    if name in _efn.SCALINGS:
        return _efn.build_efficientnet(name, bn_momentum=bn_momentum,
                                       dtype=dtype), False
    if name == "mobilenetv2":
        from embeddingnet_tpu.models.mobilenet import MobileNetV2
        return MobileNetV2(bn_momentum=bn_momentum, dtype=dtype), False
    if name == "mobilenet":
        from embeddingnet_tpu.models.mobilenet import MobileNetV1
        return MobileNetV1(bn_momentum=bn_momentum, dtype=dtype), False
    if name == "inceptionv3":
        from embeddingnet_tpu.models.inception import InceptionV3
        return InceptionV3(bn_momentum=bn_momentum, dtype=dtype), False
    if name == "inceptionresnetv2":
        from embeddingnet_tpu.models.inception import InceptionResNetV2
        return InceptionResNetV2(bn_momentum=bn_momentum, dtype=dtype), False
    if name == "xception":
        from embeddingnet_tpu.models.xception import Xception
        return Xception(bn_momentum=bn_momentum, dtype=dtype), False
    if name in ("nasnetmobile", "nasnetlarge"):
        from embeddingnet_tpu.models import nasnet as _nas
        return (getattr(_nas, name)(bn_momentum=bn_momentum,
                                    dtype=dtype), False)
    if name.startswith("densenet"):
        from embeddingnet_tpu.models import densenet as _dn
        builder = {"densenet121": _dn.densenet121,
                   "densenet169": _dn.densenet169,
                   "densenet201": _dn.densenet201}.get(name)
        if builder:
            return builder(bn_momentum=bn_momentum, dtype=dtype), False
    if name in ("vgg16", "vgg19"):
        from embeddingnet_tpu.models import vgg as _vgg
        return (getattr(_vgg, name)(dtype=dtype), False)
    if name.startswith("vit") or name.startswith("clip-vit"):
        from embeddingnet_tpu.models.vit import build_vit
        return build_vit(name, dtype=dtype), False
    raise ValueError(
        f"unknown backbone {name!r}; valid: {list_backbones()}")


class EmbeddingModule(nn.Module):
    """Backbone + embedding head (+ optional Dense(1,sigmoid) classifier).

    ``__call__`` = the reference ``base_model`` (image -> embedding);
    ``features`` = the reference ``backbone_model`` (image -> feature map);
    ``classify`` = the reference ``classification_model``
    (``embedding_net/models.py:42-45``).
    """

    backbone_name: str = "simple"
    encodings_len: int = 256
    embeddings_normalization: bool = True
    bn_momentum: float = 0.99
    fast_conv: bool = False  # PERFORMANCE.pallas_conv
    dtype: Optional[Dtype] = None

    def setup(self):
        self.backbone, integrated = _build_backbone(
            self.backbone_name, self.encodings_len,
            self.embeddings_normalization, self.dtype,
            bn_momentum=self.bn_momentum, fast_conv=self.fast_conv)
        self.head = None if integrated else EmbeddingHead(
            self.encodings_len, self.embeddings_normalization,
            dtype=self.dtype)
        self.classifier = ClassificationHead(dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Image batch [B, H, W, C] (float, already /255) -> embeddings."""
        if self.head is None:
            return self.backbone(x, train=train)
        feats = self.backbone(x, train=train)
        return self.head(feats)

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """The reference ``backbone_model`` output (pre-head features)."""
        if self.head is None:
            return self.backbone(x, train=train, return_features=True)
        return self.backbone(x, train=train)

    def classify(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Dense(1, sigmoid) on the embedding (``models.py:42-45``)."""
        return self.classifier(self(x, train=train))

    def init_all(self, x: jnp.ndarray, train: bool = False):
        """Trace every submodule so ``init`` creates the full param tree
        (plain ``__call__`` would skip the classifier head)."""
        emb = self(x, train=train)
        return emb, self.classifier(emb)


class SiameseModule(nn.Module):
    """Two shared-weight encoder streams + distance head
    (``embedding_net/models.py:203-230``): ``l1`` -> |e1-e2| ->
    Dense(1, sigmoid); ``l2`` -> scalar euclidean distance. Returns
    ``(distance, e1, e2)``. The ``encoder`` param subtree is layout-
    identical to a standalone :class:`EmbeddingModule`, so the Trainer's
    ``encoder_variables()`` extracts it for encodings export.
    """

    backbone_name: str = "simple"
    encodings_len: int = 256
    embeddings_normalization: bool = True
    distance_type: str = "l1"
    fast_conv: bool = False
    dtype: Optional[Dtype] = None

    def setup(self):
        self.encoder = EmbeddingModule(
            backbone_name=self.backbone_name,
            encodings_len=self.encodings_len,
            embeddings_normalization=self.embeddings_normalization,
            fast_conv=self.fast_conv, dtype=self.dtype)
        if self.distance_type == "l1":
            self.distance_head = SiameseL1Head(dtype=self.dtype)

    def __call__(self, xs, train: bool = False):
        x1, x2 = xs
        e1 = self.encoder(x1, train=train)
        e2 = self.encoder(x2, train=train)
        if self.distance_type == "l1":
            d = self.distance_head(e1.astype(jnp.float32),
                                   e2.astype(jnp.float32))
        else:
            d = siamese_l2_distance(e1.astype(jnp.float32),
                                    e2.astype(jnp.float32))
        return d, e1, e2


class SoftmaxModule(nn.Module):
    """Backbone + softmax classification head for the pretraining phase
    (``embedding_net/backbones.py:144-147``). The ``backbone`` param
    subtree is layout-identical to :class:`EmbeddingModule`'s, so
    pretrained backbone weights transfer by subtree copy — the functional
    analog of the reference mutating shared Keras layers in place
    (``tools/train.py:164-170``).
    """

    backbone_name: str = "simple"
    n_classes: int = 1000
    encodings_len: int = 256
    dtype: Optional[Dtype] = None

    def setup(self):
        backbone, integrated = _build_backbone(
            self.backbone_name, self.encodings_len, False, self.dtype)
        self.backbone = backbone
        self.integrated = integrated
        if integrated:
            # simple backbones yield flat features; Dense directly (the
            # reference's GAP head only ever met 4D zoo outputs).
            self.flat_logits = nn.Dense(self.n_classes, dtype=self.dtype)
        else:
            self.softmax_head = SoftmaxHead(self.n_classes, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        if self.integrated:
            feats = self.backbone(x, train=train, return_features=True)
            if feats.ndim > 2:
                feats = jnp.mean(feats, axis=(1, 2))
            return self.flat_logits(feats)
        feats = self.backbone(x, train=train)
        return self.softmax_head(feats)


class ArcFaceModule(nn.Module):
    """Encoder + learned per-class weight matrix for the ArcFace margin
    loss (stretch mode; ``ops.losses.arcface_loss``). Returns
    ``(embeddings, class_weights)``; the encoder subtree matches
    :class:`EmbeddingModule` so encodings export reuses it."""

    backbone_name: str = "vit-b16"
    encodings_len: int = 512
    n_classes: int = 1000
    embeddings_normalization: bool = False
    fast_conv: bool = False
    dtype: Optional[Dtype] = None

    def setup(self):
        self.encoder = EmbeddingModule(
            backbone_name=self.backbone_name,
            encodings_len=self.encodings_len,
            embeddings_normalization=self.embeddings_normalization,
            fast_conv=self.fast_conv, dtype=self.dtype)
        self.class_weights = self.param(
            "class_weights", nn.initializers.normal(0.01),
            (self.n_classes, self.encodings_len))

    def __call__(self, x, train: bool = False):
        return self.encoder(x, train=train), self.class_weights


def transfer_backbone_params(softmax_params, embedding_params):
    """Copy the trained ``backbone`` subtree from a SoftmaxModule param
    tree into an EmbeddingModule param tree (pretraining handoff)."""
    new = dict(embedding_params)
    new["backbone"] = softmax_params["backbone"]
    return type(embedding_params)(new) if not isinstance(
        embedding_params, dict) else new


def get_backbone(input_shape, encodings_len=4096, backbone_name="simple",
                 embeddings_normalization=True, backbone_weights=None,
                 freeze_backbone=False, dtype=None, rng=None, **kwargs):
    """Reference-compatible factory (``backbones.py:12-18`` signature).

    Returns ``(module, variables)`` — the functional JAX analog of the
    reference's ``(base_model, backbone_model)`` (both views live on the
    single returned module). ``backbone_weights`` accepts a local checkpoint
    path or a named preset resolved through ``$EMBEDDINGNET_WEIGHTS_DIR``
    (:func:`embeddingnet_tpu.models.pretrained.resolve_weights`); an
    unresolvable named preset raises rather than silently returning random
    init (the reference downloads, ``backbones.py:96-104``).
    """
    module = EmbeddingModule(backbone_name=backbone_name,
                             encodings_len=encodings_len,
                             embeddings_normalization=embeddings_normalization,
                             dtype=dtype)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1,) + tuple(input_shape), jnp.float32)
    variables = module.init({"params": rng, "dropout": rng}, dummy,
                            train=False, method="init_all")
    from embeddingnet_tpu.models import pretrained
    weights_path = pretrained.resolve_weights(backbone_weights, backbone_name)
    if weights_path is not None:
        variables = pretrained.load_into(variables, weights_path)
    return module, variables


def backbone_param_mask(params, freeze_backbone):
    """True = trainable. Freeze modes (MODEL.freeze_backbone):

    * ``False`` / ``None`` — everything trains;
    * ``True`` / ``"all"`` — the whole backbone subtree is frozen, only
      head/classifier train (the standard JAX transfer-learning setup);
    * ``"except_last_2"`` — reference-exact granularity
      (``backbones.py:106-108`` freezes ``backbone_model.layers[:-2]``):
      the last two top-level backbone submodules stay trainable. Flax
      param dicts preserve forward (creation) order, so "last two" is
      well-defined; our submodules are coarser than Keras layers (a
      residual block vs a conv), documented difference.
    """
    if not freeze_backbone:
        return jax.tree_util.tree_map(lambda _: True, params)
    mode = "all" if freeze_backbone is True else str(freeze_backbone)
    if mode not in ("all", "except_last_2"):
        raise ValueError(
            f"freeze_backbone must be bool, 'all' or 'except_last_2'; "
            f"got {freeze_backbone!r}")

    trainable_tails = set()
    if mode == "except_last_2":
        def collect(node):
            if not isinstance(node, dict):
                return
            for k, v in node.items():
                if k == "backbone" and isinstance(v, dict):
                    trainable_tails.update(list(v.keys())[-2:])
                else:
                    collect(v)
        collect(params)

    def mask_fn(path, _):
        keys = [getattr(k, "key", None) for k in path]
        if "backbone" not in keys:
            return True
        if mode == "all":
            return False
        after = keys[keys.index("backbone") + 1:]
        return bool(after) and after[0] in trainable_tails

    return jax.tree_util.tree_map_with_path(mask_fn, params)
