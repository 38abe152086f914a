"""Pretrained-weight loading and Keras->Flax conversion.

The reference pulls 'imagenet'/'noisy-student' weights over the network at
model build (``embedding_net/backbones.py:96-104``). This framework does
no downloads: ``backbone_weights`` takes a *local* file —

* ``.msgpack`` — this framework's own serialized variables;
* ``.npz``     — a flat ``{path/to/param: array}`` archive (the exchange
  format produced by the converters below);
* ``.h5``      — a Keras weights file, converted through the matching
  ``keras_*_to_flax`` converter when TensorFlow is importable.

Converters (usable offline against randomly initialized Keras models —
that is how the parity tests validate the mapping):

* :func:`keras_simple_to_flax` — the reference's hand-built ``simple``
  backbone (``backbones.py:19-41``), exact layer-for-layer port;
* :func:`keras_resnet50_to_flax` — tf.keras.applications ResNet50
  (``include_top=False``) into :class:`models.resnet.ResNet` built with
  ``stride_in_3x3=False, use_bias=True`` (the keras conv placement).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

NAMED_PRESETS = ("imagenet", "noisy-student")
WEIGHTS_DIR_ENV = "EMBEDDINGNET_WEIGHTS_DIR"


def resolve_weights(backbone_weights: Optional[str],
                    backbone_name: str) -> Optional[str]:
    """Resolve MODEL.backbone_weights to a loadable local file, or None.

    The reference downloads named presets at model build
    (``embedding_net/backbones.py:96-104``); this framework runs
    zero-egress, so named presets ('imagenet', 'noisy-student') resolve
    through a local cache directory ``$EMBEDDINGNET_WEIGHTS_DIR/
    <backbone>_<preset>.{npz,msgpack}``. A named preset with no cached
    file FAILS LOUDLY — silently training from random init while the
    config says 'imagenet' is the one reference behavior we refuse to
    reproduce quietly.
    """
    if not backbone_weights:
        return None
    if backbone_weights not in NAMED_PRESETS:
        if not os.path.isfile(backbone_weights):
            raise FileNotFoundError(
                f"MODEL.backbone_weights file not found: "
                f"{backbone_weights!r}")
        return backbone_weights
    weights_dir = os.environ.get(WEIGHTS_DIR_ENV)
    if weights_dir:
        for ext in (".npz", ".msgpack"):
            cand = os.path.join(
                weights_dir, f"{backbone_name}_{backbone_weights}{ext}")
            if os.path.isfile(cand):
                return cand
    raise FileNotFoundError(
        f"MODEL.backbone_weights: {backbone_weights!r} is a named preset; "
        f"this framework performs no downloads. Convert a checkpoint with "
        f"the keras_*_to_flax / torch_resnet_to_flax converters "
        f"(embeddingnet_tpu.models.pretrained), save it as "
        f"<dir>/{backbone_name}_{backbone_weights}.npz, and set "
        f"{WEIGHTS_DIR_ENV}=<dir> — or set backbone_weights to a local "
        f"file path / null.")


def load_into(variables, weights_path: str):
    """Load a local weights file into an initialized variables tree."""
    if weights_path.endswith(".msgpack"):
        from flax import serialization
        with open(weights_path, "rb") as f:
            return serialization.from_bytes(variables, f.read())
    if weights_path.endswith(".npz"):
        flat = dict(np.load(weights_path))
        return _unflatten_into(variables, flat)
    raise ValueError(
        f"unsupported weights file {weights_path!r} (.msgpack or .npz; "
        f".h5 files go through the keras_*_to_flax converters)")


def _unflatten_into(variables, flat: Dict[str, np.ndarray]):
    import jax

    def path_str(path):
        return "/".join(str(getattr(k, "key", k)) for k in path)

    def replace(path, leaf):
        key = path_str(path)
        if key in flat:
            arr = np.asarray(flat[key])
            if arr.shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch for {key}: file {arr.shape} vs "
                    f"model {leaf.shape}")
            return arr.astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(replace, variables)


def flatten_params(variables) -> Dict[str, np.ndarray]:
    """Inverse of :func:`_unflatten_into` — for writing ``.npz`` archives."""
    import jax
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        flat[key] = np.asarray(leaf)
    return flat


# -- Keras converters ------------------------------------------------------

def keras_simple_to_flax(keras_model, encodings_len: int) -> Dict[str, Any]:
    """Reference ``simple`` base_model (``backbones.py:19-41``) -> params
    for :class:`models.simple.SimpleCNN` (both use HWIO conv kernels and
    row-major NHWC flatten, so arrays transfer unchanged)."""
    convs = [l for l in keras_model.layers
             if l.__class__.__name__ == "Conv2D"]
    denses = [l for l in keras_model.layers
              if l.__class__.__name__ == "Dense"]
    assert len(convs) == 4, f"expected 4 convs, got {len(convs)}"
    assert len(denses) == 1
    params: Dict[str, Any] = {}
    for i, conv in enumerate(convs, 1):
        k, b = conv.get_weights()
        params[f"conv_{i}"] = {"kernel": k, "bias": b}
    k, b = denses[0].get_weights()
    assert k.shape[1] == encodings_len
    params["embedding_dense"] = {"kernel": k, "bias": b}
    return params


def _bn_params(layer):
    gamma, beta, mean, var = layer.get_weights()
    return ({"scale": gamma, "bias": beta},
            {"mean": mean, "var": var})


def torch_resnet_to_flax(state_dict, stage_sizes):
    """torchvision-format ResNet ``state_dict`` -> (params, batch_stats)
    for :class:`models.resnet.ResNet` built with the torch conventions:
    ``stride_in_3x3=True`` (v1.5), ``use_bias=False``, ``bn_epsilon=1e-5``.

    Name mapping: ``conv1/bn1`` stem; ``layer{s}.{b}.conv{i}/bn{i}`` ->
    ``stage{s}_block{b+1}/conv{i}/bn{i}``; ``downsample.0/.1`` ->
    ``downsample_conv/bn``. Conv kernels transpose OIHW -> HWIO. The
    classifier ``fc.*`` is dropped (include_top=False semantics).
    ``state_dict`` values may be torch tensors or numpy arrays.
    """
    def arr(name):
        v = state_dict[name]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else \
            np.asarray(v)

    def conv(name):
        return {"kernel": np.transpose(arr(name + ".weight"), (2, 3, 1, 0))}

    def bn(name):
        return ({"scale": arr(name + ".weight"),
                 "bias": arr(name + ".bias")},
                {"mean": arr(name + ".running_mean"),
                 "var": arr(name + ".running_var")})

    params: Dict[str, Any] = {"stem_conv": conv("conv1")}
    stats: Dict[str, Any] = {}
    params["stem_bn"], stats["stem_bn"] = bn("bn1")

    n_convs = 3 if any(k.startswith("layer1.0.conv3")
                       for k in state_dict) else 2
    for s, n_blocks in enumerate(stage_sizes, start=1):
        for b in range(n_blocks):
            prefix = f"layer{s}.{b}"
            fb: Dict[str, Any] = {}
            sb: Dict[str, Any] = {}
            for i in range(1, n_convs + 1):
                fb[f"conv{i}"] = conv(f"{prefix}.conv{i}")
                fb[f"bn{i}"], sb[f"bn{i}"] = bn(f"{prefix}.bn{i}")
            if f"{prefix}.downsample.0.weight" in state_dict:
                fb["downsample_conv"] = conv(f"{prefix}.downsample.0")
                fb["downsample_bn"], sb["downsample_bn"] = bn(
                    f"{prefix}.downsample.1")
            key = f"stage{s}_block{b + 1}"
            params[key] = fb
            stats[key] = sb
    return params, stats


def keras_efficientnet_to_flax(keras_model):
    """tf.keras.applications.EfficientNetB* (include_top=False) ->
    (params, batch_stats) for :class:`models.efficientnet.EfficientNet`.

    Keras names ``block{stage}{letter}_*`` map to our
    ``stage{s}_block{r}`` (r = letter index + 1); depthwise kernels
    transpose (H, W, C, 1) -> (H, W, 1, C) for Flax's
    ``feature_group_count`` convention. The in-model Rescaling/
    Normalization layers are preprocessing, not weights — callers feed
    this module ``x/255`` (and apply the dataset normalization if the
    checkpoint used one).
    """
    layers = {l.name: l for l in keras_model.layers}

    def conv_w(name, depthwise=False):
        w = layers[name].get_weights()
        kernel = w[0]
        if depthwise:
            kernel = np.transpose(kernel, (0, 1, 3, 2))
        out = {"kernel": kernel}
        if len(w) == 2:
            out["bias"] = w[1]
        return out

    params: Dict[str, Any] = {"stem_conv": conv_w("stem_conv")}
    stats: Dict[str, Any] = {}
    params["stem_bn"], stats["stem_bn"] = _bn_params(layers["stem_bn"])

    import re
    block_names = sorted({
        m.group(0) for name in layers
        for m in [re.match(r"block(\d)([a-z])", name)] if m})
    for bn in block_names:
        stage = int(bn[5])
        rep = ord(bn[6]) - ord("a") + 1
        key = f"stage{stage}_block{rep}"
        fb: Dict[str, Any] = {}
        sb: Dict[str, Any] = {}
        if f"{bn}_expand_conv" in layers:
            fb["expand_conv"] = conv_w(f"{bn}_expand_conv")
            fb["expand_bn"], sb["expand_bn"] = _bn_params(
                layers[f"{bn}_expand_bn"])
        fb["dw_conv"] = conv_w(f"{bn}_dwconv", depthwise=True)
        fb["dw_bn"], sb["dw_bn"] = _bn_params(layers[f"{bn}_bn"])
        fb["se"] = {"reduce": conv_w(f"{bn}_se_reduce"),
                    "expand": conv_w(f"{bn}_se_expand")}
        fb["project_conv"] = conv_w(f"{bn}_project_conv")
        fb["project_bn"], sb["project_bn"] = _bn_params(
            layers[f"{bn}_project_bn"])
        params[key] = fb
        stats[key] = sb

    params["head_conv"] = conv_w("top_conv")
    params["head_bn"], stats["head_bn"] = _bn_params(layers["top_bn"])
    return params, stats


def keras_mobilenetv2_to_flax(keras_model):
    """tf.keras.applications.MobileNetV2 (include_top=False) ->
    (params, batch_stats) for :class:`models.mobilenet.MobileNetV2`.

    Keras numbers blocks sequentially (``expanded_conv`` then
    ``block_1..block_16``); ours are ``stage{s}_block{r}`` following the
    (1,2,3,4,3,3,1)-repeat stages — mapped in order. Depthwise kernels
    transpose (H, W, C, 1) -> (H, W, 1, C). Inputs: keras MobileNetV2
    expects [-1, 1] preprocessing *outside* the model; feed both the same
    arrays.
    """
    layers = {l.name: l for l in keras_model.layers}

    def conv_w(name, depthwise=False):
        w = layers[name].get_weights()
        kernel = np.transpose(w[0], (0, 1, 3, 2)) if depthwise else w[0]
        out = {"kernel": kernel}
        if len(w) == 2:
            out["bias"] = w[1]
        return out

    params: Dict[str, Any] = {"stem_conv": conv_w("Conv1")}
    stats: Dict[str, Any] = {}
    params["stem_bn"], stats["stem_bn"] = _bn_params(layers["bn_Conv1"])

    repeats = (1, 2, 3, 4, 3, 3, 1)
    seq = 0  # keras sequential block index; 0 == "expanded_conv"
    for stage, n_blocks in enumerate(repeats, start=1):
        for rep in range(1, n_blocks + 1):
            kp = "expanded_conv" if seq == 0 else f"block_{seq}"
            fb: Dict[str, Any] = {}
            sb: Dict[str, Any] = {}
            if f"{kp}_expand" in layers:
                fb["expand_conv"] = conv_w(f"{kp}_expand")
                fb["expand_bn"], sb["expand_bn"] = _bn_params(
                    layers[f"{kp}_expand_BN"])
            fb["dw_conv"] = conv_w(f"{kp}_depthwise", depthwise=True)
            fb["dw_bn"], sb["dw_bn"] = _bn_params(
                layers[f"{kp}_depthwise_BN"])
            fb["project_conv"] = conv_w(f"{kp}_project")
            fb["project_bn"], sb["project_bn"] = _bn_params(
                layers[f"{kp}_project_BN"])
            key = f"stage{stage}_block{rep}"
            params[key] = fb
            stats[key] = sb
            seq += 1

    params["head_conv"] = conv_w("Conv_1")
    params["head_bn"], stats["head_bn"] = _bn_params(layers["Conv_1_bn"])
    return params, stats


def keras_resnet50_to_flax(keras_model):
    """tf.keras.applications.ResNet50(include_top=False) -> (params,
    batch_stats) for ``resnet.resnet50(stride_in_3x3=False, use_bias=True)``.

    Layer-name mapping: keras ``conv{s}_block{b}_{i}_conv`` (i=0 shortcut,
    1..3 main path) -> flax ``stage{s-1}_block{b}/conv{i}`` /
    ``downsample_conv``; BNs likewise.
    """
    layers = {l.name: l for l in keras_model.layers}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_w(name):
        w = layers[name].get_weights()
        return ({"kernel": w[0], "bias": w[1]} if len(w) == 2
                else {"kernel": w[0]})

    params["stem_conv"] = conv_w("conv1_conv")
    params["stem_bn"], stats["stem_bn"] = _bn_params(layers["conv1_bn"])

    stage_blocks = [3, 4, 6, 3]
    for s, n_blocks in enumerate(stage_blocks, start=2):
        for b in range(1, n_blocks + 1):
            fb: Dict[str, Any] = {}
            sb: Dict[str, Any] = {}
            for i in (1, 2, 3):
                fb[f"conv{i}"] = conv_w(f"conv{s}_block{b}_{i}_conv")
                fb[f"bn{i}"], sb[f"bn{i}"] = _bn_params(
                    layers[f"conv{s}_block{b}_{i}_bn"])
            if f"conv{s}_block{b}_0_conv" in layers:
                fb["downsample_conv"] = conv_w(f"conv{s}_block{b}_0_conv")
                fb["downsample_bn"], sb["downsample_bn"] = _bn_params(
                    layers[f"conv{s}_block{b}_0_bn"])
            key = f"stage{s - 1}_block{b}"
            params[key] = fb
            stats[key] = sb
    return params, stats


def hf_vit_to_flax(state_dict, depth: int):
    """HuggingFace ``transformers.ViTModel`` state_dict -> params for
    :class:`models.vit.ViT` (ROADMAP "ViT pretrained-weight converter").

    Name mapping: ``vit.embeddings.patch_embeddings.projection`` ->
    ``patch_embed`` (OIHW -> HWIO); ``cls_token`` / ``position_embeddings``
    verbatim; ``vit.encoder.layer.{i}`` -> ``block{i+1}`` with
    ``layernorm_before/after`` -> ``ln1/ln2``, the q/k/v/out projections
    reshaped to Flax MultiHeadDotProductAttention's [D, H, hd] / [H, hd, D]
    layout, ``intermediate/output.dense`` -> ``mlp.fc1/fc2``; final
    ``vit.layernorm`` -> ``ln_final``. The pooler (if present) is dropped.
    Values may be torch tensors or numpy arrays. Oracle-tested against a
    live ``transformers.ViTModel`` forward in ``tests/test_parity.py``.
    """
    def arr(name):
        v = state_dict[name]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else \
            np.asarray(v)

    # infer dims
    pe = arr("vit.embeddings.patch_embeddings.projection.weight")  # OIHW
    dim = pe.shape[0]

    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": np.transpose(pe, (2, 3, 1, 0)),
            "bias": arr("vit.embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": arr("vit.embeddings.cls_token"),
        "pos_embed": arr("vit.embeddings.position_embeddings"),
        "ln_final": {"scale": arr("vit.layernorm.weight"),
                     "bias": arr("vit.layernorm.bias")},
    }

    # head count: HF stores per-layer qkv as square [D, D] matrices; the
    # flax layout needs num_heads, taken from the config convention
    # dim/64 (all ViT-B/L variants use 64-dim heads) unless overridden
    # via state_dict["__num_heads__"].
    heads = int(state_dict.get("__num_heads__", dim // 64))
    hd = dim // heads

    def qkv(name):
        w = arr(name + ".weight")          # [D_out, D_in] torch
        b = arr(name + ".bias")
        return {"kernel": w.T.reshape(dim, heads, hd),
                "bias": b.reshape(heads, hd)}

    for i in range(depth):
        p = f"vit.encoder.layer.{i}"
        out_w = arr(f"{p}.attention.output.dense.weight")   # [D, D]
        params[f"block{i + 1}"] = {
            "ln1": {"scale": arr(f"{p}.layernorm_before.weight"),
                    "bias": arr(f"{p}.layernorm_before.bias")},
            "attn": {
                "query": qkv(f"{p}.attention.attention.query"),
                "key": qkv(f"{p}.attention.attention.key"),
                "value": qkv(f"{p}.attention.attention.value"),
                "out": {"kernel": out_w.T.reshape(heads, hd, dim),
                        "bias": arr(f"{p}.attention.output.dense.bias")},
            },
            "ln2": {"scale": arr(f"{p}.layernorm_after.weight"),
                    "bias": arr(f"{p}.layernorm_after.bias")},
            "mlp": {
                "fc1": {"kernel": arr(f"{p}.intermediate.dense.weight").T,
                        "bias": arr(f"{p}.intermediate.dense.bias")},
                "fc2": {"kernel": arr(f"{p}.output.dense.weight").T,
                        "bias": arr(f"{p}.output.dense.bias")},
            },
        }
    return params


def clip_vit_to_flax(state_dict, depth: int):
    """HuggingFace CLIP vision tower state_dict -> params for
    :class:`models.vit.ViT` with the CLIP flags (``vit-l14`` /
    ``clip-vit-b16``/``b32`` registry names) — BASELINE.json configs[4],
    the reference's named-preset download (``backbones.py:96-104``)
    restated for CLIP checkpoints in the zero-egress flow.

    Accepts either a ``CLIPVisionModel(WithProjection)`` state_dict
    (keys under ``vision_model.*``) or a full ``CLIPModel`` one (same,
    plus ``visual_projection.weight``). Name mapping:

    * ``vision_model.embeddings.patch_embedding.weight`` (OIHW, no bias)
      -> ``patch_embed`` (HWIO);
    * ``embeddings.class_embedding`` [D] -> ``cls_token`` [1, 1, D];
    * ``embeddings.position_embedding.weight`` [L, D] (an nn.Embedding)
      -> ``pos_embed`` [1, L, D];
    * ``pre_layrnorm`` (the HF key really is misspelled) -> ``ln_pre``;
    * ``encoder.layers.{i}`` -> ``block{i+1}``: ``layer_norm1/2`` ->
      ``ln1/ln2``, ``self_attn.{q,k,v,out}_proj`` reshaped to Flax
      MultiHeadDotProductAttention's [D, H, hd] / [H, hd, D] layout,
      ``mlp.fc1/fc2`` verbatim (transposed);
    * ``post_layernorm`` -> ``ln_final``;
    * ``visual_projection.weight`` [P, D] (no bias; also found as
      ``visual_projection.weight`` on WithProjection models) ->
      ``proj.kernel`` [D, P]. Absent projection -> omitted (load into a
      ``proj_dim=None`` module).

    Oracle-tested against a live ``transformers.CLIPVisionModel
    WithProjection`` forward in ``tests/test_parity.py`` (random weights,
    no downloads): token 0 of ``return_tokens=True`` equals
    ``image_embeds`` exactly.
    """
    def arr(name):
        v = state_dict[name]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else \
            np.asarray(v)

    vm = ("vision_model." if any(k.startswith("vision_model.")
                                 for k in state_dict) else "")
    pe = arr(f"{vm}embeddings.patch_embedding.weight")          # OIHW
    dim = pe.shape[0]

    params: Dict[str, Any] = {
        "patch_embed": {"kernel": np.transpose(pe, (2, 3, 1, 0))},
        "cls_token": arr(f"{vm}embeddings.class_embedding").reshape(
            1, 1, dim),
        "pos_embed": arr(f"{vm}embeddings.position_embedding.weight")[
            None, :, :],
        "ln_pre": {"scale": arr(f"{vm}pre_layrnorm.weight"),
                   "bias": arr(f"{vm}pre_layrnorm.bias")},
        "ln_final": {"scale": arr(f"{vm}post_layernorm.weight"),
                     "bias": arr(f"{vm}post_layernorm.bias")},
    }
    for proj_key in ("visual_projection.weight",
                     f"{vm}visual_projection.weight"):
        if proj_key in state_dict:
            params["proj"] = {"kernel": arr(proj_key).T}        # [D, P]
            break

    heads = int(state_dict.get("__num_heads__", dim // 64))
    hd = dim // heads

    def qkv(name):
        w = arr(name + ".weight")          # [D_out, D_in] torch
        b = arr(name + ".bias")
        return {"kernel": w.T.reshape(dim, heads, hd),
                "bias": b.reshape(heads, hd)}

    for i in range(depth):
        p = f"{vm}encoder.layers.{i}"
        out_w = arr(f"{p}.self_attn.out_proj.weight")           # [D, D]
        params[f"block{i + 1}"] = {
            "ln1": {"scale": arr(f"{p}.layer_norm1.weight"),
                    "bias": arr(f"{p}.layer_norm1.bias")},
            "attn": {
                "query": qkv(f"{p}.self_attn.q_proj"),
                "key": qkv(f"{p}.self_attn.k_proj"),
                "value": qkv(f"{p}.self_attn.v_proj"),
                "out": {"kernel": out_w.T.reshape(heads, hd, dim),
                        "bias": arr(f"{p}.self_attn.out_proj.bias")},
            },
            "ln2": {"scale": arr(f"{p}.layer_norm2.weight"),
                    "bias": arr(f"{p}.layer_norm2.bias")},
            "mlp": {
                "fc1": {"kernel": arr(f"{p}.mlp.fc1.weight").T,
                        "bias": arr(f"{p}.mlp.fc1.bias")},
                "fc2": {"kernel": arr(f"{p}.mlp.fc2.weight").T,
                        "bias": arr(f"{p}.mlp.fc2.bias")},
            },
        }
    return params


def keras_densenet_to_flax(keras_model, block_sizes):
    """keras.applications.DenseNet* (include_top=False) -> (params,
    batch_stats) for :class:`models.densenet.DenseNet`.

    Keras names (``conv1/conv`` or ``conv1_conv`` depending on Keras
    version — normalized here): stem ``conv1``; composite layers
    ``conv{s+1}_block{b}_{0_bn,1_conv,1_bn,2_conv}`` ->
    ``stage{s}_block{b}/{bn0,conv1,bn1,conv2}``; transitions ``pool{s+1}_
    {bn,conv}`` -> ``transition{s}_{bn,conv}``; closing ``bn`` ->
    ``final_bn``.
    """
    layers = {l.name.replace("/", "_"): l for l in keras_model.layers}

    def conv_w(name):
        w = layers[name].get_weights()
        return ({"kernel": w[0], "bias": w[1]} if len(w) == 2
                else {"kernel": w[0]})

    params: Dict[str, Any] = {"stem_conv": conv_w("conv1_conv")}
    stats: Dict[str, Any] = {}
    params["stem_bn"], stats["stem_bn"] = _bn_params(layers["conv1_bn"])

    for s, n_layers in enumerate(block_sizes, start=1):
        for b in range(1, n_layers + 1):
            kp = f"conv{s + 1}_block{b}"
            fb: Dict[str, Any] = {}
            sb: Dict[str, Any] = {}
            fb["bn0"], sb["bn0"] = _bn_params(layers[f"{kp}_0_bn"])
            fb["conv1"] = conv_w(f"{kp}_1_conv")
            fb["bn1"], sb["bn1"] = _bn_params(layers[f"{kp}_1_bn"])
            fb["conv2"] = conv_w(f"{kp}_2_conv")
            params[f"stage{s}_block{b}"] = fb
            stats[f"stage{s}_block{b}"] = sb
        if s < len(block_sizes):
            params[f"transition{s}_bn"], stats[f"transition{s}_bn"] = \
                _bn_params(layers[f"pool{s + 1}_bn"])
            params[f"transition{s}_conv"] = conv_w(f"pool{s + 1}_conv")
    params["final_bn"], stats["final_bn"] = _bn_params(layers["bn"])
    return params, stats


def keras_mobilenetv1_to_flax(keras_model):
    """keras.applications.MobileNet (v1, include_top=False) -> (params,
    batch_stats) for :class:`models.mobilenet.MobileNetV1`.

    Construction is strictly sequential on both sides (stem conv + 13
    dw/pw blocks), so the mapping zips the Conv2D/DepthwiseConv2D layers
    in order against ``stem_conv, block{i}_dw, block{i}_pw`` (depthwise
    kernels transpose (H, W, C, 1) -> (H, W, 1, C)).
    """
    convs = [l for l in keras_model.layers if l.__class__.__name__
             in ("Conv2D", "DepthwiseConv2D")]
    bns = [l for l in keras_model.layers
           if l.__class__.__name__ == "BatchNormalization"]
    names = ["stem"]
    for i in range(1, 14):
        names += [f"block{i}_dw", f"block{i}_pw"]
    assert len(convs) == len(bns) == len(names), (len(convs), len(bns))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for name, conv, bnl in zip(names, convs, bns):
        (kernel,) = conv.get_weights()
        if conv.__class__.__name__ == "DepthwiseConv2D":
            kernel = np.transpose(kernel, (0, 1, 3, 2))
        conv_key = "stem_conv" if name == "stem" else name
        bn_key = "stem_bn" if name == "stem" else f"{name}_bn"
        params[conv_key] = {"kernel": kernel}
        params[bn_key], stats[bn_key] = _bn_params(bnl)
    return params, stats


def keras_inceptionv3_to_flax(keras_model):
    """keras.applications.InceptionV3 (include_top=False) -> (params,
    batch_stats) for :class:`models.inception.InceptionV3`.

    Both sides create their 94 conv+BN pairs in the same construction
    order (our module is written to mirror the keras source), so the
    mapping zips the layers in *creation* order. ``model.layers`` is
    topologically sorted, NOT creation-ordered — but keras auto-names
    (``conv2d``, ``conv2d_1``, ...) carry the creation index, so we sort
    by that. Keras builds these BNs with ``scale=False`` — weights are
    ``[beta, mean, var]`` (no gamma), matching our ``use_scale=False``.
    """
    def uid(layer):
        tail = layer.name.rsplit("_", 1)[-1]
        return int(tail) if tail.isdigit() else -1

    convs = sorted((l for l in keras_model.layers
                    if l.__class__.__name__ == "Conv2D"), key=uid)
    bns = sorted((l for l in keras_model.layers
                  if l.__class__.__name__ == "BatchNormalization"), key=uid)
    assert len(convs) == len(bns), (len(convs), len(bns))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, (conv, bnl) in enumerate(zip(convs, bns), start=1):
        (kernel,) = conv.get_weights()
        params[f"conv{i}"] = {"kernel": kernel}
        beta, mean, var = bnl.get_weights()
        params[f"bn{i}"] = {"bias": beta}
        stats[f"bn{i}"] = {"mean": mean, "var": var}
    return params, stats


def keras_inception_resnet_v2_to_flax(keras_model):
    """keras.applications.InceptionResNetV2 (include_top=False) ->
    (params, batch_stats) for :class:`models.inception.InceptionResNetV2`.

    Keras leaves branch convs auto-named (``conv2d_N`` — creation order in
    the uid) but names each residual block's biased projection
    (``block35_{i}_conv`` etc., no BN) and the closing ``conv_7b``. The
    mapping replays the construction sequence: bias-free convs consume the
    uid-sorted unnamed conv/BN streams; biased projections resolve by
    block name.
    """
    def uid(layer):
        tail = layer.name.rsplit("_", 1)[-1]
        return int(tail) if tail.isdigit() else -1

    layers = {l.name: l for l in keras_model.layers}
    unnamed_convs = sorted(
        (l for l in keras_model.layers
         if l.__class__.__name__ == "Conv2D"
         and l.name.startswith("conv2d")), key=uid)
    unnamed_bns = sorted(
        (l for l in keras_model.layers
         if l.__class__.__name__ == "BatchNormalization"
         and l.name.startswith("batch_normalization")), key=uid)

    # construction sequence: ('u',) = unnamed bias-free conv+BN;
    # ('b', name) = named biased projection (no BN)
    seq = [("u",)] * 5 + [("u",)] * 7                       # stem + mixed_5b
    for i in range(1, 11):
        seq += [("u",)] * 6 + [("b", f"block35_{i}_conv")]
    seq += [("u",)] * 4                                     # mixed_6a
    for i in range(1, 21):
        seq += [("u",)] * 4 + [("b", f"block17_{i}_conv")]
    seq += [("u",)] * 7                                     # mixed_7a
    for i in range(1, 11):
        seq += [("u",)] * 4 + [("b", f"block8_{i}_conv")]
    seq += [("7b",)]

    assert sum(1 for s in seq if s[0] == "u") == len(unnamed_convs) == \
        len(unnamed_bns), (len(unnamed_convs), len(unnamed_bns))

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    u = 0
    for k, step in enumerate(seq, start=1):
        if step[0] == "u":
            (kernel,) = unnamed_convs[u].get_weights()
            beta, mean, var = unnamed_bns[u].get_weights()
            u += 1
        elif step[0] == "b":
            kernel, bias = layers[step[1]].get_weights()
            params[f"conv{k}"] = {"kernel": kernel, "bias": bias}
            continue
        else:  # conv_7b: named, bias-free, named BN
            (kernel,) = layers["conv_7b"].get_weights()
            beta, mean, var = layers["conv_7b_bn"].get_weights()
        params[f"conv{k}"] = {"kernel": kernel}
        params[f"bn{k}"] = {"bias": beta}
        stats[f"bn{k}"] = {"mean": mean, "var": var}
    return params, stats


def keras_vgg_to_flax(keras_model):
    """keras.applications.VGG16/19 (include_top=False) -> params for
    :class:`models.vgg.VGG` — names match 1:1 (``block{b}_conv{c}``)."""
    params: Dict[str, Any] = {}
    for layer in keras_model.layers:
        if layer.__class__.__name__ == "Conv2D":
            k, b = layer.get_weights()
            params[layer.name] = {"kernel": k, "bias": b}
    return params


def keras_xception_to_flax(keras_model):
    """keras.applications.Xception (include_top=False) -> (params,
    batch_stats) for :class:`models.xception.Xception`.

    The main path is explicitly named on both sides (``block{i}_conv{j}``
    / ``block{i}_sepconv{j}`` + ``_bn``); keras SeparableConv2D weights
    ``[depthwise (H,W,C,1), pointwise (1,1,C,F)]`` split into our ``_dw``
    (transposed to feature_group_count layout) / ``_pw`` conv pair. The
    four 1x1 shortcut convs+BNs are keras-auto-named — they are taken in
    creation order (name-suffix sort, like ``keras_inceptionv3_to_flax``)
    and assigned to blocks 2, 3, 4, 13.
    """
    def uid(layer):
        tail = layer.name.rsplit("_", 1)[-1]
        return int(tail) if tail.isdigit() else -1

    layers = {l.name: l for l in keras_model.layers}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def named_bn(flax_name, keras_name):
        params[flax_name], stats[flax_name] = _bn_params(layers[keras_name])

    for j in (1, 2):
        (kernel,) = layers[f"block1_conv{j}"].get_weights()
        params[f"block1_conv{j}"] = {"kernel": kernel}
        named_bn(f"block1_conv{j}_bn", f"block1_conv{j}_bn")

    sep_blocks = ([(b, j) for b in range(2, 14) for j in (1, 2)]
                  + [(b, 3) for b in range(5, 13)]
                  + [(14, 1), (14, 2)])
    for b, j in sep_blocks:
        name = f"block{b}_sepconv{j}"
        dw, pw = layers[name].get_weights()
        params[f"{name}_dw"] = {"kernel": np.transpose(dw, (0, 1, 3, 2))}
        params[f"{name}_pw"] = {"kernel": pw}
        named_bn(f"{name}_bn", f"{name}_bn")

    res_convs = sorted((l for l in keras_model.layers
                        if l.__class__.__name__ == "Conv2D"
                        and not l.name.startswith("block")), key=uid)
    res_bns = sorted((l for l in keras_model.layers
                      if l.__class__.__name__ == "BatchNormalization"
                      and not l.name.startswith("block")), key=uid)
    assert len(res_convs) == len(res_bns) == 4, (
        [l.name for l in res_convs], [l.name for l in res_bns])
    for block, conv, bnl in zip((2, 3, 4, 13), res_convs, res_bns):
        (kernel,) = conv.get_weights()
        params[f"block{block}_res_conv"] = {"kernel": kernel}
        params[f"block{block}_res_bn"], stats[f"block{block}_res_bn"] = \
            _bn_params(bnl)
    return params, stats


def keras_nasnet_to_flax(keras_model):
    """keras.applications.NASNetMobile/Large (include_top=False) ->
    (params, batch_stats) for :class:`models.nasnet.NASNet`.

    Our module reuses the keras layer names verbatim, so the mapping is a
    pure name walk: Conv2D -> ``{name}``, SeparableConv2D -> ``{name}_dw``
    (depthwise kernel transposed to feature_group_count layout) +
    ``{name}_pw``, BatchNormalization -> ``{name}``.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for layer in keras_model.layers:
        cls = layer.__class__.__name__
        if cls == "Conv2D":
            (kernel,) = layer.get_weights()
            params[layer.name] = {"kernel": kernel}
        elif cls == "SeparableConv2D":
            dw, pw = layer.get_weights()
            params[f"{layer.name}_dw"] = {
                "kernel": np.transpose(dw, (0, 1, 3, 2))}
            params[f"{layer.name}_pw"] = {"kernel": pw}
        elif cls == "BatchNormalization":
            params[layer.name], stats[layer.name] = _bn_params(layer)
    return params, stats
