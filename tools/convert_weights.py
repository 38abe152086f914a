#!/usr/bin/env python
"""Convert a locally downloaded pretrained checkpoint into the framework's
backbone-weights format — the zero-egress, end-to-end recipe for the
reference's named-preset transfer learning (``embedding_net/backbones.py:
96-104`` downloads at build; here conversion is an explicit offline step).

Usage:
    python tools/convert_weights.py --backbone efficientnet-b1 \\
        --source keras --input /path/to/effnet_b1_notop.h5 \\
        --preset noisy-student --out $EMBEDDINGNET_WEIGHTS_DIR
    python tools/convert_weights.py --backbone resnet50 --source torch \\
        --input resnet50-imagenet.pth --preset imagenet --out weights/
    python tools/convert_weights.py --backbone vit-l14 --source clip \\
        --input clip_vitl14_vision.pth --preset clip --out weights/

Then set ``MODEL.backbone_weights: '<preset>'`` (with
``$EMBEDDINGNET_WEIGHTS_DIR`` pointing at ``--out``) or give the .npz
path directly. Training loads it through ``pretrained.resolve_weights``
-> ``load_into`` (train/loop.py:171-203): backbone keys load, the
embedding head stays freshly initialized — the reference's
include_top=False transfer semantics.

Sources:
  keras   .h5 / SavedModel via tf.keras.models.load_model (the format
          keras.applications checkpoints ship in)
  torch   .pth/.pt state_dict (torchvision ResNets)
  hf-vit  torch state_dict of transformers.ViTModel
  clip    torch state_dict of transformers.CLIPVisionModel[WithProjection]
          or a full CLIPModel (vision tower extracted)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_torch_state_dict(path):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    # unwrap common checkpoint envelopes
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(
                obj[key], dict):
            obj = obj[key]
    return obj


def _convert(backbone, source, path):
    """-> (params_subtree, batch_stats_subtree_or_None)"""
    from embeddingnet_tpu.models import pretrained

    if source == "torch":
        sd = _load_torch_state_dict(path)
        stages = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
                  "resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
                  "resnet152": (3, 8, 36, 3)}.get(backbone)
        if stages is None:
            raise SystemExit(f"--source torch supports torchvision "
                             f"ResNets, not {backbone!r}")
        return pretrained.torch_resnet_to_flax(sd, stages)

    if source == "hf-vit":
        sd = _load_torch_state_dict(path)
        if not any(k.startswith("vit.") for k in sd):
            sd = {f"vit.{k}": v for k, v in sd.items()}
        depth = 1 + max(int(k.split(".")[3]) for k in sd
                        if k.startswith("vit.encoder.layer."))
        return pretrained.hf_vit_to_flax(sd, depth=depth), None

    if source == "clip":
        sd = _load_torch_state_dict(path)
        prefix = ("vision_model." if any(
            k.startswith("vision_model.") for k in sd) else "")
        depth = 1 + max(
            int(k.split(".")[2 if prefix else 1]) for k in sd
            if k.startswith(f"{prefix}encoder.layers."))
        return pretrained.clip_vit_to_flax(sd, depth=depth), None

    if source == "keras":
        import tensorflow as tf
        keras_model = tf.keras.models.load_model(path, compile=False)
        if backbone.startswith("efficientnet"):
            return pretrained.keras_efficientnet_to_flax(keras_model)
        if backbone == "resnet50":
            return pretrained.keras_resnet50_to_flax(keras_model)
        if backbone == "mobilenetv2":
            return pretrained.keras_mobilenetv2_to_flax(keras_model)
        if backbone == "mobilenet":
            return pretrained.keras_mobilenetv1_to_flax(keras_model)
        if backbone.startswith("densenet"):
            blocks = {"densenet121": (6, 12, 24, 16),
                      "densenet169": (6, 12, 32, 32),
                      "densenet201": (6, 12, 48, 32)}[backbone]
            return pretrained.keras_densenet_to_flax(keras_model, blocks)
        if backbone == "inceptionv3":
            return pretrained.keras_inceptionv3_to_flax(keras_model)
        if backbone == "inceptionresnetv2":
            return pretrained.keras_inception_resnet_v2_to_flax(keras_model)
        if backbone in ("vgg16", "vgg19"):
            return pretrained.keras_vgg_to_flax(keras_model), None
        if backbone == "xception":
            return pretrained.keras_xception_to_flax(keras_model)
        if backbone in ("nasnetmobile", "nasnetlarge"):
            return pretrained.keras_nasnet_to_flax(keras_model)
        raise SystemExit(f"no keras converter for {backbone!r}")

    raise SystemExit(f"unknown --source {source!r}")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--backbone", required=True,
                    help="registry name (models/registry.py)")
    ap.add_argument("--source", required=True,
                    choices=["keras", "torch", "hf-vit", "clip"])
    ap.add_argument("--input", required=True,
                    help="local checkpoint file (no downloads happen here)")
    ap.add_argument("--preset", default="imagenet",
                    help="preset name the config will reference "
                         "(MODEL.backbone_weights)")
    ap.add_argument("--out", required=True,
                    help="output dir (point $EMBEDDINGNET_WEIGHTS_DIR here)")
    args = ap.parse_args()

    from embeddingnet_tpu.models.pretrained import flatten_params

    result = _convert(args.backbone, args.source, args.input)
    params, stats = result if isinstance(result, tuple) else (result, None)

    tree = {"params": {"backbone": params}}
    if stats:
        tree["batch_stats"] = {"backbone": stats}
    flat = flatten_params(tree)

    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out,
                            f"{args.backbone}_{args.preset}.npz")
    np.savez(out_path, **flat)
    n_params = sum(int(np.prod(v.shape)) for v in flat.values())
    print(f"wrote {out_path}: {len(flat)} arrays, "
          f"{n_params / 1e6:.1f}M parameters")
    print(f"use: MODEL.backbone_weights: '{args.preset}' with "
          f"EMBEDDINGNET_WEIGHTS_DIR={args.out}")


if __name__ == "__main__":
    main()
