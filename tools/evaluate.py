#!/usr/bin/env python
"""Evaluation CLI: ``python tools/evaluate.py <config.yml> --weights W
--encodings E`` -> recall@1 / recall@5 over the validation split.

The standalone face of ``calculate_prediction_accuracy``
(``embedding_net/models.py:144-161`` — which the reference exposes only as
an API method and which crashes on its undefined ``images_paths``).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description="Evaluate retrieval recall")
    parser.add_argument("config", help="model config file path")
    parser.add_argument("--weights", required=True,
                        help="base-model weights file (msgpack)")
    parser.add_argument("--encodings", required=True,
                        help="encodings pickle file (the retrieval DB)")
    parser.add_argument("--tsne", default=None,
                        help="also write a t-SNE plot of the DB to this dir")
    return parser.parse_args()


def main():
    args = parse_args()
    from embeddingnet_tpu.config import parse_params
    from embeddingnet_tpu.data import ENDataLoader
    from embeddingnet_tpu.models import EmbeddingNet

    params = parse_params(args.config)
    data_loader = ENDataLoader(**{
        k: params.dataloader[k] for k in params.dataloader.keys()})
    model = EmbeddingNet(params)
    model.load_model(args.weights)
    model.load_encodings(args.encodings)

    acc = model.calculate_prediction_accuracy(data_loader)
    print(f"recall@1={acc['top1']:.4f} recall@5={acc['top5']:.4f} "
          f"(val images: {len(data_loader.flat('val')[0])}, "
          f"db: {len(model.encoded_training_data['labels'])})")

    if args.tsne:
        from embeddingnet_tpu.utils.viz import plot_tsne
        out = plot_tsne(args.encodings, args.tsne)
        print(f"t-SNE written to {out}")


if __name__ == "__main__":
    main()
