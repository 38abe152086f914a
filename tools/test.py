#!/usr/bin/env python
"""Inference CLI: ``python tools/test.py <config.yml> --weights W
--encodings E --image I``.

The intended contract of the reference's (broken-as-shipped) test CLI
(``tools/test.py:4-25`` — imports a nonexistent module, passes a config
path where params were expected, calls an undefined ``load_encodings``
method): config + weights + encodings DB -> predicted label for one image.
Implemented working, same flags.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description="Test a trained model")
    parser.add_argument("config", help="model config file path")
    parser.add_argument("--weights", required=True,
                        help="base-model weights file (msgpack)")
    parser.add_argument("--encodings", required=True,
                        help="encodings pickle file")
    parser.add_argument("--image", required=True, help="image to classify")
    parser.add_argument("--top5", action="store_true",
                        help="also print the top-5 neighbor labels")
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    cache_dir = os.environ.get("EMBEDDINGNET_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/embeddingnet_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from embeddingnet_tpu.config import parse_params
    from embeddingnet_tpu.models import EmbeddingNet

    params = parse_params(args.config)
    model = EmbeddingNet(params)
    model.load_model(args.weights)
    model.load_encodings(args.encodings)
    if args.top5:
        prediction, top5 = model.predict_knn(args.image, with_top5=True)
        print(prediction)
        print("top5:", top5)
    else:
        prediction = model.predict_knn(args.image)
        print(prediction)


if __name__ == "__main__":
    main()
