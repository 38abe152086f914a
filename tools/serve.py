#!/usr/bin/env python
"""Serving CLI: ``python tools/serve.py <config.yml> --weights W
--encodings E [--host H] [--port P]``.

HTTP inference over the trained encoder + encodings database with
micro-batched device execution (see :mod:`embeddingnet_tpu.serving`).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description="Serve a trained model")
    parser.add_argument("config", help="model config file path")
    parser.add_argument("--weights", required=True,
                        help="base-model weights file (msgpack)")
    parser.add_argument("--encodings", required=True,
                        help="encodings pickle file")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max_batch", type=int, default=32)
    parser.add_argument("--quantize_db", action="store_true",
                        help="int8-quantize the encodings DB (4x less "
                             "memory, int8 MXU matmuls)")
    return parser.parse_args()


def main():
    args = parse_args()
    from embeddingnet_tpu.config import parse_params
    from embeddingnet_tpu.models import EmbeddingNet
    from embeddingnet_tpu.serving import InferenceEngine, make_server

    params = parse_params(args.config)
    net = EmbeddingNet(params)
    net.load_model(args.weights)
    net.load_encodings(args.encodings)
    engine = InferenceEngine(net, max_batch=args.max_batch,
                             quantize_db=args.quantize_db)
    server = make_server(engine, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port} "
          f"(backbone={params.model.backbone_name}, "
          f"db={len(engine.labels)} encodings)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.close()


if __name__ == "__main__":
    main()
