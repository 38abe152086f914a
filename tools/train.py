#!/usr/bin/env python
"""Train CLI: ``python tools/train.py <config.yml> [--resume_from EPOCH]``.

Same public surface as the reference CLI (``tools/train.py:24-31``):
config-driven, optional resume, work-dir layout
``work_dirs/<project>/{weights,encodings,plots,tf_log,...}``
(``tools/train.py:33-50``), optional softmax pretraining, history plots.
``--resume_from`` takes a checkpoint epoch number (or ``latest``) instead
of an .hdf5 path — full train-state resume, not weights-only.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(
        description="Train a metric-learning embedding model (TPU-native)")
    parser.add_argument("config", help="model config file path")
    parser.add_argument("--resume_from", default=None,
                        help="checkpoint epoch to resume from, or 'latest'")
    return parser.parse_args()


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeat CLI invocations skip the
    (minutes-long on remote-compile setups) first jit."""
    import jax
    cache_dir = os.environ.get("EMBEDDINGNET_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/embeddingnet_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main():
    args = parse_args()
    _enable_compile_cache()
    # multi-host bring-up (no-op on single host)
    from embeddingnet_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()

    print("LOAD PARAMETERS")
    from embeddingnet_tpu.config import parse_params
    params = parse_params(args.config)
    print("LOADING COMPLETED")

    print("CREATE DATALOADER")
    from embeddingnet_tpu.data import ENDataLoader
    data_loader = ENDataLoader(**{
        k: params.dataloader[k] for k in params.dataloader.keys()})
    print(f"DATALOADER CREATED! classes={data_loader.n_classes}")

    print("CREATE MODEL AND TRAINER")
    from embeddingnet_tpu.train import Trainer
    trainer = Trainer(params, data_loader)
    print("DONE")

    if args.resume_from is not None:
        epoch = None if args.resume_from == "latest" else int(
            args.resume_from)
        trainer.resume(epoch)

    if params.softmax is not None:
        print("SOFTMAX PRETRAINING")
        trainer.pretrain_softmax()

    history = trainer.fit()
    # Export the best-monitored epoch, not wherever the loop halted (the
    # manager is save_best_only — its latest checkpoint IS the best).
    # Collective in multi-process (Orbax restore), so before the guard.
    trainer.restore_best()

    import jax
    if jax.process_index() != 0:
        # export/plots/encodings are process-0 work; wait so the
        # coordinator (process 0) outlives every worker
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("embeddingnet_export_done")
        return

    if params.train.plot_history:
        from embeddingnet_tpu.utils.viz import plot_grapths
        plot_grapths(history, trainer.paths["plots"])

    # export the trained encoder in the format test.py / serve.py load
    from embeddingnet_tpu.models import EmbeddingNet
    net = EmbeddingNet(params)
    net.variables = (trainer.host_encoder_variables()
                     if jax.process_count() > 1
                     else trainer.encoder_variables())
    net._encode_jit = jax.jit(
        lambda v, x: net.module.apply(v, x, train=False))
    weights_path = net.save_base_model(trainer.paths["work_dir"])
    print(f"base model saved to {weights_path}")

    if params.encodings.save_encodings:
        print("EXPORT ENCODINGS")
        from embeddingnet_tpu.ops.knn import class_centers
        import numpy as np

        db = net.generate_encodings(
            data_loader,
            max_n_samples=params.encodings.max_num_samples_of_each_class)
        if params.encodings.centers_only:
            import jax.numpy as jnp
            classes = sorted(set(db["labels"]))
            ids = np.array([classes.index(l) for l in db["labels"]],
                           np.int32)
            centers = class_centers(jnp.asarray(db["encodings"]),
                                    jnp.asarray(ids), len(classes))
            db = {"paths": [], "labels": classes,
                  "encodings": np.asarray(centers)}
        net.save_encodings(db, trainer.paths["encodings"])
        print(f"encodings saved to {trainer.paths['encodings']}")

        if data_loader.validate and data_loader.val_data:
            net.encoded_training_data = db
            acc = net.calculate_prediction_accuracy(data_loader)
            print(f"recall@1={acc['top1']:.4f} recall@5={acc['top5']:.4f}")

    if jax.process_count() > 1:
        # release the workers parked at the matching barrier above
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("embeddingnet_export_done")


if __name__ == "__main__":
    main()
