"""Multi-process Trainer worker + shared config for the multi-host
training parity test (``tests/test_multiprocess_train.py``).

Run as a subprocess per process, with ``JAX_COORDINATOR_ADDRESS`` /
``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` set and
``XLA_FLAGS=--xla_force_host_platform_device_count=K`` so 2 real OS
processes x K virtual CPU devices form a 2K-device global mesh — the
closest a single host gets to a 2-host DCN slice (SURVEY.md §2.3
multi-host DP). The worker mirrors ``tools/train.py``'s bring-up order:
distributed init BEFORE any jax device use, then the ordinary Trainer.

Parity design (measured, not assumed): from bit-identical global
batches and initial params, the 2-process step-0 loss matches the
single-process 8-device run to ~5e-7 — pure reduction-order noise in
the cross-process collective implementations — but semihard mining is
DISCRETE (a negative flips on any distance perturbation), so by step 3
the trajectories visibly fork (0.056 vs 0.177 observed on the tiny
config). Full-trajectory bit parity across topologies is therefore not
a property this (or any) framework has; the test asserts what
multi-process code can actually break: global-batch assembly is
bit-identical, the first jitted step computes the same global math
(1e-4), every process stays in exact lockstep, and collective
checkpoint + resume work end to end.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def mp_cfg(dataset: str, workdir: str) -> dict:
    """One tiny triplet config shared by the multi-process workers and
    the single-process reference leg — parity demands identical configs.
    Global batch 8 divides the 8-device data axis; k_samples=2 arms the
    P-K compare-reduce miner paths (the production configuration)."""
    return {
        "MODEL": {"input_shape": [32, 32, 3], "encodings_len": 32,
                  "mode": "triplet", "distance_type": "l2",
                  "backbone_name": "simple2", "backbone_weights": None,
                  "embeddings_normalization": True},
        "DATALOADER": {"dataset_path": dataset, "validate": True,
                       "val_ratio": 0.2},
        "GENERATOR": {"negatives_selection_mode": "semihard",
                      "k_classes": 4, "k_samples": 2, "margin": 0.5,
                      "batch_size": 8, "n_batches": 4, "n_batches_val": 2},
        "TRAIN": {"optimizer": "adam", "learning_rate": 0.001,
                  "decay_factor": 0.99, "step_size": 1, "n_epochs": 2,
                  "plot_history": False},
        "ENCODINGS": {"save_encodings": False},
        "GENERAL": {"project_name": "mp_proj", "work_dir": workdir,
                    "seed": 0},
        "MESH": {"data": -1},
        "PERFORMANCE": {"compute_dtype": "float32"},
    }


def probe_first_epoch(params, dataset) -> dict:
    """Feed-parity probe: drive epoch 0's full feed path (sampler ->
    process slice -> decode -> global-array assembly -> jitted step) on
    a throwaway Trainer, recording the ASSEMBLED GLOBAL batches and the
    per-step losses. The global batches must be bit-identical across
    topologies — that is the multi-process feeding contract."""
    import numpy as np
    from embeddingnet_tpu.data import ENDataLoader
    from embeddingnet_tpu.train import Trainer
    from embeddingnet_tpu.train.loop import host_copy

    loader = ENDataLoader(dataset, validate=True, val_ratio=0.2)
    t = Trainer(params, loader, log_fn=lambda *a, **k: None)
    t._current_epoch = 0
    out, losses = {}, []
    for i, (images, targets) in enumerate(t._device_prefetch(
            t._check_pk_layout(t._train_loader()))):
        out[f"probe_im{i}"] = host_copy(images)
        out[f"probe_lab{i}"] = host_copy(targets)
        t.state, metrics = t._dispatch_train((images, targets))
        losses.append(float(metrics["loss"]))
    out["probe_losses"] = np.asarray(losses, np.float64)
    t.ckpt_mgr.close()
    return out


def fit_resume_fit(params, dataset):
    """fit(1) -> close -> resume -> fit(to 2): the exact sequence both
    the multi-process workers and the single-process leg run, so the
    run covers collective checkpoint save + restore too.  Returns the
    resumed trainer, its history, and the FIRST fit's history."""
    from embeddingnet_tpu.data import ENDataLoader
    from embeddingnet_tpu.train import Trainer
    loader = ENDataLoader(dataset, validate=True, val_ratio=0.2)
    t1 = Trainer(params, loader, log_fn=lambda *a, **k: None)
    hist1 = t1.fit(n_epochs=1)
    t1.ckpt_mgr.close()
    t2 = Trainer(params, loader, log_fn=lambda *a, **k: None).resume()
    history = t2.fit(n_epochs=2)
    return t2, history, hist1


def run_leg(dataset: str, workdir: str) -> dict:
    """Probe + full fit/resume/fit; returns everything the parity
    assertions consume, as host numpy. Shared verbatim by the worker
    subprocesses and the in-process single-process leg."""
    import jax
    import numpy as np
    from embeddingnet_tpu.config import params_from_dict
    from embeddingnet_tpu.train.loop import host_copy

    res = probe_first_epoch(
        params_from_dict(mp_cfg(dataset, workdir + "_probe")), dataset)
    params = params_from_dict(mp_cfg(dataset, workdir))
    trainer, history, hist1 = fit_resume_fit(params, dataset)
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(host_copy, trainer.state.params))
    res.update(
        loss=np.asarray(history.history["loss"], np.float64),
        val_loss=np.asarray(history.history["val_loss"], np.float64),
        loss0=np.asarray(hist1.history["loss"], np.float64),
        val_loss0=np.asarray(hist1.history["val_loss"], np.float64),
        **{f"p{i}": x for i, x in enumerate(leaves)})
    return res


def main():
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from embeddingnet_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np
    res = run_leg(os.environ["EN_MP_DATASET"], os.environ["EN_MP_WORKDIR"])
    np.savez(f"{os.environ['EN_MP_OUT']}.{jax.process_index()}.npz", **res)
    print(f"MP_WORKER_OK {jax.process_index()}")


if __name__ == "__main__":
    main()
