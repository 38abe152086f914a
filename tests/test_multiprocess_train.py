"""True multi-process (multi-host) training — end to end (VERDICT r4 #1).

2 real OS processes x 4 virtual CPU devices coordinate through
``jax.distributed`` into one 8-device global mesh and run the FULL
Trainer: per-process batch feeding
(``jax.make_array_from_process_local_data`` via
``parallel.mesh.put_process_local_batch``), per-process sampler slicing
with identical cross-process epoch seeds (``ProcessShardSampler``),
collective Orbax checkpoint + resume, process-0-only logging.  Parity is
asserted against the single-process 8-virtual-device run of the exact
same config and fit(1)->resume->fit(2) sequence — the global math must
not care how many processes feed it.  The fast unit tests below cover
the new pieces without spawning processes.

Reference analog: ``/root/reference/tools/train.py:121-140`` (multi-GPU
MirroredStrategy) at the multi-host scale the TPU build targets
(SURVEY.md §2.3, docs/SCALING.md "Multi-host").
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests._mp_worker import REPO, run_leg


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# -- fast unit coverage (no subprocesses) --------------------------------


def test_process_shard_sampler_slices_global_batch():
    from embeddingnet_tpu.data.samplers import ProcessShardSampler

    class FakeSampler:
        batch_size = 8

        def __iter__(self):
            yield ([f"img{i}" for i in range(8)],
                   np.array([0, 0, 1, 1, 2, 2, 3, 3], np.int32))

    shard = ProcessShardSampler(FakeSampler(), 4, 8)
    paths, labels = next(iter(shard))
    assert paths == ["img4", "img5", "img6", "img7"]
    assert labels.tolist() == [2, 2, 3, 3]


def test_process_shard_sampler_tuple_paths_and_global_check():
    from embeddingnet_tpu.data.samplers import ProcessShardSampler

    class FakeTripletSampler:
        batch_size = 4

        def __iter__(self):
            yield ((["a0", "a1", "a2", "a3"], ["p0", "p1", "p2", "p3"],
                    ["n0", "n1", "n2", "n3"]),
                   np.array([0, 0, 1, 1], np.int32))

    seen = []
    shard = ProcessShardSampler(FakeTripletSampler(), 0, 2,
                                global_check=seen.append)
    (a, p, n), labels = next(iter(shard))
    assert (a, p, n) == (["a0", "a1"], ["p0", "p1"], ["n0", "n1"])
    assert labels.tolist() == [0, 0]
    # the check saw the GLOBAL labels, not the slice
    assert seen[0].tolist() == [0, 0, 1, 1]


def test_process_row_block_single_process_owns_everything():
    import jax
    from embeddingnet_tpu.parallel.mesh import build_mesh, process_row_block

    mesh = build_mesh(data=-1)
    lo, hi = process_row_block(mesh, 16)
    assert (lo, hi) == (0, 16)
    assert len(jax.devices()) == 8


def test_put_process_local_batch_matches_device_put():
    import jax
    from embeddingnet_tpu.parallel.mesh import (batch_sharding, build_mesh,
                                                put_process_local_batch)

    mesh = build_mesh(data=-1)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    a = put_process_local_batch(x, mesh, 16)
    b = jax.device_put(x, batch_sharding(mesh))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.sharding == b.sharding


# -- the real thing: 2 OS processes, full Trainer, parity ----------------


@pytest.mark.slow
def test_two_process_trainer_parity(tmp_path, tiny_dataset):
    """2 OS processes x 4 virtual devices vs 1 process x 8 devices.

    What is (and is not) asserted — see the measured rationale in
    ``_mp_worker``'s module docstring: cross-process collectives reduce
    in a different order than the in-process ones (~5e-7 on step-0
    loss), and discrete semihard mining amplifies that fork within a
    few steps, so full-trajectory bit parity across topologies does not
    exist. The multi-process-specific machinery is what's asserted
    tightly: batch assembly, first-step global math, lockstep,
    checkpoint/resume.
    """
    port = _free_port()
    out = str(tmp_path / "mp_result")
    procs = []
    for pid in range(2):
        env = {**os.environ,
               "JAX_PLATFORMS": "cpu",
               "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
               "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
               "JAX_NUM_PROCESSES": "2",
               "JAX_PROCESS_ID": str(pid),
               "EN_MP_DATASET": tiny_dataset,
               "EN_MP_WORKDIR": str(tmp_path / "mp_work"),
               "EN_MP_OUT": out}
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_mp_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO))

    # the single-process 8-device reference leg runs IN this process
    # (conftest forces the same 8-device CPU topology) while the
    # workers run — same config, same probe + fit/resume/fit sequence
    sp = run_leg(tiny_dataset, str(tmp_path / "sp_work"))

    results = [p.communicate(timeout=900) for p in procs]
    for p, (outs, errs) in zip(procs, results):
        assert p.returncode == 0, f"worker failed:\n{errs[-4000:]}"
    assert "MP_WORKER_OK 0" in results[0][0]
    assert "MP_WORKER_OK 1" in results[1][0]

    mp0 = np.load(f"{out}.0.npz")
    mp1 = np.load(f"{out}.1.npz")

    # 1. every process computed the identical run (exact lockstep) —
    #    histories, probe, and every final param leaf, bitwise
    for k in mp0.files:
        np.testing.assert_array_equal(mp0[k], mp1[k], err_msg=k)

    # 2. feeding contract: the ASSEMBLED GLOBAL batches (sampler ->
    #    per-process slice -> decode -> make_array_from_process_local_data)
    #    are bit-identical to the single-process ones
    n_im = sum(1 for k in mp0.files if k.startswith("probe_im"))
    assert n_im == 4  # GENERATOR.n_batches
    for i in range(n_im):
        np.testing.assert_array_equal(mp0[f"probe_im{i}"],
                                      sp[f"probe_im{i}"],
                                      err_msg=f"global batch {i} images")
        np.testing.assert_array_equal(mp0[f"probe_lab{i}"],
                                      sp[f"probe_lab{i}"],
                                      err_msg=f"global batch {i} labels")

    # 3. first jitted step from identical state+batch computes the same
    #    global math (slack = cross-process collective reduction order)
    np.testing.assert_allclose(mp0["probe_losses"][0],
                               sp["probe_losses"][0], rtol=1e-4)

    # 4. the full runs behaved the same way modulo the documented
    #    mining fork: finite, same epoch counts (resume retrained only
    #    epoch 1), same loss scale (gross-error band, NOT parity)
    for k in ["loss0", "val_loss0", "loss", "val_loss"]:
        assert mp0[k].shape == sp[k].shape, k
        assert np.all(np.isfinite(mp0[k])), k
        np.testing.assert_allclose(mp0[k], sp[k], atol=0.25, err_msg=k)
    assert len(mp0["loss0"]) == 1 and len(mp0["loss"]) == 1
