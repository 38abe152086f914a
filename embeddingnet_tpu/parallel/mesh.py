"""Device-mesh construction from the MESH config section.

``MESH.data = -1`` -> all devices on the data axis (pure DP, the
reference-parity strategy scaled the TPU way); ``MESH.model > 1`` reserves
an inner axis for parameter sharding of very large embedding heads.
Multi-host: callers run ``jax.distributed.initialize`` before building the
mesh — device enumeration is global, shardings below are host-agnostic,
DCN handles the cross-host legs of the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed():
    """Multi-host bring-up: call ``jax.distributed.initialize`` when the
    standard coordination env vars are present (no-op on single host).
    The reference's analog is CUDA_VISIBLE_DEVICES plumbing
    (``tools/train.py:124-131``); here process coordination is JAX's and
    cross-host collectives ride DCN automatically."""
    import os
    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if not addr:
        return
    # jax.distributed.initialize() only auto-detects inside managed
    # clusters (GKE/Slurm); generic launches pass topology explicitly.
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def build_mesh(data: int = -1, model: int = 1,
               devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, have {n}")
    arr = np.array(devices[:data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over ``data``, everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_row_block(mesh: Mesh, global_batch: int):
    """``[lo, hi)`` of the global batch's leading axis owned by THIS
    process under :func:`batch_sharding`.

    Multi-process feeding contract (the TPU-native analog of the
    reference's per-GPU batch split inside MirroredStrategy,
    ``tools/train.py:121-140``): every process samples the identical
    global batch (same seeds), decodes only its block, and
    ``jax.make_array_from_process_local_data`` assembles the global
    array. That requires each process's rows to be one contiguous,
    equal-sized block — true for meshes built by :func:`build_mesh`
    from the global device enumeration; asserted here so an exotic
    device order fails loudly instead of feeding permuted rows.
    """
    sh = batch_sharding(mesh)
    spans = []
    for idx in sh.addressable_devices_indices_map((global_batch,)).values():
        s = idx[0]
        spans.append((s.start or 0,
                      global_batch if s.stop is None else s.stop))
    spans.sort()
    lo, hi = spans[0][0], max(h for _, h in spans)
    cover = lo
    for s, h in spans:
        if s > cover:
            raise ValueError(
                f"process {jax.process_index()} owns non-contiguous batch "
                f"rows {spans}; per-process feeding needs one block")
        cover = max(cover, h)
    if cover != hi:
        raise ValueError(f"gap in process batch rows {spans}")
    expect = global_batch // jax.process_count()
    if hi - lo != expect:
        raise ValueError(
            f"process row block [{lo},{hi}) is not the equal "
            f"{expect}-row share of global batch {global_batch}")
    return lo, hi


def put_process_local_batch(x_local: np.ndarray, mesh: Mesh,
                            global_batch: int):
    """Assemble a global device array from this process's local row block
    (rows ``process_row_block(mesh, global_batch)`` of the logical global
    batch), sharded over the ``data`` axis."""
    x_local = np.asarray(x_local)
    global_shape = (global_batch,) + x_local.shape[1:]
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh), x_local, global_shape)
