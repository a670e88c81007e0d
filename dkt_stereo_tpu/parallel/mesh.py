"""Device mesh + sharding helpers (the reference's entire parallelism story is
single-process ``nn.DataParallel``, tools/ft_dkt.py:119-125 — see SURVEY.md
§2.7 for the mapping).

TPU-native model:
  - a 1-D ``Mesh(('data',))`` over all chips (optionally 2-D
    ``('data','spatial')`` for H-dim sharding of very large images — stereo
    correlation is row-local so the corr kernel needs no halo exchange);
  - batches sharded over 'data' with NamedSharding; params/state replicated;
  - gradient all-reduce is inserted by XLA when the jitted train step closes
    over sharded inputs — no explicit collectives in model code;
  - multi-host via ``jax.distributed.initialize()`` + per-host data loading.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
    axis_sizes: Optional[Sequence[int]] = None,
) -> Mesh:
    """Mesh over the first ``n_devices`` devices.

    Multi-axis meshes take their shape from ``axis_sizes`` (a ``-1`` entry is
    inferred, numpy-reshape style); with no ``axis_sizes`` the trailing axes
    get as many devices as divide evenly, preferring the LAST axis — for
    ('data','spatial') that puts adjacent devices on 'spatial', so the
    halo/stat collectives of H-dim sharding ride neighbor ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available (a silent shrink "
                "would change shard geometry under the caller)"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    elif axis_sizes is not None:
        assert len(axis_sizes) == len(axis_names), (axis_sizes, axis_names)
        shape = tuple(axis_sizes)
    else:
        # split evenly: last axis gets the largest power-of-two factor ≤ √n
        last = 1
        while last * 2 <= max(1, int(n**0.5)) and n % (last * 2) == 0:
            last *= 2
        shape = (n // last,) + (1,) * (len(axis_names) - 2) + (last,)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Pytree of per-HOST (B_local, ...) arrays → global arrays with the batch
    dim sharded over ``axis``. Single-process: a plain sharded device_put.
    Multi-process: each host's batch becomes its slice of the
    (B_local·num_hosts, ...) global batch (the loader already hands each host
    a disjoint shard — data/loader.py num_hosts/host_id)."""
    sh = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
    )


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (params, optimizer state).
    Multi-process: every host holds the full value (states are created
    identically from the same seed / checkpoint on every host), so the
    process-local data IS the global value."""
    sh = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x), global_shape=np.shape(x)
        ),
        tree,
    )


def cross_replica_batch_stats(mean, var, axis_name: str = "data"):
    """Cross-replica BatchNorm statistics — the TPU equivalent of the
    reference's ``_SyncBatchNorm`` affordance (meta_arch/igev_stereo/
    submodule.py:262-331, defined but never called; BN is frozen in the DKT
    fine-tune anyway). Call inside shard_map/pmap-style code when training BN
    across the data axis: psum-averaged mean and unbiased-combined variance."""
    import jax

    n = jax.lax.psum(1.0, axis_name)
    g_mean = jax.lax.psum(mean, axis_name) / n
    # E[x²] combine: var_i + mean_i² averaged, minus global mean²
    g_var = jax.lax.psum(var + mean**2, axis_name) / n - g_mean**2
    return g_mean, g_var


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up (DCN): thin wrapper over jax.distributed.initialize.

    No-op when running single-process (the common case on one host/slice)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
