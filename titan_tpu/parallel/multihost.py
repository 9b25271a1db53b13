"""Multi-host (multi-process) plumbing: initialization, global meshes, and
the host-0 control-plane pattern.

The reference is strictly single-GPU/single-process (SURVEY.md section
5.8); everything here is new TPU-native design.  The intended deployment
shapes, in order of preference (docs/MULTIHOST.md has the full rationale):

  1. ONE HOST / ONE SLICE (the default everywhere else in this package):
     all device-to-device traffic is ICI; no process coordination at all.
  2. MULTI-HOST, DATA-PARALLEL ENVS: each process owns whole flat-packed
     environment batches (rl.BatchedEnv / parallel.flat); the only
     cross-host traffic is learner all-reduces (psum over the 'hosts'
     axis) riding DCN -- physics never crosses a host.
  3. MULTI-HOST, ONE GIANT SCENE: the halo path's 1-D block sharding maps
     onto a (hosts, devices/host) mesh laid out so that consecutive blocks
     share a host; exactly TWO of the N block boundaries per host pair
     cross DCN (the halo ppermute edges), everything else is ICI.  The
     per-step DCN payload is 2 * halo_width * 3 vec3 lanes -- kilobytes --
     so DCN latency, not bandwidth, sets the step-rate floor.

Control plane: scene construction, breakpoints, and get/set run on EVERY
process (single-controller-style SPMD: the host code is replicated and
must stay deterministic); device state lives sharded across processes.
``host_gather`` materializes a full array on every host for readback
(jax.experimental.multihost_utils.process_allgather); pushes re-use the
normal functional set() path since every process computes the same update
from the same (replicated) host store.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..runtime.logging import get_logger


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Join (or bootstrap) a multi-process JAX runtime.

    Thin wrapper over ``jax.distributed.initialize`` so user code and the
    docs have one titan-named entry point.  On Cloud TPU pods all three
    arguments are auto-detected from the environment and may be omitted;
    for CPU/GPU clusters pass them explicitly.  Must be called before any
    other JAX API touches the backend.  No-op (with a warning) if the
    distributed runtime is already initialized.
    """
    # NB: must not touch jax.devices()/process_count() before initialize --
    # they initialize the backend, after which initialize() is an error
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        get_logger().warning(
            "titan_tpu.parallel.multihost.initialize: distributed runtime "
            "already initialized (process %d of %d); ignoring",
            jax.process_index(), jax.process_count())
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    get_logger().info("multihost: process %d/%d up, %d global devices "
                      "(%d local)", jax.process_index(), jax.process_count(),
                      len(jax.devices()), len(jax.local_devices()))


def make_global_mesh(axis_names: Sequence[str] = ("shard",),
                     shape: Optional[Sequence[int]] = None) -> Mesh:
    """A mesh spanning every device of every process.

    With the default 1-D shape, devices are ordered so that each process's
    local devices are CONTIGUOUS along the axis (jax.devices() order): the
    halo path's block-sharding then puts consecutive mass blocks on one
    host and only the two blocks at each host boundary exchange halos over
    DCN (deployment shape 3 above).  For shape 2 (data-parallel envs) pass
    axis_names=("hosts", "dp") and shape=(process_count, local_count).
    """
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (devices.size,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != devices.size:
        raise ValueError(f"mesh shape {tuple(shape)} != {devices.size} "
                         "global devices")
    return Mesh(devices.reshape(shape), axis_names=tuple(axis_names))


def host_gather(x):
    """Materialize a (possibly cross-process-sharded) array on every host.

    Single-process: a plain device_get.  Multi-process: a DCN allgather
    via multihost_utils, so every host's control plane sees the same full
    array for readback (the getAll() analog).
    """
    if jax.process_count() == 1:
        return jax.device_get(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def assert_replicated_control_plane(value: float, name: str = "value"):
    """Debug guard for the replicated-host-code invariant: every process
    must compute the same control-plane decision (breakpoint times, edit
    payloads).  Cheap cross-host agreement check; raises on divergence."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    all_vals = np.asarray(multihost_utils.process_allgather(
        np.asarray([value])))
    if not np.allclose(all_vals, all_vals[0]):
        raise RuntimeError(
            f"control-plane divergence: {name} differs across hosts: "
            f"{all_vals.ravel().tolist()}")
