"""Multi-host (pod-slice / multi-slice) runtime setup.

The reference is strictly single-process, single-device (SURVEY.md §2.6);
this module is the DCN-spanning part of its replacement. Responsibilities:

- process bootstrap: `initialize()` wraps jax.distributed.initialize — every
  host in the slice runs the same program (SPMD), the JAX runtime wires the
  coordination service, and jax.devices() becomes the global device list.
- hybrid mesh construction: `make_hybrid_mesh` lays out ('dp','ep','tp') so
  that `tp` maps onto ICI-adjacent devices within a slice and the `dp`/`ep`
  axes span slices over DCN — collectives for tensor parallelism ride ICI,
  only data/expert redistribution crosses DCN (the layout rule BASELINE.json
  targets for ≥1.8x 2-host scaling).

Nothing here can reach a real pod from this single-chip dev box; the unit
tests (tests/test_distributed.py) drive the topology math — DCN-packing
validation, hybrid-mesh device ordering, per-host batch slicing — with
synthetic device objects, and `dryrun_multichip` exercises the sharded
step on a virtual mesh.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import AXES, MeshConfig


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the multi-process JAX runtime (call once per host, before
    any computation).

    With no arguments, relies on the TPU environment's auto-detection (GKE /
    Cloud TPU metadata); explicit args support manual clusters. Safe to call
    in single-process settings (no-op if distribution is unavailable).
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        # Silently degrading a REAL multi-host job to single-process would
        # hang the other hosts in collective init or shard over a fraction
        # of the mesh. Only swallow the failure when the caller gave no
        # explicit cluster (dev boxes, tests: auto-detection then fails
        # with "coordinator_address should be defined" in a fresh process,
        # or "backends are initialized" once jax is up) AND the caller
        # didn't opt out via YALM_REQUIRE_DISTRIBUTED.
        no_cluster = coordinator_address is None and num_processes is None
        if not no_cluster or os.environ.get("YALM_REQUIRE_DISTRIBUTED"):
            raise RuntimeError(f"jax.distributed.initialize failed: {e}") from e


def make_hybrid_mesh(mcfg: MeshConfig, *, devices=None,
                     process_is_granule: bool = True) -> Mesh:
    """Build a ('dp','ep','tp') mesh whose `tp` axis stays inside a host's
    ICI domain and whose dp/ep axes span hosts (DCN).

    Layout rule: sort devices by (process_index, device id) and reshape to
    (dp, ep, tp) with tp fastest — contiguous on-host devices become the tp
    groups. This is create_hybrid_device_mesh's behavior specialized to our
    fixed axis order, without requiring equal slice topologies.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if mcfg.n_devices != len(devices):
        raise ValueError(f"mesh {mcfg} wants {mcfg.n_devices} devices, have {len(devices)}")
    if process_is_granule:
        devices.sort(key=lambda d: (d.process_index, getattr(d, "id", 0)))
    per_host = {}
    for d in devices:
        per_host.setdefault(d.process_index, []).append(d)
    n_local = len(next(iter(per_host.values())))
    if len(per_host) > 1:
        # tp groups must tile exactly into hosts (or hosts into groups),
        # else some group straddles DCN and every block's psum crosses it
        ok = (mcfg.tp <= n_local and n_local % mcfg.tp == 0) or \
             (mcfg.tp > n_local and mcfg.tp % n_local == 0)
        if not ok:
            raise ValueError(
                f"tp={mcfg.tp} does not pack into hosts with {n_local} local "
                f"devices; tp groups would straddle DCN")
    arr = np.asarray(devices).reshape(mcfg.dp, mcfg.ep, mcfg.tp)
    return Mesh(arr, AXES)


def local_batch_slice(global_batch: int, mesh: Mesh) -> slice:
    """The [start, stop) rows of the global batch this process owns (for
    feeding per-host request queues under dp sharding)."""
    procs = sorted({d.process_index for d in mesh.devices.flat})
    me = jax.process_index()
    if me not in procs:
        raise RuntimeError("this process owns no devices in the mesh")
    n = len(procs)
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    per = global_batch // n
    idx = procs.index(me)
    return slice(idx * per, (idx + 1) * per)
