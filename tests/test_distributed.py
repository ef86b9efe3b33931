"""Unit tests for the multi-host topology math (parallel/distributed.py).

No real multi-host runtime exists in this environment, so the tests drive
the pure logic with synthetic device objects carrying fake process_index
values — the DCN-packing validation, the hybrid-mesh device ordering, and
the per-host batch slicing all execute without a pod.
"""

import numpy as np
import pytest
import types

import jax

import yalm_tpu.parallel.distributed as dist
from yalm_tpu.parallel.distributed import (initialize, local_batch_slice,
                                           make_hybrid_mesh)
from yalm_tpu.parallel.mesh import MeshConfig


class FakeDev:
    def __init__(self, proc, did):
        self.process_index = proc
        self.id = did

    def __repr__(self):
        return f"d{self.process_index}.{self.id}"


def _fakes(n_hosts, per_host):
    return [FakeDev(p, p * per_host + i)
            for p in range(n_hosts) for i in range(per_host)]


@pytest.fixture
def mesh_stub(monkeypatch):
    """Capture the (device_array, axes) Mesh would be built from."""
    built = {}

    def fake_mesh(arr, axes):
        built["arr"] = np.asarray(arr)
        built["axes"] = axes
        return built

    monkeypatch.setattr(dist, "Mesh", fake_mesh)
    return built


def test_initialize_single_process_is_noop():
    # must not raise and must not try to bring up a cluster
    initialize(num_processes=1)
    initialize(num_processes=0)


def test_hybrid_mesh_single_host(mesh_stub):
    devs = _fakes(1, 8)
    make_hybrid_mesh(MeshConfig(dp=2, ep=2, tp=2), devices=devs)
    arr = mesh_stub["arr"]
    assert arr.shape == (2, 2, 2)
    assert mesh_stub["axes"] == ("dp", "ep", "tp")


def test_hybrid_mesh_tp_inside_hosts(mesh_stub):
    """tp groups must be ICI-contiguous: with 2 hosts x 4 local devices and
    tp=4, each tp group is exactly one host; dp spans hosts (DCN)."""
    devs = _fakes(2, 4)
    make_hybrid_mesh(MeshConfig(dp=2, ep=1, tp=4), devices=devs)
    arr = mesh_stub["arr"]
    assert arr.shape == (2, 1, 4)
    # every tp group lives on ONE process
    for dp_i in range(2):
        procs = {d.process_index for d in arr[dp_i, 0]}
        assert len(procs) == 1, arr
    # and the two dp rows live on different processes
    assert arr[0, 0, 0].process_index != arr[1, 0, 0].process_index


def test_hybrid_mesh_orders_by_process(mesh_stub):
    """Devices arriving interleaved across hosts get re-sorted so tp stays
    on-host."""
    devs = _fakes(2, 4)
    shuffled = devs[::2] + devs[1::2]          # interleave host 0/1
    make_hybrid_mesh(MeshConfig(dp=2, ep=1, tp=4), devices=shuffled)
    arr = mesh_stub["arr"]
    for dp_i in range(2):
        assert len({d.process_index for d in arr[dp_i, 0]}) == 1


def test_hybrid_mesh_rejects_dcn_straddling_tp():
    """tp=3 over hosts of 4 local devices: some tp group would straddle DCN
    and every block's psum would cross it — must fail fast."""
    devs = _fakes(4, 4)[:12]
    # rebuild with 3 hosts x 4 locals = 12 devices, tp=3 does not pack
    devs = _fakes(3, 4)
    with pytest.raises(ValueError, match="straddle"):
        make_hybrid_mesh(MeshConfig(dp=4, ep=1, tp=3), devices=devs)


def test_hybrid_mesh_tp_spanning_whole_hosts_ok(mesh_stub):
    """tp larger than a host is allowed when it tiles WHOLE hosts (e.g. a
    pod slice where one tp group = 2 full hosts)."""
    devs = _fakes(4, 2)
    make_hybrid_mesh(MeshConfig(dp=2, ep=1, tp=4), devices=devs)
    arr = mesh_stub["arr"]
    assert arr.shape == (2, 1, 4)
    # each tp group covers exactly 2 whole hosts
    for dp_i in range(2):
        procs = [d.process_index for d in arr[dp_i, 0]]
        assert procs == sorted(procs)
        assert len(set(procs)) == 2


def test_hybrid_mesh_wrong_device_count():
    with pytest.raises(ValueError, match="wants"):
        make_hybrid_mesh(MeshConfig(dp=1, ep=1, tp=4), devices=_fakes(1, 8))


def test_local_batch_slice(monkeypatch):
    devs = np.asarray(_fakes(4, 2)).reshape(4, 1, 2)
    mesh = types.SimpleNamespace(devices=devs)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert local_batch_slice(16, mesh) == slice(8, 12)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert local_batch_slice(16, mesh) == slice(0, 4)


def test_local_batch_slice_rejects_indivisible(monkeypatch):
    devs = np.asarray(_fakes(4, 2)).reshape(4, 1, 2)
    mesh = types.SimpleNamespace(devices=devs)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    with pytest.raises(ValueError, match="divisible"):
        local_batch_slice(10, mesh)


def test_local_batch_slice_foreign_process(monkeypatch):
    devs = np.asarray(_fakes(2, 4)).reshape(2, 1, 4)
    mesh = types.SimpleNamespace(devices=devs)
    monkeypatch.setattr(jax, "process_index", lambda: 7)
    with pytest.raises(RuntimeError, match="owns no devices"):
        local_batch_slice(8, mesh)
