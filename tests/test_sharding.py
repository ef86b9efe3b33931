"""Sharding tests on the virtual 8-device CPU mesh: tensor-parallel decode
produces identical logits to single-device, for dense and MoE models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.config import ModelConfig
from yalm_tpu.models import KVCache, decode_step, load_weights, prefill
from yalm_tpu.parallel import MeshConfig, make_mesh, shard_cache, shard_weights
from yalm_tpu.parallel.mesh import validate_divisibility
from yalm_tpu.utils.testing import synth_checkpoint, tiny_config


def _load(tmp_path, cfg):
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg)
    return load_weights(read_yalm(path), cfg)


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(dp=2, ep=1, tp=4))
    assert mesh.devices.shape == (2, 1, 4)
    assert mesh.axis_names == ("dp", "ep", "tp")
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(dp=3, tp=4))


def test_validate_divisibility():
    cfg = tiny_config()  # 2 kv heads, hidden 128
    validate_divisibility(cfg, MeshConfig(tp=2))
    with pytest.raises(ValueError):
        validate_divisibility(cfg, MeshConfig(tp=3))
    with pytest.raises(ValueError):
        validate_divisibility(cfg, MeshConfig(ep=2))  # dense model


@pytest.mark.parametrize("mcfg", [MeshConfig(tp=2), MeshConfig(tp=4), MeshConfig(dp=1, tp=8)])
def test_tp_decode_matches_single_device(tmp_path, mcfg):
    cfg = tiny_config(n_heads=8, n_kv_heads=8, head_dim=8, dim=64,
                      hidden_dim=128, max_seq_len=32, vocab_size=128)
    validate_divisibility(cfg, mcfg)
    weights = _load(tmp_path, cfg)

    # single-device baseline
    cache0 = KVCache.init(cfg)
    ref_logits = []
    toks = [3, 17, 42, 9]
    for pos, t in enumerate(toks):
        lg, cache0 = decode_step(cfg, weights, jnp.int32(t), jnp.int32(pos), cache0)
        ref_logits.append(np.asarray(lg))

    mesh = make_mesh(mcfg, devices=jax.devices()[: mcfg.n_devices])
    sw = shard_weights(weights, cfg, mesh)
    sc = shard_cache(KVCache.init(cfg), cfg, mesh)
    for pos, t in enumerate(toks):
        lg, sc = decode_step(cfg, sw, jnp.int32(t), jnp.int32(pos), sc)
        np.testing.assert_allclose(np.asarray(lg), ref_logits[pos], rtol=1e-4, atol=1e-4)


def test_tp_prefill_matches_single_device(tmp_path):
    cfg = tiny_config(n_heads=8, n_kv_heads=4, head_dim=8, dim=64,
                      hidden_dim=128, max_seq_len=32, vocab_size=128)
    weights = _load(tmp_path, cfg)
    toks = jnp.asarray([5, 9, 2, 6, 5, 3], jnp.int32)

    cache0 = KVCache.init(cfg)
    ref, cache0 = prefill(cfg, weights, toks, jnp.int32(0), jnp.int32(6), cache0,
                          logits_mode="last")

    mesh = make_mesh(MeshConfig(tp=4), devices=jax.devices()[:4])
    sw = shard_weights(weights, cfg, mesh)
    sc = shard_cache(KVCache.init(cfg), cfg, mesh)
    got, sc = prefill(cfg, sw, toks, jnp.int32(0), jnp.int32(6), sc, logits_mode="last")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sc.k), np.asarray(cache0.k), rtol=1e-3, atol=1e-3)


def test_moe_ep_decode_matches_single_device(tmp_path):
    cfg = tiny_config(n_heads=4, n_kv_heads=2, head_dim=8, dim=32, hidden_dim=64,
                      max_seq_len=16, vocab_size=64, n_experts=4, n_experts_active=2)
    mcfg = MeshConfig(ep=2, tp=2)
    validate_divisibility(cfg, mcfg)
    weights = _load(tmp_path, cfg)

    cache0 = KVCache.init(cfg)
    ref, cache0 = decode_step(cfg, weights, jnp.int32(7), jnp.int32(0), cache0)

    mesh = make_mesh(mcfg, devices=jax.devices()[: mcfg.n_devices])
    sw = shard_weights(weights, cfg, mesh)
    sc = shard_cache(KVCache.init(cfg), cfg, mesh)
    got, sc = decode_step(cfg, sw, jnp.int32(7), jnp.int32(0), sc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_batched_decode_vmap(tmp_path):
    """Batched decode via vmap == per-sequence decode (continuous-batching core)."""
    cfg = tiny_config(max_seq_len=16)
    weights = _load(tmp_path, cfg)
    B = 4
    toks = jnp.asarray([1, 2, 3, 4], jnp.int32)
    poss = jnp.asarray([0, 0, 0, 0], jnp.int32)
    bcache = KVCache.init(cfg, batch=B)

    step = jax.vmap(
        lambda t, p, c: decode_step(cfg, weights, t, p, c),
        in_axes=(0, 0, 0))
    logits, bcache = step(toks, poss, bcache)
    assert logits.shape == (B, cfg.vocab_size)

    for b in range(B):
        ref, _ = decode_step(cfg, weights, toks[b], poss[b], KVCache.init(cfg))
        np.testing.assert_allclose(np.asarray(logits[b]), np.asarray(ref), rtol=1e-4, atol=1e-4)
