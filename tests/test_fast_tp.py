"""Tensor-parallel fast path: shard_map'd Pallas decode vs unsharded oracle.

Runs on the virtual 8-device CPU mesh (conftest); kernels take their jnp
emulation path inside shard_map, so what's validated here is the Megatron
split + collective structure (psum after wo/w2, vocab-sharded embedding and
logits) — the TPU kernel bodies themselves are covered by test_fast_path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


from yalm_tpu.codec.format import read_yalm
from yalm_tpu.models import KVCache, decode_step, load_weights
from yalm_tpu.parallel.fast_tp import (fast_tp_supported, make_decode_step_fast_tp,
                                        shard_fast_tp_weights)
from yalm_tpu.parallel.mesh import MeshConfig, make_mesh
from yalm_tpu.parallel.sharding import shard_cache
from yalm_tpu.utils.testing import synth_checkpoint, tiny_config

from test_fast_path import fast_config


def test_fast_tp_supported_gates():
    cfg = fast_config()
    assert fast_tp_supported(cfg, 1)
    assert fast_tp_supported(cfg, 2)       # n_kv_heads = 2
    assert not fast_tp_supported(cfg, 4)   # tp > n_kv_heads
    moe = fast_config(n_experts=2, n_experts_active=1)
    assert fast_tp_supported(moe, 2, ep=1)
    assert fast_tp_supported(moe, 2, ep=2)     # experts shard over ep
    assert not fast_tp_supported(moe, 2, ep=4)  # ep > n_experts
    assert not fast_tp_supported(cfg, 2, ep=2)  # dense can't use ep


@pytest.mark.parametrize("embed_scale", [1.0, 8.0])
def test_decode_step_fast_tp_matches_oracle(tmp_path, embed_scale):
    # embed_scale=8.0 exercises the Gemma sqrt(dim) embedding normalizer
    # through the sharded gather (_embed_psum call sites)
    cfg = fast_config(embed_scale=embed_scale)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=9)
    weights = load_weights(read_yalm(path), cfg)

    mesh = make_mesh(MeshConfig(tp=2), devices=jax.devices()[:2])
    sweights = shard_fast_tp_weights(weights, cfg, mesh)
    scache = shard_cache(KVCache.init(cfg, jnp.bfloat16), cfg, mesh)

    tp_step = jax.jit(make_decode_step_fast_tp(cfg, mesh), donate_argnums=(3,))
    cache_o = KVCache.init(cfg, jnp.bfloat16)

    tok = jnp.int32(5)
    for pos in range(cfg.max_seq_len + 6):  # crosses ring + sink regime
        lo, cache_o = decode_step(cfg, weights, tok, jnp.int32(pos), cache_o,
                                  output_logits=True, compute_dtype=jnp.bfloat16)
        lt, scache = tp_step(sweights, tok, jnp.int32(pos), scache)
        lo, lt = np.asarray(lo), np.asarray(lt)
        assert lt.shape == lo.shape
        assert np.argmax(lo) == np.argmax(lt), f"argmax diverged at pos {pos}"
        scale = max(1.0, float(np.abs(lo).max()))
        assert float(np.abs(lo - lt).max()) / scale < 0.05, f"diverged at {pos}"
        tok = jnp.int32(int(np.argmax(lo)))


def test_engine_fast_tp_generates(tmp_path):
    from yalm_tpu.engine import Engine

    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=10)
    mesh = make_mesh(MeshConfig(tp=2), devices=jax.devices()[:2])
    eng = Engine.from_checkpoint(path, mesh=mesh, kv_dtype=jnp.bfloat16)
    assert eng.fast
    eng_o = Engine.from_checkpoint(path, fast=False, kv_dtype=jnp.bfloat16,
                                   compute_dtype=jnp.bfloat16)
    toks_t = list(eng.generate([1, 7, 42], max_steps=10, temperature=0.0, seed=0))
    toks_o = list(eng_o.generate([1, 7, 42], max_steps=10, temperature=0.0, seed=0))
    agree = sum(a == b for a, b in zip(toks_t, toks_o))
    assert agree >= len(toks_o) - 1, (toks_t, toks_o)


def test_decode_step_fast_tp_moe_ep_matches_oracle(tmp_path):
    """MoE fast-TP with experts sharded over ep: router replicated, only the
    routed local experts run (lax.cond), psum over (ep, tp)."""
    cfg = fast_config(n_experts=4, n_experts_active=2)
    path = str(tmp_path / "moe.yalm")
    synth_checkpoint(path, cfg, seed=11)
    weights = load_weights(read_yalm(path), cfg)

    mesh = make_mesh(MeshConfig(ep=2, tp=2), devices=jax.devices()[:4])
    sweights = shard_fast_tp_weights(weights, cfg, mesh)
    scache = shard_cache(KVCache.init(cfg, jnp.bfloat16), cfg, mesh)

    tp_step = jax.jit(make_decode_step_fast_tp(cfg, mesh), donate_argnums=(3,))
    cache_o = KVCache.init(cfg, jnp.bfloat16)

    tok = jnp.int32(5)
    for pos in range(12):
        lo, cache_o = decode_step(cfg, weights, tok, jnp.int32(pos), cache_o,
                                  output_logits=True, compute_dtype=jnp.bfloat16)
        lt, scache = tp_step(sweights, tok, jnp.int32(pos), scache)
        lo, lt = np.asarray(lo), np.asarray(lt)
        assert np.argmax(lo) == np.argmax(lt), f"argmax diverged at pos {pos}"
        scale = max(1.0, float(np.abs(lo).max()))
        assert float(np.abs(lo - lt).max()) / scale < 0.05, f"diverged at {pos}"
        tok = jnp.int32(int(np.argmax(lo)))
