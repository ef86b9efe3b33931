"""int8 weight quantization: converter, oracle dequant, fused-kernel scales.

Entirely new capability vs the reference (its fp8 path was a stub that
reinterpreted bytes, SURVEY.md §2.5; int8 doesn't exist there at all).
Scheme: symmetric per-output-channel, w_q = round(w / s), s = max|row|/127,
stored as an int8 tensor + a sibling f32 ".scale" tensor. The oracle
dequantizes at load; the fast path streams int8 bytes and multiplies the
scale into the f32 accumulator at kernel flush.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.convert import convert
from yalm_tpu.engine import Engine
from yalm_tpu.models import KVCache, decode_step, load_weights
from yalm_tpu.models.fast import FastWeights, decode_step_fast, load_fast_weights
from yalm_tpu.utils.testing import synth_checkpoint, synth_hf_dir, tiny_config

from test_fast_path import fast_config


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    root = tmp_path_factory.mktemp("int8")
    cfg = tiny_config(dim=64, hidden_dim=128, n_layers=2, max_seq_len=64)
    hf = str(root / "hf")
    synth_hf_dir(hf, cfg, seed=11)
    paths = {}
    for d in ("fp32", "fp16", "fp8", "int8"):
        p = str(root / f"m_{d}.yalm")
        convert(hf, p, d)
        paths[d] = p
    return paths


def test_quantization_roundtrip_error(ckpts):
    """Dequantized int8 is within half a quantization step of the original,
    per output channel (compared against the exact fp32 conversion)."""
    yf32 = read_yalm(ckpts["fp32"])
    yf8 = read_yalm(ckpts["int8"])
    name = "model.layers.0.attn.wq.weight"
    orig = np.asarray(yf32.tensors[name], np.float32)
    q = np.asarray(yf8.tensors[name])
    s = np.asarray(yf8.tensors[name + ".scale"])
    assert q.dtype == np.int8 and s.dtype == np.float32
    deq = q.astype(np.float32) * s[:, None]
    err = np.abs(deq - orig).max(axis=1)
    assert (err <= 0.5 * s + 1e-7).all()


def test_int8_metadata_and_size(ckpts):
    import os
    yf = read_yalm(ckpts["int8"])
    assert yf.metadata["dtype"] == "int8"
    # ~half the fp16 bytes (scales are negligible)
    assert os.path.getsize(ckpts["int8"]) < 0.65 * os.path.getsize(ckpts["fp16"])


def test_int8_beats_fp8_perplexity(ckpts):
    """The whole point: per-channel int8 tracks fp16 far better than e5m2."""
    tokens = list(np.random.default_rng(0).integers(3, 120, size=48))
    ppl = {}
    for d in ("fp32", "fp16", "fp8", "int8"):
        eng = Engine.from_checkpoint(ckpts[d])
        ppl[d], _e, _n = eng.perplexity(tokens)
        assert math.isfinite(ppl[d])
    d8 = abs(ppl["fp8"] - ppl["fp16"]) / ppl["fp16"]
    d_i8 = abs(ppl["int8"] - ppl["fp16"]) / ppl["fp16"]
    assert d_i8 < d8, ppl
    assert d_i8 < 0.01, ppl  # ≤1% at this scale, unlike fp8


def test_fast_matches_oracle_int8(tmp_path):
    """Kernel-scale dequant == oracle load-time dequant, token for token."""
    cfg = fast_config()
    hf = str(tmp_path / "hf")
    synth_hf_dir(hf, cfg, seed=7)
    p = str(tmp_path / "m.yalm")
    convert(hf, p, "int8")
    yf = read_yalm(p)
    w_oracle = load_weights(yf, cfg)             # dequantized f32
    fw = load_fast_weights(yf, cfg)              # int8 + scales
    assert fw.wqkv.dtype == jnp.int8
    assert fw.scales is not None

    cache_o = KVCache.init(cfg, jnp.bfloat16)
    cache_f = KVCache.init(cfg, jnp.bfloat16)
    tok = jnp.int32(5)
    for pos in range(10):
        lo, cache_o = decode_step(cfg, w_oracle, tok, jnp.int32(pos), cache_o,
                                  output_logits=True, compute_dtype=jnp.bfloat16)
        lf, cache_f = decode_step_fast(cfg, fw, tok, jnp.int32(pos), cache_f)
        lo, lf = np.asarray(lo), np.asarray(lf)
        assert np.argmax(lo) == np.argmax(lf), pos
        scale = max(1.0, float(np.abs(lo).max()))
        assert float(np.abs(lo - lf).max()) / scale < 0.05, pos
        tok = jnp.int32(int(np.argmax(lo)))


def test_scheduler_int8(tmp_path):
    from yalm_tpu.scheduler import Request, Scheduler
    cfg = fast_config()
    hf = str(tmp_path / "hf")
    synth_hf_dir(hf, cfg, seed=9)
    p = str(tmp_path / "m.yalm")
    convert(hf, p, "int8")
    yf = read_yalm(p)
    fw = load_fast_weights(yf, cfg)
    sched = Scheduler(cfg, fw, batch=8, kv_dtype=jnp.bfloat16)
    assert sched.fast
    reqs = [Request(prompt_tokens=[1, 4 + i], max_new_tokens=5,
                    temperature=0.0, seed=i) for i in range(4)]
    for r in reqs:
        sched.submit(r)
    sched.run()
    assert all(len(r.generated) == 5 for r in reqs)

    # parity vs the single-stream fast engine
    eng = Engine(cfg, load_fast_weights(read_yalm(p), cfg),
                 kv_dtype=jnp.bfloat16)
    want = list(eng.generate([1, 4], max_steps=5, temperature=0.0))
    assert reqs[0].generated == want


def test_fast_tp_int8(tmp_path):
    """Sharded int8: scales ride the same shard-major split as their rows."""
    from yalm_tpu.models.fast import load_fast_weights as lfw
    from yalm_tpu.parallel.fast_tp import (make_decode_step_fast_tp,
                                           shard_fast_tp_weights)
    from yalm_tpu.parallel.mesh import MeshConfig, make_mesh
    from yalm_tpu.parallel.sharding import shard_cache

    cfg = fast_config()
    hf = str(tmp_path / "hf")
    synth_hf_dir(hf, cfg, seed=13)
    p = str(tmp_path / "m.yalm")
    convert(hf, p, "int8")
    w_oracle = load_weights(read_yalm(p), cfg)

    mesh = make_mesh(MeshConfig(tp=2), devices=jax.devices()[:2])
    fw = lfw(read_yalm(p), cfg, tp=2)            # shard-major int8 + scales
    sfw = shard_fast_tp_weights(fw, cfg, mesh)
    scache = shard_cache(KVCache.init(cfg, jnp.bfloat16), cfg, mesh)
    step = jax.jit(make_decode_step_fast_tp(cfg, mesh, with_scales=True),
                   donate_argnums=(3,))

    cache_o = KVCache.init(cfg, jnp.bfloat16)
    tok = jnp.int32(5)
    for pos in range(8):
        lo, cache_o = decode_step(cfg, w_oracle, tok, jnp.int32(pos), cache_o,
                                  output_logits=True, compute_dtype=jnp.bfloat16)
        lt, scache = step(sfw, tok, jnp.int32(pos), scache)
        assert np.argmax(np.asarray(lo)) == np.argmax(np.asarray(lt)), pos
        tok = jnp.int32(int(np.argmax(np.asarray(lo))))


def test_moe_int8(tmp_path):
    cfg = fast_config(n_experts=2, n_experts_active=1)
    hf = str(tmp_path / "hf")
    synth_hf_dir(hf, cfg, seed=15)
    p = str(tmp_path / "m.yalm")
    convert(hf, p, "int8")
    w_oracle = load_weights(read_yalm(p), cfg)
    fw = load_fast_weights(read_yalm(p), cfg)
    assert fw.scales.moegate is not None

    cache_o = KVCache.init(cfg, jnp.bfloat16)
    cache_f = KVCache.init(cfg, jnp.bfloat16)
    tok = jnp.int32(3)
    for pos in range(6):
        lo, cache_o = decode_step(cfg, w_oracle, tok, jnp.int32(pos), cache_o,
                                  output_logits=True, compute_dtype=jnp.bfloat16)
        lf, cache_f = decode_step_fast(cfg, fw, tok, jnp.int32(pos), cache_f)
        assert np.argmax(np.asarray(lo)) == np.argmax(np.asarray(lf)), pos
        tok = jnp.int32(int(np.argmax(np.asarray(lo))))


def test_engine_mesh_int8_end_to_end(tmp_path):
    """Engine.from_checkpoint with a mesh + int8 checkpoint: shard-major
    int8 loading (tp=2), scale-aware TP prefill AND decode, vs the
    single-device oracle stream."""
    from yalm_tpu.parallel.mesh import MeshConfig, make_mesh

    cfg = fast_config()
    hf = str(tmp_path / "hf")
    synth_hf_dir(hf, cfg, seed=19)
    p = str(tmp_path / "m.yalm")
    convert(hf, p, "int8")

    mesh = make_mesh(MeshConfig(tp=2), devices=jax.devices()[:2])
    eng = Engine.from_checkpoint(p, mesh=mesh, kv_dtype=jnp.bfloat16)
    assert eng.fast and eng.weights.scales is not None
    eng_o = Engine.from_checkpoint(p, fast=False, kv_dtype=jnp.bfloat16,
                                   compute_dtype=jnp.bfloat16)
    got = list(eng.generate([1, 7, 42, 3], max_steps=10, temperature=0.0))
    want = list(eng_o.generate([1, 7, 42, 3], max_steps=10, temperature=0.0))
    agree = sum(a == b for a, b in zip(got, want))
    assert agree >= len(want) - 1, (got, want)
