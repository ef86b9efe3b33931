"""Qwen2-style QKV bias support: converter round trip + oracle/fast parity.

The reference supports only bias-free architectures (Llama/Mistral/Mixtral,
reference convert.py:15-19); Qwen2 support is a yalm_tpu extension, and
Qwen2's attention biases are implicit (not declared in config.json) — they
must be detected from the safetensors and carried through every path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.config import ModelConfig
from yalm_tpu.models import KVCache, decode_step, load_weights
from yalm_tpu.models.fast import FastWeights, decode_step_fast
from yalm_tpu.utils.testing import synth_checkpoint, synth_hf_dir, tiny_config

from test_fast_path import fast_config


def test_converter_detects_biases(tmp_path):
    from yalm_tpu.convert import convert

    cfg = tiny_config(has_qkv_bias=True)
    hf = str(tmp_path / "hf")
    synth_hf_dir(hf, cfg)
    out = str(tmp_path / "m.yalm")
    convert(hf, out, dtype="fp16")
    yf = read_yalm(out)
    assert yf.metadata["has_qkv_bias"] == "1"
    assert "model.layers.0.attn.wq.bias" in yf.tensors
    got = ModelConfig.from_metadata(yf.metadata)
    assert got.has_qkv_bias

    # loads + runs end-to-end
    from yalm_tpu.engine import Engine
    eng = Engine.from_checkpoint(out)
    toks = list(eng.generate([1, 5], max_steps=4, temperature=0.0))
    assert len(toks) == 4


def test_bias_changes_logits(tmp_path):
    """The biases must actually participate in the forward pass."""
    cfg = tiny_config(has_qkv_bias=True)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=0)
    weights = load_weights(read_yalm(path), cfg)
    assert weights.layers.bq is not None

    cache = KVCache.init(cfg, jnp.float16)
    logits_b, _ = decode_step(cfg, weights, jnp.int32(3), jnp.int32(0), cache)

    nobias = weights._replace(layers=weights.layers._replace(
        bq=None, bk=None, bv=None))
    cache = KVCache.init(cfg, jnp.float16)
    logits_n, _ = decode_step(cfg, nobias, jnp.int32(3), jnp.int32(0), cache)
    assert float(jnp.abs(logits_b - logits_n).max()) > 1e-3


def test_fast_path_bias_parity(tmp_path):
    cfg = fast_config(has_qkv_bias=True)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=1)
    weights = load_weights(read_yalm(path), cfg)
    fw = FastWeights.from_weights(weights, cfg)
    assert fw.bqkv is not None

    cache_o = KVCache.init(cfg, jnp.bfloat16)
    cache_f = KVCache.init(cfg, jnp.bfloat16)
    tok = jnp.int32(5)
    for pos in range(12):
        lo, cache_o = decode_step(cfg, weights, tok, jnp.int32(pos), cache_o,
                                  output_logits=True, compute_dtype=jnp.bfloat16)
        lf, cache_f = decode_step_fast(cfg, fw, tok, jnp.int32(pos), cache_f,
                                       output_logits=True)
        lo, lf = np.asarray(lo), np.asarray(lf)
        assert np.argmax(lo) == np.argmax(lf), f"argmax diverged at pos {pos}"
        tok = jnp.int32(int(np.argmax(lo)))


def test_fast_tp_bias_parity(tmp_path):
    import jax
    from yalm_tpu.parallel.fast_tp import (make_decode_step_fast_tp,
                                           shard_fast_tp_weights)
    from yalm_tpu.parallel.mesh import MeshConfig, make_mesh
    from yalm_tpu.parallel.sharding import shard_cache

    cfg = fast_config(has_qkv_bias=True)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=2)
    weights = load_weights(read_yalm(path), cfg)

    mesh = make_mesh(MeshConfig(tp=2), devices=jax.devices()[:2])
    sw = shard_fast_tp_weights(weights, cfg, mesh)
    sc = shard_cache(KVCache.init(cfg, jnp.bfloat16), cfg, mesh)
    step = jax.jit(make_decode_step_fast_tp(cfg, mesh), donate_argnums=(3,))
    cache_o = KVCache.init(cfg, jnp.bfloat16)

    tok = jnp.int32(5)
    for pos in range(8):
        lo, cache_o = decode_step(cfg, weights, tok, jnp.int32(pos), cache_o,
                                  output_logits=True, compute_dtype=jnp.bfloat16)
        lt, sc = step(sw, tok, jnp.int32(pos), sc)
        assert np.argmax(np.asarray(lo)) == np.argmax(np.asarray(lt)), pos
        tok = jnp.int32(int(np.argmax(np.asarray(lo))))
