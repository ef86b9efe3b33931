"""RoPE frequency scaling (Llama-3.1 remap + linear interpolation).

The reference has no rope_scaling handling anywhere (neither its
convert.py nor src/), so Llama-3.1+ checkpoints would silently mis-rotate
there. Here the scheme rides the STATIC `theta` parameter as a packed
tuple (ModelConfig.rope_param), so every rope site — oracle, Pallas
kernels, TP/ring/pipeline paths — applies the same remap with no extra
plumbing. Parity anchors: HF transformers' own _compute_llama3_parameters,
and oracle-vs-fast-path agreement with scaling on.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.config import ModelConfig
from yalm_tpu.ops.core import apply_rope, rope_pair_freqs, scale_inv_freq
from yalm_tpu.utils.testing import synth_checkpoint

from test_fast_path import fast_config

LLAMA3 = ("llama3", 8.0, 1.0, 4.0, 8192)


def test_llama3_remap_matches_transformers():
    """scale_inv_freq('llama3') == HF transformers' implementation on the
    real Llama-3.1 parameters."""
    pytest.importorskip("transformers")
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    theta, head_dim = 500000.0, 128
    base_inv = 1.0 / theta ** (np.arange(0, head_dim, 2) / head_dim)

    class _Cfg:
        rope_theta = theta
        partial_rotary_factor = 1.0
        head_dim = 128
        hidden_size = 128
        num_attention_heads = 1
        max_position_embeddings = 131072
        rope_scaling = {"rope_type": "llama3", "factor": 8.0,
                        "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                        "original_max_position_embeddings": 8192}

    want, _ = ROPE_INIT_FUNCTIONS["llama3"](_Cfg(), device=None)
    want = np.asarray(want)

    got = np.asarray(scale_inv_freq(jnp.asarray(base_inv, jnp.float32),
                                    LLAMA3))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_yarn_matches_transformers():
    """The yarn pair-index ramp + attention factor == HF transformers'
    _compute_yarn_parameters (inv_freq AND attention_scaling), using the
    converter's precomputed low/high/mscale."""
    pytest.importorskip("transformers")
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS
    from yalm_tpu.convert import normalize_config

    theta, head_dim, factor, orig = 10000.0, 128, 4.0, 4096

    class _Cfg:
        rope_theta = theta
        partial_rotary_factor = 1.0
        head_dim = 128
        hidden_size = 128
        num_attention_heads = 1
        max_position_embeddings = orig * 4
        rope_scaling = {"rope_type": "yarn", "factor": factor,
                        "original_max_position_embeddings": orig}

    want, want_att = ROPE_INIT_FUNCTIONS["yarn"](_Cfg(), device=None)
    want = np.asarray(want)

    base = dict(architectures=["LlamaForCausalLM"], hidden_size=128,
                intermediate_size=256, num_hidden_layers=1,
                num_attention_heads=1, num_key_value_heads=1, vocab_size=64,
                max_position_embeddings=orig * 4, bos_token_id=1,
                eos_token_id=2, rms_norm_eps=1e-5, hidden_act="silu",
                rope_theta=theta, head_dim=head_dim,
                rope_scaling=dict(_Cfg.rope_scaling))
    md = normalize_config(base, "bf16")
    cfg = ModelConfig.from_metadata(md)
    assert cfg.rope_scale[0] == "yarn"

    from yalm_tpu.ops.core import rope_mscale
    j = 2.0 * jnp.arange(head_dim // 2, dtype=jnp.float32)
    got = np.asarray(rope_pair_freqs(cfg.rope_param, head_dim, j))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)
    assert abs(rope_mscale(cfg.rope_param) - float(want_att)) < 1e-6


def test_yarn_sink_rotation_does_not_compound_mscale():
    """Rotating already-written (mscaled) sink keys must use a pure
    rotation: rotate(rope(x, p), n) == rope(x, p+n) exactly, including the
    single mscale factor."""
    from yalm_tpu.ops.core import rope_rotation_param
    yparam = ("yarn", 10000.0, 4.0, 10.0, 40.0, 1.2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 128), jnp.float32)
    written = apply_rope(x, jnp.asarray([5, 9]), yparam, 128)
    rotated = apply_rope(written, jnp.asarray([3, 3]),
                         rope_rotation_param(yparam), 128)
    direct = apply_rope(x, jnp.asarray([8, 12]), yparam, 128)
    np.testing.assert_allclose(np.asarray(rotated), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)


def test_linear_and_packed_param():
    j = 2.0 * jnp.arange(4, dtype=jnp.float32)
    base = np.asarray(rope_pair_freqs(10000.0, 8, j))
    lin = np.asarray(rope_pair_freqs(("linear", 10000.0, 4.0), 8, j))
    np.testing.assert_allclose(lin, base / 4.0, rtol=1e-6)
    # partial rotary dims stay identity (freq 0) under scaling too
    j2 = 2.0 * jnp.arange(8, dtype=jnp.float32)
    sc = np.asarray(rope_pair_freqs(("llama3", 10000.0, 8.0, 1.0, 4.0, 8192),
                                    8, j2))
    assert (sc[4:] == 0.0).all()


def test_config_roundtrip_and_param():
    cfg = fast_config(rope_scale=LLAMA3)
    assert cfg.rope_param == ("llama3", cfg.rope_theta, 8.0, 1.0, 4.0, 8192)
    md = cfg.to_metadata()
    cfg2 = ModelConfig.from_metadata(md)
    assert cfg2.rope_scale == LLAMA3
    plain = fast_config()
    assert plain.rope_param == plain.rope_theta
    assert "rope_scaling" not in plain.to_metadata()
    hash(cfg)  # static jit key must stay hashable


def test_normalize_config_parses_rope_scaling():
    from yalm_tpu.convert import normalize_config
    base = dict(architectures=["LlamaForCausalLM"], hidden_size=64,
                intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=2, num_key_value_heads=2, vocab_size=64,
                max_position_embeddings=256, bos_token_id=1, eos_token_id=2,
                rms_norm_eps=1e-5, hidden_act="silu", rope_theta=500000.0,
                rope_scaling={"rope_type": "llama3", "factor": 8.0,
                              "low_freq_factor": 1.0,
                              "high_freq_factor": 4.0,
                              "original_max_position_embeddings": 8192})
    md = normalize_config(base, "bf16")
    assert md["rope_scaling"] == "llama3" and md["rope_factor"] == "8.0"
    cfg = ModelConfig.from_metadata(md)
    assert cfg.rope_scale == LLAMA3

    base["rope_scaling"] = {"rope_type": "longrope", "factor": 2.0}
    with pytest.raises(ValueError, match="rope_scaling"):
        normalize_config(base, "bf16")


def test_scaled_rope_changes_rotation_and_stays_consistent():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 128), jnp.float32)
    pos = jnp.arange(4)
    plain = apply_rope(x, pos, 500000.0, 128)
    scaled = apply_rope(x, pos, ("llama3", 500000.0, *LLAMA3[1:]), 128)
    assert not np.allclose(np.asarray(plain[1:]), np.asarray(scaled[1:]))
    # position 0 rotates by angle 0 either way
    np.testing.assert_allclose(np.asarray(plain[0]), np.asarray(scaled[0]))


def test_fast_paths_match_oracle_with_scaling(tmp_path):
    """Greedy decode streams agree between oracle and fast path with the
    llama3 remap active — every rope site (prefill chunk, in-kernel decode
    rope, lazy sink view) applies the same scaled frequencies."""
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.engine import Engine
    from yalm_tpu.models import load_weights

    cfg = fast_config(max_seq_len=64, rope_scale=LLAMA3)
    path = str(tmp_path / "rs.yalm")
    synth_checkpoint(path, cfg, seed=121)
    weights = load_weights(read_yalm(path), cfg)

    oracle = Engine(cfg, weights, fast=False)
    fast = Engine(cfg, weights, fast=True, kv_dtype=jnp.bfloat16)
    prompt = [1, 5, 9, 13]
    want = list(oracle.generate(prompt, max_steps=40, temperature=0.0))
    got = list(fast.generate(prompt, max_steps=40, temperature=0.0))
    # bf16 kernel rounding can flip near-ties on synthetic weights; demand
    # a long exact prefix (and identical lengths), like other parity tests
    assert len(got) == len(want) == 40
    agree = 0
    for a, b in zip(got, want):
        if a != b:
            break
        agree += 1
    assert agree >= 20, (agree, got, want)
    # the remap is really active: the low-frequency pairs differ by 8x
    # (greedy STREAMS need not differ at tiny positions — the angle delta
    # is O(pos * freq/8), far below random-weight logit gaps here)
    j = 2.0 * jnp.arange(cfg.head_dim // 2, dtype=jnp.float32)
    f_plain = np.asarray(rope_pair_freqs(cfg.rope_theta, cfg.rotary_dim, j))
    f_scaled = np.asarray(rope_pair_freqs(cfg.rope_param, cfg.rotary_dim, j))
    assert (f_scaled <= f_plain + 1e-12).all()
    np.testing.assert_allclose(f_scaled[-1], f_plain[-1] / 8.0, rtol=1e-5)
