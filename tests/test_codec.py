"""Codec round-trip and converter tests (reference format: src/codec.cpp)."""

import math

import ml_dtypes
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm, write_yalm
from yalm_tpu.config import ModelConfig
from yalm_tpu.convert import convert, permute_reverse
from yalm_tpu.utils.testing import synth_checkpoint, synth_hf_dir, tiny_config


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "t.yalm")
    tensors = {
        "a": np.arange(24, dtype=np.float32).reshape(4, 6),
        "b": np.arange(8, dtype=np.float16),
        "c": np.arange(16, dtype=np.uint8),
        "d": (np.arange(6, dtype=np.float32) / 7).astype(ml_dtypes.bfloat16),
        "e": (np.arange(6, dtype=np.float32) / 7).astype(ml_dtypes.float8_e5m2),
    }
    write_yalm(path, tensors, {"dtype": "fp16", "dim": "4"})
    yf = read_yalm(path)
    assert yf.metadata == {"dtype": "fp16", "dim": "4"}
    for k, v in tensors.items():
        got = yf.tensors[k]
        assert got.dtype == v.dtype and got.shape == v.shape
        np.testing.assert_array_equal(np.asarray(got), v)


def test_data_is_8byte_aligned(tmp_path):
    path = str(tmp_path / "t.yalm")
    write_yalm(path, {"x": np.ones(3, np.float32)}, {"k": "v"})
    with open(path, "rb") as f:
        header_size = int.from_bytes(f.read(8), "little")
    assert (8 + header_size) % 8 == 0


def test_safetensors_interop(tmp_path):
    """Our writer produces files the official safetensors library can read."""
    safetensors = pytest.importorskip("safetensors.numpy")
    path = str(tmp_path / "t.yalm")
    tensors = {"w": np.random.default_rng(0).standard_normal((8, 8)).astype(np.float32)}
    write_yalm(path, tensors, {"hello": "world"})
    with safetensors.safe_open(path, framework="numpy") as f:
        assert f.metadata() == {"hello": "world"}
        np.testing.assert_array_equal(f.get_tensor("w"), tensors["w"])


def test_config_metadata_roundtrip():
    cfg = tiny_config(qkv_clip=30.0, n_experts=4, n_experts_active=2)
    md = cfg.to_metadata()
    cfg2 = ModelConfig.from_metadata(md)
    assert cfg2 == cfg


def test_config_defaults_and_clamp():
    md = tiny_config().to_metadata()
    md["max_seq_len"] = "131072"
    cfg = ModelConfig.from_metadata(md)
    assert cfg.max_seq_len == 4096  # clamped, reference src/model.cpp:31-36
    cfg = ModelConfig.from_metadata(md, context=128)
    assert cfg.max_seq_len == 128
    assert math.isinf(cfg.qkv_clip)


def test_active_bytes_matches_reference_model():
    """Spot-check the analytic bandwidth model against hand computation."""
    cfg = tiny_config(weight_dtype="fp16")
    ws = 2
    per_block = (2 * cfg.dim * 4 + cfg.q_dim * cfg.dim * ws + 2 * cfg.kv_dim * cfg.dim * ws
                 + cfg.q_dim * cfg.dim * ws + 3 * cfg.dim * cfg.hidden_dim * ws
                 + 2 * 1 * cfg.kv_dim * 2)
    expect = cfg.dim * ws + cfg.n_layers * per_block + cfg.dim * 4 + cfg.vocab_size * cfg.dim * ws
    assert cfg.active_bytes(0) == expect
    # KV term saturates at the window
    assert cfg.active_bytes(10**9) == cfg.active_bytes(cfg.max_seq_len - 1)


def test_permute_reverse_identity_on_interleaved():
    """permute then reverse-permute is identity (layout sanity)."""
    rng = np.random.default_rng(0)
    heads, head_dim, dim = 4, 16, 32
    w = rng.standard_normal((heads * head_dim, dim), dtype=np.float32)

    def permute_hf(w, heads, rotary_dim):
        # the forward permutation HF's conversion script applies
        head_dim = w.shape[0] // heads
        w = w.reshape(heads, head_dim, -1)
        wr, wk = w[:, :rotary_dim], w[:, rotary_dim:]
        wr = wr.reshape(heads, rotary_dim // 2, 2, -1).swapaxes(1, 2).reshape(heads, rotary_dim, -1)
        return np.concatenate([wr, wk], axis=1).reshape(heads * head_dim, -1)

    for rotary_dim in (16, 8):
        hf = permute_hf(w, heads, rotary_dim)
        back = permute_reverse(hf, heads, rotary_dim)
        np.testing.assert_array_equal(back, w)


@pytest.mark.parametrize("dtype", ["fp32", "fp16", "bf16", "fp8"])
def test_convert_hf_dir(tmp_path, dtype):
    cfg = tiny_config()
    hf = str(tmp_path / "hf")
    out = str(tmp_path / "model.yalm")
    synth_hf_dir(hf, cfg)
    convert(hf, out, dtype)
    yf = read_yalm(out)
    cfg2 = ModelConfig.from_metadata(yf.metadata)
    assert cfg2.dim == cfg.dim and cfg2.weight_dtype == dtype
    assert "tokenizer.tokens" in yf.tensors
    # norms always fp32 regardless of target dtype (reference convert.py:174)
    assert yf.tensors["model.layers.0.attn.norm.weight"].dtype == np.float32
    wq = yf.tensors["model.layers.0.attn.wq.weight"]
    assert wq.shape == (cfg.q_dim, cfg.dim)


def test_convert_moe(tmp_path):
    cfg = tiny_config(n_experts=4, n_experts_active=2)
    hf = str(tmp_path / "hf")
    out = str(tmp_path / "model.yalm")
    synth_hf_dir(hf, cfg)
    convert(hf, out, "fp16")
    yf = read_yalm(out)
    w1 = yf.tensors["model.layers.0.mlp.w1.weight"]
    assert w1.shape == (4, cfg.hidden_dim, cfg.dim)
    assert "model.layers.0.moegate.weight" in yf.tensors


def test_synth_checkpoint_loads(tmp_path):
    cfg = tiny_config(weight_dtype="fp16")
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg)
    yf = read_yalm(path)
    cfg2 = ModelConfig.from_metadata(yf.metadata)
    assert cfg2 == cfg
    assert yf.tensors["model.embed.weight"].shape == (cfg.vocab_size, cfg.dim)
