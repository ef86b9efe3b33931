"""Cross-framework logit parity: converted checkpoints vs HF transformers.

For each supported architecture, build a RANDOM tiny model with HF
transformers (torch CPU), save real safetensors, run our converter, and
compare the oracle's teacher-forced logits against HF's forward pass.
This pins the whole convert->load->forward pipeline (RoPE un-permutation,
GQA, rmsnorm eps placement, SwiGLU, qk-norm, MoE routing) against the
reference implementations of the model families themselves — the closest
thing to real-model validation available offline (no real weights are
reachable; SURVEY §7 risk). The reference has no such test at all.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.config import ModelConfig
from yalm_tpu.convert import convert
from yalm_tpu.models import load_weights
from yalm_tpu.models.cache import KVCache
from yalm_tpu.models.transformer import prefill
from yalm_tpu.utils.testing import synth_vocab

DIMS = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
            max_position_embeddings=64, rope_theta=10000.0,
            rms_norm_eps=1e-5, bos_token_id=1, eos_token_id=2,
            attn_implementation="eager")


def _write_tokenizer(d, vocab_size):
    vocab = {}
    for i, t in enumerate(synth_vocab(vocab_size)):
        vocab[t.decode("utf-8", errors="replace").replace(" ", "▁")] = i
    tok = {"model": {"type": "BPE", "byte_fallback": True, "vocab": vocab,
                     "merges": []}, "added_tokens": []}
    with open(os.path.join(d, "tokenizer.json"), "w") as f:
        json.dump(tok, f)


def _mk_hf(tmp_path, arch, **extra):
    from transformers import (Gemma2Config, Gemma2ForCausalLM, GemmaConfig,
                              GemmaForCausalLM, Gemma3ForCausalLM,
                              Gemma3TextConfig, LlamaConfig,
                              LlamaForCausalLM, MixtralConfig,
                              MixtralForCausalLM, Qwen2Config,
                              Qwen2ForCausalLM, Qwen3Config,
                              Qwen3ForCausalLM, Qwen3MoeConfig,
                              Qwen3MoeForCausalLM)
    builders = {
        "llama": (LlamaConfig, LlamaForCausalLM),
        "qwen2": (Qwen2Config, Qwen2ForCausalLM),
        "qwen3": (Qwen3Config, Qwen3ForCausalLM),
        "mixtral": (MixtralConfig, MixtralForCausalLM),
        "gemma": (GemmaConfig, GemmaForCausalLM),
        "gemma2": (Gemma2Config, Gemma2ForCausalLM),
        "gemma3": (Gemma3TextConfig, Gemma3ForCausalLM),
        "qwen3moe": (Qwen3MoeConfig, Qwen3MoeForCausalLM),
    }
    cfg_cls, model_cls = builders[arch]
    hf_cfg = cfg_cls(**DIMS, **extra)
    torch.manual_seed(7)
    model = model_cls(hf_cfg).eval()
    d = str(tmp_path / arch)
    model.save_pretrained(d, safe_serialization=True)
    _write_tokenizer(d, DIMS["vocab_size"])
    return model, d


@pytest.mark.parametrize("arch,extra", [
    ("llama", {}),
    ("llama", {"rope_scaling": {"rope_type": "llama3", "factor": 8.0,
                                "low_freq_factor": 1.0,
                                "high_freq_factor": 4.0,
                                "original_max_position_embeddings": 16}}),
    ("qwen2", {}),
    ("qwen3", {"head_dim": 16}),
    ("mixtral", {"num_local_experts": 4, "num_experts_per_tok": 2}),
    # Qwen3-MoE: qk-norm COMPOSED with MoE routing, experts at
    # moe_intermediate_size, top-k-normalized gates
    ("qwen3moe", {"head_dim": 16, "moe_intermediate_size": 96,
                  "num_experts": 4, "num_experts_per_tok": 2,
                  "decoder_sparse_step": 1, "norm_topk_prob": True}),
    # sqrt(dim) embedding normalizer + (1+w) norm offset + tanh-gelu + tied
    # head; head_dim decoupled from dim/n_heads like the real Gemma (256)
    ("gemma", {"head_dim": 16, "hidden_activation": "gelu_pytorch_tanh"}),
    # Gemma2: sandwich norms, score+logit softcaps, query_pre_attn_scalar
    # != head_dim (exercises the wq fold), and a sliding window SMALLER
    # than the prompt so alternating local attention genuinely masks
    ("gemma2", {"head_dim": 16, "query_pre_attn_scalar": 32.0,
                "sliding_window": 8, "attn_logit_softcapping": 50.0,
                "final_logit_softcapping": 30.0,
                "hidden_activation": "gelu_pytorch_tanh"}),
    # Gemma3: qk-norm with the (1+w) offset, DUAL per-layer rope (local
    # theta on sliding layers, linear-scaled global theta elsewhere),
    # sandwich norms, no softcaps
    ("gemma3", {"head_dim": 16, "query_pre_attn_scalar": 32.0,
                "sliding_window": 8, "sliding_window_pattern": 2,
                "rope_local_base_freq": 10000.0,
                "rope_scaling": {"rope_type": "linear", "factor": 2.0},
                "hidden_activation": "gelu_pytorch_tanh"}),
])
def test_converted_logits_match_transformers(tmp_path, arch, extra):
    model, d = _mk_hf(tmp_path, arch, **extra)
    out = str(tmp_path / f"{arch}.yalm")
    convert(d, out, "fp32")

    yf = read_yalm(out)
    cfg = ModelConfig.from_metadata(yf.metadata)
    if arch == "qwen2":
        assert cfg.has_qkv_bias
    if arch == "qwen3":
        assert cfg.has_qk_norm
    if arch == "gemma":
        assert cfg.embed_scale == pytest.approx(DIMS["hidden_size"] ** 0.5)
    weights = load_weights(yf, cfg)

    T = 12
    ids = np.array([1, 5, 9, 13, 42, 7, 99, 3, 64, 120, 17, 2])[None, :T]
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits[0].float().numpy()

    cache = KVCache.init(cfg, jnp.float32)
    got, _ = prefill(cfg, weights, jnp.asarray(ids[0], jnp.int32),
                     jnp.int32(0), jnp.int32(T), cache, logits_mode="all",
                     compute_dtype=jnp.float32)
    got = np.asarray(got)

    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    assert (got.argmax(-1) == want.argmax(-1)).all()


def test_gemma2_decode_step_matches_transformers(tmp_path):
    """Token-by-token decode (the AGE-based sliding mask, a different code
    path from prefill's position mask) tracks HF at every step."""
    from yalm_tpu.models.transformer import decode_step

    model, d = _mk_hf(tmp_path, "gemma2", head_dim=16,
                      query_pre_attn_scalar=32.0, sliding_window=8,
                      attn_logit_softcapping=50.0,
                      final_logit_softcapping=30.0,
                      hidden_activation="gelu_pytorch_tanh")
    out = str(tmp_path / "g2dec.yalm")
    convert(d, out, "fp32")
    yf = read_yalm(out)
    cfg = ModelConfig.from_metadata(yf.metadata)
    weights = load_weights(yf, cfg)

    T = 12
    ids = np.array([1, 5, 9, 13, 42, 7, 99, 3, 64, 120, 17, 2])[None, :T]
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits[0].float().numpy()

    cache = KVCache.init(cfg, jnp.float32)
    for t in range(T):
        got, cache = decode_step(cfg, weights, jnp.int32(ids[0, t]),
                                 jnp.int32(t), cache,
                                 compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), want[t],
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("arch,extra", [
    ("llama", {}),
    ("gemma", {"head_dim": 16,
               "hidden_activation": "gelu_pytorch_tanh"}),
    ("gemma2", {"head_dim": 16, "query_pre_attn_scalar": 32.0,
                "sliding_window": 8, "attn_logit_softcapping": 50.0,
                "final_logit_softcapping": 30.0,
                "hidden_activation": "gelu_pytorch_tanh"}),
    ("gemma3", {"head_dim": 16, "query_pre_attn_scalar": 32.0,
                "sliding_window": 8, "sliding_window_pattern": 2,
                "rope_local_base_freq": 10000.0,
                "rope_scaling": {"rope_type": "linear", "factor": 2.0},
                "hidden_activation": "gelu_pytorch_tanh"}),
])
def test_fast_path_matches_transformers(tmp_path, arch, extra):
    """Close the loop on the FAST path too: the Pallas-layout prefill's
    all-position logits track HF's forward (bf16 attention dots => looser
    tolerance) with matching argmax. Gemma pins the fast path's
    embed_scale + folded norm offsets."""
    from yalm_tpu.models.cache import KVCache
    from yalm_tpu.models.fast import FastWeights, prefill_fast

    model, d = _mk_hf(tmp_path, arch, **extra)
    out = str(tmp_path / "fastpath.yalm")
    convert(d, out, "fp32")
    yf = read_yalm(out)
    cfg = ModelConfig.from_metadata(yf.metadata)
    fw = FastWeights.from_weights(load_weights(yf, cfg), cfg)

    T = 12
    ids = np.array([1, 5, 9, 13, 42, 7, 99, 3, 64, 120, 17, 2])[None, :T]
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits[0].float().numpy()
    lane = KVCache.init(cfg, jnp.float32)
    got, _ = prefill_fast(cfg, fw, jnp.asarray(ids[0], jnp.int32),
                          jnp.int32(0), jnp.int32(T), lane,
                          logits_mode="all")
    got = np.asarray(got)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    assert (got.argmax(-1) == want.argmax(-1)).all()


def test_qwen3moe_fast_engine_matches_oracle(tmp_path):
    """qk-norm COMPOSED with MoE routing on the FAST path (routed-expert
    kernels + per-head q/k norms): greedy stream tracks the oracle.
    Kernel-tileable synthetic shapes (the tiny HF build above pins the
    converter + oracle; head_dim must be 128 for the real kernels)."""
    from test_fast_path import fast_config
    from yalm_tpu.engine import Engine
    from yalm_tpu.utils.testing import synth_checkpoint

    cfg = fast_config(n_experts=4, n_experts_active=2, has_qk_norm=True)
    out = str(tmp_path / "q3moe.yalm")
    synth_checkpoint(out, cfg, seed=77)
    fast = Engine.from_checkpoint(out, fast=True)
    orac = Engine.from_checkpoint(out, fast=False, kv_dtype=jnp.bfloat16,
                                  compute_dtype=jnp.bfloat16)
    assert fast.fast and fast.cfg.is_moe and fast.cfg.has_qk_norm
    t_f = list(fast.generate([1, 7, 42], max_steps=10, temperature=0.0))
    t_o = list(orac.generate([1, 7, 42], max_steps=10, temperature=0.0))
    agree = sum(a == b for a, b in zip(t_f, t_o))
    assert agree >= len(t_o) - 1, (t_f, t_o)
