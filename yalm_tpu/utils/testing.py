"""Test fixtures: synthesize tiny checkpoints and HF model directories.

The reference has no downloadable models in CI either — its tests build tiny
configs by hand (reference src/test.cpp:68-126). We go further: synthesize a
complete random `.yalm` checkpoint (and an HF-layout directory for converter
tests) so every layer of the stack is exercised end-to-end hermetically.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..codec.format import DTYPE_STR_TO_TAG, np_dtype_for, write_yalm
from ..config import ModelConfig


def tiny_config(**overrides) -> ModelConfig:
    defaults = dict(
        dim=64,
        hidden_dim=128,
        head_dim=16,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        vocab_size=128,
        max_seq_len=64,
        bos_token_id=1,
        eos_token_id=2,
        rope_theta=10000.0,
        rotary_dim=16,
        norm_eps=1e-5,
        act_type="silu",
        weight_dtype="fp32",
    )
    defaults.update(overrides)
    return ModelConfig(**defaults)


def synth_vocab(vocab_size: int) -> list[bytes]:
    """A deterministic toy vocab: specials, byte-fallback, then short words."""
    tokens: list[bytes] = [b"<unk>", b"<s>", b"</s>"]
    # byte fallback tokens, like sentencepiece vocabularies
    tokens += [f"<0x{i:02X}>".encode() for i in range(256)]
    words = [b" the", b" a", b"he", b"llo", b" world", b"hello", b"ab", b"abc",
             b" pass", b" key", b"1", b"2", b"3", b"4", b"5", b".", b",", b" is"]
    tokens += words
    while len(tokens) < vocab_size:
        tokens.append(b"tok%d" % len(tokens))
    return tokens[:vocab_size]


def synth_checkpoint(path: str, cfg: ModelConfig, seed: int = 0,
                     vocab: list[bytes] | None = None,
                     medusa_heads: int = 0) -> None:
    """Write a random-but-deterministic `.yalm` checkpoint for `cfg`.
    medusa_heads > 0 additionally writes Medusa self-drafting heads
    (yalm_tpu/medusa.py format) — pass -1 for IDENTITY heads (w1=0, head
    = the LM head), whose proposals repeat the model's own next-token
    argmax; useful for acceptance-path tests on repetitive streams."""
    rng = np.random.default_rng(seed)
    int8 = cfg.weight_dtype == "int8"
    int4 = cfg.weight_dtype == "int4"
    wdt = (np.int8 if int4
           else np_dtype_for(DTYPE_STR_TO_TAG[cfg.weight_dtype]))

    def w(*shape, scale=None, head=False):
        if scale is None:
            scale = 1.0 / np.sqrt(shape[-1])
        f = rng.standard_normal(shape, dtype=np.float32) * scale
        if int4 and len(shape) > 1 and not head:
            from ..ops.pallas.gemv import pack_int4
            q, gs = pack_int4(f)
            w._pending_gscale = gs
            return q
        if (int8 or (int4 and head)) and len(shape) > 1:
            s = np.abs(f).max(axis=-1) / 127.0
            s = np.where(s == 0.0, 1.0, s).astype(np.float32)
            q = np.clip(np.rint(f / s[..., None]), -127, 127).astype(np.int8)
            w._pending_scale = s
            return q
        w._pending_scale = None
        return f.astype(wdt)

    def put(tensors, name, arr):
        tensors[name] = arr
        if getattr(w, "_pending_scale", None) is not None:
            tensors[name + ".scale"] = w._pending_scale
            w._pending_scale = None
        if getattr(w, "_pending_gscale", None) is not None:
            tensors[name + ".gscale"] = w._pending_gscale
            w._pending_gscale = None

    tensors: dict[str, np.ndarray] = {}
    put(tensors, "model.embed.weight", w(cfg.vocab_size, cfg.dim, scale=0.02, head=True))
    for l in range(cfg.n_layers):
        p = f"model.layers.{l}"
        tensors[f"{p}.attn.norm.weight"] = np.ones(cfg.dim, np.float32)
        put(tensors, f"{p}.attn.wq.weight", w(cfg.q_dim, cfg.dim))
        put(tensors, f"{p}.attn.wk.weight", w(cfg.kv_dim, cfg.dim))
        put(tensors, f"{p}.attn.wv.weight", w(cfg.kv_dim, cfg.dim))
        put(tensors, f"{p}.attn.wo.weight", w(cfg.dim, cfg.q_dim))
        if cfg.has_qkv_bias:
            tensors[f"{p}.attn.wq.bias"] = w(cfg.q_dim, scale=0.05).astype(np.float32)
            tensors[f"{p}.attn.wk.bias"] = w(cfg.kv_dim, scale=0.05).astype(np.float32)
            tensors[f"{p}.attn.wv.bias"] = w(cfg.kv_dim, scale=0.05).astype(np.float32)
        if cfg.has_qk_norm:
            tensors[f"{p}.attn.q_norm.weight"] = \
                1.0 + 0.1 * rng.standard_normal(cfg.head_dim).astype(np.float32)
            tensors[f"{p}.attn.k_norm.weight"] = \
                1.0 + 0.1 * rng.standard_normal(cfg.head_dim).astype(np.float32)
        tensors[f"{p}.mlp.norm.weight"] = np.ones(cfg.dim, np.float32)
        if cfg.has_post_norms:
            tensors[f"{p}.attn.post_norm.weight"] = \
                1.0 + 0.1 * rng.standard_normal(cfg.dim).astype(np.float32)
            tensors[f"{p}.mlp.post_norm.weight"] = \
                1.0 + 0.1 * rng.standard_normal(cfg.dim).astype(np.float32)
        if cfg.is_moe:
            put(tensors, f"{p}.moegate.weight",
                w(cfg.n_experts, cfg.dim, head=True))
            put(tensors, f"{p}.mlp.w1.weight", w(cfg.n_experts, cfg.hidden_dim, cfg.dim))
            put(tensors, f"{p}.mlp.w2.weight", w(cfg.n_experts, cfg.dim, cfg.hidden_dim))
            put(tensors, f"{p}.mlp.w3.weight", w(cfg.n_experts, cfg.hidden_dim, cfg.dim))
        else:
            put(tensors, f"{p}.mlp.w1.weight", w(cfg.hidden_dim, cfg.dim))
            put(tensors, f"{p}.mlp.w2.weight", w(cfg.dim, cfg.hidden_dim))
            put(tensors, f"{p}.mlp.w3.weight", w(cfg.hidden_dim, cfg.dim))
    tensors["model.norm.weight"] = np.ones(cfg.dim, np.float32)
    if not cfg.tie_word_embeddings:
        put(tensors, "model.output.weight", w(cfg.vocab_size, cfg.dim, scale=0.02, head=True))

    if medusa_heads:
        H = abs(medusa_heads)
        lm = tensors.get("model.output.weight", tensors["model.embed.weight"])
        lm32 = np.asarray(lm, np.float32)
        if "model.output.weight.scale" in tensors:
            lm32 = lm32 * np.asarray(
                tensors["model.output.weight.scale"
                        if "model.output.weight" in tensors
                        else "model.embed.weight.scale"],
                np.float32)[:, None]
        elif "model.embed.weight.scale" in tensors \
                and "model.output.weight" not in tensors:
            lm32 = lm32 * np.asarray(tensors["model.embed.weight.scale"],
                                     np.float32)[:, None]
        for h in range(H):
            if medusa_heads < 0:  # identity heads
                tensors[f"medusa.{h}.w1.weight"] = np.zeros(
                    (cfg.dim, cfg.dim), np.float32)
                tensors[f"medusa.{h}.head.weight"] = lm32.copy()
            else:
                tensors[f"medusa.{h}.w1.weight"] = \
                    rng.standard_normal((cfg.dim, cfg.dim)).astype(
                        np.float32) * 0.02
                tensors[f"medusa.{h}.head.weight"] = \
                    rng.standard_normal((cfg.vocab_size, cfg.dim)).astype(
                        np.float32) * 0.02
            tensors[f"medusa.{h}.w1.bias"] = np.zeros(cfg.dim, np.float32)

    vocab = vocab if vocab is not None else synth_vocab(cfg.vocab_size)
    blob = b"".join(t.replace(b"\0", b"\7") + b"\0" for t in vocab)
    tensors["tokenizer.tokens"] = np.frombuffer(blob, dtype=np.uint8).copy()

    md = cfg.to_metadata()
    if medusa_heads:
        md["medusa_heads"] = str(abs(medusa_heads))
    write_yalm(path, tensors, md)


def synth_hf_dir(path: str, cfg: ModelConfig, seed: int = 0) -> None:
    """Write a tiny HuggingFace-layout model dir for converter round-trip tests."""
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)

    arch = ("MixtralForCausalLM" if cfg.is_moe
            else "Qwen3ForCausalLM" if cfg.has_qk_norm
            else "Qwen2ForCausalLM" if cfg.has_qkv_bias
            else "LlamaForCausalLM")
    config = {
        "architectures": [arch],
        "hidden_size": cfg.dim,
        "intermediate_size": cfg.hidden_dim,
        "head_dim": cfg.head_dim,
        "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "num_key_value_heads": cfg.n_kv_heads,
        "vocab_size": cfg.vocab_size,
        "max_position_embeddings": cfg.max_seq_len,
        "bos_token_id": cfg.bos_token_id,
        "eos_token_id": cfg.eos_token_id,
        "rope_theta": cfg.rope_theta,
        "partial_rotary_factor": cfg.rotary_dim / cfg.head_dim,
        "rms_norm_eps": cfg.norm_eps,
        "hidden_act": cfg.act_type,
        "tie_word_embeddings": cfg.tie_word_embeddings,
    }
    if cfg.is_moe:
        config["num_local_experts"] = cfg.n_experts
        config["num_experts_per_tok"] = cfg.n_experts_active
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f)

    # sentencepiece-style tokenizer.json (byte_fallback on)
    vocab = {}
    for i, t in enumerate(synth_vocab(cfg.vocab_size)):
        vocab[t.decode("utf-8", errors="replace").replace(" ", "▁")] = i
    tok = {"model": {"type": "BPE", "byte_fallback": True, "vocab": vocab, "merges": []},
           "added_tokens": []}
    with open(os.path.join(path, "tokenizer.json"), "w") as f:
        json.dump(tok, f)

    def w(*shape):
        return rng.standard_normal(shape, dtype=np.float32) / np.sqrt(shape[-1])

    tensors: dict[str, np.ndarray] = {}
    tensors["model.embed_tokens.weight"] = w(cfg.vocab_size, cfg.dim)
    for l in range(cfg.n_layers):
        p = f"model.layers.{l}"
        tensors[f"{p}.input_layernorm.weight"] = np.ones(cfg.dim, np.float32)
        tensors[f"{p}.self_attn.q_proj.weight"] = w(cfg.q_dim, cfg.dim)
        tensors[f"{p}.self_attn.k_proj.weight"] = w(cfg.kv_dim, cfg.dim)
        tensors[f"{p}.self_attn.v_proj.weight"] = w(cfg.kv_dim, cfg.dim)
        tensors[f"{p}.self_attn.o_proj.weight"] = w(cfg.dim, cfg.q_dim)
        if cfg.has_qk_norm:
            tensors[f"{p}.self_attn.q_norm.weight"] = \
                (1.0 + 0.1 * rng.standard_normal(cfg.head_dim)).astype(np.float32)
            tensors[f"{p}.self_attn.k_norm.weight"] = \
                (1.0 + 0.1 * rng.standard_normal(cfg.head_dim)).astype(np.float32)
        if cfg.has_qkv_bias:
            tensors[f"{p}.self_attn.q_proj.bias"] = w(cfg.q_dim)
            tensors[f"{p}.self_attn.k_proj.bias"] = w(cfg.kv_dim)
            tensors[f"{p}.self_attn.v_proj.bias"] = w(cfg.kv_dim)
        tensors[f"{p}.post_attention_layernorm.weight"] = np.ones(cfg.dim, np.float32)
        if cfg.is_moe:
            tensors[f"{p}.block_sparse_moe.gate.weight"] = w(cfg.n_experts, cfg.dim)
            for e in range(cfg.n_experts):
                tensors[f"{p}.block_sparse_moe.experts.{e}.w1.weight"] = w(cfg.hidden_dim, cfg.dim)
                tensors[f"{p}.block_sparse_moe.experts.{e}.w2.weight"] = w(cfg.dim, cfg.hidden_dim)
                tensors[f"{p}.block_sparse_moe.experts.{e}.w3.weight"] = w(cfg.hidden_dim, cfg.dim)
        else:
            tensors[f"{p}.mlp.gate_proj.weight"] = w(cfg.hidden_dim, cfg.dim)
            tensors[f"{p}.mlp.down_proj.weight"] = w(cfg.dim, cfg.hidden_dim)
            tensors[f"{p}.mlp.up_proj.weight"] = w(cfg.hidden_dim, cfg.dim)
    tensors["model.norm.weight"] = np.ones(cfg.dim, np.float32)
    if not cfg.tie_word_embeddings:
        tensors["lm_head.weight"] = w(cfg.vocab_size, cfg.dim)

    write_yalm(os.path.join(path, "model.safetensors"), tensors, {"format": "pt"})
