"""Weight pytrees and the checkpoint -> device loader.

TPU-native equivalent of the reference's Model/Block weight mapping
(src/model.cpp:134-394). Where the reference keeps per-layer raw pointers
into the mmap, we stack all layers' tensors along a leading n_layers axis so
the whole forward pass is a single `lax.scan` — one compiled layer body,
fast tracing, and a natural layout for sharding anyway (the layer axis is
never sharded).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.format import YalmFile
from ..config import ModelConfig


class LayerWeights(NamedTuple):
    """One transformer block's weights; every field stacked over n_layers."""

    rms_att: jax.Array   # (n_layers, dim) f32
    rms_ffn: jax.Array   # (n_layers, dim) f32
    wq: jax.Array        # (n_layers, q_dim, dim)
    wk: jax.Array        # (n_layers, kv_dim, dim)
    wv: jax.Array        # (n_layers, kv_dim, dim)
    wo: jax.Array        # (n_layers, dim, q_dim)
    w1: jax.Array        # (n_layers, [n_experts,] hidden_dim, dim)
    w2: jax.Array        # (n_layers, [n_experts,] dim, hidden_dim)
    w3: jax.Array        # (n_layers, [n_experts,] hidden_dim, dim)
    moegate: Optional[jax.Array]  # (n_layers, n_experts, dim) or None
    bq: Optional[jax.Array] = None  # (n_layers, q_dim) f32 — Qwen2-style biases
    bk: Optional[jax.Array] = None  # (n_layers, kv_dim) f32
    bv: Optional[jax.Array] = None  # (n_layers, kv_dim) f32
    # Qwen3-style per-head-dim RMSNorm on q/k (post-projection, pre-RoPE);
    # weights carry the same RoPE un-permutation as the q/k rows
    qn: Optional[jax.Array] = None  # (n_layers, head_dim) f32
    kn: Optional[jax.Array] = None  # (n_layers, head_dim) f32
    # Gemma2-style sandwich norms applied to the attention/FFN delta before
    # its residual add (rms_ffn holds pre_feedforward_layernorm)
    pa: Optional[jax.Array] = None  # (n_layers, dim) f32 post-attention
    pf: Optional[jax.Array] = None  # (n_layers, dim) f32 post-feedforward


class Weights(NamedTuple):
    embed: jax.Array      # (vocab_size, dim)
    layers: LayerWeights
    final_norm: jax.Array  # (dim,) f32
    lm_head: jax.Array     # (vocab_size, dim); embed itself when tied


def _expect(arr: np.ndarray, shape: tuple[int, ...], name: str) -> np.ndarray:
    if tuple(arr.shape) != shape:
        raise ValueError(f"tensor {name}: expected shape {shape}, got {tuple(arr.shape)}")
    return arr


def upcast_f16_for_tpu(tree):
    """Convert float16 leaves to bfloat16.

    Mosaic has no f16 support at all ("Unsupported type in mosaic dialect"),
    and the fast-path kernels already round every operand through bf16 for
    the MXU — so converting fp16 checkpoints to bf16 at load is numerically
    identical to what the kernels would compute per-tile, and is required
    for them to compile. Non-f16 leaves pass through untouched; identical
    leaves (tied embeddings) convert once and stay shared. Prefer the
    host-side cast in `f16_to_bf16_put` at load time — this device-side
    version transiently holds both copies of each converted leaf.
    """
    memo: dict[int, jax.Array] = {}

    def conv(a):
        if a.dtype != jnp.float16:
            return a
        key = id(a)
        if key not in memo:
            memo[key] = a.astype(jnp.bfloat16)
        return memo[key]

    return jax.tree.map(conv, tree)


def f16_to_bf16_put(device_put=jnp.asarray):
    """Wrap a device_put so float16 host arrays upload as bfloat16.

    The cast happens on the HOST (numpy view -> bf16 ndarray), so device HBM
    only ever holds the bf16 copy — a 7B fp16 checkpoint would otherwise
    transiently need ~2x its size during a device-side cast.
    """
    import ml_dtypes

    def put(a):
        if a.dtype == np.float16:
            a = a.astype(np.float32).astype(ml_dtypes.bfloat16)
        return device_put(a)

    return put


def load_weights(yf: YalmFile, cfg: ModelConfig, device_put=jnp.asarray) -> Weights:
    """Shape-check and stack every tensor (reference src/model.cpp:104-132, 347-378).

    `device_put` lets callers inject sharding-aware placement (e.g.
    functools.partial(jax.device_put, device=named_sharding)); the default
    simply materializes on the default device.
    """
    t = yf.tensors

    def get(name: str, shape: tuple[int, ...]) -> np.ndarray:
        if name not in t:
            raise KeyError(f"missing tensor: {name}")
        # COPY out of the checkpoint mmap: on the CPU backend jnp.asarray
        # zero-copy aliases aligned numpy arrays, so a view into the mmap
        # becomes a dangling pointer once the YalmFile is closed/GC'd —
        # the source of seemingly-random segfaults and garbage weights.
        # (Stacked tensors are implicitly copied by np.stack; this covers
        # the directly-loaded ones.)
        gs = t.get(name + ".gscale")
        if gs is not None:
            # int4 checkpoints: planar-packed nibbles + per-group scales;
            # the oracle dequantizes at load (exact f32), the fast loader
            # keeps packed bytes + scales (load_fast_weights)
            from ..ops.pallas.gemv import unpack_int4
            return _expect(
                unpack_int4(t[name], gs).astype(np.float32), shape, name)
        arr = _expect(t[name], shape, name)
        sc = t.get(name + ".scale")
        if sc is not None:
            # int8 checkpoints: the ORACLE path dequantizes at load
            # (q * per-output-channel scale, exact in f32) — the golden
            # semantics the fast path's in-kernel dequant must match.
            # The fast loader keeps int8 + scales instead (load_fast_weights).
            return arr.astype(np.float32) * np.asarray(sc, np.float32)[..., None]
        return arr.copy()

    d, h, kd, q = cfg.dim, cfg.hidden_dim, cfg.kv_dim, cfg.q_dim
    ffn_shape1 = (cfg.n_experts, h, d) if cfg.is_moe else (h, d)
    ffn_shape2 = (cfg.n_experts, d, h) if cfg.is_moe else (d, h)

    def stacked(fmt: str, shape: tuple[int, ...]) -> jax.Array:
        return device_put(np.stack([get(fmt.format(l), shape) for l in range(cfg.n_layers)]))

    layers = LayerWeights(
        rms_att=stacked("model.layers.{}.attn.norm.weight", (d,)),
        rms_ffn=stacked("model.layers.{}.mlp.norm.weight", (d,)),
        wq=stacked("model.layers.{}.attn.wq.weight", (q, d)),
        wk=stacked("model.layers.{}.attn.wk.weight", (kd, d)),
        wv=stacked("model.layers.{}.attn.wv.weight", (kd, d)),
        wo=stacked("model.layers.{}.attn.wo.weight", (d, q)),
        w1=stacked("model.layers.{}.mlp.w1.weight", ffn_shape1),
        w2=stacked("model.layers.{}.mlp.w2.weight", ffn_shape2),
        w3=stacked("model.layers.{}.mlp.w3.weight", ffn_shape1),
        moegate=stacked("model.layers.{}.moegate.weight", (cfg.n_experts, d)) if cfg.is_moe else None,
        bq=stacked("model.layers.{}.attn.wq.bias", (q,)) if cfg.has_qkv_bias else None,
        bk=stacked("model.layers.{}.attn.wk.bias", (kd,)) if cfg.has_qkv_bias else None,
        bv=stacked("model.layers.{}.attn.wv.bias", (kd,)) if cfg.has_qkv_bias else None,
        qn=(stacked("model.layers.{}.attn.q_norm.weight", (cfg.head_dim,))
            if cfg.has_qk_norm else None),
        kn=(stacked("model.layers.{}.attn.k_norm.weight", (cfg.head_dim,))
            if cfg.has_qk_norm else None),
        pa=(stacked("model.layers.{}.attn.post_norm.weight", (d,))
            if cfg.has_post_norms else None),
        pf=(stacked("model.layers.{}.mlp.post_norm.weight", (d,))
            if cfg.has_post_norms else None),
    )
    embed = device_put(get("model.embed.weight", (cfg.vocab_size, d)))
    if "model.output.weight" in t:
        lm_head = device_put(get("model.output.weight", (cfg.vocab_size, d)))
    else:
        # tied embeddings: classifier reuses the embedding matrix
        # (reference src/model.cpp:371-373)
        lm_head = embed
    return Weights(
        embed=embed,
        layers=layers,
        final_norm=device_put(get("model.norm.weight", (d,))),
        lm_head=lm_head,
    )
