"""Tensor-parallel fast decode: shard_map over the Pallas kernels.

The oracle TP path lets NamedSharding + jit insert collectives around plain
XLA ops; this module is the performance twin for the Pallas decode path.
Each device runs the SAME fused kernels (ops/pallas) on its local Megatron
shard — its heads' q/k/v, its slice of the FFN hidden dim, its kv-heads'
cache — and the only cross-chip traffic is:

  - one psum after the wo-projection        (row-parallel matmul)
  - one psum after the w2-projection        (row-parallel matmul)
  - one psum to assemble the embedding row  (vocab-sharded table)
  - one all_gather of the vocab-sharded logits

which is exactly the Megatron-LM communication pattern (2 collectives per
block) riding ICI. The reference is single-device (src/model.cpp:385-386
"TODO: support multiple CUDA devices"); this is its scale-out replacement.

Uses the UNconcatenated `Weights` layout — per-matrix kernels keep each
shard's rows contiguous, so the same `shard_weights` placement serves both
the oracle and the fast path.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import KV_SINKS, ModelConfig
from ..models.cache import KVCache
from ..models.weights import Weights
from ..ops.core import gelu, silu, rmsnorm
from ..ops.pallas.attention import attend_step_l, attention_supported
from ..ops.pallas.gemv import gemv, gemv_l, gemv_supported
from .sharding import cache_pspecs, weight_pspecs


def fast_tp_supported(cfg: ModelConfig, tp: int, ep: int = 1) -> bool:
    """Models whose LOCAL shard shapes still fit the kernel tiling.

    Dense: experts absent, ep must be 1. MoE: experts shard over `ep`,
    expert-internal dims over `tp`."""
    if tp < 1 or ep < 1:
        return False
    if cfg.is_moe:
        if cfg.n_experts % ep:
            return False
    elif ep != 1:
        return False
    if cfg.n_kv_heads % tp or cfg.n_heads % tp or cfg.hidden_dim % tp \
            or cfg.vocab_size % tp:
        return False
    pairs = [
        (cfg.q_dim // tp, cfg.dim),
        (cfg.kv_dim // tp, cfg.dim),
        (cfg.dim, cfg.q_dim // tp),
        (cfg.hidden_dim // tp, cfg.dim),
        (cfg.dim, cfg.hidden_dim // tp),
        (cfg.vocab_size // tp, cfg.dim),
    ]
    if cfg.is_moe:
        pairs.append((cfg.n_experts, cfg.dim))
    return all(gemv_supported(n, k) for n, k in pairs) and attention_supported(cfg)


def make_decode_step_fast_tp(cfg: ModelConfig, mesh: Mesh,
                             output_logits: bool = True):
    """Build a jittable (weights, token, pos, cache) -> (logits, cache) step
    that runs the Pallas fast path on every `tp` shard via shard_map.

    MoE models additionally use the mesh's `ep` axis for expert parallelism:
    the router is computed replicated, each device evaluates only its LOCAL
    experts that the router selected (jax.lax.cond skips the weight stream
    for unselected local experts entirely — the data-dependent-skip property
    the reference gets from host control flow, src/infer.cpp:355-384), and
    one psum over ('ep','tp') assembles the FFN delta. Attention and dense
    projections are replicated over `ep` and sharded over `tp` as usual.
    """
    tp = mesh.shape["tp"]
    ep = mesh.shape.get("ep", 1)
    assert fast_tp_supported(cfg, tp, ep), (cfg, tp, ep)
    L = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    Hq_l, Hk_l = Hq // tp, Hk // tp          # local head counts
    V_l = cfg.vocab_size // tp
    E_l = cfg.n_experts // ep if cfg.is_moe else 0
    act = silu if cfg.act_type == "silu" else gelu

    w_specs = weight_pspecs(cfg)
    c_specs = cache_pspecs(cfg)

    def step(w: Weights, token, pos, cache: KVCache):
        lw = w.layers

        # vocab-sharded embedding row: local gather + psum assembles the row
        shard0 = jax.lax.axis_index("tp") * V_l
        local_idx = jnp.clip(token - shard0, 0, V_l - 1)
        row = w.embed[local_idx].astype(jnp.float32)
        row = jnp.where((token >= shard0) & (token < shard0 + V_l), row, 0.0)
        x = jax.lax.psum(row, "tp")

        kv_sink = jnp.where(pos >= L, KV_SINKS, 0)
        kv_pos = kv_sink + (pos - kv_sink) % (L - kv_sink)
        kv_len = jnp.minimum(pos + 1, L)

        def clip(a):
            if math.isinf(cfg.qkv_clip):
                return a
            return jnp.clip(a, -cfg.qkv_clip, cfg.qkv_clip)

        def layer_body(i, carry):
            x, k_all, v_all = carry
            xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(lw.rms_att, i, keepdims=False),
                         cfg.norm_eps)
            # column-parallel q/k/v: this shard computes its heads only
            q = gemv_l(xb, lw.wq, i)
            k = gemv_l(xb, lw.wk, i)
            v = gemv_l(xb, lw.wv, i)
            if lw.bq is not None:  # Qwen2-style biases, sharded with the rows
                q = q + jax.lax.dynamic_index_in_dim(lw.bq, i, keepdims=False)
                k = k + jax.lax.dynamic_index_in_dim(lw.bk, i, keepdims=False)
                v = v + jax.lax.dynamic_index_in_dim(lw.bv, i, keepdims=False)
            q, k, v = clip(q), clip(k), clip(v)

            # attention is fully local: the cache shard holds this device's
            # kv heads; the fused kernel ropes q/k and updates it in place
            mixed, k_all, v_all = attend_step_l(
                q.reshape(Hk_l, Hq_l // Hk_l, D), k.reshape(Hk_l, D),
                v.reshape(Hk_l, D), k_all, v_all,
                i, kv_pos, kv_len, kv_sink, pos,
                kv_sinks=KV_SINKS, theta=cfg.rope_theta,
                rotary_dim=cfg.rotary_dim)
            # row-parallel wo: partial sums -> ONE psum per block
            x = x + jax.lax.psum(
                gemv_l(mixed.reshape(Hq_l * D), lw.wo, i), "tp")

            xb2 = rmsnorm(x, jax.lax.dynamic_index_in_dim(lw.rms_ffn, i, keepdims=False),
                          cfg.norm_eps)
            if cfg.is_moe:
                from ..ops.core import moe_gate
                from ..ops.pallas.gemv import gemv_le
                # replicated router (moegate is replicated on the mesh)
                router = gemv_l(xb2, lw.moegate, i)
                gates, idx = moe_gate(router, cfg.n_experts_active)
                e0 = jax.lax.axis_index("ep") * E_l
                delta = jnp.zeros((cfg.dim,), jnp.float32)
                for le in range(E_l):
                    ge = e0 + le
                    gate = jnp.sum(jnp.where(idx == ge, gates, 0.0))
                    routed = jnp.any(idx == ge)

                    def run(xb2=xb2, le=le):
                        h1 = gemv_le(xb2, lw.w1, i, jnp.int32(le))
                        h3 = gemv_le(xb2, lw.w3, i, jnp.int32(le))
                        return gemv_le(act(h1) * h3, lw.w2, i, jnp.int32(le))

                    delta = delta + gate * jax.lax.cond(
                        routed, run, lambda: jnp.zeros((cfg.dim,), jnp.float32))
                # FFN delta assembles across experts (ep) AND hidden shards (tp)
                x = x + jax.lax.psum(delta, ("ep", "tp"))
            else:
                h1 = gemv_l(xb2, lw.w1, i)
                h3 = gemv_l(xb2, lw.w3, i)
                x = x + jax.lax.psum(gemv_l(act(h1) * h3, lw.w2, i), "tp")
            return (x, k_all, v_all)

        x, k_new, v_new = jax.lax.fori_loop(
            0, cfg.n_layers, layer_body, (x, cache.k, cache.v))
        if not output_logits:
            # hydrate-only steps skip the lm_head stream + logits gather
            return jnp.zeros((1,), jnp.float32), KVCache(k=k_new, v=v_new)
        x = rmsnorm(x, w.final_norm, cfg.norm_eps)
        # vocab-sharded logits -> gathered so the sampler sees the full row
        logits = jax.lax.all_gather(gemv(x, w.lm_head), "tp").reshape(-1)
        return logits, KVCache(k=k_new, v=v_new)

    return shard_map(
        step, mesh=mesh,
        in_specs=(w_specs, P(), P(), c_specs),
        out_specs=(P(), c_specs),
        check_vma=False,
    )
