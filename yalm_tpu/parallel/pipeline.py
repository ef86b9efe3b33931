"""Pipeline parallelism: layer-sharded, microbatch-pipelined decode tick.

The stacked-layer weight layout (every per-layer tensor is (n_layers, ...))
makes pipeline sharding a one-line PartitionSpec: the LAYER axis shards
over a 'pp' mesh axis, so each device holds n_layers/pp contiguous layers
plus the KV-cache slots for exactly those layers — a model (and cache) too
big for one chip's HBM runs across pp chips with NO weight collectives at
all; only (B/pp, dim) activation blocks move between ICI neighbors.

The tick pipelines GPipe-style: B lanes split into pp microbatches; over
2*pp-1 rotation steps, device p processes the microbatch t-p (its stage's
layers), then ppermutes the residual stream to stage p+1. At steady state
all pp devices compute concurrently on different microbatches; the fill/
drain bubble is (pp-1)/(2*pp-1) of a tick and amortizes across ticks only
in latency, not in the aggregate-throughput direction B scales.

The reference is strictly single-device ("the entire model must fit into
VRAM", reference README.md:87; "TODO: support multiple CUDA devices",
src/model.cpp:385); SURVEY §2.6 lists PP among the axes the rebuild adds.
Dense models, single-host mesh, v1.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import KV_SINKS, ModelConfig
from ..models.cache import KVCache
from ..models.fast import (FastScales, FastWeights, _cap_logits,
                           _layer_alt, _layer_win, _post_norm, _proj_l,
                           _qk_norm, is_int4)
from ..ops.core import act_fn
from ..models.weights import Weights
from ..ops.core import rmsnorm
from ..ops.pallas.attention import attend_step_batched_l
from ..ops.pallas.ffn import ffn_l
from ..ops.pallas.gemv import gemm


def pp_supported(cfg: ModelConfig, pp: int, batch: int) -> bool:
    # layer-axis sharding leaves every (N, K) intact, so any dtype the
    # single-chip fast path handles (incl. packed int4 via _proj_l) works
    return (not cfg.is_moe and pp >= 1
            and cfg.n_layers % pp == 0 and batch % pp == 0)


def pp_weight_pspecs(cfg: ModelConfig,
                     with_scales: bool = False) -> FastWeights:
    """Layer-stacked tensors shard their LAYER axis on 'pp'; embed/head/
    final-norm replicate (stage 0 embeds, the last stage unembeds)."""
    scales = None
    if with_scales and cfg.weight_dtype == "int4":
        # int4 GROUP scales are (L, G, N): still layer-major, so the same
        # 'pp' layer-axis shard applies (one extra trailing dim)
        scales = FastScales(
            embed=P(None), wqkv=P("pp", None, None), wo=P("pp", None, None),
            w13=P("pp", None, None), w2=P("pp", None, None),
            lm_head=P(None), moegate=None,
        )
    elif with_scales:
        scales = FastScales(
            embed=P(None), wqkv=P("pp", None), wo=P("pp", None),
            w13=P("pp", None), w2=P("pp", None), lm_head=P(None),
            moegate=None,
        )
    return FastWeights(
        scales=scales,
        embed=P(None, None),
        rms_att=P("pp", None),
        rms_ffn=P("pp", None),
        wqkv=P("pp", None, None),
        wo=P("pp", None, None),
        w13=P("pp", None, None),
        w2=P("pp", None, None),
        final_norm=P(None),
        lm_head=P(None, None),
        moegate=None,
        bqkv=P("pp", None) if cfg.has_qkv_bias else None,
        qnorm=P("pp", None) if cfg.has_qk_norm else None,
        knorm=P("pp", None) if cfg.has_qk_norm else None,
        pa=P("pp", None) if cfg.has_post_norms else None,
        pf=P("pp", None) if cfg.has_post_norms else None,
    )


def shard_pp_weights(weights: Weights | FastWeights, cfg: ModelConfig,
                     mesh: Mesh) -> FastWeights:
    if isinstance(weights, Weights):
        weights = FastWeights.from_weights(weights, cfg)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        pp_weight_pspecs(cfg, with_scales=weights.scales is not None),
        is_leaf=lambda x: isinstance(x, P))
    return jax.tree.map(jax.device_put, weights, shardings)


def pp_cache_pspecs() -> KVCache:
    """Batched cache (B, n_layers, S, Hk, D): layer axis on 'pp'."""
    return KVCache(k=P(None, "pp", None, None, None),
                   v=P(None, "pp", None, None, None))


def shard_pp_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        cache, pp_cache_pspecs())


def make_tick_pp(cfg: ModelConfig, mesh: Mesh, batch: int,
                 with_scales: bool = False):
    """Build tick(fast_weights, tokens (B,), positions (B,), cache,
    write_mask (B,)) -> (logits (B, vocab), cache) pipelined over 'pp'."""
    pp = mesh.shape["pp"]
    assert pp_supported(cfg, pp, batch), (cfg.n_layers, pp, batch)
    B, Bm = batch, batch // pp
    nl_l = cfg.n_layers // pp
    L = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    qpk = Hq // Hk
    w_specs = pp_weight_pspecs(cfg, with_scales)
    c_specs = pp_cache_pspecs()

    def clip(a):
        if math.isinf(cfg.qkv_clip):
            return a
        return jnp.clip(a, -cfg.qkv_clip, cfg.qkv_clip)

    def body(fw: FastWeights, tokens, positions, cache: KVCache,
             write_mask):
        sc = fw.scales
        p = jax.lax.axis_index("pp")
        kv_sink_all = jnp.where(positions >= L, KV_SINKS, 0)
        kv_pos_all = kv_sink_all + (positions - kv_sink_all) \
            % (L - kv_sink_all)
        kv_len_all = jnp.minimum(positions + 1, L)

        def stage(x, kc, vc, pos_mb, kv_pos, kv_len, kv_sink, wm):
            """This device's nl_l layers on one (Bm, dim) microbatch.
            Per-layer sliding windows / dual rope index the STATIC config
            tuples by the GLOBAL layer id (stage offset + local i); the
            sharded weight stacks index by the LOCAL i."""
            def layer_body(i, carry):
                x, kc, vc = carry
                gi = p * nl_l + i       # global layer index
                xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                    fw.rms_att, i, keepdims=False), cfg.norm_eps)
                qkv = _proj_l(xb, fw.wqkv, i, sc.wqkv if sc else None)
                if fw.bqkv is not None:
                    qkv = qkv + jax.lax.dynamic_index_in_dim(
                        fw.bqkv, i, keepdims=False)
                qkv = clip(qkv)
                q = qkv[:, : cfg.q_dim]
                k = qkv[:, cfg.q_dim: cfg.q_dim + cfg.kv_dim]
                v = qkv[:, cfg.q_dim + cfg.kv_dim:]
                q, k = _qk_norm(q, k, fw, i, cfg)
                mixed, kc, vc = attend_step_batched_l(
                    q.reshape(Bm, Hk, qpk, D), k.reshape(Bm, Hk, D),
                    v.reshape(Bm, Hk, D), kc, vc, i, kv_pos, kv_len,
                    kv_sink, pos_mb, wm, _layer_win(cfg, gi),
                    _layer_alt(cfg, gi), kv_sinks=KV_SINKS,
                    theta=cfg.rope_param, rotary_dim=cfg.rotary_dim,
                    softcap=cfg.attn_softcap)
                x = x + _post_norm(
                    _proj_l(mixed.reshape(Bm, cfg.q_dim), fw.wo, i,
                            sc.wo if sc else None), fw.pa, i, cfg.norm_eps)
                if fw.pf is None and not is_int4(fw.wqkv):
                    x = ffn_l(x, fw.rms_ffn, fw.w13, fw.w2, i,
                              sc.w13 if sc else None, sc.w2 if sc else None,
                              norm_eps=cfg.norm_eps, act=cfg.act_type)
                else:
                    xb2 = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                        fw.rms_ffn, i, keepdims=False), cfg.norm_eps)
                    h13 = _proj_l(xb2, fw.w13, i, sc.w13 if sc else None)
                    h = act_fn(cfg.act_type)(h13[:, : cfg.hidden_dim]) \
                        * h13[:, cfg.hidden_dim:]
                    x = x + _post_norm(
                        _proj_l(h, fw.w2, i, sc.w2 if sc else None),
                        fw.pf, i, cfg.norm_eps)
                return (x, kc, vc)

            return jax.lax.fori_loop(0, nl_l, layer_body, (x, kc, vc))

        def rotation(t, carry):
            xbuf, kc, vc, xdrain = carry
            mb = t - p
            valid = (mb >= 0) & (mb < pp)
            mb_c = jnp.clip(mb, 0, pp - 1)
            sl = mb_c * Bm
            toks_mb = jax.lax.dynamic_slice(tokens, (sl,), (Bm,))
            x_fresh = fw.embed[toks_mb].astype(jnp.float32)
            if cfg.embed_scale != 1.0:
                x_fresh = x_fresh * cfg.embed_scale
            if sc is not None:
                x_fresh = x_fresh * sc.embed[toks_mb][:, None]
            x_in = jnp.where(p == 0, x_fresh, xbuf)
            pos_mb = jax.lax.dynamic_slice(positions, (sl,), (Bm,))
            wm = jax.lax.dynamic_slice(write_mask, (sl,), (Bm,))
            wm = jnp.where(valid, wm, 0)   # bubble steps never write
            kc_mb = jax.lax.dynamic_slice(
                kc, (sl, 0, 0, 0, 0), (Bm, nl_l, L, Hk, D))
            vc_mb = jax.lax.dynamic_slice(
                vc, (sl, 0, 0, 0, 0), (Bm, nl_l, L, Hk, D))
            x_out, kc_mb, vc_mb = stage(
                x_in, kc_mb, vc_mb, pos_mb,
                jax.lax.dynamic_slice(kv_pos_all, (sl,), (Bm,)),
                jax.lax.dynamic_slice(kv_len_all, (sl,), (Bm,)),
                jax.lax.dynamic_slice(kv_sink_all, (sl,), (Bm,)), wm)
            kc = jax.lax.dynamic_update_slice(kc, kc_mb, (sl, 0, 0, 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, vc_mb, (sl, 0, 0, 0, 0))
            # drained microbatch: the LAST stage banks its residual rows;
            # the (B, vocab) unembed happens ONCE after the loop (doing it
            # per rotation step cost (2*pp-1) masked vocab GEMMs and an
            # 8x-larger psum)
            xd = jnp.where((p == pp - 1) & valid,
                           x_out.astype(jnp.float32), 0.0)
            xdrain = jax.lax.dynamic_update_slice(
                xdrain, jax.lax.dynamic_slice(xdrain, (sl, 0),
                                              (Bm, cfg.dim)) + xd,
                (sl, 0))
            # residual stream to the next stage (last stage's send is
            # overwritten by stage 0's fresh embedding)
            xbuf = jax.lax.ppermute(
                x_out, "pp", [(i, (i + 1) % pp) for i in range(pp)])
            return (xbuf, kc, vc, xdrain)

        x0 = jnp.zeros((Bm, cfg.dim), jnp.float32)
        xd0 = jnp.zeros((B, cfg.dim), jnp.float32)
        _, kc, vc, xdrain = jax.lax.fori_loop(
            0, 2 * pp - 1, rotation, (x0, cache.k, cache.v, xd0))
        # only the last stage contributed rows; the small (B, dim) psum
        # replicates them, then every device unembeds once
        xdrain = jax.lax.psum(xdrain, "pp")
        xn = rmsnorm(xdrain, fw.final_norm, cfg.norm_eps)
        out = _cap_logits(cfg, gemm(xn, fw.lm_head, sc.lm_head if sc else None))
        return out, KVCache(k=kc, v=vc)

    return shard_map(
        body, mesh=mesh,
        in_specs=(w_specs, P(), P(), c_specs, P()),
        out_specs=(P(), c_specs),
        check_vma=False,
    )
