"""PartitionSpecs for weights, KV cache, and activations.

The tensor-parallel layout follows the classic Megatron split expressed as
NamedShardings (the "annotate and let XLA insert collectives" recipe):

- wq/wk/wv: output (head) dim on `tp`  -> each shard computes its heads' q/k/v
- wo:       input  (head) dim on `tp`  -> partial sums, XLA psums the output
- w1/w3:    hidden dim on `tp`         -> each shard computes its hidden slice
- w2:       input (hidden) dim on `tp` -> partial sums, psum on output
- KV cache: kv-head dim on `tp`        -> attention is fully local per shard
- embed / lm_head: vocab dim on `tp`   -> logits come out vocab-sharded;
  sampling reductions (argmax/softmax) run distributed
- MoE expert axis on `ep`; expert-internal dims on `tp` as above

The reference has nothing comparable (single device); this replaces its
"model must fit in VRAM" constraint (reference README.md:87) with mesh scale-out.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models.cache import KVCache
from ..models.weights import LayerWeights, Weights


def weight_pspecs(cfg: ModelConfig) -> Weights:
    """A Weights-shaped pytree of PartitionSpecs (leading axis = layers)."""
    e = ("ep",) if cfg.is_moe else ()
    layers = LayerWeights(
        rms_att=P(None, None),
        rms_ffn=P(None, None),
        wq=P(None, "tp", None),
        wk=P(None, "tp", None),
        wv=P(None, "tp", None),
        wo=P(None, None, "tp"),
        w1=P(None, *e, "tp", None),
        w2=P(None, *e, None, "tp"),
        w3=P(None, *e, "tp", None),
        moegate=P(None, None, None) if cfg.is_moe else None,
        bq=P(None, "tp") if cfg.has_qkv_bias else None,
        bk=P(None, "tp") if cfg.has_qkv_bias else None,
        bv=P(None, "tp") if cfg.has_qkv_bias else None,
        # per-head-dim q/k norms replicate (shared by all heads)
        qn=P(None, None) if cfg.has_qk_norm else None,
        kn=P(None, None) if cfg.has_qk_norm else None,
        # sandwich norms act on the full-width delta -> replicate
        pa=P(None, None) if cfg.has_post_norms else None,
        pf=P(None, None) if cfg.has_post_norms else None,
    )
    return Weights(
        embed=P("tp", None),
        layers=layers,
        final_norm=P(None),
        lm_head=P("tp", None),
    )


def cache_pspecs(cfg: ModelConfig, batched: bool = False) -> KVCache:
    """KV cache specs: shard the kv-head axis on tp, batch axis on dp."""
    b = ("dp",) if batched else ()
    spec = P(*b, None, None, "tp", None)
    return KVCache(k=spec, v=spec)


def _to_shardings(pspecs, mesh: Mesh):
    return jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_weights(weights: Weights, cfg: ModelConfig, mesh: Mesh) -> Weights:
    shardings = _to_shardings(weight_pspecs(cfg), mesh)
    return jax.tree.map(jax.device_put, weights, shardings)


def shard_cache(cache: KVCache, cfg: ModelConfig, mesh: Mesh, batched: bool = False) -> KVCache:
    shardings = _to_shardings(cache_pspecs(cfg, batched), mesh)
    return jax.tree.map(jax.device_put, cache, shardings)


def weight_shardings(cfg: ModelConfig, mesh: Mesh) -> Weights:
    return _to_shardings(weight_pspecs(cfg), mesh)


def cache_shardings(cfg: ModelConfig, mesh: Mesh, batched: bool = False) -> KVCache:
    return _to_shardings(cache_pspecs(cfg, batched), mesh)
