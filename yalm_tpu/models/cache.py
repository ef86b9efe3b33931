"""KV cache pytree.

The reference allocates one f16 (seq_len, n_kv_heads*head_dim) K and V buffer
per block (src/model.cpp:171-172, src/model.h:299-300). Here the cache is a
single stacked array per K/V with a leading layer axis — matching the
stacked-weights `lax.scan` layout — shaped (n_layers, max_seq_len,
n_kv_heads, head_dim). The head axis is separate so tensor-parallel sharding
can partition it directly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig


class KVCache(NamedTuple):
    k: jax.Array  # (n_layers, max_seq_len, n_kv_heads, head_dim)
    v: jax.Array  # (n_layers, max_seq_len, n_kv_heads, head_dim)

    @classmethod
    def init(cls, cfg: ModelConfig, dtype=jnp.float16, batch: int | None = None) -> "KVCache":
        shape = (cfg.n_layers, cfg.max_seq_len, cfg.n_kv_heads, cfg.head_dim)
        if batch is not None:
            shape = (batch,) + shape
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))
