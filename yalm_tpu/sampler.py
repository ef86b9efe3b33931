"""On-device sampling.

The reference samples on the host with a full-vocab scan over logits copied
back every token (src/sampler.cpp, src/model.h:187-189 pinned-host logits).
On TPU that host round-trip would dominate decode latency, so sampling runs
on device inside the jitted step and only the chosen token id (one int32)
crosses to the host. Temperature sampling uses jax.random.categorical —
the same distribution as the reference's inverse-CDF scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def sample_argmax(logits: jax.Array) -> jax.Array:
    """Greedy pick (reference src/sampler.cpp:27-38)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@jax.jit
def sample(logits: jax.Array, key: jax.Array, temperature: jax.Array) -> jax.Array:
    """Temperature sampling; temperature == 0 falls back to argmax
    (reference src/sampler.cpp:40-65)."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temp = jnp.maximum(temperature, 1e-6)
    sampled = jax.random.categorical(key, logits.astype(jnp.float32) / temp, axis=-1).astype(jnp.int32)
    return jnp.where(temperature > 0, sampled, greedy)


@jax.jit
def logprob_of(logits: jax.Array, token: jax.Array) -> jax.Array:
    """log p(token | logits): the perplexity-mode primitive
    (reference src/sampler.cpp:11-25 returns the prob; we keep it in log space)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, token[..., None], axis=-1)[..., 0]


@partial(jax.jit, static_argnames=("k",))
def sample_topk(logits: jax.Array, key: jax.Array, temperature: jax.Array, k: int) -> jax.Array:
    """Top-k restricted temperature sampling with a STATIC k (single-stream
    convenience; the serving path uses `sample_ext`, where k is data)."""
    vals, idx = jax.lax.top_k(logits, k)
    temp = jnp.maximum(temperature, 1e-6)
    choice = jax.random.categorical(key, vals.astype(jnp.float32) / temp, axis=-1)
    pick = jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(temperature > 0, pick, greedy).astype(jnp.int32)


@jax.jit
def sample_ext(logits: jax.Array, key: jax.Array, temperature: jax.Array,
               top_k: jax.Array, top_p: jax.Array) -> jax.Array:
    """Temperature sampling restricted to top-k AND/OR nucleus top-p, with
    k and p as DATA — one compiled program serves every per-request setting
    in a continuous batch (a static k would recompile the whole tick).

    top_k <= 0 disables the k cut; top_p >= 1 disables the nucleus cut.
    temperature == 0 is exact argmax regardless of k/p.
    """
    logits = logits.astype(jnp.float32)
    V = logits.shape[-1]
    desc = -jnp.sort(-logits, axis=-1)                      # descending
    k = jnp.where(top_k <= 0, V, jnp.clip(top_k, 1, V))
    kth = jnp.take_along_axis(desc, (k - 1)[..., None], axis=-1)[..., 0]

    # nucleus: smallest prefix of the sorted probs with mass >= top_p
    temp = jnp.maximum(temperature, 1e-6)
    probs = jax.nn.softmax(desc / temp[..., None] if temp.ndim else desc / temp,
                           axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    p = jnp.clip(top_p, 0.0, 1.0)
    # index of the first position where cumulative mass reaches p
    cut = jnp.sum((csum < p[..., None] if p.ndim else csum < p).astype(jnp.int32),
                  axis=-1)
    cut = jnp.clip(cut, 0, V - 1)
    pth = jnp.take_along_axis(desc, cut[..., None], axis=-1)[..., 0]
    pth = jnp.where(top_p >= 1.0, desc[..., -1], pth)

    thresh = jnp.maximum(kth, pth)
    masked = jnp.where(logits >= thresh[..., None], logits, -jnp.inf)
    sampled = jax.random.categorical(key, masked / temp, axis=-1).astype(jnp.int32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(temperature > 0, sampled, greedy)
