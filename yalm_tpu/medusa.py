"""Medusa self-drafting heads (Cai et al., arXiv:2401.10774, Medusa-1).

A third speculative proposal source next to the draft model and prompt
lookup: H small learned heads read the target's own post-final-norm hidden
state and each predicts the token h+1 positions ahead. Head h is the
standard Medusa ResBlock + vocab projection:

    z_h = hidden + silu(W1_h @ hidden + b1_h)      (dim -> dim residual)
    proposal_h = argmax(Head_h @ z_h)              (dim -> vocab)

Proposals are DETERMINISTIC (argmax), so verification reuses the exact
point-mass rejection machinery of prompt lookup (spec.py): T=0 emits the
target's exact greedy stream, T>0 the exact target temperature
distribution — head quality only changes the speedup, never the output.

The heads live in the `.yalm` checkpoint as `medusa.{h}.w1.weight`,
`medusa.{h}.w1.bias`, `medusa.{h}.head.weight` with metadata
`medusa_heads = H` (the reference has no comparable machinery; its decode
is strictly one token per forward pass, src/main.cpp:102-112). Proposal
shapes: linear chains (engine + scheduler, composes with paged/mesh) and
TREE attention (scheduler spec_tree: per-depth top-k candidates form a
cartesian tree, one sweep verifies every chain —
models/fast.verify_tree_fast_batched).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .codec.format import YalmFile
from .config import ModelConfig


class MedusaWeights(NamedTuple):
    w1: jax.Array    # (H, dim, dim)
    b1: jax.Array    # (H, dim) f32
    head: jax.Array  # (H, vocab, dim)


def load_medusa_weights(yf: YalmFile, cfg: ModelConfig,
                        device_put=jnp.asarray) -> MedusaWeights:
    H = int(yf.metadata["medusa_heads"])
    t = yf.tensors

    def stack(fmt, shape):
        import numpy as np
        out = []
        for h in range(H):
            arr = t[fmt.format(h)]
            if tuple(arr.shape) != shape:
                raise ValueError(f"{fmt.format(h)}: want {shape}, "
                                 f"got {arr.shape}")
            out.append(arr.copy())  # never alias the checkpoint mmap
        return np.stack(out)

    d, v = cfg.dim, cfg.vocab_size
    return MedusaWeights(
        w1=device_put(stack("medusa.{}.w1.weight", (d, d))),
        b1=device_put(stack("medusa.{}.w1.bias", (d,))),
        head=device_put(stack("medusa.{}.head.weight", (v, d))),
    )


@jax.jit
def medusa_propose(mw: MedusaWeights, hidden: jax.Array) -> jax.Array:
    """Greedy proposals for positions +2..+H+1 from one hidden row (dim,).
    Returns (H,) int32 token ids. bf16 dots like the rest of the decode
    path; the argmax is temperature-independent (point-mass proposals)."""
    z = jnp.einsum("hij,j->hi", mw.w1.astype(jnp.bfloat16),
                   hidden.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) + mw.b1
    z = hidden[None].astype(jnp.float32) + jax.nn.silu(z)
    logits = jnp.einsum("hvi,hi->hv", mw.head.astype(jnp.bfloat16),
                        z.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def medusa_propose_topk_rows(mw: MedusaWeights, hidden: jax.Array,
                             kmax: int) -> jax.Array:
    """Batched TOP-K head proposals from per-lane hidden rows (B, dim) ->
    (B, H, kmax) int32: head h's kmax best candidates for position h+1
    ahead — the per-depth candidate sets of TREE-attention verification
    (models/fast.verify_tree_fast_batched). Column 0 is each head's argmax,
    so a (…, 1) slice reproduces the linear-chain proposals exactly."""
    z = jnp.einsum("hij,bj->bhi", mw.w1.astype(jnp.bfloat16),
                   hidden.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) + mw.b1[None]
    z = hidden[:, None].astype(jnp.float32) + jax.nn.silu(z)
    logits = jnp.einsum("hvi,bhi->bhv", mw.head.astype(jnp.bfloat16),
                        z.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    _, idx = jax.lax.top_k(logits, kmax)
    return idx.astype(jnp.int32)


@jax.jit
def medusa_propose_rows(mw: MedusaWeights, hidden: jax.Array) -> jax.Array:
    """Batched greedy proposals from per-lane hidden rows (B, dim) ->
    (B, H) int32 — the scheduler's per-round proposal source (one jitted
    dispatch proposes for every lane)."""
    z = jnp.einsum("hij,bj->bhi", mw.w1.astype(jnp.bfloat16),
                   hidden.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) + mw.b1[None]
    z = hidden[:, None].astype(jnp.float32) + jax.nn.silu(z)
    logits = jnp.einsum("hvi,bhi->bhv", mw.head.astype(jnp.bfloat16),
                        z.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
