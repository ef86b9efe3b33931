"""Continuous-batching scheduler.

New capability beyond the reference, which decodes a single stream
sequentially (src/main.cpp:102-112); BASELINE.json requires a continuous
batching layer. Design:

- A fixed pool of B slots, each owning one lane of a batched KV cache
  (B, n_layers, L, kv_heads, head_dim) — batch rides the `dp` mesh axis when
  sharded. Shapes never change: slot occupancy is data, not shape.
- Every tick runs ONE jitted batched decode+sample step for all slots
  (inactive lanes compute garbage that is masked out — the fixed-shape
  price of zero recompiles).
- Admission: free slots take queued requests; the new request's prompt is
  prefilled into its slot's cache lanes between ticks (chunked, same
  bucketed programs as the single-stream engine), then the slot joins the
  batched decode.
- Completion: EOS/stop/max-tokens frees the slot at the next tick boundary.

The host-side loop is intentionally thin: all math lives in two jitted
programs (batched tick, per-slot prefill).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .models.cache import KVCache
from .models.fast import (FastWeights, decode_step_fast_batched,
                          fast_batched_supported, prefill_fast)
from .models.transformer import decode_step, prefill
from .models.weights import Weights
from .sampler import sample_ext
from .engine import PREFILL_BUCKETS, _bucket_for, chunk_schedule


_NBIAS = 16  # static per-request logit_bias capacity (OpenAI logit_bias)


def _apply_bias(lg, bias_ids, bias_vals):
    """OpenAI logit_bias: per-lane sparse (token id, value) pairs added to
    the logits before sampling — everything downstream (the sample, the
    reported logprob, top-N) sees the BIASED distribution, i.e. the
    distribution actually sampled (OpenAI semantics). bias_ids (B, _NBIAS)
    int32 with -1 marking empty slots; bias_vals (B, _NBIAS) f32."""
    B = lg.shape[0]
    ids = jnp.clip(bias_ids, 0, lg.shape[-1] - 1)
    # empty slots (-1) AND out-of-vocab ids are inert (not clipped onto
    # the last vocab entry)
    vals = jnp.where((bias_ids >= 0) & (bias_ids < lg.shape[-1]),
                     bias_vals, 0.0)
    return lg.at[jnp.arange(B)[:, None], ids].add(vals)


def _sample_pack(logits, seeds, positions, temps, topks, topps,
                 bias_ids, bias_vals, topn: int = 0):
    """Batched sample + OpenAI logprob, packed into ONE (2 [+ 2*topn], B)
    f32 array so the host fetches a single tiny buffer per tick (each host
    fetch costs a full tunnel RTT; token ids are exact in f32 — vocab <
    2^24). Row 0: sampled ids; row 1: log-prob of the sampled token under
    the FULL (temperature-independent) distribution; rows 2..2+topn: the
    top-topn alternative ids, then their log-probs (OpenAI top_logprobs)."""
    keys = jax.vmap(lambda s, p: jax.random.fold_in(jax.random.PRNGKey(s), p))(
        seeds, positions)
    lg = _apply_bias(logits.astype(jnp.float32), bias_ids, bias_vals)
    nxt = jax.vmap(sample_ext)(lg, keys, temps, topks, topps)
    lse = jax.scipy.special.logsumexp(lg, axis=-1)
    lp = jnp.take_along_axis(
        lg, nxt[:, None].astype(jnp.int32), axis=-1)[:, 0] - lse
    rows = [nxt.astype(jnp.float32), lp]
    if topn:
        tv, ti = jax.lax.top_k(lg, topn)                 # (B, topn)
        rows += list(ti.astype(jnp.float32).T) + list((tv - lse[:, None]).T)
    return jnp.stack(rows)


def _unpack_sample(packed, topn: int = 0):
    arr = np.asarray(packed)  # the one host fetch of the tick
    nxt, lps = arr[0].astype(np.int32), arr[1]
    if not topn:
        return nxt, lps, None
    tops = [list(zip(arr[2 + k].astype(np.int32), arr[2 + topn + k]))
            for k in range(topn)]
    # per-lane list of (id, lp) pairs: tops[k][b] -> lane b's k-th best
    per_lane = [[(int(tops[k][b][0]), float(tops[k][b][1]))
                 for k in range(topn)] for b in range(arr.shape[1])]
    return nxt, lps, per_lane


@partial(jax.jit, static_argnames=("topn",))
def _sample1_pack(logits, seed, pos, temp, topk, topp, bias_ids, bias_vals,
                  topn: int = 0):
    """Single-lane variant of _sample_pack (admission's first token):
    sample + logprob(s) in one jitted dispatch, one small f32 fetch."""
    key = jax.random.fold_in(jax.random.PRNGKey(seed), pos)
    lg = _apply_bias(logits.astype(jnp.float32)[None],
                     bias_ids[None], bias_vals[None])[0]
    nxt = sample_ext(lg, key, temp, topk, topp)
    lse = jax.scipy.special.logsumexp(lg)
    rows = [nxt.astype(jnp.float32), lg[nxt] - lse]
    if topn:
        tv, ti = jax.lax.top_k(lg, topn)
        rows += [ti.astype(jnp.float32), tv - lse]
    return jnp.stack(rows) if not topn else (
        jnp.concatenate([jnp.stack(rows[:2]), rows[2], rows[3]]))


@partial(jax.jit, static_argnames=("topn",))
def _verify_pack(logits, chunk, seeds, positions, temps, topks, topps,
                 topn: int = 0):
    """Post-process a speculative verify sweep ON DEVICE so the host fetches
    (B, K+1, 6 + 2*topn) floats instead of the full (B, K+1, V) logits
    (~5 MB per round at 7B vocab).

    Every scheduler proposal source is a POINT MASS per row (greedy draft
    ticks, prompt-lookup n-grams, medusa argmax heads propose exactly one
    token), so exact rejection sampling (Leviathan et al., arXiv:2211.17192)
    reduces to: accept proposal x = chunk[:, i+1] w.p. min(1, p_T(x)/1) =
    p_T(x); on rejection, the correction samples the residual
    max(p_T - q, 0) ∝ p_T with x masked out; if every proposal lands, the
    bonus token samples p_T at the last verified row. The emitted stream is
    then distributed EXACTLY as plain temperature sampling from the target
    (the engine's rejection_sample_verify math, batched on device).
    Temperature-0 lanes degenerate to exact argmax acceptance — bitwise the
    old greedy semantics.

    Layout: [..., 0] accept flag, [..., 1] logprob of the proposed token,
    [..., 2] residual-correction id, [..., 3] its logprob, [..., 4] bonus
    id, [..., 5] its logprob, then topn top ids and topn top logprobs of
    each row. Token ids are exact in f32; all reported logprobs are under
    the FULL temperature-independent distribution (OpenAI semantics, same
    as _sample_pack row 1)."""
    B, K1, V = logits.shape
    lg = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lg, axis=-1)            # (B, K+1)
    prop = jnp.concatenate([chunk[:, 1:], chunk[:, :1]],
                           axis=1).astype(jnp.int32)          # (B, K+1)
    lp_c = jnp.take_along_axis(lg, prop[..., None], axis=-1)[..., 0] - lse
    greedy_t = jnp.argmax(lg, axis=-1)                        # (B, K+1)

    temp = jnp.maximum(temps, 1e-6)[:, None, None]            # (B, 1, 1)
    scaled = lg / temp

    # Per-request top-k/top-p envelope applied to the TARGET distribution
    # BEFORE the accept/residual math — sample_ext's exact cut with k/p as
    # data, so rejection sampling emits exactly what plain envelope
    # sampling would. Out-of-envelope proposals get p_T = 0 (always
    # rejected; the residual is envelope-restricted too). The V-sort only
    # runs when some lane actually has an envelope (lax.cond).
    def _with_envelope():
        desc = -jnp.sort(-lg, axis=-1)                        # descending
        k = jnp.where(topks <= 0, V, jnp.clip(topks, 1, V))   # (B,)
        kth = jnp.take_along_axis(
            desc, jnp.broadcast_to((k - 1)[:, None, None], (B, K1, 1)),
            axis=-1)[..., 0]                                  # (B, K+1)
        probs = jax.nn.softmax(desc / temp, axis=-1)
        csum = jnp.cumsum(probs, axis=-1)
        p = jnp.clip(topps, 0.0, 1.0)[:, None, None]
        cut = jnp.clip(jnp.sum((csum < p).astype(jnp.int32), axis=-1),
                       0, V - 1)
        pth = jnp.take_along_axis(desc, cut[..., None], axis=-1)[..., 0]
        pth = jnp.where(topps[:, None] >= 1.0, desc[..., -1], pth)
        thresh = jnp.maximum(kth, pth)
        return jnp.where(lg >= thresh[..., None], scaled, -jnp.inf)

    scaled = jax.lax.cond(jnp.any((topks > 0) | (topps < 1.0)),
                          _with_envelope, lambda: scaled)
    lse_T = jax.scipy.special.logsumexp(scaled, axis=-1)
    lp_T_x = jnp.take_along_axis(scaled, prop[..., None],
                                 axis=-1)[..., 0] - lse_T
    # independent per-(lane, row) key chains: fold the row's absolute
    # position into the request seed (rows land at distinct positions, and
    # the plain tick's _sample_pack uses the UNfolded key at a position,
    # so spec and plain draws never share a stream)
    rowpos = positions[:, None] + jnp.arange(K1)[None]        # (B, K+1)
    base = jax.vmap(jax.vmap(
        lambda s, p: jax.random.fold_in(jax.random.PRNGKey(s), p),
        in_axes=(None, 0)))(seeds, rowpos)
    sub = lambda n: jax.vmap(jax.vmap(
        lambda k: jax.random.fold_in(k, n)))(base)
    u = jax.vmap(jax.vmap(jax.random.uniform))(sub(1))        # (B, K+1)
    sampled_lane = (temps > 0.0)[:, None]
    acc = jnp.where(sampled_lane, u < jnp.exp(lp_T_x), prop == greedy_t)
    # residual = p_T with the proposed token masked (point-mass q); if the
    # mask empties the support (p_T(x) ~ 1) the acceptance already fires
    # w.p. ~1, but guard the categorical against all -inf anyway
    masked = jnp.where(jnp.arange(V)[None, None] == prop[..., None],
                       -jnp.inf, scaled)
    cat = jax.vmap(jax.vmap(jax.random.categorical))
    res = cat(sub(2), masked).astype(jnp.int32)
    res = jnp.where(jnp.isfinite(jnp.max(masked, axis=-1)), res, greedy_t)
    bon = cat(sub(3), scaled).astype(jnp.int32)
    res = jnp.where(sampled_lane, res, greedy_t)
    bon = jnp.where(sampled_lane, bon, greedy_t)
    res_lp = jnp.take_along_axis(lg, res[..., None], axis=-1)[..., 0] - lse
    bon_lp = jnp.take_along_axis(lg, bon[..., None], axis=-1)[..., 0] - lse
    cols = [acc.astype(jnp.float32), lp_c, res.astype(jnp.float32), res_lp,
            bon.astype(jnp.float32), bon_lp]
    if topn:
        tv, ti = jax.lax.top_k(lg, topn)                      # (B, K+1, n)
        cols += ([ti[..., k].astype(jnp.float32) for k in range(topn)]
                 + [tv[..., k] - lse for k in range(topn)])
    return jnp.stack(cols, axis=-1)


@partial(jax.jit, static_argnames=("topn",))
def _verify_pack_medusa(logits, chunk, seeds, positions, temps, topks,
                        topps, kd, hidden, mw, topn: int = 0):
    """_verify_pack plus the NEXT round's Medusa proposals in the SAME
    fetch: recompute the accept walk on device (bitwise the host walk —
    leading accepts clipped to each lane's proposal count kd), gather the
    hidden row at the correction index, run the heads there, and append
    the proposals as one extra trailing column (rows 0..H-1). One
    dispatch, one host fetch per round — the heads never cost a second
    tunnel RTT (the engine path keeps hidden device-resident the same
    way, engine.generate_medusa)."""
    from .medusa import medusa_propose_rows
    vp = _verify_pack(logits, chunk, seeds, positions, temps, topks, topps,
                      topn=topn)
    B, K1 = chunk.shape
    acc = vp[..., 0] > 0.5
    idx = jnp.arange(K1)[None]
    rej = (~acc) & (idx < kd[:, None])
    a = jnp.where(rej.any(axis=1), jnp.argmax(rej, axis=1),
                  kd).astype(jnp.int32)                       # (B,)
    h_a = jnp.take_along_axis(hidden, a[:, None, None], axis=1)[:, 0]
    props = medusa_propose_rows(mw, h_a)                      # (B, H)
    Hc = min(int(props.shape[1]), K1 - 1)  # next chunk holds at most K
    col = jnp.zeros((B, K1, 1), jnp.float32)
    col = col.at[:, :Hc, 0].set(props[:, :Hc].astype(jnp.float32))
    return jnp.concatenate([vp, col], axis=-1)


@partial(jax.jit, static_argnames=("parents", "kmax", "topn"))
def _verify_pack_tree(logits, chunk, live, hidden, mw, *, parents,
                      kmax: int, topn: int = 0):
    """Post-process a TREE verify sweep ON DEVICE (greedy lanes only): one
    (B, Tn, C) fetch carrying, per node row, [argmax id, its full-dist
    logprob, the node's OWN token's logprob under its PARENT's row, topn
    ids, topn logprobs, the walked FINAL node (broadcast), next-round
    head proposals (broadcast)]. The accept walk (descend to the child
    whose token equals the parent row's argmax) runs here so the Medusa
    heads read ONLY the final node's hidden row — the host reconstructs
    the same path from the final node's ancestor chain."""
    from .medusa import medusa_propose_topk_rows
    from .models.fast import tree_depths

    B, Tn, V = logits.shape
    depths = tree_depths(parents)
    Dmax = max(depths)
    par = jnp.asarray([max(p, 0) for p in parents], jnp.int32)
    dep = jnp.asarray(depths, jnp.int32)
    lg = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lg, axis=-1)               # (B, Tn)
    arg = jnp.argmax(lg, axis=-1).astype(jnp.int32)              # (B, Tn)
    arg_lp = jnp.take_along_axis(lg, arg[..., None],
                                 axis=-1)[..., 0] - lse
    own_lp = jnp.take_along_axis(lg[:, par], chunk[..., None].astype(
        jnp.int32), axis=-1)[..., 0] - lse[:, par]

    def walk(arg_b, chunk_b, live_b):
        def body(d, carry):
            node, alive = carry
            want = arg_b[node]
            mask = (par == node) & (chunk_b == want) & (dep == d + 1)
            found = jnp.any(mask)
            nxt = jnp.argmax(mask).astype(jnp.int32)
            node = jnp.where(found & alive, nxt, node)
            return node, alive & found
        node, _ = jax.lax.fori_loop(
            0, Dmax, body, (jnp.int32(0), live_b != 0))
        return node

    fin = jax.vmap(walk)(arg, chunk.astype(jnp.int32), live)     # (B,)
    h_fin = jnp.take_along_axis(hidden, fin[:, None, None],
                                axis=1)[:, 0]                    # (B, dim)
    props = medusa_propose_topk_rows(mw, h_fin, kmax)            # (B, H, k)
    cols = [arg.astype(jnp.float32), arg_lp, own_lp]
    if topn:
        tv, ti = jax.lax.top_k(lg, topn)
        cols += ([ti[..., k].astype(jnp.float32) for k in range(topn)]
                 + [tv[..., k] - lse for k in range(topn)])
    cols.append(jnp.broadcast_to(fin[:, None].astype(jnp.float32),
                                 (B, Tn)))
    flat = props.reshape(B, -1).astype(jnp.float32)
    cols += [jnp.broadcast_to(flat[:, j:j + 1], (B, Tn))
             for j in range(flat.shape[1])]
    return jnp.stack(cols, axis=-1)


class _DensePrefixRegistry:
    """Token-granular prompt-prefix reuse for the DENSE batched cache.

    The paged pool shares refcounted pages (models/paged.py); a dense lane
    OWNS its rows, so reuse is a lane-to-lane HBM copy instead: a finished
    admission registers (prompt tokens, lane), and a later admission
    copies the registered lane's cache rows and skips prefilling the
    common prefix (~0.5 GB / <1 ms at 7B — far below re-prefilling
    hundreds of tokens). Entries stay valid while the source lane's rows
    [0, len) are intact: rows survive the request FINISHING (the lane
    sits idle) and die when a NEW request starts hydrating that lane
    (invalidate_lane); the registering request itself can never enter the
    ring regime (scheduler._prefix_cacheable gate). Matching is
    TOKEN-granular — causal attention makes identical token prefixes
    yield identical KV rows — finer than the paged pool's full-page
    chained keys."""

    def __init__(self, cap: int = 64):
        self.cap = cap
        self.entries: list[tuple[tuple, int]] = []   # (tokens, lane)
        self.stats = {"hits": 0, "hit_tokens": 0, "registered": 0,
                      "evicted": 0}

    def register(self, lane: int, tokens) -> None:
        t = tuple(tokens)
        self.entries = [(tk, ln) for tk, ln in self.entries if tk != t]
        self.entries.append((t, lane))
        self.stats["registered"] += 1
        while len(self.entries) > self.cap:
            self.entries.pop(0)
            self.stats["evicted"] += 1

    def invalidate_lane(self, lane: int) -> None:
        """A new request is about to overwrite this lane's rows."""
        self.entries = [(t, ln) for t, ln in self.entries if ln != lane]

    def match(self, tokens, limit: int) -> tuple[int, int]:
        """Longest common prefix (capped at `limit`) against every live
        entry. Returns (src_lane, n_tokens); (-1, 0) when nothing helps."""
        new = np.asarray(tokens, np.int64)
        best_lane, best = -1, 0
        for t, ln in self.entries:
            m = min(len(t), len(new), limit)
            if m <= best:
                continue
            neq = np.nonzero(np.asarray(t[:m], np.int64) != new[:m])[0]
            p = int(neq[0]) if len(neq) else m
            if p > best:
                best, best_lane = p, ln
        return best_lane, best


@dataclasses.dataclass
class Request:
    prompt_tokens: list[int]
    max_new_tokens: int = 128
    temperature: float = 1.0
    stop_tokens: frozenset[int] = frozenset()
    seed: int = 0
    top_k: int = 0        # 0 = full-vocab sampling
    top_p: float = 1.0    # 1.0 = no nucleus cut
    # OpenAI logit_bias: {token_id: additive bias}; applied to the logits
    # before sampling AND before the reported logprobs/top-N (the sampled
    # distribution). At most _NBIAS (16) entries per request.
    logit_bias: Optional[dict] = None
    # control
    cancelled: bool = False   # set by the owner (e.g. server stream close /
                              # stop-string hit); freed at the next tick edge
    # outputs
    generated: list[int] = dataclasses.field(default_factory=list)
    # natural log-prob of each generated token under the model's FULL
    # (temperature-independent) distribution — OpenAI `logprobs` semantics
    logprobs: list[float] = dataclasses.field(default_factory=list)
    # per-token top-N alternatives [(token_id, logprob), ...] when the
    # scheduler was built with top_logprobs=N (OpenAI top_logprobs)
    top_logprobs: list[list] = dataclasses.field(default_factory=list)
    done: bool = False
    error: Optional[str] = None   # set when the request failed (isolation)
    on_token: Optional[Callable[[int], None]] = None
    # paged-preemption resume point: (prefix_tokens, last_token) — the lane
    # re-hydrates prefix_tokens WITHOUT re-emitting, then resumes decoding
    # from last_token (scheduler._preempt / _advance_admission)
    _resume: Optional[tuple[list[int], int]] = None

    def _emit(self, tok: int, lp: float | None = None, top=None) -> None:
        self.generated.append(tok)
        self.logprobs.append(float(lp) if lp is not None else float("nan"))
        self.top_logprobs.append(top if top is not None else [])
        if self.on_token:
            self.on_token(tok)


@dataclasses.dataclass(eq=False)  # identity semantics: slots.index() must match by object
class _Slot:
    request: Optional[Request] = None
    pos: int = 0            # next absolute position for this sequence
    last_token: int = 0     # token to feed next tick
    admitting: bool = False  # prompt still hydrating (chunked, interleaved)
    admit_i: int = 0        # prompt tokens consumed so far
    admit_tokens: list[int] = dataclasses.field(default_factory=list)
    resuming: bool = False  # admission is a preemption-resume re-hydration
    seq: int = 0            # admission order (paged preemption picks newest)
    spec_ok: bool = False   # draft cache hydrated & in sync (spec mode)
    hist: object = None     # NgramHistory (prompt-lookup spec mode)
    med_props: object = None  # next-round head proposals (medusa spec mode;
                              # None until the first verify sweep returns
                              # this lane's hidden row)

    @property
    def free(self) -> bool:
        return self.request is None

    @property
    def decoding(self) -> bool:
        return self.request is not None and not self.admitting


class Scheduler:
    def __init__(
        self,
        cfg: ModelConfig,
        weights: Weights | FastWeights,
        *,
        batch: int = 8,
        kv_dtype=jnp.float16,
        compute_dtype=jnp.float32,
        fast: bool | str = "auto",
        mesh=None,
        paged_pages: int = 0,
        page_size: int = 256,
        spec_draft=None,
        spec_k: int = 4,
        spec_lookup: bool = False,
        spec_ngram: int = 3,
        spec_medusa=None,
        spec_tree=None,
        batched_admission: bool = False,
        prefix_cache: bool = False,
        top_logprobs: int = 0,
    ):
        """mesh: an optional ('dp','ep','tp') jax.sharding.Mesh. Slot lanes
        shard over `dp`, heads/hidden/cache-kv-heads over `tp`, MoE experts
        over `ep` — continuous batching COMPOSED with the mesh (SURVEY §2.6
        north star; the reference is a single-device single stream,
        src/main.cpp:102-112). Requires the fast path; `weights` may be the
        oracle Weights (rearranged shard-major here) or a FastWeights
        already in shard-major order (load_fast_weights(tp=...)).

        paged_pages > 0 switches the cache to a PAGED pool of that many
        pages (models/paged.py): lanes map logical KV blocks through
        per-lane page tables, so cache HBM scales with tokens in flight
        instead of batch x window. Pages are allocated LAZILY — one at
        admission, then chunk-by-chunk / at block boundaries as positions
        grow; on pool exhaustion the newest lane is preempted (requeued
        with an exact resume point) and new requests wait in the queue.
        Fast path only; MoE models compose (round-5: the paged tick/prefill
        run the all-expert batched FFN — page tables are per-lane KV
        structures, orthogonal to expert routing).

        spec_draft=(draft_cfg, draft_weights) turns on SCHEDULER-LEVEL
        speculative decoding: every round, a small draft model proposes
        spec_k greedy tokens PER LANE (spec_k+1 cheap batched draft ticks)
        and ONE batched target sweep verifies every lane's chunk at once
        (models/fast.verify_chunk_fast_batched) — up to spec_k+1 tokens per
        target weight-sweep per lane. Temperature-0 streams are
        bit-identical to plain greedy decode; temperature>0 requests verify
        with EXACT rejection sampling on device (_verify_pack: point-mass
        proposals accept w.p. p_T(x), rejections sample the residual), so
        the emitted distribution equals plain target sampling — including
        per-request top_k/top_p, applied to the target distribution inside
        the verify pack. Fast path; MoE targets compose on a single device
        (round-5: the verify sweep routes each chunk row through the
        all-expert batched FFN). COMPOSES with the paged pool: the verify chunk
        scatters rows through the page tables
        (models/fast.verify_chunk_fast_batched_paged) and preempted lanes
        re-hydrate their proposal source on resume. Lanes near the window
        edge (or with beyond-window prompts) fall back to plain ticks —
        the ring regime cannot roll back a rejection.

        spec_lookup=True is DRAFT-MODEL-FREE speculation (prompt lookup,
        spec.NgramHistory): each lane proposes the continuation of its
        history's trailing n-gram (size <= spec_ngram) and the same ONE
        batched target sweep verifies every proposing lane. Lanes with no
        n-gram match this round join the plain tick and stay eligible —
        worst case degrades to plain continuous batching plus a dict
        lookup. Same sampling envelope as spec_draft (any temperature
        and top_k/top_p; mutually exclusive with it), but COMPOSES fully:
        with the paged pool, with the
        dp x tp mesh (proposals are host-side, so only the verify sweep
        shards — parallel/fast_tp.make_verify_chunk_fast_tp), and with
        BOTH at once (make_verify_chunk_paged_fast_tp: the sweep scatters
        through each dp group's page tables)."""
        self.cfg = cfg
        self.mesh = mesh
        self.paged = paged_pages > 0
        self.page_size = page_size
        self.spec_lookup = bool(spec_lookup)
        self.spec_ngram = int(spec_ngram)
        self.spec_medusa = spec_medusa
        if sum([spec_lookup, spec_draft is not None,
                spec_medusa is not None]) > 1:
            raise ValueError("spec_lookup, spec_draft, and spec_medusa are "
                             "mutually exclusive proposal sources")
        self.spec = (spec_draft is not None or self.spec_lookup
                     or spec_medusa is not None)
        self.spec_k = int(spec_k)
        if spec_medusa is not None:
            # one proposal per head per round; clamp K to the head count
            self.spec_k = min(self.spec_k, int(spec_medusa.w1.shape[0]))
        self.topn = int(top_logprobs)
        if self.spec and mesh is not None:
            # all three proposal sources compose with the mesh: lookup
            # proposals are host-side, medusa reads the hidden rows the
            # sharded verify sweep now exposes (with_hidden), and a draft
            # model shards over the SAME mesh (its own fast-TP tick)
            if cfg.is_moe or mesh.shape.get("ep", 1) != 1:
                raise ValueError("spec x mesh needs ep=1 and a dense model "
                                 "(the sharded verify sweep has no expert "
                                 "axis); single-device spec x MoE works")
        if self.paged:
            if mesh is not None and (cfg.is_moe
                                     or mesh.shape.get("ep", 1) != 1):
                raise ValueError("paged cache + mesh needs ep=1 and a dense "
                                 "model; single-device paged x MoE works")
            if cfg.max_seq_len % page_size:
                raise ValueError("page_size must divide max_seq_len")
            if fast == "auto" and mesh is None:
                fast = fast_batched_supported(cfg) and batch % 8 == 0
            if mesh is None and not fast:
                raise ValueError("paged cache requires the fast path")
        if mesh is not None:
            from .parallel.fast_tp import fast_tp_supported
            tp = mesh.shape["tp"]
            ep = mesh.shape.get("ep", 1)
            dp = mesh.shape.get("dp", 1)
            ok = fast_tp_supported(cfg, tp, ep) and batch % max(dp, 1) == 0
            if fast == "auto":
                fast = ok
            if not (fast and ok):
                raise ValueError(
                    f"mesh scheduler requires the fast TP path and batch % dp == 0 "
                    f"(got batch={batch}, mesh={dict(mesh.shape)})")
        elif fast == "auto":
            # batched Pallas kernels need sublane-aligned batch
            fast = fast_batched_supported(cfg) and batch % 8 == 0
        if fast and mesh is None and (not fast_batched_supported(cfg) or batch % 8 != 0):
            raise ValueError("fast scheduler needs a supported config and batch % 8 == 0")
        self.fast = bool(fast)
        if self.fast:
            from .models.weights import upcast_f16_for_tpu
            weights = upcast_f16_for_tpu(weights)  # Mosaic has no f16
            if kv_dtype == jnp.float16:
                kv_dtype = jnp.bfloat16
            if jnp.dtype(kv_dtype).itemsize == 1 \
                    and jax.default_backend() == "tpu":
                from .models.fast import quant_kv_supported
                if not quant_kv_supported(cfg):
                    raise ValueError(
                        "fp8 KV cache on TPU needs n_kv_heads % 4 == 0 "
                        f"(got {cfg.n_kv_heads}); use bf16")
        if self.fast and mesh is None and isinstance(weights, Weights):
            weights = FastWeights.from_weights(weights, cfg)
        if mesh is not None and self.paged:
            # pool pages shard over dp (one allocator per group, LOCAL page
            # ids), kv-heads over tp — paged occupancy composed with the
            # mesh (VERDICT r2 composition gap)
            from .models.paged import GroupedPageAllocator, PagedKVPool
            from .parallel.fast_tp import shard_fast_tp_weights, shard_paged_pool
            dp = mesh.shape.get("dp", 1)
            weights = shard_fast_tp_weights(weights, cfg, mesh)
            self.cache = shard_paged_pool(
                PagedKVPool.init(cfg, kv_dtype, paged_pages, page_size), mesh)
            self.alloc = GroupedPageAllocator(cfg, paged_pages, batch,
                                              page_size, groups=dp)
        elif mesh is not None:
            from .parallel.fast_tp import shard_fast_tp_weights
            from .parallel.sharding import shard_cache
            weights = shard_fast_tp_weights(weights, cfg, mesh)
            self.cache = shard_cache(KVCache.init(cfg, kv_dtype, batch=batch),
                                     cfg, mesh, batched=True)
        elif self.paged:
            from .models.paged import PageAllocator, PagedKVPool
            self.cache = PagedKVPool.init(cfg, kv_dtype, paged_pages,
                                          page_size)
            self.alloc = PageAllocator(cfg, paged_pages, batch, page_size)
        else:
            self.cache = KVCache.init(cfg, kv_dtype, batch=batch)
        self.weights = weights
        self.B = batch
        self.kv_dtype = kv_dtype
        self.slots = [_Slot() for _ in range(batch)]
        self.queue: list[Request] = []
        self._key = jax.random.PRNGKey(0)
        cd = compute_dtype

        if self.paged and mesh is not None:
            from .parallel.fast_tp import (make_prefill_paged_fast_tp,
                                           make_tick_paged_fast_tp)
            ws = getattr(weights, "scales", None) is not None
            _ptick = make_tick_paged_fast_tp(cfg, mesh, page_size,
                                             with_scales=ws)
            _pprefill = make_prefill_paged_fast_tp(cfg, mesh, page_size,
                                                   with_scales=ws)

            @partial(jax.jit, donate_argnums=(3,))
            def _tick_paged(w, tokens, positions, pool, seeds, temps,
                            write_mask, topks, topps, bias_ids, bias_vals,
                            tables):
                logits, pool = _ptick(w, tokens, positions, pool, tables,
                                      write_mask)
                packed = _sample_pack(logits, seeds, positions, temps,
                                      topks, topps, bias_ids, bias_vals,
                                      self.topn)
                return packed, logits, pool

            @partial(jax.jit, static_argnames=("logits_mode",),
                     donate_argnums=(4,))
            def _prefill_paged_mesh(w, tokens, pos0, valid_len, pool,
                                    table_b, page, row0, group, logits_mode):
                return _pprefill(w, tokens, pos0, valid_len, pool, table_b,
                                 page, row0, group, logits_mode=logits_mode)

            self._tick_paged = _tick_paged
            self._prefill_paged_mesh = _prefill_paged_mesh
        elif self.paged:
            from .models.fast import (decode_step_fast_batched_paged,
                                      prefill_fast_paged)
            ps = page_size

            @partial(jax.jit, donate_argnums=(3,))
            def _tick_paged(w, tokens, positions, pool, seeds, temps,
                            write_mask, topks, topps, bias_ids, bias_vals,
                            tables):
                logits, pool = decode_step_fast_batched_paged(
                    cfg, w, tokens, positions, pool, tables, write_mask,
                    page_size=ps)
                packed = _sample_pack(logits, seeds, positions, temps,
                                      topks, topps, bias_ids, bias_vals,
                                      self.topn)
                # logits returned too: ring-regime admission samples the
                # first token OUTSIDE the tick with the same key math as the
                # dense path (_finish_admission folds at the post-increment
                # position)
                return packed, logits, pool

            @partial(jax.jit, static_argnames=("logits_mode",),
                     donate_argnums=(4,))
            def _prefill_paged(w, tokens, pos0, valid_len, pool, table_b,
                               page, row0, logits_mode):
                return prefill_fast_paged(
                    cfg, w, tokens, pos0, valid_len, pool, table_b, page,
                    row0, logits_mode=logits_mode, page_size=ps)

            self._tick_paged = _tick_paged
            self._prefill_paged = _prefill_paged

        if self.fast and mesh is not None:
            from .parallel.fast_tp import (make_decode_step_fast_tp,
                                           make_prefill_fast_tp,
                                           make_tick_fast_tp)
            ws = getattr(weights, "scales", None) is not None
            _tick_tp = make_tick_fast_tp(cfg, mesh, with_scales=ws)
            _prefill_tp = make_prefill_fast_tp(cfg, mesh, with_scales=ws)
            _step_tp = make_decode_step_fast_tp(cfg, mesh, with_scales=ws)
            _hydrate_tp = make_decode_step_fast_tp(cfg, mesh,
                                                   output_logits=False,
                                                   with_scales=ws)

            def _batched_logits(w, tokens, positions, cache, write_mask):
                return _tick_tp(w, tokens, positions, cache, write_mask)

            def _prefill_impl(w, tokens, pos0, valid_len, lane, logits_mode):
                return _prefill_tp(w, tokens, pos0, valid_len, lane,
                                   logits_mode=logits_mode)

            def _lane_step(w, token, pos, lane, output_logits):
                if output_logits:
                    return _step_tp(w, token, pos, lane)
                _, lane = _hydrate_tp(w, token, pos, lane)
                return None, lane
        elif self.fast:
            from .models.fast import decode_step_fast

            def _batched_logits(w, tokens, positions, cache, write_mask):
                """Batched Pallas tick: each weight tile streams HBM once and
                serves every lane; write_mask=0 lanes attend read-only (their
                cache is owned by in-flight chunked admission)."""
                return decode_step_fast_batched(cfg, w, tokens, positions,
                                                cache, write_mask)

            def _prefill_impl(w, tokens, pos0, valid_len, lane, logits_mode,
                              attend_len=0):
                return prefill_fast(cfg, w, tokens, pos0, valid_len, lane,
                                    logits_mode=logits_mode,
                                    attend_len=attend_len)

            def _lane_step(w, token, pos, lane, output_logits):
                return decode_step_fast(cfg, w, token, pos, lane,
                                        output_logits=output_logits)
        else:
            def _batched_logits(w, tokens, positions, cache, write_mask):
                def one(tok, pos, c, wr):
                    logits, c2 = decode_step(cfg, w, tok, pos, c,
                                             output_logits=True, compute_dtype=cd)
                    keep = wr != 0
                    c2 = KVCache(k=jnp.where(keep, c2.k, c.k),
                                 v=jnp.where(keep, c2.v, c.v))
                    return logits, c2
                return jax.vmap(one, in_axes=(0, 0, 0, 0))(
                    tokens, positions, cache, write_mask)

            def _prefill_impl(w, tokens, pos0, valid_len, lane, logits_mode):
                return prefill(cfg, w, tokens, pos0, valid_len, lane,
                               logits_mode=logits_mode, compute_dtype=cd)

            def _lane_step(w, token, pos, lane, output_logits):
                return decode_step(cfg, w, token, pos, lane,
                                   output_logits=output_logits, compute_dtype=cd)

        @partial(jax.jit, donate_argnums=(3,))
        def _tick(w, tokens, positions, cache, seeds, temps, write_mask,
                  topks, topps, bias_ids, bias_vals):
            """One batched decode+sample tick over all B slots.

            Sampling keys derive from (request seed, absolute position), so
            a request's output is reproducible regardless of what other
            traffic shares the batch. write_mask=0 lanes (free, or still
            admitting their prompt) compute read-only garbage that the host
            discards. Per-lane top_k/top_p ride as DATA (sample_ext), so
            mixed sampling settings share one compiled tick."""
            logits, cache = _batched_logits(w, tokens, positions, cache,
                                            write_mask)
            packed = _sample_pack(logits, seeds, positions, temps,
                                  topks, topps, bias_ids, bias_vals,
                                  self.topn)
            return packed, cache

        if batched_admission and self.fast and mesh is None:
            # OPT-IN: all admitting lanes' chunks hydrate in ONE weight
            # sweep — with A concurrent admissions, time-to-first-token
            # improves ~A x under load. The trade: a lane's chunk pads to
            # the GROUP's bucket, so its prefill numerics depend (at the
            # bf16-rounding level) on co-admitted traffic — the default
            # per-slot path keeps streams bit-identical to a solo run.
            # The server turns this on (serving optimizes TTFT).
            if self.paged:
                # the paged sweep scatters each lane's chunk rows through
                # its page table (chunks may straddle page boundaries here)
                from .models.fast import prefill_chunk_fast_batched_paged
                ps = page_size

                @partial(jax.jit, donate_argnums=(5,))
                def _admit_batch(w, tokens, pos0, valid_len, enable, pool,
                                 tables):
                    return prefill_chunk_fast_batched_paged(
                        cfg, w, tokens, pos0, valid_len, enable, pool,
                        tables, page_size=ps, logits_mode="lastv")
            else:
                from .models.fast import prefill_chunk_fast_batched

                @partial(jax.jit, static_argnames=("attend_len",),
                         donate_argnums=(5,))
                def _admit_batch(w, tokens, pos0, valid_len, enable, cache,
                                 attend_len):
                    """ONE weight sweep hydrates every admitting lane's
                    chunk (batched admission — A concurrent admissions
                    cost ~one)."""
                    return prefill_chunk_fast_batched(
                        cfg, w, tokens, pos0, valid_len, enable, cache,
                        attend_len=attend_len, logits_mode="lastv")

            self._admit_batch = _admit_batch
        else:
            self._admit_batch = None
        self.admit_sweeps = 0  # batched-admission weight sweeps (stats)

        if prefix_cache and not self.paged and self.fast and mesh is None:
            # DENSE prompt reuse (the paged pool gets it automatically via
            # shared pages). OPT-IN like batched admission: the copied
            # prefix rows carry the SOURCE request's chunk-schedule bf16
            # rounding, so streams can drift from a bit-identical solo run.
            # The server turns this on.
            self.dense_prefix = _DensePrefixRegistry()

            @partial(jax.jit, donate_argnums=(0,))
            def _copy_lane(cache, src, dst):
                """Lane-to-lane full-cache copy: one in-place HBM pass —
                rows past the matched prefix are src garbage that causal
                masking never exposes and admission overwrites."""
                return KVCache(k=cache.k.at[dst].set(cache.k[src]),
                               v=cache.v.at[dst].set(cache.v[src]))

            self._copy_lane = _copy_lane
        else:
            self.dense_prefix = None

        @partial(jax.jit, static_argnames=("logits_mode", "attend_len"),
                 donate_argnums=(5,))
        def _prefill_slot(w, tokens, pos0, valid_len, slot, cache, logits_mode,
                          attend_len=0):
            """Chunk-prefill one slot's cache lane in place."""
            lane = KVCache(k=cache.k[slot], v=cache.v[slot])
            if self.fast and mesh is None:
                out, lane = _prefill_impl(w, tokens, pos0, valid_len, lane,
                                          logits_mode, attend_len)
            else:
                out, lane = _prefill_impl(w, tokens, pos0, valid_len, lane,
                                          logits_mode)
            cache = KVCache(k=cache.k.at[slot].set(lane.k),
                            v=cache.v.at[slot].set(lane.v))
            return out, cache

        @partial(jax.jit, static_argnames=("output_logits",), donate_argnums=(4,))
        def _hydrate_slot(w, token, pos, slot, cache, output_logits):
            """Ring-regime per-token hydration of one slot's lane (prompts
            longer than the context window, like the engine's per-token
            fallback, engine.prefill_tokens)."""
            lane = KVCache(k=cache.k[slot], v=cache.v[slot])
            logits, lane = _lane_step(w, token, pos, lane, output_logits)
            cache = KVCache(k=cache.k.at[slot].set(lane.k),
                            v=cache.v.at[slot].set(lane.v))
            return logits, cache

        self._tick = _tick
        self._prefill_slot = _prefill_slot
        self._hydrate_slot = _hydrate_slot

        if self.spec:
            if not self.fast:
                raise ValueError("speculative scheduler needs the fast path")
            # NOTE: decode_step_fast_batched comes from the MODULE import —
            # re-importing it here would make the name function-local and
            # break the non-spec closures above
            from .models.fast import verify_chunk_fast_batched

            if mesh is not None and self.paged:
                # the full triple: speculation x paged pool x mesh — one
                # sharded target sweep scattering through each dp group's
                # page tables
                from .parallel.fast_tp import make_verify_chunk_paged_fast_tp
                ws = getattr(weights, "scales", None) is not None
                _vcp_tp = make_verify_chunk_paged_fast_tp(
                    cfg, mesh, page_size, with_scales=ws,
                    with_hidden=spec_medusa is not None)

                @partial(jax.jit, donate_argnums=(4,))
                def _verify(w, tokens, pos0, enable, pool, tables):
                    return _vcp_tp(w, tokens, pos0, enable, pool, tables)
            elif mesh is not None:
                # speculation COMPOSED with the mesh: one sharded target
                # sweep (lanes on dp, heads/hidden on tp) verifies every
                # lane's proposals (lookup, draft, or medusa — the sweep
                # exposes the hidden rows medusa's heads read)
                from .parallel.fast_tp import make_verify_chunk_fast_tp
                ws = getattr(weights, "scales", None) is not None
                _vc_tp = make_verify_chunk_fast_tp(
                    cfg, mesh, with_scales=ws,
                    with_hidden=spec_medusa is not None)

                @partial(jax.jit, donate_argnums=(4,))
                def _verify(w, tokens, pos0, enable, cache):
                    return _vc_tp(w, tokens, pos0, enable, cache)
            elif self.paged:
                # speculation COMPOSED with the paged pool: the verify
                # chunk scatters rows through the page tables (medusa
                # additionally pulls the hidden rows its heads read)
                from .models.fast import verify_chunk_fast_batched_paged
                ps = page_size
                wh = spec_medusa is not None

                @partial(jax.jit, donate_argnums=(4,))
                def _verify(w, tokens, pos0, enable, pool, tables):
                    return verify_chunk_fast_batched_paged(
                        cfg, w, tokens, pos0, enable, pool, tables,
                        page_size=ps, with_hidden=wh)
            else:
                wh = spec_medusa is not None

                @partial(jax.jit, donate_argnums=(4,))
                def _verify(w, tokens, pos0, enable, cache):
                    return verify_chunk_fast_batched(cfg, w, tokens, pos0,
                                                     enable, cache,
                                                     with_hidden=wh)

            self._verify = _verify
            self.spec_stats = {"rounds": 0, "accepted": 0, "proposed": 0}

        self.spec_tree = None
        if spec_tree is not None:
            # TREE-attention Medusa (round-5): per-depth top-k head
            # candidates form a static cartesian tree; ONE sweep verifies
            # every root-to-leaf chain (verify_tree_fast_batched) instead
            # of a single linear chain, so one target weight-sweep can
            # advance even when the head's argmax misses but a lower-rank
            # candidate hits. Greedy lanes only (T>0 joins the plain tick);
            # dense single-device cache (the accepted path scatters into
            # the ring after the walk).
            if spec_medusa is None:
                raise ValueError("spec_tree requires spec_medusa heads")
            if self.paged or mesh is not None:
                raise ValueError("tree verify: dense single-device cache "
                                 "(chain medusa composes with paged/mesh)")
            from .models.fast import (cartesian_tree, tree_depths,
                                      scatter_tree_rows,
                                      verify_tree_fast_batched)
            self.spec_tree = tuple(int(k) for k in spec_tree)
            H = int(spec_medusa.w1.shape[0])
            if len(self.spec_tree) > H:
                raise ValueError(f"tree depth {len(self.spec_tree)} > "
                                 f"{H} medusa heads")
            if any(k < 1 for k in self.spec_tree):
                raise ValueError("tree branching factors must be >= 1")
            parents = cartesian_tree(self.spec_tree)
            depths = tree_depths(parents)
            self._tree_parents = parents
            self._tree_depths = depths
            self._tree_kmax = max(self.spec_tree)
            self._tree_H = len(self.spec_tree)
            children = {i: [] for i in range(len(parents))}
            branch = [0] * len(parents)
            for i, p in enumerate(parents):
                if p >= 0:
                    branch[i] = len(children[p])
                    children[p].append(i)
            self._tree_children = children
            self._tree_branch = branch

            @jax.jit
            def _verify_tree(w, tokens, pos0, enable, cache):
                return verify_tree_fast_batched(
                    cfg, w, tokens, pos0, enable, cache, parents=parents,
                    with_hidden=True)

            @partial(jax.jit, static_argnames=("n_rows",), donate_argnums=(0,))
            def _scatter_tree(cache, ktree, vtree, pos0, rows, n, n_rows):
                return scatter_tree_rows(cache, ktree, vtree, pos0, rows,
                                         n, n_rows=n_rows)

            self._verify_tree = _verify_tree
            self._scatter_tree = _scatter_tree

        if self.spec_lookup or spec_medusa is not None:
            self.spec_edge = cfg.max_seq_len
        elif self.spec:
            dcfg, dweights = spec_draft
            if dcfg.vocab_size != cfg.vocab_size:
                raise ValueError("draft and target must share a vocabulary")
            from .models.weights import upcast_f16_for_tpu
            dweights = upcast_f16_for_tpu(dweights)
            K = self.spec_k
            if mesh is not None:
                # draft x mesh: the draft model shards over the SAME mesh
                # (lanes on dp, heads/hidden on tp) — its K+1 greedy ticks
                # are the fast-TP batched tick, its per-lane prefill the
                # fast-TP lane prefill (round-5 closure of the r4 gap)
                from .parallel.fast_tp import (fast_tp_supported,
                                               make_prefill_fast_tp,
                                               make_tick_fast_tp,
                                               shard_fast_tp_weights)
                from .parallel.sharding import shard_cache
                tp = mesh.shape["tp"]
                if not fast_tp_supported(dcfg, tp, 1):
                    raise ValueError(
                        f"draft x mesh: draft shapes must shard over tp={tp}")
                dweights = shard_fast_tp_weights(dweights, dcfg, mesh)
                self.draft_cache = shard_cache(
                    KVCache.init(dcfg, kv_dtype, batch=batch), dcfg, mesh,
                    batched=True)
                dws = getattr(dweights, "scales", None) is not None
                _dtick_tp = make_tick_fast_tp(dcfg, mesh, with_scales=dws)
                _dprefill_tp = make_prefill_fast_tp(dcfg, mesh,
                                                    with_scales=dws)

                @partial(jax.jit, donate_argnums=(3,))
                def _draft_propose(dw, tokens, positions, dcache, write):
                    B = tokens.shape[0]
                    out = jnp.zeros((B, K + 1), jnp.int32)
                    toks = tokens
                    # static unroll: shard_map tick under fori_loop is
                    # avoidable complexity at K+1 ~ 5 steps
                    for i in range(K + 1):
                        logits, dcache = _dtick_tp(dw, toks,
                                                   positions + i, dcache,
                                                   write)
                        toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                        out = out.at[:, i].set(toks)
                    return out, dcache

                @partial(jax.jit, donate_argnums=(5,))
                def _draft_prefill_slot(dw, tokens, pos0, valid_len, slot,
                                        dcache):
                    lane = KVCache(k=dcache.k[slot], v=dcache.v[slot])
                    _, lane = _dprefill_tp(dw, tokens, pos0, valid_len,
                                           lane, logits_mode="none")
                    return KVCache(k=dcache.k.at[slot].set(lane.k),
                                   v=dcache.v.at[slot].set(lane.v))
            else:
                if isinstance(dweights, Weights):
                    dweights = FastWeights.from_weights(dweights, dcfg)
                self.draft_cache = KVCache.init(dcfg, kv_dtype, batch=batch)

                @partial(jax.jit, donate_argnums=(3,))
                def _draft_propose(dw, tokens, positions, dcache, write):
                    """K+1 greedy draft ticks; the extra step hydrates the
                    draft's row for d[K-1] (full-acceptance rewind keeps it
                    visible — mirrors Engine.generate_speculative)."""
                    B = tokens.shape[0]
                    out = jnp.zeros((B, K + 1), jnp.int32)

                    def body(i, carry):
                        toks, dc, out = carry
                        logits, dc = decode_step_fast_batched(
                            dcfg, dw, toks, positions + i, dc, write)
                        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                        return nxt, dc, out.at[:, i].set(nxt)

                    _, dcache, out = jax.lax.fori_loop(
                        0, K + 1, body, (tokens, dcache, out))
                    return out, dcache

                @partial(jax.jit, donate_argnums=(5,))
                def _draft_prefill_slot(dw, tokens, pos0, valid_len, slot,
                                        dcache):
                    lane = KVCache(k=dcache.k[slot], v=dcache.v[slot])
                    _, lane = prefill_fast(dcfg, dw, tokens, pos0, valid_len,
                                           lane, logits_mode="none")
                    return KVCache(k=dcache.k.at[slot].set(lane.k),
                                   v=dcache.v.at[slot].set(lane.v))

            self.draft_cfg, self.draft_weights = dcfg, dweights
            self.spec_edge = min(cfg.max_seq_len, dcfg.max_seq_len)
            self._draft_propose = _draft_propose
            self._draft_prefill_slot = _draft_prefill_slot

    # ------------------------------------------------------------------
    def submit(self, request: Request) -> Request:
        if not request.prompt_tokens:
            raise ValueError("prompt_tokens must be non-empty (include BOS)")
        if request.logit_bias:
            if len(request.logit_bias) > _NBIAS:
                raise ValueError(f"logit_bias supports at most {_NBIAS} "
                                 f"entries (got {len(request.logit_bias)})")
            if self.spec:
                raise ValueError("logit_bias is not supported in "
                                 "speculative scheduler modes yet")
        # top_k/top_p compose with speculation: _verify_pack applies the
        # per-request envelope to the target distribution BEFORE the
        # accept/residual math, so the emitted stream equals plain
        # envelope sampling (round-5 closure of the r4 VERDICT gap)
        self.queue.append(request)
        return request

    @property
    def n_active(self) -> int:
        return sum(not s.free for s in self.slots)

    @property
    def prefix_stats(self) -> Optional[dict]:
        """Prompt-reuse counters, whichever backend provides them: the
        paged pool's shared-page cache or the dense lane-copy registry."""
        if self.paged:
            return self.alloc.prefix_stats
        if self.dense_prefix is not None:
            return self.dense_prefix.stats
        return None

    # how many ring-regime prompt tokens hydrate per tick for ONE admitting
    # slot (each is a full per-token decode step, so this bounds the stall
    # a beyond-window prompt can impose between decode ticks)
    RING_HYDRATE_PER_TICK = 16

    def _admit(self) -> None:
        """Assign queued requests to free slots; their prompts hydrate in
        bounded chunks INTERLEAVED with decode ticks (_advance_admission),
        so active lanes keep generating while long prompts admit.

        Paged mode allocates LAZILY: admission maps only the first page;
        later pages are mapped chunk-by-chunk during admission and at block
        boundaries during decode (models/paged.py occupancy contract). When
        the pool is exhausted, new requests wait in the queue, and an
        in-flight lane that must grow preempts the NEWEST lane (requeued at
        the front with a resume point) — see _ensure_pages."""
        for b, slot in enumerate(self.slots):
            if not self.queue or not slot.free:
                continue
            req = self.queue[0]
            if self.paged:
                # a request whose worst case exceeds the whole pool can
                # never finish — even alone, growth would preempt itself
                # forever. Fail it now instead of livelocking later.
                worst = self.alloc.pages_for(min(
                    self.cfg.max_seq_len,
                    len(req.prompt_tokens) + req.max_new_tokens + 1))
                if worst > self.alloc.lane_capacity:
                    self.queue.pop(0)
                    req.error = (f"request needs {worst} pages; a lane's "
                                 f"pool holds {self.alloc.lane_capacity}")
                    req.done = True
                    continue
                first = min(self.cfg.max_seq_len, self.page_size)
                # never preempt to ADMIT (that could livelock admission);
                # new requests simply wait for released pages. Other slots
                # may draw from a different dp group's pool — keep scanning.
                # (The actual grow happens below, AFTER the prefix-cache
                # match: matched blocks map shared pages without drawing
                # from the free list, so one free page always suffices.)
                if not self.alloc.can_grow(b, first):
                    continue
            self.queue.pop(0)
            slot.request = req
            slot.admitting = True
            slot.pos = 0
            slot.admit_i = 0
            slot.spec_ok = False  # set by _spec_hydrate when the prompt lands
            slot.hist = None
            slot.seq = self._admit_seq = getattr(self, "_admit_seq", 0) + 1
            if req._resume is not None:
                slot.admit_tokens, slot.last_token = req._resume
                slot.resuming = True
            else:
                slot.admit_tokens = req.prompt_tokens
                slot.resuming = False
            if self.paged:
                matched = 0
                if not slot.resuming and self._prefix_cacheable(slot):
                    # automatic prefix caching: a cached full-page prefix
                    # of the prompt maps read-only shared pages and skips
                    # their prefill entirely (always leaving >= 1 token so
                    # the final chunk produces first-token logits)
                    matched = self.alloc.match_prefix(b, slot.admit_tokens)
                    if matched:
                        slot.pos = matched
                        slot.admit_i = matched
                # map the page the first prefill chunk writes into. The
                # earlier can_grow check may have counted evictable cached
                # pages that the match itself just re-referenced — re-check
                # and UN-ADMIT cleanly instead of raising mid-admission.
                if not self.alloc.can_grow(
                        b, min(self.cfg.max_seq_len, matched + 1)):
                    self.alloc.release(b)   # drops the matched refs
                    slot.request = None
                    slot.admitting = False
                    self.queue.insert(0, req)
                    continue
                self.alloc.grow(b, min(self.cfg.max_seq_len, matched + 1))
            elif self.dense_prefix is not None:
                if not slot.resuming and self._prefix_cacheable(slot):
                    # dense prefix reuse: copy the best-matching lane's
                    # cache and skip prefilling the common prefix (always
                    # leaving >= 1 token for the first-token logits)
                    limit = min(len(slot.admit_tokens) - 1,
                                self.cfg.max_seq_len - 1)
                    src, matched = self.dense_prefix.match(
                        slot.admit_tokens, limit)
                    if matched:
                        if src != b:
                            self.cache = self._copy_lane(
                                self.cache, jnp.int32(src), jnp.int32(b))
                        slot.pos = matched
                        slot.admit_i = matched
                        self.dense_prefix.stats["hits"] += 1
                        self.dense_prefix.stats["hit_tokens"] += matched
                # either way this lane's rows are about to be overwritten
                self.dense_prefix.invalidate_lane(b)

    def _prefix_cacheable(self, slot: _Slot) -> bool:
        """Prefix pages are shared READ-ONLY, so only lanes that can never
        enter the ring regime (which rewrites early pages in place) may map
        or publish them."""
        req = slot.request
        return (req is not None
                and len(slot.admit_tokens) + req.max_new_tokens + 1
                <= self.cfg.max_seq_len)

    # -- paged lazy growth / preemption --------------------------------
    def _preempt(self, b: int) -> None:
        """Release lane b's pages and requeue its request at the FRONT with
        a resume point, so its stream continues without re-emitting: the
        lane re-hydrates prompt+generated[:-1] silently and then resumes
        decoding from generated[-1]. Sampling keys derive from (seed,
        position), so the resumed stream is identical to the uninterrupted
        one."""
        slot = self.slots[b]
        req = slot.request
        if not slot.admitting and req.generated:
            req._resume = (list(req.prompt_tokens) + req.generated[:-1],
                           req.generated[-1])
        # admitting lanes restart their (possibly resumed) hydration; no
        # tokens were emitted by the partial pass, so a plain retry is safe
        self.alloc.release(b)
        slot.request = None
        slot.admitting = False
        slot.spec_ok = False
        slot.hist = None
        self.queue.insert(0, req)

    def _ensure_pages(self, b: int, target_len: int) -> bool:
        """Grow lane b's table to hold target_len tokens, preempting the
        newest busy lane(s) while the pool is exhausted. Returns False if
        lane b itself was the newest and got preempted (callers skip it)."""
        while not self.alloc.can_grow(b, target_len):
            victim, vseq = None, -1
            for i, s in enumerate(self.slots):
                # only lanes sharing b's pool (same dp group) free pages
                # that can satisfy b's growth
                if s.request is not None and s.seq > vseq \
                        and self.alloc.same_pool(b, i):
                    victim, vseq = i, s.seq
            if victim is None:
                raise RuntimeError("page pool exhausted with no lane to preempt")
            self._preempt(victim)
            if victim == b:
                return False
        self.alloc.grow(b, target_len)
        return True

    @staticmethod
    def _bias_row(req) -> tuple[np.ndarray, np.ndarray]:
        ids = np.full((_NBIAS,), -1, np.int32)
        vals = np.zeros((_NBIAS,), np.float32)
        if req is not None and req.logit_bias:
            for j, (t, v) in enumerate(list(req.logit_bias.items())[:_NBIAS]):
                ids[j] = int(t)
                vals[j] = float(v)
        return ids, vals

    def _bias_arrays(self, active) -> tuple[jax.Array, jax.Array]:
        """(B, _NBIAS) logit-bias ids/values for the tick; inactive lanes
        get empty rows. Two tiny uploads per tick (same class as the
        temps/seeds rows)."""
        ids = np.full((self.B, _NBIAS), -1, np.int32)
        vals = np.zeros((self.B, _NBIAS), np.float32)
        for b, s in enumerate(self.slots):
            if active(b, s) and s.request is not None and s.request.logit_bias:
                ids[b], vals[b] = self._bias_row(s.request)
        return jnp.asarray(ids), jnp.asarray(vals)

    def _finish_admission(self, slot: _Slot, logits) -> None:
        """Sample the first generated token (seeded per request)."""
        req = slot.request
        bi, bv = self._bias_row(req)
        packed = np.asarray(_sample1_pack(
            logits, jnp.int32(req.seed), jnp.int32(slot.pos),
            jnp.float32(req.temperature), jnp.int32(req.top_k),
            jnp.float32(req.top_p), jnp.asarray(bi), jnp.asarray(bv),
            topn=self.topn))
        first, lp = int(packed[0]), float(packed[1])
        top = None
        if self.topn:
            ids = packed[2:2 + self.topn].astype(np.int32).tolist()
            lls = packed[2 + self.topn:].tolist()
            top = [(int(i), float(l)) for i, l in zip(ids, lls)]
        self._finish_admission_token(slot, first, lp, top)

    def _finish_admission_token(self, slot: _Slot, first: int,
                                lp: float | None = None, top=None) -> None:
        slot.admitting = False
        slot.last_token = first
        if self.paged and not slot.resuming and self._prefix_cacheable(slot):
            # the prompt's full pages are completely written now: publish
            # them for future identical prefixes
            self.alloc.register_prefix(self.slots.index(slot),
                                       slot.admit_tokens)
        elif self.dense_prefix is not None and not slot.resuming \
                and self._prefix_cacheable(slot):
            self.dense_prefix.register(self.slots.index(slot),
                                       slot.admit_tokens)
        if self.spec:
            self._spec_hydrate(slot)
        if self._emit_checked(slot, first, lp, top):
            self._maybe_finish(slot, first)

    def _spec_hydrate(self, slot: _Slot) -> None:
        """Hydrate the proposal source with the finished prompt: the DRAFT
        model's cache lane (spec_draft) or the lane's n-gram index
        (spec_lookup; includes the just-sampled first token, which is what
        the next round's proposal must continue). Lanes whose prompt
        already reaches the speculation edge stay on plain ticks
        (spec_ok=False)."""
        toks = slot.admit_tokens
        b = self.slots.index(slot)
        if slot.pos != len(toks) \
                or slot.pos + self.spec_k + 1 >= self.spec_edge:
            slot.spec_ok = False
            return
        if self.spec_lookup:
            from .spec import NgramHistory
            slot.hist = NgramHistory(list(toks) + [slot.last_token],
                                     max_ngram=self.spec_ngram)
            slot.spec_ok = True
            return
        if self.spec_medusa is not None:
            # the heads need this lane's hidden row, which the FIRST verify
            # sweep returns (that round proposes nothing for this lane but
            # still emits one exact token — mirrors engine.generate_medusa's
            # hidden-bootstrapping chunk)
            slot.med_props = None
            slot.spec_ok = True
            return
        for i0, take, bucket in chunk_schedule(
                len(toks), 0, self.draft_cfg.max_seq_len):
            padded = np.zeros(bucket, np.int32)
            padded[:take] = toks[i0: i0 + take]
            self.draft_cache = self._draft_prefill_slot(
                self.draft_weights, jnp.asarray(padded), jnp.int32(i0),
                jnp.int32(take), b, self.draft_cache)
        slot.spec_ok = True

    def _finish_resume(self, slot: _Slot) -> None:
        """End a preemption-resume re-hydration: the stream's tokens were
        all emitted before the preemption, so nothing is emitted here —
        the lane just rejoins the batched decode at its old position. Spec
        modes re-hydrate their proposal source (admit_tokens is exactly
        prompt + generated[:-1] and last_token = generated[-1], so the
        rebuilt history/draft cache matches the uninterrupted one)."""
        slot.admitting = False
        slot.resuming = False
        slot.request._resume = None
        if self.spec:
            self._spec_hydrate(slot)
        self._maybe_finish(slot, slot.last_token)

    def _hydrate_paged_lane(self, b: int, token: int, pos: int):
        """Ring-regime hydration of ONE paged lane: one masked tick (only
        lane b writes), reusing the compiled batched program. Returns the
        lane's logits row (for the dense-parity first-token sample)."""
        B = self.B
        tokens = np.zeros(B, np.int32); tokens[b] = token
        positions = np.array([s.pos for s in self.slots], np.int32)
        positions[b] = pos
        write = np.zeros(B, np.int32); write[b] = 1
        zeros_i = jnp.zeros(B, jnp.int32)
        _, logits, self.cache = self._tick_paged(
            self.weights, jnp.asarray(tokens), jnp.asarray(positions),
            self.cache, zeros_i, jnp.zeros(B, jnp.float32),
            jnp.asarray(write), zeros_i, jnp.ones(B, jnp.float32),
            jnp.full((B, _NBIAS), -1, jnp.int32),
            jnp.zeros((B, _NBIAS), jnp.float32),
            jnp.asarray(self.alloc.table_array()))
        return logits[b]

    def _advance_admission(self) -> None:
        """Advance every admitting slot by at most ONE prefill chunk (or a
        bounded number of ring-regime tokens). First-token latency of a
        prompt of P tokens is therefore <= ceil(P / max_bucket) ticks inside
        the window (+ceil(extra / RING_HYDRATE_PER_TICK) beyond it), while
        decode lanes keep producing a token every tick."""
        window = self.cfg.max_seq_len
        handled = (self._advance_admission_batched(window)
                   if self._admit_batch is not None else set())
        for b, slot in enumerate(self.slots):
            if b in handled:
                continue
            if not slot.admitting:
                continue
            req = slot.request
            toks = slot.admit_tokens
            n = len(toks)
            if slot.pos < window and slot.admit_i < n:
                room = window - slot.pos
                take = min(n - slot.admit_i, PREFILL_BUCKETS[-1], room)
                if self.paged:
                    # keep each chunk inside ONE page (single dus target)
                    take = min(take,
                               self.page_size - slot.pos % self.page_size)
                    # lazy growth: map the page this chunk writes into now
                    if not self._ensure_pages(b, min(window, slot.pos + take)):
                        continue  # this lane was the preemption victim
                bucket = _bucket_for(take)
                if bucket > room:
                    bucket = take
                if self.paged and slot.pos % self.page_size + bucket > self.page_size:
                    bucket = take
                padded = np.zeros(bucket, np.int32)
                padded[:take] = toks[slot.admit_i: slot.admit_i + take]
                last = slot.admit_i + take >= n
                mode = "last" if (last and not slot.resuming) else "none"
                if self.paged:
                    blk = slot.pos // self.page_size
                    page = int(self.alloc.tables[b, blk])
                    row0 = slot.pos % self.page_size
                    if self.mesh is not None:
                        group = b // self.alloc.lanes_per_group
                        out, self.cache = self._prefill_paged_mesh(
                            self.weights, jnp.asarray(padded),
                            jnp.int32(slot.pos), jnp.int32(take), self.cache,
                            jnp.asarray(self.alloc.tables[b]),
                            jnp.int32(page), jnp.int32(row0),
                            jnp.int32(group), logits_mode=mode)
                    else:
                        out, self.cache = self._prefill_paged(
                            self.weights, jnp.asarray(padded),
                            jnp.int32(slot.pos), jnp.int32(take), self.cache,
                            jnp.asarray(self.alloc.tables[b]),
                            jnp.int32(page), jnp.int32(row0),
                            logits_mode=mode)
                else:
                    from .engine import attend_bucket
                    al = attend_bucket(slot.pos + bucket, window) \
                        if (self.fast and self.mesh is None) else 0
                    out, self.cache = self._prefill_slot(
                        self.weights, jnp.asarray(padded), jnp.int32(slot.pos),
                        jnp.int32(take), b, self.cache, logits_mode=mode,
                        attend_len=al)
                slot.pos += take
                slot.admit_i += take
                if last:
                    if slot.resuming:
                        self._finish_resume(slot)
                    else:
                        self._finish_admission(slot, out)
                continue
            # ring-buffer regime (or odd tail): bounded per-token hydration
            budget = self.RING_HYDRATE_PER_TICK
            while budget > 0 and slot.admit_i < n:
                last = slot.admit_i + 1 >= n
                want = last and not slot.resuming
                if self.paged:
                    out = self._hydrate_paged_lane(b, toks[slot.admit_i],
                                                   slot.pos)
                else:
                    out, self.cache = self._hydrate_slot(
                        self.weights, jnp.int32(toks[slot.admit_i]),
                        jnp.int32(slot.pos), b, self.cache, output_logits=want)
                slot.pos += 1
                slot.admit_i += 1
                budget -= 1
                if last:
                    if slot.resuming:
                        self._finish_resume(slot)
                    else:
                        self._finish_admission(slot, out)

    def _advance_admission_batched(self, window: int) -> set[int]:
        """Advance every groupable admitting slot by one chunk in ONE
        batched weight sweep (models/fast.prefill_chunk_fast_batched).
        Returns the slot ids handled this tick; lanes whose shared padded
        bucket would cross the window edge stay on the per-slot path."""
        from .engine import attend_bucket
        work: list[tuple[int, _Slot, int]] = []
        bucket = 0
        for b, slot in enumerate(self.slots):
            if slot.request is None or not slot.admitting:
                continue
            toks = slot.admit_tokens
            if slot.pos >= window or slot.admit_i >= len(toks):
                continue
            room = window - slot.pos
            take = min(len(toks) - slot.admit_i, PREFILL_BUCKETS[-1], room)
            work.append((b, slot, take))
            bucket = max(bucket, _bucket_for(take))
        # window-edge lanes can't pad to the shared bucket
        work = [(b, s, t) for b, s, t in work
                if s.pos + bucket <= window]
        if not work:
            return set()
        if len(work) == 1:
            return set()  # a single admission: the per-slot path's
            # prefix-bounded single-lane program is cheaper
        if self.paged:
            # lazy growth for every lane's whole chunk BEFORE the sweep;
            # an _ensure_pages call can preempt the NEWEST lane — possibly
            # one already in this work list — so re-validate afterwards
            for b, slot, take in list(work):
                self._ensure_pages(b, min(window, slot.pos + take))
            work = [(b, s, t) for b, s, t in work
                    if s.request is not None and s.admitting
                    and self.alloc.mapped_through(b, min(window,
                                                         s.pos + t))]
            if not work:
                return set()
        B = self.B
        tokens = np.zeros((B, bucket), np.int32)
        pos0 = np.zeros(B, np.int32)
        vlen = np.zeros(B, np.int32)
        enable = np.zeros(B, np.int32)
        attend = 0
        for b, slot, take in work:
            toks = slot.admit_tokens
            tokens[b, :take] = toks[slot.admit_i: slot.admit_i + take]
            pos0[b] = slot.pos
            vlen[b] = take
            enable[b] = 1
            attend = max(attend, attend_bucket(slot.pos + bucket, window))
        self.admit_sweeps += 1
        if self.paged:
            out, self.cache = self._admit_batch(
                self.weights, jnp.asarray(tokens), jnp.asarray(pos0),
                jnp.asarray(vlen), jnp.asarray(enable), self.cache,
                jnp.asarray(self.alloc.table_array()))
        else:
            out, self.cache = self._admit_batch(
                self.weights, jnp.asarray(tokens), jnp.asarray(pos0),
                jnp.asarray(vlen), jnp.asarray(enable), self.cache,
                attend_len=attend)
        for b, slot, take in work:
            slot.pos += take
            slot.admit_i += take
            if slot.admit_i >= len(slot.admit_tokens):
                if slot.resuming:
                    # paged preemption resume: re-hydration emits nothing
                    self._finish_resume(slot)
                else:
                    self._finish_admission(slot, out[b])
        return {b for b, _, _ in work}

    def _maybe_finish(self, slot: _Slot, tok: int) -> None:
        req = slot.request
        if req is None:
            return
        if req.cancelled or tok in req.stop_tokens \
                or len(req.generated) >= req.max_new_tokens:
            req.done = True
            slot.request = None
            slot.admitting = False
            if self.paged:
                self.alloc.release(self.slots.index(slot))

    def _fail_slot(self, slot: _Slot, err: Exception) -> None:
        """Fail ONE request (e.g. its on_token callback raised) without
        touching any other lane — per-request failure isolation."""
        req = slot.request
        if req is not None:
            req.error = f"{type(err).__name__}: {err}"
            req.done = True
        slot.request = None
        slot.admitting = False
        if self.paged:
            self.alloc.release(self.slots.index(slot))

    def _emit_checked(self, slot: _Slot, tok: int,
                      lp: float | None = None, top=None) -> bool:
        """Emit a token to a request, failing only that request if its
        callback raises. Returns False when the slot was failed."""
        try:
            slot.request._emit(tok, lp, top)
            return True
        except Exception as e:  # noqa: BLE001 — isolate the poisoned request
            self._fail_slot(slot, e)
            return False

    def recover(self, err: Exception | None = None) -> None:
        """Recover from a failed tick: fail every ACTIVE request (their
        donated cache buffers may be gone), reinitialize the cache, and
        keep all QUEUED requests — they never touched the device. The
        serving driver calls this so one device error costs the in-flight
        streams, not the process or the backlog (reference aborts outright,
        src/infer.cu:13-31)."""
        msg = f"{type(err).__name__}: {err}" if err is not None else "tick failed"
        for slot in self.slots:
            if slot.request is not None:
                slot.request.error = msg
                slot.request.done = True
            slot.request = None
            slot.admitting = False
        if self.paged and self.mesh is not None:
            from .models.paged import GroupedPageAllocator, PagedKVPool
            from .parallel.fast_tp import shard_paged_pool
            self.cache = shard_paged_pool(
                PagedKVPool.init(self.cfg, self.kv_dtype, self.alloc.n_pages,
                                 self.page_size), self.mesh)
            self.alloc = GroupedPageAllocator(
                self.cfg, self.alloc.n_pages, self.B, self.page_size,
                groups=len(self.alloc.groups))
        elif self.paged:
            from .models.paged import PageAllocator, PagedKVPool
            self.cache = PagedKVPool.init(self.cfg, self.kv_dtype,
                                          self.alloc.n_pages, self.page_size)
            self.alloc = PageAllocator(self.cfg, self.alloc.n_pages, self.B,
                                       self.page_size)
        elif self.mesh is not None:
            from .parallel.sharding import shard_cache
            self.cache = shard_cache(
                KVCache.init(self.cfg, self.kv_dtype, batch=self.B),
                self.cfg, self.mesh, batched=True)
        else:
            self.cache = KVCache.init(self.cfg, self.kv_dtype, batch=self.B)

    # ------------------------------------------------------------------
    def step(self) -> int:
        """Admit, advance in-flight admissions by one bounded chunk, then
        run one batched decode tick for the decoding lanes. Returns #busy
        slots (decoding or admitting)."""
        self._admit()
        self._advance_admission()
        if self.paged:
            # lazy growth at block boundaries: map the page the next write
            # lands in (ring regime needs none — the lane is fully mapped
            # by the time pos reaches the window). Spec-eligible lanes need
            # the whole verify chunk's rows (pos .. pos+K) mapped.
            window = self.cfg.max_seq_len
            for b, slot in enumerate(self.slots):
                if slot.decoding and slot.pos < window:
                    ahead = self.spec_k + 1 if (self.spec and slot.spec_ok) \
                        else 1
                    self._ensure_pages(b, min(window, slot.pos + ahead))
        if self.spec:
            self._spec_round()
            return sum(not s.free for s in self.slots)
        decoding = [s.decoding for s in self.slots]
        if any(decoding):
            tokens = jnp.asarray([s.last_token for s in self.slots], jnp.int32)
            positions = jnp.asarray([s.pos for s in self.slots], jnp.int32)
            temps = jnp.asarray(
                [s.request.temperature if s.decoding else 0.0 for s in self.slots],
                jnp.float32)
            seeds = jnp.asarray(
                [s.request.seed if s.decoding else 0 for s in self.slots],
                jnp.int32)
            write = jnp.asarray([1 if d else 0 for d in decoding], jnp.int32)
            topks = jnp.asarray(
                [s.request.top_k if s.decoding else 0 for s in self.slots],
                jnp.int32)
            topps = jnp.asarray(
                [s.request.top_p if s.decoding else 1.0 for s in self.slots],
                jnp.float32)
            bias_ids, bias_vals = self._bias_arrays(
                lambda b, s: s.decoding)
            if self.paged:
                packed, _, self.cache = self._tick_paged(
                    self.weights, tokens, positions, self.cache, seeds,
                    temps, write, topks, topps, bias_ids, bias_vals,
                    jnp.asarray(self.alloc.table_array()))
            else:
                packed, self.cache = self._tick(
                    self.weights, tokens, positions, self.cache, seeds,
                    temps, write, topks, topps, bias_ids, bias_vals)
            nxt, lps, tops = _unpack_sample(packed, self.topn)
            for b, slot in enumerate(self.slots):
                if not slot.decoding:
                    continue
                tok = int(nxt[b])
                slot.pos += 1
                slot.last_token = tok
                if self._emit_checked(slot, tok, float(lps[b]),
                                      tops[b] if tops else None):
                    self._maybe_finish(slot, tok)
        return sum(not s.free for s in self.slots)

    def _spec_round(self) -> None:
        """One speculative round: the proposal source (K+1 draft ticks, or
        per-lane prompt lookup when spec_lookup) proposes per-lane chunks,
        one batched target sweep verifies them all, each eligible lane
        emits its longest ACCEPTED prefix + a correction (up to spec_k+1
        tokens per round). Greedy lanes accept on argmax agreement and the
        correction is the argmax; sampled lanes run exact rejection
        sampling on device (see _verify_pack). Edge lanes fall back to a
        plain tick with their own sampling params; lookup lanes with no
        n-gram match join it for the round only."""
        if self.spec_tree is not None:
            return self._spec_round_tree()
        K = self.spec_k
        elig, props = [], {}
        for b, s in enumerate(self.slots):
            if not s.decoding:
                continue
            if s.spec_ok and s.pos + K + 1 < self.spec_edge:
                if self.spec_lookup:
                    d = s.hist.propose(K)
                    if d:
                        elig.append(b)
                        props[b] = d
                    # no match -> plain tick this round, stays eligible
                else:
                    elig.append(b)
            else:
                s.spec_ok = False  # once off the spec path, stay off
        plain = [b for b, s in enumerate(self.slots)
                 if s.decoding and b not in set(elig)]

        if elig:
            B = self.B
            positions = np.zeros(B, np.int32)
            write = np.zeros(B, np.int32)
            for b in elig:
                positions[b] = self.slots[b].pos
                write[b] = 1
            chunk = np.zeros((B, K + 1), np.int32)
            if self.spec_lookup:
                # per-lane variable-length proposals; rows past 1+kd are
                # zero padding the causal verify never lets rows <= kd see
                kd = {b: len(props[b]) for b in elig}
                for b in elig:
                    chunk[b, 0] = self.slots[b].last_token
                    chunk[b, 1: 1 + kd[b]] = props[b]
            elif self.spec_medusa is not None:
                # head proposals banked by the PREVIOUS round's sweep
                # (fresh lanes have none yet and ride the sweep for the
                # hidden row + one exact token)
                kd = {}
                for b in elig:
                    p = (self.slots[b].med_props or [])[:K]
                    kd[b] = len(p)
                    chunk[b, 0] = self.slots[b].last_token
                    if p:
                        chunk[b, 1: 1 + len(p)] = p
            else:
                tokens = np.zeros(B, np.int32)
                for b in elig:
                    tokens[b] = self.slots[b].last_token
                d_out, self.draft_cache = self._draft_propose(
                    self.draft_weights, jnp.asarray(tokens),
                    jnp.asarray(positions), self.draft_cache,
                    jnp.asarray(write))
                d = np.asarray(d_out)                    # (B, K+1)
                kd = {b: K for b in elig}
                for b in elig:
                    chunk[b, 0] = self.slots[b].last_token
                    chunk[b, 1:] = d[b, :K]
            if self.paged:
                out, self.cache = self._verify(
                    self.weights, jnp.asarray(chunk), jnp.asarray(positions),
                    jnp.asarray(write), self.cache,
                    jnp.asarray(self.alloc.table_array()))
            else:
                out, self.cache = self._verify(
                    self.weights, jnp.asarray(chunk), jnp.asarray(positions),
                    jnp.asarray(write), self.cache)
            temps = np.zeros(B, np.float32)
            seeds = np.zeros(B, np.int32)
            topks = np.zeros(B, np.int32)
            topps = np.ones(B, np.float32)
            for b in elig:
                temps[b] = self.slots[b].request.temperature
                seeds[b] = self.slots[b].request.seed
                topks[b] = self.slots[b].request.top_k
                topps[b] = self.slots[b].request.top_p
            if self.spec_medusa is not None:
                logits, hidden = out
                kd_arr = np.zeros(B, np.int32)
                for b in elig:
                    kd_arr[b] = kd[b]
                vp = np.asarray(_verify_pack_medusa(
                    logits, jnp.asarray(chunk), jnp.asarray(seeds),
                    jnp.asarray(positions), jnp.asarray(temps),
                    jnp.asarray(topks), jnp.asarray(topps),
                    jnp.asarray(kd_arr), hidden, self.spec_medusa,
                    topn=self.topn))
            else:
                logits = out
                vp = np.asarray(_verify_pack(
                    logits, jnp.asarray(chunk), jnp.asarray(seeds),
                    jnp.asarray(positions), jnp.asarray(temps),
                    jnp.asarray(topks), jnp.asarray(topps),
                    topn=self.topn))
            acc = vp[..., 0] > 0.5                       # (B, K+1)
            self.spec_stats["rounds"] += 1
            for b in elig:
                s = self.slots[b]
                a = 0
                while a < kd[b] and acc[b, a]:
                    a += 1
                # first rejection -> residual correction; all kd accepted
                # -> bonus token sampled at the last verified row
                corr_col = 2 if a < kd[b] else 4
                corr = int(vp[b, a, corr_col])
                emitted = [int(x) for x in chunk[b, 1: a + 1]] + [corr]
                self.spec_stats["accepted"] += a
                self.spec_stats["proposed"] += kd[b]
                s.pos = int(positions[b]) + a + 1
                s.last_token = emitted[-1]
                if self.spec_lookup:
                    s.hist.extend(emitted)
                if self.spec_medusa is not None:
                    # next round's head proposals, computed on device from
                    # the hidden row at the correction index (same fetch)
                    H = min(int(self.spec_medusa.w1.shape[0]), K)
                    s.med_props = [int(vp[b, h, -1]) for h in range(H)]
                for i, tok in enumerate(emitted):
                    if s.request is None:
                        break  # finished mid-round: discard the tail
                    # i < a: the accepted proposal chunk[b, i+1] -> lp_c;
                    # i == a: the correction's own logprob
                    lp = float(vp[b, i, 1] if i < a else vp[b, i, corr_col + 1])
                    top = None
                    if self.topn:
                        top = [(int(vp[b, i, 6 + k]),
                                float(vp[b, i, 6 + self.topn + k]))
                               for k in range(self.topn)]
                    if self._emit_checked(s, tok, lp, top):
                        self._maybe_finish(s, tok)
                    else:
                        break

        self._plain_subtick(plain)

    def _plain_subtick(self, plain) -> None:
        """One plain tick for the given lanes with their OWN sampling
        params (all other lanes masked) — window-edge lanes, lookup lanes
        with no n-gram match, and T>0 lanes in tree mode."""
        if plain:
            pset = set(plain)
            tokens = jnp.asarray([s.last_token for s in self.slots], jnp.int32)
            positions = jnp.asarray([s.pos for s in self.slots], jnp.int32)
            write = jnp.asarray([1 if b in pset else 0
                                 for b in range(self.B)], jnp.int32)
            temps = jnp.asarray(
                [s.request.temperature if b in pset else 0.0
                 for b, s in enumerate(self.slots)], jnp.float32)
            seeds = jnp.asarray(
                [s.request.seed if b in pset else 0
                 for b, s in enumerate(self.slots)], jnp.int32)
            topks = jnp.asarray(
                [s.request.top_k if b in pset else 0
                 for b, s in enumerate(self.slots)], jnp.int32)
            topps = jnp.asarray(
                [s.request.top_p if b in pset else 1.0
                 for b, s in enumerate(self.slots)], jnp.float32)
            bias_ids, bias_vals = self._bias_arrays(
                lambda b, s: b in pset)
            if self.paged:
                packed, _, self.cache = self._tick_paged(
                    self.weights, tokens, positions, self.cache, seeds,
                    temps, write, topks, topps, bias_ids, bias_vals,
                    jnp.asarray(self.alloc.table_array()))
            else:
                packed, self.cache = self._tick(
                    self.weights, tokens, positions, self.cache, seeds,
                    temps, write, topks, topps, bias_ids, bias_vals)
            nxt, lps, tops = _unpack_sample(packed, self.topn)
            for b in plain:
                s = self.slots[b]
                tok = int(nxt[b])
                s.pos += 1
                s.last_token = tok
                if self.spec_lookup and s.spec_ok and s.hist is not None:
                    s.hist.extend([tok])  # stays eligible next round
                if self._emit_checked(s, tok, float(lps[b]),
                                      tops[b] if tops else None):
                    self._maybe_finish(s, tok)

    def _spec_round_tree(self) -> None:
        """One TREE-attention Medusa round: banked per-depth top-k head
        candidates form each lane's cartesian tree; ONE sweep scores every
        chain (verify_tree_fast_batched), the walk descends to the child
        matching each row's argmax, the accepted path's KV rows scatter
        into the ring, and the final node's hidden row banks the next
        round's candidates — all in one device fetch. Greedy lanes only
        (the multi-candidate accept rule is argmax matching; T>0 lanes
        ride the plain tick and keep exact sampling semantics)."""
        parents = self._tree_parents
        depths = self._tree_depths
        Tn = len(parents)
        Dmax = max(depths)
        H, kmax = self._tree_H, self._tree_kmax
        elig, fresh = [], set()
        for b, s in enumerate(self.slots):
            if not s.decoding:
                continue
            if (s.spec_ok and s.request.temperature == 0.0
                    and s.pos + Dmax + 1 < self.spec_edge):
                elig.append(b)
                if not s.med_props:
                    fresh.add(b)
            elif s.request.temperature != 0.0:
                pass  # sampled lanes stay plain but remain eligible-checked
            else:
                s.spec_ok = False
        plain = [b for b, s in enumerate(self.slots)
                 if s.decoding and b not in set(elig)]

        if elig:
            B = self.B
            chunk = np.zeros((B, Tn), np.int32)
            positions = np.zeros(B, np.int32)
            live = np.zeros(B, np.int32)
            enable = np.zeros(B, np.int32)
            for b in elig:
                s = self.slots[b]
                positions[b] = s.pos
                enable[b] = 1
                chunk[b, 0] = s.last_token
                if b not in fresh:
                    live[b] = 1
                    cand = s.med_props  # list of H lists of kmax ids
                    for i in range(1, Tn):
                        d = depths[i] - 1
                        chunk[b, i] = cand[d][self._tree_branch[i]]
            out, (ktree, vtree) = self._verify_tree(
                self.weights, jnp.asarray(chunk), jnp.asarray(positions),
                jnp.asarray(enable), self.cache)
            logits, hidden = out
            vp = np.asarray(_verify_pack_tree(
                logits, jnp.asarray(chunk), jnp.asarray(live), hidden,
                self.spec_medusa, parents=parents, kmax=kmax,
                topn=self.topn))
            self.spec_stats["rounds"] += 1
            fin_col = 3 + 2 * self.topn
            rows = np.zeros((B, Dmax + 1), np.int32)
            nrows = np.zeros(B, np.int32)
            for b in elig:
                s = self.slots[b]
                fin = int(vp[b, 0, fin_col])
                path = [fin]
                while parents[path[-1]] >= 0:
                    path.append(parents[path[-1]])
                path.reverse()                       # root .. fin
                a = len(path) - 1                    # accepted proposals
                rows[b, : a + 1] = path
                nrows[b] = a + 1
                corr = int(vp[b, fin, 0])
                emitted = [int(chunk[b, p]) for p in path[1:]] + [corr]
                self.spec_stats["accepted"] += a
                # proposed = the candidate CHAIN length offered (Dmax) —
                # comparable to the chain scheduler's per-round K
                self.spec_stats["proposed"] += Dmax if b not in fresh else 0
                s.pos = int(positions[b]) + a + 1
                s.last_token = emitted[-1]
                s.med_props = [
                    [int(vp[b, 0, fin_col + 1 + h * kmax + k])
                     for k in range(kmax)] for h in range(H)]
                for i, tok in enumerate(emitted):
                    if s.request is None:
                        break  # finished mid-round: discard the tail
                    # i < a: token of path[i+1], scored by its parent row
                    # path[i]; i == a: the correction at the final row
                    r = path[i]
                    lp = float(vp[b, path[i + 1], 2] if i < a
                               else vp[b, fin, 1])
                    top = None
                    if self.topn:
                        top = [(int(vp[b, r, 3 + k]),
                                float(vp[b, r, 3 + self.topn + k]))
                               for k in range(self.topn)]
                    if self._emit_checked(s, tok, lp, top):
                        self._maybe_finish(s, tok)
                    else:
                        break
            # write the accepted paths' KV rows into the ring cache
            self.cache = self._scatter_tree(
                self.cache, ktree, vtree, jnp.asarray(positions),
                jnp.asarray(rows), jnp.asarray(nrows), n_rows=Dmax + 1)

        self._plain_subtick(plain)

    def run(self, max_ticks: int = 100000) -> None:
        """Drive until every queued and active request completes."""
        for _ in range(max_ticks):
            if not self.queue and self.n_active == 0:
                return
            self.step()
        raise RuntimeError("scheduler did not converge within max_ticks")
