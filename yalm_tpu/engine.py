"""Inference engine: jitted token step, chunked prefill, on-device sampling.

This is the TPU-native replacement for the reference's decode driver
(src/main.cpp:87-112) and CUDA-graph machinery (src/infer.cu:1130-1164):

- The whole token step (embedding -> all blocks -> logits -> sampling) is a
  single jitted program; XLA compilation replaces graph capture, and the two
  InferenceModes (hydrate / output logits, reference src/model.h:28-31)
  are two jit specializations instead of two CUDA graphs.
- KV cache buffers are donated into each step, so decode updates in place.
- Sampling happens on device (see sampler.py); only the sampled token id
  crosses to the host per step, versus the reference's full-vocab logits
  download + host scan every token (src/infer.cu:1035-1037).
- Prefill runs in bucketed chunks of batched matmuls instead of the
  reference's token-at-a-time hydration loop; past the context window it
  falls back to per-token hydration, which is exactly the ring-buffer regime.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .codec.format import read_yalm
from .config import ModelConfig
from .models.cache import KVCache
from .models.fast import (FastWeights, decode_step_fast, fast_supported,
                          load_fast_weights, prefill_fast)
from .models.transformer import decode_step, prefill
from .models.weights import Weights, load_weights
from .sampler import logprob_of, sample_ext
from .tokenizer import Tokenizer

# Prefill chunk buckets: prompts are processed in full chunks of the largest
# bucket, with the tail padded up to the smallest fitting bucket. Each bucket
# size compiles once per logits mode.
PREFILL_BUCKETS = (16, 64, 256)


def _bucket_for(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return PREFILL_BUCKETS[-1]


def _softmax_T(logits: np.ndarray, T: float) -> np.ndarray:
    z = logits.astype(np.float64) / max(T, 1e-8)
    z -= z.max()
    e = np.exp(z)
    return e / e.sum()


def rejection_sample_verify(rng, T: float, t_lg: np.ndarray,
                            d: list[int], d_lg: np.ndarray):
    """Speculative rejection-sampling acceptance (Leviathan et al.,
    arXiv:2211.17192). t_lg: target logits rows 0..K (row i scores the
    token AFTER the i-length accepted prefix); d: the K draft proposals;
    d_lg: the draft's logits for each proposal. Returns (emitted, accepted)
    where emitted has accepted+1 tokens whose joint distribution equals
    target-only temperature sampling exactly."""
    K = len(d)
    a = 0
    emitted: list[int] = []
    for i in range(K):
        p = _softmax_T(t_lg[i], T)
        q = _softmax_T(d_lg[i], T)
        x = d[i]
        if rng.random() < min(1.0, p[x] / max(q[x], 1e-300)):
            emitted.append(x)
            a += 1
            continue
        res = np.clip(p - q, 0.0, None)
        z = res.sum()
        tok = int(rng.choice(len(res), p=res / z)) if z > 0 else int(p.argmax())
        emitted.append(tok)
        break
    else:
        pK = _softmax_T(t_lg[K], T)
        emitted.append(int(rng.choice(len(pK), p=pK)))
    return emitted, a


def attend_bucket(pos_end: int, window: int) -> int:
    """Static attention width for a prefill chunk whose last visible slot
    is pos_end-1: the next power of two >= pos_end (min 256), clamped to
    the window. Bucketing keeps the number of compiled prefill programs
    logarithmic while early chunks of long prompts stop paying the full
    (T, window) score tensor."""
    n = 256
    while n < pos_end:
        n *= 2
    return min(n, window)


def chunk_schedule(n_tokens: int, pos: int, window: int):
    """Yield (i, take, bucket) chunked-prefill steps while inside the window.

    `take` tokens starting at offset i are fed at absolute position pos+...,
    padded up to `bucket` (a compiled-once chunk size; shrunk to exact fit
    when a padded chunk would cross the window edge, where
    dynamic_update_slice would clamp the region start and shift valid rows).
    Stops once the ring regime begins — callers hydrate the rest per-token.
    Shared by Engine.prefill_tokens, Engine.perplexity, and Scheduler._admit.
    """
    i = 0
    while i < n_tokens:
        room = window - pos
        if room <= 0:
            return
        take = min(n_tokens - i, PREFILL_BUCKETS[-1], room)
        bucket = _bucket_for(take)
        if bucket > room:
            bucket = take
        yield i, take, bucket
        pos += take
        i += take


class Engine:
    """Single-sequence inference engine over one jitted model."""

    def __init__(
        self,
        cfg: ModelConfig,
        weights: Weights | FastWeights,
        tokenizer: Optional[Tokenizer] = None,
        *,
        kv_dtype=jnp.float16,
        compute_dtype=jnp.float32,
        mesh=None,
        fast: bool | str = "auto",
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.kv_dtype = kv_dtype
        self.compute_dtype = compute_dtype
        self.medusa = None   # MedusaWeights when the checkpoint has heads
        self.mesh = mesh
        if fast == "auto":
            # the Pallas decode path is the default wherever it applies —
            # single-chip via FastWeights, mesh-sharded via shard_map TP
            if mesh is None:
                fast = fast_supported(cfg)
            else:
                from .parallel.fast_tp import fast_tp_supported
                fast = fast_tp_supported(cfg, mesh.shape["tp"], mesh.shape.get("ep", 1))
        if fast and mesh is None and not fast_supported(cfg):
            raise ValueError("fast path unavailable for this config")
        if fast and mesh is not None:
            from .parallel.fast_tp import fast_tp_supported
            if not fast_tp_supported(cfg, mesh.shape["tp"], mesh.shape.get("ep", 1)):
                raise ValueError("fast TP path unavailable for this config/mesh")
        self.fast = bool(fast)
        if self.fast:
            # Mosaic has no f16: fp16 weights/caches become bf16 (identical
            # numerics to the kernels' own per-tile bf16 rounding)
            from .models.weights import upcast_f16_for_tpu
            weights = upcast_f16_for_tpu(weights)
            if kv_dtype == jnp.float16:
                kv_dtype = self.kv_dtype = jnp.bfloat16
            if jnp.dtype(kv_dtype).itemsize == 1 \
                    and jax.default_backend() == "tpu":
                from .models.fast import quant_kv_supported
                if not quant_kv_supported(cfg):
                    raise ValueError(
                        "fp8 KV cache on TPU needs n_kv_heads % 4 == 0 "
                        f"(got {cfg.n_kv_heads}); use bf16")
        # single-chip fast uses the concatenated FastWeights layout; the TP
        # fast path uses the same layout in shard-major row order (see
        # parallel/fast_tp.py) so per-shard kernels stay fully fused
        if self.fast and mesh is None and isinstance(weights, Weights):
            weights = FastWeights.from_weights(weights, cfg)
        if mesh is not None:
            from .parallel.sharding import shard_cache, shard_weights
            if self.fast:
                # a Weights input is rearranged shard-major; a FastWeights
                # input must already BE shard-major (load_fast_weights(tp=))
                from .parallel.fast_tp import shard_fast_tp_weights
                weights = shard_fast_tp_weights(weights, cfg, mesh)
            else:
                # oracle path: Megatron NamedShardings on the Weights layout
                weights = shard_weights(weights, cfg, mesh)
            self.cache = shard_cache(KVCache.init(cfg, kv_dtype), cfg, mesh)
        else:
            self.cache = KVCache.init(cfg, kv_dtype)
        self.weights = weights
        self.pos = 0          # next absolute position to be written
        self._last_logits: Optional[jax.Array] = None

        cd = compute_dtype

        if self.fast and mesh is not None:
            from .parallel.fast_tp import (make_decode_step_fast_tp,
                                           make_prefill_fast_tp)
            ws = getattr(weights, "scales", None) is not None
            _tp_step = make_decode_step_fast_tp(cfg, mesh, with_scales=ws)
            _tp_hydrate = make_decode_step_fast_tp(cfg, mesh,
                                                   output_logits=False,
                                                   with_scales=ws)
            _tp_prefill = make_prefill_fast_tp(cfg, mesh, with_scales=ws)

            def _step(w, token, pos, cache, output_logits=True):
                if not output_logits:
                    _, cache = _tp_hydrate(w, token, pos, cache)
                    return None, cache
                return _tp_step(w, token, pos, cache)

            def _prefill_impl(w, tokens, pos0, valid_len, cache, logits_mode):
                return _tp_prefill(w, tokens, pos0, valid_len, cache,
                                   logits_mode=logits_mode)
        elif self.fast:
            def _step(w, token, pos, cache, output_logits=True):
                return decode_step_fast(cfg, w, token, pos, cache,
                                        output_logits=output_logits)

            def _prefill_impl(w, tokens, pos0, valid_len, cache, logits_mode,
                              attend_len=0):
                return prefill_fast(cfg, w, tokens, pos0, valid_len, cache,
                                    logits_mode=logits_mode,
                                    attend_len=attend_len)
        else:
            def _step(w, token, pos, cache, output_logits=True):
                return decode_step(cfg, w, token, pos, cache,
                                   output_logits=output_logits, compute_dtype=cd)

            def _prefill_impl(w, tokens, pos0, valid_len, cache, logits_mode):
                return prefill(cfg, w, tokens, pos0, valid_len, cache,
                               logits_mode=logits_mode, compute_dtype=cd)

        # --- jitted specializations (cache donated: in-place ring updates) ---
        @partial(jax.jit, donate_argnums=(3,))
        def _step_sample(w, token, pos, cache, key, temperature, top_k, top_p):
            logits, cache = _step(w, token, pos, cache)
            next_token = sample_ext(logits, key, temperature, top_k, top_p)
            return next_token, logits, cache

        @partial(jax.jit, donate_argnums=(3,))
        def _step_hydrate(w, token, pos, cache):
            _, cache = _step(w, token, pos, cache, output_logits=False)
            return cache

        @partial(jax.jit, donate_argnums=(3,))
        def _step_logits(w, token, pos, cache):
            logits, cache = _step(w, token, pos, cache)
            return logits, cache

        @partial(jax.jit, static_argnames=("logits_mode", "attend_len"),
                 donate_argnums=(4,))
        def _prefill(w, tokens, pos0, valid_len, cache, logits_mode,
                     attend_len=0):
            if self.fast and mesh is None:
                return _prefill_impl(w, tokens, pos0, valid_len, cache,
                                     logits_mode, attend_len)
            return _prefill_impl(w, tokens, pos0, valid_len, cache, logits_mode)

        @partial(jax.jit, static_argnames=("n",), donate_argnums=(3,))
        def _decode_block(w, token0, pos0, cache, key, temperature, n,
                          top_k=jnp.int32(0), top_p=jnp.float32(1.0)):
            """Generate n tokens in ONE device program (lax.fori_loop over
            fused decode+sample steps). One host dispatch per block instead of
            per token — the TPU-native answer to the reference's per-token
            CUDA-graph launch + logits download (src/infer.cu:1035-1037)."""
            out = jnp.zeros((n,), jnp.int32)

            def body(i, carry):
                token, cache, out, key = carry
                key, sub = jax.random.split(key)
                logits, cache = _step(w, token, pos0 + i, cache)
                nxt = sample_ext(logits, sub, temperature, top_k, top_p)
                return nxt, cache, out.at[i].set(nxt), key

            _, cache, out, _ = jax.lax.fori_loop(
                0, n, body, (token0, cache, out, key))
            return out, cache

        @partial(jax.jit, static_argnames=("n",), donate_argnums=(3,))
        def _decode_block_logits(w, token0, pos0, cache, key, temperature, n):
            """_decode_block that also returns every step's full logits —
            the draft side of rejection-sampling speculative decoding needs
            q_i(x) for the acceptance test and the residual distribution."""
            out = jnp.zeros((n,), jnp.int32)
            lg = jnp.zeros((n, cfg.vocab_size), jnp.float32)

            def body(i, carry):
                token, cache, out, lg, key = carry
                key, sub = jax.random.split(key)
                logits, cache = _step(w, token, pos0 + i, cache)
                nxt = sample_ext(logits, sub, temperature, jnp.int32(0),
                                 jnp.float32(1.0))
                return nxt, cache, out.at[i].set(nxt), lg.at[i].set(logits), key

            _, cache, out, lg, _ = jax.lax.fori_loop(
                0, n, body, (token0, cache, out, lg, key))
            return out, lg, cache

        self._step_sample = _step_sample
        self._step_hydrate = _step_hydrate
        self._step_logits = _step_logits
        self._prefill = _prefill
        self._decode_block = _decode_block
        self._decode_block_logits = _decode_block_logits

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, path: str, *, context: int = 0,
                        device=None, mesh=None, fast: bool | str = "auto",
                        **kw) -> "Engine":
        yf = read_yalm(path)
        cfg = ModelConfig.from_metadata(yf.metadata, context=context)
        if mesh is not None:
            put = jnp.asarray  # stacked on host; sharded in Engine.__init__
        elif device is not None:
            put = partial(jax.device_put, device=device)
        else:
            put = jnp.asarray
        if fast == "auto":
            if mesh is None:
                fast = fast_supported(cfg)
            else:
                from .parallel.fast_tp import fast_tp_supported
                fast = fast_tp_supported(cfg, mesh.shape["tp"], mesh.shape.get("ep", 1))
        if fast:
            # fp16 -> bf16 on the HOST before upload (Mosaic has no f16);
            # the device-side upcast_f16_for_tpu fallback would transiently
            # hold ~2x the weight bytes in HBM
            from .models.weights import f16_to_bf16_put
            put = f16_to_bf16_put(put)
        try:
            if fast:
                # concat on the host so HBM never holds two weight copies;
                # shard-major row order when a mesh will shard it
                tp = mesh.shape["tp"] if mesh is not None else 1
                weights = load_fast_weights(yf, cfg, device_put=put, tp=tp)
            else:
                weights = load_weights(yf, cfg, device_put=put)
            tok = Tokenizer.from_yalm(yf)
            eng = cls(cfg, weights, tok, mesh=mesh, fast=fast, **kw)
            if "medusa_heads" in yf.metadata:
                # self-drafting heads ride the checkpoint (medusa.py);
                # tiny next to the model — load unconditionally
                from .medusa import load_medusa_weights
                eng.medusa = load_medusa_weights(yf, cfg, device_put=put)
            if device is not None and mesh is None:
                eng.cache = jax.device_put(eng.cache, device)
        finally:
            yf.close()  # weights were copied to device; release the mapping
        return eng

    # ------------------------------------------------------------------
    def reset(self) -> None:
        if self.mesh is not None:
            from .parallel.sharding import shard_cache
            self.cache = shard_cache(KVCache.init(self.cfg, self.kv_dtype),
                                     self.cfg, self.mesh)
        else:
            self.cache = KVCache.init(self.cfg, self.kv_dtype)
        self.pos = 0
        self._last_logits = None

    def warmup(self) -> None:
        """Compile + run every specialization once (reference warms up with a
        single forward at pos 0, src/main.cpp:66-70; here each bucket/mode
        pair is its own program)."""
        if self.mesh is not None:
            # must match the real cache's sharding or every program compiles
            # twice (once here for the unsharded layout, again on first use)
            from .parallel.sharding import shard_cache
            cache = shard_cache(KVCache.init(self.cfg, self.kv_dtype),
                                self.cfg, self.mesh)
        else:
            cache = KVCache.init(self.cfg, self.kv_dtype)
        cache = self._step_hydrate(self.weights, jnp.int32(0), jnp.int32(0), cache)
        _, _, cache = self._step_sample(self.weights, jnp.int32(0), jnp.int32(0), cache,
                                        jax.random.PRNGKey(0), jnp.float32(1.0),
                                        jnp.int32(0), jnp.float32(1.0))
        _, cache = self._step_logits(self.weights, jnp.int32(0), jnp.int32(0), cache)
        for b in PREFILL_BUCKETS:
            if b > self.cfg.max_seq_len:
                continue  # chunk can never exceed the window
            toks = jnp.zeros((b,), jnp.int32)
            for mode in ("none", "last", "all"):
                out, cache = self._prefill(self.weights, toks, jnp.int32(0),
                                           jnp.int32(1), cache, logits_mode=mode,
                                           attend_len=self._attn_len(b))
        jax.block_until_ready(cache)

    # ------------------------------------------------------------------
    def _attn_len(self, pos_end: int) -> int:
        """Bucketed static attention width for a chunk ending at pos_end
        (prefix-bounded prefill; 0 = full window on paths without it)."""
        if self.fast and self.mesh is None:
            return attend_bucket(pos_end, self.cfg.max_seq_len)
        return 0

    def prefill_tokens(self, tokens: Sequence[int], *, want_logits: bool = True) -> None:
        """Hydrate the KV cache with `tokens` starting at self.pos.

        Chunked-batched while inside the context window; token-at-a-time in
        the ring-buffer regime beyond it. Afterwards `self._last_logits`
        holds the logits of the final token if want_logits.
        """
        cfg = self.cfg
        toks = list(int(t) for t in tokens)
        n = len(toks)
        i = 0
        for i0, take, bucket in chunk_schedule(n, self.pos, cfg.max_seq_len):
            padded = np.zeros(bucket, np.int32)
            padded[:take] = toks[i0 : i0 + take]
            last_chunk = i0 + take >= n
            mode = "last" if (want_logits and last_chunk) else "none"
            out, self.cache = self._prefill(
                self.weights, jnp.asarray(padded), jnp.int32(self.pos),
                jnp.int32(take), self.cache, logits_mode=mode,
                attend_len=self._attn_len(self.pos + bucket))
            if mode == "last":
                self._last_logits = out
            self.pos += take
            i = i0 + take
        # ring-buffer regime (pos >= L) or an odd tail: per-token hydration
        while i < n:
            tok = toks[i]
            last = i + 1 >= n
            if want_logits and last:
                self._last_logits, self.cache = self._step_logits(
                    self.weights, jnp.int32(tok), jnp.int32(self.pos), self.cache)
            else:
                self.cache = self._step_hydrate(
                    self.weights, jnp.int32(tok), jnp.int32(self.pos), self.cache)
            self.pos += 1
            i += 1

    # ------------------------------------------------------------------
    def generate(
        self,
        prompt_tokens: Sequence[int],
        *,
        max_steps: int = 256,
        temperature: float = 1.0,
        seed: int | None = None,
        stop_tokens: Sequence[int] = (),
        block_size: int = 1,
        top_k: int = 0,
        top_p: float = 1.0,
    ) -> Iterator[int]:
        """Prefill then stream sampled token ids (the reference decode loop,
        src/main.cpp:102-112, with sampling moved on-device).

        block_size > 1 runs the decode loop on device in blocks of that many
        tokens — one host round-trip per block instead of per token. Tokens
        past a stop token inside a block are discarded. top_k / top_p
        restrict sampling (0 / 1.0 disable; see sampler.sample_ext).
        """
        self.prefill_tokens(prompt_tokens, want_logits=True)
        key = jax.random.PRNGKey(seed if seed is not None else time.time_ns() & 0x7FFFFFFF)
        temp = jnp.float32(temperature)
        tk, tp = jnp.int32(top_k), jnp.float32(top_p)
        stop = set(int(s) for s in stop_tokens)

        logits = self._last_logits
        assert logits is not None
        key, sub = jax.random.split(key)
        token = int(sample_ext(logits, sub, temp, tk, tp))
        steps = 0

        if block_size <= 1:
            while max_steps == -1 or steps < max_steps:
                yield token
                steps += 1
                if token in stop:
                    return
                key, sub = jax.random.split(key)
                token_arr, logits, self.cache = self._step_sample(
                    self.weights, jnp.int32(token), jnp.int32(self.pos),
                    self.cache, sub, temp, tk, tp)
                self._last_logits = logits
                self.pos += 1
                token = int(token_arr)
            return

        # device-side block decode
        yield token
        steps += 1
        if token in stop or (max_steps != -1 and steps >= max_steps):
            return
        while max_steps == -1 or steps < max_steps:
            key, sub = jax.random.split(key)
            out, self.cache = self._decode_block(
                self.weights, jnp.int32(token), jnp.int32(self.pos), self.cache,
                sub, temp, n=block_size, top_k=tk, top_p=tp)
            self.pos += block_size
            block = [int(t) for t in np.asarray(out)]  # one host fetch per block
            for t in block:
                yield t
                steps += 1
                if t in stop or (max_steps != -1 and steps >= max_steps):
                    return
            token = block[-1]

    # ------------------------------------------------------------------
    def generate_speculative(
        self,
        prompt_tokens: Sequence[int],
        *,
        draft: Optional["Engine"] = None,
        n_draft: int = 4,
        max_steps: int = 256,
        stop_tokens: Sequence[int] = (),
        temperature: float = 0.0,
        seed: int | None = None,
        ngram_max: int = 3,
        hist_tokens: Sequence[int] | None = None,
    ) -> Iterator[int]:
        """Speculative decoding: a small DRAFT engine proposes n_draft
        tokens per round and this (target) engine verifies them in ONE
        chunked forward, so each target weight-sweep yields up to n_draft+1
        tokens instead of one.

        draft=None switches the proposal source to PROMPT LOOKUP (n-gram
        matching over the token history, spec.ngram_propose): no draft
        model, no extra device work — see _generate_prompt_lookup.
        hist_tokens (lookup only) seeds the n-gram history with context
        that was ALREADY prefilled into the cache (the CLI hydrates the
        prompt itself and then streams from prompt_tokens=[]).

        temperature == 0 (default): greedy verification — the output is
        EXACTLY the target's greedy stream (acceptance = argmax agreement).

        temperature > 0: REJECTION-SAMPLING verification (Leviathan et al.,
        arXiv:2211.17192): the draft samples x_i ~ q_i at the temperature,
        the target accepts with prob min(1, p_i(x_i)/q_i(x_i)), and on
        rejection emits a sample from the normalized residual
        max(p_i - q_i, 0). The emitted stream is distributed EXACTLY as the
        target's own temperature sampling — acceptance only shortcuts
        compute, never changes the distribution. (Plain softmax sampling
        only; top-k/top-p compose with the residual math nontrivially and
        are not supported here.)

        Entirely new capability vs the reference (strictly one token per
        full-model pass, src/main.cpp:102-112). Speculated cache rows past
        the accepted prefix are simply abandoned (slots >= kv_len are
        invisible to attention and get overwritten as decoding proceeds).
        The ring regime overwrites OLD rows that a rejection could not
        restore, so speculation stops at the window and decoding falls back
        to the normal per-token loop there.
        """
        if draft is None:
            yield from self._generate_prompt_lookup(
                prompt_tokens, n_draft=n_draft, max_steps=max_steps,
                stop_tokens=stop_tokens, temperature=temperature, seed=seed,
                ngram_max=ngram_max, hist_tokens=hist_tokens)
            return
        cfg = self.cfg
        draft_stats = {"rounds": 0, "accepted": 0}
        self._spec_stats = draft_stats
        self.prefill_tokens(prompt_tokens, want_logits=True)
        draft.prefill_tokens(prompt_tokens, want_logits=False)
        stop = set(int(s) for s in stop_tokens)
        T = float(temperature)
        rng = np.random.default_rng(seed if seed is not None else 0)

        def softmax_T(logits: np.ndarray) -> np.ndarray:
            z = logits.astype(np.float64) / max(T, 1e-8)
            z -= z.max()
            e = np.exp(z)
            return e / e.sum()

        assert self._last_logits is not None
        if T == 0.0:
            cur = int(jnp.argmax(self._last_logits))
        else:
            p0 = softmax_T(np.asarray(self._last_logits))
            cur = int(rng.choice(len(p0), p=p0))
        steps = 0
        key = jax.random.PRNGKey(seed if seed is not None else 0)
        zero = jnp.float32(0.0)
        temp_arr = jnp.float32(T)

        yield cur
        steps += 1
        if cur in stop:
            return

        # the verify chunk holds K+1 tokens ([cur] + all K proposals)
        K = min(max(1, int(n_draft)), PREFILL_BUCKETS[-1] - 1)
        bucket = _bucket_for(K + 1)
        # the DRAFT's window binds too: its ring regime rotates sink keys,
        # which a rejection cannot undo — its cache would silently corrupt
        edge = min(cfg.max_seq_len, draft.cfg.max_seq_len)
        while max_steps == -1 or steps < max_steps:
            # the padded verify chunk must fit before the window edge, else
            # dynamic_update_slice would clamp its start (chunk_schedule's
            # rule) — and the ring regime can't roll back anyway
            if self.pos + bucket >= edge:
                # window edge: plain (greedy or sampled) decode from here on
                while max_steps == -1 or steps < max_steps:
                    key, sub = jax.random.split(key)
                    tok_arr, logits, self.cache = self._step_sample(
                        self.weights, jnp.int32(cur), jnp.int32(self.pos),
                        self.cache, sub, temp_arr, jnp.int32(0),
                        jnp.float32(1.0))
                    self._last_logits = logits
                    self.pos += 1
                    draft.pos += 1  # keep in sync (draft unused past here)
                    cur = int(tok_arr)
                    yield cur
                    steps += 1
                    if cur in stop:
                        return
                return

            # 1) draft proposes K tokens after `cur` (greedy at T=0, else
            #    sampled at the temperature, with its per-step logits for
            #    the acceptance math). It decodes K+1: the extra step's
            #    CACHE WRITE hydrates the draft's row for d[K-1] at pos0+K,
            #    which the full-acceptance rewind (a == K) leaves inside
            #    the draft's visible history.
            key, sub = jax.random.split(key)
            if T == 0.0:
                d_out, draft.cache = draft._decode_block(
                    draft.weights, jnp.int32(cur), jnp.int32(draft.pos),
                    draft.cache, sub, zero, n=K + 1)
                d_lg = None
            else:
                d_out, d_lg, draft.cache = draft._decode_block_logits(
                    draft.weights, jnp.int32(cur), jnp.int32(draft.pos),
                    draft.cache, sub, temp_arr, n=K + 1)
            draft.pos += K + 1
            d = [int(t) for t in np.asarray(d_out)][:K]       # d[0..K-1]

            # 2) target verifies ALL K proposals in ONE chunked forward:
            #    logits at row i answer "what follows [.., cur, d0..d_{i-1}]"
            chunk = np.zeros(bucket, np.int32)
            chunk[: K + 1] = [cur] + d
            pos0 = self.pos
            all_logits, self.cache = self._prefill(
                self.weights, jnp.asarray(chunk), jnp.int32(pos0),
                jnp.int32(K + 1), self.cache, logits_mode="all",
                attend_len=self._attn_len(pos0 + bucket))
            t_lg = np.asarray(all_logits[: K + 1])

            if T == 0.0:
                # 3a) longest agreeing prefix, then the target's own next
                #     token: up to K+1 tokens per target sweep
                t = t_lg.argmax(axis=-1)
                a = 0
                while a < K and d[a] == int(t[a]):
                    a += 1
                emitted = [int(x) for x in d[:a]] + [int(t[a])]
            else:
                # 3b) rejection sampling: accept x_i w.p. min(1, p/q); on
                #     rejection sample the residual max(p-q, 0)/Z; on full
                #     acceptance sample the bonus token from p_K
                emitted, a = rejection_sample_verify(
                    rng, T, t_lg, d, np.asarray(d_lg)[:K])
            draft_stats["rounds"] += 1
            draft_stats["accepted"] += a

            # accepted rows pos0..pos0+a hold [cur, d0..d_{a-1}]; the row
            # for `emitted[-1]` is written by the next round's forwards
            self.pos = pos0 + a + 1
            draft.pos = pos0 + a + 1
            self._last_logits = all_logits[a]

            for tok in emitted:
                yield int(tok)
                steps += 1
                if tok in stop or (max_steps != -1 and steps >= max_steps):
                    return
            cur = emitted[-1]

    # ------------------------------------------------------------------
    def _generate_prompt_lookup(
        self,
        prompt_tokens: Sequence[int],
        *,
        n_draft: int = 4,
        max_steps: int = 256,
        stop_tokens: Sequence[int] = (),
        temperature: float = 0.0,
        seed: int | None = None,
        ngram_max: int = 3,
        hist_tokens: Sequence[int] | None = None,
    ) -> Iterator[int]:
        """Prompt-lookup speculative decoding (generate_speculative with
        draft=None): proposals come from the most recent earlier occurrence
        of the history's trailing n-gram (spec.NgramHistory) instead of a
        draft model, verified by the same chunked target forward. Rounds
        with no match run a plain decode step, so worst case degrades to
        normal decoding plus a dict lookup. T=0 emits exactly the greedy
        stream; T>0 uses point-mass rejection sampling (exact target
        distribution, spec.pointmass_rejection_verify)."""
        from .spec import NgramHistory, pointmass_rejection_verify
        cfg = self.cfg
        stats = {"rounds": 0, "accepted": 0, "proposed": 0, "plain": 0}
        self._spec_stats = stats
        self.prefill_tokens(prompt_tokens, want_logits=True)
        hist = NgramHistory(
            [int(t) for t in (hist_tokens or [])]
            + [int(t) for t in prompt_tokens], max_ngram=ngram_max)
        stop = set(int(s) for s in stop_tokens)
        T = float(temperature)
        rng = np.random.default_rng(seed if seed is not None else 0)
        key = jax.random.PRNGKey(seed if seed is not None else 0)
        temp_arr = jnp.float32(T)

        assert self._last_logits is not None
        if T == 0.0:
            cur = int(jnp.argmax(self._last_logits))
        else:
            p0 = _softmax_T(np.asarray(self._last_logits), T)
            cur = int(rng.choice(len(p0), p=p0))
        hist.extend([cur])
        steps = 0
        yield cur
        steps += 1
        if cur in stop:
            return

        K = min(max(1, int(n_draft)), PREFILL_BUCKETS[-1] - 1)
        bucket = _bucket_for(K + 1)
        while max_steps == -1 or steps < max_steps:
            if self.pos + bucket >= cfg.max_seq_len:
                # window edge: the ring regime can't roll back a rejection
                while max_steps == -1 or steps < max_steps:
                    key, sub = jax.random.split(key)
                    tok_arr, logits, self.cache = self._step_sample(
                        self.weights, jnp.int32(cur), jnp.int32(self.pos),
                        self.cache, sub, temp_arr, jnp.int32(0),
                        jnp.float32(1.0))
                    self._last_logits = logits
                    self.pos += 1
                    cur = int(tok_arr)
                    yield cur
                    steps += 1
                    if cur in stop:
                        return
                return

            d = hist.propose(K)
            if not d:
                stats["plain"] += 1
                key, sub = jax.random.split(key)
                tok_arr, logits, self.cache = self._step_sample(
                    self.weights, jnp.int32(cur), jnp.int32(self.pos),
                    self.cache, sub, temp_arr, jnp.int32(0), jnp.float32(1.0))
                self._last_logits = logits
                self.pos += 1
                cur = int(tok_arr)
                hist.extend([cur])
                yield cur
                steps += 1
                if cur in stop:
                    return
                continue

            # verify [cur] + d in one chunked forward; rows 0..len(d) score
            # the token after each accepted prefix
            kd = len(d)
            chunk = np.zeros(bucket, np.int32)
            chunk[: kd + 1] = [cur] + d
            pos0 = self.pos
            all_logits, self.cache = self._prefill(
                self.weights, jnp.asarray(chunk), jnp.int32(pos0),
                jnp.int32(kd + 1), self.cache, logits_mode="all",
                attend_len=self._attn_len(pos0 + bucket))
            t_lg = np.asarray(all_logits[: kd + 1])

            if T == 0.0:
                t = t_lg.argmax(axis=-1)
                a = 0
                while a < kd and d[a] == int(t[a]):
                    a += 1
                emitted = [int(x) for x in d[:a]] + [int(t[a])]
            else:
                emitted, a = pointmass_rejection_verify(rng, T, t_lg, d)
            stats["rounds"] += 1
            stats["proposed"] += kd
            stats["accepted"] += a

            self.pos = pos0 + a + 1
            self._last_logits = all_logits[a]
            hist.extend(emitted)
            for tok in emitted:
                yield int(tok)
                steps += 1
                if tok in stop or (max_steps != -1 and steps >= max_steps):
                    return
            cur = emitted[-1]

    def generate_medusa(
        self,
        prompt_tokens: Sequence[int],
        *,
        max_steps: int = 256,
        stop_tokens: Sequence[int] = (),
        temperature: float = 0.0,
        seed: int | None = None,
    ) -> Iterator[int]:
        """Medusa self-drafting speculation (medusa.py): the checkpoint's
        H heads read the post-final-norm hidden state of the LAST ACCEPTED
        position (returned by the same verify forward — steady state is
        ONE full-model sweep per round, no draft model at all) and propose
        the next H tokens; the chunked target forward verifies them.
        Proposals are argmax point masses, so the emitted stream is the
        target's EXACT greedy stream at T=0 and the exact target
        temperature distribution at T>0 (spec.pointmass_rejection_verify)
        regardless of head quality — heads only buy speed."""
        from .spec import pointmass_rejection_verify
        from .medusa import medusa_propose
        mw = self.medusa
        if mw is None:
            raise ValueError("checkpoint has no medusa heads "
                             "(metadata medusa_heads)")
        if self.mesh is not None:
            raise ValueError("medusa speculation on a mesh engine is not "
                             "supported yet (the sharded prefill has no "
                             "all_h mode)")
        cfg = self.cfg
        stats = {"rounds": 0, "accepted": 0, "proposed": 0, "plain": 0}
        self._spec_stats = stats
        self.prefill_tokens(prompt_tokens, want_logits=True)
        stop = set(int(s) for s in stop_tokens)
        T = float(temperature)
        rng = np.random.default_rng(seed if seed is not None else 0)
        key = jax.random.PRNGKey(seed if seed is not None else 0)
        temp_arr = jnp.float32(T)

        assert self._last_logits is not None
        if T == 0.0:
            cur = int(jnp.argmax(self._last_logits))
        else:
            p0 = _softmax_T(np.asarray(self._last_logits), T)
            cur = int(rng.choice(len(p0), p=p0))
        steps = 0
        yield cur
        steps += 1
        if cur in stop:
            return

        H = int(mw.w1.shape[0])
        K = min(H, PREFILL_BUCKETS[-1] - 1)
        bucket = _bucket_for(K + 1)
        hidden = None   # the first round runs a 1-token chunk to fetch it
        while max_steps == -1 or steps < max_steps:
            if self.pos + bucket >= cfg.max_seq_len:
                # window edge: the ring regime can't roll back a rejection
                while max_steps == -1 or steps < max_steps:
                    key, sub = jax.random.split(key)
                    tok_arr, logits, self.cache = self._step_sample(
                        self.weights, jnp.int32(cur), jnp.int32(self.pos),
                        self.cache, sub, temp_arr, jnp.int32(0),
                        jnp.float32(1.0))
                    self._last_logits = logits
                    self.pos += 1
                    cur = int(tok_arr)
                    yield cur
                    steps += 1
                    if cur in stop:
                        return
                return

            if hidden is None:
                d = []          # hidden not known yet: 1-token chunk
                stats["plain"] += 1
            else:
                d = [int(t) for t in np.asarray(medusa_propose(mw, hidden))[:K]]
            kd = len(d)
            chunk = np.zeros(bucket, np.int32)
            chunk[: kd + 1] = [cur] + d
            pos0 = self.pos
            (all_logits, all_h), self.cache = self._prefill(
                self.weights, jnp.asarray(chunk), jnp.int32(pos0),
                jnp.int32(kd + 1), self.cache, logits_mode="all_h",
                attend_len=self._attn_len(pos0 + bucket))
            t_lg = np.asarray(all_logits[: kd + 1])

            if T == 0.0:
                t = t_lg.argmax(axis=-1)
                a = 0
                while a < kd and d[a] == int(t[a]):
                    a += 1
                emitted = [int(x) for x in d[:a]] + [int(t[a])]
            else:
                emitted, a = pointmass_rejection_verify(rng, T, t_lg, d)
            if kd:
                stats["rounds"] += 1
                stats["proposed"] += kd
                stats["accepted"] += a

            self.pos = pos0 + a + 1
            self._last_logits = all_logits[a]
            hidden = all_h[a]
            for tok in emitted:
                yield int(tok)
                steps += 1
                if tok in stop or (max_steps != -1 and steps >= max_steps):
                    return
            cur = emitted[-1]

    # ------------------------------------------------------------------
    def perplexity(self, tokens: Sequence[int]) -> tuple[float, float, int]:
        """Perplexity of tokens[1:] given running context (reference
        src/main.cpp:128-200). Returns (ppl, standard_error, N).

        Uses chunked prefill with all-position logits — each forward chunk
        scores a whole block of next-token predictions at once.
        """
        toks = np.asarray(tokens, np.int32)
        n = len(toks)
        if n < 2:
            raise ValueError("need at least 2 tokens for perplexity")
        logprobs: list[np.ndarray] = []
        cfg = self.cfg
        i = 0
        # feed positions [0, n-2]; predictions for [1, n-1]
        for i0, take, bucket in chunk_schedule(n - 1, self.pos, cfg.max_seq_len):
            padded = np.zeros(bucket, np.int32)
            padded[:take] = toks[i0 : i0 + take]
            all_logits, self.cache = self._prefill(
                self.weights, jnp.asarray(padded), jnp.int32(self.pos),
                jnp.int32(take), self.cache, logits_mode="all",
                attend_len=self._attn_len(self.pos + bucket))
            targets = np.zeros(bucket, np.int32)
            targets[:take] = toks[i0 + 1 : i0 + 1 + take]
            lp = np.asarray(logprob_of(all_logits, jnp.asarray(targets)))[:take]
            logprobs.append(lp)
            self.pos += take
            i = i0 + take
        while i < n - 1:  # ring-buffer regime: per-token
            logits, self.cache = self._step_logits(
                self.weights, jnp.int32(toks[i]), jnp.int32(self.pos), self.cache)
            lp = float(logprob_of(logits, jnp.asarray(toks[i + 1])))
            logprobs.append(np.array([lp]))
            self.pos += 1
            i += 1

        lp = np.concatenate(logprobs).astype(np.float64)
        N = len(lp)
        ppl = float(np.exp(-lp.mean()))
        # same stderr formula as reference src/main.cpp:189
        err = ppl * float(np.sqrt((np.sum(lp * lp) - lp.sum() ** 2 / N) / N / N))
        return ppl, err, N
