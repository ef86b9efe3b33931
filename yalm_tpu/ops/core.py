"""Core numeric ops, pure jnp — the permanent parity oracle.

These are the TPU-functional re-formulations of the reference's scalar CPU
kernels (reference src/infer.cpp:100-248). They run on any backend and define
the golden numerics that Pallas kernels are parity-tested against
(SURVEY.md §4). All positional/ring-buffer logic is expressed with masks and
static shapes so everything jits cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def rmsnorm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """RMS norm over the last axis (reference src/infer.cpp:134-144).

    Matches the reference exactly: rms = sqrt(mean(x^2) + eps) — note eps is
    added *after* the mean, inside the sqrt.
    """
    x = x.astype(jnp.float32)
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * weight.astype(jnp.float32)


def scale_inv_freq(freq: jax.Array, rope_scale: tuple,
                   j: jax.Array | None = None) -> jax.Array:
    """Apply a RoPE frequency-scaling scheme elementwise (static params).

    rope_scale: () = none; ("linear", factor) = positional interpolation
    (all frequencies divided by factor); ("llama3", factor, low_freq_factor,
    high_freq_factor, orig_ctx) = the Llama-3.1 piecewise remap (HF
    transformers `_compute_llama3_parameters`): long-wavelength pairs slow
    by `factor`, short-wavelength pairs keep their frequency, the band
    between interpolates smoothly. Neither the reference nor its converter
    supports any scaling (no `rope_scaling` handling anywhere in
    /root/reference), so Llama-3.1+ checkpoints would silently mis-rotate
    there; here they convert and run exactly."""
    if not rope_scale:
        return freq
    kind = rope_scale[0]
    if kind == "linear":
        return freq / rope_scale[1]
    if kind == "llama3":
        _, factor, lo_f, hi_f, orig = rope_scale
        two_pi = 2.0 * jnp.pi
        wavelen = two_pi / jnp.maximum(freq, 1e-30)
        low_wl = orig / lo_f       # longest wavelength left untouched-ish
        high_wl = orig / hi_f      # below this: high-frequency, unchanged
        smooth = jnp.clip((orig / wavelen - lo_f) / (hi_f - lo_f), 0.0, 1.0)
        scaled = (1.0 - smooth) * freq / factor + smooth * freq
        out = jnp.where(wavelen > low_wl, freq / factor,
                        jnp.where(wavelen < high_wl, freq, scaled))
        return jnp.where(freq == 0.0, 0.0, out)
    if kind == "yarn":
        # (yarn, factor, low, high, mscale): pair i below `low` keeps its
        # frequency (extrapolation), above `high` divides by `factor`
        # (interpolation), the band between ramps linearly over the PAIR
        # INDEX i = j/2. low/high are precomputed at convert time from
        # beta_fast/beta_slow (HF _compute_yarn_parameters); mscale
        # multiplies cos/sin, not freq (rope_mscale).
        _, factor, low, high, _ms = rope_scale
        assert j is not None, "yarn scaling needs the pair index array"
        i = j.astype(jnp.float32) / 2.0
        ramp = jnp.clip((i - low) / jnp.maximum(high - low, 1e-3), 0.0, 1.0)
        return freq * (1.0 - ramp) + (freq / factor) * ramp
    raise ValueError(f"unknown rope scaling {kind!r}")


def rope_mscale(theta) -> float:
    """YaRN's attention-scaling factor (multiplies the cos/sin tables,
    which scales rotary q.k contributions like HF's implementation);
    1.0 for every other scheme."""
    _, scale = decode_rope_param(theta)
    if scale and scale[0] == "yarn":
        return float(scale[4])
    return 1.0


def rope_rotation_param(theta):
    """The same packed theta with YaRN's mscale forced to 1: for rotating
    ALREADY-WRITTEN cache keys (sink maintenance), where the mscale was
    applied at write time and must not compound."""
    if isinstance(theta, tuple) and theta[0] == "yarn":
        return theta[:5] + (1.0,)
    return theta


def decode_rope_param(theta) -> tuple[float, tuple]:
    """`theta` at every rope site is a STATIC parameter that is either a
    plain float (no scaling) or the packed tuple ModelConfig.rope_param =
    (kind, theta, *scaling_params) — one hashable value threads the whole
    scaling scheme through jit/Pallas static args with no extra plumbing."""
    if isinstance(theta, tuple):
        return float(theta[1]), (theta[0],) + tuple(theta[2:])
    return float(theta), ()


def rope_pair_freqs(theta, rotary_dim: int, j: jax.Array,
                    alt=None) -> jax.Array:
    """Inverse frequencies for pair-start indices j (0, 2, 4, ...); j >=
    rotary_dim pairs get frequency 0 (identity — partial rotary dims,
    reference src/infer.cpp:200-213). Applies any packed scaling.

    The packed kind ("gemma3", theta_global, factor, theta_local) carries
    Gemma3's PER-LAYER dual rope: global layers rotate with theta_global /
    linear factor, sliding layers with theta_local unscaled. Both freq
    tables are built from STATIC constants; `alt` (a traced scalar, != 0
    on local-rope layers) just selects — so one compiled program serves
    every layer, matching the repo's static-rope-param design."""
    th, scale = decode_rope_param(theta)
    freq = jnp.where(j >= rotary_dim, 0.0,
                     jnp.exp(-jnp.log(th) * j / rotary_dim))
    if scale and scale[0] == "gemma3":
        _, factor, th_local = scale
        f_global = freq / factor
        if alt is None:
            return f_global
        f_local = jnp.where(j >= rotary_dim, 0.0,
                            jnp.exp(-jnp.log(th_local) * j / rotary_dim))
        return jnp.where(jnp.asarray(alt) != 0, f_local, f_global)
    return scale_inv_freq(freq, scale, j)


def _rope_angles(positions: jax.Array, head_dim: int, theta,
                 rotary_dim: int, alt=None) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for interleaved-pair RoPE.

    Pair p rotates elements (2p, 2p+1) of each head by pos * theta^(-2p/rotary_dim);
    pairs with 2p >= rotary_dim get frequency 0 (identity), implementing
    partial rotary dims (reference src/infer.cpp:200-213). `theta` may be
    the packed ModelConfig.rope_param tuple (see decode_rope_param).
    """
    half = head_dim // 2
    j = 2.0 * jnp.arange(half, dtype=jnp.float32)          # first-element index of each pair
    freq = rope_pair_freqs(theta, rotary_dim, j, alt)
    val = positions.astype(jnp.float32)[..., None] * freq  # (..., half)
    ms = rope_mscale(theta)
    return ms * jnp.cos(val), ms * jnp.sin(val)


def apply_rope(x: jax.Array, positions: jax.Array, theta,
               rotary_dim: int, alt=None) -> jax.Array:
    """Interleaved RoPE on x[..., n_heads, head_dim] at positions[...].

    positions broadcasts against x's leading axes (scalar for single-token
    decode, a vector for a prefill chunk). `theta` may be the packed
    ModelConfig.rope_param tuple (frequency scaling rides along).
    """
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    head_dim = x.shape[-1]
    cos, sin = _rope_angles(positions, head_dim, theta, rotary_dim, alt)
    cos = cos[..., None, :]  # broadcast over the heads axis
    sin = sin[..., None, :]
    xr = x.reshape(*x.shape[:-1], head_dim // 2, 2)
    x0, x1 = xr[..., 0], xr[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    return out.reshape(x.shape).astype(orig_dtype)


def rope_rotate_cached(k_rows: jax.Array, theta, rotary_dim: int,
                       n=1, alt=None) -> jax.Array:
    """Rotate cached sink-key rows forward by `n` positions (StreamingLLM).

    Sink slots stay physically frozen in the ring buffer but must remain a
    fixed *relative* distance from the current token (reference
    src/infer.cpp:303-317, arXiv:2309.17453). The reference mutates the
    stored keys by one position every step; here the rotation is LAZY —
    the cache keeps the keys as originally written and attention rotates a
    VIEW by the accumulated offset n = max(0, pos - window + 1). One big
    rotation instead of pos-window incremental ones is mathematically
    identical and numerically strictly better (no per-step requantization
    through the cache dtype — which matters once the cache is fp8).
    k_rows: [..., n_kv_heads, head_dim]; n: () scalar or python int.
    """
    pos = jnp.broadcast_to(jnp.asarray(n, jnp.float32), k_rows.shape[:-2])
    return apply_rope(k_rows, pos, rope_rotation_param(theta), rotary_dim,
                      alt)


def masked_softmax(scores: jax.Array, mask: jax.Array) -> jax.Array:
    """Softmax over the last axis with invalid slots masked out.

    The reference softmaxes over exactly [0, kv_len) (src/infer.cpp:170-185);
    under static shapes kv_len becomes this mask.
    """
    scores = jnp.where(mask, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m) * mask  # zero out masked lanes exactly
    return e / jnp.sum(e, axis=-1, keepdims=True)


def moe_gate(router_logits: jax.Array, n_active: int) -> tuple[jax.Array, jax.Array]:
    """Top-k routing with softmax over the selected experts.

    Returns (weights[..., n_active], indices[..., n_active]). Matches the
    reference's normalize-over-top-k formulation (src/infer.cpp:100-132):
    the softmax denominator only includes the chosen experts.
    """
    top_vals, top_idx = jax.lax.top_k(router_logits, n_active)
    m = jnp.max(router_logits, axis=-1, keepdims=True)  # global max for stability
    e = jnp.exp(top_vals - m)
    return e / jnp.sum(e, axis=-1, keepdims=True), top_idx


def gelu(x: jax.Array) -> jax.Array:
    """tanh-approx GELU, identical constants to reference src/infer.cpp:187-189."""
    return 0.5 * x * (1.0 + jnp.tanh(0.797885 * (x + 0.044715 * x * x * x)))


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def act_fn(name: str):
    return {"gelu": gelu, "silu": silu}[name]
