"""Independent token-at-a-time numpy simulator used as a second oracle.

This is a deliberately naive transliteration of the reference semantics
(src/infer.cpp:254-524): explicit loops, one token per call, mutable f16 KV
ring buffer with attention-sink rotation. It shares no code with yalm_tpu's
jnp model, so agreement between the two is strong evidence both are right.
"""

from __future__ import annotations

import math

import numpy as np

from yalm_tpu.config import KV_SINKS, ModelConfig

F16 = np.float16


def rmsnorm(x, w, eps):
    ms = np.mean(x.astype(np.float64) ** 2)
    return (x / np.sqrt(ms + eps) * w).astype(np.float32)


def rope(vec, head_dim, pos, theta, rotary_dim):
    """In-place interleaved RoPE on a flat (n*head_dim,) vector."""
    out = vec.copy()
    d = vec.shape[0]
    for i in range(0, d, 2):
        j_head = i % head_dim
        freq = 0.0 if j_head >= rotary_dim else 1.0 / (theta ** (j_head / rotary_dim))
        val = pos * freq
        fcr, fci = math.cos(val), math.sin(val)
        v0, v1 = vec[i], vec[i + 1]
        out[i] = v0 * fcr - v1 * fci
        out[i + 1] = v0 * fci + v1 * fcr
    return out


def softmax(x):
    e = np.exp(x - np.max(x))
    return e / e.sum()


def gelu(x):
    return 0.5 * x * (1.0 + np.tanh(0.797885 * (x + 0.044715 * x * x * x)))


def silu(x):
    return x / (1.0 + np.exp(-x))


class NumpySim:
    """Token-at-a-time forward with mutable state, mirroring the reference."""

    def __init__(self, cfg: ModelConfig, tensors: dict[str, np.ndarray]):
        self.cfg = cfg
        self.t = {k: np.asarray(v, dtype=np.float32) if v.dtype != np.uint8 else v
                  for k, v in tensors.items()}
        L = cfg.max_seq_len
        self.kcache = [np.zeros((L, cfg.kv_dim), F16) for _ in range(cfg.n_layers)]
        self.vcache = [np.zeros((L, cfg.kv_dim), F16) for _ in range(cfg.n_layers)]

    def forward(self, token: int, pos: int) -> np.ndarray:
        cfg = self.cfg
        L = cfg.max_seq_len
        x = self.t["model.embed.weight"][token].astype(np.float32).copy()

        kv_sink = KV_SINKS if pos >= L else 0
        kv_pos = kv_sink + (pos - kv_sink) % (L - kv_sink)
        kv_len = min(pos + 1, L)

        for l in range(cfg.n_layers):
            p = f"model.layers.{l}"
            xb = rmsnorm(x, self.t[f"{p}.attn.norm.weight"], cfg.norm_eps)
            qv = self.t[f"{p}.attn.wq.weight"] @ xb
            kv = self.t[f"{p}.attn.wk.weight"] @ xb
            vv = self.t[f"{p}.attn.wv.weight"] @ xb
            if math.isfinite(cfg.qkv_clip):
                qv = np.clip(qv, -cfg.qkv_clip, cfg.qkv_clip)
                kv = np.clip(kv, -cfg.qkv_clip, cfg.qkv_clip)
                vv = np.clip(vv, -cfg.qkv_clip, cfg.qkv_clip)
            qv = rope(qv, cfg.head_dim, pos, cfg.rope_theta, cfg.rotary_dim)
            kv = rope(kv, cfg.head_dim, pos, cfg.rope_theta, cfg.rotary_dim)

            kb, vb = self.kcache[l], self.vcache[l]
            kb[kv_pos] = kv.astype(F16)
            vb[kv_pos] = vv.astype(F16)
            # lazy sink rotation: the cache keeps sink keys as written;
            # attention sees a VIEW rotated by the accumulated offset
            # max(0, pos - L + 1) — same total rotation as the reference's
            # per-step mutation (src/infer.cpp:303-317), applied once
            kb = kb.copy()
            rot = max(0, pos - L + 1)
            for r in range(kv_sink):
                row = kb[r].astype(np.float32)
                kb[r] = rope(row, cfg.head_dim, rot, cfg.rope_theta,
                             cfg.rotary_dim).astype(F16)

            qpk = cfg.n_heads // cfg.n_kv_heads
            out = np.zeros(cfg.q_dim, np.float32)
            for h in range(cfg.n_heads):
                off = (h // qpk) * cfg.head_dim
                qh = qv[h * cfg.head_dim:(h + 1) * cfg.head_dim]
                scores = np.zeros(kv_len, np.float32)
                for tt in range(kv_len):
                    kh = kb[tt, off:off + cfg.head_dim].astype(np.float32)
                    scores[tt] = qh @ kh / math.sqrt(cfg.head_dim)
                att = softmax(scores)
                for tt in range(kv_len):
                    vh = vb[tt, off:off + cfg.head_dim].astype(np.float32)
                    out[h * cfg.head_dim:(h + 1) * cfg.head_dim] += att[tt] * vh

            x = x + self.t[f"{p}.attn.wo.weight"] @ out

            xb = rmsnorm(x, self.t[f"{p}.mlp.norm.weight"], cfg.norm_eps)
            act = gelu if cfg.act_type == "gelu" else silu
            if cfg.is_moe:
                router = self.t[f"{p}.moegate.weight"] @ xb
                order = np.argsort(-router, kind="stable")[:cfg.n_experts_active]
                e = np.exp(router[order] - router.max())
                wts = e / e.sum()
                for k, eidx in enumerate(order):
                    h1 = self.t[f"{p}.mlp.w1.weight"][eidx] @ xb
                    h3 = self.t[f"{p}.mlp.w3.weight"][eidx] @ xb
                    x = x + wts[k] * (self.t[f"{p}.mlp.w2.weight"][eidx] @ (act(h1) * h3))
            else:
                h1 = self.t[f"{p}.mlp.w1.weight"] @ xb
                h3 = self.t[f"{p}.mlp.w3.weight"] @ xb
                x = x + self.t[f"{p}.mlp.w2.weight"] @ (act(h1) * h3)

        x = rmsnorm(x, self.t["model.norm.weight"], cfg.norm_eps)
        wcls = self.t.get("model.output.weight", self.t["model.embed.weight"])
        return wcls @ x
