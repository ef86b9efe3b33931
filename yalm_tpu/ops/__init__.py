from .core import (
    act_fn,
    apply_rope,
    masked_softmax,
    moe_gate,
    rmsnorm,
    rope_rotate_cached,
)

__all__ = [
    "rmsnorm",
    "apply_rope",
    "rope_rotate_cached",
    "masked_softmax",
    "moe_gate",
    "act_fn",
]
