from .cache import KVCache
from .weights import LayerWeights, Weights, load_weights
from .transformer import decode_step, prefill
from .fast import (FastScales, FastWeights, decode_step_fast,
                   fast_supported, load_fast_weights, prefill_fast)
from .paged import PageAllocator, PagedKVPool

__all__ = ["KVCache", "LayerWeights", "Weights", "load_weights",
           "decode_step", "prefill", "FastScales", "FastWeights",
           "decode_step_fast", "fast_supported", "load_fast_weights",
           "prefill_fast", "PageAllocator", "PagedKVPool"]
