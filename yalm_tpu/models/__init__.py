from .cache import KVCache
from .weights import LayerWeights, Weights, load_weights
from .transformer import decode_step, prefill

__all__ = ["KVCache", "LayerWeights", "Weights", "load_weights", "decode_step", "prefill"]
