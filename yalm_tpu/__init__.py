"""yalm_tpu: a TPU-native LLM inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of yalm
(an educational single-GPU C++/CUDA inference engine), extended with
multi-device sharding, continuous batching, and real FP8 weight-only
inference. See SURVEY.md at the repo root for the full blueprint.
"""

from .config import KV_SINKS, ModelConfig

__version__ = "0.1.0"

__all__ = ["ModelConfig", "KV_SINKS", "__version__"]
