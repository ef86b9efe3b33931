"""Device mesh construction.

The reference has no distributed layer at all (single GPU, SURVEY.md §2.6);
this module is its TPU-native replacement: a named `jax.sharding.Mesh` over
up to three axes —

  dp : data/batch parallelism (continuous-batching request dimension)
  ep : expert parallelism (Mixtral experts spread across hosts, rides DCN)
  tp : tensor parallelism (attention heads / FFN hidden dim, rides ICI)

NamedSharding over this mesh is what turns into XLA collectives; there are
no explicit NCCL-style calls anywhere. Axis order puts `tp` innermost so its
collectives map onto the fastest (ICI-adjacent) device dimension.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    ep: int = 1
    tp: int = 1

    @property
    def n_devices(self) -> int:
        return self.dp * self.ep * self.tp


AXES = ("dp", "ep", "tp")


def make_mesh(mcfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a ('dp','ep','tp') mesh.

    With no MeshConfig, all available devices go to `tp`. `devices` defaults
    to jax.devices(); pass an explicit list to subset or reorder (e.g. the 8
    virtual CPU devices in tests).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if mcfg is None:
        mcfg = MeshConfig(tp=len(devices))
    if mcfg.n_devices != len(devices):
        raise ValueError(f"mesh {mcfg} wants {mcfg.n_devices} devices, have {len(devices)}")
    arr = np.asarray(devices).reshape(mcfg.dp, mcfg.ep, mcfg.tp)
    return Mesh(arr, AXES)


def validate_divisibility(cfg, mcfg: MeshConfig) -> None:
    """Fail fast on shardings that cannot divide the model dims."""
    if cfg.n_kv_heads % mcfg.tp and mcfg.tp % cfg.n_kv_heads:
        raise ValueError(f"tp={mcfg.tp} incompatible with n_kv_heads={cfg.n_kv_heads}")
    if cfg.hidden_dim % mcfg.tp:
        raise ValueError(f"tp={mcfg.tp} must divide hidden_dim={cfg.hidden_dim}")
    if cfg.is_moe and cfg.n_experts % mcfg.ep:
        raise ValueError(f"ep={mcfg.ep} must divide n_experts={cfg.n_experts}")
    if not cfg.is_moe and mcfg.ep != 1:
        raise ValueError("ep > 1 requires an MoE model")
