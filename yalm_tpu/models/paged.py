"""Paged KV cache: block-granular slot sharing for the batching scheduler.

The plain batched cache gives every lane a full (n_layers, window, Hk, D)
allocation whether it holds 10 tokens or 4096 — at batch 16 and a 4k window
that is more HBM than the 7B weights themselves. Here the cache is a POOL
of pages, each holding ALL layers' k/v for one `page_size`-token block of
one lane:

    pool.k, pool.v : (n_pages, n_layers, page_size, Hk, D)

and a per-lane page table maps block index -> page id. Lanes allocate pages
lazily as their position crosses block boundaries and return them when the
request completes, so total cache HBM scales with TOKENS IN FLIGHT, not
lanes x window — the vLLM-style occupancy model (no reference counterpart;
the reference is single-stream with one static cache, src/main.cpp:102-112).

The page table rides the scalar-prefetch channel into the paged attention
kernel (ops/pallas/attention.py `attend_step_paged_l`): block fetches and
the kv-row/sink writes go through `pool.at[page, layer, ...]` instead of a
per-lane base offset. Ring semantics are unchanged — a lane's logical slot
s lives at (page_table[s // page_size], s % page_size).

Admission keeps prefill single-page by capping each chunk at the next page
boundary (scheduler._advance_admission) — one dynamic_update_slice per
chunk, no straddles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig


class PagedKVPool(NamedTuple):
    k: jax.Array   # (n_pages, n_layers, page_size, n_kv_heads, head_dim)
    v: jax.Array   # same

    @classmethod
    def init(cls, cfg: ModelConfig, dtype, n_pages: int,
             page_size: int = 256) -> "PagedKVPool":
        shape = (n_pages, cfg.n_layers, page_size, cfg.n_kv_heads,
                 cfg.head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


class PageAllocator:
    """Host-side free-list of pool pages + per-lane tables.

    Page 0 is reserved as the write sink for inactive lanes (their masked
    tick writes must land somewhere harmless); real allocations start at 1.
    """

    def __init__(self, cfg: ModelConfig, n_pages: int, batch: int,
                 page_size: int = 256):
        if cfg.max_seq_len % page_size:
            raise ValueError(f"page_size {page_size} must divide window "
                             f"{cfg.max_seq_len}")
        self.page_size = page_size
        self.blocks_per_lane = cfg.max_seq_len // page_size
        self.n_pages = n_pages
        self.free: list[int] = list(range(n_pages - 1, 0, -1))  # 0 reserved
        # -1 = unmapped; table[b, blk] = page id
        self.tables = np.zeros((batch, self.blocks_per_lane), np.int32)

    @property
    def n_free(self) -> int:
        return len(self.free)

    def pages_for(self, kv_len: int) -> int:
        return -(-max(kv_len, 0) // self.page_size)

    def can_grow(self, lane: int, target_len: int) -> bool:
        have = self._mapped(lane)
        return self.pages_for(target_len) - have <= len(self.free)

    def _mapped(self, lane: int) -> int:
        return int((self.tables[lane] != 0).sum())

    def grow(self, lane: int, target_len: int) -> None:
        """Map pages so the lane can hold target_len tokens. Raises if the
        pool is exhausted — callers must check can_grow first."""
        need = self.pages_for(target_len)
        have = self._mapped(lane)
        for blk in range(have, need):
            if not self.free:
                raise RuntimeError("page pool exhausted")
            self.tables[lane, blk] = self.free.pop()

    def release(self, lane: int) -> None:
        for blk in range(self.blocks_per_lane):
            pid = int(self.tables[lane, blk])
            if pid != 0:
                self.free.append(pid)
                self.tables[lane, blk] = 0

    def table_array(self) -> np.ndarray:
        """(batch, blocks_per_lane) int32 — unmapped blocks point at the
        reserved page 0 (never attended: kv_len masks them out)."""
        return self.tables.copy()

    @property
    def lane_capacity(self) -> int:
        """Max pages one lane can ever hold (pool minus the reserved 0)."""
        return self.n_pages - 1

    def same_pool(self, a: int, b: int) -> bool:
        return True


class GroupedPageAllocator:
    """Per-dp-group allocators for the MESH paged scheduler: the pool's
    page axis shards over `dp`, so each group of batch/dp lanes allocates
    GROUP-LOCAL page ids out of its own pool shard (parallel/fast_tp.py
    paged factories). Same interface as PageAllocator; lanes are global
    indices, internally routed to (group, local lane)."""

    def __init__(self, cfg: ModelConfig, n_pages: int, batch: int,
                 page_size: int = 256, groups: int = 1):
        if n_pages % groups or batch % groups:
            raise ValueError(f"pages {n_pages} and batch {batch} must "
                             f"divide over {groups} dp groups")
        self.page_size = page_size
        self.n_pages = n_pages
        self.groups = [PageAllocator(cfg, n_pages // groups, batch // groups,
                                     page_size) for _ in range(groups)]
        self.lanes_per_group = batch // groups
        self.blocks_per_lane = self.groups[0].blocks_per_lane

    def _route(self, lane: int):
        return (self.groups[lane // self.lanes_per_group],
                lane % self.lanes_per_group)

    @property
    def n_free(self) -> int:
        return sum(g.n_free for g in self.groups)

    @property
    def lane_capacity(self) -> int:
        return self.groups[0].n_pages - 1

    @property
    def tables(self) -> np.ndarray:
        return np.concatenate([g.tables for g in self.groups])

    def pages_for(self, kv_len: int) -> int:
        return self.groups[0].pages_for(kv_len)

    def can_grow(self, lane: int, target_len: int) -> bool:
        g, ll = self._route(lane)
        return g.can_grow(ll, target_len)

    def grow(self, lane: int, target_len: int) -> None:
        g, ll = self._route(lane)
        g.grow(ll, target_len)

    def release(self, lane: int) -> None:
        g, ll = self._route(lane)
        g.release(ll)

    def same_pool(self, a: int, b: int) -> bool:
        """Preemption only helps when the victim's pages come from the SAME
        group's pool shard."""
        return a // self.lanes_per_group == b // self.lanes_per_group

    def table_array(self) -> np.ndarray:
        return self.tables
