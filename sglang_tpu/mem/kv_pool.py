"""Paged KV cache pool on device.

Ref: srt/mem_cache/memory_pool.py (KVCache ABC :1609, MHATokenToKVPool
:1740). TPU-native design:

- A TUPLE of per-layer jax.Arrays `[num_pages, page_size, 2, nk*hd]`
  ("pair layout": a token's K and V are adjacent sublanes, so the
  Pallas write kernel scatters one [2, F] DMA per token in place, and the
  attention kernels fetch K+V of a page with one [ps, 2, F] DMA).
  Per-layer arrays (not one stacked array) let each layer's write alias
  the pool in/out through pallas without slicing a donated superbuffer.
- The whole tuple is threaded through the jitted step with donation, so
  updates are in-place — the JAX equivalent of torch in-place writes that
  is safe under jit.
- Sharded over the "tp" mesh axis on the folded head dim (F = nk*hd).
- Page granularity lives in the ALLOCATOR; kernels address pages, writes
  address token slots (slot = page * page_size + offset).

Page 0 is reserved as the padding/trash page (never allocated) so padded
tokens can scatter their KV harmlessly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sglang_tpu.parallel.mesh import AXIS_TP, MeshContext


@dataclasses.dataclass
class KVPoolConfig:
    num_layers: int
    num_kv_heads: int
    head_dim: int
    page_size: int
    num_pages: int
    dtype: jnp.dtype
    # Hybrid SWA pool (ref srt/mem_cache/memory_pool.py SWAKVPool +
    # allocator/swa.py): sliding-window layers get their own, much smaller
    # page pool — out-of-window KV is freed instead of held forever.
    # layer_windows[i] > 0 marks layer i as sliding; swa_num_pages sizes
    # the shared SWA pool (0 = no hybrid pool, all layers full-size).
    layer_windows: Tuple[int, ...] = ()
    swa_num_pages: int = 0

    def layer_num_pages(self, layer_id: int) -> int:
        if (
            self.swa_num_pages
            and layer_id < len(self.layer_windows)
            and self.layer_windows[layer_id] > 0
        ):
            return self.swa_num_pages
        return self.num_pages

    @property
    def num_slots(self) -> int:
        return self.num_pages * self.page_size

    @property
    def folded_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    def bytes_total(self) -> int:
        import numpy as np

        page_bytes = (
            2 * self.page_size * self.folded_dim * np.dtype(self.dtype).itemsize
        )
        return sum(
            self.layer_num_pages(l) * page_bytes
            for l in range(self.num_layers)
        )


class KVCachePool:
    """Owns the per-layer device arrays + host-side page bookkeeping."""

    def __init__(self, config: KVPoolConfig, mesh_ctx: Optional[MeshContext] = None):
        self.config = config
        shard_heads = (
            mesh_ctx is not None
            and mesh_ctx.tp_size > 1
            and config.num_kv_heads % mesh_ctx.tp_size == 0
        )
        spec = P(None, None, None, AXIS_TP if shard_heads else None)
        self.layer_spec = spec
        shapes = [
            (
                config.layer_num_pages(l),
                config.page_size,
                2,
                config.folded_dim,
            )
            for l in range(config.num_layers)
        ]

        def alloc():
            return tuple(jnp.zeros(s, config.dtype) for s in shapes)

        if mesh_ctx is not None:
            sharding = NamedSharding(mesh_ctx.mesh, spec)
            self.kv = jax.jit(
                alloc,
                out_shardings=tuple(
                    sharding for _ in range(config.num_layers)
                ),
            )()
        else:
            self.kv = alloc()

    def swap(self, new_kv) -> None:
        """Install the pool returned by a donated jit step."""
        self.kv = new_kv


def write_kv_xla(
    kv_layer: jax.Array,  # [NP, ps, 2, F]
    k: jax.Array,  # [T, nk, hd]
    v: jax.Array,
    out_cache_loc: jax.Array,
    page_size: int,
) -> jax.Array:
    """XLA-scatter fallback (CPU tests; TPU uses the Pallas write kernel)."""
    T = k.shape[0]
    rows = jnp.stack([k.reshape(T, -1), v.reshape(T, -1)], axis=1)
    pages = out_cache_loc // page_size
    offs = out_cache_loc % page_size
    return kv_layer.at[pages, offs].set(rows.astype(kv_layer.dtype))
