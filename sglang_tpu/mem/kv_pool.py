"""Paged KV cache pool on device.

Ref: srt/mem_cache/memory_pool.py (KVCache ABC :1609, MHATokenToKVPool
:1740). TPU-native design:

- ONE stacked jax.Array `kv[num_layers, num_pages, 2, page_size, kv_heads,
  head_dim]` instead of per-layer torch tensors. K and V of a page are
  ADJACENT so the attention kernels fetch both with a single DMA per page
  (DMA latency, not bandwidth, bounds decode through this device path).
  The whole pool is threaded through the jitted step function with
  donation, so XLA performs in-place scatter updates — the JAX equivalent
  of torch in-place writes that is safe under jit.
- Sharded over the "tp" mesh axis on the kv_heads dim; with GQA smaller
  than tp the heads are replicated.
- Page granularity lives in the ALLOCATOR; kernels address pages, scatter
  writes address token slots (slot = page * page_size + offset).

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

    @property
    def num_slots(self) -> int:
        return self.num_pages * self.page_size

    def bytes_total(self) -> int:
        import numpy as np

        return (
            self.num_layers
            * 2
            * self.num_slots
            * self.num_kv_heads
            * self.head_dim
            * np.dtype(self.dtype).itemsize
        )


class KVCachePool:
    """Owns the device array + host-side page free list."""

    def __init__(self, config: KVPoolConfig, mesh_ctx: Optional[MeshContext] = None):
        self.config = config
        shard_heads = (
            mesh_ctx is not None
            and mesh_ctx.tp_size > 1
            and config.num_kv_heads % mesh_ctx.tp_size == 0
        )
        spec = P(None, None, None, None, AXIS_TP if shard_heads else None, None)
        shape = (
            config.num_layers,
            config.num_pages,
            2,
            config.page_size,
            config.num_kv_heads,
            config.head_dim,
        )
        if mesh_ctx is not None:
            sharding = NamedSharding(mesh_ctx.mesh, spec)
            self.kv = jax.jit(
                lambda: jnp.zeros(shape, config.dtype), out_shardings=sharding
            )()
        else:
            self.kv = jnp.zeros(shape, config.dtype)
        self.sharding = self.kv.sharding

    def swap(self, new_kv: jax.Array) -> None:
        """Install the pool returned by a donated jit step."""
        self.kv = new_kv


def write_kv(
    kv: jax.Array,
    layer_id: int,
    k: jax.Array,
    v: jax.Array,
    out_cache_loc: jax.Array,
    page_size: int,
) -> jax.Array:
    """Scatter new K/V ([T, kv_heads, head_dim]) into token slots.

    Under donation this lowers to an in-place dynamic-update-scatter.
    """
    pages = out_cache_loc // page_size
    offs = out_cache_loc % page_size
    kv = kv.at[layer_id, pages, 0, offs].set(k.astype(kv.dtype))
    kv = kv.at[layer_id, pages, 1, offs].set(v.astype(kv.dtype))
    return kv
