"""Paged KV cache pool on device.

Ref: srt/mem_cache/memory_pool.py (KVCache ABC :1609, MHATokenToKVPool
:1740). TPU-native design:

- ONE stacked jax.Array `kv[num_layers, 2, num_slots, kv_heads, head_dim]`
  (num_slots = num_pages * page_size) instead of per-layer torch tensors.
  The whole pool is threaded through the jitted step function with donation,
  so XLA performs in-place scatter updates — the JAX equivalent of torch
  in-place writes that is safe under jit.
- Sharded over the "tp" mesh axis on the kv_heads dim; with GQA smaller
  than tp the heads are replicated.
- Page granularity lives in the ALLOCATOR; the array itself is token-slot
  addressed so kernels can use either token-level scatter or page-level DMA
  (a page is a contiguous slot range: slot = page * page_size + offset).

Slot 0 is reserved as the padding/trash slot (never allocated) so padded
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
        spec = P(None, None, None, AXIS_TP if shard_heads else None, None)
        shape = (
            config.num_layers,
            2,
            config.num_slots,
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
) -> jax.Array:
    """Scatter new K/V ([T, kv_heads, head_dim]) into token slots.

    Under donation this lowers to an in-place dynamic-update-scatter.
    """
    kv = kv.at[layer_id, 0, out_cache_loc].set(k.astype(kv.dtype))
    kv = kv.at[layer_id, 1, out_cache_loc].set(v.astype(kv.dtype))
    return kv
