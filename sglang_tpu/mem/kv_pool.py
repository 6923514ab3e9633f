"""Paged KV cache pool on device.

Ref: srt/mem_cache/memory_pool.py (KVCache ABC :1609, MHATokenToKVPool
:1740). TPU-native design (round-2 "split pool" layout):

- Each layer owns a PAIR of jax.Arrays (k, v), each shaped
  `[num_pages, page_size, 2, F/2]` where F = nk*hd (folded heads). The
  trailing `(2, F/2)` split of a token's row exists ONLY to give the
  Pallas write kernel a tile-legal DMA unit (Mosaic rejects single-sublane
  bf16 copies; a [2, F/2] unit is one physical sublane-pair, like the old
  pair layout's [2, F]). Attention gathers read through a FREE flat
  reshape `[NP, ps, F]`.
- Why split K and V into separate arrays: the round-1 pair layout
  ([NP, ps, 2, F], K/V interleaved per token) forced XLA to materialize a
  strided extraction copy of every gathered byte before the attention
  einsums — measured 42 GB/s effective vs 80 GB/s for split pools on v5e
  (1.9x on the whole decode step). With split pools each gathered byte is
  consumed by exactly one einsum (K by scores, V by output) with no
  relayout.
- The whole structure is threaded through the jitted step with donation,
  so updates are in-place — the JAX equivalent of torch in-place writes
  that is safe under jit.
- Sharded over the "tp" mesh axis on the trailing F/2 dim. Globally the
  (2, F/2) split of the head dim is an identity reshape, so blocked-head
  consumers (see xla_backend) shard cleanly.
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
    # MLA latent pool (ref srt/mem_cache/memory_pool.py MLATokenToKVPool
    # :3910): instead of per-head K/V, each token caches ONE row of
    # mla_dim = kv_lora_rank + qk_rope_head_dim (the normed latent plus the
    # roped shared k_pe). The per-layer entry is then (latent, None) — a
    # single array [NP, ps, 2, mla_dim/2] — and attention runs MQA-style
    # over it (models/deepseek_v2.py absorbed path). ~8x less KV than the
    # naive decompressed form for DeepSeek-V2/V3.
    mla_dim: int = 0
    # DSA index-K cache (ref srt/layers/attention/dsa/ + DeepSeek V3.2
    # index_head_dim): per-layer bf16 pool [NP, ps, 2, d/2] riding the
    # SECOND slot of the MLA layer tuple — same pages/page table as the
    # latent pool, so allocation/radix/eviction need no changes.
    dsa_index_dim: int = 0
    # fp8 KV quantization (ref --kv-cache-dtype fp8_e5m2|fp8_e4m3,
    # srt/layers/quantization/kv_cache.py). When set, per-layer arrays are
    # int32-packed f8 rows `[NP, ps, F/4]` (ops/quant_kv.py for the byte
    # layout and why int32 transport); `dtype` above is then the COMPUTE
    # dtype attention dequantizes into, not the storage dtype.
    quant: Optional[str] = None  # "fp8_e5m2" | "fp8_e4m3"
    # NATIVE f8 storage (SGLANG_TPU_F8_NATIVE=1): pool arrays keep the
    # bf16 layout [NP, ps, 2, F/2] but with a float8 element type, and the
    # XLA backend reads them with a plain gather + convert — no int32
    # bitcast unpack (whose XLA lowering costs ~52ms/step at 1B bs=256:
    # 25.9ms relayout copies + 13.5ms broadcast + 13.3ms f8
    # materialization, PERF_NOTES.md). Pallas kernels cannot DMA sub-int32
    # pools, so this mode forces the xla_native backend.
    quant_native: bool = False
    # HiSparse (mem/hisparse.py): the MLA latent pool lives on HOST; the
    # device allocates only the DSA index pool (latent entries are None).
    hisparse: bool = False

    def layer_num_pages(self, layer_id: int) -> int:
        if (
            self.swa_num_pages
            and layer_id < len(self.layer_windows)
            and self.layer_windows[layer_id] > 0
        ):
            return self.swa_num_pages
        return self.num_pages

    @property
    def storage_dtype(self):
        """Device array dtype (int32 transport when quantized)."""
        if self.quant:
            if self.quant_native:
                from sglang_tpu.ops.quant_kv import F8_DTYPES

                return F8_DTYPES[self.quant]
            return jnp.int32
        return self.dtype

    @property
    def num_slots(self) -> int:
        return self.num_pages * self.page_size

    @property
    def folded_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def half_dim(self) -> int:
        """Lanes of the write-legal (2, F/2) row split."""
        f = self.mla_dim or self.folded_dim
        assert f % 2 == 0
        return f // 2

    def bytes_total(self) -> int:
        import numpy as np

        itemsize = 1 if self.quant else np.dtype(self.dtype).itemsize
        if self.mla_dim:
            page_bytes = self.page_size * self.mla_dim * itemsize
            if self.hisparse:
                page_bytes = 0  # latent rows live host-side
            if self.dsa_index_dim:
                page_bytes += (
                    self.page_size * self.dsa_index_dim
                    * np.dtype(self.dtype).itemsize
                )
        else:
            page_bytes = 2 * self.page_size * self.folded_dim * itemsize
        return sum(
            self.layer_num_pages(l) * page_bytes
            for l in range(self.num_layers)
        )


def kv_flat(arr: jax.Array) -> jax.Array:
    """[NP, ps, 2, F/2] -> [NP, ps, F] free reshape for gather consumers."""
    np_, ps, two, fh = arr.shape
    return arr.reshape(np_, ps, two * fh)


class KVCachePool:
    """Owns the per-layer (k, v) device arrays + host-side bookkeeping.

    `self.kv` is a tuple over layers of (k, v) pairs."""

    def __init__(self, config: KVPoolConfig,
                 mesh_ctx: Optional[MeshContext] = None,
                 dcp_shard: bool = False):
        self.config = config
        self.dcp_shard = dcp_shard
        # Blocked-halved head sharding (see pallas_backend docstring): the
        # trailing F/2 dim shards cleanly onto head boundaries only when
        # nk % (2*tp) == 0; otherwise replicate (correct, costs memory).
        shard_heads = (
            mesh_ctx is not None
            and mesh_ctx.tp_size > 1
            and not dcp_shard
            and not config.mla_dim  # latent rows are shared across heads
            and config.num_kv_heads % (2 * mesh_ctx.tp_size) == 0
        )
        if config.quant and not config.quant_native:
            # int32-packed f8 rows: [NP, ps, F/4] (ops/quant_kv.py). No head
            # sharding yet in quant mode — replicate (correct, costs memory).
            shard_heads = False
        if dcp_shard:
            # DCP memory sharding (ref srt/layers/dcp/planner.py): the
            # PAGE dim distributes over the mesh axis — per-device pool
            # bytes divide by tp. Requires the owner-aligned
            # DcpPageAllocator so shard s's decode attention reads only
            # local pages; writes/extend-gathers outside the shard_map go
            # through GSPMD's distributed scatter/gather.
            assert config.num_pages % max(mesh_ctx.tp_size, 1) == 0
            assert not config.swa_num_pages
            spec = P(AXIS_TP, None, None, None)
        else:
            spec = P(None, None, None, AXIS_TP if shard_heads else None)
        self.layer_spec = spec
        if config.quant and not config.quant_native:
            lanes = (config.mla_dim or config.folded_dim) // 4
            shapes = [
                (config.layer_num_pages(l), config.page_size, lanes)
                for l in range(config.num_layers)
            ]
            store_dtype = jnp.int32
            spec = (P(AXIS_TP, None, None) if dcp_shard
                    else P(None, None, None))
            self.layer_spec = spec
        else:
            fh = config.half_dim
            shapes = [
                (config.layer_num_pages(l), config.page_size, 2, fh)
                for l in range(config.num_layers)
            ]
            store_dtype = config.storage_dtype  # f8 when quant_native

        mla = bool(config.mla_dim)
        idx_shape = None
        if mla and config.dsa_index_dim:
            # Index-K cache (always the model compute dtype, never fp8):
            # same page geometry as the latent pool.
            idx_shape = (
                config.num_pages, config.page_size, 2,
                config.dsa_index_dim // 2,
            )

        def alloc():
            if mla:
                return tuple(
                    (
                        None if config.hisparse
                        else jnp.zeros(s, store_dtype),
                        jnp.zeros(idx_shape, config.dtype)
                        if idx_shape else None,
                    )
                    for s in shapes
                )
            return tuple(
                (jnp.zeros(s, store_dtype), jnp.zeros(s, store_dtype))
                for s in shapes
            )

        if mesh_ctx is not None:
            sharding = NamedSharding(mesh_ctx.mesh, spec)
            if mla:
                idx_sharding = (
                    NamedSharding(mesh_ctx.mesh, P(None, None, None, None))
                    if idx_shape else None
                )
                per_layer = (None if config.hisparse else sharding,
                             idx_sharding)
            else:
                per_layer = (sharding, sharding)
            self.kv = jax.jit(
                alloc,
                out_shardings=tuple(
                    per_layer for _ in range(config.num_layers)
                ),
            )()
        else:
            self.kv = alloc()

    def swap(self, new_kv) -> None:
        """Install the pool returned by a donated jit step."""
        self.kv = new_kv


class HybridStatePool:
    """Hybrid attention+SSM pool (ref srt/mem_cache/memory_pool.py
    HybridLinearKVPool:3555 + models like Jamba/NemotronH): layout[i] is
    None for ATTENTION layers (a paged split (k, v) pair, same layout as
    KVCachePool) or a tuple of recurrent-state shapes (slot-indexed
    arrays, same as RecurrentStatePool). The paged machinery addresses
    only the attention layers; SSM layers ride fb.state_slots."""

    def __init__(self, config: KVPoolConfig, layout):
        self.config = config
        assert config.quant is None, "hybrid pools: fp8 KV unsupported yet"
        assert not config.swa_num_pages
        fh = config.half_dim
        shape = (config.num_pages, config.page_size, 2, fh)
        kv = []
        for ly in layout:
            if ly is None:
                kv.append((jnp.zeros(shape, config.dtype),
                           jnp.zeros(shape, config.dtype)))
            else:
                kv.append(tuple(jnp.zeros(s, jnp.float32) for s in ly))
        self.kv = tuple(kv)

    def swap(self, new_kv) -> None:
        self.kv = new_kv


class StackedKVCachePool:
    """Layer-STACKED pool for pipeline parallelism: one (k, v) pair of
    [L, NP, ps, ...] arrays with the layer dim sharded over the "pp"
    mesh axis — stage s physically owns its layers' KV (true memory
    sharding, unlike a replicated per-layer tuple which GSPMD cannot
    place per-stage). Consumed by parallel/pipeline.PipelinedModel.

    self.kv = (k_stacked, v_stacked | None-for-MLA)."""

    def __init__(self, config: KVPoolConfig, mesh_ctx: MeshContext):
        from sglang_tpu.parallel.mesh import AXIS_PP

        self.config = config
        assert not config.swa_num_pages, "PP + hybrid SWA pools unsupported"
        assert mesh_ctx.pp_size > 1
        L = config.num_layers
        if config.quant:
            lanes = (config.mla_dim or config.folded_dim) // 4
            shape = (L, config.num_pages, config.page_size, lanes)
            store_dtype = jnp.int32
            spec = P(AXIS_PP, None, None, None)
        else:
            shape = (L, config.num_pages, config.page_size, 2,
                     config.half_dim)
            store_dtype = config.dtype
            spec = P(AXIS_PP, None, None, None, None)
        self.layer_spec = spec
        mla = bool(config.mla_dim)
        sharding = NamedSharding(mesh_ctx.mesh, spec)

        def alloc():
            k = jnp.zeros(shape, store_dtype)
            v = None if mla else jnp.zeros(shape, store_dtype)
            return (k, v)

        self.kv = jax.jit(
            alloc, out_shardings=(sharding, None if mla else sharding)
        )()

    def swap(self, new_kv) -> None:
        self.kv = new_kv


class RecurrentStatePool:
    """Slot-indexed recurrent state arrays for SSM/linear-attention models
    (ref srt/mem_cache/memory_pool.py MambaPool). Per layer: a tuple of
    state arrays shaped [num_slots+1, ...] (models/mamba.py
    state_shapes); updates ride the donated step jit like KV pools. The
    paged machinery still runs (the scheduler's bookkeeping is
    page-based) but addresses no real memory here."""

    def __init__(self, config: KVPoolConfig, state_shapes):
        self.config = config
        self.kv = tuple(
            tuple(jnp.zeros(s, jnp.float32) for s in shapes)
            for shapes in state_shapes
        )

    def swap(self, new_kv) -> None:
        self.kv = new_kv


def write_kv_xla(
    kv_layer: Tuple[jax.Array, jax.Array],  # ([NP, ps, 2, FH], same for v)
    k: jax.Array,  # [T, nk, hd]
    v: jax.Array,
    out_cache_loc: jax.Array,
    page_size: int,
) -> Tuple[jax.Array, jax.Array]:
    """XLA-scatter fallback (CPU tests; TPU uses the Pallas write kernel)."""
    kp, vp = kv_layer
    T = k.shape[0]
    fh = kp.shape[-1]
    pages = out_cache_loc // page_size
    offs = out_cache_loc % page_size
    krows = k.reshape(T, 2, fh).astype(kp.dtype)
    vrows = v.reshape(T, 2, fh).astype(vp.dtype)
    return (
        kp.at[pages, offs].set(krows),
        vp.at[pages, offs].set(vrows),
    )
