"""Byte codec for KV page payloads (HiCache host tiers, PD transports).

MHA split pools ship pages as a typed [K, L, 2, ps, ...] array; pools
with HETEROGENEOUS per-layer components — MLA latent (+ optional DSA
index cache, a different trailing dim) — can't stack into one typed
array. This codec flattens each component's page slice to bytes and
concatenates per layer: payload [K, L, page_bytes] uint8, identical on
the wire (PD ZMQ chunks, ref srt/disaggregation/mooncake/conn.py ships
raw latent bytes the same way) and in host arenas (HiCache,
ref srt/mem_cache/memory_pool_host.py MLA host mirror).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PageCodec:
    """Derives component layout from a pool's per-layer entries.

    `layer_ids` restricts the codec to a subset of layers (hybrid-SWA
    models: full-attention layers ship with the request's main pages,
    sliding layers with its swa_pages — two codecs, two page-id spaces).
    """

    def __init__(self, kv_pool, layer_ids=None):
        self.kv_pool = kv_pool
        self.layer_ids = (list(layer_ids) if layer_ids is not None
                          else list(range(len(kv_pool.kv))))
        entry = kv_pool.kv[self.layer_ids[0]]
        # components = the non-None arrays of a layer entry
        self.n_comps = sum(1 for a in entry if a is not None)
        if self.n_comps == 0:
            raise ValueError("pool has no device components (hisparse?)")
        self.comp_shapes: List[Tuple[int, ...]] = []
        self.comp_dtypes = []
        self.comp_bytes: List[int] = []
        for a in entry:
            if a is None:
                continue
            shape = tuple(a.shape[1:])  # one page slice
            dt = np.dtype(a.dtype)
            self.comp_shapes.append(shape)
            self.comp_dtypes.append(dt)
            self.comp_bytes.append(int(np.prod(shape)) * dt.itemsize)
        self.page_bytes = int(sum(self.comp_bytes))
        self._gather = jax.jit(self._gather_impl)

    def _gather_impl(self, kv, pages):
        layers = [kv[i] for i in self.layer_ids]
        outs = []
        for c in range(len(layers[0])):
            if layers[0][c] is None:
                continue
            outs.append(jnp.stack([layer[c][pages] for layer in layers],
                                  axis=1))
        return tuple(outs)  # each [K, L', ps, ...]

    def gather_bytes(self, kv, pages) -> np.ndarray:
        """Device pages -> [K, L, page_bytes] uint8."""
        staged = self._gather(kv, jnp.asarray(pages, jnp.int32))
        K = len(pages)
        L = len(self.layer_ids)
        parts = [
            np.ascontiguousarray(np.asarray(a)).view(np.uint8).reshape(
                K, L, -1
            )
            for a in staged
        ]
        return np.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

    def split_bytes(self, arr: np.ndarray) -> List[np.ndarray]:
        """[K, L, page_bytes] uint8 -> typed component arrays
        [K, L, *comp_shape]."""
        K, L = arr.shape[0], arr.shape[1]
        out = []
        off = 0
        for shape, dt, nb in zip(self.comp_shapes, self.comp_dtypes,
                                 self.comp_bytes):
            chunk = np.ascontiguousarray(arr[:, :, off:off + nb])
            out.append(chunk.view(dt).reshape((K, L) + shape))
            off += nb
        return out

    def scatter_bytes(self, kv, arr: np.ndarray, dst_pages) -> tuple:
        """Copy payload pages into `dst_pages` of the pool (in place via
        the Pallas page-copy kernel); returns the new kv tuple."""
        from sglang_tpu.mem.hicache import copy_pages

        comps = self.split_bytes(arr)
        K = arr.shape[0]
        pairs = np.empty(2 * K, np.int32)
        pairs[0::2] = np.arange(K)
        pairs[1::2] = np.asarray(dst_pages[:K], np.int32)
        jp = jnp.asarray(pairs)
        kv = [list(layer) for layer in kv]
        for li, l in enumerate(self.layer_ids):
            ci = 0
            for c in range(len(kv[l])):
                if kv[l][c] is None:
                    continue
                kv[l][c] = copy_pages(
                    kv[l][c], jnp.asarray(comps[ci][:, li]), jp, n=K
                )
                ci += 1
        return tuple(tuple(layer) for layer in kv)
