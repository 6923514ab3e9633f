"""Pallas ragged paged attention backend (TPU production path).

Wires sglang_tpu/ops/attention/pallas_kernels.py (attention) and
kv_write.py (in-place KV scatter) behind the backend registry. Under
tensor parallelism the kernels run inside jax.shard_map over the "tp"
mesh axis — each chip computes its local q/kv heads against its local KV
shard; no collectives are needed inside attention (heads are fully
parallel), matching the reference's per-rank attention execution
(srt/layers/attention/flashinfer_backend.py) the TPU-native way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.ops.attention.base import AttentionBackend, register_attention_backend
from sglang_tpu.ops.attention.kv_write import write_kv_pages
from sglang_tpu.ops.attention.pallas_kernels import (
    paged_decode_attention,
    paged_extend_attention,
)
from sglang_tpu.parallel.mesh import AXIS_TP, get_mesh_context


@register_attention_backend("pallas")
class PallasBackend(AttentionBackend):
    """Hybrid production backend.

    - KV writes: Pallas in-place row-DMA kernel (kv_write.py).
    - Extend (prefill): Pallas ragged paged flash kernel.
    - Decode: XLA paged gather + masked softmax. Measured on this
      device path, kernel-issued DMAs pay ~10us fixed cost each, so
      one-token-per-seq decode (many small page fetches) is 10x faster
      through XLA's gather lowering (5.3ms vs 49ms per 16 layers at
      bs=64/ctx=640); on bare-metal TPUs with sub-us DMA issue the
      Pallas decode kernel ("pallas_dma" backend) is the right choice.
    """

    supports_cascade = True  # decode delegates to the XLA cascade path

    def forward_decode(self, q, kv_layer, fb: ForwardBatch, **kw):
        from sglang_tpu.ops.attention.xla_backend import XlaNativeBackend

        return XlaNativeBackend.forward_decode(self, q, kv_layer, fb, **kw)

    def _gather_ctx(self, kv_layer, slots):
        from sglang_tpu.ops.attention.xla_backend import XlaNativeBackend

        return XlaNativeBackend._gather_ctx(self, kv_layer, slots)

    def _gather_pages(self, kv_layer, page_table):
        from sglang_tpu.ops.attention.xla_backend import XlaNativeBackend

        return XlaNativeBackend._gather_pages(self, kv_layer, page_table)

    @staticmethod
    def _softcap(scores, logit_cap):
        from sglang_tpu.ops.attention.xla_backend import XlaNativeBackend

        return XlaNativeBackend._softcap(scores, logit_cap)

    def _tp_size(self) -> int:
        try:
            return get_mesh_context().tp_size
        except Exception:
            return 1

    def _kv_spec(self, tp: int):
        return (
            P(None, None, None, AXIS_TP)
            if self.num_kv_heads % tp == 0
            else P(None, None, None, None)
        )

    def write_kv(self, kv_layer, k, v, fb: ForwardBatch):
        T = k.shape[0]
        rows = jnp.stack(
            [k.reshape(T, -1), v.reshape(T, -1)], axis=1
        ).astype(kv_layer.dtype)
        ps = self.page_size

        def local(kvl, rws, locs):
            return write_kv_pages(kvl, rws, locs, page_size=ps)

        tp = self._tp_size()
        if tp > 1:
            local = jax.shard_map(
                local,
                mesh=get_mesh_context().mesh,
                in_specs=(self._kv_spec(tp), P(None, None, AXIS_TP), P()),
                out_specs=self._kv_spec(tp),
                check_vma=False,
            )
        return local(kv_layer, rows, fb.out_cache_loc)

    def _kernel_decode(self, q, kv_layer, fb: ForwardBatch, window=0,
                       logit_cap=0.0, scale=None, sinks=None):
        assert sinks is None, "pallas_dma decode does not support sinks yet"
        scale = scale or self.scale
        ps, hd = self.page_size, self.head_dim

        def local(qs, kvs, pt, sl):
            nk_local = kvs.shape[-1] // hd
            return paged_decode_attention(
                qs, kvs, pt, sl,
                scale=scale, page_size=ps, num_kv_heads=nk_local,
                window=int(window or 0), logit_cap=float(logit_cap or 0.0),
            )

        tp = self._tp_size()
        if tp > 1:
            local = jax.shard_map(
                local,
                mesh=get_mesh_context().mesh,
                in_specs=(
                    P(None, AXIS_TP, None), self._kv_spec(tp), P(), P(),
                ),
                out_specs=P(None, AXIS_TP, None),
                check_vma=False,
            )
        return local(q, kv_layer, fb.page_table, fb.seq_lens)

    def forward_extend(self, q, kv_layer, fb: ForwardBatch, window=0,
                       logit_cap=0.0, scale=None, sinks=None):
        if sinks is not None:
            # The pallas extend kernel has no sink term yet; sink models
            # (GPT-OSS) take the XLA extend path.
            from sglang_tpu.ops.attention.xla_backend import XlaNativeBackend

            return XlaNativeBackend.forward_extend(
                self, q, kv_layer, fb, window=window, logit_cap=logit_cap,
                scale=scale, sinks=sinks,
            )
        scale = scale or self.scale
        ps, hd = self.page_size, self.head_dim
        T, nq, _ = q.shape
        q_folded = q.reshape(T, nq * hd)
        block_q = fb.extend_align

        def local(qs, kvs, pt, sl, pfl, qls, bseq, bqoff):
            nk_local = kvs.shape[-1] // hd
            return paged_extend_attention(
                qs, kvs, pt, sl, pfl, qls, bseq, bqoff,
                scale=scale, page_size=ps, num_kv_heads=nk_local,
                block_q=block_q, window=int(window or 0),
                logit_cap=float(logit_cap or 0.0),
            )

        tp = self._tp_size()
        if tp > 1:
            local = jax.shard_map(
                local,
                mesh=get_mesh_context().mesh,
                in_specs=(
                    P(None, AXIS_TP), self._kv_spec(tp),
                    P(), P(), P(), P(), P(), P(),
                ),
                out_specs=P(None, AXIS_TP),
                check_vma=False,
            )
        out = local(
            q_folded, kv_layer, fb.page_table, fb.seq_lens,
            fb.prefix_lens, fb.q_lens, fb.block_seq, fb.block_q_off,
        )
        return out.reshape(T, nq, hd)


@register_attention_backend("pallas_dma")
class PallasDmaBackend(PallasBackend):
    """Pure-Pallas decode (manual page DMA) — for bare-metal TPUs where
    kernel DMA issue is cheap."""

    supports_cascade = False  # kernel reads the full per-row page table

    def forward_decode(self, q, kv_layer, fb: ForwardBatch, **kw):
        return self._kernel_decode(q, kv_layer, fb, **kw)
