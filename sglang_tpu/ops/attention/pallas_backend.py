"""Pallas ragged paged attention backend (TPU production path).

Wires sglang_tpu/ops/attention/pallas_kernels.py (attention) and
kv_write.py (in-place KV scatter) behind the backend registry. Under
tensor parallelism the kernels run inside jax.shard_map over the "tp"
mesh axis — each chip computes its local q/kv heads against its local KV
shard; no collectives are needed inside attention (heads are fully
parallel), matching the reference's per-rank attention execution
(srt/layers/attention/flashinfer_backend.py) the TPU-native way.

Sharding note for the split pools: the pool's trailing F/2 dim is sharded
over tp, which (because the (2, F/2) split is an identity reshape of the
head dim globally) assigns each chip TWO contiguous head blocks — heads
{c*m..} from the first half and {nk/2 + c*m..} from the second. Q rows
are folded the same way ([T, 2, (nq/2)*hd] sharded on the last dim), so
per-chip GQA head grouping stays consistent whenever nq and nk are
divisible by 2*tp; otherwise the KV spec falls back to replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.mem.kv_pool import write_kv_xla
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.ops.attention.base import AttentionBackend, register_attention_backend
from sglang_tpu.ops.attention.kv_write import write_kv_pages
from sglang_tpu.ops.attention.pallas_kernels import (
    paged_decode_attention,
    paged_extend_attention,
)
from sglang_tpu.parallel.mesh import AXIS_TP, get_mesh_context


def _extend_v2_enabled() -> bool:
    import os

    return os.environ.get("SGLANG_TPU_EXTEND_KERNEL", "v2") == "v2"


@register_attention_backend("pallas")
class PallasBackend(AttentionBackend):
    """Hybrid production backend.

    - KV writes: Pallas in-place row-DMA kernel (kv_write.py), fully
      hidden under the attention gathers (measured at bs=256 on v5e).
    - Extend (prefill): Pallas ragged paged flash kernel.
    - Decode: XLA paged gather + masked softmax. Measured on this
      device path, kernel-issued DMAs pay ~10us fixed cost each, so
      one-token-per-seq decode (many small page fetches) is 10x faster
      through XLA's gather lowering; on bare-metal TPUs with sub-us DMA
      issue the Pallas decode kernel ("pallas_dma" backend) is the right
      choice.
    """

    supports_cascade = True  # decode delegates to the XLA cascade path

    def forward_decode(self, q, kv_layer, fb: ForwardBatch, **kw):
        from sglang_tpu.ops.attention.xla_backend import XlaNativeBackend

        return XlaNativeBackend.forward_decode(self, q, kv_layer, fb, **kw)

    def forward_tree_verify(self, q, kv_layer, fb: ForwardBatch, **kw):
        # Decode-style one-gather-per-seq path (xla_backend docstring);
        # costs ~one decode step regardless of tree width.
        from sglang_tpu.ops.attention.xla_backend import XlaNativeBackend

        return XlaNativeBackend.forward_tree_verify(self, q, kv_layer, fb,
                                                    **kw)

    def forward_decode_dcp(self, *a, **kw):
        from sglang_tpu.ops.attention.xla_backend import XlaNativeBackend

        return XlaNativeBackend.forward_decode_dcp(self, *a, **kw)

    def forward_mla_decode_dcp(self, *a, **kw):
        from sglang_tpu.ops.attention.xla_backend import XlaNativeBackend

        return XlaNativeBackend.forward_mla_decode_dcp(self, *a, **kw)

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

    def _shardable(self, tp: int) -> bool:
        if self.kv_quant:
            return False  # quantized pools are replicated (for now)
        if getattr(self, "cp", False):
            return False  # CP owns the mesh axis for extend attention
        return (
            self.num_kv_heads % (2 * tp) == 0
            and self.num_q_heads % (2 * tp) == 0
        )

    def _kv_spec(self, tp: int):
        return P(None, None, None, AXIS_TP)

    def write_kv(self, kv_layer, k, v, fb: ForwardBatch):
        T = k.shape[0]
        ps = self.page_size
        if getattr(self, "dcp_pool_sharded", False):
            # Page-sharded pool (DCP memory sharding): GSPMD's distributed
            # scatter handles cross-shard writes; the row-DMA kernel is
            # shard-local only.
            return write_kv_xla(kv_layer, k, v, fb.out_cache_loc, ps)
        if self.kv_quant:
            import os as _os

            from sglang_tpu.ops.quant_kv import pack_f8

            kr = pack_f8(k.reshape(T, -1), self.num_kv_heads, self.kv_quant)
            vr = pack_f8(v.reshape(T, -1), self.num_kv_heads, self.kv_quant)
            if _os.environ.get("SGLANG_TPU_QUANT_WRITE", "scatter") == "scatter":
                # Default: XLA scatter. The Pallas row-DMA kernel needs the
                # pool viewed as [NP, ps, g, 128] (tile-legal row units),
                # and THAT reshape makes XLA relayout the ENTIRE pool
                # T(8,128)->T(2,128) before the kernel and back after —
                # measured 37.6 ms/step at 8B bs=128 (two 100 MB pool
                # relayouts x 31 layers; PERF_NOTES round 4). A donated
                # in-place scatter of the [T, lanes] i32 rows has no such
                # bracket. The kernel stays selectable for A/B
                # (SGLANG_TPU_QUANT_WRITE=pallas).
                pages = fb.out_cache_loc // ps
                offs = fb.out_cache_loc % ps
                return (
                    kv_layer[0].at[pages, offs].set(kr),
                    kv_layer[1].at[pages, offs].set(vr),
                )
            return write_kv_pages(
                kv_layer[0], kv_layer[1], kr, vr, fb.out_cache_loc,
                page_size=ps,
            )
        krows = k.reshape(T, -1)
        vrows = v.reshape(T, -1)

        tp = self._tp_size()
        if tp > 1 and self._shardable(tp):
            spec = self._kv_spec(tp)
            rows_spec = P(None, None, AXIS_TP)
            fh = kv_layer[0].shape[-1]
            krows = krows.reshape(T, 2, fh)
            vrows = vrows.reshape(T, 2, fh)
            local_rows = jax.shard_map(
                lambda kl, vl, kr, vr, locs: write_kv_pages(
                    kl, vl, kr.reshape(T, -1), vr.reshape(T, -1), locs,
                    page_size=ps,
                ),
                mesh=get_mesh_context().mesh,
                in_specs=(spec, spec, rows_spec, rows_spec, P()),
                out_specs=(spec, spec),
                check_vma=False,
            )
            return local_rows(
                kv_layer[0], kv_layer[1], krows, vrows, fb.out_cache_loc
            )
        # Replicated pools (or single chip): run without shard_map.
        return write_kv_pages(
            kv_layer[0], kv_layer[1], krows, vrows, fb.out_cache_loc,
            page_size=ps,
        )

    # ---- MLA (latent pool) ----

    def write_mla(self, latent, rows, fb: ForwardBatch):
        from sglang_tpu.ops.attention.kv_write import write_rows_pages

        if self.kv_quant:
            from sglang_tpu.ops.quant_kv import pack_f8

            rows = pack_f8(rows, 1, self.kv_quant)
        return write_rows_pages(
            latent, rows, fb.out_cache_loc, page_size=self.page_size
        )

    def forward_mla_decode(self, q, latent, fb: ForwardBatch, *, v_dim,
                           scale):
        from sglang_tpu.ops.attention.xla_backend import XlaNativeBackend

        return XlaNativeBackend.forward_mla_decode(
            self, q, latent, fb, v_dim=v_dim, scale=scale
        )

    def forward_mla_extend(self, q, latent, fb: ForwardBatch, *, v_dim,
                           scale):
        """MQA-over-latent through the ragged paged kernel (nk=1). The
        latent page rides BOTH DMA rings for now (k and v read the same
        page — 2x fetch; a dedicated single-ring MLA kernel is the
        follow-up); output dims past v_dim are the k_pe lanes, discarded.
        TP runs replicated (the latent is shared across heads)."""
        T, nh, D = q.shape
        out = paged_extend_attention(
            q.reshape(T, nh * D), latent, latent,
            fb.page_table, fb.seq_lens, fb.prefix_lens, fb.q_lens,
            fb.block_seq, fb.block_q_off,
            scale=scale, page_size=self.page_size, num_kv_heads=1,
            block_q=fb.extend_align, kv_quant=self.kv_quant or "",
        )
        return out.reshape(T, nh, D)[..., :v_dim]

    def _kernel_decode(self, q, kv_layer, fb: ForwardBatch, window=0,
                       logit_cap=0.0, scale=None, sinks=None):
        assert sinks is None, "pallas_dma decode does not support sinks yet"
        scale = scale or self.scale
        ps, hd = self.page_size, self.head_dim

        def local(qs, kps, vps, pt, sl):
            if self.kv_quant:
                nk_local = 4 * kps.shape[-1] // hd
            else:
                nk_local = 2 * kps.shape[-1] // hd
            return paged_decode_attention(
                qs, kps, vps, pt, sl,
                scale=scale, page_size=ps, num_kv_heads=nk_local,
                window=int(window or 0), logit_cap=float(logit_cap or 0.0),
                kv_quant=self.kv_quant or "",
            )

        tp = self._tp_size()
        if tp > 1 and self._shardable(tp):
            B, nq, _ = q.shape
            spec = self._kv_spec(tp)
            # Block-halved q to match the pool's head blocks.
            qb = q.reshape(B, 2, (nq // 2) * hd)
            out = jax.shard_map(
                lambda qs, kps, vps, pt, sl: local(
                    qs.reshape(B, -1, hd), kps, vps, pt, sl
                ).reshape(B, 2, -1),
                mesh=get_mesh_context().mesh,
                in_specs=(P(None, None, AXIS_TP), spec, spec, P(), P()),
                out_specs=P(None, None, AXIS_TP),
                check_vma=False,
            )(qb, kv_layer[0], kv_layer[1], fb.page_table, fb.seq_lens)
            return out.reshape(B, nq, hd)
        return local(q, kv_layer[0], kv_layer[1], fb.page_table, fb.seq_lens)

    def forward_extend(self, q, kv_layer, fb: ForwardBatch, window=0,
                       logit_cap=0.0, scale=None, sinks=None,
                       alibi_slopes=None):
        if sinks is not None or alibi_slopes is not None or (window or 0) < 0:
            # The pallas extend kernel has no sink/ALiBi/chunked-mask term
            # yet; sink (GPT-OSS), ALiBi (Bloom/MPT) and chunked-local
            # (Llama4, window<0) layers take the XLA path.
            from sglang_tpu.ops.attention.xla_backend import XlaNativeBackend

            return XlaNativeBackend.forward_extend(
                self, q, kv_layer, fb, window=window, logit_cap=logit_cap,
                scale=scale, sinks=sinks, alibi_slopes=alibi_slopes,
            )
        scale = scale or self.scale
        ps, hd = self.page_size, self.head_dim
        T, nq, _ = q.shape
        fh_lanes = (self.num_kv_heads * hd) // 2
        if (not self.kv_quant and _extend_v2_enabled()
                and fh_lanes % 128 == 0):
            # (fh must be lane-aligned: the windowed DMA slices the pool's
            # trailing [2, fh] as one 2*fh lane group; Mosaic requires 128.)
            # v2: window-buffered KV + group-folded MXU dots (25 -> ~2
            # ms/layer at 8B bench shapes; see pallas_kernels.py). Falls
            # back to v1 for quantized pools (packed int32 rows).
            from sglang_tpu.ops.attention.pallas_kernels import (
                paged_extend_attention_v2,
            )

            tp = self._tp_size()
            if tp > 1 and self._shardable(tp):
                spec = self._kv_spec(tp)
                qb = q.reshape(T, 2, (nq // 2), hd)

                def local_v2(qs, kps, vps, pt, sl, pfl, qls, bseq, bqoff):
                    nk_local = 2 * kps.shape[-1] // hd
                    return paged_extend_attention_v2(
                        qs.reshape(T, -1, hd), kps, vps, pt, sl, pfl, qls,
                        bseq, bqoff, scale=scale, page_size=ps,
                        num_kv_heads=nk_local, block_q=fb.extend_align,
                        window=int(window or 0),
                        logit_cap=float(logit_cap or 0.0),
                    ).reshape(T, 2, -1, hd)

                out = jax.shard_map(
                    local_v2,
                    mesh=get_mesh_context().mesh,
                    in_specs=(
                        P(None, None, AXIS_TP, None), spec, spec,
                        P(), P(), P(), P(), P(), P(),
                    ),
                    out_specs=P(None, None, AXIS_TP, None),
                    check_vma=False,
                )(
                    qb, kv_layer[0], kv_layer[1], fb.page_table,
                    fb.seq_lens, fb.prefix_lens, fb.q_lens, fb.block_seq,
                    fb.block_q_off,
                )
                return out.reshape(T, nq, hd)
            return paged_extend_attention_v2(
                q, kv_layer[0], kv_layer[1], fb.page_table, fb.seq_lens,
                fb.prefix_lens, fb.q_lens, fb.block_seq, fb.block_q_off,
                scale=scale, page_size=ps, num_kv_heads=self.num_kv_heads,
                block_q=fb.extend_align, window=int(window or 0),
                logit_cap=float(logit_cap or 0.0),
            )
        q_folded = q.reshape(T, nq * hd)
        block_q = fb.extend_align

        def local(qs, kps, vps, pt, sl, pfl, qls, bseq, bqoff):
            if self.kv_quant:
                nk_local = 4 * kps.shape[-1] // hd
            else:
                nk_local = 2 * kps.shape[-1] // hd
            return paged_extend_attention(
                qs, kps, vps, pt, sl, pfl, qls, bseq, bqoff,
                scale=scale, page_size=ps, num_kv_heads=nk_local,
                block_q=block_q, window=int(window or 0),
                logit_cap=float(logit_cap or 0.0),
                kv_quant=self.kv_quant or "",
            )

        tp = self._tp_size()
        if tp > 1 and self._shardable(tp):
            spec = self._kv_spec(tp)
            qb = q_folded.reshape(T, 2, (nq // 2) * hd)
            out = jax.shard_map(
                lambda qs, kps, vps, *rest: local(
                    qs.reshape(T, -1), kps, vps, *rest
                ).reshape(T, 2, -1),
                mesh=get_mesh_context().mesh,
                in_specs=(
                    P(None, None, AXIS_TP), spec, spec,
                    P(), P(), P(), P(), P(), P(),
                ),
                out_specs=P(None, None, AXIS_TP),
                check_vma=False,
            )(
                qb, kv_layer[0], kv_layer[1], fb.page_table, fb.seq_lens,
                fb.prefix_lens, fb.q_lens, fb.block_seq, fb.block_q_off,
            )
            return out.reshape(T, nq, hd)
        out = local(
            q_folded, kv_layer[0], kv_layer[1], fb.page_table, fb.seq_lens,
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
