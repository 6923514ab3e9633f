"""Pure-XLA paged attention (reference fallback; runs on CPU/TPU anywhere).

Ref behavior: srt/layers/attention/torch_native_backend.py. Used for
correctness tests, as the baseline the Pallas kernels are checked against,
AND as the production DECODE path on virtualized v5e (see pallas_backend).

The KV pool per layer is a (k, v) pair of [NP, ps, 2, F/2] arrays (split
pools — mem/kv_pool.py). Decode gathers whole pages DIRECTLY from the 4-D
arrays and reshapes the (2, F/2) row split away post-gather (free):
measured ~71 GB/s effective on v5e, pool-size-stable, vs 42 GB/s for the
round-1 interleaved pair layout (whose k/v extraction forced XLA to copy
every gathered byte). A pre-gather flat reshape of the pool measures
faster still (80 GB/s) on small pools but XLA materializes it as a full
pool copy once the pool is big — do NOT reintroduce it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P_spec

from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.ops.attention.base import AttentionBackend, register_attention_backend

NEG_INF = -1e30


def _flat_slot_indices(page_table: jax.Array, page_size: int) -> jax.Array:
    """[B, max_pages] page ids -> [B, max_ctx] token-slot ids."""
    offs = jnp.arange(page_size, dtype=jnp.int32)
    idx = page_table[:, :, None] * page_size + offs[None, None, :]
    return idx.reshape(page_table.shape[0], -1)


@register_attention_backend("xla_native")
class XlaNativeBackend(AttentionBackend):
    # Decode batches whose rows share a radix prefix can use cascade
    # (shared-prefix) attention: fb.shared_pages gathered once + LSE merge.
    supports_cascade = True

    def _gather_ctx(self, kv_layer, slots):
        """kv_layer (k, v) pair; slots [..., C] -> k, v [..., C, nk, hd].

        QUANTIZED pools return features in PACKED order (quant_kv.py
        unpack_f8_packed_order): attention contracts hd, so callers
        permute q / un-permute outputs via `_perm_q` / `_unperm_out`
        instead of paying the byte-interleave relayout on the gathered
        context (25.9 ms/step of XLA copies at bs=256, PERF_NOTES.md)."""
        nk, hd = self.num_kv_heads, self.head_dim
        kp, vp = kv_layer
        pages = slots // self.page_size
        offs = slots % self.page_size
        if self.kv_quant:
            return (
                self._dequant_packed(kp[pages, offs]),
                self._dequant_packed(vp[pages, offs]),
            )
        k = kp[pages, offs].reshape(slots.shape + (nk, hd))
        v = vp[pages, offs].reshape(slots.shape + (nk, hd))
        return self._upcast(k), self._upcast(v)

    def _gather_pages(self, kv_layer, page_table):
        """Page-level gather: [B, P] -> k, v [B, P*ps, nk, hd].

        Whole-page slices gather far better than per-token rows (bigger
        contiguous reads). Quantized pools: PACKED feature order (see
        _gather_ctx)."""
        nk, hd = self.num_kv_heads, self.head_dim
        kp, vp = kv_layer
        B, P = page_table.shape
        C = P * self.page_size
        if self.kv_quant:
            # gather int32-packed pages (half the bf16 bytes), dequant in
            # VMEM-resident fusion with the einsums (measured 2x the bf16
            # decode-attention speed at bs=256 on v5e).
            k = self._dequant_packed(kp[page_table]).reshape(B, C, nk, hd)
            v = self._dequant_packed(vp[page_table]).reshape(B, C, nk, hd)
            return k, v
        k = kp[page_table].reshape(B, C, nk, hd)
        v = vp[page_table].reshape(B, C, nk, hd)
        return self._upcast(k), self._upcast(v)

    @staticmethod
    def _softcap(scores, logit_cap):
        if logit_cap and logit_cap > 0:
            return jnp.tanh(scores / logit_cap) * logit_cap
        return scores

    def forward_decode(self, q, kv_layer, fb: ForwardBatch, window=0,
                       logit_cap=0.0, scale=None, sinks=None,
                       alibi_slopes=None):
        if (
            getattr(self, "dcp", False)
            and not window
            and sinks is None
            and alibi_slopes is None
            and fb.shared_pages is None
        ):
            from sglang_tpu.parallel.mesh import get_mesh_context

            if get_mesh_context().tp_size > 1:
                return self.forward_decode_dcp(
                    q, kv_layer, fb, logit_cap=logit_cap, scale=scale
                )
        B, nq, hd = q.shape
        nk = self.num_kv_heads
        group = nq // nk
        if (
            not self.kv_quant
            and nk % 2 == 0
            and sinks is None
            and alibi_slopes is None
        ):
            # Half-split formulation: consume the gathered pages in the
            # pool's native [.., 2, F/2] pair layout (a bitcast off the
            # T(2,128) tiling) instead of reshaping to [B, C, nk, hd] —
            # that reshape is a physical relayout of every gathered byte
            # (measured 37 ms/step at the 8B bench shapes; the split
            # einsum is bit-identical and 1.76 -> 1.01 ms/layer).
            # Explicit class call: PallasBackend delegates here with a
            # non-XlaNativeBackend self.
            return XlaNativeBackend._decode_split(
                self, q, kv_layer, fb, window=window, logit_cap=logit_cap,
                scale=scale,
            )
        q = self._dp_rows(q)
        k, v = self._gather_pages(
            kv_layer, self._dp_rows(fb.page_table)
        )  # [B, C, nk, hd]
        # bf16 operands with f32 MXU accumulation: casting k/v to f32 first
        # would materialize 2x the gathered bytes in HBM (measured +2ms/layer
        # at bs=256 on v5e); preferred_element_type gets f32 math for free.
        qf = self._perm_q(q.reshape(B, nk, group, hd))
        scores = jnp.einsum(
            "bkgd,bckd->bkgc", qf, k, preferred_element_type=jnp.float32
        ) * (scale or self.scale)
        scores = self._softcap(scores, logit_cap)
        C = k.shape[1]
        ctx = jnp.arange(C, dtype=jnp.int32)
        if alibi_slopes is not None:
            # ALiBi (Bloom/MPT): bias = slope_h * (key_pos - query_pos);
            # the pool context index IS the absolute key position, the
            # decode query sits at seq_len-1.
            dist = (ctx[None, :] - (fb.seq_lens[:, None] - 1)).astype(
                jnp.float32
            )  # [B, C], <= 0 where visible
            sl = alibi_slopes.astype(jnp.float32).reshape(1, nk, group, 1)
            scores = scores + sl * dist[:, None, None, :]
        mask = ctx[None, :] < fb.seq_lens[:, None]  # [B, C]
        if window and window > 0:
            mask &= ctx[None, :] >= fb.seq_lens[:, None] - window
        elif window and window < 0:
            # Chunked local attention (Llama4, ref srt chunked attention
            # masks): the decode query at position L-1 sees only its own
            # chunk [floor((L-1)/c)*c, L).
            c = -window
            mask &= ctx[None, :] >= ((fb.seq_lens[:, None] - 1) // c) * c
        scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)

        if (fb.shared_pages is not None and sinks is None
                and not window):
            # Cascade: the batch-shared prefix is gathered ONCE (vs B times)
            # and attended as a single dense matmul, then merged with the
            # per-row suffix via a joint softmax (mergeable LSE form).
            ps = self.page_size
            kp, vp = kv_layer
            Cs = fb.shared_pages.shape[0] * ps
            if self.kv_quant:
                k_s = self._dequant_packed(
                    kp[fb.shared_pages]).reshape(Cs, nk, hd)
                v_s = self._dequant_packed(
                    vp[fb.shared_pages]).reshape(Cs, nk, hd)
            else:
                k_s = self._upcast(kp[fb.shared_pages].reshape(Cs, nk, hd))
                v_s = self._upcast(vp[fb.shared_pages].reshape(Cs, nk, hd))
            ss = jnp.einsum(
                "bkgd,ckd->bkgc", qf, k_s, preferred_element_type=jnp.float32
            ) * (scale or self.scale)
            ss = self._softcap(ss, logit_cap)
            ctx_s = jnp.arange(Cs, dtype=jnp.int32)
            if alibi_slopes is not None:
                dist_s = (ctx_s[None, :]
                          - (fb.seq_lens[:, None] - 1)).astype(jnp.float32)
                sl = alibi_slopes.astype(jnp.float32).reshape(
                    1, nk, group, 1
                )
                ss = ss + sl * dist_s[:, None, None, :]
            ss = jnp.where((ctx_s < fb.shared_len)[None, None, None, :], ss,
                           NEG_INF)
            m = jnp.maximum(
                jnp.max(ss, axis=-1), jnp.max(scores, axis=-1)
            )[..., None]
            p_s = jnp.exp(ss - m)
            p_x = jnp.exp(scores - m)
            denom = jnp.sum(p_s, axis=-1) + jnp.sum(p_x, axis=-1)
            o_s = jnp.einsum(
                "bkgc,ckd->bkgd", p_s.astype(v.dtype), v_s,
                preferred_element_type=jnp.float32,
            )
            o_x = jnp.einsum(
                "bkgc,bckd->bkgd", p_x.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )
            out = (o_s + o_x) / jnp.maximum(denom[..., None], 1e-20)
            return self._unperm_out(out).reshape(B, nq, hd).astype(q.dtype)

        if sinks is not None:
            # GPT-OSS attention sinks: a learned per-head logit joins the
            # softmax (its probability mass is dropped from the output).
            sk = sinks.astype(jnp.float32).reshape(1, nk, group, 1)
            m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sk)
            p = jnp.exp(scores - m)
            denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(sk - m)
            out = jnp.einsum(
                "bkgc,bckd->bkgd", (p / denom).astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )
            return self._unperm_out(out).reshape(B, nq, hd).astype(q.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bkgc,bckd->bkgd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        out = self._unperm_out(out).reshape(B, nq, hd)
        return self._dp_rows(out, sharded=False).astype(q.dtype)

    def _decode_split(self, q, kv_layer, fb: ForwardBatch, window=0,
                      logit_cap=0.0, scale=None):
        """Decode attention over the pool's native half-pair layout.

        The pool stores tokens as [.., 2, F/2]; reshaping gathers to
        [B, C, nk, hd] is a physical T(2,128)->T(8,128) relayout of every
        gathered byte. Viewing them as [B, C, 2, nk/2, hd] instead is a
        bitcast, and the attention einsums run with the half dim as an
        extra batch axis — bit-identical outputs (_probe_attn.py)."""
        B, nq, hd = q.shape
        nk = self.num_kv_heads
        h2 = nk // 2
        g = nq // nk
        scale = scale or self.scale
        q = self._dp_rows(q)
        pt = self._dp_rows(fb.page_table)
        kp, vp = kv_layer
        ps = self.page_size
        P = pt.shape[1]
        C = P * ps
        k = self._upcast(kp[pt].reshape(B, C, 2, h2, hd))
        v = self._upcast(vp[pt].reshape(B, C, 2, h2, hd))
        qf = q.reshape(B, 2, h2, g, hd)
        scores = jnp.einsum(
            "bhjgd,bchjd->bhjgc", qf, k, preferred_element_type=jnp.float32
        ) * scale
        scores = self._softcap(scores, logit_cap)
        ctx = jnp.arange(C, dtype=jnp.int32)
        mask = ctx[None, :] < fb.seq_lens[:, None]  # [B, C]
        if window and window > 0:
            mask &= ctx[None, :] >= fb.seq_lens[:, None] - window
        elif window and window < 0:
            c = -window
            mask &= ctx[None, :] >= ((fb.seq_lens[:, None] - 1) // c) * c
        scores = jnp.where(mask[:, None, None, None, :], scores, NEG_INF)

        if fb.shared_pages is not None and not window:
            # Cascade merge in half-split form (joint softmax via LSE).
            Cs = fb.shared_pages.shape[0] * ps
            k_s = self._upcast(
                kp[fb.shared_pages].reshape(Cs, 2, h2, hd)
            )
            v_s = self._upcast(
                vp[fb.shared_pages].reshape(Cs, 2, h2, hd)
            )
            ss = jnp.einsum(
                "bhjgd,chjd->bhjgc", qf, k_s,
                preferred_element_type=jnp.float32,
            ) * scale
            ss = self._softcap(ss, logit_cap)
            ctx_s = jnp.arange(Cs, dtype=jnp.int32)
            ss = jnp.where(
                (ctx_s < fb.shared_len)[None, None, None, None, :], ss,
                NEG_INF,
            )
            m = jnp.maximum(
                jnp.max(ss, axis=-1), jnp.max(scores, axis=-1)
            )[..., None]
            p_s = jnp.exp(ss - m)
            p_x = jnp.exp(scores - m)
            denom = jnp.sum(p_s, axis=-1) + jnp.sum(p_x, axis=-1)
            o_s = jnp.einsum(
                "bhjgc,chjd->bhjgd", p_s.astype(v.dtype), v_s,
                preferred_element_type=jnp.float32,
            )
            o_x = jnp.einsum(
                "bhjgc,bchjd->bhjgd", p_x.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )
            out = (o_s + o_x) / jnp.maximum(denom[..., None], 1e-20)
            return out.reshape(B, nq, hd).astype(q.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhjgc,bchjd->bhjgd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        out = out.reshape(B, nq, hd)
        return self._dp_rows(out, sharded=False).astype(q.dtype)

    # ---- MLA: MQA over latent rows (see base.py mla()) ----

    def forward_mla_decode(self, q, latent, fb: ForwardBatch, *, v_dim,
                           scale):
        if getattr(self, "dcp", False) and fb.shared_pages is None:
            from sglang_tpu.parallel.mesh import get_mesh_context

            if get_mesh_context().tp_size > 1:
                return self.forward_mla_decode_dcp(
                    q, latent, fb, v_dim=v_dim, scale=scale
                )
        B, nh, D = q.shape
        q = self._dp_rows(q)
        pt = self._dp_rows(fb.page_table)
        P = pt.shape[1]
        C = P * self.page_size
        if self.kv_quant:
            rows = self._dequant(latent[pt], 1).reshape(B, C, D)
        else:
            rows = latent[pt].reshape(B, C, D)  # [B, C, D]
        qf = q.astype(jnp.bfloat16) if rows.dtype == jnp.bfloat16 else q
        scores = jnp.einsum(
            "bhd,bcd->bhc", qf, rows, preferred_element_type=jnp.float32
        ) * scale
        ctx = jnp.arange(C, dtype=jnp.int32)
        mask = ctx[None, :] < fb.seq_lens[:, None]
        scores = jnp.where(mask[:, None, :], scores, NEG_INF)

        if fb.shared_pages is not None:
            # Cascade over the shared prefix (one gather for the batch).
            Cs = fb.shared_pages.shape[0] * self.page_size
            if self.kv_quant:
                rows_s = self._dequant(
                    latent[fb.shared_pages], 1
                ).reshape(Cs, D)
            else:
                rows_s = latent[fb.shared_pages].reshape(Cs, D)
            ss = jnp.einsum(
                "bhd,cd->bhc", qf, rows_s,
                preferred_element_type=jnp.float32,
            ) * scale
            ctx_s = jnp.arange(Cs, dtype=jnp.int32)
            ss = jnp.where((ctx_s < fb.shared_len)[None, None, :], ss,
                           NEG_INF)
            m = jnp.maximum(jnp.max(ss, axis=-1), jnp.max(scores, axis=-1))
            m = m[..., None]
            p_s = jnp.exp(ss - m)
            p_x = jnp.exp(scores - m)
            denom = jnp.sum(p_s, axis=-1) + jnp.sum(p_x, axis=-1)
            o_s = jnp.einsum(
                "bhc,cv->bhv", p_s.astype(rows.dtype), rows_s[:, :v_dim],
                preferred_element_type=jnp.float32,
            )
            o_x = jnp.einsum(
                "bhc,bcv->bhv", p_x.astype(rows.dtype), rows[:, :, :v_dim],
                preferred_element_type=jnp.float32,
            )
            out = (o_s + o_x) / jnp.maximum(denom[..., None], 1e-20)
            return out.astype(q.dtype)

        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhc,bcv->bhv", probs.astype(rows.dtype), rows[:, :, :v_dim],
            preferred_element_type=jnp.float32,
        )
        return self._dp_rows(out, sharded=False).astype(q.dtype)

    def forward_mla_extend(self, q, latent, fb: ForwardBatch, *, v_dim,
                           scale):
        T, nh, D = q.shape
        slots = _flat_slot_indices(fb.page_table, self.page_size)  # [B, C]
        tok_slots = slots[fb.seq_ids]  # [T, C]
        pages = tok_slots // self.page_size
        offs = tok_slots % self.page_size
        if self.kv_quant:
            rows = self._dequant(latent[pages, offs], 1).reshape(T, -1, D)
        else:
            rows = latent[pages, offs].reshape(T, -1, D)  # [T, C, D]
        scores = jnp.einsum(
            "thd,tcd->thc", q.astype(jnp.float32), rows.astype(jnp.float32)
        ) * scale
        ctx = jnp.arange(rows.shape[1], dtype=jnp.int32)
        mask = ctx[None, :] <= fb.positions[:, None]  # [T, C]
        scores = jnp.where(mask[:, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "thc,tcv->thv", probs, rows[:, :, :v_dim].astype(jnp.float32)
        )
        return out.astype(q.dtype)

    def forward_decode_dcp(self, q, kv_layer, fb: ForwardBatch,
                           logit_cap=0.0, scale=None):
        """Decode context parallelism (ref srt/layers/dcp/comm.py:15-22
        recast): the CONTEXT pages are partitioned over the mesh axis —
        each chip gathers and attends only its 1/dcp slice of every
        sequence's pages, then partial softmax states merge with the
        standard LSE combine (pmax + rescaled psum). This is how MLA
        models parallelize decode attention over the mesh: the single
        latent head cannot be tensor-parallel-split, but the context can.
        Pools are replicated this round (per-chip GATHER traffic divides
        by dcp; pool memory sharding is the r3 follow-up)."""
        from sglang_tpu.parallel.mesh import AXIS_TP, get_mesh_context

        ctx_mesh = get_mesh_context()
        dcp = ctx_mesh.tp_size
        B, nq, hd = q.shape
        nk = self.num_kv_heads
        group = nq // nk
        ps = self.page_size
        page_table = fb.page_table
        P = page_table.shape[1]
        if P % dcp:  # pad with trash pages (positions masked by seq_len)
            pad = dcp - P % dcp
            page_table = jnp.pad(page_table, ((0, 0), (0, pad)))
            P += pad
        Pl = P // dcp
        sc = scale or self.scale
        # Pool MEMORY sharding (mem/kv_pool.py dcp_shard): pages are
        # distributed over the axis in INTERLEAVE layout (sequence page i
        # lives on shard i % dcp — DcpPageAllocator) so each shard reads
        # only local pages; otherwise block layout over a replicated pool.
        sharded = getattr(self, "dcp_pool_sharded", False)
        NPl = getattr(self, "dcp_pages_per_shard", 0)

        def local(qr, kp, vp, pt_l, seq_lens):
            pt_l = pt_l[0]
            s = jax.lax.axis_index(AXIS_TP)
            C = Pl * ps
            if sharded:
                # translate global page ids to this shard's local block;
                # garbage (other-shard/padding) entries are position-masked
                pt_loc = jnp.clip(pt_l - s * NPl, 0, NPl - 1)
                # col j holds the sequence's page index s + j*dcp
                pos = (
                    (s + jnp.arange(Pl, dtype=jnp.int32) * dcp)[:, None] * ps
                    + jnp.arange(ps, dtype=jnp.int32)[None, :]
                ).reshape(-1)
            else:
                pt_loc = pt_l
                pos = s * C + jnp.arange(C, dtype=jnp.int32)
            k, v = self._gather_pages((kp, vp), pt_loc)  # [B, Pl*ps, nk, hd]
            qf = self._perm_q(qr.reshape(B, nk, group, hd))
            scores = jnp.einsum(
                "bkgd,bckd->bkgc", qf, k,
                preferred_element_type=jnp.float32,
            ) * sc
            scores = self._softcap(scores, logit_cap)
            mask = pos[None, :] < seq_lens[:, None]
            scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
            m = jnp.max(scores, axis=-1)  # [B, nk, g]
            M = jax.lax.pmax(m, AXIS_TP)
            p = jnp.exp(scores - M[..., None])
            l = jnp.sum(p, axis=-1)
            acc = jnp.einsum(
                "bkgc,bckd->bkgd", p.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )
            L = jax.lax.psum(l, AXIS_TP)
            ACC = jax.lax.psum(acc, AXIS_TP)
            out = ACC / jnp.maximum(L[..., None], 1e-20)
            return self._unperm_out(out).reshape(B, nq, hd)

        if sharded:
            # interleave: shard s gets table columns s, s+dcp, ...
            pt = page_table.reshape(B, Pl, dcp).transpose(2, 0, 1)
            pool_spec = P_spec(AXIS_TP)
        else:
            pt = page_table.reshape(B, dcp, Pl).swapaxes(0, 1)
            pool_spec = P_spec()
        out = jax.shard_map(
            local,
            mesh=ctx_mesh.mesh,
            in_specs=(P_spec(), pool_spec, pool_spec,
                      P_spec(AXIS_TP), P_spec()),
            out_specs=P_spec(),
            check_vma=False,
        )(q, kv_layer[0], kv_layer[1], pt, fb.seq_lens)
        return out.astype(q.dtype)

    def forward_mla_decode_dcp(self, q, latent, fb: ForwardBatch, *, v_dim,
                               scale):
        """DCP for absorbed-MLA decode (see forward_decode_dcp)."""
        from sglang_tpu.parallel.mesh import AXIS_TP, get_mesh_context

        ctx_mesh = get_mesh_context()
        dcp = ctx_mesh.tp_size
        B, nh, D = q.shape
        ps = self.page_size
        page_table = fb.page_table
        P = page_table.shape[1]
        if P % dcp:
            pad = dcp - P % dcp
            page_table = jnp.pad(page_table, ((0, 0), (0, pad)))
            P += pad
        Pl = P // dcp

        sharded = getattr(self, "dcp_pool_sharded", False)
        NPl = getattr(self, "dcp_pages_per_shard", 0)

        def local(qr, lat, pt_l, seq_lens):
            pt_l = pt_l[0]
            s = jax.lax.axis_index(AXIS_TP)
            C = Pl * ps
            if sharded:
                pt_loc = jnp.clip(pt_l - s * NPl, 0, NPl - 1)
                pos = (
                    (s + jnp.arange(Pl, dtype=jnp.int32) * dcp)[:, None] * ps
                    + jnp.arange(ps, dtype=jnp.int32)[None, :]
                ).reshape(-1)
            else:
                pt_loc = pt_l
                pos = s * C + jnp.arange(C, dtype=jnp.int32)
            if self.kv_quant:
                rows = self._dequant(lat[pt_loc], 1).reshape(B, C, D)
            else:
                rows = lat[pt_loc].reshape(B, C, D)
            qf = qr.astype(rows.dtype)
            scores = jnp.einsum(
                "bhd,bcd->bhc", qf, rows,
                preferred_element_type=jnp.float32,
            ) * scale
            mask = pos[None, :] < seq_lens[:, None]
            scores = jnp.where(mask[:, None, :], scores, NEG_INF)
            m = jnp.max(scores, axis=-1)
            M = jax.lax.pmax(m, AXIS_TP)
            p = jnp.exp(scores - M[..., None])
            l = jnp.sum(p, axis=-1)
            acc = jnp.einsum(
                "bhc,bcv->bhv", p.astype(rows.dtype), rows[:, :, :v_dim],
                preferred_element_type=jnp.float32,
            )
            L = jax.lax.psum(l, AXIS_TP)
            ACC = jax.lax.psum(acc, AXIS_TP)
            return ACC / jnp.maximum(L[..., None], 1e-20)

        if sharded:
            pt = page_table.reshape(B, Pl, dcp).transpose(2, 0, 1)
            pool_spec = P_spec(AXIS_TP)
        else:
            pt = page_table.reshape(B, dcp, Pl).swapaxes(0, 1)
            pool_spec = P_spec()
        out = jax.shard_map(
            local,
            mesh=ctx_mesh.mesh,
            in_specs=(P_spec(), pool_spec, P_spec(AXIS_TP), P_spec()),
            out_specs=P_spec(),
            check_vma=False,
        )(q, latent, pt, fb.seq_lens)
        return out.astype(q.dtype)

    def forward_tree_verify(self, q, kv_layer, fb: ForwardBatch, window=0,
                            logit_cap=0.0, scale=None, sinks=None,
                            alibi_slopes=None):
        if alibi_slopes is not None:
            raise NotImplementedError(
                "tree-verify does not support ALiBi models yet"
            )
        """Speculative tree verify (ref eagle_worker_v2.py:1492 recast):
        every sequence carries Rq new tokens laid out at pool slots
        [prefix, prefix+Rq); token r attends the WHOLE prefix plus the
        tree slots its ancestor mask allows (fb.spec_tree_mask[b, r, c]
        for slot prefix + c). One page gather PER SEQUENCE (decode-style),
        so verify costs ~one decode step regardless of tree width."""
        T, nq, hd = q.shape
        nk = self.num_kv_heads
        group = nq // nk
        B, Rq, Rk = fb.spec_tree_mask.shape
        k, v = self._gather_pages(kv_layer, fb.page_table)  # [B, C, nk, hd]
        C = k.shape[1]
        qf = self._perm_q(q.reshape(B, Rq, nk, group, hd))
        scores = jnp.einsum(
            "brkgd,bckd->brkgc", qf, k, preferred_element_type=jnp.float32
        ) * (scale or self.scale)
        scores = self._softcap(scores, logit_cap)
        ctx = jnp.arange(C, dtype=jnp.int32)[None, :]  # [1, C]
        prefix = fb.prefix_lens[:, None]  # [B, 1]
        in_prefix = ctx < prefix  # [B, C]
        idx = jnp.clip(ctx - prefix, 0, Rk - 1)  # [B, C]
        # tree-slot admissibility per (b, r, c): gather the mask along its
        # last axis at the ctx->tree-slot index.
        tree_ok = jnp.take_along_axis(
            fb.spec_tree_mask, idx[:, None, :].repeat(Rq, axis=1), axis=2
        )  # [B, Rq, C]
        in_tree = (ctx >= prefix) & (ctx < prefix + Rk)  # [B, C]
        mask = in_prefix[:, None, :] | (in_tree[:, None, :] & tree_ok)
        scores = jnp.where(mask[:, :, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "brkgc,bckd->brkgd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        return self._unperm_out(out).reshape(T, nq, hd).astype(q.dtype)

    def forward_extend(self, q, kv_layer, fb: ForwardBatch, window=0,
                       logit_cap=0.0, scale=None, sinks=None,
                       alibi_slopes=None):
        T, nq, hd = q.shape
        nk = self.num_kv_heads
        group = nq // nk
        slots = _flat_slot_indices(fb.page_table, self.page_size)  # [B, C]
        tok_slots = self._dp_rows(slots[fb.seq_ids])  # [T, C]
        q = self._dp_rows(q)
        k, v = self._gather_ctx(kv_layer, tok_slots)  # [T, C, nk, hd]
        qf = self._perm_q(q.reshape(T, nk, group, hd)).astype(jnp.float32)
        scores = jnp.einsum(
            "tkgd,tckd->tkgc", qf, k.astype(jnp.float32)
        ) * (scale or self.scale)
        scores = self._softcap(scores, logit_cap)
        ctx = jnp.arange(slots.shape[1], dtype=jnp.int32)
        if alibi_slopes is not None:
            dist = (ctx[None, :] - fb.positions[:, None]).astype(
                jnp.float32
            )  # [T, C]
            sl = alibi_slopes.astype(jnp.float32).reshape(1, nk, group, 1)
            scores = scores + sl * dist[:, None, None, :]
        # Causal over absolute positions: token with position p sees ctx [0, p].
        mask = ctx[None, :] <= fb.positions[:, None]  # [T, C]
        if window and window > 0:
            mask &= ctx[None, :] > fb.positions[:, None] - window
        elif window and window < 0:
            # Chunked local attention: position p sees [floor(p/c)*c, p].
            mask &= ctx[None, :] >= (fb.positions[:, None] // -window) * -window
        scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
        if sinks is not None:
            sk = sinks.astype(jnp.float32).reshape(1, nk, group, 1)
            m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sk)
            p = jnp.exp(scores - m)
            denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(sk - m)
            out = jnp.einsum("tkgc,tckd->tkgd", p / denom,
                             v.astype(jnp.float32))
            return self._unperm_out(out).reshape(T, nq, hd).astype(q.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("tkgc,tckd->tkgd", probs, v.astype(jnp.float32))
        out = self._unperm_out(out).reshape(T, nq, hd)
        return self._dp_rows(out, sharded=False).astype(q.dtype)
