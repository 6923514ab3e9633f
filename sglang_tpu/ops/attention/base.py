"""Attention backend interface + registry.

Ref: srt/layers/attention/base_attn_backend.py:33 (AttentionBackend ABC:
forward_extend/forward_decode) and attention_registry.py:31. Our backends
are pure functions over (q, k, v, kv_layer, ForwardBatch) called INSIDE the
jitted model program, so there is no init_forward_metadata host step and no
CUDA-graph state — bucketed jit handles that. The KV pool is a tuple of
per-layer (k, v) pairs, each [NP, ps, 2, F/2] (see mem/kv_pool.py for the
split-pool layout rationale).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple, Type

import jax
import jax.numpy as jnp

from sglang_tpu.mem.kv_pool import write_kv_xla
from sglang_tpu.model_exec.forward_batch import ForwardBatch, ForwardMode


def _f8_packed_order() -> bool:
    """Packed-feature-order fp8 unpack (SGLANG_TPU_F8_PACKED=1 to enable).

    Measured on the tunneled v5e: 2419 tok/s packed vs 2677 interleaved
    (same session, 1B bench) — the byte-interleave relayout is NOT the
    binding cost there; XLA's einsum operand layouts prefer the
    interleaved form. Kept as an A/B knob for other hardware."""
    import os

    return os.environ.get("SGLANG_TPU_F8_PACKED", "0") == "1"


class AttentionBackend:
    """Stateless (per-call) attention executor."""

    name = "base"
    # Whether forward_decode understands fb.shared_pages (cascade /
    # shared-prefix attention). The scheduler only builds cascade decode
    # batches for backends that advertise it.
    supports_cascade = False

    def __init__(self, num_q_heads: int, num_kv_heads: int, head_dim: int,
                 page_size: int, scale: float | None = None,
                 kv_quant: str | None = None, compute_dtype=None,
                 dcp: bool = False):
        self.num_q_heads = num_q_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.page_size = page_size
        self.scale = scale if scale is not None else head_dim**-0.5
        # fp8 KV storage (ops/quant_kv.py): "fp8_e5m2" | "fp8_e4m3" | None.
        self.kv_quant = kv_quant
        # Decode context parallelism (--enable-dcp): context pages shard
        # over the mesh axis with an LSE merge (xla_backend DCP paths);
        # mutually exclusive with cascade decode batches.
        self.dcp = dcp
        if dcp:
            self.supports_cascade = False
        # Zigzag prefill context parallelism (--enable-cp): q blocks shard
        # over the mesh axis (forward_extend_cp).
        self.cp = False
        import jax.numpy as jnp

        self.compute_dtype = compute_dtype or jnp.bfloat16

    def __call__(
        self,
        q: jax.Array,  # [T, nq, hd]
        k: jax.Array,  # [T, nk, hd] new keys
        v: jax.Array,  # [T, nk, hd] new values
        layer_id: int,
        kv,  # tuple of per-layer (k, v) pools, each [NP, ps, 2, F/2]
        fb: ForwardBatch,
        window: int = 0,  # sliding-window size (0 = full attention)
        logit_cap: float = 0.0,  # tanh soft-capping (0 = off)
        scale: float | None = None,  # per-layer scale override
        sinks=None,  # [nq] learned per-head sink logits (GPT-OSS style)
        alibi_slopes=None,  # [nq] ALiBi slopes (Bloom/MPT); xla_native only
    ) -> Tuple[jax.Array, tuple]:
        if window and window > 0 and fb.swa_page_table is not None:
            # Hybrid SWA pool: sliding layers address their own smaller
            # pool through the swa tables (freed slots point at the trash
            # page; the window mask never admits them). Cascade shared
            # pages index the FULL pool — never valid here.
            import dataclasses as _dc

            fb = _dc.replace(
                fb,
                page_table=fb.swa_page_table,
                out_cache_loc=fb.swa_out_cache_loc,
                shared_pages=None,
                shared_len=None,
            )
        kv_layer = self.write_kv(kv[layer_id], k, v, fb)
        if fb.mode.is_mixed():
            # MIXED (ref forward_batch_info.py:98): extend region
            # [0, mixed_tp) through the ragged prefill path, decode tail
            # [mixed_tp, T) through the decode path, one KV write + one
            # MLP over all T tokens. The decode rows' per-seq metadata is
            # gathered via seq_ids (row order is prefill-then-decode, no
            # static seq split).
            fb_p, fb_d, qp, qd = self._mixed_views(q, fb)
            out_p = self.forward_extend(qp, kv_layer, fb_p, window=window,
                                        logit_cap=logit_cap, scale=scale,
                                        sinks=sinks,
                                        alibi_slopes=alibi_slopes)
            out_d = self.forward_decode(qd, kv_layer, fb_d, window=window,
                                        logit_cap=logit_cap, scale=scale,
                                        sinks=sinks,
                                        alibi_slopes=alibi_slopes)
            out = jnp.concatenate([out_p, out_d], axis=0)
        elif fb.mode.is_decode():
            out = self.forward_decode(q, kv_layer, fb, window=window,
                                      logit_cap=logit_cap, scale=scale,
                                      sinks=sinks,
                                        alibi_slopes=alibi_slopes)
        elif fb.spec_tree_mask is not None:
            out = self.forward_tree_verify(q, kv_layer, fb, window=window,
                                           logit_cap=logit_cap, scale=scale,
                                           sinks=sinks,
                                        alibi_slopes=alibi_slopes)
        elif self.cp:
            out = self.forward_extend_cp(q, kv_layer, fb, window=window,
                                         logit_cap=logit_cap, scale=scale,
                                         sinks=sinks,
                                        alibi_slopes=alibi_slopes)
        else:
            out = self.forward_extend(q, kv_layer, fb, window=window,
                                      logit_cap=logit_cap, scale=scale,
                                      sinks=sinks,
                                        alibi_slopes=alibi_slopes)
        kv = kv[:layer_id] + (kv_layer,) + kv[layer_id + 1:]
        return out, kv

    def _mixed_views(self, q, fb: ForwardBatch):
        """Split a MIXED fb at the static token boundary mixed_tp into an
        extend view (per-token fields sliced; block maps already cover only
        the extend region) and a decode view (per-seq metadata gathered by
        the tail tokens' seq_ids — decode-tail padding tokens alias the
        last real row, whose duplicate compute is discarded)."""
        import dataclasses as _dc

        Tp = fb.mixed_tp
        fb_p = _dc.replace(
            fb,
            mode=ForwardMode.EXTEND,
            mixed_tp=0,
            input_ids=fb.input_ids[:Tp],
            positions=fb.positions[:Tp],
            seq_ids=fb.seq_ids[:Tp],
            out_cache_loc=fb.out_cache_loc[:Tp],
            swa_out_cache_loc=(
                fb.swa_out_cache_loc[:Tp]
                if fb.swa_out_cache_loc is not None else None
            ),
            mrope_positions=(
                fb.mrope_positions[:, :Tp]
                if fb.mrope_positions is not None else None
            ),
        )
        dec_sids = fb.seq_ids[Tp:]
        fb_d = _dc.replace(
            fb,
            mode=ForwardMode.DECODE,
            mixed_tp=0,
            input_ids=fb.input_ids[Tp:],
            positions=fb.positions[Tp:],
            seq_ids=dec_sids,
            out_cache_loc=fb.out_cache_loc[Tp:],
            seq_lens=fb.seq_lens[dec_sids],
            q_lens=fb.q_lens[dec_sids],
            prefix_lens=fb.prefix_lens[dec_sids],
            page_table=fb.page_table[dec_sids],
            req_slots=fb.req_slots[dec_sids],
            swa_page_table=(
                fb.swa_page_table[dec_sids]
                if fb.swa_page_table is not None else None
            ),
            swa_out_cache_loc=(
                fb.swa_out_cache_loc[Tp:]
                if fb.swa_out_cache_loc is not None else None
            ),
        )
        return fb_p, fb_d, q[:Tp], q[Tp:]

    def _upcast(self, x):
        """Native-f8 pools (SGLANG_TPU_F8_NATIVE=1, mem/kv_pool.py): gathered
        rows carry the pool's float8 dtype; convert to the compute dtype —
        a plain elementwise XLA fuses into the gather consumer, vs the
        int32-bitcast unpack's broadcast/relayout lowering."""
        if x.dtype in (jnp.float8_e5m2, jnp.float8_e4m3fn):
            return x.astype(self.compute_dtype)
        return x

    def _dequant(self, rows, num_heads=None):
        """Packed int32 rows [..., lanes] -> [..., nh, hd] compute dtype."""
        from sglang_tpu.ops.quant_kv import unpack_f8

        return unpack_f8(rows, num_heads or self.num_kv_heads,
                         self.kv_quant, self.compute_dtype)

    def _dequant_packed(self, rows, num_heads=None):
        """Like _dequant but leaves features in PACKED byte-plane order
        (no interleave -> no relayout of the big gathered arrays); pair
        with to_packed_order(q) / from_packed_order(out)."""
        if not _f8_packed_order():  # A/B toggle (perf experiments)
            return self._dequant(rows, num_heads)
        from sglang_tpu.ops.quant_kv import unpack_f8_packed_order

        return unpack_f8_packed_order(rows, num_heads or self.num_kv_heads,
                                      self.kv_quant, self.compute_dtype)

    def _dp_rows(self, x, sharded: bool = True):
        """DP attention (ref srt/layers/dp_attention.py:46-230, recast as
        GSPMD): constrain the leading batch/token dim onto the "dp" mesh
        axis so XLA partitions the KV gathers + attention math by rows —
        each shard touches only its rows' pages — then gather rows back
        (sharded=False) at the attention/MLP boundary so the MLP runs on
        gathered tokens with tp-sharded weights. One program, no per-rank
        schedulers, no idle-step sync."""
        if not getattr(self, "dp_attn", False):
            return x
        import jax.sharding as jsh
        from jax.sharding import PartitionSpec as _P

        from sglang_tpu.parallel.mesh import AXIS_DP, get_mesh_context

        ctx = get_mesh_context()
        if ctx.dp_size <= 1 or x.shape[0] % ctx.dp_size:
            return x
        spec = _P(AXIS_DP) if sharded else _P()
        return jax.lax.with_sharding_constraint(
            x, jsh.NamedSharding(ctx.mesh, spec)
        )

    def _perm_q(self, q):
        """Permute q's feature dim into packed order (quantized pools)."""
        if not self.kv_quant or not _f8_packed_order():
            return q
        from sglang_tpu.ops.quant_kv import to_packed_order

        return to_packed_order(q)

    def _unperm_out(self, out):
        """Inverse permutation on pv outputs (quantized pools)."""
        if not self.kv_quant or not _f8_packed_order():
            return out
        from sglang_tpu.ops.quant_kv import from_packed_order

        return from_packed_order(out)

    def write_kv(self, kv_layer, k, v, fb: ForwardBatch):
        if self.kv_quant:
            from sglang_tpu.ops.quant_kv import pack_f8

            T = k.shape[0]
            kp, vp = kv_layer
            pages = fb.out_cache_loc // self.page_size
            offs = fb.out_cache_loc % self.page_size
            kr = pack_f8(k.reshape(T, -1), self.num_kv_heads, self.kv_quant)
            vr = pack_f8(v.reshape(T, -1), self.num_kv_heads, self.kv_quant)
            return (kp.at[pages, offs].set(kr), vp.at[pages, offs].set(vr))
        return write_kv_xla(kv_layer, k, v, fb.out_cache_loc, self.page_size)

    def forward_decode(self, q, kv_layer, fb, **kw):
        raise NotImplementedError

    def forward_extend(self, q, kv_layer, fb, **kw):
        raise NotImplementedError

    def forward_tree_verify(self, q, kv_layer, fb, **kw):
        raise NotImplementedError

    def forward_extend_cp(self, q, kv_layer, fb, **kw):
        """Zigzag prefill context parallelism (ref srt/layers/cp/
        zigzag.py:15-28 recast): the batch's q BLOCKS are dealt to mesh
        devices in zigzag order — later blocks attend more context under
        the causal mask, so the boustrophedon deal balances per-chip
        attention FLOPs — and each chip runs this backend's own
        forward_extend over only its blocks (per-token fields permuted;
        per-sequence tables replicated). Exact: block attention is
        independent across blocks given the written KV."""
        import dataclasses as _dc

        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import PartitionSpec as PS

        from sglang_tpu.parallel.mesh import AXIS_TP, get_mesh_context

        ctx = get_mesh_context()
        cpn = ctx.tp_size
        T = q.shape[0]
        align = fb.extend_align
        NB = T // align
        if cpn <= 1 or NB % cpn != 0:
            return self.forward_extend(q, kv_layer, fb, **kw)
        if getattr(self, "cp_strategy", "zigzag") == "interleave":
            # Interleave layout (ref srt/layers/cp/interleave.py:14-26,
            # block-granular here — our extend unit is the aligned q
            # block, the reference's is the token): chip c owns blocks
            # c, c+cpn, c+2cpn, ... A strided deal also mixes early
            # (cheap) and late (expensive) causal blocks per chip.
            order = list(range(NB))
        else:
            # zigzag deal: forward then backward over chips, repeating
            order = []
            fwd = True
            for c0 in range(0, NB, cpn):
                chunk = list(range(c0, c0 + cpn))
                order.extend(chunk if fwd else chunk[::-1])
                fwd = not fwd
        # chip c gets blocks where position-in-deal % cpn pattern lands on c
        perm = np.empty((cpn, NB // cpn), np.int32)
        counts = [0] * cpn
        for slot, blk in enumerate(order):
            c = slot % cpn
            perm[c, counts[c]] = blk
            counts[c] += 1
        rowp = (
            perm[:, :, None] * align + np.arange(align)[None, None, :]
        ).reshape(cpn, -1)  # [cp, T/cp]
        rowp_d = jnp.asarray(rowp)
        perm_d = jnp.asarray(perm)
        qp = q[rowp_d.reshape(-1)].reshape((cpn, T // cpn) + q.shape[1:])
        pos_p = fb.positions[rowp_d]
        sid_p = fb.seq_ids[rowp_d]
        bs_p = fb.block_seq[perm_d]
        bo_p = fb.block_q_off[perm_d]

        def local(qs, pos, sid, bs, bo, fbr, kvl):
            fbl = _dc.replace(
                fbr,
                positions=pos[0],
                seq_ids=sid[0],
                block_seq=bs[0],
                block_q_off=bo[0],
            )
            out = self.forward_extend(qs[0], kvl, fbl, **kw)
            return out[None]

        out = jax.shard_map(
            local,
            mesh=ctx.mesh,
            in_specs=(PS(AXIS_TP), PS(AXIS_TP), PS(AXIS_TP), PS(AXIS_TP),
                      PS(AXIS_TP), PS(), PS()),
            out_specs=PS(AXIS_TP),
            check_vma=False,
        )(qp, pos_p, sid_p, bs_p, bo_p, fb, kv_layer)
        out = out.reshape((T,) + q.shape[1:])
        inv = jnp.zeros(T, jnp.int32).at[rowp_d.reshape(-1)].set(
            jnp.arange(T, dtype=jnp.int32)
        )
        return out[inv]

    # ---- MLA (absorbed multi-head latent attention) ----
    # Ref: srt/models/deepseek_v2.py absorbed decode + MLATokenToKVPool
    # (srt/mem_cache/memory_pool.py:3910). The pool row is the normed
    # latent ++ roped shared k_pe (mla_dim wide); attention is MQA-style:
    # every q head attends the SAME latent rows; the caller absorbs W_UK
    # into q and W_UV out of the result (exact — associativity only).

    def mla(
        self,
        q: jax.Array,  # [T, nh, D] = absorbed-nope ++ roped-pe, D = mla_dim
        rows: jax.Array,  # [T, D] latent rows to cache
        layer_id: int,
        kv,
        fb: ForwardBatch,
        v_dim: int,  # leading slice of the row that acts as V (kv_lora_rank)
        scale: float,
    ):
        latent = self.write_mla(kv[layer_id][0], rows, fb)
        if fb.mode.is_mixed():
            fb_p, fb_d, qp, qd = self._mixed_views(q, fb)
            out = jnp.concatenate(
                [
                    self.forward_mla_extend(qp, latent, fb_p, v_dim=v_dim,
                                            scale=scale),
                    self.forward_mla_decode(qd, latent, fb_d, v_dim=v_dim,
                                            scale=scale),
                ],
                axis=0,
            )
        elif fb.mode.is_decode():
            out = self.forward_mla_decode(q, latent, fb, v_dim=v_dim,
                                          scale=scale)
        else:
            out = self.forward_mla_extend(q, latent, fb, v_dim=v_dim,
                                          scale=scale)
        kv = kv[:layer_id] + ((latent, None),) + kv[layer_id + 1:]
        return out, kv

    def write_mla(self, latent, rows, fb: ForwardBatch):
        T = rows.shape[0]
        pages = fb.out_cache_loc // self.page_size
        offs = fb.out_cache_loc % self.page_size
        if self.kv_quant:
            from sglang_tpu.ops.quant_kv import pack_f8

            return latent.at[pages, offs].set(
                pack_f8(rows, 1, self.kv_quant)
            )
        fh = latent.shape[-1]
        return latent.at[pages, offs].set(
            rows.reshape(T, 2, fh).astype(latent.dtype)
        )

    def forward_mla_decode(self, q, latent, fb, *, v_dim, scale):
        raise NotImplementedError

    def forward_mla_extend(self, q, latent, fb, *, v_dim, scale):
        raise NotImplementedError

    # ---- DSA (DeepSeek Sparse Attention, V3.2) ----
    # Ref: srt/layers/attention/dsa/{dsa_indexer.py,dsa_topk_backend.py} +
    # kernels/ops/attention/dsa (fp8_index / sparse_attention_fwd). The
    # lightning indexer scores every context token with a cheap MQA head
    # (index_head_dim << mla_dim), takes a per-query top-k of positions,
    # and the real MLA attention touches ONLY those latent rows. TPU
    # recast: the index-K cache rides the SECOND slot of the MLA layer
    # tuple (same pages/page table as the latent pool), scoring is a
    # dense masked einsum over the padded context, the top-k is
    # lax.top_k at a STATIC index_topk, and the sparse gather is a
    # take_along_axis over flat slot ids — all static shapes, no
    # data-dependent control flow. The reference's Hadamard
    # rotate_activation is dropped: it is logit-preserving (applied to
    # both q and k) and only aids fp8 quantization, which the bf16 index
    # pool here does not use.

    # HiSparse (mem/hisparse.py): when set, the latent pool is host-side;
    # writes/top-k gathers go through ordered XLA host callbacks and the
    # device kv entry for DSA layers is (None, idx_pool).
    hisparse_pool = None

    def _hisparse_write(self, layer_id: int, rows, fb: ForwardBatch):
        from jax.experimental import io_callback

        io_callback(
            self.hisparse_pool.writer(layer_id),
            jax.ShapeDtypeStruct((), jnp.int32),
            fb.out_cache_loc,
            rows.astype(jnp.float32),
            ordered=True,
        )

    def _hisparse_gather(self, layer_id: int, slots, top_idx, dtype):
        """Host gather of the selected latent rows: [T, K] slot ids ->
        [T, K, D] rows (the TPU analog of the reference's
        swap_in_selected_pages mid-stream copy)."""
        from jax.experimental import io_callback

        sel = jnp.take_along_axis(slots, top_idx, axis=1)
        rows = io_callback(
            self.hisparse_pool.gatherer(layer_id),
            jax.ShapeDtypeStruct(
                sel.shape + (self.hisparse_pool.dim,), jnp.float32
            ),
            sel,
            ordered=True,
        )
        return rows.astype(dtype)

    def mla_sparse(
        self,
        q: jax.Array,       # [T, nh, D] absorbed MLA query
        rows: jax.Array,    # [T, D] latent rows to cache
        idx_q: jax.Array,   # [T, h, d] indexer queries (roped)
        idx_k: jax.Array,   # [T, d] indexer keys (normed + roped)
        gates: jax.Array,   # [T, h] head gates (scales pre-absorbed)
        layer_id: int,
        kv,
        fb: ForwardBatch,
        v_dim: int,
        scale: float,
        index_topk: int,
    ):
        if self.hisparse_pool is not None:
            self._hisparse_write(layer_id, rows, fb)
            latent = None
        else:
            latent = self.write_mla(kv[layer_id][0], rows, fb)
        idx_pool = self._write_plain(kv[layer_id][1], idx_k, fb)
        args = dict(v_dim=v_dim, scale=scale, index_topk=index_topk,
                    layer_id=layer_id)
        if fb.mode.is_mixed():
            fb_p, fb_d, qp, qd = self._mixed_views(q, fb)
            Tp = fb.mixed_tp
            out = jnp.concatenate(
                [
                    self.forward_dsa_extend(
                        qp, latent, idx_pool, idx_q[:Tp], gates[:Tp],
                        fb_p, **args,
                    ),
                    self.forward_dsa_decode(
                        qd, latent, idx_pool, idx_q[Tp:], gates[Tp:],
                        fb_d, **args,
                    ),
                ],
                axis=0,
            )
        elif fb.mode.is_decode():
            out = self.forward_dsa_decode(
                q, latent, idx_pool, idx_q, gates, fb, **args
            )
        else:
            out = self.forward_dsa_extend(
                q, latent, idx_pool, idx_q, gates, fb, **args
            )
        kv = kv[:layer_id] + ((latent, idx_pool),) + kv[layer_id + 1:]
        return out, kv

    def _write_plain(self, pool, rows, fb: ForwardBatch):
        """Unquantized row write into a [NP, ps, 2, d/2] pool (the index-K
        cache stays bf16 even when the latent pool is fp8-packed)."""
        T = rows.shape[0]
        pages = fb.out_cache_loc // self.page_size
        offs = fb.out_cache_loc % self.page_size
        fh = pool.shape[-1]
        return pool.at[pages, offs].set(
            rows.reshape(T, 2, fh).astype(pool.dtype)
        )

    def _dsa_scores(self, idx_q, ik, gates):
        """score[., c] = sum_h gate[., h] * relu(idx_q[., h] . ik[., c])
        (ref fp8_index: relu(q@k) * q_s, summed over heads; the
        n_heads^-0.5 and d^-0.5 factors are pre-absorbed into gates)."""
        s = jnp.einsum(
            "thd,tcd->thc",
            idx_q.astype(jnp.float32),
            ik.astype(jnp.float32),
        )
        return jnp.einsum("thc,th->tc", jax.nn.relu(s),
                          gates.astype(jnp.float32))

    def _dsa_gather_latent(self, latent, slots, top_idx):
        """Gather latent rows at per-row selected context positions.
        slots [T, C] flat slot ids; top_idx [T, K] -> [T, K, D]."""
        sel = jnp.take_along_axis(slots, top_idx, axis=1)  # [T, K]
        pages = sel // self.page_size
        offs = sel % self.page_size
        g = latent[pages, offs]  # [T, K, ...]
        if self.kv_quant:
            return self._dequant(g.reshape(g.shape[0], g.shape[1], -1), 1)
        return g.reshape(g.shape[0], g.shape[1], -1)

    def _dsa_attend(self, q, rows, valid, v_dim, scale):
        """Dense MQA attention over the gathered top-k rows [T, K, D]."""
        scores = jnp.einsum(
            "thd,tkd->thk",
            q.astype(jnp.float32),
            rows.astype(jnp.float32),
        ) * scale
        neg = jnp.float32(-1e30)
        scores = jnp.where(valid[:, None, :], scores, neg)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "thk,tkv->thv", probs, rows[:, :, :v_dim].astype(jnp.float32)
        )
        return out.astype(q.dtype)

    def forward_dsa_decode(self, q, latent, idx_pool, idx_q, gates, fb,
                           *, v_dim, scale, index_topk, layer_id=0):
        from sglang_tpu.mem.kv_pool import kv_flat

        B = q.shape[0]
        pt = fb.page_table
        C = pt.shape[1] * self.page_size
        hp = self.hisparse_pool
        if C <= index_topk and hp is None:
            # Entire padded context fits in the top-k budget: dense path
            # is exact and cheaper (ref _should_skip_logits_computation).
            return self.forward_mla_decode(q, latent, fb, v_dim=v_dim,
                                           scale=scale)
        ikp = kv_flat(idx_pool)
        ik = ikp[pt].reshape(B, C, -1)  # [B, C, d]
        score = self._dsa_scores(idx_q, ik, gates)
        ctx = jnp.arange(C, dtype=jnp.int32)
        neg = jnp.float32(-1e30)
        score = jnp.where(ctx[None, :] < fb.seq_lens[:, None], score, neg)
        # k_eff == C makes the sparse path exact (all positions selected),
        # so hisparse never needs the dense fallback.
        top_vals, top_idx = jax.lax.top_k(score, min(index_topk, C))
        valid = top_vals > neg / 2
        from sglang_tpu.ops.attention.xla_backend import _flat_slot_indices

        slots = _flat_slot_indices(pt, self.page_size)
        if hp is not None:
            rows = self._hisparse_gather(layer_id, slots, top_idx, q.dtype)
        else:
            rows = self._dsa_gather_latent(latent, slots, top_idx)
        return self._dsa_attend(q, rows, valid, v_dim, scale)

    def forward_dsa_extend(self, q, latent, idx_pool, idx_q, gates, fb,
                           *, v_dim, scale, index_topk, layer_id=0):
        from sglang_tpu.mem.kv_pool import kv_flat
        from sglang_tpu.ops.attention.xla_backend import _flat_slot_indices

        T = q.shape[0]
        slots = _flat_slot_indices(fb.page_table, self.page_size)[fb.seq_ids]
        C = slots.shape[1]
        hp = self.hisparse_pool
        if C <= index_topk and hp is None:
            return self.forward_mla_extend(q, latent, fb, v_dim=v_dim,
                                           scale=scale)
        ikp = kv_flat(idx_pool)
        ik = ikp.reshape(-1, ikp.shape[-1])[
            slots.reshape(-1)
        ].reshape(T, C, -1)
        score = self._dsa_scores(idx_q, ik, gates)
        ctx = jnp.arange(C, dtype=jnp.int32)
        neg = jnp.float32(-1e30)
        score = jnp.where(ctx[None, :] <= fb.positions[:, None], score, neg)
        top_vals, top_idx = jax.lax.top_k(score, min(index_topk, C))
        valid = top_vals > neg / 2
        if hp is not None:
            rows = self._hisparse_gather(layer_id, slots, top_idx, q.dtype)
        else:
            rows = self._dsa_gather_latent(latent, slots, top_idx)
        return self._dsa_attend(q, rows, valid, v_dim, scale)


ATTENTION_BACKENDS: Dict[str, Type[AttentionBackend]] = {}


def register_attention_backend(name: str) -> Callable:
    def deco(cls):
        cls.name = name
        ATTENTION_BACKENDS[name] = cls
        return cls

    return deco


def get_attention_backend(name: str) -> Type[AttentionBackend]:
    if name not in ATTENTION_BACKENDS:
        raise ValueError(
            f"unknown attention backend {name!r}; have {sorted(ATTENTION_BACKENDS)}"
        )
    return ATTENTION_BACKENDS[name]
