"""EAGLE speculative decoding: feature-conditioned one-layer draft head.

Ref: srt/speculative/eagle_worker.py (SpeculativeAlgorithm.EAGLE). Chain
drafts (depth-k greedy path; the reference's top-k tree is a planned
extension — tree verify needs a custom attention mask).

Protocol per round (driven by ScheduleCore._run_spec_verify_step):
  1. propose_all(reqs): k chained draft steps. Step 1 conditions on the
     stored last target feature f_last; later steps chain the draft's own
     output features. All steps are single-token ragged extends through the
     1-layer head with its own paged KV.
  2. Target verify extends over [last_token] + drafts and returns hidden
     states at every position.
  3. observe_and_extend(entries, hidden): after host acceptance, the draft
     head catches up its KV over the m accepted positions using the
     TARGET's features (one ragged extend), and f_last advances.

Draft KV positions written speculatively during propose are overwritten by
the next catch-up (same page slots), mirroring the STANDALONE worker.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.mem.allocator import PageAllocator
from sglang_tpu.mem.kv_pool import KVCachePool, KVPoolConfig
from sglang_tpu.model_exec.batch_builder import SeqInput, build_forward_batch
from sglang_tpu.model_exec.forward_batch import ForwardMode
from sglang_tpu.models.eagle import EagleDraftModel
from sglang_tpu.utils import cdiv

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class _EagleState:
    pages: List[int]
    kv_len: int = 0  # positions with valid draft KV (== target seq len)
    f_last: Optional[jax.Array] = None  # [H] target feature at kv_len-1


class EagleWorker:
    needs_hidden = True  # scheduler taps target hidden states for us

    def __init__(self, server_args, target_runner, num_draft_tokens: int = 4):
        from transformers import AutoConfig

        from sglang_tpu.configs.model_config import ModelConfig
        from sglang_tpu.model_exec.weight_loader import load_model_weights
        from sglang_tpu.ops.attention import get_attention_backend

        self.target = target_runner
        self.page_size = server_args.page_size
        self.k = num_draft_tokens
        # Top-k TREE drafting (ref eagle_worker_v2.py:489 draft, :1492
        # verify): --speculative-eagle-topk > 1 switches propose from a
        # depth-k chain to an EAGLE-2-style per-level beam of `topk` nodes
        # for `speculative_num_steps` draft forwards, pruned to the best
        # `num_draft_tokens` nodes (ancestor-closed) for the verify tree.
        self.topk = int(getattr(server_args, "speculative_eagle_topk", 1) or 1)
        self.steps = int(
            getattr(server_args, "speculative_num_steps", 0)
            or max(num_draft_tokens - 1, 1)
        )
        self.is_tree = self.topk > 1
        self.tree_size = min(num_draft_tokens, 1 + self.topk * self.steps)
        self.budget = max(self.k, 1 + self.topk * self.steps)
        path = server_args.speculative_draft_model_path
        if path and server_args.load_format != "dummy":
            hf = AutoConfig.from_pretrained(
                path, trust_remote_code=server_args.trust_remote_code
            )
            cfg = ModelConfig.from_hf(hf, dtype=server_args.dtype,
                                      model_path=path)
        else:
            # Dummy head with the target's geometry (tests / benches).
            cfg = dataclasses.replace(
                target_runner.model_config, num_hidden_layers=1
            )
        self.config = cfg
        if getattr(cfg.hf_config, "kv_lora_rank", 0):
            # DeepSeek targets draft through the trained MTP/NextN head
            # (models/deepseek_nextn.py; ref srt/models/deepseek_nextn.py).
            from sglang_tpu.models.deepseek_nextn import DeepseekNextN

            self.model = DeepseekNextN(cfg)
        else:
            self.model = EagleDraftModel(cfg)
        fmt = "auto"
        if not path or server_args.load_format == "dummy":
            fmt = "dummy"
        self.params = load_model_weights(
            self.model,
            self.model.param_specs(),
            target_runner.mesh_ctx,
            path or "__eagle_dummy__",
            load_format=fmt,
            seed=server_args.random_seed + 1,
        )
        num_pages = target_runner.kv_pool.config.num_pages
        pool_cfg = KVPoolConfig(
            num_layers=1,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            page_size=self.page_size,
            num_pages=num_pages,
            dtype=target_runner.kv_pool.config.dtype,
            mla_dim=int(getattr(self.model, "mla_dim", 0) or 0),
        )
        self.kv_pool = KVCachePool(pool_cfg, target_runner.mesh_ctx)
        self.allocator = PageAllocator(num_pages, self.page_size)
        backend_cls = get_attention_backend(
            server_args.attention_backend
            or ("pallas" if jax.default_backend() == "tpu" else "xla_native")
        )
        self.backend = backend_cls(
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
            self.page_size,
        )
        self.states: Dict[str, _EagleState] = {}
        self._extend = jax.jit(
            self._extend_impl, donate_argnums=(2,),
            static_argnames=("want_tokens", "topk"),
        )
        # On-device expansion (ref eagle_worker_v2.py:489 recast): the
        # per-level candidate selection / ancestor-mask growth / next-level
        # batch construction all run inside jit, so a k-level round
        # dispatches k async device calls and host-syncs ONCE at the end
        # (the r4 round was dominated by per-level np.asarray round trips
        # through the tunnel — PERF_NOTES "Spec round re-measure").
        self._tree_root = jax.jit(self._tree_root_impl, donate_argnums=(2,))
        self._tree_level = jax.jit(
            self._tree_level_impl, donate_argnums=(2, 6, 7, 8, 9, 10),
        )
        self._chain_step = jax.jit(self._chain_step_impl,
                                   donate_argnums=(2,))
        self._zeros_f = jnp.zeros(cfg.hidden_size, jnp.float32)

    # ------------------------------------------------------------- plumbing
    def _extend_impl(self, dparams, tparams, kv, fb, aux,
                     logit_rows=None, want_tokens: bool = True,
                     topk: int = 0):
        hidden, kv = self.model(dparams, fb, kv, self.backend, aux)
        if not want_tokens and not topk:
            return kv, None, hidden
        # Draft levels extend 1-2 REAL tokens per sequence but pad each
        # segment to the 16-row extend alignment; the 128k-vocab head over
        # every padded row was ~270 GFLOP/level of pure waste (PERF_NOTES
        # r3 "Tree-speculation round cost"). Gather the real frontier rows
        # first: the head and top-k run on B*w rows instead of B*16.
        sel = hidden if logit_rows is None else hidden[logit_rows]
        logits = self.target.model.compute_logits(tparams, sel).astype(
            jnp.float32
        )
        if topk:
            # top-k draft candidates + their LOGPROBS (cumulative scores
            # drive the EAGLE-2-style per-level beam selection).
            vals, idx = jax.lax.top_k(logits, topk)
            lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
            return kv, (vals - lse, idx.astype(jnp.int32)), hidden
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return kv, tokens, hidden

    def _run_extend(self, seq_inputs, aux, want_tokens=True, topk=0,
                    logit_rows=None):
        fb = build_forward_batch(
            seq_inputs, self.page_size, ForwardMode.EXTEND, align=16,
        )
        T = fb.padded_num_tokens
        if aux.shape[0] != T:
            pad = jnp.zeros((T - aux.shape[0], aux.shape[1]), aux.dtype)
            aux = jnp.concatenate([aux, pad], axis=0)
        kv, tokens, hidden = self._extend(
            self.params, self.target.params, self.kv_pool.kv, fb, aux,
            logit_rows=(None if logit_rows is None
                        else jnp.asarray(logit_rows, jnp.int32)),
            want_tokens=want_tokens, topk=topk,
        )
        self.kv_pool.swap(kv)
        return tokens, hidden, np.asarray(fb.cu_q_lens)

    # ------------------------------------------- on-device expansion
    def _spec_fb(self, input_ids, positions, page_table, prefix, slot0,
                 q, mode, tree_mask=None):
        """Build a ForwardBatch inside jit for a uniform q-rows-per-seq
        draft step. slot0 [B]: first KV slot this step writes."""
        from sglang_tpu.model_exec.forward_batch import ForwardBatch

        B = page_table.shape[0]
        T = B * q
        ps = self.page_size
        j = jnp.arange(q, dtype=jnp.int32)
        slot = (slot0[:, None] + j[None, :])  # [B, q]
        page = jnp.take_along_axis(page_table, slot // ps, axis=1)
        loc = (page * ps + slot % ps).reshape(T)
        bidx = jnp.arange(B, dtype=jnp.int32)
        return ForwardBatch(
            input_ids=input_ids.reshape(T),
            positions=positions.reshape(T),
            seq_lens=slot0 + q,
            q_lens=jnp.full((B,), q, jnp.int32),
            cu_q_lens=jnp.arange(B + 1, dtype=jnp.int32) * q,
            seq_ids=jnp.repeat(bidx, q),
            page_table=page_table,
            out_cache_loc=loc,
            logits_indices=bidx * q + (q - 1),
            num_seqs=jnp.asarray(B, jnp.int32),
            req_slots=jnp.zeros(B, jnp.int32),
            block_seq=jnp.zeros(1, jnp.int32),
            block_q_off=jnp.zeros(1, jnp.int32),
            prefix_lens=prefix,
            spec_tree_mask=tree_mask,
            mode=mode,
            extend_align=1,
        )

    def _tree_root_impl(self, dparams, tparams, kv, page_table, prefix,
                        root_tok, aux0):
        """Root extend + the level-1 children selection, all on device."""
        K = self.topk
        N = 1 + self.steps * K
        B = page_table.shape[0]
        mask = jnp.zeros((B, 1, N), jnp.bool_).at[:, 0, 0].set(True)
        fb = self._spec_fb(root_tok, prefix, page_table, prefix, prefix,
                           1, ForwardMode.EXTEND, tree_mask=mask)
        hidden, kv = self.model(dparams, fb, kv, self.backend, aux0)
        logits = self.target.model.compute_logits(
            tparams, hidden
        ).astype(jnp.float32)
        vals, idx = jax.lax.top_k(logits, K)  # [B, K]
        lp = vals - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        tokens = jnp.zeros((B, N), jnp.int32).at[:, 0].set(
            root_tok
        ).at[:, 1:K + 1].set(idx.astype(jnp.int32))
        parents = jnp.full((B, N), -1, jnp.int32).at[:, 1:K + 1].set(0)
        scores = jnp.zeros((B, N), jnp.float32).at[:, 1:K + 1].set(lp)
        eye = jnp.eye(N, dtype=jnp.bool_)
        amask = jnp.broadcast_to(eye, (B, N, N))
        # children see the root (node 0) and themselves
        amask = amask.at[:, 1:K + 1, 0].set(True)
        aux_next = jnp.broadcast_to(
            hidden.astype(jnp.float32)[:, None, :], (B, K, hidden.shape[-1])
        )
        return kv, tokens, parents, scores, amask, aux_next

    def _tree_level_impl(self, dparams, tparams, kv, page_table, prefix,
                         level, tokens, parents, scores, amask, aux):
        """Extend the level-`level` frontier (K nodes/seq) and append the
        level+1 children. `level` is traced: one compile serves all
        levels."""
        K = self.topk
        N = tokens.shape[1]
        B = page_table.shape[0]
        first = 1 + (level - 1) * K
        frontier_tok = jax.lax.dynamic_slice(tokens, (0, first), (B, K))
        fscores = jax.lax.dynamic_slice(scores, (0, first), (B, K))
        fmask = jax.lax.dynamic_slice(amask, (0, first, 0), (B, K, N))
        positions = jnp.broadcast_to(
            (prefix + level)[:, None], (B, K)
        )
        fb = self._spec_fb(frontier_tok, positions, page_table, prefix,
                           prefix + first, K, ForwardMode.EXTEND,
                           tree_mask=fmask)
        hidden, kv = self.model(dparams, fb, kv, self.backend,
                                aux.reshape(B * K, -1))
        logits = self.target.model.compute_logits(
            tparams, hidden
        ).astype(jnp.float32)
        vals, idx = jax.lax.top_k(logits, K)  # [B*K, K]
        lp = (vals - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
              ).reshape(B, K, K)
        idx = idx.reshape(B, K * K)
        cand = (fscores[:, :, None] + lp).reshape(B, K * K)
        cvals, ci = jax.lax.top_k(cand, K)  # [B, K] best children
        parent_local = (ci // K).astype(jnp.int32)
        tok_new = jnp.take_along_axis(idx, ci, axis=1).astype(jnp.int32)
        n0 = first + K
        tokens = jax.lax.dynamic_update_slice(tokens, tok_new, (0, n0))
        parents = jax.lax.dynamic_update_slice(
            parents, first + parent_local, (0, n0)
        )
        scores = jax.lax.dynamic_update_slice(scores, cvals, (0, n0))
        parent_rows = jnp.take_along_axis(
            fmask, parent_local[:, :, None], axis=1
        )  # [B, K, N]
        self_cols = (jnp.arange(N)[None, None, :]
                     == (n0 + jnp.arange(K, dtype=jnp.int32))[None, :, None])
        amask = jax.lax.dynamic_update_slice(
            amask, parent_rows | self_cols, (0, n0, 0)
        )
        hid = hidden.astype(jnp.float32).reshape(B, K, -1)
        aux_next = jnp.take_along_axis(
            hid, parent_local[:, :, None], axis=1
        )
        return kv, tokens, parents, scores, amask, aux_next

    def _chain_step_impl(self, dparams, tparams, kv, page_table, base_len,
                         step, tok, aux):
        """One chained greedy draft step as a decode-mode forward."""
        B = page_table.shape[0]
        pos = base_len + step  # [B]
        fb = self._spec_fb(tok, pos, page_table, pos, pos, 1,
                           ForwardMode.DECODE)
        hidden, kv = self.model(dparams, fb, kv, self.backend,
                                aux.astype(jnp.float32))
        logits = self.target.model.compute_logits(
            tparams, hidden
        ).astype(jnp.float32)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return kv, nxt, hidden.astype(jnp.float32)

    def _spec_tables(self, active):
        """Padded [Bp, P] page table + per-seq prefix/root arrays."""
        from sglang_tpu.model_exec.batch_builder import (
            DEFAULT_DECODE_BS_BUCKETS,
            PAGE_BUCKETS,
        )
        from sglang_tpu.utils import bucketize

        B = len(active)
        Bp = bucketize(B, DEFAULT_DECODE_BS_BUCKETS)
        maxp = max(len(self.states[r.rid].pages) for r in active)
        P = bucketize(max(maxp, 1), PAGE_BUCKETS)
        pt = np.zeros((Bp, P), np.int32)
        prefix = np.zeros(Bp, np.int32)
        root = np.zeros(Bp, np.int32)
        for i, r in enumerate(active):
            st = self.states[r.rid]
            pt[i, : len(st.pages)] = st.pages
            prefix[i] = st.kv_len
            root[i] = r.all_ids[-1]
        return (jnp.asarray(pt), jnp.asarray(prefix), jnp.asarray(root), Bp)

    def release(self, rid: str) -> None:
        st = self.states.pop(rid, None)
        if st is not None:
            self.allocator.free(st.pages)

    def _ensure_pages(self, st: _EagleState, target_tokens: int) -> bool:
        need = cdiv(target_tokens, self.page_size) - len(st.pages)
        if need <= 0:
            return True
        pages = self.allocator.alloc(need)
        if pages is None:
            return False
        st.pages.extend(pages)
        return True

    # ------------------------------------------------------------ the round
    def observe_and_extend(self, entries, hidden) -> None:
        """entries: (req, prefix, rows_or_seg, m) — the target just computed
        features for positions [prefix, prefix+m). rows_or_seg is either
        the segment start (consecutive hidden rows, chain/prefill case) or
        an np.ndarray of m explicit hidden-row indices (tree verify: the
        accepted path's node rows, last one = the new f_last).
        Catch the draft KV up over those positions."""
        batch = []
        aux_parts = []
        done = []
        for req, prefix, seg, m in entries:
            if m <= 0:
                continue
            st = self.states.get(req.rid)
            if st is None:
                st = _EagleState(pages=[])
                self.states[req.rid] = st
            if st.kv_len != prefix:
                # lost sync (e.g. worker attached mid-request) — restart at
                # the next full prefill; drop drafts for now.
                if prefix == 0 or st.kv_len > prefix:
                    st.kv_len = min(st.kv_len, prefix)
                if st.kv_len != prefix:
                    continue
            end = prefix + m
            if not self._ensure_pages(st, end + 1 + self.budget):
                self.release(req.rid)
                continue
            tokens = req.all_ids[prefix:end]
            if len(tokens) < m:
                continue
            f_prev = st.f_last if st.f_last is not None else self._zeros_f
            # aux rows for positions [prefix, end): f_{prefix-1}..f_{end-2}
            rows = [f_prev.astype(jnp.float32)[None]]
            if isinstance(seg, np.ndarray):
                if m > 1:
                    rows.append(
                        hidden[jnp.asarray(seg[: m - 1], np.int32)].astype(
                            jnp.float32
                        )
                    )
                f_new = hidden[int(seg[m - 1])]
            else:
                if m > 1:
                    rows.append(
                        jax.lax.dynamic_slice_in_dim(
                            hidden, seg, m - 1
                        ).astype(jnp.float32)
                    )
                f_new = hidden[seg + m - 1]
            aux_parts.append((jnp.concatenate(rows, axis=0), m))
            batch.append(SeqInput(tokens, prefix, st.pages))
            done.append((st, end, f_new))
        if not batch:
            return
        # Assemble padded aux matching the align=16 ragged layout.
        aux_rows = []
        off = 0
        for part, m in aux_parts:
            aux_rows.append(part)
            padm = (-m) % 16
            if padm:
                aux_rows.append(jnp.zeros((padm, part.shape[1]), part.dtype))
        aux = jnp.concatenate(aux_rows, axis=0)
        self._run_extend(batch, aux, want_tokens=False)
        for st, end, f in done:
            st.kv_len = end
            st.f_last = f

    def propose_tree(self, reqs) -> List[Optional["TreeDraft"]]:
        """EAGLE top-k tree drafts (ref eagle_worker_v2.py:489).

        Per draft forward, every active request extends its current
        `topk`-node frontier level (one tree-masked ragged extend over the
        draft head), takes top-k children of each node, and keeps the best
        `topk` by cumulative draft logprob. After `steps` forwards the
        node pool is pruned to `tree_size - 1` best nodes (ancestor-closed
        because a child's score is below its parent's) and returned as a
        TreeDraft for the target's tree verify."""
        from sglang_tpu.speculative.tree import TreeDraft

        out: List[Optional[TreeDraft]] = [None] * len(reqs)
        active = []
        for req in reqs:
            st = self.states.get(req.rid)
            if (
                st is None
                or st.f_last is None
                or st.kv_len != len(req.all_ids) - 1
                or not self._ensure_pages(st, st.kv_len + 1 + self.budget)
            ):
                continue
            active.append(req)
        if not active:
            return out
        import os

        if os.environ.get("SGLANG_TPU_SPEC_EXPAND", "device") == "device":
            return self._propose_tree_device(reqs, active, out)
        K = self.topk
        B = len(active)
        prefix = {r.rid: self.states[r.rid].kv_len for r in active}

        # per-seq node lists (index 0 = root)
        tokens = {r.rid: [r.all_ids[-1]] for r in active}
        parents = {r.rid: [-1] for r in active}
        depths = {r.rid: [0] for r in active}
        scores = {r.rid: [0.0] for r in active}
        # ancestor masks grown incrementally: [n_nodes, n_nodes] bool
        amask = {r.rid: np.ones((1, 1), np.bool_) for r in active}

        def run_level(level, frontier_rows_aux):
            """frontier node ids = [first_id, first_id + w); returns
            (lp, idx, hidden, seg)."""
            first_id = 1 + (level - 1) * K if level > 0 else 0
            w = K if level > 0 else 1
            seq_inputs = []
            for r in active:
                st = self.states[r.rid]
                p = prefix[r.rid]
                ids = list(range(first_id, first_id + w))
                tk = [tokens[r.rid][i] for i in ids]
                dep = np.asarray(
                    [depths[r.rid][i] for i in ids], np.int32
                )
                rk = first_id + w
                tm = amask[r.rid][first_id:first_id + w, :rk]
                seq_inputs.append(
                    SeqInput(
                        tk, p, st.pages,
                        custom_positions=p + dep,
                        tree_mask=tm,
                        slot_base=p + first_id,
                    )
                )
            # head/top-k on the REAL frontier rows only (compact output:
            # row i*w + j = sequence i, frontier offset j)
            segs = []
            off = 0
            for si in seq_inputs:
                segs.extend(off + j for j in range(w))
                off += 16 * ((len(si.new_token_ids) + 15) // 16)
            return self._run_extend(
                seq_inputs, frontier_rows_aux, want_tokens=False, topk=K,
                logit_rows=segs,
            )

        # --- root forward ---
        aux_rows = []
        for r in active:
            aux_rows.append(
                self.states[r.rid].f_last.astype(jnp.float32)[None]
            )
            aux_rows.append(jnp.zeros((15, aux_rows[-1].shape[1]),
                                      jnp.float32))
        aux = jnp.concatenate(aux_rows, axis=0)
        (lp_d, idx_d), hidden, seg = run_level(0, aux)
        lp_np = np.asarray(lp_d)  # COMPACT rows: [B*w, K]
        idx_np = np.asarray(idx_d)
        # node -> hidden row (in the LAST extend that computed it)
        node_row = {r.rid: {0: int(seg[i])} for i, r in enumerate(active)}
        # node -> compact logits row of the extend that computed it
        lp_row = {r.rid: {0: i} for i, r in enumerate(active)}

        for level in range(1, self.steps + 1):
            # children of the previous frontier
            for i, r in enumerate(active):
                rid = r.rid
                n0 = len(tokens[rid])
                if level == 1:
                    cand = [(float(lp_np[lp_row[rid][0], j]),
                             int(idx_np[lp_row[rid][0], j]), 0)
                            for j in range(K)]
                else:
                    cand = []
                    first = 1 + (level - 2) * K
                    for fi in range(first, first + K):
                        rrow = lp_row[rid][fi]
                        for j in range(K):
                            cand.append((
                                scores[rid][fi] + float(lp_np[rrow, j]),
                                int(idx_np[rrow, j]), fi,
                            ))
                    cand.sort(key=lambda c: -c[0])
                    cand = cand[:K]
                n_new = len(cand)
                # grow the ancestor mask
                old = amask[rid]
                grown = np.zeros((n0 + n_new, n0 + n_new), np.bool_)
                grown[:n0, :n0] = old
                for j, (sc, tok, par) in enumerate(cand):
                    nid = n0 + j
                    tokens[rid].append(tok)
                    parents[rid].append(par)
                    depths[rid].append(depths[rid][par] + 1)
                    scores[rid].append(sc)
                    grown[nid] = grown[par] | (
                        np.arange(n0 + n_new) == nid
                    )
                    grown[nid, nid] = True
                amask[rid] = grown
            if level == self.steps:
                break
            # extend the new frontier through the draft head
            first_id = 1 + (level - 1) * K
            aux_rows = []
            idx_list = []
            for i, r in enumerate(active):
                rid = r.rid
                prs = [node_row[rid][int(parents[rid][first_id + j])]
                       for j in range(K)]
                idx_list.extend(prs)
                idx_list.extend([prs[-1]] * ((-K) % 16))
            aux = hidden[jnp.asarray(idx_list, np.int32)].astype(jnp.float32)
            (lp_d, idx_d), hidden, seg = run_level(level, aux)
            lp_np = np.asarray(lp_d)
            idx_np = np.asarray(idx_d)
            for i, r in enumerate(active):
                for j in range(K):
                    node_row[r.rid][first_id + j] = int(seg[i]) + j
                    lp_row[r.rid][first_id + j] = i * K + j
        # --- prune to tree_size and emit TreeDrafts ---
        keep = self.tree_size - 1
        pos_of = {r.rid: i for i, r in enumerate(reqs)}
        for r in active:
            rid = r.rid
            n = len(tokens[rid])
            order = sorted(range(1, n), key=lambda i: -scores[rid][i])
            chosen: set = set()
            for i in order:
                if len(chosen) >= keep:
                    break
                # ancestor closure (ties can break score monotonicity)
                path = []
                j = i
                while j > 0 and j not in chosen:
                    path.append(j)
                    j = parents[rid][j]
                if len(chosen) + len(path) <= keep:
                    chosen.update(path)
            sel = sorted(chosen)  # creation order == topological
            remap = {0: 0}
            for newid, old in enumerate(sel, start=1):
                remap[old] = newid
            out[pos_of[rid]] = TreeDraft(
                tokens=[tokens[rid][0]] + [tokens[rid][i] for i in sel],
                parents=np.asarray(
                    [-1] + [remap[parents[rid][i]] for i in sel], np.int32
                ),
                depths=np.asarray(
                    [0] + [depths[rid][i] for i in sel], np.int32
                ),
                scores=np.asarray(
                    [0.0] + [scores[rid][i] for i in sel], np.float32
                ),
            )
        return out

    def _propose_tree_device(self, reqs, active, out):
        """Device-side tree expansion: dispatches `steps` async draft
        forwards (selection/masks/batch-build inside jit) and host-syncs
        once, vs one round trip per level on the host path."""
        from sglang_tpu.speculative.tree import TreeDraft

        K = self.topk
        B = len(active)
        pt, prefix, root, Bp = self._spec_tables(active)
        aux0 = jnp.stack(
            [self.states[r.rid].f_last.astype(jnp.float32) for r in active]
            + [self._zeros_f] * (Bp - B)
        )
        kv, tokens, parents, scores, amask, aux = self._tree_root(
            self.params, self.target.params, self.kv_pool.kv, pt, prefix,
            root, aux0,
        )
        for level in range(1, self.steps):
            kv, tokens, parents, scores, amask, aux = self._tree_level(
                self.params, self.target.params, kv, pt, prefix,
                jnp.asarray(level, jnp.int32), tokens, parents, scores,
                amask, aux,
            )
        self.kv_pool.swap(kv)
        # ONE host sync for the whole round.
        tok_np, par_np, sc_np = jax.device_get((tokens, parents, scores))
        keep = self.tree_size - 1
        pos_of = {r.rid: i for i, r in enumerate(reqs)}
        N = tok_np.shape[1]
        for bi, r in enumerate(active):
            toks, pars, scs = tok_np[bi], par_np[bi], sc_np[bi]
            order = sorted(range(1, N), key=lambda i: -scs[i])
            chosen: set = set()
            for i in order:
                if len(chosen) >= keep:
                    break
                path = []
                j = i
                while j > 0 and j not in chosen:
                    path.append(j)
                    j = int(pars[j])
                if len(chosen) + len(path) <= keep:
                    chosen.update(path)
            sel = sorted(chosen)
            remap = {0: 0}
            for newid, old in enumerate(sel, start=1):
                remap[old] = newid
            depth = lambda n: 0 if n == 0 else (n - 1) // K + 1  # noqa: E731
            out[pos_of[r.rid]] = TreeDraft(
                tokens=[int(toks[0])] + [int(toks[i]) for i in sel],
                parents=np.asarray(
                    [-1] + [remap[int(pars[i])] for i in sel], np.int32
                ),
                depths=np.asarray(
                    [0] + [depth(i) for i in sel], np.int32
                ),
                scores=np.asarray(
                    [0.0] + [float(scs[i]) for i in sel], np.float32
                ),
            )
        return out

    def propose_all(self, reqs) -> List[List[int]]:
        """k chained greedy draft tokens per request (possibly empty)."""
        drafts: Dict[str, List[int]] = {r.rid: [] for r in reqs}
        active = []
        for req in reqs:
            st = self.states.get(req.rid)
            if (
                st is None
                or st.f_last is None
                or st.kv_len != len(req.all_ids) - 1
                or not self._ensure_pages(st, st.kv_len + 1 + self.k)
            ):
                continue
            active.append(req)
        if not active:
            return [drafts[r.rid] for r in reqs]
        import os

        if os.environ.get("SGLANG_TPU_SPEC_EXPAND", "device") == "device":
            pt, prefix, root, Bp = self._spec_tables(active)
            aux = jnp.stack(
                [self.states[r.rid].f_last.astype(jnp.float32)
                 for r in active]
                + [self._zeros_f] * (Bp - len(active))
            )
            kv = self.kv_pool.kv
            tok = root
            toks = []
            for step in range(self.k):
                kv, tok, aux = self._chain_step(
                    self.params, self.target.params, kv, pt, prefix,
                    jnp.asarray(step, jnp.int32), tok, aux,
                )
                toks.append(tok)
            self.kv_pool.swap(kv)
            all_tok = np.asarray(jnp.stack(toks))  # [k, Bp]; ONE sync
            for i, req in enumerate(active):
                drafts[req.rid] = [int(all_tok[s, i]) for s in range(self.k)]
            return [drafts[r.rid] for r in reqs]
        current = {r.rid: r.all_ids[-1] for r in active}
        aux_bank = jnp.stack(
            [self.states[r.rid].f_last.astype(jnp.float32) for r in active]
        )  # [B, H]
        for step in range(self.k):
            batch = []
            for req in active:
                st = self.states[req.rid]
                batch.append(
                    SeqInput([current[req.rid]], st.kv_len + step, st.pages)
                )
            # one token per seq, align=16 -> each seq segment is one padded
            # 16-block; aux row sits at each segment start.
            aux_rows = []
            for i in range(len(active)):
                aux_rows.append(aux_bank[i:i + 1])
                aux_rows.append(jnp.zeros((15, aux_bank.shape[1]),
                                          aux_bank.dtype))
            aux = jnp.concatenate(aux_rows, axis=0)
            starts_lr = [16 * i for i in range(len(active))]
            tokens_dev, hidden_dev, seg = self._run_extend(
                batch, aux, want_tokens=True, logit_rows=starts_lr
            )
            tokens = np.asarray(tokens_dev)  # compact [B]
            starts = [int(seg[i]) for i in range(len(active))]
            for i, req in enumerate(active):
                tok = int(tokens[i])
                drafts[req.rid].append(tok)
                current[req.rid] = tok
            aux_bank = hidden_dev[jnp.asarray(starts, jnp.int32)].astype(
                jnp.float32
            )
        return [drafts[r.rid] for r in reqs]
