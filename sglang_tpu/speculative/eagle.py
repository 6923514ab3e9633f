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
            static_argnames=("want_tokens",),
        )
        self._zeros_f = jnp.zeros(cfg.hidden_size, jnp.float32)

    # ------------------------------------------------------------- plumbing
    def _extend_impl(self, dparams, tparams, kv, fb, aux,
                     want_tokens: bool = True):
        hidden, kv = self.model(dparams, fb, kv, self.backend, aux)
        if not want_tokens:
            return kv, None, hidden
        logits = self.target.model.compute_logits(tparams, hidden)
        tokens = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(
            jnp.int32
        )
        return kv, tokens, hidden

    def _run_extend(self, seq_inputs, aux, want_tokens=True):
        fb = build_forward_batch(
            seq_inputs, self.page_size, ForwardMode.EXTEND, align=16,
        )
        T = fb.padded_num_tokens
        if aux.shape[0] != T:
            pad = jnp.zeros((T - aux.shape[0], aux.shape[1]), aux.dtype)
            aux = jnp.concatenate([aux, pad], axis=0)
        kv, tokens, hidden = self._extend(
            self.params, self.target.params, self.kv_pool.kv, fb, aux,
            want_tokens=want_tokens,
        )
        self.kv_pool.swap(kv)
        return tokens, hidden, np.asarray(fb.cu_q_lens)

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
        """entries: (req, prefix, seg_off, m) — the target just computed
        features for positions [prefix, prefix+m) at hidden[seg_off:...].
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
            if not self._ensure_pages(st, end + 1 + self.k):
                self.release(req.rid)
                continue
            tokens = req.all_ids[prefix:end]
            if len(tokens) < m:
                continue
            f_prev = st.f_last if st.f_last is not None else self._zeros_f
            # aux rows for positions [prefix, end): f_{prefix-1}..f_{end-2}
            rows = [f_prev.astype(jnp.float32)[None]]
            if m > 1:
                rows.append(
                    jax.lax.dynamic_slice_in_dim(hidden, seg, m - 1).astype(
                        jnp.float32
                    )
                )
            aux_parts.append((jnp.concatenate(rows, axis=0), m))
            batch.append(SeqInput(tokens, prefix, st.pages))
            done.append((st, end, hidden[seg + m - 1]))
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
            tokens_dev, hidden_dev, seg = self._run_extend(
                batch, aux, want_tokens=True
            )
            tokens = np.asarray(tokens_dev)
            starts = [int(seg[i]) for i in range(len(active))]
            for i, req in enumerate(active):
                tok = int(tokens[starts[i]])
                drafts[req.rid].append(tok)
                current[req.rid] = tok
            aux_bank = hidden_dev[jnp.asarray(starts, jnp.int32)].astype(
                jnp.float32
            )
        return [drafts[r.rid] for r in reqs]
