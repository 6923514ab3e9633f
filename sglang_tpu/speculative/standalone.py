"""STANDALONE speculative decoding: a small draft MODEL proposes tokens.

Ref: srt/speculative/standalone_worker.py (SpeculativeAlgorithm.STANDALONE,
spec_info.py:30). The draft model runs in its own ModelRunner with its own
KV pool; each round it catches up on the target's accepted tokens (one
ragged extend) and then proposes k tokens greedily (k single-token extends
— host-synced, so no device future-map is needed on the draft side). The
TARGET's verify step (greedy exact acceptance) is shared with NGRAM spec.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional

import numpy as np

from sglang_tpu.mem.allocator import PageAllocator
from sglang_tpu.model_exec.batch_builder import SeqInput, build_forward_batch
from sglang_tpu.model_exec.forward_batch import ForwardMode
from sglang_tpu.utils import cdiv

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class _DraftState:
    pages: List[int]
    kv_len: int = 0  # tokens with draft KV


class StandaloneDraftWorker:
    def __init__(self, server_args, num_draft_tokens: int = 4):
        from sglang_tpu.model_exec.model_runner import ModelRunner
        from sglang_tpu.server_args import ServerArgs
        import dataclasses as dc

        draft_args = dc.replace(
            server_args,
            model_path=server_args.speculative_draft_model_path,
            tokenizer_path=server_args.speculative_draft_model_path,
            enable_lora=False,
            lora_paths=None,
            speculative_algorithm=None,
        )
        self.runner = ModelRunner(draft_args)
        self.page_size = server_args.page_size
        self.allocator = PageAllocator(
            self.runner.kv_pool.config.num_pages, self.page_size
        )
        self.k = num_draft_tokens
        self.states: Dict[str, _DraftState] = {}

    def release(self, rid: str) -> None:
        st = self.states.pop(rid, None)
        if st is not None:
            self.allocator.free(st.pages)

    def _ensure_pages(self, st: _DraftState, target_tokens: int) -> bool:
        need = cdiv(target_tokens, self.page_size) - len(st.pages)
        if need <= 0:
            return True
        pages = self.allocator.alloc(need)
        if pages is None:
            return False
        st.pages.extend(pages)
        return True

    def _run_extend(self, seq_inputs: List[SeqInput]) -> np.ndarray:
        fb = build_forward_batch(
            seq_inputs, self.page_size, ForwardMode.EXTEND,
            trash_slot=self.runner.trash_slot, align=16,
        )
        tokens, _, _ = self.runner.forward_verify(fb)
        return np.asarray(tokens), np.asarray(fb.cu_q_lens)

    def propose_all(self, reqs) -> List[List[int]]:
        """Drafts per request (may be shorter than k on memory pressure)."""
        # 1. catch-up: extend draft KV over target-accepted tokens.
        catchup = []
        active = []
        for req in reqs:
            st = self.states.get(req.rid)
            if st is None:
                st = _DraftState(pages=[])
                self.states[req.rid] = st
            # Accepted-token rollback: target may have rejected tokens the
            # draft already has KV for — those positions get overwritten on
            # the next catch-up, so just clamp the logical length.
            needed = len(req.all_ids) - 1  # KV before the pending last token
            st.kv_len = min(st.kv_len, needed)
            if st.kv_len < needed:
                if not self._ensure_pages(st, needed):
                    continue
                catchup.append(
                    (req, st,
                     SeqInput(req.all_ids[st.kv_len:needed], st.kv_len,
                              st.pages))
                )
        if catchup:
            self._run_extend([c[2] for c in catchup])
            for req, st, si in catchup:
                st.kv_len = len(req.all_ids) - 1
        # 2. k greedy draft steps (host-synced single-token extends).
        for req in reqs:
            st = self.states.get(req.rid)
            if st is not None and not self._ensure_pages(
                st, st.kv_len + 1 + self.k
            ):
                self.release(req.rid)
        drafts: Dict[str, List[int]] = {r.rid: [] for r in reqs}
        current = {
            r.rid: r.all_ids[-1] for r in reqs if r.rid in self.states
        }
        for step in range(self.k):
            batch = []
            order = []
            for req in reqs:
                st = self.states.get(req.rid)
                if st is None or req.rid not in current:
                    continue
                batch.append(
                    SeqInput([current[req.rid]], st.kv_len + step, st.pages)
                )
                order.append(req.rid)
            if not batch:
                break
            tokens, seg = self._run_extend(batch)
            for i, rid in enumerate(order):
                tok = int(tokens[int(seg[i])])
                drafts[rid].append(tok)
                current[rid] = tok
        # Draft KV now extends past kv_len by (1 + k - 1) speculative
        # positions; they are overwritten by the next catch-up as needed.
        return [drafts.get(r.rid, []) for r in reqs]
