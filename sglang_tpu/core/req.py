"""Request state machine.

Ref: srt/managers/schedule_batch.py:802 (Req) — fill_ids, prefix_indices,
logprobs, finish reasons. Ours tracks pages instead of token indices and
keeps all device-facing state out (the ScheduleCore builds arrays).
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import Any, Dict, List, Optional

from sglang_tpu.sampling.sampling_params import SamplingParams


class ReqStatus(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    FINISHED = "finished"
    ABORTED = "aborted"


@dataclasses.dataclass
class FinishReason:
    kind: str  # "stop" | "length" | "eos" | "abort"
    matched_token: Optional[int] = None
    matched_str: Optional[str] = None

    def to_json(self):
        if self.kind in ("stop", "eos"):
            d = {"type": "stop"}
            if self.matched_token is not None:
                d["matched"] = self.matched_token
            elif self.matched_str is not None:
                d["matched"] = self.matched_str
            return d
        if self.kind == "length":
            return {"type": "length"}
        return {"type": "abort"}


class Req:
    def __init__(
        self,
        rid: str,
        input_ids: List[int],
        sampling_params: SamplingParams,
        return_logprob: bool = False,
        top_logprobs_num: int = 0,
        eos_token_ids: Optional[set] = None,
        arrival_time: Optional[float] = None,
        lora_id: Optional[str] = None,
        is_embedding: bool = False,
        priority: int = 0,
    ):
        self.rid = rid
        # Higher value = scheduled first & retracted last (ref
        # --enable-priority-scheduling, srt/managers/schedule_policy.py).
        self.priority = priority
        self.input_ids = list(input_ids)
        self.output_ids: List[int] = []
        self.sampling_params = sampling_params
        self.return_logprob = return_logprob
        self.top_logprobs_num = top_logprobs_num
        # GenerateReqInput.return_hidden_states: per generated token the
        # final hidden vector rides StepOutput.hidden_state.
        self.return_hidden_states = False
        # Resolved CustomLogitProcessor instance (or None); applied to
        # this row's logits every step (sampling/custom_logit_processor).
        self.custom_logit_processor = None
        self.eos_token_ids = eos_token_ids or set()
        self.arrival_time = arrival_time or time.time()
        self.lora_id = lora_id
        # Radix keys are salted per adapter: KV computed under a LoRA must
        # never be prefix-shared with the base model or another adapter
        # (ref RadixKey extra_key, srt/mem_cache/radix_cache.py).
        if lora_id:
            import zlib

            self._lora_salt = (
                zlib.crc32(str(lora_id).encode()) & 0x3FFFFFFF
            ) or 1
        else:
            self._lora_salt = 0
        self.is_embedding = is_embedding
        # /v1/score: next-token probabilities at these ids come back
        # through the embedding channel (core._run_encode_batch).
        self.label_token_ids = None
        self.embedding = None

        # Multimodal: precomputed embeddings spliced at placeholder
        # positions (ref srt/managers/mm_utils + multimodal processors).
        # mm_embeds: np [K, H]; mm_positions: K token indices in input_ids;
        # mm_hashes: per-position content hash so the radix cache keys
        # distinguish different images behind identical placeholder ids
        # (ref GenerateReqInput.mm_hashes).
        self.mm_embeds = None
        self.mm_positions = None
        self.mm_hashes = None
        # M-ROPE (Qwen2-VL): [3, len(input_ids)] positions for the prompt
        # and the decode-position delta (models/qwen2_vl.py
        # compute_mrope_positions). None/0 for text-only requests.
        self.mrope_positions = None
        self.mrope_delta = 0
        self._input_cache_ids: Optional[List[int]] = None

        self.status = ReqStatus.WAITING
        self.finish_reason: Optional[FinishReason] = None

        # KV/cache state
        self.pages: List[int] = []  # all pages covering the sequence
        # Hybrid SWA pool: per-slot SWA-pool page ids parallel to `pages`
        # (0 = freed / out-of-window slot). The first swa_adopted slots are
        # tree-owned shadow pages (read-only; released, never freed, by us).
        self.swa_pages: List[int] = []
        self.swa_adopted = 0
        self.swa_adopted_full_pages: List[int] = []
        self._swa_trim_ptr = 0
        self.cached_len = 0  # tree-owned prefix tokens (page-aligned;
        # advances when unfinished-prefill prefixes are inserted)
        self.cached_report = 0  # cache-hit tokens at admission (metrics)
        self.prefill_progress = 0  # tokens already run through prefill
        self.last_node = None  # radix tree node locked by this req
        self.req_slot: Optional[int] = None  # device-resident slot id

        # Outputs
        self.output_logprobs: List[float] = []
        self.output_top_logprobs: List[Any] = []
        self.spec_accepted_tokens = 0

        # Grammar / constrained decoding state (set by grammar backend)
        self.grammar = None

        # Streaming bookkeeping
        self.stream_offset = 0
        self.queue_time: Optional[float] = None
        self.start_time: Optional[float] = None

    # ---- derived ----
    @property
    def seq_len(self) -> int:
        return len(self.input_ids) + len(self.output_ids)

    @property
    def all_ids(self) -> List[int]:
        return self.input_ids + self.output_ids

    def _salt_key(self, t: int) -> int:
        # Bijective per adapter; bit 30 keeps salted keys outside the
        # vocab-id and mm-key ranges (int32-safe for the C++ tree).
        s = self._lora_salt
        if t >= 0:
            return (t ^ s) | 0x40000000
        return -((((-t) ^ s) | 0x40000000))

    @property
    def cache_ids(self) -> List[int]:
        """Token ids used as radix-cache keys (mm- and LoRA-aware)."""
        if self.mm_positions is None and not self._lora_salt:
            return self.all_ids
        if self._input_cache_ids is None:
            ids = list(self.input_ids)
            if self.mm_positions is not None:
                for j, pos in enumerate(self.mm_positions):
                    h = (
                        self.mm_hashes[j]
                        if self.mm_hashes is not None
                        else hash(self.mm_embeds[j].tobytes())
                    )
                    ids[pos] = -(abs(int(h)) % (1 << 30)) - 2  # mm key
            if self._lora_salt:
                ids = [self._salt_key(t) for t in ids]
            self._input_cache_ids = ids
        out = self.output_ids
        if self._lora_salt:
            out = [self._salt_key(t) for t in out]
        return self._input_cache_ids + out

    @property
    def is_prefill_done(self) -> bool:
        # The final prefill chunk also generates the first output token.
        return self.prefill_progress >= len(self.input_ids)

    @property
    def remaining_prefill(self) -> int:
        return len(self.input_ids) - self.prefill_progress

    def finished(self) -> bool:
        return self.status in (ReqStatus.FINISHED, ReqStatus.ABORTED)

    # ---- stop conditions (token-level; string-level lives in detokenizer) ----
    def check_finished(self, new_token: int) -> Optional[FinishReason]:
        sp = self.sampling_params
        if len(self.output_ids) >= sp.max_new_tokens:
            return FinishReason("length")
        if len(self.output_ids) < sp.min_new_tokens:
            return None
        if not sp.ignore_eos and new_token in self.eos_token_ids:
            return FinishReason("eos", matched_token=new_token)
        if sp.stop_token_ids and new_token in sp.stop_token_ids:
            return FinishReason("stop", matched_token=new_token)
        return None

    def __repr__(self):
        return (
            f"Req({self.rid}, in={len(self.input_ids)}, out={len(self.output_ids)}, "
            f"status={self.status.value})"
        )
