"""DetokenizerManager: incremental detokenization stream.

Ref: srt/managers/detokenizer_manager.py:91 (event_loop:166,
trim_matched_stop:176). Sits between the Scheduler and TokenizerManager:
turns per-step token batches into UTF-8-safe text deltas, holds back
possible stop-string prefixes, and trims matched stops on finish.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional

import zmq

from sglang_tpu.managers.io_struct import BatchStrOut, BatchTokenOut
from sglang_tpu.managers.zmq_utils import make_socket, recv_pyobj, send_pyobj

logger = logging.getLogger(__name__)


class IncrementalDecoder:
    """UTF-8-safe incremental detokenization (the standard two-offset walk)."""

    def __init__(self, tokenizer, skip_special: bool, spaces_between: bool):
        self.tokenizer = tokenizer
        self.skip_special = skip_special
        self.spaces_between = spaces_between
        self.tokens: List[int] = []
        self.prefix_offset = 0
        self.read_offset = 0

    def _decode(self, ids: List[int]) -> str:
        return self.tokenizer.decode(
            ids,
            skip_special_tokens=self.skip_special,
            spaces_between_special_tokens=self.spaces_between,
        )

    def step(self, new_tokens: List[int]) -> str:
        self.tokens.extend(new_tokens)
        if self.tokenizer is None:  # skip_tokenizer_init: ids only
            return ""
        prefix_text = self._decode(self.tokens[self.prefix_offset : self.read_offset])
        full_text = self._decode(self.tokens[self.prefix_offset :])
        if len(full_text) > len(prefix_text) and not full_text.endswith("�"):
            delta = full_text[len(prefix_text) :]
            self.prefix_offset = self.read_offset
            self.read_offset = len(self.tokens)
            return delta
        return ""


@dataclasses.dataclass
class _ReqDecodeState:
    decoder: IncrementalDecoder
    full_text: str = ""
    emitted: int = 0  # chars already sent out
    hold_back: int = 0  # chars held for potential stop-string prefix


class DetokenizerCore:
    """Transport-free detokenization logic (testable directly)."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self.states: Dict[str, _ReqDecodeState] = {}

    def process(self, batch: BatchTokenOut) -> BatchStrOut:
        out = BatchStrOut(
            rids=[], delta_texts=[], output_ids=[], finish_reasons=[],
            logprobs=[], top_logprobs=[], completion_tokens=[],
            cached_tokens=[], prompt_tokens=[], embeddings=[],
        )
        for i, rid in enumerate(batch.rids):
            if batch.embeddings[i] is not None:
                out.rids.append(rid)
                out.delta_texts.append("")
                out.output_ids.append([])
                out.finish_reasons.append(batch.finish_reasons[i])
                out.logprobs.append(None)
                out.top_logprobs.append(None)
                out.completion_tokens.append(0)
                out.cached_tokens.append(batch.cached_tokens[i])
                out.prompt_tokens.append(batch.prompt_tokens[i])
                out.embeddings.append(batch.embeddings[i])
                out.hidden_states.append(None)
                continue
            st = self.states.get(rid)
            if st is None:
                stop_strs = batch.stop_strs[i] or []
                st = _ReqDecodeState(
                    decoder=IncrementalDecoder(
                        self.tokenizer,
                        batch.skip_special_tokens[i],
                        batch.spaces_between_special_tokens[i],
                    ),
                    hold_back=max((len(s) for s in stop_strs), default=0),
                )
                self.states[rid] = st
            fr = batch.finish_reasons[i]
            token = batch.tokens[i]
            no_trim = batch.no_stop_trim[i]
            skip_token = (
                fr is not None
                and fr.get("type") == "stop"
                and isinstance(fr.get("matched"), int)
                and not no_trim
            )
            if not skip_token and token is not None:
                st.full_text += st.decoder.step([token])
            if fr is None:
                # hold back a potential stop-string prefix
                safe_end = len(st.full_text) - st.hold_back
                delta = (
                    st.full_text[st.emitted : safe_end]
                    if safe_end > st.emitted
                    else ""
                )
                st.emitted = max(st.emitted, safe_end)
            else:
                final_text = st.full_text
                matched_str = fr.get("matched") if isinstance(
                    fr.get("matched"), str
                ) else None
                if matched_str and not no_trim:
                    idx = final_text.find(matched_str, max(0, st.emitted - len(matched_str)))
                    if idx >= 0:
                        final_text = final_text[:idx]
                delta = final_text[st.emitted :]
                st.emitted = len(final_text)
                del self.states[rid]
            out.rids.append(rid)
            out.delta_texts.append(delta)
            out.output_ids.append([token] if token is not None else [])
            out.finish_reasons.append(fr)
            out.logprobs.append(batch.logprobs[i])
            out.top_logprobs.append(batch.top_logprobs[i])
            out.completion_tokens.append(batch.completion_tokens[i])
            out.cached_tokens.append(batch.cached_tokens[i])
            out.prompt_tokens.append(batch.prompt_tokens[i])
            out.embeddings.append(None)
            hs = getattr(batch, "hidden_states", None)
            out.hidden_states.append(hs[i] if hs else None)
        return out


def run_detokenizer(server_args, port_args, tokenizer=None):
    """Event loop (process or thread target)."""
    from sglang_tpu.tokenizer import get_tokenizer

    if tokenizer is None and not server_args.skip_tokenizer_init:
        tokenizer = get_tokenizer(server_args.tokenizer_path)
    core = DetokenizerCore(tokenizer)
    recv = make_socket(port_args.detokenizer_ipc, zmq.PULL, bind=True)
    send = make_socket(port_args.tokenizer_ipc, zmq.PUSH, bind=False)
    logger.info("detokenizer ready")
    while True:
        msg = recv_pyobj(recv)
        if msg is None:  # shutdown sentinel
            break
        if isinstance(msg, BatchTokenOut):
            send_pyobj(send, core.process(msg))
        else:
            send_pyobj(send, msg)  # pass-through (control responses)
