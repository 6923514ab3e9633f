"""Grammar backend: compiled-grammar cache + per-request matcher state.

Ref interface: srt/constrained/xgrammar_backend.py (XGrammarGrammar:72 —
accept_token:92, fill_vocab_mask:118; BaseGrammarBackend:201 with compile
cache). Ours compiles regex/JSON-schema to a byte DFA (regex_fsm) and
computes allowed-token bitmasks with the vectorized trie walk (token_mask).
"""

from __future__ import annotations

import logging
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from sglang_tpu.constrained.json_schema import json_schema_to_regex
from sglang_tpu.constrained.regex_fsm import DFA, compile_regex
from sglang_tpu.constrained.token_mask import MaskCache, TokenTrie

logger = logging.getLogger(__name__)


def extract_token_bytes(tokenizer) -> List[Optional[bytes]]:
    """Per-token byte sequence, via single-token decode.

    Exact for byte-level BPE (Llama/Qwen/GPT-style); word-level tokenizers
    (tests) get their separator handled by the caller's text space.
    """
    vocab_size = tokenizer.vocab_size if hasattr(tokenizer, "vocab_size") else len(
        tokenizer
    )
    n = max(vocab_size, len(tokenizer))
    out: List[Optional[bytes]] = [None] * n
    special = set(getattr(tokenizer, "all_special_ids", []) or [])
    for tid in range(n):
        if tid in special:
            continue
        try:
            s = tokenizer.decode([tid], skip_special_tokens=False)
        except Exception:
            continue
        if s:
            out[tid] = s.encode("utf-8")
    return out


class CompiledGrammar:
    def __init__(self, dfa: DFA, mask_cache: MaskCache):
        self.dfa = dfa
        self.mask_cache = mask_cache


class GrammarMatcher:
    """Per-request matcher (mutable DFA state). Ref: XGrammarGrammar."""

    def __init__(self, compiled: CompiledGrammar, token_bytes, eos_ids,
                 bytes_to_tid=None, max_token_len: int = 0):
        self.compiled = compiled
        self.token_bytes = token_bytes
        self.eos_ids = set(eos_ids)
        self._bytes_to_tid = bytes_to_tid or {}
        self._max_token_len = max_token_len
        self.state = 0
        self.finished = False

    def accept_token(self, token_id: int) -> bool:
        if self.finished:
            return True
        if token_id in self.eos_ids:
            self.finished = True
            return self.compiled.dfa.is_accepting(self.state)
        bs = (
            self.token_bytes[token_id]
            if token_id < len(self.token_bytes)
            else None
        )
        if bs is None:
            return False
        nxt = self.compiled.dfa.walk(self.state, bs)
        if nxt < 0:
            return False
        self.state = nxt
        return True

    def fill_vocab_mask(self) -> np.ndarray:
        """Packed uint32 allowed-bitmask for the current state."""
        return self.compiled.mask_cache.get_mask(self.state)

    def is_terminated(self) -> bool:
        return self.finished

    def jump_forward(self) -> bytes:
        """Forced bytes: follow states with exactly one outgoing byte.

        Ref: jump-forward decoding (srt/constrained/outlines_jump_forward.py)
        — deterministic grammar segments can be emitted without model calls.
        """
        out = bytearray()
        state = self.state
        dfa = self.compiled.dfa
        for _ in range(4096):
            trans = dfa.transitions[state]
            if len(trans) != 1 or dfa.is_accepting(state):
                break
            byte, nxt = next(iter(trans.items()))
            out.append(byte)
            state = nxt
        return bytes(out)

    def jump_forward_tokens(self, max_tokens: int) -> List[int]:
        """Tokenize the forced byte run (longest-match) and ADVANCE the DFA.

        Returns the forced token ids (possibly consuming only a prefix of
        the forced bytes when no vocab token tiles the tail — the model
        will emit the rest under the mask). Empty when fewer than 2 whole
        tokens fit: a 1-token jump saves nothing over a masked decode step
        but costs a re-extend. Ref: scheduler jump-forward integration,
        srt/managers/scheduler.py around check_for_jump_forward.
        """
        if self.finished or max_tokens < 2 or not self._bytes_to_tid:
            return []
        forced = self.jump_forward()
        if len(forced) < 2:
            return []
        toks: List[int] = []
        i, n = 0, len(forced)
        while i < n and len(toks) < max_tokens:
            for L in range(min(self._max_token_len, n - i), 0, -1):
                tid = self._bytes_to_tid.get(forced[i : i + L])
                if tid is not None:
                    toks.append(tid)
                    i += L
                    break
            else:
                break
        if len(toks) < 2:
            return []
        nxt = self.compiled.dfa.walk(self.state, forced[:i])
        assert nxt >= 0, "jump-forward walked off the grammar"
        self.state = nxt
        return toks


class GrammarBackend:
    """Compile cache over (kind, spec) -> CompiledGrammar."""

    def __init__(self, tokenizer, eos_token_ids: Sequence[int],
                 vocab_size: Optional[int] = None):
        self.tokenizer = tokenizer
        self.eos_token_ids = list(eos_token_ids)
        self.token_bytes = extract_token_bytes(tokenizer)
        vs = vocab_size or len(self.token_bytes)
        self.trie = TokenTrie(self.token_bytes, vs)
        # bytes -> token id for jump-forward retokenization (smallest id
        # wins among duplicate surface forms).
        self.bytes_to_tid: Dict[bytes, int] = {}
        self.max_token_len = 0
        for tid, bs in enumerate(self.token_bytes):
            if bs and bs not in self.bytes_to_tid:
                self.bytes_to_tid[bs] = tid
                self.max_token_len = max(self.max_token_len, len(bs))
        self._cache: Dict[Tuple[str, str], CompiledGrammar] = {}
        self._lock = threading.Lock()

    def _compile(self, kind: str, spec: str) -> CompiledGrammar:
        if kind == "regex":
            pattern = spec
        elif kind == "json_schema":
            pattern = json_schema_to_regex(spec)
        elif kind == "ebnf":
            from sglang_tpu.constrained.ebnf import ebnf_to_regex

            pattern = ebnf_to_regex(spec)
        else:
            raise ValueError(f"unknown grammar kind {kind}")
        dfa = compile_regex(pattern)
        logger.info(
            "compiled %s grammar: %d DFA states", kind, dfa.num_states
        )
        return CompiledGrammar(
            dfa, MaskCache(dfa, self.trie, self.eos_token_ids)
        )

    def get_matcher(self, kind: str, spec: str) -> GrammarMatcher:
        key = (kind, spec)
        with self._lock:
            compiled = self._cache.get(key)
        if compiled is None:
            compiled = self._compile(kind, spec)
            with self._lock:
                self._cache[key] = compiled
        return GrammarMatcher(compiled, self.token_bytes, self.eos_token_ids,
                              self.bytes_to_tid, self.max_token_len)
