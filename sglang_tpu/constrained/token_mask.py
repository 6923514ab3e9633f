"""Vectorized token-bitmask computation: DFA state -> allowed-token bits.

The reference offloads this to xgrammar's C++ matcher
(srt/constrained/xgrammar_backend.py:118 fill_vocab_mask). Ours is a
numpy-vectorized trie walk: the vocabulary's token byte-sequences are laid
out as a flat trie in level order; for a given DFA state one gather per
trie level computes the DFA state every trie node lands in, and a token is
allowed iff its end node is alive. O(total trie nodes) numpy work per
(state, vocab) with per-state caching — no Python-per-token loops.

Mask convention: PACKED uint32, bit set = token ALLOWED (little-endian
bit order within each word). EOS is allowed iff the state is accepting.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from sglang_tpu.constrained.regex_fsm import DFA


class TokenTrie:
    """Flat level-ordered trie over token byte sequences."""

    def __init__(self, token_bytes: Sequence[bytes], vocab_size: int):
        self.vocab_size = vocab_size
        # Build nested trie first.
        root: Dict = {}
        for tid, bs in enumerate(token_bytes):
            if bs is None or len(bs) == 0:
                continue
            node = root
            for byte in bs:
                node = node.setdefault(byte, {})
            node.setdefault("_ids", []).append(tid)

        # Flatten in level order.
        parents: List[int] = []
        bytes_: List[int] = []
        levels: List[int] = []  # start index of each level in the flat arrays
        token_end_node = np.full(vocab_size, -1, np.int64)
        frontier = [(root, -1)]
        flat_idx = 0
        while frontier:
            levels.append(flat_idx)
            nxt = []
            for node, parent_idx in frontier:
                for byte, child in node.items():
                    if byte == "_ids":
                        continue
                    parents.append(parent_idx)
                    bytes_.append(byte)
                    ids = child.get("_ids")
                    if ids:
                        for tid in ids:
                            token_end_node[tid] = flat_idx
                    nxt.append((child, flat_idx))
                    flat_idx += 1
            frontier = nxt
        levels.append(flat_idx)
        self.parents = np.asarray(parents, np.int64)
        self.bytes = np.asarray(bytes_, np.int64)
        self.level_starts = levels
        self.num_nodes = flat_idx
        self.token_end_node = token_end_node
        self.has_node = token_end_node >= 0

    def alive_end_states(self, dfa_table: np.ndarray, state: int) -> np.ndarray:
        """DFA state reached by each token's full byte walk; -1 = dead.

        dfa_table: [num_states, 256] int32 with -1 for dead transitions.
        Returns [vocab_size] int32 (tokens with no trie node -> -1).
        """
        node_state = np.empty(self.num_nodes, np.int32)
        ls = self.level_starts
        for lvl in range(len(ls) - 1):
            s, e = ls[lvl], ls[lvl + 1]
            if s == e:
                break
            b = self.bytes[s:e]
            if lvl == 0:
                node_state[s:e] = dfa_table[state, b]
            else:
                ps = node_state[self.parents[s:e]]
                dead = ps < 0
                ns = dfa_table[np.maximum(ps, 0), b]
                ns[dead] = -1
                node_state[s:e] = ns
        out = np.full(self.vocab_size, -1, np.int32)
        idx = self.token_end_node[self.has_node]
        out[self.has_node] = node_state[idx]
        return out


class MaskCache:
    """Per-(DFA, trie) allowed-bitmask cache keyed by DFA state."""

    def __init__(self, dfa: DFA, trie: TokenTrie, eos_token_ids: Sequence[int]):
        self.dfa = dfa
        self.trie = trie
        self.eos_token_ids = list(eos_token_ids)
        self.num_words = (trie.vocab_size + 31) // 32
        self._cache: Dict[int, np.ndarray] = {}
        # dense transition table for vectorized walks
        self.table = np.full((dfa.num_states, 256), -1, np.int32)
        for s, trans in enumerate(dfa.transitions):
            for byte, t in trans.items():
                self.table[s, byte] = t

    def get_mask(self, state: int) -> np.ndarray:
        """Packed uint32 [num_words]; bit set = allowed."""
        m = self._cache.get(state)
        if m is not None:
            return m
        end_states = self.trie.alive_end_states(self.table, state)
        allowed = end_states >= 0
        if self.dfa.is_accepting(state) or not allowed.any():
            # Accepting, or a dead end (grammar continuations exist but no
            # vocab token can walk them): allow EOS so the request ends
            # instead of sampling from an all-banned distribution.
            for eos in self.eos_token_ids:
                if 0 <= eos < self.trie.vocab_size:
                    allowed[eos] = True
        packed = np.packbits(
            allowed.astype(np.uint8), bitorder="little"
        )
        packed = np.pad(packed, (0, self.num_words * 4 - len(packed)))
        m = packed.view(np.uint32)
        self._cache[state] = m
        return m
