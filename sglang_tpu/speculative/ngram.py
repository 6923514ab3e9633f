"""N-gram speculative drafting.

Ref: srt/speculative/ngram_worker.py + kernels/jit/csrc/ngram_corpus/
(suffix_automaton.cpp). Drafts come from matching the sequence's own
recent n-gram against its history (prompt + generated text) — highly
effective on repetitive/structured output. A global cross-request corpus
(C++ suffix automaton) is the planned extension.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple


class NgramDrafter:
    def __init__(self, max_ngram: int = 4, min_ngram: int = 2,
                 num_draft_tokens: int = 4, min_history: int = 8):
        self.max_ngram = max_ngram
        self.min_ngram = min_ngram
        self.num_draft_tokens = num_draft_tokens
        self.min_history = min_history

    def propose(self, token_ids: Sequence[int]) -> List[int]:
        """Draft tokens following the current suffix, from history."""
        n_total = len(token_ids)
        if n_total < self.min_history:
            return []
        toks = list(token_ids)
        for n in range(min(self.max_ngram, n_total - 1), self.min_ngram - 1, -1):
            suffix = toks[-n:]
            # search most recent earlier occurrence
            for start in range(n_total - n - 1, -1, -1):
                if toks[start : start + n] == suffix:
                    cont = toks[start + n : start + n + self.num_draft_tokens]
                    if cont:
                        return cont
                    break
        return []


def accept_drafts(
    drafts: List[int], verified: List[int]
) -> Tuple[List[int], int]:
    """Greedy acceptance: verified[i] is the target's token sampled AFTER
    consuming input i (input 0 = previous token, inputs 1..k = drafts).

    Returns (tokens_to_emit, num_accepted_drafts): emit verified[0..j]
    where j = count of drafts matching the target's own choices.
    """
    j = 0
    for i, d in enumerate(drafts):
        if d == verified[i]:
            j += 1
        else:
            break
    return list(verified[: j + 1]), j
