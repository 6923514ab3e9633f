"""Speculative tree structures: topology, masks, greedy tree acceptance.

Ref behavior: srt/speculative/eagle_worker_v2.py:489 (top-k tree drafts),
:1492 (tree verify), eagle_utils build_tree_kernel. TPU-native recast:
the tree is DATA, not shape — every request in a verify round carries the
same fixed node count R (so the jitted verify program is shared), and the
per-request ancestor mask rides the ForwardBatch as a [B, R, R] bool
array consumed by the backends' tree-verify attention.

Node 0 is always the committed last token (the tree root); draft nodes
are 1..R-1 in topological (parent-before-child) order.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class TreeDraft:
    """One request's draft tree for a verify round."""

    tokens: List[int]  # [R]: tokens[0] = committed root token
    parents: np.ndarray  # [R] int32: parents[0] = -1
    depths: np.ndarray  # [R] int32: depths[0] = 0
    scores: Optional[np.ndarray] = None  # [R] f32 cumulative draft logprob
    valid: Optional[np.ndarray] = None  # [R] bool; padding nodes are False

    @property
    def size(self) -> int:
        return len(self.tokens)

    def is_valid(self, i: int) -> bool:
        return self.valid is None or bool(self.valid[i])

    def padded(self, R: int) -> "TreeDraft":
        """Pad to exactly R nodes with inert children of the root (every
        request in a verify round must carry the same node count so the
        jitted program is shared). Padding nodes write junk KV past the
        accepted extent (harmless, overwritten) and can never be accepted."""
        n = self.size
        if n == R:
            return self
        assert n < R
        pad = R - n
        valid = np.ones(R, np.bool_)
        valid[n:] = False
        if self.valid is not None:
            valid[:n] = self.valid
        return TreeDraft(
            tokens=self.tokens + [0] * pad,
            parents=np.concatenate(
                [self.parents, np.zeros(pad, np.int32)]
            ),
            depths=np.concatenate(
                [self.depths, np.ones(pad, np.int32)]
            ),
            scores=None,
            valid=valid,
        )

    def ancestor_mask(self) -> np.ndarray:
        """[R, R] bool: mask[i, j] = j is an ancestor of i, or i == j."""
        R = self.size
        m = np.zeros((R, R), np.bool_)
        for i in range(R):
            j = i
            while j >= 0:
                m[i, j] = True
                j = int(self.parents[j])
        return m


def chain_draft(tokens: List[int]) -> TreeDraft:
    """Degenerate tree: a single chain (the round-1 verify layout)."""
    R = len(tokens)
    return TreeDraft(
        tokens=list(tokens),
        parents=np.arange(-1, R - 1, dtype=np.int32),
        depths=np.arange(R, dtype=np.int32),
    )


def accept_tree_greedy(
    tree: TreeDraft, target_tokens: np.ndarray
) -> Tuple[List[int], List[int]]:
    """Greedy tree acceptance (exact-match walk).

    target_tokens[j] = the target's greedy token AFTER node j's context.
    Walk from the root: accept a child c of the current node iff the
    draft token at c equals the target's token at the current node; then
    descend. Emitted tokens = accepted draft tokens + one bonus token
    (the target's token at the last accepted node) — identical to what
    non-speculative greedy decoding would produce.

    Returns (emitted_tokens, accepted_node_indices) where
    accepted_node_indices EXCLUDES the root and has len(emitted) - 1
    entries.
    """
    R = tree.size
    children: List[List[int]] = [[] for _ in range(R)]
    for i in range(1, R):
        children[int(tree.parents[i])].append(i)
    emit: List[int] = []
    path: List[int] = []
    cur = 0
    while True:
        want = int(target_tokens[cur])
        nxt = -1
        for c in children[cur]:
            if tree.tokens[c] == want and tree.is_valid(c):
                nxt = c
                break
        if nxt < 0:
            emit.append(want)  # bonus token from the target
            return emit, path
        emit.append(want)  # == tree.tokens[nxt], the accepted draft
        path.append(nxt)
        cur = nxt


def tree_children(tree: TreeDraft) -> List[List[int]]:
    """Valid children of each node, in node order (the candidate order the
    device-side spec_candidate_probs rows must match)."""
    ch: List[List[int]] = [[] for _ in range(tree.size)]
    for i in range(1, tree.size):
        if tree.is_valid(i):
            ch[int(tree.parents[i])].append(i)
    return ch


def accept_tree_sampled(
    tree: TreeDraft,
    p_cand: np.ndarray,  # [R, Kc] target prob of each node's candidates
    fb_tok: np.ndarray,  # [R] fallback/bonus sample per node
    fb_lp: np.ndarray,  # [R] its logprob
    uniforms,  # callable -> float in [0, 1)
) -> Tuple[List[int], List[int], List[float]]:
    """Rejection-sampled tree walk for DETERMINISTIC draft proposals.

    At each node the children are distinct candidate tokens; drawing one
    uniform and walking their cumulative target probabilities accepts
    child c with probability p(c) (sequential residual rejection in
    closed form); on rejection the fallback token — pre-sampled on device
    from p excluding the candidates — is emitted and the walk stops. The
    emitted sequence is distributed EXACTLY as ancestral sampling from
    the target (greedy rows degrade to the exact-match walk).

    Returns (emitted_tokens, accepted_node_indices, emitted_logprobs).
    """
    children = tree_children(tree)
    emit: List[int] = []
    path: List[int] = []
    lps: List[float] = []
    cur = 0
    while True:
        cs = children[cur]
        u = uniforms()
        acc = -1
        c_lp = 0.0
        cum = 0.0
        for j, c in enumerate(cs):
            pc = float(p_cand[cur, j])
            cum += pc
            if u < cum:
                acc = c
                c_lp = float(np.log(max(pc, 1e-20)))
                break
        if acc < 0:
            emit.append(int(fb_tok[cur]))
            lps.append(float(fb_lp[cur]))
            return emit, path, lps
        emit.append(int(tree.tokens[acc]))
        lps.append(c_lp)
        path.append(acc)
        cur = acc


def select_top_nodes(
    cand_scores: np.ndarray,  # [n_cand] cumulative logprobs
    cand_parents: np.ndarray,  # [n_cand] indices into the kept node list
    keep: int,
) -> np.ndarray:
    """Top-`keep` candidate indices by score. Because a child's cumulative
    score is strictly below its parent's, a global top-k over candidates
    whose parents are already kept is automatically ancestor-closed."""
    if len(cand_scores) <= keep:
        return np.arange(len(cand_scores))
    return np.argpartition(-cand_scores, keep - 1)[:keep]
