"""Denoise algorithms: which masked positions to commit each step.

Behavioral reference: srt/dllm/algorithm/{base,low_confidence,
joint_threshold}.py. The device forward already produced, per block
position, the argmax token and its probability (the tree-verify program's
`tokens`/`chosen` outputs); the selection over a [L]-sized block is
host-side numpy, like the speculative tree's acceptance walk — the wrong
place for a TPU kernel.

Contract (matches the reference): `step` mutates the block in place and
returns done-ON-ENTRY — when a block had no masks left at entry, the
forward that just ran used the final token ids, so its KV is the block's
final KV and the block can be emitted.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from sglang_tpu.dllm.config import DllmConfig


class DllmAlgorithm:
    def __init__(self, config: DllmConfig):
        self.block_size = config.block_size
        self.mask_id = config.mask_id

    def max_steps(self) -> int:
        # worst case one unmask per step, +1 for the final done-on-entry
        # forward that persists the block's KV (ref base.py max_steps)
        return self.block_size + 1

    def step(self, block_ids: np.ndarray, pred_tokens: np.ndarray,
             pred_probs: np.ndarray) -> Tuple[np.ndarray, bool]:
        """(new_block_ids, done_on_entry). Inputs are [L] arrays: current
        ids (mask_id where undecided), argmax prediction and its prob."""
        raise NotImplementedError


class LowConfidence(DllmAlgorithm):
    """Unmask every masked position whose argmax confidence clears the
    threshold; if none do, unmask the single highest-confidence one
    (ref low_confidence.py — guarantees progress every step)."""

    def __init__(self, config: DllmConfig):
        super().__init__(config)
        self.threshold = config.threshold

    def step(self, block_ids, pred_tokens, pred_probs):
        masked = block_ids == self.mask_id
        if not masked.any():
            return block_ids, True
        conf = np.where(masked, pred_probs, -np.inf)
        take = conf > self.threshold
        if not take.any():
            top1 = np.zeros_like(take)
            top1[int(np.argmax(conf))] = True
            take = top1
        out = np.where(take, pred_tokens, block_ids)
        return out, False


class JointThreshold(DllmAlgorithm):
    """Left-to-right joint-probability acceptance: commit the longest
    masked prefix whose RUNNING PRODUCT of confidences stays above the
    threshold (at least one position — the leftmost masked — always
    commits). Ref joint_threshold.py: preserves AR-like ordering, so
    block-diffusion checkpoints distilled from AR models decode stably."""

    def __init__(self, config: DllmConfig):
        super().__init__(config)
        self.threshold = config.threshold

    def step(self, block_ids, pred_tokens, pred_probs):
        masked = block_ids == self.mask_id
        if not masked.any():
            return block_ids, True
        out = block_ids.copy()
        joint = 1.0
        committed = 0
        for pos in np.nonzero(masked)[0]:
            joint *= float(pred_probs[pos])
            if committed > 0 and joint < self.threshold:
                break
            out[pos] = pred_tokens[pos]
            committed += 1
        return out, False


_ALGORITHMS = {
    "low_confidence": LowConfidence,
    "joint_threshold": JointThreshold,
}


def get_algorithm(config: DllmConfig) -> DllmAlgorithm:
    cls = _ALGORITHMS.get(config.algorithm)
    if cls is None:
        raise ValueError(
            f"unknown dllm algorithm {config.algorithm!r}; "
            f"have {sorted(_ALGORITHMS)}"
        )
    return cls(config)
