"""EVS — efficient video sampling (temporal token pruning).

Ref behavior: srt/multimodal/evs/evs_core.py (itself from vLLM): video
tokens are ranked by temporal DISSIMILARITY (1 - cosine similarity of a
merged-token embedding vs the same spatial position in the previous
frame); the top (1-q) fraction is retained, the first frame always kept
in full. The placeholder span is pre-shrunk to the retained count at
tokenize time (deterministic), and the retention MASK is computed after
the ViT encodes the full grid.

TPU note: the mask math runs host-side in numpy on the (small) merged
embeddings — it is a per-admission cost, not a per-step one, and keeps
the ViT program shape static.
"""

from __future__ import annotations

import numpy as np


def compute_retained_tokens_count(*, tokens_per_frame: int,
                                  num_frames: int, q: float) -> int:
    """Retained token count for a video: max(one full frame,
    total * (1 - q)). Ref evs_core.compute_retained_tokens_count."""
    total = tokens_per_frame * num_frames
    return max(tokens_per_frame, int(total * (1.0 - q)))


def compute_retention_mask(
    video_embeds: np.ndarray,  # [T * H/m * W/m, hidden]
    grid_thw,  # (T, H, W) in PATCH units (pre-merge)
    spatial_merge_size: int,
    q: float,
) -> np.ndarray:
    """Boolean [T * H/m * W/m] mask of retained video tokens.

    Ranking: first frame pinned (dissimilarity 255), then 1 - cosine
    similarity vs the previous frame's same spatial token; stable argsort
    descending; top retained-count win. Ref evs_core.compute_retention_mask.
    """
    T, H, W = map(int, grid_thw)
    m = spatial_merge_size
    hh, ww = H // m, W // m
    emb = np.asarray(video_embeds, np.float32).reshape(T, hh, ww, -1)
    tokens_per_frame = hh * ww
    a, b = emb[1:], emb[:-1]
    denom = (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    sim = (a * b).sum(-1) / np.maximum(denom, 1e-12)
    dissim = 1.0 - sim  # [T-1, hh, ww]
    dissim = np.concatenate(
        [np.full((1, hh, ww), 255.0, np.float32), dissim], axis=0
    )
    flat = dissim.reshape(-1)
    order = np.argsort(-flat, kind="stable")
    keep = compute_retained_tokens_count(
        tokens_per_frame=tokens_per_frame, num_frames=T, q=q
    )
    mask = np.zeros(flat.shape[0], bool)
    mask[order[:keep]] = True
    return mask
