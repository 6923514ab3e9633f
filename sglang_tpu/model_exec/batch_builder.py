"""Host-side construction of padded ForwardBatch arrays.

Bridges the scheduler's per-request Python state to the static-bucketed
device arrays (the TPU analog of ScheduleBatch.prepare_for_extend /
prepare_for_decode, ref srt/managers/schedule_batch.py:2340,3001).
Everything here is numpy; transfer happens when the jitted step consumes it.

EXTEND layout: each sequence's new-token segment is aligned to
EXTEND_ALIGN so every EXTEND_ALIGN-sized q block belongs to exactly one
sequence — this is what lets the Pallas ragged prefill kernel map grid
blocks to (seq, offset) via scalar prefetch with zero gather/scatter.
Pad tokens write their KV to the trash page and are masked in attention.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from sglang_tpu.model_exec.forward_batch import ForwardBatch, ForwardMode
from sglang_tpu.utils import bucketize, cdiv, round_up

EXTEND_ALIGN = 64


@dataclasses.dataclass
class SeqInput:
    """One sequence's contribution to a forward step."""

    new_token_ids: Sequence[int]  # tokens to run this step
    prefix_len: int  # tokens already in KV (radix cache hit / prior chunks)
    page_ids: Sequence[int]  # pages covering [0, prefix_len + len(new))
    # decode only: position = prefix_len (the single new token's position)
    req_slot: int = -1  # device slot; -1 -> trash slot (no state publish)
    # Recurrent-state slot (SSM models): defaults to req_slot. Non-final
    # prefill chunks set this to the real slot while req_slot stays -1.
    state_slot: Optional[int] = None
    pages_np: Optional[np.ndarray] = None  # cached ndarray of page_ids
    # Hybrid SWA pool: per-slot page ids into the SWA pool (0 = freed/
    # out-of-window slot, reads masked). Same slot layout as page_ids.
    swa_page_ids: Optional[Sequence[int]] = None
    # M-ROPE (Qwen2-VL): per-new-token 3-D positions [3, q] for extend and
    # the decode position delta (see models/qwen2_vl.compute_mrope_positions).
    mrope_positions: Optional[np.ndarray] = None
    mrope_delta: int = 0
    # Speculative tree verify: absolute positions for the q new tokens
    # (prefix + node depth, NOT sequential) and the [q, Rk] ancestor-mask
    # rows over tree slots [prefix, prefix + Rk). KV slots stay sequential
    # from slot_base (defaults to prefix_len; draft tree levels write at
    # prefix + first_node_id while masking over the whole tree region).
    custom_positions: Optional[np.ndarray] = None
    tree_mask: Optional[np.ndarray] = None
    slot_base: Optional[int] = None


DEFAULT_DECODE_BS_BUCKETS = [8, 16, 32, 64, 128, 256, 512]
DEFAULT_TOKEN_BUCKETS = [64, 256, 512, 1024, 2048, 4096, 8192, 16384]
DEFAULT_BS_BUCKETS = [8, 16, 32, 64, 128, 256, 512]
# Fine-grained low end: decode attention reads the FULL padded page table
# (gather traffic scales with the bucket), so 4-page steps up to 64 pages
# matter more than the extra compile variants (persistent cache amortizes).
PAGE_BUCKETS = (
    [4, 8, 12, 16, 20, 24, 28, 32, 40, 48, 56, 64]
    + [96, 128, 192, 256, 384, 512, 1024, 2048, 4096]
)


def build_forward_batch(
    seqs: List[SeqInput],
    page_size: int,
    mode: ForwardMode,
    token_buckets: Optional[Sequence[int]] = None,
    bs_buckets: Optional[Sequence[int]] = None,
    trash_slot: int = 0,
    align: int = EXTEND_ALIGN,
    shared_pages: Optional[np.ndarray] = None,
    shared_len: int = 0,
    num_prefill_seqs: int = -1,  # MIXED: seqs[:k] are extend, rest decode
) -> ForwardBatch:
    n = len(seqs)
    assert n > 0

    def bucket_bt(x, bl):
        # deterministic mode pins batch/token buckets (utils docstring)
        from sglang_tpu import utils as _u

        return bl[-1] if _u.DETERMINISTIC_BUCKETS else bucketize(x, bl)

    mixed_tp = 0
    if mode.is_mixed():
        # Layout (ref forward_batch_info.py:98 MIXED, TPU-recast): the
        # extend region keeps its aligned-segment layout and is padded to
        # a token bucket Tp; the n_d decode rows pack densely right after
        # it in a decode-bucket-sized tail. Rows stay in natural order
        # (prefill seqs, decode seqs, padding) so sampling tensors /
        # logits_indices / req_slots need no special casing; attention
        # splits at the STATIC boundary mixed_tp (ops/attention/base.py).
        n_p = num_prefill_seqs
        assert 0 < n_p < n
        assert all(len(s.new_token_ids) == 1 for s in seqs[n_p:])
        assert all(s.tree_mask is None for s in seqs)
        B = bucket_bt(n, bs_buckets or DEFAULT_BS_BUCKETS)
        seg_offsets = []
        off = 0
        for s in seqs[:n_p]:
            seg_offsets.append(off)
            off += round_up(len(s.new_token_ids), align)
        mixed_tp = bucket_bt(off, token_buckets or DEFAULT_TOKEN_BUCKETS)
        n_d = n - n_p
        tail = bucket_bt(n_d, DEFAULT_DECODE_BS_BUCKETS)
        seg_offsets.extend(mixed_tp + j for j in range(n_d))
        T = mixed_tp + tail
    elif mode.is_decode():
        assert all(len(s.new_token_ids) == 1 for s in seqs)
        B = bucket_bt(n, bs_buckets or DEFAULT_DECODE_BS_BUCKETS)
        T = B
        seg_offsets = list(range(n))
    else:
        B = bucket_bt(n, bs_buckets or DEFAULT_BS_BUCKETS)
        seg_offsets = []
        off = 0
        for s in seqs:
            seg_offsets.append(off)
            off += round_up(len(s.new_token_ids), align)
        if seqs[0].tree_mask is not None:
            # Tree verify: every seq has the same q = R; T is exactly
            # B * round_up(R, align) so the backend can reshape the token
            # stream to [B, Rq] (padding rows after the real seqs).
            rq = round_up(len(seqs[0].new_token_ids), align)
            assert all(len(s.new_token_ids) == len(seqs[0].new_token_ids)
                       for s in seqs)
            T = B * rq
        else:
            T = bucket_bt(off, token_buckets or DEFAULT_TOKEN_BUCKETS)

    max_pages_needed = max(len(s.page_ids) for s in seqs)
    P = bucketize(max(max_pages_needed, 1), PAGE_BUCKETS)
    # Block maps cover only the extend region (decode tail rows are not
    # block-mapped — the attention split handles them per-row).
    NB = max((mixed_tp if mode.is_mixed() else T) // align, 1)

    input_ids = np.zeros(T, np.int32)
    positions = np.zeros(T, np.int32)
    seq_lens = np.zeros(B, np.int32)
    q_lens = np.zeros(B, np.int32)
    cu_q_lens = np.zeros(B + 1, np.int32)
    seq_ids = np.full(T, max(n - 1, 0), np.int32)
    page_table = np.zeros((B, P), np.int32)  # page 0 = reserved/trash
    out_cache_loc = np.zeros(T, np.int32)  # slot 0..page_size-1 = trash page
    logits_indices = np.zeros(B, np.int32)
    req_slots = np.full(B, trash_slot, np.int32)
    state_slots = np.full(B, trash_slot, np.int32)
    prefix_lens = np.zeros(B, np.int32)
    block_seq = np.full(NB, max(n - 1, 0), np.int32)
    block_q_off = np.zeros(NB, np.int32)
    hybrid_swa = any(s.swa_page_ids is not None for s in seqs)
    swa_page_table = np.zeros((B, P), np.int32) if hybrid_swa else None
    swa_out_cache_loc = np.zeros(T, np.int32) if hybrid_swa else None
    tree = seqs[0].tree_mask is not None
    spec_tree_mask = None
    if tree:
        rq = round_up(len(seqs[0].new_token_ids), align)
        rk = seqs[0].tree_mask.shape[1]
        spec_tree_mask = np.zeros((B, rq, rk), np.bool_)
    mrope = any(s.mrope_positions is not None or s.mrope_delta for s in seqs)
    mrope_positions = (
        np.zeros((3, T), np.int32) if (mrope and not mode.is_decode()) else None
    )
    mrope_delta = np.zeros(B, np.int32) if (mrope and mode.is_decode()) else None

    for i, s in enumerate(seqs):
        off = seg_offsets[i]
        q = len(s.new_token_ids)
        input_ids[off : off + q] = s.new_token_ids
        if s.custom_positions is not None:
            positions[off : off + q] = s.custom_positions
        else:
            positions[off : off + q] = np.arange(
                s.prefix_len, s.prefix_len + q
            )
        if spec_tree_mask is not None:
            spec_tree_mask[i, :q, :] = s.tree_mask
        seq_lens[i] = s.prefix_len + q
        q_lens[i] = q
        cu_q_lens[i] = off
        seq_ids[off : off + q] = i
        if s.pages_np is not None:
            page_table[i, : len(s.pages_np)] = s.pages_np
        else:
            page_table[i, : len(s.page_ids)] = s.page_ids
        prefix_lens[i] = s.prefix_len
        base = s.slot_base if s.slot_base is not None else s.prefix_len
        for j in range(q):
            pos = base + j
            page = s.page_ids[pos // page_size]
            out_cache_loc[off + j] = page * page_size + pos % page_size
        if hybrid_swa:
            sw = s.swa_page_ids if s.swa_page_ids is not None else s.page_ids
            swa_page_table[i, : len(sw)] = sw
            for j in range(q):
                pos = s.prefix_len + j
                page = sw[pos // page_size]
                swa_out_cache_loc[off + j] = page * page_size + pos % page_size
        logits_indices[i] = off + q - 1
        req_slots[i] = s.req_slot if s.req_slot >= 0 else trash_slot
        ss = s.state_slot if s.state_slot is not None else s.req_slot
        state_slots[i] = ss if ss >= 0 else trash_slot
        if mrope_positions is not None:
            if s.mrope_positions is not None:
                mrope_positions[:, off : off + q] = s.mrope_positions
            else:
                # all components coincide past the last image
                mrope_positions[:, off : off + q] = (
                    positions[off : off + q] + s.mrope_delta
                )
        if mrope_delta is not None:
            mrope_delta[i] = s.mrope_delta
        if not mode.is_decode() and not (
            mode.is_mixed() and i >= num_prefill_seqs
        ):
            nb = round_up(q, align) // align
            b0 = off // align
            block_seq[b0 : b0 + nb] = i
            block_q_off[b0 : b0 + nb] = np.arange(nb) * align
    if mode.is_mixed():
        end = seg_offsets[-1] + 1  # mixed_tp + n_d
        last_p = seqs[num_prefill_seqs - 1]
        used_blocks = (
            seg_offsets[num_prefill_seqs - 1]
            + round_up(len(last_p.new_token_ids), align)
        ) // align
    else:
        end = seg_offsets[-1] + (
            1 if mode.is_decode()
            else round_up(len(seqs[-1].new_token_ids), align)
        )
        used_blocks = end // align
    cu_q_lens[n:] = end
    # Inactive trailing blocks: point past q_len so the kernel skips them.
    if not mode.is_decode():
        block_seq[used_blocks:] = max(n - 1, 0)
        block_q_off[used_blocks:] = 1 << 28  # >> any q_len -> inactive

    shared_pages_dev = shared_len_dev = None
    if shared_pages is not None and shared_len > 0:
        # Cascade decode: seqs carry suffix-local prefix_len/page_ids; rope
        # positions must stay global.
        positions += shared_len
        S = bucketize(len(shared_pages), PAGE_BUCKETS)
        sp = np.zeros(S, np.int32)
        sp[: len(shared_pages)] = shared_pages
        shared_pages_dev = jnp.asarray(sp)
        shared_len_dev = jnp.asarray(shared_len, jnp.int32)

    return ForwardBatch(
        input_ids=jnp.asarray(input_ids),
        positions=jnp.asarray(positions),
        seq_lens=jnp.asarray(seq_lens),
        q_lens=jnp.asarray(q_lens),
        cu_q_lens=jnp.asarray(cu_q_lens),
        seq_ids=jnp.asarray(seq_ids),
        page_table=jnp.asarray(page_table),
        out_cache_loc=jnp.asarray(out_cache_loc),
        logits_indices=jnp.asarray(logits_indices),
        num_seqs=jnp.asarray(n, jnp.int32),
        req_slots=jnp.asarray(req_slots),
        state_slots=jnp.asarray(state_slots),
        block_seq=jnp.asarray(block_seq),
        block_q_off=jnp.asarray(block_q_off),
        prefix_lens=jnp.asarray(prefix_lens),
        shared_pages=shared_pages_dev,
        shared_len=shared_len_dev,
        swa_page_table=(
            jnp.asarray(swa_page_table) if hybrid_swa else None
        ),
        swa_out_cache_loc=(
            jnp.asarray(swa_out_cache_loc) if hybrid_swa else None
        ),
        mrope_positions=(
            jnp.asarray(mrope_positions) if mrope_positions is not None
            else None
        ),
        mrope_delta=(
            jnp.asarray(mrope_delta) if mrope_delta is not None else None
        ),
        spec_tree_mask=(
            jnp.asarray(spec_tree_mask) if spec_tree_mask is not None
            else None
        ),
        mode=mode,
        extend_align=align,
        mixed_tp=mixed_tp,
    )
