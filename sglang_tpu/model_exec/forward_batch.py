"""ForwardBatch: device-side metadata for one model forward.

Ref: srt/model_executor/forward_batch_info.py:98 (ForwardMode), :412
(ForwardBatch). TPU-native differences: every array has a STATIC bucketed
shape (token bucket T for extend, batch bucket B for decode) so one jit
program per bucket replaces CUDA-graph capture; padding rows are masked via
seq_lens/num_seqs rather than shape changes.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp


class ForwardMode(enum.IntEnum):
    EXTEND = 1  # ragged prefill / chunked prefill
    DECODE = 2  # one new token per running seq
    IDLE = 3  # no work (DP-attention sync steps)
    TARGET_VERIFY = 4  # speculative verify over draft tokens
    DRAFT_EXTEND = 5
    # Prefill chunk + running decode rows in ONE program (ref
    # forward_batch_info.py:98 ForwardMode.MIXED): tokens [0, mixed_tp)
    # are aligned extend segments; tokens [mixed_tp, T) are one-per-seq
    # decode rows riding the same MLP/sampler launch so chunked prefill
    # steps stop stalling running decodes.
    MIXED = 6

    def is_extend(self) -> bool:
        return self in (
            ForwardMode.EXTEND,
            ForwardMode.TARGET_VERIFY,
            ForwardMode.DRAFT_EXTEND,
            ForwardMode.MIXED,
        )

    def is_decode(self) -> bool:
        return self == ForwardMode.DECODE

    def is_mixed(self) -> bool:
        return self == ForwardMode.MIXED


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ForwardBatch:
    """All shapes static per (mode, T, B, max_pages) bucket.

    T = padded token count (extend) or padded batch size (decode, T == B).
    B = padded sequence count.
    """

    # --- data fields (device arrays) ---
    input_ids: jax.Array  # [T] int32
    positions: jax.Array  # [T] int32
    seq_lens: jax.Array  # [B] int32: total context length AFTER this step
    q_lens: jax.Array  # [B] int32: new tokens per seq this step (decode: 1)
    cu_q_lens: jax.Array  # [B+1] int32: prefix-sum of q_lens (token offsets)
    seq_ids: jax.Array  # [T] int32: owning seq index per token (pad: B-1)
    page_table: jax.Array  # [B, max_pages] int32 page ids into the KV pool
    out_cache_loc: jax.Array  # [T] int32 token-slot for each new token's KV
    logits_indices: jax.Array  # [B] int32 index into [T] of each seq's last tok
    num_seqs: jax.Array  # [] int32 actual (unpadded) sequence count
    # Device-resident request slots: decode steps read their input token from
    # next_tokens_buf[req_slots] (the overlap-schedule future-map analog,
    # ref srt/managers/overlap_utils.py FutureMap). Rows that must not
    # publish state (padding, non-final prefill chunks) point at the trash
    # slot (= buffer's last index).
    req_slots: jax.Array  # [B] int32
    # Ragged-attention block maps (EXTEND only): the token stream is laid
    # out with each sequence's segment aligned to EXTEND_ALIGN, so every
    # q block of that size belongs to exactly one sequence. [T/EXTEND_ALIGN].
    block_seq: jax.Array  # int32: owning seq per q block
    block_q_off: jax.Array  # int32: block's first-token offset within the seq
    prefix_lens: jax.Array  # [B] int32: tokens already in KV before this step
    # Cascade (shared-prefix) decode attention: when every row of a decode
    # batch shares its first shared_len tokens (same radix pages), those
    # pages are gathered ONCE and attended with a single dense matmul; the
    # per-row page_table/seq_lens then cover only the suffix. positions
    # stay global (builder adds shared_len back). Ref analog: FlashInfer
    # cascade / multi-level attention (srt/layers/attention/
    # flashinfer_backend.py). None = disabled.
    shared_pages: Optional[jax.Array] = None  # [S] int32 page ids
    shared_len: Optional[jax.Array] = None  # [] int32 tokens in shared part
    # Hybrid SWA pool (ref srt/mem_cache/allocator/swa.py): sliding-window
    # layers read/write their own smaller pool through these tables; slots
    # whose KV fell out of the window point at the trash page (masked).
    swa_page_table: Optional[jax.Array] = None  # [B, max_pages] int32
    swa_out_cache_loc: Optional[jax.Array] = None  # [T] int32
    # Speculative tree verify (ref ForwardMode.TARGET_VERIFY +
    # eagle_worker_v2.py:1492 tree masks): [B, Rq, Rk] bool — row r of a
    # sequence's Rq new tokens may attend tree slot c (at pool slot
    # prefix + c) iff mask[b, r, c]. Prefix slots are always attendable;
    # slots past prefix + Rk never are. Padding rows are all-False (they
    # still read the prefix, output discarded).
    spec_tree_mask: Optional[jax.Array] = None
    # Recurrent-state slot per sequence (SSM/linear-attention models).
    # Differs from req_slots on non-final prefill chunks: those rows must
    # NOT publish a sampled token (req_slots -> trash) but MUST carry
    # their conv/ssm state forward (state_slots -> real slot).
    state_slots: Optional[jax.Array] = None  # [B] int32
    # M-ROPE (Qwen2-VL; ref HF get_rope_index + srt/layers/rotary mrope):
    # extend batches of mrope models carry full 3-component positions
    # [3, T] (t/h/w — equal rows for text); decode derives the 1-D position
    # as fb.positions + mrope_delta[row] (all components coincide past the
    # last image).
    mrope_positions: Optional[jax.Array] = None  # [3, T] int32 (extend)
    mrope_delta: Optional[jax.Array] = None  # [B] int32 (decode)

    # --- static fields ---
    mode: ForwardMode = dataclasses.field(
        metadata=dict(static=True), default=ForwardMode.EXTEND
    )
    # q-block size of the ragged extend layout (spec verify uses a smaller
    # block to bound padding of many short segments)
    extend_align: int = dataclasses.field(
        metadata=dict(static=True), default=64
    )
    # MIXED only: padded token count of the extend region. Tokens
    # [mixed_tp, T) are decode rows (one per seq, densely packed); their
    # owning rows are read from seq_ids, so no static SEQ split is needed.
    mixed_tp: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def padded_num_tokens(self) -> int:
        return self.input_ids.shape[0]

    @property
    def padded_bs(self) -> int:
        return self.seq_lens.shape[0]

    @property
    def max_pages(self) -> int:
        return self.page_table.shape[1]
