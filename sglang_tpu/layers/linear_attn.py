"""Linear-attention backends: Gated DeltaNet (GDN) building blocks.

Ref behavior: srt/layers/attention/linear/gdn_backend.py +
srt/layers/attention/hybrid_linear_attn_backend.py (SGLang's fla-based
GDN path); numerics match HF torch_recurrent_gated_delta_rule /
torch_chunk_gated_delta_rule (modeling_qwen3_next.py) — the parity
oracle for Qwen3-Next.

TPU-native recast: one formulation serves prefill AND decode. The ragged
token stream [T, ...] is scanned with `lax.scan`; a token at segment
offset 0 loads its request's recurrent state from the slot-indexed state
pool (fb.state_slots) instead of carrying the previous token's state, so
a decode batch (every row is offset 0) degenerates to a batched
single-step update with NO cross-token dependency chain cost beyond the
scan. States are f32; the matmul-heavy projections stay in model dtype.

The causal short-conv is shared with the mamba family: K is tiny (4), so
the segment-aware depthwise conv unrolls over K with per-row state/stream
selects — no gather-scatter kernels needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sglang_tpu.model_exec.forward_batch import ForwardBatch


def causal_segment_conv(
    xi: jax.Array,            # [T, C] conv inputs (ragged segments)
    conv_w: jax.Array,        # [K, C] depthwise taps (tap K-1 = current)
    conv_bias: Optional[jax.Array],
    fb: ForwardBatch,
    conv_st: jax.Array,       # [S+1, K-1, C] per-slot last K-1 inputs
) -> Tuple[jax.Array, jax.Array]:
    """Depthwise causal conv over ragged segments, seeded from per-slot
    state; returns (pre-activation out [T, C] f32, new conv state).

    Same indexing scheme as models/mamba.py mamba1_mixer (state entries
    most-recent-last; fresh requests read zeros)."""
    T = xi.shape[0]
    K = conv_w.shape[0]
    conv_w = conv_w.astype(jnp.float32)
    sid = fb.seq_ids
    offs = jnp.arange(T, dtype=jnp.int32) - fb.cu_q_lens[sid]
    bslots = (fb.state_slots if fb.state_slots is not None
              else fb.req_slots)
    slot = bslots[sid]
    fresh_req = (fb.prefix_lens[sid] == 0)
    st_f = conv_st.astype(jnp.float32)
    acc = xi.astype(jnp.float32) * conv_w[K - 1][None, :]
    for d in range(1, K):
        from_stream = jnp.roll(xi, d, axis=0).astype(jnp.float32)
        ent_idx = jnp.clip(K - 1 - d + offs, 0, K - 2)
        from_state = jnp.where(
            fresh_req[:, None], 0.0, st_f[slot, ent_idx]
        )
        v = jnp.where((offs >= d)[:, None], from_stream, from_state)
        acc = acc + v * conv_w[K - 1 - d][None, :]
    if conv_bias is not None:
        acc = acc + conv_bias.astype(jnp.float32)

    # ---- write back the last K-1 inputs of each segment
    last_rows = fb.cu_q_lens[:-1] + jnp.maximum(fb.q_lens - 1, 0)
    st_old = conv_st[bslots]
    fresh_b = (fb.prefix_lens == 0)
    ent = []
    for j in range(K - 1):
        back = K - 2 - j
        idx = last_rows - back
        from_stream = xi[jnp.clip(idx, 0, T - 1)].astype(conv_st.dtype)
        in_seg = (fb.q_lens - 1 - back) >= 0
        old_j = jnp.clip(j + fb.q_lens, 0, K - 2)
        from_state = jnp.take_along_axis(
            st_old, old_j[:, None, None], axis=1
        )[:, 0]
        from_state = jnp.where(
            fresh_b[:, None], jnp.zeros_like(from_state), from_state
        )
        ent.append(jnp.where(in_seg[:, None], from_stream, from_state))
    new_conv = conv_st.at[bslots].set(
        jnp.stack(ent, axis=1).astype(conv_st.dtype)
    )
    return acc, new_conv


def l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(
        jnp.sum(jnp.square(xf), axis=-1, keepdims=True) + eps
    )


def gated_delta_rule(
    q: jax.Array,       # [T, nv, dk] (already l2-normed + scaled)
    k: jax.Array,       # [T, nv, dk] (already l2-normed)
    v: jax.Array,       # [T, nv, dv]
    g: jax.Array,       # [T, nv] log decay (<= 0)
    beta: jax.Array,    # [T, nv] write strength in (0, 1)
    fb: ForwardBatch,
    state: jax.Array,   # [S+1, nv, dk, dv] f32 per-slot recurrent state
) -> Tuple[jax.Array, jax.Array]:
    """Gated delta rule over the ragged stream:

        S_t = exp(g_t) * S_{t-1} + k_t ⊗ ((v_t - k_t·(exp(g_t) S_{t-1})) β_t)
        o_t = q_t · S_t

    Tokens at segment offset 0 load S from their slot (zeros for fresh
    requests); each segment's final state scatters back by slot. Returns
    (out [T, nv, dv] f32, new state).

    Two paths (static dispatch on fb.mode):
    - DECODE: every row is its own 1-token segment — one fully
      vectorized update over the batch, no scan.
    - EXTEND: lax.scan over the stream that CARRIES the state pool and
      dynamic-updates one slot row per step (segment-last rows write
      their slot, others write the trash row) — per-token state stacking
      would be T × nv×dk×dv (GBs at real shapes), so it is avoided."""
    T = q.shape[0]
    sid = fb.seq_ids
    bslots = (fb.state_slots if fb.state_slots is not None
              else fb.req_slots)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = jnp.exp(g.astype(jnp.float32))       # [T, nv]
    bf = beta.astype(jnp.float32)
    pool = state.astype(jnp.float32)

    if fb.mode.is_decode():
        # [B]-vectorized single-step update (B == T).
        fresh = (fb.prefix_lens == 0)[:, None, None, None]
        S_in = jnp.where(fresh, 0.0, pool[bslots])  # [B, nv, dk, dv]
        S_dec = S_in * gf[:, :, None, None]
        kv_mem = jnp.einsum("bnk,bnkv->bnv", kf, S_dec)
        delta = (vf - kv_mem) * bf[:, :, None]
        S = S_dec + kf[:, :, :, None] * delta[:, :, None, :]
        out = jnp.einsum("bnk,bnkv->bnv", qf, S)
        new_state = state.at[bslots].set(S.astype(state.dtype))
        return out, new_state

    offs = jnp.arange(T, dtype=jnp.int32) - fb.cu_q_lens[sid]
    slot = bslots[sid]
    fresh_req = (fb.prefix_lens[sid] == 0)
    fresh = offs == 0
    is_last = offs == (fb.q_lens[sid] - 1)
    trash = state.shape[0] - 1
    write_idx = jnp.where(is_last, slot, trash)

    def step(carry, inp):
        S_prev, pool_c = carry
        q_t, k_t, v_t, g_t, b_t, is_fresh, is_fresh_req, slot_t, w_idx = inp
        S_init = jnp.where(is_fresh_req, 0.0, pool_c[slot_t])
        S_in = jnp.where(is_fresh, S_init, S_prev)
        S_dec = S_in * g_t[:, None, None]
        kv_mem = jnp.einsum("nk,nkv->nv", k_t, S_dec)
        delta = (v_t - kv_mem) * b_t[:, None]
        S = S_dec + k_t[:, :, None] * delta[:, None, :]
        o_t = jnp.einsum("nk,nkv->nv", q_t, S)
        pool_c = jax.lax.dynamic_update_index_in_dim(pool_c, S, w_idx, 0)
        return (S, pool_c), o_t

    nv, dk = q.shape[1], q.shape[2]
    dv = v.shape[2]
    (_, pool), out = jax.lax.scan(
        step,
        (jnp.zeros((nv, dk, dv), jnp.float32), pool),
        (qf, kf, vf, gf, bf, fresh, fresh_req, slot, write_idx),
    )
    return out, pool.astype(state.dtype)
