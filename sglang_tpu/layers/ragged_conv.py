"""Seeded causal depthwise conv over the ragged token stream.

The shared primitive under every conv-state recurrent family (Mamba-1/2
xBC conv, LFM2 short-conv, GDN short-conv): each request segment in the
[T, C] stream convolves causally over its own history, where history
older than the segment start comes from the slot-indexed conv state
(written by the previous chunk/step). Ref behavior:
causal_conv1d_fn/update in srt/layers/attention/mamba/.

State layout: conv_st [num_slots+1, K-1, C] holds the K-1 inputs
preceding each request's next token, oldest first.
"""

from __future__ import annotations

import jax.numpy as jnp


def seeded_causal_conv(fb, x, conv_st, w, bias=None):
    """Causal depthwise conv with per-request state seeding.

    x: [T, C] the ragged stream (any float dtype; accumulates f32).
    conv_st: [S+1, K-1, C] slot-indexed previous inputs.
    w: [K, C] depthwise taps (tap K-1 hits the current token).
    Returns conv output [T, C] float32 (no activation applied).
    """
    T = x.shape[0]
    K = w.shape[0]
    sid = fb.seq_ids
    offs = jnp.arange(T, dtype=jnp.int32) - fb.cu_q_lens[sid]
    bslots = (fb.state_slots if fb.state_slots is not None
              else fb.req_slots)
    slot = bslots[sid]
    w_f = w.astype(jnp.float32)
    acc = x.astype(jnp.float32) * w_f[K - 1][None, :]
    st_f = conv_st.astype(jnp.float32)
    fresh_req = (fb.prefix_lens[sid] == 0)
    for d in range(1, K):
        from_stream = jnp.roll(x, d, axis=0).astype(jnp.float32)
        ent_idx = jnp.clip(K - 1 - d + offs, 0, K - 2)
        from_state = jnp.where(
            fresh_req[:, None], 0.0, st_f[slot, ent_idx]
        )
        v = jnp.where((offs >= d)[:, None], from_stream, from_state)
        acc = acc + v * w_f[K - 1 - d][None, :]
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc


def conv_state_writeback(fb, x, conv_st):
    """Store each request's last K-1 stream inputs back into its slot,
    shifting in entries from the old state when the segment is shorter
    than the window. x: [T, C]; conv_st: [S+1, K-1, C]."""
    T = x.shape[0]
    K = conv_st.shape[1] + 1
    bslots = (fb.state_slots if fb.state_slots is not None
              else fb.req_slots)
    last_rows = fb.cu_q_lens[:-1] + jnp.maximum(fb.q_lens - 1, 0)
    st_old = conv_st[bslots]
    fresh_b = (fb.prefix_lens == 0)
    ents = []
    for j in range(K - 1):
        back = K - 2 - j
        idx = last_rows - back
        from_stream = x[jnp.clip(idx, 0, T - 1)].astype(conv_st.dtype)
        in_seg = (fb.q_lens - 1 - back) >= 0
        old_j = jnp.clip(j + fb.q_lens, 0, K - 2)
        from_old = jnp.where(
            fresh_b[:, None],
            jnp.zeros_like(from_stream),
            jnp.take_along_axis(
                st_old, old_j[:, None, None].repeat(st_old.shape[2], 2),
                axis=1,
            )[:, 0, :],
        )
        ents.append(jnp.where(in_seg[:, None], from_stream, from_old))
    return conv_st.at[bslots].set(
        jnp.stack(ents, axis=1).astype(conv_st.dtype)
    )
