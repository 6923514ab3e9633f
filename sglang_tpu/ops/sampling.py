"""On-device sampler (runs inside the jitted step program).

Ref: srt/layers/sampler.py:70 + sampling/sampling_batch_info.py. All
branches are vectorized over the batch — greedy rows and sampled rows share
one program via jnp.where, which keeps a single jit signature per bucket.

Strategy (TPU-shaped):
- greedy -> argmax
- unrestricted sampling -> Gumbel-max (no sort, no cumsum over V)
- top-k/top-p/min-p -> restrict to the top TOPK_CAP candidates via
  lax.top_k, apply masks there, Gumbel-max within. Candidate probabilities
  use the FULL-vocab softmax normalizer (exp(v - lse)), so the top_p cut
  is absolute mass like the reference, not mass renormalized within the
  cap. Rows whose keep-set provably ends inside the cap are exact here.
- Rows whose nucleus/top_k/min_p set may extend past the cap take an
  exact full-vocab branch (sort + cumsum -> per-row value threshold)
  guarded by lax.cond, so its cost is only paid on steps that need it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

TOPK_CAP = 256
NEG_INF = -1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplingTensors:
    """Per-batch-row sampling controls, shape [B]."""

    temperatures: jax.Array  # f32 (0.0 == greedy)
    top_ks: jax.Array  # i32 (>= TOPK_CAP means "all")
    top_ps: jax.Array  # f32
    min_ps: jax.Array  # f32
    # Penalties: token-count state [B, V] int32, allocated only when used.
    # (ref: srt/sampling/penaltylib)
    freq_penalties: jax.Array  # f32 [B]
    pres_penalties: jax.Array  # f32 [B]
    rep_penalties: jax.Array  # f32 [B]
    rng_keys: jax.Array  # uint32 [B, 2] (per-row fold of seed+step)


def apply_penalties(
    logits: jax.Array,
    token_counts: Optional[jax.Array],
    st: SamplingTensors,
) -> jax.Array:
    if token_counts is None:
        return logits
    counts = token_counts.astype(jnp.float32)
    appeared = (counts > 0).astype(jnp.float32)
    logits = logits - st.freq_penalties[:, None] * counts
    logits = logits - st.pres_penalties[:, None] * appeared
    rp = st.rep_penalties[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(appeared > 0, penalized, logits)
    return logits


def _chosen_logprob(logits: jax.Array, tokens: jax.Array) -> jax.Array:
    """log p(token) via logsumexp — avoids materializing log_softmax [B,V]."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    chosen = jnp.take_along_axis(logits, tokens[:, None], axis=1)[:, 0]
    return chosen - lse


def sample(
    logits: jax.Array,  # [B, V] float32
    st: SamplingTensors,
    token_counts: Optional[jax.Array] = None,
    vocab_mask: Optional[jax.Array] = None,  # bool [B, V], True = banned
    all_greedy: bool = False,  # static: skip the sampling machinery
) -> Tuple[jax.Array, jax.Array]:
    """Returns (next_tokens [B] int32, logprobs_of_chosen [B] f32)."""
    B, V = logits.shape
    logits = apply_penalties(logits, token_counts, st)
    if vocab_mask is not None:
        logits = jnp.where(vocab_mask, NEG_INF, logits)

    greedy_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if all_greedy:
        return greedy_tokens, _chosen_logprob(logits, greedy_tokens)

    temps = jnp.maximum(st.temperatures, 1e-6)[:, None]
    scaled = logits / temps
    lse = jax.nn.logsumexp(scaled, axis=-1, keepdims=True)  # [B, 1]

    # --- restricted path: top-k / top-p / min-p within TOPK_CAP candidates ---
    top_vals, top_idx = jax.lax.top_k(scaled, min(TOPK_CAP, V))  # [B, C]
    C = top_vals.shape[1]
    ranks = jnp.arange(C, dtype=jnp.int32)[None, :]
    keep = ranks < jnp.minimum(st.top_ks, C)[:, None]
    # ABSOLUTE probabilities (full-vocab softmax normalizer), so the
    # top_p cut means the same mass as the reference's sort-over-V rule.
    probs = jnp.exp(top_vals - lse)
    cum = jnp.cumsum(probs, axis=-1)
    # Keep tokens while cumulative prob (exclusive) < top_p.
    keep_p = (cum - probs) < st.top_ps[:, None]
    keep_m = probs >= (st.min_ps[:, None] * probs[:, :1])
    keep &= keep_p & keep_m
    masked_vals = jnp.where(keep, top_vals, NEG_INF)

    gumbel_t = -jnp.log(
        -jnp.log(
            jax.vmap(lambda k: jax.random.uniform(k, (C,), jnp.float32, 1e-10, 1.0))(
                st.rng_keys
            )
        )
    )
    restricted_choice = jnp.argmax(masked_vals + gumbel_t, axis=-1)
    restricted_tokens = jnp.take_along_axis(
        top_idx, restricted_choice[:, None], axis=1
    )[:, 0].astype(jnp.int32)

    # --- unrestricted path: Gumbel-max over full vocab ---
    gumbel_v = -jnp.log(
        -jnp.log(
            jax.vmap(lambda k: jax.random.uniform(k, (V,), jnp.float32, 1e-10, 1.0))(
                st.rng_keys
            )
        )
    )
    free_tokens = jnp.argmax(scaled + gumbel_v, axis=-1).astype(jnp.int32)

    is_greedy = st.temperatures == 0.0
    needs_top = (st.top_ks < V) | (st.top_ps < 1.0) | (st.min_ps > 0.0)

    if C < V:
        # A row's keep-set may extend past the cap when every capped
        # candidate is still admitted by each active filter; exactness
        # then needs the full-vocab sort branch (lax.cond: its cost is
        # only paid on steps where some row actually overflows the cap).
        # If the LAST capped candidate is still kept, no filter cut the
        # set inside the cap, so the true keep-set may extend beyond it.
        needs_exact = (~is_greedy) & needs_top & keep[:, -1]

        def _exact(_):
            # Full-vocab descending sort -> exact per-row cut VALUE for
            # the combined top_k/top_p rule, applied back in token order
            # so the already-drawn full-vocab Gumbel field is reused.
            svals = -jax.lax.sort(-scaled, dimension=1)  # [B, V] desc
            sprobs = jnp.exp(svals - lse)
            scum = jnp.cumsum(sprobs, axis=-1)
            n_p = jnp.sum(
                (scum - sprobs) < st.top_ps[:, None], axis=-1
            ).astype(jnp.int32)
            n = jnp.minimum(jnp.maximum(n_p, 1), st.top_ks)  # [B]
            v_cut = jnp.take_along_axis(svals, (n - 1)[:, None], axis=1)
            p_full = jnp.exp(scaled - lse)
            keep_full = (scaled >= v_cut) & (
                p_full >= st.min_ps[:, None] * sprobs[:, :1]
            )
            masked_full = jnp.where(keep_full, scaled, NEG_INF)
            return jnp.argmax(masked_full + gumbel_v, axis=-1).astype(
                jnp.int32
            )

        exact_tokens = jax.lax.cond(
            jnp.any(needs_exact), _exact, lambda _: restricted_tokens, None
        )
        restricted_tokens = jnp.where(
            needs_exact, exact_tokens, restricted_tokens
        )

    sampled = jnp.where(needs_top, restricted_tokens, free_tokens)
    tokens = jnp.where(is_greedy, greedy_tokens, sampled)
    return tokens, _chosen_logprob(logits, tokens)


def spec_candidate_probs(
    logits: jax.Array,  # [T, V] f32 (one row per tree node)
    temps: jax.Array,  # [T] f32 (0.0 == greedy)
    top_ks: jax.Array,  # [T] i32
    top_ps: jax.Array,  # [T] f32
    min_ps: jax.Array,  # [T] f32
    cand_tokens: jax.Array,  # [T, Kc] i32 candidate (child) tokens, -1 pad
    rng_keys: jax.Array,  # [T] PRNG keys
):
    """Speculative-verify probabilities for rejection-sampled acceptance
    (ref tree_speculative_sampling_target_only kernels, recast for
    deterministic draft proposals — see core/schedule_core.py walk).

    Per row: p = the row's SAMPLER-TRANSFORMED target distribution
    (temperature, top-k, top-p, min-p — same truncation as ops.sample).
    Returns:
      p_cand [T, Kc]  — p at each candidate token (0 where truncated/pad)
      fb_tok [T]      — a sample from p EXCLUDING the candidates
      fb_lp [T]       — log p(fb_tok) under the row's transformed p
    Greedy rows (temp == 0) degrade exactly: p_cand is the argmax
    indicator and fb_tok is the argmax (or argmax excluding candidates
    when a candidate IS the argmax)."""
    T, V = logits.shape
    Kc = cand_tokens.shape[1]
    temps_c = jnp.maximum(temps, 1e-6)[:, None]
    scaled = logits / temps_c
    top_vals, top_idx = jax.lax.top_k(scaled, min(TOPK_CAP, V))  # [T, C]
    C = top_vals.shape[1]
    ranks = jnp.arange(C, dtype=jnp.int32)[None, :]
    keep = ranks < jnp.minimum(top_ks, C)[:, None]
    # Absolute (full-vocab softmax) probabilities for the top_p cut —
    # same normalization as ops.sample; renormalized over the keep-set
    # below, as the rejection-sampling math requires.
    probs = jnp.exp(top_vals - jax.nn.logsumexp(scaled, axis=-1)[:, None])
    cum = jnp.cumsum(probs, axis=-1)
    keep &= (cum - probs) < top_ps[:, None]
    keep &= probs >= (min_ps[:, None] * probs[:, :1])
    # greedy rows: keep only rank 0
    greedy = (temps == 0.0)[:, None]
    keep = jnp.where(greedy, ranks == 0, keep)
    p = jnp.where(keep, probs, 0.0)
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-20)  # [T, C]

    # candidate probs: match candidate tokens against the C-candidate ids
    is_cand = top_idx[:, None, :] == cand_tokens[:, :, None]  # [T, Kc, C]
    p_cand = jnp.sum(jnp.where(is_cand, p[:, None, :], 0.0), axis=-1)

    # fallback: sample from p excluding ALL candidates (renormalized)
    excl = jnp.any(is_cand, axis=1)  # [T, C]
    p_fb = jnp.where(excl, 0.0, p)
    p_fb_n = p_fb / jnp.maximum(jnp.sum(p_fb, axis=-1, keepdims=True), 1e-20)
    gumbel = -jnp.log(
        -jnp.log(
            jax.vmap(
                lambda k: jax.random.uniform(k, (C,), jnp.float32, 1e-10, 1.0)
            )(rng_keys)
        )
    )
    masked_logp = jnp.where(p_fb_n > 0, jnp.log(p_fb_n), NEG_INF)
    choice = jnp.argmax(masked_logp + gumbel, axis=-1)  # [T]
    fb_tok = jnp.take_along_axis(top_idx, choice[:, None], axis=1)[:, 0]
    fb_p = jnp.take_along_axis(p, choice[:, None], axis=1)[:, 0]
    fb_lp = jnp.log(jnp.maximum(fb_p, 1e-20))
    return p_cand, fb_tok.astype(jnp.int32), fb_lp


def compute_logprobs(logits: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k logprobs for the logprob API: ([B, k] vals, [B, k] ids)."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(lp, k)
    return vals, idx.astype(jnp.int32)
