"""Sampler exactness vs a full-vocab numpy oracle, including keep-sets
that extend past the TOPK_CAP candidate window (the exact sort branch).

Ref semantics: srt/layers/sampler.py top_k_top_p_min_p_sampling — sort
descending, keep ranks < top_k, exclusive-cumsum < top_p (absolute
probabilities), p >= min_p * p_max; renormalize and sample.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sglang_tpu.ops.sampling import TOPK_CAP, SamplingTensors, sample


def oracle_keep(logits_row, temp, top_k, top_p, min_p):
    """Reference keep-set (token ids) per torch-style truncation."""
    scaled = logits_row / max(temp, 1e-6)
    scaled = scaled - scaled.max()
    p = np.exp(scaled) / np.exp(scaled).sum()
    order = np.argsort(-p, kind="stable")
    ps = p[order]
    keep = np.arange(len(p)) < top_k
    keep &= (np.cumsum(ps) - ps) < top_p
    keep &= ps >= min_p * ps[0]
    return set(order[keep].tolist()), p


def _draw(logits_row, temp, top_k, top_p, min_p, n, seed=0):
    """n independent samples from our sampler for one config."""
    V = logits_row.shape[0]
    B = n
    logits = jnp.asarray(np.tile(logits_row, (B, 1)), jnp.float32)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i))(
        jnp.arange(B)
    )
    st = SamplingTensors(
        temperatures=jnp.full((B,), temp, jnp.float32),
        top_ks=jnp.full((B,), top_k, jnp.int32),
        top_ps=jnp.full((B,), top_p, jnp.float32),
        min_ps=jnp.full((B,), min_p, jnp.float32),
        freq_penalties=jnp.zeros((B,), jnp.float32),
        pres_penalties=jnp.zeros((B,), jnp.float32),
        rep_penalties=jnp.ones((B,), jnp.float32),
        rng_keys=keys,
    )
    toks, _ = jax.jit(sample)(logits, st)
    return np.asarray(toks)


def test_top_p_nucleus_beyond_cap():
    # Near-uniform logits: top_p=0.97 keeps ~ 0.97*V tokens >> TOPK_CAP.
    rng = np.random.default_rng(0)
    V = 512
    logits = rng.normal(0, 0.05, size=V).astype(np.float32)
    keep, p = oracle_keep(logits, 1.0, V, 0.97, 0.0)
    assert len(keep) > TOPK_CAP  # the scenario actually overflows the cap
    toks = _draw(logits, 1.0, V, 0.97, 0.0, 4096)
    assert set(toks.tolist()) <= keep
    # Tokens outside the top-256 candidates must be reachable.
    order = np.argsort(-p)
    beyond = set(order[TOPK_CAP:].tolist()) & keep
    assert len(set(toks.tolist()) & beyond) > 50


def test_top_k_between_cap_and_vocab():
    rng = np.random.default_rng(1)
    V = 512
    logits = rng.normal(0, 0.1, size=V).astype(np.float32)
    k = 400
    keep, _ = oracle_keep(logits, 1.0, k, 1.0, 0.0)
    assert len(keep) == k
    toks = _draw(logits, 1.0, k, 1.0, 0.0, 4096, seed=1)
    assert set(toks.tolist()) <= keep
    assert len(set(toks.tolist())) > TOPK_CAP  # beyond-cap tokens sampled


def test_min_p_admits_beyond_cap():
    rng = np.random.default_rng(2)
    V = 512
    logits = rng.normal(0, 0.02, size=V).astype(np.float32)
    keep, _ = oracle_keep(logits, 1.0, V, 1.0, 0.5)
    assert len(keep) > TOPK_CAP
    toks = _draw(logits, 1.0, V, 1.0, 0.5, 4096, seed=2)
    assert set(toks.tolist()) <= keep
    assert len(set(toks.tolist())) > TOPK_CAP


def test_in_cap_distribution_matches_oracle():
    # Peaked logits, nucleus well inside the cap: empirical TV distance
    # to the exact renormalized distribution should be small.
    rng = np.random.default_rng(3)
    V = 512
    logits = (rng.normal(0, 1.0, size=V) * 2).astype(np.float32)
    keep, p = oracle_keep(logits, 0.8, 50, 0.9, 0.0)
    assert len(keep) <= 50
    n = 8192
    toks = _draw(logits, 0.8, 50, 0.9, 0.0, n, seed=3)
    assert set(toks.tolist()) <= keep
    kept = sorted(keep)
    q = np.array([p[t] for t in kept])
    # renormalize under temperature: recompute p at temp
    scaled = logits / 0.8
    pt = np.exp(scaled - scaled.max())
    pt /= pt.sum()
    q = np.array([pt[t] for t in kept])
    q /= q.sum()
    emp = np.array([(toks == t).mean() for t in kept])
    tv = 0.5 * np.abs(emp - q).sum()
    assert tv < 0.05, tv


def test_top_p_absolute_mass_cut():
    # Flat-ish tail: within-cap renormalization used to admit extra
    # tokens (cutting at 0.9 of the CAP mass, not 0.9 absolute). Build a
    # case where the two rules disagree inside the cap.
    V = 512
    logits = np.zeros(V, np.float32)
    logits[:8] = 3.0  # 8 strong tokens carry most of the mass
    keep, _ = oracle_keep(logits, 1.0, V, 0.6, 0.0)
    toks = _draw(logits, 1.0, V, 0.6, 0.0, 4096, seed=4)
    assert set(toks.tolist()) <= keep


def test_greedy_rows_unaffected():
    rng = np.random.default_rng(5)
    V = 512
    logits = rng.normal(0, 1, size=V).astype(np.float32)
    toks = _draw(logits, 0.0, V, 0.97, 0.0, 16, seed=5)
    assert (toks == int(np.argmax(logits))).all()
