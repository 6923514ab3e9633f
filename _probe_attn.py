"""Isolated decode-attention A/B at 8B bench shapes (bf16 KV).

A: current — gather pages, reshape [B,C,nk,hd] (physical relayout), einsum
B: split-half — view [B,C,2,nk/2,hd] (bitcast off the pool tiling), einsum
   with the half dim as a batch axis
C: gather only (roofline of the page reads)

Usage: python _probe_attn.py [A|B|C] [iters]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

mode = sys.argv[1] if len(sys.argv) > 1 else "A"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

B, nk, nq, hd, ps = 128, 8, 32, 128, 64
P = 12  # pages/seq (ctx 768 bucket)
L = 32
NP = B * P + 64
F = nk * hd
g = nq // nk
rng = np.random.default_rng(0)

kp = jnp.asarray(rng.standard_normal((NP, ps, 2, F // 2)), jnp.bfloat16)
vp = jnp.asarray(rng.standard_normal((NP, ps, 2, F // 2)), jnp.bfloat16)
pt = jnp.asarray(
    rng.permutation(NP - 64)[: B * P].reshape(B, P) + 64, jnp.int32
)
q = jnp.asarray(rng.standard_normal((B, nq, hd)), jnp.bfloat16)
seq_lens = jnp.full((B,), 700, jnp.int32)
C = P * ps


def attn_a(q, kp, vp, pt, seq_lens):
    out = jnp.zeros((B, nq, hd), jnp.float32)
    for _ in range(L):
        k = kp[pt].reshape(B, C, nk, hd)
        v = vp[pt].reshape(B, C, nk, hd)
        qf = q.reshape(B, nk, g, hd)
        scores = jnp.einsum("bkgd,bckd->bkgc", qf, k,
                            preferred_element_type=jnp.float32)
        ctx = jnp.arange(C, dtype=jnp.int32)
        mask = ctx[None, :] < seq_lens[:, None]
        scores = jnp.where(mask[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bkgc,bckd->bkgd", probs.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        out = out + o.reshape(B, nq, hd)
    return out


def attn_b(q, kp, vp, pt, seq_lens):
    h2 = nk // 2
    out = jnp.zeros((B, nq, hd), jnp.float32)
    for _ in range(L):
        k = kp[pt].reshape(B, C, 2, h2, hd)
        v = vp[pt].reshape(B, C, 2, h2, hd)
        qf = q.reshape(B, 2, h2, g, hd)
        scores = jnp.einsum("bhjgd,bchjd->bhjgc", qf, k,
                            preferred_element_type=jnp.float32)
        ctx = jnp.arange(C, dtype=jnp.int32)
        mask = ctx[None, :] < seq_lens[:, None]
        scores = jnp.where(mask[:, None, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhjgc,bchjd->bhjgd", probs.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        out = out + o.reshape(B, nq, hd)
    return out


def attn_e(q, kp, vp, pt, seq_lens):
    """Block-diagonal padded q: consume gathers in native [B,C,2,F/2]
    form with NO reshape of the big arrays. 4x attention FLOPs (free at
    decode — bandwidth-bound); q pad + output diag extraction are tiny."""
    h2 = nk // 2
    fh = F // 2
    eye = jnp.eye(h2, dtype=q.dtype)
    out = jnp.zeros((B, nq, hd), jnp.float32)
    for _ in range(L):
        k = kp[pt].reshape(B, C, 2, fh)  # leading-dim merge: free
        v = vp[pt].reshape(B, C, 2, fh)
        qf = q.reshape(B, 2, h2, g, hd)
        qpad = jnp.einsum("bhjgd,jk->bhjgkd", qf, eye).reshape(
            B, 2, h2 * g, fh)
        scores = jnp.einsum("bhgf,bchf->bhgc", qpad, k,
                            preferred_element_type=jnp.float32)
        ctx = jnp.arange(C, dtype=jnp.int32)
        mask = ctx[None, :] < seq_lens[:, None]
        scores = jnp.where(mask[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        opad = jnp.einsum("bhgc,bchf->bhgf", probs.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
        od = opad.reshape(B, 2, h2, g, h2, hd)
        o = jnp.einsum("bhjgjd->bhjgd", od)
        out = out + o.reshape(B, nq, hd)
    return out


def gather_only(q, kp, vp, pt, seq_lens):
    out = jnp.zeros((), jnp.float32)
    for _ in range(L):
        k = kp[pt]
        v = vp[pt]
        out = out + k.astype(jnp.float32)[0, 0, 0, 0] \
            + v.astype(jnp.float32)[0, 0, 0, 0]
    return out


fn = {"A": attn_a, "B": attn_b, "C": gather_only, "E": attn_e}[mode]
jf = jax.jit(fn)
r = jf(q, kp, vp, pt, seq_lens)
np.asarray(r)  # compile + run once
if mode in ("B", "E"):
    ra = np.asarray(jax.jit(attn_a)(q, kp, vp, pt, seq_lens))
    print(f"A-{mode} max diff:",
          np.abs(ra - np.asarray(r).reshape(ra.shape)).max())
t0 = time.perf_counter()
for _ in range(iters):
    r = jf(q, kp, vp, pt, seq_lens)
np.asarray(r)
dt = (time.perf_counter() - t0) / iters
gb = 2 * B * P * ps * 2 * (F // 2) * 2 / 1e9
print(f"mode {mode}: {dt*1000:.1f} ms for {L} layers "
      f"({dt*1000/L:.2f} ms/layer, gathered {gb*L:.1f} GB -> "
      f"{gb*L/dt:.0f} GB/s)")
