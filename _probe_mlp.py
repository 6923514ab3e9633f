"""Isolated 8B MLP chain A/B: int4 fused gate_up layouts.

A: current — packed [in/2, 2, I], one two-dot with dn=((1,),(0,)) over the
   3-D weight (XLA materializes 29MB VMEM half-slices per step)
B: slot-major packed [2, in/2, I], per-slot static slices + two-dots
C: separate gate/up packed buffers (what B approximates with zero copies)

Usage: python _probe_mlp.py [A|B|C] [iters]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

mode = sys.argv[1] if len(sys.argv) > 1 else "A"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

B, H, I, L = 128, 4096, 14336, 32
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, H)), jnp.bfloat16)

wq_a = jnp.asarray(rng.integers(-120, 120, (H // 2, 2, I)), jnp.int8)
wq_b = jnp.asarray(np.moveaxis(np.asarray(wq_a), 1, 0))  # [2, H//2, I]
sc = jnp.asarray(rng.random((2, I)) * 0.01, jnp.float32)
wd_q = jnp.asarray(rng.integers(-120, 120, (I // 2, H)), jnp.int8)
sd = jnp.asarray(rng.random((H,)) * 0.01, jnp.float32)


def two_dot(xp, w2d, scale):
    lo = jnp.right_shift(jnp.left_shift(w2d, 4), 4)
    hi = jnp.right_shift(w2d, 4)
    y = (jnp.dot(xp[..., 0], lo.astype(jnp.bfloat16),
                 preferred_element_type=jnp.bfloat16)
         + jnp.dot(xp[..., 1], hi.astype(jnp.bfloat16),
                   preferred_element_type=jnp.bfloat16))
    return y * scale.astype(jnp.bfloat16)


def mlp_a(x):
    out = x
    for _ in range(L):
        w = wq_a
        lo = jnp.right_shift(jnp.left_shift(w, 4), 4)
        hi = jnp.right_shift(w, 4)
        xp = out.reshape(B, H // 2, 2)
        dn = (((1,), (0,)), ((), ()))
        y = (jax.lax.dot_general(xp[..., 0], lo.astype(jnp.bfloat16),
                                 dimension_numbers=dn,
                                 preferred_element_type=jnp.bfloat16)
             + jax.lax.dot_general(xp[..., 1], hi.astype(jnp.bfloat16),
                                   dimension_numbers=dn,
                                   preferred_element_type=jnp.bfloat16))
        y = y * sc.astype(jnp.bfloat16)  # [B, 2, I]
        h = jax.nn.silu(y[:, 0, :]) * y[:, 1, :]
        hp = h.reshape(B, I // 2, 2)
        out = two_dot(hp, wd_q, sd)
    return out


def mlp_b(x):
    out = x
    for _ in range(L):
        xp = out.reshape(B, H // 2, 2)
        g = two_dot(xp, wq_b[0], sc[0])
        u = two_dot(xp, wq_b[1], sc[1])
        h = jax.nn.silu(g) * u
        hp = h.reshape(B, I // 2, 2)
        out = two_dot(hp, wd_q, sd)
    return out


wg_c = wq_b[0]
wu_c = wq_b[1]


def mlp_c(x):
    out = x
    for _ in range(L):
        xp = out.reshape(B, H // 2, 2)
        g = two_dot(xp, wg_c, sc[0])
        u = two_dot(xp, wu_c, sc[1])
        h = jax.nn.silu(g) * u
        hp = h.reshape(B, I // 2, 2)
        out = two_dot(hp, wd_q, sd)
    return out


fn = {"A": mlp_a, "B": mlp_b, "C": mlp_c}[mode]
jf = jax.jit(fn)
r = np.asarray(jf(x))
if mode != "A":
    ra = np.asarray(jax.jit(mlp_a)(x))
    print("max diff vs A:", np.abs(ra.astype(np.float32)
                                   - r.astype(np.float32)).max())
t0 = time.perf_counter()
for _ in range(iters):
    r = jf(x)
np.asarray(r)
dt = (time.perf_counter() - t0) / iters
gb = (H * I + I * H // 2 * 0) / 1  # per layer: gate_up bytes
bytes_l = (H // 2 * 2 * I + I // 2 * H) / 1e9
print(f"mode {mode}: {dt*1000:.1f} ms / {L} layers "
      f"({dt*1000/L:.2f} ms/layer, {bytes_l*L:.1f} GB weights -> "
      f"{bytes_l*L/dt:.0f} GB/s)")
