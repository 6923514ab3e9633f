"""Denoising schedulers: rectified-flow Euler + DDIM.

Ref: multimodal_gen/runtime/models/schedulers/ (FlowMatchEulerDiscrete,
DDIM et al — diffusers-compatible semantics). Both are expressed as
(timesteps, step_fn) pairs consumed by a lax.scan in pipeline.py: all
coefficients are precomputed host-side into static arrays, the scan body
is pure, and no python runs between steps.

FlowMatchEuler (SD3/Flux family): sigmas descend 1 -> 0 (optionally
time-shifted); x_{t+1} = x_t + (sigma_next - sigma) * v_pred.
DDIM (eta=0, epsilon-prediction, leading spacing): the deterministic
DDIM update over a linear-beta schedule, matching diffusers defaults.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SchedulerPlan:
    """Static per-run tables; step_scale/step_bias parameterize
    x' = a_t * x + b_t * model_out  (both schedulers reduce to this)."""

    timesteps: np.ndarray  # [S] model-facing timestep values
    x_coef: np.ndarray  # [S] a_t
    out_coef: np.ndarray  # [S] b_t
    init_sigma: float  # noise scale for x_0


def flow_match_euler(num_steps: int, shift: float = 1.0) -> SchedulerPlan:
    """sigma_i from 1 to 1/num_steps, with SD3 time shift
    sigma' = shift*s / (1 + (shift-1)*s); final step lands at 0."""
    s = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    sigmas = shift * s / (1.0 + (shift - 1.0) * s)
    nxt = np.append(sigmas[1:], 0.0)
    # x' = x + (sigma_next - sigma) * v  ->  a=1, b=(nxt - sig)
    return SchedulerPlan(
        timesteps=(sigmas * 1000.0).astype(np.float32),
        x_coef=np.ones(num_steps, np.float32),
        out_coef=(nxt - sigmas).astype(np.float32),
        init_sigma=1.0,
    )


def ddim(num_steps: int, train_steps: int = 1000,
         beta_start: float = 0.00085, beta_end: float = 0.012) -> SchedulerPlan:
    """Deterministic DDIM (eta=0) over the scaled-linear beta schedule
    (stable-diffusion default), leading timestep spacing.

    x' = sqrt(abar_prev/abar_t) * x
         + (sqrt(1-abar_prev) - sqrt(abar_prev*(1-abar_t)/abar_t)) * eps
    """
    betas = np.linspace(beta_start**0.5, beta_end**0.5, train_steps,
                        dtype=np.float64) ** 2
    abar = np.cumprod(1.0 - betas)
    stride = train_steps // num_steps
    ts = (np.arange(num_steps) * stride)[::-1].copy()  # leading spacing
    abar_t = abar[ts]
    abar_prev = np.where(ts - stride >= 0, abar[np.maximum(ts - stride, 0)],
                         1.0)
    a = np.sqrt(abar_prev / abar_t)
    b = np.sqrt(1.0 - abar_prev) - np.sqrt(abar_prev * (1.0 - abar_t)
                                           / abar_t)
    return SchedulerPlan(
        timesteps=ts.astype(np.float32),
        x_coef=a.astype(np.float32),
        out_coef=b.astype(np.float32),
        init_sigma=1.0,
    )


SCHEDULERS = {
    "flow_match_euler": flow_match_euler,
    "ddim": ddim,
}


def get_scheduler(name: str, num_steps: int, **kw) -> SchedulerPlan:
    if name not in SCHEDULERS:
        raise ValueError(f"unknown scheduler {name!r}; have "
                         f"{sorted(SCHEDULERS)}")
    return SCHEDULERS[name](num_steps, **kw)
