"""Build padded SamplingTensors from per-request SamplingParams.

Ref: srt/sampling/sampling_batch_info.py. Host numpy; rows beyond the real
batch get greedy defaults (they are padding and filtered after fetch).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from sglang_tpu.ops.sampling import SamplingTensors
from sglang_tpu.sampling.sampling_params import TOP_K_ALL, SamplingParams


def build_sampling_tensors(
    params_list: List[SamplingParams],
    seeds: Sequence[int],
    steps: Sequence[int],
    padded_bs: int,
) -> SamplingTensors:
    n = len(params_list)
    B = padded_bs
    temps = np.zeros(B, np.float32)
    top_ks = np.full(B, TOP_K_ALL, np.int32)
    top_ps = np.ones(B, np.float32)
    min_ps = np.zeros(B, np.float32)
    freq = np.zeros(B, np.float32)
    pres = np.zeros(B, np.float32)
    rep = np.ones(B, np.float32)
    keys = np.zeros((B, 2), np.uint32)
    for i, sp in enumerate(params_list):
        temps[i] = sp.temperature
        top_ks[i] = sp.top_k if sp.top_k > 0 else TOP_K_ALL
        top_ps[i] = sp.top_p
        min_ps[i] = sp.min_p
        freq[i] = sp.frequency_penalty
        pres[i] = sp.presence_penalty
        rep[i] = sp.repetition_penalty
        keys[i, 0] = np.uint32(seeds[i] & 0xFFFFFFFF)
        keys[i, 1] = np.uint32(steps[i] & 0xFFFFFFFF)
    return SamplingTensors(
        temperatures=jnp.asarray(temps),
        top_ks=jnp.asarray(top_ks),
        top_ps=jnp.asarray(top_ps),
        min_ps=jnp.asarray(min_ps),
        freq_penalties=jnp.asarray(freq),
        pres_penalties=jnp.asarray(pres),
        rep_penalties=jnp.asarray(rep),
        rng_keys=jnp.asarray(keys),
    )
