"""Expert parallelism load balancing (EPLB).

Ref behavior: srt/eplb/{expert_distribution.py,eplb_manager.py,
eplb_algorithms/deepseek.py}. TPU-native recast:

- Recording: logical top-k routing counts per MoE layer accumulate on the
  HOST via jax.experimental.io_callback (gated — enabling changes the
  traced program, so /expert_distribution start/stop triggers a
  recompile; steady-state serving runs with recording off and zero
  overhead).
- Placement: each MoE layer carries a `log2phy` int32[E] PARAM mapping
  logical expert ids to physical slots (physical slot p lives on shard
  p // (E/ep)). Routing maps through it on device; a rebalance is just a
  donated params update that (a) writes the new mapping and (b) permutes
  the expert dim of the layer's weights to the new physical order —
  requests in flight never see a torn state because the update happens
  between steps.
- Algorithm: balanced packing — experts sorted by observed load, greedily
  assigned to the least-loaded shard with free capacity (each shard holds
  exactly E/ep experts). This is the no-redundancy core of the DeepSeek
  EPLB recipe; replicated experts are a follow-up.
"""

from __future__ import annotations

import logging
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# MoE layers register themselves at spec time: prefix -> num_experts.
MOE_LAYER_REGISTRY: Dict[str, int] = {}


class ExpertDistributionRecorder:
    """Host-side accumulation of logical routing counts per MoE layer."""

    def __init__(self):
        self.enabled = False
        self._lock = threading.Lock()
        self.counts: Dict[str, np.ndarray] = {}

    def start(self) -> None:
        with self._lock:
            self.counts = {}
            self.enabled = True

    def stop(self) -> None:
        self.enabled = False

    def dump(self) -> Dict[str, List[int]]:
        with self._lock:
            return {k: v.tolist() for k, v in self.counts.items()}

    def record(self, prefix: str, counts: np.ndarray) -> None:
        with self._lock:
            cur = self.counts.get(prefix)
            if cur is None:
                self.counts[prefix] = counts.astype(np.int64)
            else:
                cur += counts


RECORDER = ExpertDistributionRecorder()


def maybe_record(prefix: str, topk_idx, num_experts: int) -> None:
    """Called inside the jitted MoE forward; a no-op (not even traced)
    unless recording was enabled before the trace."""
    if not RECORDER.enabled:
        return
    import jax
    import jax.numpy as jnp

    counts = jnp.bincount(topk_idx.reshape(-1), length=num_experts)
    jax.experimental.io_callback(
        lambda c, p=prefix: RECORDER.record(p, np.asarray(c)),
        None,
        counts,
        ordered=False,
    )


def balanced_packing(load: np.ndarray, num_packs: int) -> np.ndarray:
    """Assign E experts to `num_packs` shards, E/num_packs each, greedily
    placing heavy experts on the least-loaded shard with free capacity.

    Returns phy2log [E]: physical slot p (shard p // cap) holds logical
    expert phy2log[p], slots within a shard ordered by assignment."""
    E = load.shape[0]
    assert E % num_packs == 0
    cap = E // num_packs
    order = np.argsort(-load, kind="stable")
    shard_load = np.zeros(num_packs)
    shard_items: List[List[int]] = [[] for _ in range(num_packs)]
    for e in order:
        free = [s for s in range(num_packs) if len(shard_items[s]) < cap]
        s = min(free, key=lambda s: shard_load[s])
        shard_items[s].append(int(e))
        shard_load[s] += load[e]
    phy2log = np.empty(E, np.int32)
    p = 0
    for s in range(num_packs):
        for e in shard_items[s]:
            phy2log[p] = e
            p += 1
    return phy2log


def compute_placements(
    loads: Dict[str, np.ndarray], ep_size: int
) -> Dict[str, np.ndarray]:
    """Per-layer phy2log placements from recorded loads."""
    return {
        prefix: balanced_packing(load.astype(np.float64), ep_size)
        for prefix, load in loads.items()
    }


def imbalance(load: np.ndarray, phy2log: np.ndarray, ep: int) -> float:
    """max/mean shard load under a placement (1.0 = perfect)."""
    E = load.shape[0]
    cap = E // ep
    shard = np.add.reduceat(load[phy2log], np.arange(0, E, cap))
    mean = shard.mean() or 1.0
    return float(shard.max() / mean)


def rebalance_params(params, placements: Dict[str, np.ndarray],
                     num_experts: Dict[str, int]):
    """Produce updated params: for each MoE prefix, permute the expert dim
    of its weights to the new physical order and rewrite log2phy.

    Pure host-side description; the caller jits/donates the update."""
    import jax.numpy as jnp

    updates = {}
    for prefix, new_phy2log in placements.items():
        E = num_experts[prefix]
        l2p_key = f"{prefix}/eplb_log2phy"
        if l2p_key not in params:
            logger.warning("no log2phy param for %s; skipping", prefix)
            continue
        cur_log2phy = np.asarray(params[l2p_key])  # [E] logical -> physical
        # new physical slot p holds logical new_phy2log[p], whose weights
        # currently sit at physical slot cur_log2phy[new_phy2log[p]].
        gather_idx = cur_log2phy[new_phy2log]  # [E]
        new_log2phy = np.empty(E, np.int32)
        new_log2phy[new_phy2log] = np.arange(E, dtype=np.int32)
        gi = jnp.asarray(gather_idx)
        for suffix in ("w_gate_up", "w_down", "w_gate_up/qscale",
                       "w_down/qscale"):
            key = f"{prefix}/{suffix}"
            if key in params:
                updates[key] = params[key][gi]
        updates[l2p_key] = jnp.asarray(new_log2phy)
    return updates
