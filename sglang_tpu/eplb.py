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


def compute_redundant_placement(
    load: np.ndarray,
    ep: int,
    num_physical: int,
    rmax: int,
    dead_shards: Tuple[int, ...] = (),
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """DeepSeek-EPLB-style placement with replication (ref
    srt/eplb/eplb_algorithms/deepseek.py) plus elastic-EP shard exclusion
    (ref srt/elastic_ep/elastic_ep.py:23 recast: routing-level elasticity —
    dead shards keep their slots but no logical expert maps to them).

    Returns (phy2log [P], log2phy [E, rmax], logcnt [E]). Dead shards'
    slots are filled round-robin (arrays stay fully materialized under
    GSPMD) but excluded from log2phy, so no token ever routes there.
    """
    E = load.shape[0]
    P = num_physical
    assert P % ep == 0
    cap = P // ep
    live = [s for s in range(ep) if s not in set(dead_shards)]
    if not live:
        raise ValueError("all EP shards marked dead")
    budget = cap * len(live)
    if budget < E:
        raise ValueError(
            f"{len(live)} live shards x {cap} slots = {budget} < {E} "
            f"experts; cannot cover every expert"
        )
    # 1) Replication counts: greedily grant extra slots to the expert with
    #    the highest per-replica load (each replica halves its share).
    reps = np.ones(E, np.int64)
    max_reps = min(rmax, len(live))
    for _ in range(budget - E):
        score = load / reps
        score = np.where(reps >= max_reps, -1.0, score)
        e = int(np.argmax(score))
        if score[e] < 0:
            break  # everything at max replication; leftover slots stay filler
        reps[e] += 1
    # 2) Pack replica instances onto live shards: heavy first, least-loaded
    #    shard with free capacity, avoiding shards already holding a
    #    replica of the same expert when possible.
    items = []  # (share, expert)
    for e in range(E):
        items.extend([(float(load[e]) / reps[e], e)] * int(reps[e]))
    items.sort(key=lambda t: -t[0])
    shard_load = {s: 0.0 for s in live}
    shard_items: Dict[int, List[int]] = {s: [] for s in live}
    for share, e in items:
        free = [s for s in live if len(shard_items[s]) < cap]
        pref = [s for s in free if e not in shard_items[s]] or free
        s = min(pref, key=lambda s: shard_load[s])
        shard_items[s].append(e)
        shard_load[s] += share
    # 3) Fillers for any unpacked live slots and all dead-shard slots.
    phy2log = np.zeros(P, np.int32)
    routable = np.zeros(P, bool)
    for s in live:
        fill = shard_items[s] + [
            i % E for i in range(cap - len(shard_items[s]))
        ]
        phy2log[s * cap:(s + 1) * cap] = fill
        routable[s * cap:s * cap + len(shard_items[s])] = True
    for s in set(dead_shards):
        phy2log[s * cap:(s + 1) * cap] = np.arange(cap, dtype=np.int32) % E
    # 4) Invert to log2phy/logcnt over routable slots only.
    log2phy = np.zeros((E, rmax), np.int32)
    logcnt = np.zeros(E, np.int32)
    for p in range(P):
        if not routable[p]:
            continue
        e = int(phy2log[p])
        if logcnt[e] < rmax:
            log2phy[e, logcnt[e]] = p
            logcnt[e] += 1
    assert (logcnt > 0).all()
    for e in range(E):
        log2phy[e, logcnt[e]:] = log2phy[e, 0]  # pad with the primary
    return phy2log, log2phy, logcnt


def rebalance_params_redundant(
    params,
    placements: Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray]],
):
    """Param updates for replicated placements: new physical slot p gets
    the weights of logical expert phy2log[p], sourced from that expert's
    CURRENT primary slot; log2phy/logcnt are rewritten."""
    import jax.numpy as jnp

    updates = {}
    for prefix, (phy2log, log2phy, logcnt) in placements.items():
        l2p_key = f"{prefix}/eplb_log2phy"
        if l2p_key not in params:
            logger.warning("no log2phy param for %s; skipping", prefix)
            continue
        cur_l2p = np.asarray(params[l2p_key])
        cur_primary = cur_l2p[:, 0] if cur_l2p.ndim == 2 else cur_l2p  # [E]
        gather_idx = cur_primary[phy2log]  # [P]
        gi = jnp.asarray(gather_idx)
        for suffix in ("w_gate_up", "w_down", "w_gate_up/qscale",
                       "w_down/qscale"):
            key = f"{prefix}/{suffix}"
            if key in params:
                updates[key] = params[key][gi]
        updates[l2p_key] = jnp.asarray(log2phy)
        cnt_key = f"{prefix}/eplb_logcnt"
        if cnt_key in params:
            updates[cnt_key] = jnp.asarray(logcnt)
    return updates


def imbalance_redundant(load: np.ndarray, log2phy: np.ndarray,
                        logcnt: np.ndarray, num_physical: int,
                        ep: int) -> float:
    """max/mean shard load with each expert's load split over its ROUTABLE
    replicas (filler/dead slots carry none)."""
    cap = num_physical // ep
    shard = np.zeros(ep)
    for e in range(load.shape[0]):
        share = load[e] / max(int(logcnt[e]), 1)
        for r in range(int(logcnt[e])):
            shard[int(log2phy[e, r]) // cap] += share
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
