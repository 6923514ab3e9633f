"""Multi-LoRA batching.

Ref: srt/lora/{lora_manager.py:59 (load_lora_adapter:221,
prepare_lora_batch:428), mem_pool.py, backend/, eviction_policy.py}.
TPU-native design: all loaded adapters live in stacked device pools
`A [G, in, r_max]`, `B [G, r_max, out]` per target projection per layer;
a batch's tokens are sorted by adapter id once and the LoRA deltas run as
two grouped GEMMs via jax.lax.ragged_dot (the same dropless Megablox
pattern as MoE) — no SGMV CUDA kernels needed. Slot 0 is the identity
(zero) adapter.

Round-4 depth (the reference's serving features):
- LRU EVICTION with request pinning: a full pool evicts the
  least-recently-used adapter not pinned by a running request instead of
  refusing the load (ref srt/lora/eviction_policy.py).
- lm_head / embed_tokens adapters (ref lora_manager target_modules):
  opt-in pools (vocab-sized) applied at the logits tap and the embedding
  lookup; peft lora_embedding_A/B layouts honored.
- OVERLAP LOADING: load_async() reads + stages the adapter off-thread
  and publishes the slot only when every pool is updated, so serving
  never blocks on adapter IO (ref lora_manager.py overlap loading).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# our param-tree projection name -> (hf peft module name, fusion slot)
TARGET_MAP = {
    "q_proj": ("q_proj", None),
    "kv_proj_k": ("k_proj", 0),
    "kv_proj_v": ("v_proj", 1),
    "o_proj": ("o_proj", None),
    "gate_up_gate": ("gate_proj", 0),
    "gate_up_up": ("up_proj", 1),
    "down": ("down_proj", None),
}


@dataclasses.dataclass
class LoRAAdapter:
    name: str
    path: str
    rank: int
    alpha: float
    # (layer, our_target) -> (A [in, r], B [r, out]) numpy
    weights: Dict[Tuple[int, str], Tuple[np.ndarray, np.ndarray]]

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def load_adapter(name: str, path: str) -> LoRAAdapter:
    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    rank = cfg["r"]
    alpha = cfg.get("lora_alpha", rank)
    from safetensors import safe_open

    weights: Dict[Tuple[int, str], Tuple[np.ndarray, np.ndarray]] = {}
    raw: Dict[str, np.ndarray] = {}
    st_path = os.path.join(path, "adapter_model.safetensors")
    with safe_open(st_path, framework="np") as sf:
        for k in sf.keys():
            raw[k] = sf.get_tensor(k).astype(np.float32)
    # peft names: base_model.model.model.layers.N.self_attn.q_proj.lora_A.weight
    for key, arr in raw.items():
        if ".lm_head." in key and (".lora_A." in key or ".lora_B." in key):
            a, b = weights.get((-1, "lm_head"), (None, None))
            if ".lora_A." in key:
                a = arr.T  # [r, H] -> [H, r]
            else:
                b = arr.T  # [V, r] -> [r, V]
            weights[(-1, "lm_head")] = (a, b)
            continue
        if ".embed_tokens." in key and ".lora_embedding_" in key:
            # peft Embedding adapters: lora_embedding_A [r, V],
            # lora_embedding_B [H, r]; ours: A [V, r] token-gathered,
            # B [r, H].
            a, b = weights.get((-1, "embed_tokens"), (None, None))
            if key.endswith("lora_embedding_A"):
                a = arr.T
            else:
                b = arr.T
            weights[(-1, "embed_tokens")] = (a, b)
            continue
        if ".lora_A." not in key and ".lora_B." not in key:
            continue
        if "layers" not in key.split("."):
            continue
        parts = key.split(".")
        layer_idx = int(parts[parts.index("layers") + 1])
        hf_target = None
        for p in parts:
            for ours, (hf, _) in TARGET_MAP.items():
                if p == hf:
                    hf_target = p
            if hf_target:
                break
        if hf_target is None:
            continue
        is_a = ".lora_A." in key
        for ours, (hf, _) in TARGET_MAP.items():
            if hf != hf_target:
                continue
            wkey = (layer_idx, ours)
            a, b = weights.get(wkey, (None, None))
            if is_a:
                a = arr.T  # peft stores [r, in] -> ours [in, r]
            else:
                b = arr.T  # peft [out, r] -> [r, out]
            weights[wkey] = (a, b)
    return LoRAAdapter(name=name, path=path, rank=rank, alpha=alpha,
                       weights=weights)


class LoRAManager:
    """Owns the stacked device pools + name->slot registry."""

    def __init__(self, model, model_config, max_loras: int, max_rank: int,
                 dtype, target_modules: Optional[List[str]] = None):
        from collections import OrderedDict

        self.model_config = model_config
        self.max_loras = max_loras  # slot 0 reserved for "no adapter"
        self.max_rank = max_rank
        self.dtype = dtype
        self.adapters: Dict[str, int] = {}  # name -> slot
        self.scalings = np.zeros(max_loras + 1, np.float32)
        # LRU order + per-adapter pin counts (running requests) for the
        # eviction policy (ref srt/lora/eviction_policy.py).
        self._lru: "OrderedDict[str, None]" = OrderedDict()
        self._pins: Dict[str, int] = {}
        self._load_pool = None  # lazy executor for load_async
        L = model_config.num_hidden_layers
        H = model_config.hidden_size
        nq = model_config.num_attention_heads * model_config.head_dim
        nk = model_config.num_key_value_heads * model_config.head_dim
        I = model_config.intermediate_size
        # in/out dims per target
        self.target_dims = {
            "q_proj": (H, nq),
            "kv_proj_k": (H, nk),
            "kv_proj_v": (H, nk),
            "o_proj": (nq, H),
            "gate_up_gate": (H, I),
            "gate_up_up": (H, I),
            "down": (I, H),
        }
        # Opt-in vocab-sized targets (--lora-target-modules): embedding
        # pool A is indexed by TOKEN id ([G, V, r]); lm_head applies at
        # the logits tap ([G, H, r] -> [G, r, V]). Both carry a dummy
        # leading layer dim so apply_lora's [L, G, ...] indexing holds.
        V = model_config.vocab_size
        if target_modules:
            if "lm_head" in target_modules:
                self.target_dims["lm_head"] = (H, V)
            if "embed_tokens" in target_modules:
                self.target_dims["embed_tokens"] = (V, H)
        self.target_modules = list(target_modules or [])
        G = max_loras + 1
        self.pools: Dict[str, Tuple[jax.Array, jax.Array]] = {}
        for t, (din, dout) in self.target_dims.items():
            nl = 1 if t in ("lm_head", "embed_tokens") else L
            A = jnp.zeros((nl, G, din, max_rank), dtype)
            B = jnp.zeros((nl, G, max_rank, dout), dtype)
            self.pools[t] = (A, B)
        self._free_slots = list(range(max_loras, 0, -1))

    # ---- eviction policy + pinning ----
    def pin(self, name: Optional[str]) -> None:
        if name:
            self._pins[name] = self._pins.get(name, 0) + 1

    def unpin(self, name: Optional[str]) -> None:
        if name and name in self._pins:
            self._pins[name] -= 1
            if self._pins[name] <= 0:
                del self._pins[name]

    def _evict_lru(self) -> bool:
        """Unload the least-recently-used unpinned adapter. Ref
        srt/lora/eviction_policy.py LRU policy."""
        for name in list(self._lru):
            if self._pins.get(name, 0) == 0:
                logger.info("LoRA pool full: evicting LRU adapter %r", name)
                return self.unload(name)
        return False

    # ---- overlap loading ----
    def load_async(self, name: str, path: str):
        """Load an adapter off-thread (host IO + staging + device pool
        updates); the slot publishes only once every pool is written, so
        in-flight steps never see a half-loaded adapter. Returns a
        concurrent.futures.Future[int]."""
        if self._load_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._load_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="lora-load"
            )
        return self._load_pool.submit(self.load, name, path)

    def load(self, name: str, path: str) -> int:
        if name in self.adapters:
            self._lru[name] = None
            self._lru.move_to_end(name)
            return self.adapters[name]
        if not self._free_slots and not self._evict_lru():
            raise RuntimeError(
                "LoRA pool full and every adapter is pinned by a running "
                "request"
            )
        adapter = load_adapter(name, path)
        if adapter.rank > self.max_rank:
            raise ValueError(
                f"adapter rank {adapter.rank} > max_lora_rank {self.max_rank}"
            )
        slot = self._free_slots.pop()
        L = self.model_config.num_hidden_layers
        for t in self.target_dims:
            A, B = self.pools[t]
            nl = A.shape[0]
            A_np = np.zeros((nl,) + tuple(A.shape[2:]), np.float32)
            B_np = np.zeros((nl,) + tuple(B.shape[2:]), np.float32)
            present = False
            for l in range(nl):
                w = adapter.weights.get((l if nl > 1 else -1, t))
                if w is None or w[0] is None or w[1] is None:
                    continue
                a, b = w
                A_np[l, :, : a.shape[1]] = a
                B_np[l, : b.shape[0], :] = b
                present = True
            if present:
                A = A.at[:, slot].set(jnp.asarray(A_np, A.dtype))
                B = B.at[:, slot].set(jnp.asarray(B_np, B.dtype))
                self.pools[t] = (A, B)
        # publish LAST: a half-written slot must never be schedulable
        self.scalings[slot] = adapter.scaling
        self.adapters[name] = slot
        self._lru[name] = None
        logger.info("loaded LoRA %r (rank %d) into slot %d", name,
                    adapter.rank, slot)
        return slot

    def unload(self, name: str) -> bool:
        slot = self.adapters.pop(name, None)
        self._lru.pop(name, None)
        if slot is None:
            return False
        self._free_slots.append(slot)
        self.scalings[slot] = 0.0
        for t in self.target_dims:
            A, B = self.pools[t]
            # zero the slot so it acts as identity if referenced
            A = A.at[:, slot].set(0.0)
            B = B.at[:, slot].set(0.0)
            self.pools[t] = (A, B)
        return True

    def slot_of(self, name: Optional[str]) -> int:
        if not name:
            return 0
        if name not in self.adapters:
            raise ValueError(f"LoRA adapter {name!r} not loaded")
        self._lru[name] = None
        self._lru.move_to_end(name)  # LRU touch
        return self.adapters[name]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LoRABatchState:
    """Per-batch device state threaded through the model forward."""

    pools: Dict[str, Tuple[jax.Array, jax.Array]]
    token_order: jax.Array  # [T] sort by adapter
    inv_order: jax.Array  # [T]
    group_sizes: jax.Array  # [G+1]
    scaling_per_token: jax.Array  # [T] f32 (sorted order)
    adapter_ids: jax.Array  # [T] int32 (unsorted; embedding gather)


def build_lora_state(
    pools, token_adapter_ids: jax.Array, scalings: jax.Array
) -> LoRABatchState:
    """token_adapter_ids: [T] int32 (0 = none). Computed inside jit."""
    G = scalings.shape[0]
    order = jnp.argsort(token_adapter_ids)
    inv = jnp.argsort(order)
    group_sizes = jnp.bincount(token_adapter_ids, length=G).astype(jnp.int32)
    scale_sorted = scalings[token_adapter_ids[order]]
    return LoRABatchState(
        pools=pools,
        token_order=order,
        inv_order=inv,
        group_sizes=group_sizes,
        scaling_per_token=scale_sorted,
        adapter_ids=token_adapter_ids,
    )


def apply_lora(
    state: Optional[LoRABatchState], target: str, layer_id: int, x: jax.Array
) -> jax.Array:
    """LoRA delta for x [T, din] -> [T, dout] (0 when state is None)."""
    if state is None:
        return 0.0
    A, B = state.pools[target]
    x_sorted = x[state.token_order]
    t = jax.lax.ragged_dot(
        x_sorted, A[layer_id], state.group_sizes,
        preferred_element_type=x.dtype,
    )  # [T, r]
    d = jax.lax.ragged_dot(
        t, B[layer_id], state.group_sizes, preferred_element_type=x.dtype
    )  # [T, dout]
    d = d * state.scaling_per_token[:, None].astype(d.dtype)
    return d[state.inv_order]


def apply_lora_embedding(
    state: Optional[LoRABatchState], token_ids: jax.Array
) -> jax.Array:
    """Embedding-lookup LoRA delta for token_ids [T] -> [T, H] (0 when
    no embed_tokens pool is configured). A is token-gathered per row,
    then the rank->hidden projection runs as the usual sorted
    ragged_dot."""
    if state is None or "embed_tokens" not in state.pools:
        return 0.0
    A, B = state.pools["embed_tokens"]  # [1, G, V, r], [1, G, r, H]
    a_rows = A[0][state.adapter_ids, token_ids]  # [T, r]
    a_sorted = a_rows[state.token_order]
    d = jax.lax.ragged_dot(
        a_sorted, B[0], state.group_sizes,
        preferred_element_type=a_sorted.dtype,
    )  # [T, H]
    d = d * state.scaling_per_token[:, None].astype(d.dtype)
    return d[state.inv_order]


def apply_lora_logits(state, row_state, hidden: jax.Array) -> jax.Array:
    """lm_head LoRA delta at the logits tap: hidden [B, H] -> [B, V]
    using the per-ROW state (logits rows are one per sequence)."""
    if state is None or "lm_head" not in state.pools:
        return 0.0
    return apply_lora(row_state, "lm_head", 0, hidden)
