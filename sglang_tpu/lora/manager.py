"""Multi-LoRA batching.

Ref: srt/lora/{lora_manager.py:59 (load_lora_adapter:221,
prepare_lora_batch:428), mem_pool.py, backend/}. TPU-native design: all
loaded adapters live in stacked device pools `A [G, in, r_max]`,
`B [G, r_max, out]` per target projection per layer; a batch's tokens are
sorted by adapter id once and the LoRA deltas run as two grouped GEMMs via
jax.lax.ragged_dot (the same dropless Megablox pattern as MoE) — no SGMV
CUDA kernels needed. Slot 0 is the identity (zero) adapter.
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
        if ".lora_A." not in key and ".lora_B." not in key:
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
                 dtype):
        self.model_config = model_config
        self.max_loras = max_loras  # slot 0 reserved for "no adapter"
        self.max_rank = max_rank
        self.dtype = dtype
        self.adapters: Dict[str, int] = {}  # name -> slot
        self.scalings = np.zeros(max_loras + 1, np.float32)
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
        G = max_loras + 1
        self.pools: Dict[str, Tuple[jax.Array, jax.Array]] = {}
        for t, (din, dout) in self.target_dims.items():
            A = jnp.zeros((L, G, din, max_rank), dtype)
            B = jnp.zeros((L, G, max_rank, dout), dtype)
            self.pools[t] = (A, B)
        self._free_slots = list(range(max_loras, 0, -1))

    def load(self, name: str, path: str) -> int:
        if name in self.adapters:
            return self.adapters[name]
        if not self._free_slots:
            raise RuntimeError("LoRA pool full; unload an adapter first")
        adapter = load_adapter(name, path)
        if adapter.rank > self.max_rank:
            raise ValueError(
                f"adapter rank {adapter.rank} > max_lora_rank {self.max_rank}"
            )
        slot = self._free_slots.pop()
        self.adapters[name] = slot
        self.scalings[slot] = adapter.scaling
        L = self.model_config.num_hidden_layers
        for t in self.target_dims:
            A, B = self.pools[t]
            A_np = np.zeros(
                (L,) + tuple(A.shape[2:]), np.float32
            )
            B_np = np.zeros((L,) + tuple(B.shape[2:]), np.float32)
            present = False
            for l in range(L):
                w = adapter.weights.get((l, t))
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
        logger.info("loaded LoRA %r (rank %d) into slot %d", name,
                    adapter.rank, slot)
        return slot

    def unload(self, name: str) -> bool:
        slot = self.adapters.pop(name, None)
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
