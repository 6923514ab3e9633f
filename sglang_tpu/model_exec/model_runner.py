"""ModelRunner: owns params, KV pool, attention backend, jitted step programs.

Ref: srt/model_executor/model_runner.py:283 (ModelRunner), :1452 (forward).
TPU-native redesign:

- One jitted step program per static bucket (mode, T, B, max_pages) — JAX's
  jit cache keyed on shapes replaces CUDA-graph capture/replay
  (ref init_cuda_graphs model_runner.py:985).
- The KV pool is DONATED through every step, so scatter updates are
  in-place on device; the runner swaps in the returned handle.
- Sampling runs inside the same program (fused with the logits matmul);
  results come back as async device arrays so the host scheduler can
  overlap scheduling of step N+1 with device execution of step N.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import math
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.mem.kv_pool import KVCachePool, KVPoolConfig
from sglang_tpu.model_exec.forward_batch import ForwardBatch, ForwardMode
from sglang_tpu.model_exec.weight_loader import load_model_weights
from sglang_tpu.models.registry import get_model_class
from sglang_tpu.ops.attention import get_attention_backend
from sglang_tpu.ops.sampling import SamplingTensors, compute_logprobs, sample
from sglang_tpu.parallel.mesh import MeshContext, create_mesh, set_mesh_context
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import cdiv

logger = logging.getLogger(__name__)

_CACHE_ENABLED = False


def _enable_compilation_cache() -> None:
    """Persistent jit cache: bucket retraces hit disk instead of a full
    (remote) XLA compile. Ref analog: CUDA-graph capture amortization."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    _CACHE_ENABLED = True
    import os

    try:
        cache_dir = os.environ.get(
            "SGLANG_TPU_COMPILE_CACHE", "/root/.cache/sglang_tpu_xla"
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001
        logger.warning("persistent compilation cache unavailable", exc_info=True)


@dataclasses.dataclass
class ForwardOutput:
    """Async device arrays from one step (fetch with np.asarray when needed)."""

    next_tokens: jax.Array  # [B] int32
    chosen_logprobs: jax.Array  # [B] f32
    top_logprob_vals: Optional[jax.Array] = None  # [B, K]
    top_logprob_ids: Optional[jax.Array] = None  # [B, K]
    hidden: Optional[jax.Array] = None  # [T, H] (EAGLE feature taps)


class ModelRunner:
    def __init__(
        self,
        server_args: ServerArgs,
        model_config: Optional[ModelConfig] = None,
        mesh_ctx: Optional[MeshContext] = None,
    ):
        self.server_args = server_args
        _enable_compilation_cache()
        if model_config is None:
            model_config = ModelConfig.from_model_path(
                server_args.model_path,
                dtype=server_args.dtype,
                context_length=server_args.context_length,
                trust_remote_code=server_args.trust_remote_code,
                model_override_args=server_args.model_override_args,
            )
        self.model_config = model_config
        if mesh_ctx is None:
            mesh_ctx = create_mesh(
                tp_size=server_args.tp_size,
                # DP attention consumes dp_size as a MESH axis (batch-dim
                # sharding inside one program, ref dp_attention.py); plain
                # DP runs whole-engine replicas instead (controller).
                dp_size=(server_args.dp_size
                         if server_args.enable_dp_attention else 1),
                pp_size=server_args.pp_size,
                ep_size=server_args.ep_size,
            )
        self.mesh_ctx = mesh_ctx
        set_mesh_context(mesh_ctx)

        from sglang_tpu.quantization import set_quant_method

        # Must be set BEFORE model construction: layers capture the method
        # when emitting their param specs (ref --quantization,
        # srt/layers/quantization/base_config.py).
        set_quant_method(server_args.quantization)
        from sglang_tpu.layers.moe import (
            set_moe_a2a,
            set_redundant_experts,
            set_sbo,
            set_tbo,
        )

        set_moe_a2a(server_args.moe_a2a_backend)
        set_tbo(server_args.enable_two_batch_overlap)
        set_sbo(server_args.enable_single_batch_overlap)
        set_redundant_experts(server_args.ep_num_redundant_experts)

        model_cls = get_model_class(model_config.architectures)
        self.model = model_cls(model_config)
        if mesh_ctx.pp_size > 1:
            # GSPMD-native GPipe (parallel/pipeline.py): stacked layer
            # params + microbatch scan with ppermute handoffs. Ref analog:
            # srt/managers/scheduler_pp_mixin.py:69.
            from sglang_tpu.parallel.pipeline import PipelinedModel

            assert not (server_args.enable_lora or server_args.lora_paths), (
                "PP + LoRA not supported yet"
            )
            assert not server_args.enable_dcp and not server_args.enable_cp, (
                "PP composes with TP only (no DCP/CP yet)"
            )
            self.model = PipelinedModel(
                self.model, mesh_ctx,
                microbatches=server_args.pp_microbatches,
            )
        self.specs = self.model.param_specs()

        t0 = time.perf_counter()
        self.params = load_model_weights(
            self.model,
            self.specs,
            mesh_ctx,
            server_args.model_path,
            load_format=server_args.load_format,
            seed=server_args.random_seed,
            weight_cache_mode=server_args.weight_cache_mode,
        )
        logger.info("weights loaded in %.1fs", time.perf_counter() - t0)

        self.state_ckpt_rows = 0  # recurrent models: see _init_kv_pool
        self.state_pool_hybrid = False
        self._init_kv_pool()
        backend_name = server_args.attention_backend or (
            "pallas" if jax.default_backend() == "tpu" else "xla_native"
        )
        if self.kv_quant_native():
            # Native-f8 pools are plain gathers + converts — an XLA-only
            # formulation (Pallas cannot DMA sub-int32 pools).
            backend_name = "xla_native"
        backend_cls = get_attention_backend(backend_name)
        self.attn_backend = backend_cls(  # hisparse pool attached below
            model_config.num_attention_heads,
            model_config.num_key_value_heads,
            model_config.head_dim,
            server_args.page_size,
            # native mode: the pool dtype itself is f8; no pack/unpack.
            kv_quant=(None if self.kv_quant_native()
                      else self.kv_quant_format()),
            compute_dtype=model_config.dtype,
            dcp=server_args.enable_dcp,
        )
        self.attn_backend.cp = bool(server_args.enable_cp)
        self.attn_backend.cp_strategy = server_args.cp_strategy
        self.attn_backend.hisparse_pool = getattr(self, "hisparse_pool",
                                                  None)
        self.attn_backend.dp_attn = bool(
            server_args.enable_dp_attention and self.mesh_ctx.dp_size > 1
        )
        # DCP pool memory sharding (mem/kv_pool.py dcp_shard): the decode
        # DCP path reads only shard-local pages via interleave layout.
        self.attn_backend.dcp_pool_sharded = getattr(
            self, "dcp_pool_sharded", False
        )
        if self.attn_backend.dcp_pool_sharded:
            self.attn_backend.dcp_pages_per_shard = (
                self.kv_pool.config.num_pages // self.mesh_ctx.tp_size
            )
        logger.info("attention backend: %s", backend_name)

        self.lora_manager = None
        if server_args.enable_lora or server_args.lora_paths:
            self.ensure_lora_manager()
            for spec in server_args.lora_paths or []:
                if "=" in spec:
                    name, path = spec.split("=", 1)
                else:
                    name = path = spec
                self.lora_manager.load(name, path)

        # Device-resident per-request state (indexed by req_slot; last index
        # is the trash slot). next_tokens_buf is the overlap-schedule
        # future-map analog: decode steps read their input token from it so
        # the host never blocks on the previous step's sampled tokens.
        self.num_slots = server_args.max_running_requests
        self.trash_slot = self.num_slots
        self.next_tokens_buf = jnp.zeros(self.num_slots + 1, jnp.int32)
        self.penalty_buf: Optional[jax.Array] = None  # [S+1, V] lazily made
        self._decode_dummy_ids: Dict[int, jax.Array] = {}

        self._step = jax.jit(
            self._step_impl,
            donate_argnums=(1, 2, 3),
            static_argnames=("return_top_logprobs", "all_greedy",
                             "return_hidden", "clp_fn"),
        )
        self._override_tokens = jax.jit(
            lambda buf, slots, vals: buf.at[slots].set(vals), donate_argnums=(0,)
        )
        self._verify = jax.jit(self._verify_impl, donate_argnums=(1,))
        self._move_kv = jax.jit(self._move_kv_impl, donate_argnums=(0,))
        # Device-resident decode loop: fb AND sampling rng advance on device,
        # so steady-state decode launches with ZERO fresh host arrays (a
        # fresh H2D while compute is in flight costs ~12ms through the
        # remote-TPU path — see PERF_NOTES.md). Ref analog: CUDA-graph
        # replay with persistent device buffers (srt/model_executor/
        # cuda_graph_runner.py) — here the buffers are the donated fb/st.
        self._decode_resident = jax.jit(
            self._decode_resident_impl,
            donate_argnums=(1, 2, 3, 4, 5),  # kv, next_buf, penalty, fb, st
            static_argnames=("return_top_logprobs", "all_greedy"),
        )
        self._seed_penalty_row = jax.jit(
            self._seed_penalty_row_impl, donate_argnums=(0,)
        )

    # ---- KV sizing ----
    def ensure_lora_manager(self):
        """Create the LoRA pools on first use (dynamic /load_lora_adapter
        works without --enable-lora at startup; ref lora_manager.py:221)."""
        if self.lora_manager is None:
            from sglang_tpu.lora.manager import LoRAManager

            self.lora_manager = LoRAManager(
                self.model,
                self.model_config,
                max_loras=self.server_args.max_loras_per_batch,
                max_rank=self.server_args.max_lora_rank or 64,
                dtype=self.model_config.dtype,
                target_modules=self.server_args.lora_target_modules,
            )
        return self.lora_manager

    def _init_kv_pool(self) -> None:
        c = self.model_config
        sa = self.server_args
        if sa.max_total_tokens is not None:
            num_tokens = sa.max_total_tokens
        else:
            num_tokens = self._profile_max_tokens()
        num_pages = max(2, cdiv(num_tokens, sa.page_size) + 1)
        self.dcp_pool_sharded = bool(
            sa.enable_dcp and self.mesh_ctx.tp_size > 1
        )
        if self.dcp_pool_sharded:
            # page dim shards over the mesh axis: pad to a multiple
            n = self.mesh_ctx.tp_size
            num_pages = cdiv(num_pages, n) * n
        kv_quant = self.kv_quant_format()
        if kv_quant or sa.kv_cache_dtype == "auto":
            kv_dtype = c.dtype  # compute dtype (dequant target when quant)
        else:
            kv_dtype = jnp.dtype(sa.kv_cache_dtype)
        layer_windows = self._layer_windows()
        swa_num_pages = 0
        if any(w > 0 for w in layer_windows) and not sa.disable_swa_kv_pool:
            # Hybrid SWA pool (ref allocator/swa.py): size the sliding-layer
            # pool for max_running live windows (+ write margin), one
            # in-flight prefill chunk, and a tree-shadow budget for prefix
            # reuse. Never bigger than the full pool.
            ps = sa.page_size
            win = max(layer_windows)
            per_req = cdiv(win, ps) + 3
            want = (
                sa.max_running_requests * per_req * 2  # live + shadows
                + cdiv(sa.chunked_prefill_size, ps)
                + 2
            )
            swa_num_pages = min(want, num_pages)
        cfg = KVPoolConfig(
            num_layers=c.num_hidden_layers,
            num_kv_heads=c.num_key_value_heads,
            head_dim=c.head_dim,
            page_size=sa.page_size,
            num_pages=num_pages,
            dtype=kv_dtype,
            layer_windows=layer_windows,
            swa_num_pages=swa_num_pages,
            mla_dim=int(getattr(self.model, "mla_dim", 0) or 0),
            dsa_index_dim=int(getattr(self.model, "dsa_index_dim", 0) or 0),
            quant=kv_quant,
            quant_native=self.kv_quant_native(),
            hisparse=bool(sa.enable_hisparse),
        )
        if cfg.hisparse:
            # HiSparse (mem/hisparse.py): DSA models only — the latent
            # pool moves to host, device keeps the index pool.
            assert cfg.mla_dim and cfg.dsa_index_dim, (
                "--enable-hisparse requires a DSA model (lightning "
                "indexer); plain models have no sparse selector"
            )
            assert not kv_quant, "hisparse host pool stores compute dtype"
            from sglang_tpu.mem.hisparse import HostLatentPool

            self.hisparse_pool = HostLatentPool(
                c.num_hidden_layers, num_pages * sa.page_size, cfg.mla_dim
            )
            logger.info(
                "hisparse: %.2f GiB latent host-side, device keeps "
                "index pool only",
                self.hisparse_pool.bytes_total() / (1 << 30),
            )
        if getattr(self.model, "is_recurrent", False):
            # SSM models: slot-indexed state arrays instead of paged KV.
            # Hybrid models (Jamba-class) mix paged attention layers with
            # state layers (ref memory_pool.py HybridLinearKVPool:3555).
            # State rows: [0, S) request slots, S trash, [S+1, S+1+n_ckpt)
            # prefix-cache checkpoints (mem/state_ckpt.py; ref
            # mem_cache/mamba_radix_cache.py).
            n_ckpt = (
                0 if sa.disable_radix_cache else sa.num_state_checkpoints
            )
            self.state_ckpt_rows = n_ckpt
            layout = self.model.state_shapes(sa.max_running_requests + n_ckpt)
            if any(s is None for s in layout):
                from sglang_tpu.mem.kv_pool import HybridStatePool

                self.kv_pool = HybridStatePool(cfg, layout)
                self.state_pool_hybrid = True
            else:
                from sglang_tpu.mem.kv_pool import RecurrentStatePool

                self.kv_pool = RecurrentStatePool(cfg, layout)
            self._build_state_copy_fns(layout)
            self.max_total_tokens = (num_pages - 1) * sa.page_size
            return
        if self.mesh_ctx.pp_size > 1:
            from sglang_tpu.mem.kv_pool import StackedKVCachePool

            self.kv_pool = StackedKVCachePool(cfg, self.mesh_ctx)
        else:
            self.kv_pool = KVCachePool(
                cfg, self.mesh_ctx, dcp_shard=self.dcp_pool_sharded
            )
        if hasattr(self.model, "cross_kv_shapes"):
            # Encoder-decoder models (models/whisper.py): slot-indexed
            # cross-attention K/V pairs ride the kv tuple TAIL (indices
            # [num_layers, 2*num_layers)); decoder layers gather them by
            # fb.state_slots. Written once per request (write_cross_kv).
            tail = tuple(
                (jnp.zeros(shape, dt), jnp.zeros(shape, dt))
                for shape, dt in self.model.cross_kv_shapes(
                    sa.max_running_requests
                )
            )
            self.kv_pool.kv = tuple(self.kv_pool.kv) + tail
            self._write_cross = jax.jit(
                self._write_cross_impl, donate_argnums=(0,),
                static_argnames=("n_layers",),
            )
        self.max_total_tokens = (num_pages - 1) * sa.page_size
        logger.info(
            "KV pool: %d pages x %d tokens (swa pool: %s pages, %d sliding "
            "layers) = %.2f GiB total",
            num_pages,
            sa.page_size,
            swa_num_pages or "off",
            sum(1 for w in layer_windows if w > 0),
            cfg.bytes_total() / (1 << 30),
        )

    def _build_state_copy_fns(self, layout) -> None:
        """Donated jitted row/page copies for recurrent state pools
        (checkpoint save/restore, mem/state_ckpt.py). src/dst ride as
        traced scalars so every copy reuses one compiled program."""
        state_idx = frozenset(
            i for i, ly in enumerate(layout) if ly is not None
        )
        attn_idx = frozenset(
            i for i in range(len(layout)) if i not in state_idx
        )

        def _copy_rows(kv, src, dst):
            return tuple(
                tuple(a.at[dst].set(a[src]) for a in layer)
                if i in state_idx else layer
                for i, layer in enumerate(kv)
            )

        def _copy_page(kv, src, dst):
            return tuple(
                tuple(a.at[dst].set(a[src]) for a in layer)
                if i in attn_idx else layer
                for i, layer in enumerate(kv)
            )

        self._copy_state_jit = jax.jit(_copy_rows, donate_argnums=(0,))
        self._copy_page_jit = jax.jit(_copy_page, donate_argnums=(0,))

    def copy_state(self, src_row: int, dst_row: int) -> None:
        """On-device copy of one state row across every recurrent state
        array (all layers). Used by the state-checkpoint registry; the
        caller guarantees the copy is enqueued after the forward that
        produced the source row (jit-stream order is issue order)."""
        self.kv_pool.swap(self._copy_state_jit(
            self.kv_pool.kv, jnp.int32(src_row), jnp.int32(dst_row)
        ))

    def copy_kv_page(self, src_page: int, dst_page: int) -> None:
        """On-device copy of one KV page across every ATTENTION layer of a
        hybrid state pool (checkpoint tail pages; no-op set for pure
        recurrent models whose pages carry no data)."""
        self.kv_pool.swap(self._copy_page_jit(
            self.kv_pool.kv, jnp.int32(src_page), jnp.int32(dst_page)
        ))

    @staticmethod
    def _write_cross_impl(kv, slot, ck, cv, *, n_layers: int):
        """Install one request's cross K/V ([L, S, nh, hd] each) at its
        slot across the kv tuple's tail entries."""
        out = list(kv)
        for i in range(n_layers):
            k_arr, v_arr = out[n_layers + i]
            out[n_layers + i] = (
                k_arr.at[slot].set(ck[i].astype(k_arr.dtype)),
                v_arr.at[slot].set(cv[i].astype(v_arr.dtype)),
            )
        return tuple(out)

    def write_cross_kv(self, slot: int, ck, cv) -> None:
        """Write a request's encoder cross-K/V into the kv tail (encoder-
        decoder models; called by the scheduler at admission)."""
        n = self.model_config.num_hidden_layers
        self.kv_pool.kv = self._write_cross(
            self.kv_pool.kv, jnp.asarray(slot, jnp.int32), ck, cv,
            n_layers=n,
        )

    def encode_cross_kv(self, feats):
        """Run the audio encoder + cross projections once (jitted)."""
        if not hasattr(self, "_encode_cross"):
            self._encode_cross = jax.jit(self.model.encode_cross)
        return self._encode_cross(self.params, jnp.asarray(feats))

    def _layer_windows(self):
        """Per-layer sliding windows from the constructed model (0 = full
        attention). Models expose `attn.window` per decoder layer."""
        layers = getattr(self.model, "decoder_layers", None)
        if not layers:
            return ()
        return tuple(
            int(getattr(getattr(l, "attn", None), "window", 0) or 0)
            for l in layers
        )

    def _profile_max_tokens(self) -> int:
        """Size KV from free HBM after weights (ref: mem_fraction_static)."""
        c = self.model_config
        try:
            stats = jax.local_devices()[0].memory_stats()
            limit = stats["bytes_limit"]
            used = stats["bytes_in_use"]
        except Exception:
            # CPU or unsupported: small default for tests.
            return 65536
        budget = int(limit * self.server_args.mem_fraction_static) - used
        mla_dim = int(getattr(self.model, "mla_dim", 0) or 0)
        row = mla_dim or 2 * c.num_key_value_heads * c.head_dim
        row += int(getattr(self.model, "dsa_index_dim", 0) or 0)
        per_token = (
            c.num_hidden_layers * row * np.dtype(self.kv_dtype_np()).itemsize
        )
        # KV is sharded over tp on heads: budget is per-chip, so scale.
        shard = (
            self.mesh_ctx.tp_size
            if c.num_key_value_heads % max(self.mesh_ctx.tp_size, 1) == 0
            else 1
        )
        n = max(budget * shard // per_token, 4096)
        return int(n)

    def clear_compiled(self) -> None:
        """Drop jit caches (EPLB recording toggles change the traced
        program; next steps recompile — served from the persistent XLA
        cache when shapes were seen before)."""
        for f in (self._step, self._verify, self._decode_resident,
                  self._move_kv):
            try:
                f.clear_cache()
            except Exception:  # noqa: BLE001
                pass

    def eplb_rebalance(self):
        """Recompute expert placement from recorded loads and apply it
        (permuted expert weights + rewritten log2phy maps). Ref:
        srt/eplb/eplb_manager.py + expert_location_updater.py."""
        from sglang_tpu import eplb

        loads = {
            k: np.asarray(v, np.float64)
            for k, v in eplb.RECORDER.dump().items()
        }
        loads = {k: v for k, v in loads.items()
                 if k in eplb.MOE_LAYER_REGISTRY
                 and v.shape[0] == eplb.MOE_LAYER_REGISTRY[k]}
        if not loads:
            return False, "no recorded expert distribution (start recording first)"
        ep = self.mesh_ctx.ep_size if self.mesh_ctx else 1
        if ep <= 1:
            return False, "ep_size <= 1; nothing to balance"
        if self.server_args.ep_num_redundant_experts:
            return self._eplb_rebalance_redundant(loads, ep)
        def cur_phy2log(k, E):
            l2p = np.asarray(self.params[f"{k}/eplb_log2phy"])
            p2l = np.empty(E, np.int32)
            p2l[l2p] = np.arange(E, dtype=np.int32)
            return p2l

        before = np.mean([
            eplb.imbalance(v, cur_phy2log(k, v.shape[0]), ep)
            for k, v in loads.items()
        ])
        placements = eplb.compute_placements(loads, ep)
        updates = eplb.rebalance_params(
            self.params, placements, eplb.MOE_LAYER_REGISTRY
        )
        self.params = {**self.params, **updates}
        after = np.mean([
            eplb.imbalance(v, placements[k], ep) for k, v in loads.items()
        ])
        return True, (
            f"rebalanced {len(placements)} layers; "
            f"max/mean load {before:.3f} -> {after:.3f}"
        )

    def _eplb_rebalance_redundant(self, loads, ep, dead_shards=()):
        """Replicated-placement rebalance (redundant experts / elastic EP).
        Ref: srt/eplb/eplb_algorithms/deepseek.py (replication) +
        srt/elastic_ep/elastic_ep.py (shard exclusion)."""
        from sglang_tpu import eplb

        R = self.server_args.ep_num_redundant_experts
        rmax = R + 1
        placements = {}
        before, after = [], []
        for k, load in loads.items():
            E = load.shape[0]
            NP_ = E + R
            cur_l2p = np.asarray(self.params[f"{k}/eplb_log2phy"])
            cur_cnt = np.asarray(self.params[f"{k}/eplb_logcnt"])
            before.append(
                eplb.imbalance_redundant(load, cur_l2p, cur_cnt, NP_, ep)
            )
            p2l, l2p, cnt = eplb.compute_redundant_placement(
                load, ep, NP_, rmax, dead_shards=tuple(dead_shards)
            )
            placements[k] = (p2l, l2p, cnt)
            after.append(eplb.imbalance_redundant(load, l2p, cnt, NP_, ep))
        updates = eplb.rebalance_params_redundant(self.params, placements)
        self.params = {**self.params, **updates}
        msg = (
            f"rebalanced {len(placements)} layers (redundant={R}"
            + (f", dead_shards={sorted(dead_shards)}" if dead_shards else "")
            + f"); max/mean load {np.mean(before):.3f} -> {np.mean(after):.3f}"
        )
        return True, msg

    def elastic_ep_scale(self, dead_ranks):
        """Elastic EP (ref srt/elastic_ep/elastic_ep.py:23): routing-level
        shard exclusion. A dead EP shard's expert slots stop receiving
        tokens (every logical expert is re-covered by replicas on live
        shards); the SPMD program itself is unchanged — a full mesh
        rebuild remains the slow-path recovery. Requires redundant expert
        slots for coverage. Pass an empty list to restore all shards."""
        from sglang_tpu import eplb

        ep = self.mesh_ctx.ep_size if self.mesh_ctx else 1
        if ep <= 1:
            return False, "ep_size <= 1; nothing to scale"
        R = self.server_args.ep_num_redundant_experts
        if not R:
            return False, (
                "elastic EP needs --ep-num-redundant-experts > 0 for "
                "expert coverage on live shards"
            )
        dead = sorted(set(int(r) for r in dead_ranks))
        if any(r < 0 or r >= ep for r in dead):
            return False, f"dead rank out of range [0, {ep})"
        loads = {
            k: np.asarray(v, np.float64)
            for k, v in eplb.RECORDER.dump().items()
            if k in eplb.MOE_LAYER_REGISTRY
        }
        # Without recorded loads, balance uniformly.
        for k, E in eplb.MOE_LAYER_REGISTRY.items():
            if k not in loads and f"{k}/eplb_log2phy" in (self.params or {}):
                loads[k] = np.ones(E, np.float64)
        if not loads:
            return False, "no MoE layers registered"
        try:
            return self._eplb_rebalance_redundant(loads, ep, dead_shards=dead)
        except ValueError as e:
            return False, str(e)

    def release_memory(self, tags) -> None:
        """Free device memory for colocated RL training (ref
        /release_memory_occupation, torch_memory_saver analog): deleting the
        jax arrays releases HBM; resume reallocates zeros (weights come back
        via update_weights_from_disk/tensor)."""
        if "kv_cache" in tags:
            self.kv_pool.kv = None
        if "weights" in tags:
            self.params = None

    def resume_memory(self, tags) -> None:
        if "kv_cache" in tags and self.kv_pool.kv is None:
            self._init_kv_pool()
        if "weights" in tags and self.params is None:
            from sglang_tpu.layers.base import init_dummy_params

            # Placeholder weights until update_weights_* provides real ones.
            self.params = init_dummy_params(
                self.specs, self.server_args.random_seed, self.mesh_ctx
            )

    def kv_quant_format(self):
        """fp8 KV storage format or None (ref --kv-cache-dtype fp8_e5m2,
        srt/layers/quantization/kv_cache.py; our int32-packed transport is
        ops/quant_kv.py)."""
        d = self.server_args.kv_cache_dtype
        if d in ("fp8", "fp8_e5m2"):
            return "fp8_e5m2"
        if d == "fp8_e4m3":
            return "fp8_e4m3"
        return None

    def kv_quant_native(self) -> bool:
        """Native-f8 pool storage A/B knob (SGLANG_TPU_F8_NATIVE=1): store
        quantized pools as float8 arrays in the bf16 layout instead of
        int32-packed lanes (mem/kv_pool.py quant_native). GQA/MHA only —
        the MLA latent path still consumes packed rows."""
        import os

        return bool(
            self.kv_quant_format()
            and os.environ.get("SGLANG_TPU_F8_NATIVE", "0") == "1"
            and not getattr(self.model, "mla_dim", 0)
        )

    def kv_dtype_np(self):
        c = self.model_config
        sa = self.server_args
        if self.kv_quant_format():
            return jnp.int8  # 1 byte/value for sizing
        return c.dtype if sa.kv_cache_dtype == "auto" else jnp.dtype(sa.kv_cache_dtype)

    # ---- the jitted step ----
    def _step_impl(
        self,
        params,
        kv,
        next_buf,
        penalty_buf,
        fb: ForwardBatch,
        st: SamplingTensors,
        vocab_mask: Optional[jax.Array],
        banned_tokens: Optional[jax.Array],  # [B, K] int32, -1 = none
        lora_pack=None,  # (pools dict, scalings [G], row_ids [B]) or None
        mm_pack=None,  # (input_embeds [T, H], embed_mask [T]) or None
        return_top_logprobs: int = 0,
        all_greedy: bool = False,
        return_hidden: bool = False,  # full [T, H] tap for EAGLE drafting
        clp_fn=None,  # static: TUPLE of custom logit processors
        clp_pack=None,  # tuple of (mask [B] bool, params dict[str, [B]])
    ):
        if fb.mode.is_decode():
            # Input token comes from the device future-map, not the host.
            fb = dataclasses.replace(fb, input_ids=next_buf[fb.req_slots])
        elif fb.mode.is_mixed():
            # Decode-tail tokens [mixed_tp:] read the future-map through
            # their owning row's slot; the extend region keeps host inputs.
            dec_tok = next_buf[fb.req_slots[fb.seq_ids[fb.mixed_tp:]]]
            fb = dataclasses.replace(
                fb, input_ids=fb.input_ids.at[fb.mixed_tp:].set(dec_tok)
            )
        lora_state = None
        lora_row_state = None
        if lora_pack is not None:
            from sglang_tpu.lora.manager import build_lora_state

            pools, scalings, row_ids = lora_pack
            token_ids_ = (
                row_ids if fb.mode.is_decode() else row_ids[fb.seq_ids]
            )
            lora_state = build_lora_state(pools, token_ids_, scalings)
            if "lm_head" in pools:
                # logits rows are one per sequence: a per-ROW state
                lora_row_state = build_lora_state(pools, row_ids, scalings)
        input_embeds = embed_mask = None
        if mm_pack is not None:
            input_embeds, embed_mask = mm_pack
        hidden, kv = self.model(
            params, fb, kv, self.attn_backend, lora=lora_state,
            input_embeds=input_embeds, embed_mask=embed_mask,
        )
        sel = hidden[fb.logits_indices]  # [B, H]
        logits = self.model.compute_logits(params, sel).astype(jnp.float32)
        if lora_row_state is not None:
            from sglang_tpu.lora.manager import apply_lora_logits

            logits = logits + apply_lora_logits(
                lora_state, lora_row_state, sel
            ).astype(jnp.float32)
        B = logits.shape[0]
        if banned_tokens is not None:
            # (token_ids [B, K], biases [B, K]): min_new_tokens eos bans
            # (-1e30) and user logit_bias, merged into one scatter-add.
            tok_idx, biases = banned_tokens
            bias = jnp.where(tok_idx >= 0, biases, 0.0)
            idx = jnp.maximum(tok_idx, 0)
            logits = logits.at[jnp.arange(B)[:, None], idx].add(bias)
        if vocab_mask is not None:
            # Packed allowed-token bits [B, ceil(V/32)] uint32 (grammar-
            # constrained decoding; ref srt/sampling/sampling_batch_info.py
            # apply_grammar_bitmask). Expand on device.
            V = logits.shape[1]
            vidx = jnp.arange(V, dtype=jnp.int32)
            words = vocab_mask[:, vidx >> 5]
            allowed = (words >> (vidx & 31).astype(jnp.uint32)) & 1
            logits = jnp.where(allowed == 0, -1e30, logits)
            vocab_mask = None
        if clp_fn is not None:
            # Custom logit processors (sampling/custom_logit_processor.py):
            # traced into the program; only flagged rows take each result.
            for fn, (mask, params) in zip(clp_fn, clp_pack):
                processed = fn(logits, params)
                logits = jnp.where(mask[:, None], processed, logits)
        token_counts = None
        if penalty_buf is not None:
            token_counts = penalty_buf[fb.req_slots]
        tokens, chosen_lp = sample(logits, st, token_counts, vocab_mask,
                                   all_greedy=all_greedy)
        next_buf = next_buf.at[fb.req_slots].set(tokens)
        if penalty_buf is not None:
            penalty_buf = penalty_buf.at[fb.req_slots, tokens].add(1)
        if return_top_logprobs > 0:
            tv, ti = compute_logprobs(logits, return_top_logprobs)
        else:
            tv, ti = None, None
        return (kv, next_buf, penalty_buf, tokens, chosen_lp, tv, ti,
                hidden if return_hidden else None)

    def _decode_resident_impl(
        self,
        params,
        kv,
        next_buf,
        penalty_buf,
        fb: ForwardBatch,
        st: SamplingTensors,
        banned_tokens,
        return_top_logprobs: int = 0,
        all_greedy: bool = False,
    ):
        """One fully device-resident decode step.

        Convention: fb.seq_lens holds tokens ALREADY in KV (context before
        this step). The step derives positions/out_cache_loc from it on
        device, runs the model, then returns fb with seq_lens advanced and
        the sampling rng keys folded forward — so consecutive decode steps
        need NO host-built arrays at all (the page table must simply cover
        the pre-allocated runway; the scheduler rebuilds when it runs out).
        Ref analog: CUDA-graph replay over persistent device buffers
        (srt/model_executor/cuda_graph_runner.py); here jit + donation give
        the same zero-host steady state.
        """
        B = fb.padded_bs
        ps = self.server_args.page_size
        active = jnp.arange(B, dtype=jnp.int32) < fb.num_seqs
        # Advance rng first: the host built st for the (normal-path) step
        # that armed this loop; each resident step is one step later.
        st = dataclasses.replace(
            st,
            rng_keys=st.rng_keys.at[:, 1].add(active.astype(jnp.uint32)),
        )
        pos = fb.seq_lens  # [B] ctx before this step; padding rows stay 0
        # Cascade fbs keep suffix-local seq_lens/page_table; rope positions
        # are global (suffix pos + shared prefix length).
        rope_pos = pos if fb.shared_len is None else pos + fb.shared_len
        page = jnp.take_along_axis(
            fb.page_table, (pos // ps)[:, None], axis=1
        )[:, 0]
        swa_loc = None
        if fb.swa_page_table is not None:
            # Hybrid SWA pool: sliding layers write through their own table.
            swa_page = jnp.take_along_axis(
                fb.swa_page_table, (pos // ps)[:, None], axis=1
            )[:, 0]
            swa_loc = swa_page * ps + pos % ps
        fb = dataclasses.replace(
            fb,
            positions=rope_pos,
            out_cache_loc=page * ps + pos % ps,  # pads: page 0 -> trash row
            swa_out_cache_loc=swa_loc,
            seq_lens=pos + active.astype(jnp.int32),
        )
        kv, next_buf, penalty_buf, tokens, chosen_lp, tv, ti, _ = (
            self._step_impl(
                params, kv, next_buf, penalty_buf, fb, st, None,
                banned_tokens, None, None, return_top_logprobs, all_greedy,
            )
        )
        return kv, next_buf, penalty_buf, fb, st, tokens, chosen_lp, tv, ti

    def forward_resident(self, rstate) -> ForwardOutput:
        """Run one resident decode step from a scheduler-armed state (see
        ScheduleCore._arm_resident). Mutates rstate.fb/st in place."""
        (
            kv, buf, pen, fb, st, tokens, chosen_lp, tv, ti,
        ) = self._decode_resident(
            self.params,
            self.kv_pool.kv,
            self.next_tokens_buf,
            self.penalty_buf,
            rstate.fb,
            rstate.st,
            rstate.banned,
            return_top_logprobs=rstate.top_logprobs,
            all_greedy=rstate.all_greedy,
        )
        self.kv_pool.swap(kv)
        self.next_tokens_buf = buf
        self.penalty_buf = pen
        rstate.fb = fb
        rstate.st = st
        return ForwardOutput(
            next_tokens=tokens,
            chosen_logprobs=chosen_lp,
            top_logprob_vals=tv,
            top_logprob_ids=ti,
        )

    def _encode_impl(self, params, kv, fb: ForwardBatch):
        """Embedding forward: pooled hidden states, L2-normed. Pooling
        type comes from the model (`pooling` attr): "last" (causal LMs),
        "cls" (BERT), or "mean" (gte/contriever-style).

        Ref: srt/layers/pooler.py + engine.encode."""
        hidden, kv = self.model(params, fb, kv, self.attn_backend)
        ptype = getattr(self.model, "pooling", "last")
        if ptype == "cls":
            pooled = hidden[fb.cu_q_lens[:-1]]  # segment starts
        elif ptype == "mean":
            T = hidden.shape[0]
            sid = fb.seq_ids
            offs = jnp.arange(T, dtype=jnp.int32) - fb.cu_q_lens[sid]
            valid = ((offs >= 0) & (offs < fb.q_lens[sid])).astype(
                hidden.dtype
            )[:, None]
            B = fb.q_lens.shape[0]
            sums = jax.ops.segment_sum(hidden * valid, sid, num_segments=B)
            pooled = sums / jnp.maximum(
                fb.q_lens.astype(hidden.dtype)[:, None], 1
            )
        else:
            pooled = hidden[fb.logits_indices]  # [B, H] last token
        if getattr(self.model, "is_classifier", False):
            # /classify: raw class logits, no normalization (ref
            # srt/models/llama_classification.py).
            return kv, self.model.classify_logits(params, pooled).astype(
                jnp.float32
            )
        pooled = pooled.astype(jnp.float32)
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9
        )
        return kv, pooled

    def forward_encode(self, fb: ForwardBatch):
        if not hasattr(self, "_encode"):
            self._encode = jax.jit(self._encode_impl, donate_argnums=(1,))
        new_kv, pooled = self._encode(self.params, self.kv_pool.kv, fb)
        self.kv_pool.swap(new_kv)
        return pooled

    def _score_impl(self, params, kv, fb: ForwardBatch, labels):
        """/v1/score: softmax probabilities of the label token ids at each
        sequence's next-token position (ref openai/serving_score.py;
        apply_softmax renormalization over the label subset happens host-
        side — probability ratios are preserved)."""
        hidden, kv = self.model(params, fb, kv, self.attn_backend)
        logits = self.model.compute_logits(
            params, hidden[fb.logits_indices]
        ).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        return kv, jnp.take_along_axis(probs, labels, axis=1)  # [B, L]

    def forward_score(self, fb: ForwardBatch, labels: np.ndarray):
        if not hasattr(self, "_score"):
            self._score = jax.jit(self._score_impl, donate_argnums=(1,))
        B = fb.q_lens.shape[0]
        lab = np.zeros((B, labels.shape[-1]), np.int32)
        lab[: labels.shape[0]] = labels
        new_kv, scores = self._score(
            self.params, self.kv_pool.kv, fb, jnp.asarray(lab)
        )
        self.kv_pool.swap(new_kv)
        return scores

    def _verify_impl(self, params, kv, fb: ForwardBatch):
        """Speculative verify: greedy tokens at EVERY extend position.

        Ref: ForwardMode.TARGET_VERIFY (srt/model_executor/
        forward_batch_info.py:98) + EAGLE verify (eagle_worker_v2.py:1492).
        Also returns the hidden states [T, H] — the EAGLE draft head
        conditions on the target's features at accepted positions.
        """
        hidden, kv = self.model(params, fb, kv, self.attn_backend)
        logits = self.model.compute_logits(params, hidden).astype(jnp.float32)
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [T]
        lp = jax.nn.log_softmax(logits, axis=-1)
        chosen = jnp.take_along_axis(lp, tokens[:, None], axis=1)[:, 0]
        return kv, tokens, chosen, hidden

    def forward_verify(self, fb: ForwardBatch):
        new_kv, tokens, chosen, hidden = self._verify(
            self.params, self.kv_pool.kv, fb
        )
        self.kv_pool.swap(new_kv)
        return tokens, chosen, hidden

    def _verify_sampled_impl(self, params, kv, fb, cand, temps, top_ks,
                             top_ps, min_ps, keys):
        """Tree verify with rejection-sampled acceptance support: per-node
        candidate probabilities under each row's SAMPLER-TRANSFORMED
        target distribution + a pre-sampled fallback (ops/sampling.py
        spec_candidate_probs; ref tree_speculative_sampling kernels)."""
        from sglang_tpu.ops.sampling import spec_candidate_probs

        hidden, kv = self.model(params, fb, kv, self.attn_backend)
        logits = self.model.compute_logits(params, hidden).astype(jnp.float32)
        p_cand, fb_tok, fb_lp = spec_candidate_probs(
            logits, temps, top_ks, top_ps, min_ps, cand, keys
        )
        return kv, p_cand, fb_tok, fb_lp, hidden

    def forward_verify_sampled(self, fb, cand_tokens, temps, top_ks,
                               top_ps, min_ps, seed: int):
        if not hasattr(self, "_verify_sampled"):
            self._verify_sampled = jax.jit(
                self._verify_sampled_impl, donate_argnums=(1,)
            )
        T = cand_tokens.shape[0]
        keys = jax.random.split(jax.random.PRNGKey(seed), T)
        new_kv, p_cand, fb_tok, fb_lp, hidden = self._verify_sampled(
            self.params, self.kv_pool.kv, fb, jnp.asarray(cand_tokens),
            jnp.asarray(temps), jnp.asarray(top_ks), jnp.asarray(top_ps),
            jnp.asarray(min_ps), keys,
        )
        self.kv_pool.swap(new_kv)
        return p_cand, fb_tok, fb_lp, hidden

    def _move_kv_impl(self, kv, src, dst):
        """Copy pool rows src -> dst across every layer (tree-verify
        compaction: accepted tree nodes move into sequence order). Rows are
        gathered first, then scattered through the Pallas row-DMA write
        kernel, so overlapping src/dst are safe."""
        from sglang_tpu.ops.attention.kv_write import (
            write_kv_pages,
            write_rows_pages,
        )

        ps = self.server_args.page_size
        sp, so = src // ps, src % ps
        new = []
        for kp, vp in kv:
            T = src.shape[0]
            if vp is None:  # MLA latent pool
                rows = kp[sp, so].reshape(T, -1)
                new.append(
                    (write_rows_pages(kp, rows, dst, page_size=ps), None)
                )
            else:
                kr = kp[sp, so].reshape(T, -1)
                vr = vp[sp, so].reshape(T, -1)
                new.append(
                    write_kv_pages(kp, vp, kr, vr, dst, page_size=ps)
                )
        return tuple(new)

    def move_kv_rows(self, src: np.ndarray, dst: np.ndarray) -> None:
        """Host entry: pads to a power-of-two bucket with trash-slot
        self-copies so the jit program count stays bounded."""
        m = len(src)
        if m == 0:
            return
        bucket = 8
        while bucket < m:
            bucket *= 2
        s = np.zeros(bucket, np.int32)
        d = np.zeros(bucket, np.int32)  # slot 0 = trash page self-copy
        s[:m] = src
        d[:m] = dst
        self.kv_pool.swap(
            self._move_kv(self.kv_pool.kv, jnp.asarray(s), jnp.asarray(d))
        )

    def _seed_penalty_row_impl(self, penalty_buf, slot, tokens, valid):
        """Rebuild one slot's output-token counts (after retraction)."""
        penalty_buf = penalty_buf.at[slot, :].set(0)
        inc = valid.astype(jnp.int32)
        return penalty_buf.at[slot, tokens].add(inc)

    def ensure_penalty_buf(self) -> None:
        if self.penalty_buf is None:
            self.penalty_buf = jnp.zeros(
                (self.num_slots + 1, self.model_config.vocab_size), jnp.int32
            )

    def seed_penalty_row(self, slot: int, token_ids) -> None:
        self.ensure_penalty_buf()
        pad = 64 * max(1, cdiv(max(len(token_ids), 1), 64))
        toks = np.zeros(pad, np.int32)
        valid = np.zeros(pad, np.bool_)
        toks[: len(token_ids)] = token_ids
        valid[: len(token_ids)] = True
        self.penalty_buf = self._seed_penalty_row(
            self.penalty_buf, jnp.asarray(slot, jnp.int32), jnp.asarray(toks),
            jnp.asarray(valid),
        )

    def override_next_tokens(self, slots, values) -> None:
        """Token-oracle / speculative override of the device future-map."""
        self.next_tokens_buf = self._override_tokens(
            self.next_tokens_buf,
            jnp.asarray(np.asarray(slots, np.int32)),
            jnp.asarray(np.asarray(values, np.int32)),
        )

    def forward(
        self,
        fb: ForwardBatch,
        st: SamplingTensors,
        vocab_mask: Optional[jax.Array] = None,
        banned_tokens: Optional[jax.Array] = None,
        lora_row_ids=None,
        mm_pack=None,
        return_top_logprobs: int = 0,
        all_greedy: bool = False,
        return_hidden: bool = False,
        custom_logit_pack=None,  # (fn, mask np[B] bool, {k: np[B] f32})
    ) -> ForwardOutput:
        lora_pack = None
        if lora_row_ids is not None and self.lora_manager is not None:
            lora_pack = (
                self.lora_manager.pools,
                jnp.asarray(self.lora_manager.scalings),
                jnp.asarray(np.asarray(lora_row_ids, np.int32)),
            )
        if fb.mode.is_decode():
            # Decode reads its input tokens from the device future-map, so
            # input_ids is an unused jit arg — passing a FRESH host array
            # for it stalls dispatch (~300ms/step observed through the
            # remote-TPU tunnel). Substitute a cached device-resident dummy.
            B = fb.input_ids.shape[0]
            dummy = self._decode_dummy_ids.get(B)
            if dummy is None:
                dummy = jnp.zeros((B,), jnp.int32)
                self._decode_dummy_ids[B] = dummy
            fb = dataclasses.replace(fb, input_ids=dummy)
        new_kv, new_buf, new_pen, tokens, chosen_lp, tv, ti, hidden = (
            self._step(
                self.params,
                self.kv_pool.kv,
                self.next_tokens_buf,
                self.penalty_buf,
                fb,
                st,
                vocab_mask,
                banned_tokens,
                lora_pack,
                mm_pack,
                return_top_logprobs=return_top_logprobs,
                all_greedy=all_greedy,
                return_hidden=return_hidden,
                clp_fn=(tuple(fn for fn, _, _ in custom_logit_pack)
                        if custom_logit_pack else None),
                clp_pack=(
                    tuple(
                        (jnp.asarray(mask),
                         {k: jnp.asarray(v) for k, v in params.items()})
                        for _, mask, params in custom_logit_pack
                    )
                    if custom_logit_pack else None
                ),
            )
        )
        self.kv_pool.swap(new_kv)
        self.next_tokens_buf = new_buf
        self.penalty_buf = new_pen
        return ForwardOutput(
            next_tokens=tokens,
            chosen_logprobs=chosen_lp,
            top_logprob_vals=tv,
            top_logprob_ids=ti,
            hidden=hidden,
        )
