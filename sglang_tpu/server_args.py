"""ServerArgs: the single typed config object for the whole runtime.

Mirrors the flag surface of the reference's srt/server_args.py (ServerArgs
dataclass, ~700 flags; we replicate the names from the subset that matters
for drop-in bench compatibility — reference srt/server_args.py:438+) but is
a fresh TPU-first design: device topology is a JAX mesh spec, static-shape
bucketing replaces CUDA-graph capture lists, and there is no NCCL/port-per-
rank plumbing.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import random
from dataclasses import dataclass, field
from typing import List, Optional

from sglang_tpu.utils import cdiv, find_free_port


@dataclass
class ServerArgs:
    # Model & tokenizer
    model_path: str = ""
    tokenizer_path: Optional[str] = None
    tokenizer_mode: str = "auto"
    skip_tokenizer_init: bool = False
    trust_remote_code: bool = False
    context_length: Optional[int] = None
    revision: Optional[str] = None
    model_override_args: Optional[str] = None  # JSON dict merged into HF config

    # Serving
    host: str = "127.0.0.1"
    port: int = 30000
    api_key: Optional[str] = None
    served_model_name: Optional[str] = None
    chat_template: Optional[str] = None

    # Dtype / quantization
    dtype: str = "auto"  # auto -> bfloat16 on TPU
    kv_cache_dtype: str = "auto"
    quantization: Optional[str] = None  # fp8 | int8 | int4 (weight-only)

    # Memory / KV cache
    mem_fraction_static: Optional[float] = None
    max_total_tokens: Optional[int] = None
    max_running_requests: Optional[int] = None
    max_prefill_tokens: int = 16384
    chunked_prefill_size: int = 4096
    page_size: int = 64  # tokens per KV page (TPU DMA-friendly; ref default 1)
    max_pages_per_req: Optional[int] = None

    # Scheduling
    schedule_policy: str = "lpm"  # lpm | fcfs | dfs-weight | lof | random
    enable_hierarchical_cache: bool = False  # host KV tier (HiCache)
    radix_cache_impl: str = "cpp"  # cpp (native) | python
    # Recurrent-state checkpoint slots (mamba/hybrid radix cache, ref
    # srt/mem_cache/mamba_radix_cache.py): extra rows in the state pools
    # that snapshot a request's SSM state at radix-node boundaries so
    # later same-prefix requests skip re-prefilling. 0 disables (recurrent
    # models then run with prefix caching off).
    num_state_checkpoints: int = 32
    hicache_ratio: float = 2.0  # host tier size vs device pool
    # L3 KV storage (ref srt/mem_cache/storage/): host-tier evictions
    # spill to one file per page under this directory; host misses fault
    # back in. None = no storage tier.
    hicache_storage_dir: Optional[str] = None
    hicache_storage_max_bytes: int = 8 << 30
    hicache_max_host_pages: Optional[int] = None  # overrides hicache_ratio
    # ref --hicache-write-policy (srt/mem_cache/hiradix_cache.py:76):
    # write_back (store on device-tree eviction), write_through (store at
    # radix insert), write_through_selective (store on second insert).
    hicache_write_policy: str = "write_back"
    # ref --hicache-storage-backend (srt/mem_cache/storage/
    # backend_factory.py): file | mmap (point hicache_storage_dir at
    # /dev/shm for shm) | native (C++ batched-IO arena) | sqlite | zlib
    # | resp://host:port (any Redis-compatible server) | zmq://tcp://...
    # (ZmqStorageServer). See sglang_tpu/mem/storage/.
    hicache_storage_backend: str = "file"
    hicache_disable_prefetch: bool = False
    schedule_conservativeness: float = 1.0
    disable_radix_cache: bool = False
    disable_overlap_schedule: bool = False
    # Device-resident decode loop (zero host arrays per steady decode step).
    disable_resident_decode: bool = False
    # Cascade (shared-prefix) decode attention: gather a batch-wide common
    # radix prefix once instead of per row.
    disable_cascade_attn: bool = False
    # MIXED prefill+decode batches: running decode rows ride each chunked-
    # prefill program as a densely packed tail so prefill steps stop
    # stalling running decodes (ref --enable-mixed-chunk,
    # forward_batch_info.py:98 ForwardMode.MIXED). Opt-in, matching the
    # reference default: it trims inter-token latency spikes during
    # prefill but LOWERS closed-batch throughput on TPU — decode rows
    # that ride prefill finish staggered, fragmenting the endgame decode
    # batches and breaking the resident decode loop, and every
    # (token-bucket x tail-bucket) combination is a new XLA program
    # (measured 2747 -> 1600 tok/s on the 1B bench; PERF_NOTES.md).
    enable_mixed_chunk: bool = False
    disable_swa_kv_pool: bool = False  # hybrid pool for sliding-window layers
    # KV cache event publishing for external cache-aware routers
    # (JSON: {"endpoint": "tcp://*:5557", "topic": "kv-events"}).
    kv_events_config: Optional[str] = None
    # Parallel CPU tokenization workers (multi-tokenizer analog).
    tokenizer_worker_num: int = 4
    # KV page-ownership invariant sweeps every N scheduler steps (0 = off).
    enable_invariant_check: int = 0
    # KV canary (ref srt/kv_canary/): stamp freed pages with a known
    # pattern and verify on re-allocation — catches use-after-free KV
    # CONTENT corruption the ownership invariant checker can't see.
    # Debug mode: every free/alloc round-trips the device.
    enable_kv_canary: bool = False
    # Deterministic (batch-invariant) inference (ref
    # --enable-deterministic-inference): every batch pads to the largest
    # bucket and cascade attention is disabled, so a request's numerics
    # never depend on co-batched requests. Reproducibility mode.
    enable_deterministic_inference: bool = False
    # Allow pickled per-request custom logit processors (ref
    # --enable-custom-logit-processor; registry-named processors are
    # always allowed). See sampling/custom_logit_processor.py.
    enable_custom_logit_processor: bool = False
    # EVS video token pruning rate q in [0, 1) (ref
    # srt/multimodal/evs/): keep the top (1-q) temporally-dissimilar
    # video tokens; 0 disables. See multimodal/evs.py.
    evs_video_pruning_rate: float = 0.0
    # Debug dump mode (ref srt/debug_utils/dumper.py): write one .npz per
    # batch (forward inputs + sampled outputs) for offline comparison via
    # `python -m sglang_tpu.debug_utils compare A B`.
    debug_dump_dir: Optional[str] = None
    # Tokens of KV page runway pre-allocated per decode seq between host
    # rebuilds of the resident state (one page = one rebuild per page_size
    # steps per seq).
    decode_runway: int = 64
    stream_interval: int = 1
    max_queued_requests: Optional[int] = None
    retract_decode_steps: int = 20

    # Parallelism (mesh axes)
    tp_size: int = 1
    dp_size: int = 1
    ep_size: int = 1
    # EP token dispatch (ref --moe-a2a-backend deepep): "ragged" ships
    # each expert shard exactly its tokens via jax.lax.ragged_all_to_all
    # (layers/moe.py); default keeps the padded-groups formulation.
    moe_a2a_backend: Optional[str] = None
    # EPLB redundant experts (ref --ep-num-redundant-experts,
    # srt/eplb/eplb_algorithms/deepseek.py): R extra physical expert slots
    # per MoE layer hold replicas of hot experts; /eplb_rebalance packs
    # replicated placements and /elastic_ep routes around dead EP shards.
    # Must be divisible by ep_size.
    ep_num_redundant_experts: int = 0
    # Two-batch overlap (ref --enable-two-batch-overlap,
    # srt/batch_overlap/two_batch_overlap.py): split the MoE token stream
    # into two independent dispatch chains so XLA's latency-hiding
    # scheduler can ride one chain's all-to-all under the other's grouped
    # GEMMs (layers/moe.py set_tbo). Only affects EP + ragged-a2a runs.
    enable_two_batch_overlap: bool = False
    # Single-batch overlap (ref --enable-single-batch-overlap,
    # srt/batch_overlap/single_batch_overlap.py): shared-expert FFN
    # computed inside the EP dispatch shard_map on each shard's local
    # rows, an independent chain beside the a2a (layers/moe.py set_sbo).
    enable_single_batch_overlap: bool = False
    # Decode context parallelism (ref srt/layers/dcp/): context pages
    # shard over the tp-axis devices with an LSE merge — THE way MLA
    # models parallelize decode attention (the single latent head cannot
    # be head-split). Disables cascade decode batches.
    enable_dcp: bool = False
    # HiSparse (ref srt/managers/hisparse_coordinator.py): MLA latent KV
    # lives HOST-side; DSA layers gather only their indexer-selected
    # top-k rows back per step via ordered XLA host callbacks
    # (mem/hisparse.py). Serves contexts larger than device KV capacity;
    # requires a DSA model, unquantized KV.
    enable_hisparse: bool = False
    # DP attention (ref srt/layers/dp_attention.py:46-230): attention
    # computed with the batch dim sharded over the "dp" mesh axis (each
    # shard gathers only its rows' KV) while the MLP runs on gathered
    # tokens. TPU-native: GSPMD sharding constraints inside ONE program —
    # no per-rank schedulers, no idle-step sync. Requires dp_size > 1.
    enable_dp_attention: bool = False
    # Zigzag prefill context parallelism (ref srt/layers/cp/zigzag.py):
    # extend q blocks dealt boustrophedon over the tp-axis devices so the
    # causal triangle balances; each chip attends only its blocks.
    enable_cp: bool = False
    # CP block layout: zigzag (boustrophedon deal, ref cp/zigzag.py) or
    # interleave (strided deal, ref cp/interleave.py:14-26).
    cp_strategy: str = "zigzag"
    pp_size: int = 1
    # GPipe microbatches per step under PP (default pp_size; ref
    # scheduler_pp_mixin microbatch count).
    pp_microbatches: Optional[int] = None
    nnodes: int = 1
    node_rank: int = 0
    dist_init_addr: Optional[str] = None

    # Attention / kernels
    attention_backend: Optional[str] = None  # pallas | xla_native (auto by platform)
    sampling_backend: Optional[str] = None  # device | token_oracle
    disable_jit: bool = False

    # Decode-time features
    grammar_backend: str = "native"  # our own FSM engine (ref: xgrammar)
    disable_jump_forward: bool = False
    tool_call_parser: Optional[str] = None  # llama3|qwen25|mistral|json|...
    reasoning_parser: Optional[str] = None  # deepseek-r1|qwen3|kimi|...
    constrained_json_whitespace_pattern: Optional[str] = None
    speculative_algorithm: Optional[str] = None  # EAGLE | NGRAM | STANDALONE
    speculative_num_steps: int = 3
    speculative_num_draft_tokens: int = 4
    speculative_eagle_topk: int = 1
    speculative_draft_model_path: Optional[str] = None

    # LoRA
    enable_lora: bool = False
    max_loras_per_batch: int = 4
    max_lora_rank: Optional[int] = None
    # Extra LoRA target modules beyond the 7 projection defaults (ref
    # lora_manager target_modules): "lm_head" and/or "embed_tokens"
    # allocate vocab-sized pools applied at the logits tap / embedding.
    lora_target_modules: Optional[List[str]] = None
    lora_paths: Optional[List[str]] = None

    # Loading
    load_format: str = "auto"  # auto | safetensors | dummy
    random_seed: Optional[int] = None
    # Weight-cache daemon (weight_cache/): "client" tries the daemon and
    # falls back to disk when absent; "daemon" requires it (ref
    # srt/weight_cache/ipc_loader.py fallback semantics).
    weight_cache_mode: Optional[str] = None  # client | daemon

    # Logging / observability
    log_level: str = "info"
    log_requests: bool = False
    enable_metrics: bool = False
    decode_log_interval: int = 40

    # Process topology
    enable_single_process: bool = False  # run all managers in-process (tests)
    # Ray mode (ref srt/ray/): manager lifecycle via Ray actors; ZMQ
    # remains the data plane. ray_backend: auto | ray | fake.
    enable_ray: bool = False
    ray_backend: str = "auto"
    zmq_transport: str = "ipc"  # ipc | tcp

    # Buckets (static-shape jit programs; TPU replacement for CUDA graphs)
    decode_bs_buckets: Optional[List[int]] = None
    prefill_token_buckets: Optional[List[int]] = None

    # Multimodal
    enable_multimodal: bool = False
    mm_image_token_limit: int = 4096

    # Disaggregation (PD)
    # PD multiplexing (ref --enable-pdmux, srt/multiplex/): colocate a
    # prefill-role and a decode-role scheduler on ONE chip. The reference
    # partitions SMs via green contexts; the TPU recast time-division
    # multiplexes with a decode-first tick and statically splits the KV
    # pool's page space between the roles (multiplex/pdmux.py).
    enable_pdmux: bool = False
    # Prefill-role share of the KV pool pages under PDMux.
    pdmux_prefill_ratio: float = 0.35
    # Chunked-prefill size for the prefill role (bounds decode ITL; the
    # SM-split analog). Default min(chunked_prefill_size, 2048).
    pdmux_prefill_chunk: Optional[int] = None
    disaggregation_mode: str = "null"  # null | prefill | decode
    disaggregation_bootstrap_port: int = 8998
    # Transport between prefill and decode engines: "fake" (in-process,
    # tests) or "zmq" (real sockets — tcp:// rides DCN across hosts).
    disaggregation_transport: str = "fake"
    # decode: ZMQ bind address for incoming KV; prefill: target address
    # (resolved via the bootstrap URL when unset).
    disaggregation_kv_addr: Optional[str] = None
    disaggregation_bootstrap_url: Optional[str] = None
    # Plugin modules, comma-separated (ref srt/plugins/): each must expose
    # sglang_tpu_plugin(registry). Also via SGLANG_TPU_PLUGINS.
    plugins: Optional[str] = None
    # Sidecar process (ref srt/entrypoints/sidecar.py): a module with
    # main(argv) spawned alongside the server, handed the gRPC endpoint
    # via SGLANG_TPU_GRPC_ENDPOINT; extra argv in sidecar_args.
    sidecar: Optional[str] = None
    sidecar_args: Optional[List[str]] = None
    # Diffusion LLM (ref srt/dllm/, --dllm-algorithm): block denoise
    # generation for LLaDA/SDAR-class models. Algorithms: low_confidence
    # | joint_threshold. Block size / mask id resolve from DLLM_PARAMS
    # for known architectures; set explicitly for others.
    dllm_algorithm: Optional[str] = None
    dllm_block_size: Optional[int] = None
    dllm_mask_id: Optional[int] = None
    dllm_threshold: float = 0.95

    def __post_init__(self):
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path
        if self.served_model_name is None:
            self.served_model_name = self.model_path
        if self.random_seed is None:
            self.random_seed = random.randint(0, 2**31 - 1)
        if self.mem_fraction_static is None:
            # Leave headroom for activations; weights accounted separately.
            self.mem_fraction_static = 0.85
        if self.dtype == "auto":
            self.dtype = "bfloat16"
        if self.max_running_requests is None:
            self.max_running_requests = 256
        if self.chunked_prefill_size % self.page_size != 0:
            self.chunked_prefill_size = cdiv(
                self.chunked_prefill_size, self.page_size
            ) * self.page_size

    @property
    def world_size(self) -> int:
        return self.tp_size * self.dp_size * self.pp_size

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> None:
        for f in dataclasses.fields(ServerArgs):
            name = "--" + f.name.replace("_", "-")
            if f.type in ("bool", bool):
                parser.add_argument(name, action="store_true", default=f.default)
            elif f.type in ("Optional[List[str]]",):
                parser.add_argument(name, type=str, nargs="*", default=None)
            elif f.type in ("Optional[List[int]]",):
                parser.add_argument(name, type=int, nargs="*", default=None)
            else:
                typ = str
                if f.type in ("int", int, "Optional[int]"):
                    typ = int
                elif f.type in ("float", float, "Optional[float]"):
                    typ = float
                default = f.default if f.default is not dataclasses.MISSING else None
                parser.add_argument(name, type=typ, default=default)

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "ServerArgs":
        field_names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in vars(args).items() if k in field_names}
        return cls(**kwargs)


def prepare_server_args(argv: List[str]) -> ServerArgs:
    parser = argparse.ArgumentParser(description="sglang-tpu server")
    ServerArgs.add_cli_args(parser)
    return ServerArgs.from_cli_args(parser.parse_args(argv))


@dataclass
class PortArgs:
    """ZMQ addresses connecting TokenizerManager <-> Scheduler <-> Detokenizer.

    Reference: srt/server_args.py PortArgs.init_new (:9480). We keep the
    3-hop pipe shape; ipc:// on one host, tcp:// across hosts.
    """

    tokenizer_ipc: str = ""
    scheduler_ipc: str = ""
    detokenizer_ipc: str = ""

    @classmethod
    def init_new(cls, server_args: ServerArgs) -> "PortArgs":
        if server_args.zmq_transport == "tcp":
            return cls(
                tokenizer_ipc=f"tcp://{server_args.host}:{find_free_port()}",
                scheduler_ipc=f"tcp://{server_args.host}:{find_free_port()}",
                detokenizer_ipc=f"tcp://{server_args.host}:{find_free_port()}",
            )
        base = f"/tmp/sglang_tpu_{os.getpid()}_{random.randint(0, 1 << 30)}"
        return cls(
            tokenizer_ipc=f"ipc://{base}_tok",
            scheduler_ipc=f"ipc://{base}_sched",
            detokenizer_ipc=f"ipc://{base}_detok",
        )
