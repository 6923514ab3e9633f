"""ScheduleCore: the continuous-batching engine.

Ref: srt/managers/scheduler.py (event_loop_overlap:1718,
get_next_batch_to_run:2961, get_new_batch_prefill:3103,
update_running_batch:3427, retraction) + schedule_batch.py — redesigned
around the TPU execution model:

- The device step is fully async (JAX dispatch); the host schedules step
  N+1 while step N runs. Decode inputs come from the device-resident
  next-token buffer (future map), so scheduling never waits on sampled
  tokens. Results are processed one step late — exactly the reference's
  overlap event loop, with XLA async dispatch instead of CUDA streams.
- Static-bucketed ForwardBatch construction replaces CUDA-graph capture.
- Page-granular RadixCache admission; eviction + retraction on pressure.

This class is transport-agnostic: Engine calls it inline; the Scheduler
process wraps it with ZMQ.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from collections import deque
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from sglang_tpu.core.radix_cache import RadixCache
from sglang_tpu.core.req import FinishReason, Req, ReqStatus
from sglang_tpu.core.schedule_policy import SchedulePolicy
from sglang_tpu.mem.allocator import PageAllocator, ReqSlotPool
from sglang_tpu.model_exec.batch_builder import SeqInput, build_forward_batch
from sglang_tpu.model_exec.forward_batch import ForwardMode
from sglang_tpu.model_exec.model_runner import ForwardOutput, ModelRunner
from sglang_tpu.sampling.sampling_batch_info import build_sampling_tensors
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import cdiv

logger = logging.getLogger(__name__)

MAX_BANNED_TOKENS = 8


def oracle_next_token(token_ids, vocab_size: int) -> int:
    """Scripted next-token source (ref: token_oracle sampling backend)."""
    h = 0
    for t in token_ids[-8:]:
        h = (h * 1103515245 + int(t) + 12345) & 0x7FFFFFFF
    return 2 + h % max(vocab_size - 2, 1)


@dataclasses.dataclass
class StepOutput:
    rid: str
    new_token: Optional[int]
    finish_reason: Optional[dict]
    logprob: Optional[float] = None
    top_logprobs: Optional[Tuple[List[float], List[int]]] = None
    completion_tokens: int = 0
    cached_tokens: int = 0
    prompt_tokens: int = 0
    embedding: Optional[List[float]] = None
    hidden_state: Optional[List[float]] = None  # [H] when requested


@dataclasses.dataclass
class _Row:
    req: Req
    kind: str  # "chunk" | "final" | "decode"
    epoch: int
    device_step: int  # index of the sampled token (== output idx)


@dataclasses.dataclass
class _PendingBatch:
    rows: List[_Row]
    out: ForwardOutput
    mode: ForwardMode
    launch_time: float
    fb: object = None  # retained only when --debug-dump-dir is set
    # [B] row -> hidden index (set when a row wants return_hidden_states)
    hidden_idx: object = None


@dataclasses.dataclass
class _ResidentState:
    """Armed device-resident decode loop (see ModelRunner.forward_resident).

    Valid while the decode batch composition is unchanged and every row has
    page runway + output budget left; any admission/finish/retract makes the
    identity check in _try_resident_decode fail and falls back to a host
    rebuild. fb/st are device pytrees advanced in place by the runner."""

    reqs: List[Req]
    epochs: List[int]
    fb: object  # ForwardBatch (device)
    st: object  # SamplingTensors (device)
    banned: object  # Optional[jax.Array]
    top_logprobs: int
    all_greedy: bool
    steps_left: int


class ScheduleCore:
    def __init__(
        self,
        server_args: ServerArgs,
        runner: ModelRunner,
        tokenizer=None,
    ):
        self.args = server_args
        self.runner = runner
        self.tokenizer = tokenizer
        self.page_size = server_args.page_size
        # Recurrent (SSM) models: states are not page-addressable, so
        # prefix caching / cascade / speculative verify are off.
        self.recurrent = bool(getattr(runner.model, "is_recurrent", False))
        # Recurrent models: prefix reuse is legal only at state-checkpoint
        # boundaries (mem/state_ckpt.py; ref mem_cache/mamba_radix_cache.py)
        # — with checkpoint rows available the radix tree stays ON and
        # anchors checkpoints; without them (or when the model bans prefix
        # caching for non-state reasons) the tree is disabled.
        use_state_ckpt = (
            self.recurrent and getattr(runner, "state_ckpt_rows", 0) > 0
        )
        if getattr(runner.model, "no_prefix_cache", False):
            if not use_state_ckpt:
                server_args.disable_radix_cache = True
        if getattr(runner, "dcp_pool_sharded", False):
            # DCP memory sharding: a sequence's i-th page must land on
            # mesh shard i % n (mem/allocator.py DcpPageAllocator).
            from sglang_tpu.mem.allocator import DcpPageAllocator

            self.allocator = DcpPageAllocator(
                runner.kv_pool.config.num_pages, self.page_size,
                runner.mesh_ctx.tp_size,
            )
        else:
            self.allocator = PageAllocator(
                runner.kv_pool.config.num_pages, self.page_size
            )
        if server_args.enable_kv_canary and not self.recurrent:
            from sglang_tpu.mem.kv_canary import CanaryAllocator

            self.allocator = CanaryAllocator(self.allocator, runner)
        # Debug dump mode (ref srt/debug_utils/dumper.py): one .npz per
        # batch with forward inputs + sampled outputs.
        self.dumper = None
        if getattr(server_args, "debug_dump_dir", None):
            from sglang_tpu.debug_utils import StepDumper

            self.dumper = StepDumper(server_args.debug_dump_dir)
        # Hybrid SWA pool (ref srt/mem_cache/allocator/swa.py +
        # swa_radix_cache.py): sliding layers live in their own small pool;
        # out-of-window SWA pages are freed as sequences grow, and trailing
        # windows released into the tree stay reusable via the shadow map.
        kvc = runner.kv_pool.config
        self.hybrid_swa = kvc.swa_num_pages > 0
        self.swa_allocator = None
        self.swa_shadow = None
        self.swa_window = 0
        if self.hybrid_swa:
            from sglang_tpu.mem.allocator import SwaShadowRegistry

            self.swa_allocator = PageAllocator(
                kvc.swa_num_pages, self.page_size
            )
            self.swa_shadow = SwaShadowRegistry(self.swa_allocator)
            self.swa_window = max(kvc.layer_windows)
        self.hicache = None
        if server_args.enable_hierarchical_cache:
            from sglang_tpu.mem.hicache import HiCacheController

            self.hicache = HiCacheController(
                runner.kv_pool, host_ratio=server_args.hicache_ratio,
                max_host_pages=server_args.hicache_max_host_pages,
                storage_dir=server_args.hicache_storage_dir,
                storage_max_bytes=server_args.hicache_storage_max_bytes,
                write_policy=server_args.hicache_write_policy,
                storage_backend=server_args.hicache_storage_backend,
                enable_prefetch=not server_args.hicache_disable_prefetch,
            )
        # KV event publishing (ref --kv-events-config): BlockStored /
        # BlockRemoved / AllBlocksCleared over ZMQ PUB for external
        # cache-aware routers.
        self.kv_events = None
        self._kv_blocks_published: set = set()
        if server_args.kv_events_config:
            from sglang_tpu.observability.kv_events import KVEventPublisher

            self.kv_events = KVEventPublisher(server_args.kv_events_config)

        radix_cls = RadixCache
        if use_state_ckpt:
            # Checkpoints anchor to python TreeNodes (ancestor walks +
            # per-node locks); the C++ tree's opaque handles can't host
            # them.
            server_args.radix_cache_impl = "python"
        if server_args.radix_cache_impl == "cpp":
            try:
                from sglang_tpu.core.radix_cache_cpp import CppRadixCache

                radix_cls = CppRadixCache
            except Exception:  # noqa: BLE001
                logger.warning(
                    "native radix tree unavailable; using python impl",
                    exc_info=True,
                )
        evict_hooks = []
        if self.hicache is not None:
            evict_hooks.append(self.hicache.store_pages)
        if self.kv_events is not None:
            evict_hooks.append(self._kv_evict_event)
        on_evict = None
        if evict_hooks:
            def on_evict(full_prefix, pages, _hooks=tuple(evict_hooks)):
                for h in _hooks:
                    h(full_prefix, pages)

        radix_alloc = self.allocator
        if self.hybrid_swa:
            from sglang_tpu.mem.allocator import RadixAllocatorShim

            radix_alloc = RadixAllocatorShim(self.allocator, self.swa_shadow)
        if server_args.disable_radix_cache:
            # Ref srt/mem_cache/chunk_cache.py: radix off -> the
            # interface-compatible no-sharing controller.
            from sglang_tpu.core.chunk_cache import ChunkCache

            self.radix = ChunkCache(
                self.page_size, radix_alloc, on_evict=on_evict
            )
        else:
            self.radix = radix_cls(
                self.page_size,
                radix_alloc,
                disable=False,
                on_evict=on_evict,
            )
        self.state_ckpt = None
        self._pending_state_saves: List[Tuple[Req, int]] = []
        if use_state_ckpt and not server_args.disable_radix_cache:
            from sglang_tpu.mem.state_ckpt import StateCheckpointRegistry

            self.state_ckpt = StateCheckpointRegistry(
                runner.state_ckpt_rows, runner, self.radix, self.allocator
            )
        self.policy = SchedulePolicy(server_args.schedule_policy, self.radix)
        self.slots = ReqSlotPool(server_args.max_running_requests)

        self.waiting: List[Req] = []
        self.running: List[Req] = []
        self.chunked_req: Optional[Req] = None
        self.pending: deque[_PendingBatch] = deque()
        self.pipeline_depth = 1 if server_args.disable_overlap_schedule else 2
        self._resident: Optional[_ResidentState] = None
        self.resident_enabled = not server_args.disable_resident_decode
        self.decode_runway = server_args.decode_runway
        # Cascade decode needs a backend that understands fb.shared_pages
        # and full (non-windowed) attention on every layer.
        if server_args.enable_deterministic_inference:
            from sglang_tpu.utils import set_deterministic_buckets

            set_deterministic_buckets(True)
        # MIXED prefill+decode batches (ref ForwardMode.MIXED,
        # srt/managers/scheduler.py:3103 mixed chunked prefill): decode
        # rows ride the extend program as a packed tail. Gated off for
        # recurrent-state models (their scan path branches on mode), CP
        # (the zigzag deal assumes a pure extend layout), and PP (the
        # microbatch tick loop schedules modes itself).
        self.mixed_enabled = (
            server_args.enable_mixed_chunk
            and not self.recurrent
            and not server_args.enable_cp
            and server_args.pp_size == 1
        )
        self.cascade_enabled = (
            not server_args.disable_cascade_attn
            and getattr(runner.attn_backend, "supports_cascade", False)
            and runner.model_config.sliding_window is None
            and not self.recurrent
            # cascade's batch-shared-prefix math depends on co-batching
            and not server_args.enable_deterministic_inference
            # DSA sparse scoring must see the WHOLE context in the
            # per-row page table; cascade strips the shared prefix.
            and not getattr(runner.model, "dsa_index_dim", 0)
        )

        # ViT embedding cache keyed by image content hash (ref
        # srt/mem_cache/multimodal_cache.py): a repeated image skips the
        # vision encoder entirely.
        from collections import OrderedDict as _OD

        self.mm_embed_cache: "_OD[int, np.ndarray]" = _OD()
        self.mm_cache_hits = 0
        self.mm_cache_max = 64

        self.eos_token_ids = set()
        if tokenizer is not None and getattr(tokenizer, "eos_token_id", None) is not None:
            self.eos_token_ids.add(tokenizer.eos_token_id)
        gc = getattr(runner.model_config.hf_config, "eos_token_id", None)
        if isinstance(gc, int):
            self.eos_token_ids.add(gc)
        elif isinstance(gc, (list, tuple)):
            self.eos_token_ids.update(gc)

        # Constrained decoding (native grammar engine; ref srt/constrained/)
        self._grammar_backend = None
        self._early_outputs: List[StepOutput] = []

        # Speculative decoding (ref srt/speculative/): NGRAM (self-history
        # drafting) or STANDALONE (separate draft model).
        self.drafter = None
        self.draft_worker = None
        algo = (server_args.speculative_algorithm or "").upper()
        if self.recurrent and algo:
            logger.warning(
                "speculative decoding disabled: recurrent-state models "
                "cannot roll back rejected drafts"
            )
            algo = ""
        if algo == "NGRAM":
            # Global cross-request corpus (C++ suffix automaton, the
            # SURVEY §2.10 ngram_corpus obligation) wrapping the
            # self-history drafter; degrades to pure Python if the
            # toolchain is missing.
            from sglang_tpu.speculative.ngram_corpus import (
                NgramCorpusDrafter,
            )

            self.drafter = NgramCorpusDrafter(
                num_draft_tokens=server_args.speculative_num_draft_tokens
            )
            self.pipeline_depth = 1  # verify is host-synced
        elif algo == "STANDALONE":
            from sglang_tpu.speculative.standalone import StandaloneDraftWorker

            self.draft_worker = StandaloneDraftWorker(
                server_args,
                num_draft_tokens=server_args.speculative_num_draft_tokens,
            )
            self.pipeline_depth = 1
        elif algo == "EAGLE":
            from sglang_tpu.speculative.eagle import EagleWorker

            self.draft_worker = EagleWorker(
                server_args,
                runner,
                num_draft_tokens=server_args.speculative_num_draft_tokens,
            )
            self.pipeline_depth = 1
        self.num_spec_accepted = 0

        # Diffusion-LLM block denoising (ref srt/dllm/): generation in
        # fixed blocks via the tree-verify extend program (all-ones
        # in-block mask = bidirectional intra-block attention).
        self.dllm = None
        if getattr(server_args, "dllm_algorithm", None):
            from sglang_tpu.dllm import DllmConfig, get_algorithm

            if self.drafter is not None or self.draft_worker is not None:
                raise ValueError(
                    "--dllm-algorithm is incompatible with speculative "
                    "decoding"
                )
            archs = getattr(runner.model_config, "architectures", None) or []
            self.dllm = get_algorithm(
                DllmConfig.from_server_args(server_args, archs)
            )
            self.pipeline_depth = 1  # denoise rounds are host-synced
            self.num_dllm_rounds = 0
        # /pause_generation: no NEW batches launch while paused (pending
        # device work still drains; queues are preserved).
        self.paused = False
        self.num_spec_steps = 0

        # PD disaggregation (ref srt/disaggregation/): prefill engines ship
        # page-granular KV to decode engines via a KVSender; decode engines
        # admit PREBUILT requests whose KV is restored with the HiCache
        # page-copy kernel.
        self.pd_mode = server_args.disaggregation_mode  # null|prefill|decode
        self.kv_sender = None
        self.kv_receiver = None
        self.pd_bootstrap = None
        self._pd_gather = None
        # Decode-side prealloc queue (ref DisaggDecodePreallocQueue,
        # srt/disaggregation/decode.py): requests arrive BEFORE their KV
        # does; the step loop polls the receiver and auto-admits.
        self.pd_prealloc: Dict[str, Req] = {}
        if self.pd_mode == "prefill":
            if server_args.disaggregation_transport == "zmq":
                from sglang_tpu.disaggregation.zmq_transport import (
                    ZmqKVSender,
                    resolve_bootstrap,
                )

                addr = server_args.disaggregation_kv_addr or (
                    resolve_bootstrap(server_args.disaggregation_bootstrap_url)
                )
                self.kv_sender = ZmqKVSender(addr)
            else:
                from sglang_tpu.disaggregation.fake import FakeKVSender

                self.kv_sender = FakeKVSender()
        elif self.pd_mode == "decode":
            if server_args.disaggregation_transport == "zmq":
                from sglang_tpu.disaggregation.zmq_transport import (
                    HttpBootstrapServer,
                    ZmqKVReceiver,
                )

                self.kv_receiver = ZmqKVReceiver(
                    server_args.disaggregation_kv_addr
                    or "tcp://0.0.0.0:18998"
                )
                self.pd_bootstrap = HttpBootstrapServer(
                    self.kv_receiver.addr,
                    port=server_args.disaggregation_bootstrap_port,
                )
            else:
                from sglang_tpu.disaggregation.fake import FakeKVReceiver

                self.kv_receiver = FakeKVReceiver()
        if self.pd_mode in ("prefill", "decode"):
            # KV pages travel as flat per-layer BYTES (mem/page_codec.py)
            # so MHA split pools, MLA latent pools, and MLA+DSA-index
            # pools all ship over the same transport (ref mooncake/conn.py
            # moves raw latent bytes the same way).
            from sglang_tpu.mem.page_codec import PageCodec

            if not runner.kv_pool.config.hisparse:
                kvc_ = runner.kv_pool.config
                if self.hybrid_swa:
                    # Hybrid-SWA models: two page-id spaces — full layers
                    # ship with req.pages, sliding layers with
                    # req.swa_pages (out-of-window slots already freed to
                    # the trash page; masked on the decode side anyway).
                    wins = kvc_.layer_windows
                    full_ids = [i for i in range(kvc_.num_layers)
                                if not (i < len(wins) and wins[i] > 0)]
                    swa_ids = [i for i in range(kvc_.num_layers)
                               if i < len(wins) and wins[i] > 0]
                    self._pd_codec = PageCodec(runner.kv_pool, full_ids)
                    self._pd_swa_codec = PageCodec(runner.kv_pool, swa_ids)
                else:
                    self._pd_codec = PageCodec(runner.kv_pool)
                    self._pd_swa_codec = None

        # Mock-model oracle mode (ref test/mock_model/utils.py:17-33 —
        # --sampling-backend token_oracle): the next token is a scripted
        # function of the sequence so the WHOLE scheduler/cache/transport
        # stack can be verified end-to-end with dummy weights.
        self.token_oracle = server_args.sampling_backend == "token_oracle"
        if self.token_oracle:
            self.pipeline_depth = 1  # host must rewrite the future map

        # metrics
        self.num_generated_tokens = 0
        self.num_prefill_tokens = 0
        self.num_mixed_steps = 0
        self.num_jump_tokens = 0
        self.num_cached_tokens = 0
        self.gen_throughput = 0.0
        self._tp_last = (time.time(), 0)
        self.last_log = time.time()

    def _get_grammar_backend(self):
        if self._grammar_backend is None:
            if self.tokenizer is None:
                raise ValueError(
                    "structured output requires a tokenizer "
                    "(disable --skip-tokenizer-init)"
                )
            from sglang_tpu.constrained.grammar_backend import GrammarBackend

            self._grammar_backend = GrammarBackend(
                self.tokenizer,
                self.eos_token_ids,
                vocab_size=self.runner.model_config.vocab_size,
            )
        return self._grammar_backend

    # ------------------------------------------------------------------ API
    def add_request(self, req: Req) -> None:
        if not req.eos_token_ids:
            req.eos_token_ids = self.eos_token_ids
        if req.lora_id and self.runner.lora_manager is not None:
            # pin for the eviction policy (released in _finish_req)
            self.runner.lora_manager.pin(req.lora_id)
        if self.hicache is not None and not req.is_embedding:
            # host-tier match + staging runs off-thread while the request
            # queues (ref hiradix_cache prefetch threads)
            self.hicache.prefetch(req.cache_ids)
        req.queue_time = time.time()
        req._epoch = 0
        req._device_seq_len = 0
        req._device_step = 0
        req._fill_len = 0
        req._seed = (
            req.sampling_params.sampling_seed
            if req.sampling_params.sampling_seed is not None
            else (hash(req.rid) ^ self.args.random_seed) & 0x7FFFFFFF
        )
        sp = req.sampling_params
        if sp.json_schema or sp.regex or sp.ebnf:
            if sp.json_schema:
                kind, spec = "json_schema", sp.json_schema
            elif sp.regex:
                kind, spec = "regex", sp.regex
            else:
                kind, spec = "ebnf", sp.ebnf
            req.grammar = self._get_grammar_backend().get_matcher(kind, spec)
        elif sp.structural_tag:
            # Structural tags (ref srt/constrained/ structural_tag): free
            # text until a structure's `begin` trigger is emitted, then the
            # content is schema-constrained through `end`, then free again.
            import json as _json
            import re as _re

            tag = (
                _json.loads(sp.structural_tag)
                if isinstance(sp.structural_tag, str)
                else sp.structural_tag
            )
            from sglang_tpu.constrained.json_schema import json_schema_to_regex

            structures = []
            for st_ in tag.get("structures", []):
                schema = st_.get("schema")
                pattern = st_.get("regex") or (
                    json_schema_to_regex(_json.dumps(schema)) if schema else ""
                )
                pattern = pattern + _re.escape(st_.get("end", ""))
                if pattern:
                    structures.append((st_["begin"], pattern))
            req._structag = structures or None
        if self.pd_mode == "decode" and getattr(req, "bootstrap_room", None):
            # KV is in flight from a prefill engine: park in the prealloc
            # queue; the step loop admits when the transfer completes.
            self.pd_prealloc[req.bootstrap_room] = req
            return
        self.waiting.append(req)

    def abort_request(self, rid: str) -> None:
        for room, req in list(self.pd_prealloc.items()):
            # parked PD-decode requests (KV never arrived — e.g. the
            # gateway's prefill dispatch failed) abort by rid too
            if req.rid == rid:
                del self.pd_prealloc[room]
                self._finish_req(req, FinishReason("abort"))
                return
        for req in self.waiting:
            if req.rid == rid:
                req.status = ReqStatus.ABORTED
                self.waiting.remove(req)
                return
        for req in self.running:
            if req.rid == rid:
                self._finish_req(req, FinishReason("abort"))
                return
        if self.chunked_req is not None and self.chunked_req.rid == rid:
            req = self.chunked_req
            self.chunked_req = None
            self._finish_req(req, FinishReason("abort"))

    def has_work(self) -> bool:
        return bool(
            self.waiting or self.running or self.chunked_req or self.pending
            or self.pd_prealloc
        )

    def step(self) -> List[StepOutput]:
        """Schedule + launch at most one batch; process due results."""
        if self.args.enable_invariant_check:
            self._invariant_counter = getattr(self, "_invariant_counter", 0) + 1
            if self._invariant_counter % self.args.enable_invariant_check == 0:
                from sglang_tpu.core.invariants import check_invariants

                errs = check_invariants(self)
                if errs:
                    raise AssertionError(
                        "KV invariant violations: " + "; ".join(errs[:4])
                    )
        admitted = self._pd_poll_admissions() if self.pd_prealloc else False
        launched = False if self.paused else self._schedule_and_launch()
        if (
            not launched
            and not admitted
            and not self.pending
            and self.pd_prealloc
        ):
            time.sleep(0.001)  # only waiting on in-flight KV; don't spin hot
        outputs: List[StepOutput] = []
        if self._early_outputs:
            outputs.extend(self._early_outputs)
            self._early_outputs = []
        if launched:
            # Keep at most pipeline_depth-1 batches in flight.
            while len(self.pending) >= self.pipeline_depth:
                outputs.extend(self._process_batch_result(self.pending.popleft()))
        elif self.pending:
            outputs.extend(self._process_batch_result(self.pending.popleft()))
        self._maybe_log()
        return outputs

    def flush_cache(self) -> bool:
        if self.running or self.waiting or self.chunked_req or self.pending:
            return False
        self.radix.reset()
        if self.state_ckpt is not None:
            self.state_ckpt.reset()
        self.allocator.clear()
        if self.hybrid_swa:
            self.swa_shadow.map.clear()
            self.swa_allocator.clear()
        self.slots.clear()
        self._resident = None
        if self.kv_events is not None:
            self._kv_blocks_published.clear()
            self.kv_events.all_blocks_cleared()
        return True

    # ------------------------------------------------------ batch scheduling
    def _schedule_and_launch(self) -> bool:
        if self._run_encode_batch():
            return True
        batch = self._get_prefill_batch()
        mode = ForwardMode.EXTEND
        num_prefill_seqs = -1
        if (
            batch is not None
            and self.mixed_enabled
            and self.drafter is None
            and self.draft_worker is None
            and self.pd_mode != "prefill"
        ):
            in_batch = {id(r.req) for r in batch[0]}
            dec = self._get_mixed_decode_rows(in_batch)
            if dec is not None:
                num_prefill_seqs = len(batch[0])
                batch = (batch[0] + dec[0], batch[1] + dec[1])
                mode = ForwardMode.MIXED
                self.num_mixed_steps += 1
                # A mixed step advances decode seq_lens outside the
                # resident state's device fb — it would replay stale
                # metadata; drop it (re-armed on the next pure decode).
                self._resident = None
        if batch is None and self.dllm is not None:
            # dLLM replaces token-by-token decode with block denoise
            # rounds (ref srt/dllm/mixin/scheduler.py).
            return self._try_dllm_round()
        if batch is None and (self.drafter is not None
                              or self.draft_worker is not None):
            if self._run_spec_verify_step():
                return True
            # fall through: rows needing the full sampler decode normally
        if batch is None:
            if self._try_resident_decode():
                return True
            batch = self._get_decode_batch()
            mode = ForwardMode.DECODE
        if batch is None:
            return False
        rows, seq_inputs = batch
        shared = getattr(self, "_decode_shared", None) if (
            mode == ForwardMode.DECODE
        ) else None
        fb = build_forward_batch(
            seq_inputs,
            self.page_size,
            mode,
            trash_slot=self.runner.trash_slot,
            shared_pages=shared[0] if shared else None,
            shared_len=shared[1] if shared else 0,
            num_prefill_seqs=num_prefill_seqs,
        )
        sp_list = [r.req.sampling_params for r in rows]
        seeds = [r.req._seed for r in rows]
        steps = [r.device_step for r in rows]
        st = build_sampling_tensors(sp_list, seeds, steps, fb.padded_bs)
        banned = self._build_banned_tokens(rows, fb.padded_bs)
        vocab_mask, has_grammar = self._build_vocab_mask(rows, fb.padded_bs)
        needs_penalty = any(r.req.sampling_params.needs_penalties for r in rows)
        if needs_penalty:
            self.runner.ensure_penalty_buf()
        any_top = max(
            (r.req.top_logprobs_num for r in rows if r.kind != "chunk"), default=0
        )
        if any_top:
            any_top = 20 if any_top <= 20 else any_top
        mm_pack = None
        if mode.is_extend() and any(
            r.req.mm_positions is not None and r.req.mm_embeds is not None
            for r in rows
        ):
            mm_pack = self._build_mm_pack(rows, seq_inputs, fb)
        lora_row_ids = None
        if self.runner.lora_manager is not None and any(
            r.req.lora_id for r in rows
        ):
            lora_row_ids = np.zeros(fb.padded_bs, np.int32)
            for i, r in enumerate(rows):
                lora_row_ids[i] = self.runner.lora_manager.slot_of(r.req.lora_id)
        all_greedy = all(
            r.req.sampling_params.is_greedy
            and not r.req.sampling_params.needs_penalties
            for r in rows
        )
        want_hidden = (
            mode == ForwardMode.EXTEND
            and getattr(self.draft_worker, "needs_hidden", False)
        )
        # API-level hidden-state capture (GenerateReqInput.
        # return_hidden_states): the step returns the full hidden tap and
        # each flagged row's last-token vector is fetched host-side.
        want_hidden_api = any(
            getattr(r.req, "return_hidden_states", False)
            and r.kind != "chunk" for r in rows
        )
        # Custom logit processors: one distinct processor per launch is
        # traced into the program; its rows are masked. Rows with a
        # DIFFERENT processor in the same batch are unsupported per step —
        # the scheduler keeps them apart (rare; reference groups by
        # processor the same way).
        clp_pack = None
        clp_procs = []
        for r in rows:
            proc = getattr(r.req, "custom_logit_processor", None)
            if proc is not None and all(p is not proc for p in clp_procs):
                clp_procs.append(proc)
        if clp_procs:
            entries = []
            for proc in clp_procs:
                mask = np.zeros(fb.padded_bs, bool)
                keys = set()
                for i, r in enumerate(rows):
                    if getattr(r.req, "custom_logit_processor",
                               None) is proc:
                        mask[i] = True
                        keys.update((r.req.sampling_params.custom_params
                                     or {}).keys())
                params = {k: np.zeros(fb.padded_bs, np.float32)
                          for k in sorted(keys)}
                for i, r in enumerate(rows):
                    if not mask[i]:
                        continue
                    for k, v in (r.req.sampling_params.custom_params
                                 or {}).items():
                        params[k][i] = float(v)
                entries.append((proc, mask, params))
            clp_pack = tuple(entries)
        dump_inputs = (
            self.dumper.snapshot(fb) if self.dumper is not None else None
        )
        out = self.runner.forward(
            fb, st, vocab_mask=vocab_mask, banned_tokens=banned,
            lora_row_ids=lora_row_ids, mm_pack=mm_pack,
            return_top_logprobs=any_top, all_greedy=all_greedy,
            return_hidden=want_hidden or want_hidden_api,
            custom_logit_pack=clp_pack,
        )
        if want_hidden and out.hidden is not None:
            # EAGLE prefill tap: the draft head consumes the target's
            # features for every prompt position as it is computed.
            seg = np.asarray(fb.cu_q_lens)
            entries = [
                (r.req, si.prefix_len, int(seg[i]), len(si.new_token_ids))
                for i, (r, si) in enumerate(zip(rows, seq_inputs))
            ]
            self.draft_worker.observe_and_extend(entries, out.hidden)
        self.pending.append(
            _PendingBatch(rows, out, mode, time.perf_counter(),
                          fb=dump_inputs,
                          hidden_idx=(np.asarray(fb.logits_indices)
                                      if want_hidden_api else None))
        )
        if self._pending_state_saves:
            # State-checkpoint saves queued by this batch's admission: the
            # device copies must be enqueued AFTER the forward that
            # computes the state being snapshotted (jit-stream order).
            self._flush_state_saves()
        # Structural-tag rows attach their grammar mid-stream (on trigger) —
        # keep them host-synced like grammar rows so no step launches
        # between the trigger token and the mask attach, and never arm the
        # resident loop for them.
        has_grammar = has_grammar or any(
            getattr(r.req, "_structag", None) and r.kind != "chunk"
            for r in rows
        )
        if (
            mode == ForwardMode.DECODE
            and self.resident_enabled
            and self.dumper is None  # dump mode snapshots every launch
            and not has_grammar
            and lora_row_ids is None
            and not want_hidden_api  # resident steps return no hidden tap
            and clp_pack is None  # clp rebuilds its pack every launch
        ):
            self._arm_resident(rows, fb, st, banned, any_top, all_greedy)
        else:
            self._resident = None
        if has_grammar:
            # Grammar FSM must advance on the sampled token before the next
            # mask can be built — no overlap for constrained batches
            # (ref: scheduler grammar sync, scheduler.py:1811-1841).
            while self.pending:
                self._early_outputs.extend(
                    self._process_batch_result(self.pending.popleft())
                )
        return True

    # ---- device-resident decode ----
    def _arm_resident(self, rows, fb, st, banned, any_top, all_greedy) -> None:
        """After a normal decode launch, capture its device fb/st so
        subsequent identical-composition steps run with zero host arrays."""
        ps = self.page_size
        steps = 1 << 30
        for r in rows:
            req = r.req
            sp = req.sampling_params
            steps = min(steps, len(req.pages) * ps - req._device_seq_len)
            steps = min(steps, sp.max_new_tokens - req._device_step)
            if sp.min_new_tokens > 0 and req._device_step < sp.min_new_tokens:
                # banned-token rows: the banned set changes once min_new is
                # reached -> force a rebuild at that boundary.
                steps = min(steps, sp.min_new_tokens - req._device_step)
        if steps <= 0:
            self._resident = None
            return
        self._resident = _ResidentState(
            reqs=[r.req for r in rows],
            epochs=[r.req._epoch for r in rows],
            fb=fb,
            st=st,
            banned=banned,
            top_logprobs=any_top,
            all_greedy=all_greedy,
            steps_left=steps,
        )

    def _try_resident_decode(self) -> bool:
        rs = self._resident
        if rs is None:
            return False
        cur = [
            r
            for r in self.running
            if r.status == ReqStatus.RUNNING
            and r._device_step < r.sampling_params.max_new_tokens
        ]
        if (
            rs.steps_left <= 0
            or len(cur) != len(rs.reqs)
            or any(a is not b for a, b in zip(cur, rs.reqs))
            or any(r._epoch != e for r, e in zip(cur, rs.epochs))
        ):
            self._resident = None
            return False
        rows = [_Row(r, "decode", r._epoch, r._device_step) for r in rs.reqs]
        out = self.runner.forward_resident(rs)
        for r in rs.reqs:
            r._device_seq_len += 1
            r._device_step += 1
        rs.steps_left -= 1
        self.pending.append(
            _PendingBatch(rows, out, ForwardMode.DECODE, time.perf_counter())
        )
        return True

    def _build_vocab_mask(self, rows: List[_Row], padded_bs: int):
        import jax.numpy as jnp

        has = any(
            r.req.grammar is not None and r.kind != "chunk" for r in rows
        )
        if not has:
            return None, False
        W = (self.runner.model_config.vocab_size + 31) // 32
        mask = np.full((padded_bs, W), 0xFFFFFFFF, np.uint32)
        for i, r in enumerate(rows):
            if r.req.grammar is not None and r.kind != "chunk":
                mask[i] = r.req.grammar.fill_vocab_mask()
        return jnp.asarray(mask), True

    def _build_mm_pack(self, rows, seq_inputs, fb):
        """[T, H] embedding buffer + mask for mm placeholder positions that
        fall inside this chunk."""
        import jax.numpy as jnp

        H = self.runner.model_config.hidden_size
        T = fb.padded_num_tokens
        embeds = np.zeros((T, H), np.float32)
        mask = np.zeros(T, np.bool_)
        seg = np.asarray(fb.cu_q_lens)
        for i, (row, si) in enumerate(zip(rows, seq_inputs)):
            req = row.req
            if req.mm_positions is None or req.mm_embeds is None:
                continue
            chunk_start = si.prefix_len
            chunk_end = chunk_start + len(si.new_token_ids)
            for j, pos in enumerate(req.mm_positions):
                if chunk_start <= pos < chunk_end:
                    t = int(seg[i]) + (pos - chunk_start)
                    embeds[t] = req.mm_embeds[j]
                    mask[t] = True
        return (jnp.asarray(embeds), jnp.asarray(mask))

    def _build_banned_tokens(self, rows: List[_Row], padded_bs: int):
        """(token_ids [B, K], biases [B, K]) pack: min_new_tokens bans
        (bias -1e30) and user logit_bias entries, applied on device.
        K is bucketed so batches with small bias sets share jit programs."""
        import jax.numpy as jnp

        per_row = []
        kmax = 0
        for r in rows:
            sp = r.req.sampling_params
            entries = []
            if sp.min_new_tokens > 0 and r.device_step < sp.min_new_tokens:
                banned = list(r.req.eos_token_ids) + list(sp.stop_token_ids or [])
                if sp.ignore_eos:
                    banned = list(sp.stop_token_ids or [])
                entries.extend((t, -1e30) for t in banned)
            if sp.logit_bias:
                entries.extend(
                    (int(t), float(b)) for t, b in sp.logit_bias.items()
                )
            per_row.append(entries)
            kmax = max(kmax, len(entries))
        if kmax == 0:
            return None
        K = max(MAX_BANNED_TOKENS, 1 << (kmax - 1).bit_length())
        idx = np.full((padded_bs, K), -1, np.int32)
        vals = np.zeros((padded_bs, K), np.float32)
        for i, entries in enumerate(per_row):
            for j, (t, b) in enumerate(entries[:K]):
                idx[i, j] = t
                vals[i, j] = b
        return (jnp.asarray(idx), jnp.asarray(vals))

    # ---- prefill admission ----
    def _get_prefill_batch(self):
        budget = self.args.chunked_prefill_size
        rows: List[_Row] = []
        seq_inputs: List[SeqInput] = []

        # Continue an in-flight chunked prefill first (exclusively).
        if self.chunked_req is not None:
            req = self.chunked_req
            q = min(req._fill_len - req.prefill_progress, budget)
            if not self._extend_pages(req, req.prefill_progress + q):
                self._evict_for(
                    cdiv(req.prefill_progress + q, self.page_size)
                    - len(req.pages)
                )
                if not self._extend_pages(req, req.prefill_progress + q):
                    return None  # wait for memory
            is_final = req.prefill_progress + q >= req._fill_len
            rows.append(
                _Row(req, "final" if is_final else "chunk", req._epoch,
                     req._device_step)
            )
            seq_inputs.append(
                SeqInput(
                    req.all_ids[req.prefill_progress : req.prefill_progress + q],
                    req.prefill_progress,
                    req.pages,
                    req_slot=req.req_slot if is_final else -1,
                    state_slot=req.req_slot,
                    swa_page_ids=req.swa_pages if self.hybrid_swa else None,
                    **self._mrope_args(
                        req, req.prefill_progress, req.prefill_progress + q
                    ),
                )
            )
            req.prefill_progress += q
            req._device_seq_len = req.prefill_progress
            self._cache_unfinished(req)
            if is_final:
                req._device_step += 1
                req._device_seq_len = req._fill_len  # last token KV pending
                self.chunked_req = None
                self.running.append(req)
                if self.state_ckpt is not None:
                    self._pending_state_saves.append(
                        (req, req.prefill_progress)
                    )
            return rows, seq_inputs

        if not self.waiting:
            return None
        if len(self.running) >= self.args.max_running_requests:
            return None

        self.policy.order(self.waiting)
        admitted: List[Req] = []
        for req in list(self.waiting):
            if len(self.running) + len(admitted) >= self.args.max_running_requests:
                break
            if budget <= 0:
                break
            slot = self.slots.alloc()
            if slot is None:
                break
            # Re-match against the CURRENT tree: earlier admissions in this
            # loop may have evicted pages referenced by the policy's match.
            mr = self.radix.match_prefix(req.cache_ids)
            if self.hicache is not None:
                mr = self._try_hicache_restore(req, mr)
            req._fill_len = len(req.all_ids)
            # Never match the entire input: the last token must be computed
            # to produce logits. Back off one page if fully cached.
            cached = min(mr.length, req._fill_len - 1)
            cached = (cached // self.page_size) * self.page_size
            cached = self._swa_clamp_match(mr, cached)
            # Recurrent models: page hits alone are unusable (the SSM state
            # at that position doesn't exist) — reuse happens only via a
            # state checkpoint, whose exact (unaligned) position becomes
            # the prefill start; its tail rows ride a copy-on-adopt page.
            ckpt = ckpt_tail_page = None
            if self.state_ckpt is not None:
                ckpt = self.state_ckpt.lookup(
                    mr, req.cache_ids, req._fill_len - 1
                )
                if ckpt is not None and ckpt.length > ckpt.aligned:
                    ckpt_tail_page = self.state_ckpt.adopt_tail(ckpt)
                    if ckpt_tail_page is None:
                        ckpt = None  # no page for the tail -> cold run
            if self.recurrent:
                cached = 0 if ckpt is None else ckpt.aligned
            start = cached if ckpt is None else ckpt.length
            npages_cached = cached // self.page_size
            req.cached_len = cached
            req.cached_report = start
            req.prefill_progress = start
            req.pages = list(mr.pages[:npages_cached])
            self._swa_adopt(req, mr, npages_cached)
            req.last_node = mr.node
            self.radix.inc_lock(mr.node)
            req.req_slot = slot
            if ckpt is not None:
                self.state_ckpt.restore(ckpt, slot)
                if ckpt_tail_page is not None:
                    req.pages.append(ckpt_tail_page)

            q = min(req._fill_len - start, budget)
            target = start + q
            if not self._extend_pages(req, target):
                self._evict_for(cdiv(target, self.page_size) - len(req.pages))
                if not self._extend_pages(req, target):
                    # out of memory — undo and stop admitting
                    self.radix.dec_lock(mr.node)
                    self.slots.free(slot)
                    req.req_slot = None
                    self._swa_release(req, False, 0, 0, 0)
                    if len(req.pages) > npages_cached:
                        # req-owned pages (the adopted checkpoint tail)
                        self.allocator.free(req.pages[npages_cached:])
                    req.pages = []
                    break
            is_final = target >= req._fill_len
            rows.append(
                _Row(
                    req,
                    "final" if is_final else "chunk",
                    req._epoch,
                    len(req.output_ids),  # retracted reqs resume mid-output
                )
            )
            seq_inputs.append(
                SeqInput(
                    req.all_ids[start:target],
                    start,
                    req.pages,
                    req_slot=req.req_slot if is_final else -1,
                    state_slot=req.req_slot,
                    swa_page_ids=req.swa_pages if self.hybrid_swa else None,
                    **self._mrope_args(req, start, target),
                )
            )
            req.prefill_progress = target
            req._device_seq_len = target
            self._cache_unfinished(req)
            if self.state_ckpt is not None and is_final:
                self._pending_state_saves.append((req, target))
            budget -= q
            self.num_prefill_tokens += q
            self.num_cached_tokens += start
            if getattr(req, "cross_kv", None) is not None:
                # Encoder-decoder: install cross-K/V at the (possibly new,
                # after retraction) slot. Kept on the req for re-admission.
                self.runner.write_cross_kv(req.req_slot, *req.cross_kv)
            admitted.append(req)
            req.status = ReqStatus.RUNNING
            req.start_time = time.time()
            if req.sampling_params.needs_penalties and req.output_ids:
                self.runner.seed_penalty_row(req.req_slot, req.output_ids)
            elif req.sampling_params.needs_penalties:
                self.runner.seed_penalty_row(req.req_slot, [])
            if not is_final:
                self.chunked_req = req
                break
            req._device_step = len(req.output_ids) + 1
        for req in admitted:
            self.waiting.remove(req)
            if req is not self.chunked_req:
                self.running.append(req)
        if not rows:
            # roll back anything? (nothing admitted)
            return None
        return rows, seq_inputs

    # ---- embedding (encode) batches ----
    def _run_encode_batch(self) -> bool:
        """Pooled-embedding forward for embedding requests (ref:
        srt/layers/pooler.py, engine.encode). Runs whole prompts (no
        chunking) in dedicated batches, synchronously."""
        embed_reqs = [r for r in self.waiting if r.is_embedding]
        if not embed_reqs:
            return False
        # /v1/score requests batch separately from plain embeddings (their
        # forward reads label-token probabilities, not pooled states).
        score_reqs = [r for r in embed_reqs
                      if getattr(r, "label_token_ids", None)]
        if score_reqs:
            embed_reqs = score_reqs
        else:
            embed_reqs = [r for r in embed_reqs
                          if not getattr(r, "label_token_ids", None)]
        batch = embed_reqs[: min(8, len(embed_reqs))]
        seq_inputs = []
        admitted = []
        for req in batch:
            need_pages = cdiv(len(req.input_ids), self.page_size)
            if not self._extend_pages(req, len(req.input_ids)):
                self._evict_for(need_pages)
                if not self._extend_pages(req, len(req.input_ids)):
                    break
            seq_inputs.append(SeqInput(
                req.input_ids, 0, req.pages, req_slot=-1,
                swa_page_ids=req.swa_pages if self.hybrid_swa else None,
            ))
            admitted.append(req)
        if not admitted:
            return False
        fb = build_forward_batch(
            seq_inputs, self.page_size, ForwardMode.EXTEND,
            trash_slot=self.runner.trash_slot,
        )
        if getattr(admitted[0], "label_token_ids", None):
            maxl = max(len(r.label_token_ids) for r in admitted)
            labels = np.zeros((len(admitted), maxl), np.int32)
            for i, r in enumerate(admitted):
                labels[i, : len(r.label_token_ids)] = r.label_token_ids
            pooled = np.asarray(self.runner.forward_score(fb, labels))
        else:
            pooled = np.asarray(self.runner.forward_encode(fb))
        for i, req in enumerate(admitted):
            self.waiting.remove(req)
            if getattr(req, "label_token_ids", None):
                req.embedding = pooled[i][: len(req.label_token_ids)].tolist()
            else:
                req.embedding = pooled[i].tolist()
            req.status = ReqStatus.FINISHED
            req.finish_reason = FinishReason("stop")
            self.allocator.free(req.pages)
            req.pages = []
            self._swa_release(req, False, 0, 0, 0)
            self._early_outputs.append(
                StepOutput(
                    rid=req.rid,
                    new_token=None,
                    finish_reason={"type": "stop"},
                    prompt_tokens=len(req.input_ids),
                    embedding=req.embedding,
                )
            )
        return True

    # ---- speculative verify (NGRAM) ----
    def _run_spec_verify_step(self) -> bool:
        """One target-verify step over drafted tokens for every running req.

        Ref: EAGLE/NGRAM verify (srt/speculative/eagle_worker_v2.py:1492,
        ngram_worker.py) recast as one ragged extend with greedy
        acceptance. Host-synced (pipeline depth 1).
        """
        from sglang_tpu.speculative.ngram import accept_drafts

        eligible = []
        for req in list(self.running):
            if req.status != ReqStatus.RUNNING:
                continue
            if req._device_step >= req.sampling_params.max_new_tokens:
                continue
            eligible.append(req)
        if not eligible:
            return False
        tree_capable = (
            self.draft_worker is not None
            and getattr(self.draft_worker, "is_tree", False)
            and not self.hybrid_swa  # compaction can't map SWA slots yet
            and self.runner.model_config.sliding_window is None
            # tree-verify attention has no window/sink terms yet
            and not getattr(self.runner.model, "has_attention_sinks", False)
            # forward_mla_extend applies a plain causal mask and never
            # consults fb.spec_tree_mask: tree levels would let sibling
            # (non-ancestor) nodes attend each other. MLA targets fall
            # back to chain verify until the MLA path honors tree masks.
            and not self.runner.kv_pool.config.mla_dim
        )
        can_spec = {
            r.rid: (
                # Tree verify supports rejection-sampled (non-greedy)
                # acceptance; chain verify is greedy-argmax only.
                (
                    r.sampling_params.is_greedy
                    or (tree_capable
                        and r.sampling_params.sampling_seed is None)
                )
                and r.grammar is None
                and not r.sampling_params.needs_penalties
                and not r.sampling_params.logit_bias
                and not getattr(r, "_structag", None)
                and not (
                    r.sampling_params.min_new_tokens > 0
                    and r._device_step < r.sampling_params.min_new_tokens
                )
            )
            for r in eligible
        }
        if not all(can_spec.values()):
            # Rows that need the full sampler machinery (penalties/
            # grammar/bias/min-new/seeded sampling) must decode through
            # the normal path; mixed batches skip spec.
            return False
        if tree_capable:
            return self._run_tree_verify_step(eligible)
        if self.draft_worker is not None:
            spec_reqs = [r for r in eligible if can_spec[r.rid]]
            draft_lists = (
                self.draft_worker.propose_all(spec_reqs) if spec_reqs else []
            )
            draft_map = {
                r.rid: d for r, d in zip(spec_reqs, draft_lists)
            }
        else:
            draft_map = {
                r.rid: self.drafter.propose(r.all_ids)
                for r in eligible
                if can_spec[r.rid]
            }

        rows = []
        seq_inputs = []
        for req in eligible:
            drafts = draft_map.get(req.rid, [])
            budget = req.sampling_params.max_new_tokens - req._device_step
            drafts = drafts[: max(budget - 1, 0)]
            inputs = [req.all_ids[-1]] + drafts
            prefix = req._device_seq_len
            if not self._extend_pages(req, prefix + len(inputs)):
                self._evict_for(cdiv(prefix + len(inputs), self.page_size)
                                - len(req.pages))
                if not self._extend_pages(req, prefix + len(inputs)):
                    self._retract_one()
                    if req.status != ReqStatus.RUNNING:
                        continue
                    if not self._extend_pages(req, prefix + len(inputs)):
                        continue
            rows.append((req, drafts, prefix))
            seq_inputs.append(
                SeqInput(inputs, prefix, req.pages, req_slot=req.req_slot,
                         swa_page_ids=req.swa_pages if self.hybrid_swa else None,
                         **self._mrope_args(req, prefix, prefix + len(inputs)))
            )
        if not rows:
            return False
        fb = build_forward_batch(
            seq_inputs, self.page_size, ForwardMode.EXTEND,
            trash_slot=self.runner.trash_slot, align=16,
        )
        tokens_dev, logprobs_dev, hidden_dev = self.runner.forward_verify(fb)
        tokens = np.asarray(tokens_dev)
        logprobs = np.asarray(logprobs_dev)
        seg = np.asarray(fb.cu_q_lens)

        slots, next_tokens = [], []
        observe_entries = []
        for i, (req, drafts, prefix) in enumerate(rows):
            start = int(seg[i])
            qlen = 1 + len(drafts)
            verified = tokens[start : start + qlen].tolist()
            emit, n_accept = accept_drafts(drafts, verified)
            self.num_spec_steps += 1
            self.num_spec_accepted += n_accept
            req._device_seq_len = req._device_seq_len + 1 + n_accept
            finished = False
            n_emitted = 0
            for j, tok in enumerate(emit):
                req.output_ids.append(tok)
                n_emitted += 1
                self.num_generated_tokens += 1
                if req.return_logprob:
                    req.output_logprobs.append(float(logprobs[start + j]))
                fr = req.check_finished(tok)
                if fr is None and (req.sampling_params.stop
                        or req.sampling_params.stop_regex):
                    fr = self._check_stop_strings(req)
                self._early_outputs.append(
                    StepOutput(
                        rid=req.rid,
                        new_token=tok,
                        finish_reason=fr.to_json() if fr else None,
                        logprob=(
                            float(logprobs[start + j])
                            if req.return_logprob else None
                        ),
                        completion_tokens=len(req.output_ids),
                        cached_tokens=req.cached_report,
                        prompt_tokens=len(req.input_ids),
                    )
                )
                if fr is not None:
                    self._finish_req(req, fr)
                    finished = True
                    break
            req._device_step = len(req.output_ids)
            req.spec_accepted_tokens += n_accept
            if not finished and emit:
                slots.append(req.req_slot)
                next_tokens.append(emit[-1])
                observe_entries.append((req, prefix, start, 1 + n_accept))
        if slots:
            self.runner.override_next_tokens(slots, next_tokens)
        if observe_entries and getattr(self.draft_worker, "needs_hidden",
                                       False):
            # EAGLE: catch the draft head's KV up over the accepted
            # positions using the target's features from this verify pass.
            self.draft_worker.observe_and_extend(observe_entries, hidden_dev)
        return True

    # ---- speculative tree verify (EAGLE top-k) ----
    def _run_tree_verify_step(self, eligible) -> bool:
        """One tree-verify round: top-k tree drafts -> ONE tree-masked
        target extend over R nodes per request -> greedy tree-walk
        acceptance -> KV compaction of the accepted path -> emission.

        Ref: eagle_worker_v2.py:489 (draft) / :1492 (verify) recast as
        data-driven tree masks on a fixed node count R (the jitted verify
        program is shared across rounds; the tree shape is data).
        """
        from sglang_tpu.speculative.tree import (
            accept_tree_greedy,
            chain_draft,
        )

        worker = self.draft_worker
        R = worker.tree_size
        drafts = worker.propose_tree(eligible)
        rows = []
        seq_inputs = []
        for req, tree in zip(eligible, drafts):
            if tree is None:
                tree = chain_draft([req.all_ids[-1]])
            tree = tree.padded(R)
            prefix = req._device_seq_len
            if not self._extend_pages(req, prefix + R):
                self._evict_for(
                    cdiv(prefix + R, self.page_size) - len(req.pages)
                )
                if not self._extend_pages(req, prefix + R):
                    self._retract_one()
                    if req.status != ReqStatus.RUNNING:
                        continue
                    if not self._extend_pages(req, prefix + R):
                        continue
            rows.append((req, tree, prefix))
            seq_inputs.append(
                SeqInput(
                    tree.tokens, prefix, req.pages, req_slot=req.req_slot,
                    custom_positions=(prefix + tree.depths).astype(np.int32),
                    tree_mask=tree.ancestor_mask(),
                )
            )
        if not rows:
            return False
        fb = build_forward_batch(
            seq_inputs, self.page_size, ForwardMode.EXTEND,
            trash_slot=self.runner.trash_slot, align=16,
        )
        seg_np = None
        any_sampled = any(
            not req.sampling_params.is_greedy for req, _, _ in rows
        )
        if any_sampled:
            # Rejection-sampled acceptance (exact for deterministic draft
            # proposals — speculative/tree.py accept_tree_sampled).
            from sglang_tpu.speculative.tree import (
                accept_tree_sampled,
                tree_children,
            )

            T = fb.padded_num_tokens
            Kc = max(int(getattr(worker, "topk", 1) or 1), 1)
            seg_np = np.asarray(fb.cu_q_lens)
            cand = np.full((T, Kc), -1, np.int32)
            temps = np.zeros(T, np.float32)
            top_ks = np.full(T, 1 << 30, np.int32)
            top_ps = np.ones(T, np.float32)
            min_ps = np.zeros(T, np.float32)
            chlists = []
            for i, (req, tree, prefix) in enumerate(rows):
                start = int(seg_np[i])
                sp = req.sampling_params
                ch = tree_children(tree)
                chlists.append(ch)
                for j in range(R):
                    row = start + j
                    temps[row] = sp.temperature
                    top_ks[row] = sp.top_k
                    top_ps[row] = sp.top_p
                    min_ps[row] = sp.min_p
                    for qi, c in enumerate(ch[j][:Kc]):
                        cand[row, qi] = tree.tokens[c]
            self._spec_rng_round = getattr(self, "_spec_rng_round", 0) + 1
            p_cand_d, fb_tok_d, fb_lp_d, hidden_dev = (
                self.runner.forward_verify_sampled(
                    fb, cand, temps, top_ks, top_ps, min_ps,
                    seed=(self.args.random_seed or 0) * 1000003
                    + self._spec_rng_round,
                )
            )
            p_cand = np.asarray(p_cand_d)
            fb_tok = np.asarray(fb_tok_d)
            fb_lp = np.asarray(fb_lp_d)
            host_rng = np.random.default_rng(
                (self.args.random_seed or 0) * 7919
                + self._spec_rng_round
            )
        else:
            tokens_dev, logprobs_dev, hidden_dev = (
                self.runner.forward_verify(fb)
            )
            tokens = np.asarray(tokens_dev)
            logprobs = np.asarray(logprobs_dev)
        seg = seg_np if seg_np is not None else np.asarray(fb.cu_q_lens)

        # Pass 1: acceptance + KV compaction moves (moves must land before
        # any page is cached into the radix tree by a finishing request).
        ps = self.page_size
        accepted = []
        move_src: List[int] = []
        move_dst: List[int] = []
        for i, (req, tree, prefix) in enumerate(rows):
            start = int(seg[i])
            if any_sampled:
                emit, path, lps = accept_tree_sampled(
                    tree,
                    p_cand[start:start + R],
                    fb_tok[start:start + R],
                    fb_lp[start:start + R],
                    host_rng.random,
                )
            else:
                emit, path = accept_tree_greedy(tree, tokens[start:start + R])
                src_nodes = [0] + path
                lps = [
                    float(logprobs[start + src_nodes[j]])
                    for j in range(len(emit))
                ]
            budget = req.sampling_params.max_new_tokens - req._device_step
            if len(emit) > budget:
                emit = emit[:budget]
                path = path[: max(budget - 1, 0)]
                lps = lps[:budget]
            accepted.append((emit, path, lps, start))
            for j, node in enumerate(path):
                if node == j + 1:
                    continue  # already in place (chain-prefix of the tree)
                src_pos = prefix + node
                dst_pos = prefix + 1 + j
                move_src.append(
                    req.pages[src_pos // ps] * ps + src_pos % ps
                )
                move_dst.append(
                    req.pages[dst_pos // ps] * ps + dst_pos % ps
                )
        if move_src:
            self.runner.move_kv_rows(
                np.asarray(move_src, np.int32), np.asarray(move_dst, np.int32)
            )

        # Pass 2: emission, finish handling, draft catch-up.
        slots, next_tokens = [], []
        observe_entries = []
        for (req, tree, prefix), (emit, path, lps, start) in zip(
            rows, accepted
        ):
            n_accept = len(path)
            self.num_spec_steps += 1
            self.num_spec_accepted += n_accept
            req._device_seq_len = prefix + 1 + n_accept
            src_nodes = [0] + path  # emit[j] was produced at src_nodes[j]
            finished = False
            for j, tok in enumerate(emit):
                req.output_ids.append(tok)
                self.num_generated_tokens += 1
                lp = lps[j]
                if req.return_logprob:
                    req.output_logprobs.append(lp)
                fr = req.check_finished(tok)
                if fr is None and (req.sampling_params.stop
                                   or req.sampling_params.stop_regex):
                    fr = self._check_stop_strings(req)
                self._early_outputs.append(
                    StepOutput(
                        rid=req.rid,
                        new_token=tok,
                        finish_reason=fr.to_json() if fr else None,
                        logprob=lp if req.return_logprob else None,
                        completion_tokens=len(req.output_ids),
                        cached_tokens=req.cached_report,
                        prompt_tokens=len(req.input_ids),
                    )
                )
                if fr is not None:
                    self._finish_req(req, fr)
                    finished = True
                    break
            req._device_step = len(req.output_ids)
            req.spec_accepted_tokens += n_accept
            if not finished and emit:
                slots.append(req.req_slot)
                next_tokens.append(emit[-1])
                observe_entries.append(
                    (req, prefix,
                     np.asarray([start + n for n in src_nodes], np.int32),
                     1 + n_accept)
                )
        if slots:
            self.runner.override_next_tokens(slots, next_tokens)
        if observe_entries and getattr(worker, "needs_hidden", False):
            worker.observe_and_extend(observe_entries, hidden_dev)
        return True

    # ---- dLLM block denoising ----
    def _try_dllm_round(self) -> bool:
        """One denoise round over every running dLLM request (ref
        srt/dllm/algorithm/base.py _run_sync, recast as a scheduler
        round): forward the current blocks through the tree-verify extend
        program (all-ones intra-block mask = bidirectional attention over
        the block, causal over the prefix), then let the algorithm unmask
        positions. A block that was complete ON ENTRY was just forwarded
        with its final ids — its KV is final — so it is emitted and the
        next block armed."""
        L = self.dllm.block_size
        rows, seq_inputs = [], []
        for req in list(self.running):
            block = getattr(req, "_dllm_block", None)
            if block is None or req.finished():
                continue
            prefix = len(req.all_ids)
            if cdiv(prefix + L, self.page_size) > len(req.pages):
                if not self._extend_pages(req, prefix + L):
                    self._retract_one()
                    if req.status != ReqStatus.RUNNING:
                        continue
                    if not self._extend_pages(req, prefix + L):
                        continue
            rows.append((req, prefix))
            seq_inputs.append(SeqInput(
                block.tolist(), prefix, req.pages, req_slot=req.req_slot,
                custom_positions=(prefix + np.arange(L)).astype(np.int32),
                tree_mask=np.ones((L, L), np.bool_),
            ))
        if not rows:
            return False
        fb = build_forward_batch(
            seq_inputs, self.page_size, ForwardMode.EXTEND,
            trash_slot=self.runner.trash_slot, align=16,
        )
        tokens_dev, logprobs_dev, _ = self.runner.forward_verify(fb)
        tokens = np.asarray(tokens_dev)
        conf = np.exp(np.asarray(logprobs_dev, np.float64))
        seg = np.asarray(fb.cu_q_lens)
        self.num_dllm_rounds += 1
        for i, (req, prefix) in enumerate(rows):
            start = int(seg[i])
            block = req._dllm_block
            new_block, done_entry = self.dllm.step(
                block, tokens[start:start + L], conf[start:start + L]
            )
            if not done_entry:
                req._dllm_block = new_block.astype(np.int32)
                continue
            # Emit the completed block (its KV was just rewritten from
            # the final ids by this round's forward).
            finished = False
            emitted = 0
            for tok in block.tolist():
                req.output_ids.append(int(tok))
                self.num_generated_tokens += 1
                emitted += 1
                fr = req.check_finished(int(tok))
                if fr is None and (req.sampling_params.stop
                                   or req.sampling_params.stop_regex):
                    fr = self._check_stop_strings(req)
                self._early_outputs.append(StepOutput(
                    rid=req.rid,
                    new_token=int(tok),
                    finish_reason=fr.to_json() if fr else None,
                    completion_tokens=len(req.output_ids),
                    cached_tokens=req.cached_report,
                    prompt_tokens=len(req.input_ids),
                ))
                if fr is not None:
                    self._finish_req(req, fr)
                    finished = True
                    break
            req._device_seq_len = prefix + emitted
            req._device_step = len(req.output_ids)
            if not finished:
                req._dllm_block = np.full(L, self.dllm.mask_id, np.int32)
        return True

    # ---- decode ----
    def _get_mixed_decode_rows(self, exclude_ids):
        """Decode rows to append to a prefill batch (MIXED mode).

        Like _get_decode_batch but conservative: no cascade (the builder's
        shared-prefix position shift is batch-global) and no retraction
        (victims could be rows of the extend region being launched) — a
        row that cannot get its next page simply sits this step out."""
        if not self.running:
            return None
        rows: List[_Row] = []
        seq_inputs: List[SeqInput] = []
        for req in self.running:
            if id(req) in exclude_ids or req.status != ReqStatus.RUNNING:
                continue
            if req._device_step >= req.sampling_params.max_new_tokens:
                continue
            pos = req._device_seq_len
            if not self._extend_pages(req, pos + 1):
                self._evict_for(1)
                if not self._extend_pages(req, pos + 1):
                    continue
            pages_np = getattr(req, "_pages_np", None)
            if pages_np is None or len(pages_np) != len(req.pages):
                pages_np = np.asarray(req.pages, np.int32)
                req._pages_np = pages_np
            seq_inputs.append(
                SeqInput([0], pos, req.pages, req_slot=req.req_slot,
                         pages_np=pages_np,
                         swa_page_ids=(req.swa_pages if self.hybrid_swa
                                       else None),
                         mrope_delta=req.mrope_delta)
            )
            rows.append(_Row(req, "decode", req._epoch, req._device_step))
            req._device_seq_len = pos + 1
            req._device_step += 1
        return (rows, seq_inputs) if rows else None

    def _get_decode_batch(self):
        self._decode_shared = None
        if not self.running:
            return None
        eligible: List[Req] = []
        for req in list(self.running):
            if req.status != ReqStatus.RUNNING:
                continue  # retracted earlier in this same loop
            # Don't run steps we already know are beyond max_new_tokens.
            if req._device_step >= req.sampling_params.max_new_tokens:
                continue
            pos = req._device_seq_len
            if not self._extend_pages(req, pos + 1):
                self._evict_for(1)
                if not self._extend_pages(req, pos + 1):
                    self._retract_one()
                    if req.status != ReqStatus.RUNNING or req not in self.running:
                        continue
                    if not self._extend_pages(req, pos + 1):
                        continue
            if self.resident_enabled:
                # Best-effort page runway so the resident loop can run
                # decode_runway steps before the next host rebuild.
                self._extend_pages(req, pos + 1 + self.decode_runway)
            pages_np = getattr(req, "_pages_np", None)
            if pages_np is None or len(pages_np) != len(req.pages):
                pages_np = np.asarray(req.pages, np.int32)
                req._pages_np = pages_np
            eligible.append(req)
        if not eligible:
            return None

        # Cascade: longest common page prefix across the batch (pages are
        # radix-deduped, so equal page ids <=> identical token prefix).
        shared_tokens = 0
        if self.cascade_enabled and len(eligible) >= 2:
            first = eligible[0]._pages_np
            s = len(first)
            for req in eligible[1:]:
                p = req._pages_np
                m = min(s, len(p))
                eq = first[:m] == p[:m]
                s = int(np.argmin(eq)) if not eq.all() else m
                if s == 0:
                    break
            # Every row's new token must land in the suffix page table:
            # shared tokens <= every row's current context length.
            min_sl = min(r._device_seq_len for r in eligible)
            s = min(s, min_sl // self.page_size)
            if s > 0:
                shared_tokens = s * self.page_size
                self._decode_shared = (first[:s], shared_tokens)

        rows: List[_Row] = []
        seq_inputs: List[SeqInput] = []
        for req in eligible:
            pos = req._device_seq_len
            if shared_tokens:
                s = shared_tokens // self.page_size
                seq_inputs.append(
                    SeqInput([0], pos - shared_tokens, req.pages[s:],
                             req_slot=req.req_slot,
                             pages_np=req._pages_np[s:],
                             mrope_delta=req.mrope_delta)
                )
            else:
                seq_inputs.append(
                    SeqInput([0], pos, req.pages, req_slot=req.req_slot,
                             pages_np=req._pages_np,
                             swa_page_ids=(req.swa_pages if self.hybrid_swa
                                           else None),
                             mrope_delta=req.mrope_delta)
                )
            rows.append(_Row(req, "decode", req._epoch, req._device_step))
            req._device_seq_len = pos + 1
            req._device_step += 1
        return rows, seq_inputs

    def _try_hicache_restore(self, req, mr):
        """Promote a longer host-tier prefix hit into the device tree.

        Ref: HiRadixCache prefetch/write-through (srt/mem_cache/
        hiradix_cache.py)."""
        ps = self.page_size
        staged = None
        pf = self.hicache.take_prefetch(req.cache_ids)
        if pf is not None:
            hlen, staged = pf
        else:
            hlen, hpages = self.hicache.match_prefix(req.cache_ids)
        if hlen <= mr.length:
            return mr
        extra_pages = (hlen - mr.length) // ps
        start = mr.length // ps
        pages = self.allocator.alloc(extra_pages, start_idx=start)
        if pages is None:
            self._evict_for(extra_pages)
            pages = self.allocator.alloc(extra_pages, start_idx=start)
            if pages is None:
                return mr
        if staged is not None:
            self.hicache.load_prefix_staged(staged[start:], pages)
        else:
            self.hicache.load_prefix(hpages[start:], pages)
        self.radix.insert(req.cache_ids[:hlen], mr.pages + pages)
        return self.radix.match_prefix(req.cache_ids)

    def _maybe_attach_structag(self, req: Req) -> None:
        """Attach a schema grammar when the decoded tail ends with a
        structure's `begin` trigger (tokens may split the trigger, so we
        test the decoded suffix, like stop strings)."""
        if self.tokenizer is None or not req.output_ids:
            return
        max_beg = max(len(b) for b, _ in req._structag)
        tail = self.tokenizer.decode(req.output_ids[-(max_beg + 16):])
        for begin, pattern in req._structag:
            if tail.endswith(begin):
                req.grammar = self._get_grammar_backend().get_matcher(
                    "regex", pattern
                )
                return

    # ---- KV events ----
    def _kv_insert_event(self, tokens_aligned) -> None:
        if self.kv_events is None:
            return
        from sglang_tpu.observability.kv_events import block_hashes

        hashes = block_hashes(tokens_aligned, self.page_size)
        new = [
            (i, h) for i, h in enumerate(hashes)
            if h not in self._kv_blocks_published
        ]
        if not new:
            return
        first = new[0][0]
        parent = hashes[first - 1] if first > 0 else None
        self.kv_events.block_stored(
            [h for _, h in new],
            list(tokens_aligned[first * self.page_size:]),
            parent,
        )
        self._kv_blocks_published.update(h for _, h in new)

    def _kv_evict_event(self, full_prefix, pages) -> None:
        from sglang_tpu.observability.kv_events import block_hashes

        hashes = block_hashes(full_prefix, self.page_size)
        removed = hashes[len(hashes) - len(pages):]
        self.kv_events.block_removed(removed)
        self._kv_blocks_published.difference_update(removed)

    def _cache_unfinished(self, req: Req) -> None:
        """Insert the already-computed prefix of a RUNNING request into the
        radix tree (ref cache_unfinished_req, srt/mem_cache/radix_cache.py).

        This is what lets concurrently-admitted same-prefix requests share
        pages (instead of only matching prefixes of FINISHED requests), which
        in turn feeds cascade decode attention and skips duplicate prefill.
        If the tree already holds different pages for a range we computed,
        adopt the tree's pages and free our duplicates — the in-flight step
        that wrote ours is ordered before any later reuse on the device
        stream, so the swap is safe."""
        if self.radix.disable:
            return
        ps = self.page_size
        aligned = (req.prefill_progress // ps) * ps
        if aligned <= req.cached_len:
            return
        npages = aligned // ps
        self.radix.insert(req.cache_ids[:aligned], req.pages[:npages])
        self._kv_insert_event(req.cache_ids[:aligned])
        if self.hicache is not None:
            # write-through policies store at insert time (the pages'
            # content is complete: inserts follow the forward that wrote
            # them); write_back ignores this hook.
            self.hicache.on_insert(
                req.cache_ids[:aligned], req.pages[:npages]
            )
        mr = self.radix.match_prefix(req.cache_ids[:aligned])
        mlen = min(mr.length, aligned)
        mpages = mlen // ps
        own_start = req.cached_len // ps
        dup = [
            p
            for p, tp in zip(req.pages[own_start:mpages],
                             mr.pages[own_start:mpages])
            if p != tp
        ]
        req.pages[:mpages] = list(mr.pages[:mpages])
        if dup:
            self.allocator.free(dup)
        if req.last_node is not None:
            self.radix.dec_lock(req.last_node)
        req.last_node = mr.node
        self.radix.inc_lock(mr.node)
        req.cached_len = mlen
        req._pages_np = None

    # ---- recurrent-state checkpoints (mem/state_ckpt.py) ----
    def _flush_state_saves(self) -> None:
        """Anchor queued checkpoints (called right after batch dispatch so
        the device row copies land after the forward that computed them)."""
        from sglang_tpu.mem.state_ckpt import _node_end

        saves, self._pending_state_saves = self._pending_state_saves, []
        for req, length in saves:
            aligned = (length // self.page_size) * self.page_size
            node = req.last_node
            if (
                aligned <= 0
                or node is None
                or req.req_slot is None
                or _node_end(node) != aligned  # boundary moved (split race)
            ):
                continue
            self.state_ckpt.save(
                node,
                req.req_slot,
                aligned,
                length,
                req.cache_ids[aligned:length],
                req.pages[aligned // self.page_size]
                if length > aligned and len(req.pages) > aligned // self.page_size
                else None,
            )

    def _try_finish_state_save(self, req: Req, kv_len: int) -> None:
        """Snapshot a FINISHING request's state (multi-turn reuse: the next
        turn's prompt extends this conversation). Skipped whenever a
        dispatched-but-unprocessed step might still advance the state row
        (its donated update would race the snapshot)."""
        from sglang_tpu.mem.state_ckpt import _node_end

        if self._resident is not None:
            return  # device-side decode loop may step the slot invisibly
        for pb in self.pending:
            if any(row.req is req for row in pb.rows):
                return
        aligned = (kv_len // self.page_size) * self.page_size
        if aligned <= 0 or req.req_slot is None:
            return
        mr = self.radix.match_prefix(req.cache_ids[:aligned])
        if mr.length != aligned or _node_end(mr.node) != aligned:
            return
        self.state_ckpt.save(
            mr.node,
            req.req_slot,
            aligned,
            kv_len,
            req.cache_ids[aligned:kv_len],
            req.pages[aligned // self.page_size]
            if kv_len > aligned and len(req.pages) > aligned // self.page_size
            else None,
        )

    # ---- memory helpers ----
    def _extend_pages(self, req: Req, target_tokens: int) -> bool:
        need = cdiv(target_tokens, self.page_size) - len(req.pages)
        if need <= 0:
            return True
        pages = self.allocator.alloc(need, start_idx=len(req.pages))
        if pages is None:
            return False
        if self.hybrid_swa:
            sp = self._swa_alloc(need)
            if sp is None:
                self.allocator.free(pages)
                return False
            req.swa_pages.extend(sp)
        req.pages.extend(pages)
        return True

    def _swa_alloc(self, need: int):
        sp = self.swa_allocator.alloc(need)
        if sp is None:
            # Shadows are droppable cache: shed unreferenced ones first.
            self.swa_shadow.drop_unreferenced(
                need - self.swa_allocator.available_pages()
            )
            sp = self.swa_allocator.alloc(need)
        return sp

    def _swa_trim(self, req: Req) -> None:
        """Free req-owned SWA pages that fell out of the sliding window
        (one page of margin covers the in-flight overlap step)."""
        if not self.hybrid_swa:
            return
        keep_from = (
            max(0, req._device_seq_len - self.swa_window) // self.page_size - 1
        )
        end = min(keep_from, len(req.swa_pages))
        j = req._swa_trim_ptr
        freed = []
        while j < end:
            if j >= req.swa_adopted and req.swa_pages[j]:
                freed.append(req.swa_pages[j])
                req.swa_pages[j] = 0
            j += 1
        req._swa_trim_ptr = max(req._swa_trim_ptr, end)
        if freed:
            self.swa_allocator.free(freed)

    def _swa_clamp_match(self, mr, cached: int) -> int:
        """Usable radix match for hybrid-SWA models: the window before the
        match point must be fully shadowed, else no reuse (the page-granular
        analog of tombstone-limited matching, swa_radix_cache.py)."""
        if not self.hybrid_swa or cached <= 0:
            return cached
        ps = self.page_size
        lo = max(0, cached - self.swa_window) // ps
        hi = cdiv(cached, ps)
        for j in range(lo, hi):
            if self.swa_shadow.lookup(mr.pages[j]) is None:
                return 0
        return cached

    def _swa_adopt(self, req: Req, mr, npages_cached: int) -> None:
        """Fill req.swa_pages for the matched prefix from tree shadows
        (pinning them); slots before the window carry 0 (trash, masked)."""
        if not self.hybrid_swa:
            return
        ps = self.page_size
        cached = npages_cached * ps
        lo = max(0, cached - self.swa_window) // ps
        req.swa_pages = [0] * npages_cached
        req.swa_adopted = npages_cached
        req.swa_adopted_full_pages = []
        req._swa_trim_ptr = 0
        for j in range(lo, npages_cached):
            fp = mr.pages[j]
            sp = self.swa_shadow.adopt(fp)
            if sp is not None:
                req.swa_pages[j] = sp
                req.swa_adopted_full_pages.append(fp)

    def _swa_release(self, req: Req, cache: bool, dup_from: int,
                     dup_to: int, aligned: int) -> None:
        """Release a request's SWA pages: unpin adopted shadows, hand the
        trailing window of a cached insert to the shadow registry, free the
        rest. Slots in [dup_from, dup_to) hold the req's duplicate full
        pages (the tree kept pre-existing ones), so their shadow key would
        dangle — skip them. Everywhere else req.pages[j] IS the tree page
        (rewritten by _cache_unfinished / owned-then-inserted)."""
        if not self.hybrid_swa:
            return
        ps = self.page_size
        for fp in req.swa_adopted_full_pages:
            self.swa_shadow.release(fp)
        handoff = set()
        if cache and aligned > 0:
            win_lo = max(0, aligned - self.swa_window) // ps
            handoff = {
                j
                for j in range(win_lo, aligned // ps)
                if not (dup_from <= j < dup_to)
            }
        freed = []
        for j in range(req.swa_adopted, len(req.swa_pages)):
            sp = req.swa_pages[j]
            if not sp:
                continue
            if j in handoff:
                self.swa_shadow.register(req.pages[j], sp)
            else:
                freed.append(sp)
        if freed:
            self.swa_allocator.free(freed)
        req.swa_pages = []
        req.swa_adopted = 0
        req.swa_adopted_full_pages = []
        req._swa_trim_ptr = 0

    def _evict_for(self, num_pages: int) -> int:
        if num_pages <= 0:
            return 0
        got = self.radix.evict(num_pages)
        # Checkpoints lock their anchor nodes; under real pressure drop
        # LRU checkpoints (unlocking subtrees + freeing tail pages) and
        # retry — requests always outrank cached state.
        while got < num_pages and self.state_ckpt is not None:
            freed = self.allocator.available_pages()
            if not self.state_ckpt.release_lru(1):
                break
            got += self.allocator.available_pages() - freed  # tail page
            got += self.radix.evict(num_pages - got)
        return got

    def _retract_one(self) -> Optional[Req]:
        """Kick the newest running request back to the waiting queue."""
        victims = [r for r in self.running if r.status == ReqStatus.RUNNING]
        if len(victims) <= 1:
            return None
        # Lowest priority first; newest within a priority class.
        victim = max(
            victims, key=lambda r: (-getattr(r, "priority", 0), r.arrival_time)
        )
        self._release_req_memory(victim, cache=False)
        victim.status = ReqStatus.WAITING
        victim._epoch += 1
        victim.prefill_progress = 0
        victim.cached_len = 0
        victim._device_seq_len = 0
        victim._device_step = len(victim.output_ids)
        # PD prefill: resend KV from page 0 after re-prefill (the
        # receive-side assembler overwrites by start_page).
        victim._pd_sent_pages = 0
        self.running.remove(victim)
        self.waiting.insert(0, victim)
        logger.info("retracted %s (memory pressure)", victim.rid)
        return victim

    def _release_req_memory(self, req: Req, cache: bool) -> None:
        if self.draft_worker is not None:
            self.draft_worker.release(req.rid)
        ps = self.page_size
        if req.last_node is not None:
            self.radix.dec_lock(req.last_node)
            req.last_node = None
        own_start = req.cached_len // ps  # pages owned by req (not tree)
        if cache and not self.radix.disable and req._device_seq_len > 0:
            kv_len = min(req._device_seq_len, len(req.all_ids))
            aligned = (kv_len // ps) * ps
            npages = aligned // ps
            if aligned > 0:
                matched = self.radix.insert(
                    req.cache_ids[:aligned], req.pages[:npages]
                )
                self._kv_insert_event(req.cache_ids[:aligned])
                if self.state_ckpt is not None:
                    # before the tail pages are freed below — the tail copy
                    # (if taken) is enqueued on the device stream first
                    self._try_finish_state_save(req, kv_len)
                # free our duplicates in [cached_len, matched) and the tail
                dup = req.pages[own_start : matched // ps]
                tail = req.pages[npages:]
                self._swa_release(req, True, own_start, matched // ps, aligned)
                if dup:
                    self.allocator.free(dup)
                if tail:
                    self.allocator.free(tail)
            else:
                self._swa_release(req, False, 0, 0, 0)
                self.allocator.free(req.pages[own_start:])
        else:
            self._swa_release(req, False, 0, 0, 0)
            self.allocator.free(req.pages[own_start:])
        req.pages = []
        if req.req_slot is not None:
            self.slots.free(req.req_slot)
            req.req_slot = None

    def _finish_req(self, req: Req, reason: FinishReason) -> None:
        if req.lora_id and self.runner.lora_manager is not None:
            # release the eviction-policy pin taken at admission
            self.runner.lora_manager.unpin(req.lora_id)
        req.finish_reason = reason
        req.status = (
            ReqStatus.ABORTED if reason.kind == "abort" else ReqStatus.FINISHED
        )
        if req in self.running:
            self.running.remove(req)
        if (
            self.drafter is not None
            and reason.kind != "abort"
            and hasattr(self.drafter, "observe")
        ):
            # Feed the finished sequence into the global ngram corpus so
            # later requests draft from it (ref ngram asyncInsert).
            self.drafter.observe(req.all_ids)
        self._release_req_memory(req, cache=True)

    # --------------------------------------------------------- result path
    def _process_batch_result(self, pb: _PendingBatch) -> List[StepOutput]:
        if self.dumper is not None and pb.fb is not None:
            self.dumper.dump_batch(pb.fb, pb.out)
        tokens = np.asarray(pb.out.next_tokens)
        logprobs = np.asarray(pb.out.chosen_logprobs)
        top_v = (
            np.asarray(pb.out.top_logprob_vals)
            if pb.out.top_logprob_vals is not None
            else None
        )
        top_i = (
            np.asarray(pb.out.top_logprob_ids)
            if pb.out.top_logprob_ids is not None
            else None
        )
        hid = (
            np.asarray(pb.out.hidden)
            if pb.hidden_idx is not None and pb.out.hidden is not None
            else None
        )
        outputs: List[StepOutput] = []
        for i, row in enumerate(pb.rows):
            req = row.req
            if row.kind == "chunk":
                if (
                    self.pd_mode == "prefill"
                    and self.kv_sender is not None
                    and req._epoch == row.epoch
                    and not req.finished()
                ):
                    # Early-chunk send (ref scheduler.py:3598-3601): ship
                    # the pages this chunk completed while the remaining
                    # prefill chunks still compute.
                    self._pd_send_ready_pages(req)
                continue
            if req._epoch != row.epoch or req.finished():
                continue  # stale (retracted or finished during overlap)
            if row.device_step != len(req.output_ids):
                continue  # phantom overlap step beyond a finish; drop
            if self.dllm is not None and row.kind == "final":
                # dLLM: the prefill's AR-sampled token is meaningless for
                # a diffusion LM — arm the first denoise block instead.
                req._dllm_block = np.full(
                    self.dllm.block_size, self.dllm.mask_id, np.int32
                )
                continue
            token = int(tokens[i])
            if self.token_oracle:
                token = oracle_next_token(
                    req.all_ids, self.runner.model_config.vocab_size
                )
                self.runner.override_next_tokens([req.req_slot], [token])
            req.output_ids.append(token)
            self.num_generated_tokens += 1
            self._swa_trim(req)
            if req.grammar is not None:
                req.grammar.accept_token(token)
                if getattr(req, "_structag", None) and (
                    req.grammar.compiled.dfa.is_accepting(req.grammar.state)
                ):
                    # structural tag completed (schema + end emitted):
                    # back to unconstrained text until the next trigger.
                    req.grammar = None
            elif getattr(req, "_structag", None):
                self._maybe_attach_structag(req)
            if req.return_logprob:
                req.output_logprobs.append(float(logprobs[i]))
                if req.top_logprobs_num and top_v is not None:
                    k = req.top_logprobs_num
                    req.output_top_logprobs.append(
                        (top_v[i, :k].tolist(), top_i[i, :k].tolist())
                    )
            if self.pd_mode == "prefill" and row.kind == "final":
                self._pd_handoff(req, token, float(logprobs[i]))
                fr = FinishReason("stop")
                self._finish_req(req, fr)
                outputs.append(
                    StepOutput(
                        rid=req.rid, new_token=token,
                        finish_reason=fr.to_json(),
                        completion_tokens=1,
                        cached_tokens=req.cached_report,
                        prompt_tokens=len(req.input_ids),
                    )
                )
                continue
            fr = req.check_finished(token)
            if fr is None and (req.sampling_params.stop
                        or req.sampling_params.stop_regex):
                fr = self._check_stop_strings(req)
            if fr is not None:
                self._finish_req(req, fr)
            outputs.append(
                StepOutput(
                    rid=req.rid,
                    new_token=token,
                    finish_reason=fr.to_json() if fr else None,
                    logprob=float(logprobs[i]) if req.return_logprob else None,
                    top_logprobs=(
                        req.output_top_logprobs[-1]
                        if req.return_logprob and req.top_logprobs_num
                        else None
                    ),
                    completion_tokens=len(req.output_ids),
                    cached_tokens=req.cached_report,
                    prompt_tokens=len(req.input_ids),
                    hidden_state=(
                        np.asarray(
                            hid[int(pb.hidden_idx[i])], np.float32
                        ).tolist()
                        if hid is not None
                        and getattr(req, "return_hidden_states", False)
                        else None
                    ),
                )
            )
            if (
                fr is None
                and req.grammar is not None
                and not req.grammar.is_terminated()
                and not self.args.disable_jump_forward
            ):
                self._try_jump_forward(req, outputs)
        return outputs

    def _try_jump_forward(self, req: Req, outputs: List[StepOutput]) -> None:
        """Jump-forward decoding: emit grammar-forced token runs without
        model calls, then requeue the req for a re-extend over the forced
        tokens (its prior KV survives via the radix tree). Ref:
        srt/constrained/outlines_jump_forward.py + scheduler integration.
        """
        budget = req.sampling_params.max_new_tokens - len(req.output_ids)
        forced = req.grammar.jump_forward_tokens(budget)
        if not forced:
            return
        fr = None
        for tok in forced:
            req.output_ids.append(tok)
            self.num_generated_tokens += 1
            self.num_jump_tokens += 1
            fr = req.check_finished(tok)
            if fr is None and (req.sampling_params.stop
                               or req.sampling_params.stop_regex):
                fr = self._check_stop_strings(req)
            outputs.append(
                StepOutput(
                    rid=req.rid,
                    new_token=tok,
                    finish_reason=fr.to_json() if fr else None,
                    completion_tokens=len(req.output_ids),
                    cached_tokens=req.cached_report,
                    prompt_tokens=len(req.input_ids),
                )
            )
            if fr is not None:
                break
        if getattr(req, "_structag", None) and req.grammar.compiled.dfa.is_accepting(
            req.grammar.state
        ):
            req.grammar = None
        if fr is not None:
            self._finish_req(req, fr)
            return
        # Self-retract: KV computed so far re-enters via the radix match,
        # and the forced tokens get their KV in the re-extend pass.
        self._release_req_memory(req, cache=True)
        req.status = ReqStatus.WAITING
        req._epoch += 1
        req.prefill_progress = 0
        req.cached_len = 0
        req._device_seq_len = 0
        req._device_step = len(req.output_ids)
        req._pd_sent_pages = 0
        self.running.remove(req)
        self.waiting.insert(0, req)



    def attach_mm_inputs(self, req: Req, mm_inputs) -> None:
        """Encode images (ViT under jit, mm-hash cached) and attach the
        embedding-injection fields + mrope positions to the request."""
        model = self.runner.model
        if getattr(model, "is_encoder_decoder", False):
            # Whisper-class ASR: the encoder output becomes per-request
            # cross-attention K/V (models/whisper.py), installed at the
            # request's slot on admission — no placeholder expansion. The
            # radix key for position 0 is salted with the audio hash so
            # different audios never share decoder-KV prefixes.
            mi = mm_inputs[0]
            h = mi["mm_hash"]
            ckv = self.mm_embed_cache.get(("xkv", h))
            if ckv is None:
                ckv = self.runner.encode_cross_kv(mi["pixel_values"])
                self.mm_embed_cache[("xkv", h)] = ckv
                while len(self.mm_embed_cache) > self.mm_cache_max:
                    self.mm_embed_cache.popitem(last=False)
            else:
                self.mm_embed_cache.move_to_end(("xkv", h))
                self.mm_cache_hits += 1
            req.cross_kv = ckv
            req.mm_positions = [0]
            req.mm_embeds = None
            req.mm_hashes = [h]
            return
        hidden = self.runner.model_config.hidden_size
        positions: List[int] = []
        embeds: List[np.ndarray] = []
        hashes: List[int] = []
        grids = []
        for mi in mm_inputs:
            h = mi["mm_hash"]
            emb = self.mm_embed_cache.get(h)
            if emb is None:
                emb = np.asarray(
                    model.encode_images(
                        self.runner.params,
                        mi["pixel_values"],
                        grid_thw=mi.get("grid_thw"),
                    ),
                    np.float32,
                ).reshape(-1, hidden)
                self.mm_embed_cache[h] = emb
                while len(self.mm_embed_cache) > self.mm_cache_max:
                    self.mm_embed_cache.popitem(last=False)
            else:
                self.mm_embed_cache.move_to_end(h)
                self.mm_cache_hits += 1
            evs_mask = None
            if (mi.get("modality") == "video"
                    and float(mi.get("evs_q") or 0.0) > 0.0):
                # EVS video token pruning (multimodal/evs.py): keep the
                # top-(1-q) temporally dissimilar merged tokens; the
                # placeholder span was pre-shrunk to the retained count.
                from sglang_tpu.multimodal.evs import compute_retention_mask

                evs_mask = compute_retention_mask(
                    emb, mi["grid_thw"],
                    getattr(model, "mm_merge", 2), float(mi["evs_q"]),
                )
                emb_sel = emb[evs_mask]
            else:
                emb_sel = emb
            off = mi["offset"]
            n = mi["num_tokens"]
            for j in range(n):
                positions.append(off + j)
                embeds.append(emb_sel[j])
                hashes.append(h)
            if mi.get("grid_thw") is not None:
                grids.append((tuple(mi["grid_thw"]), evs_mask))
        req.mm_positions = positions
        req.mm_embeds = embeds
        req.mm_hashes = hashes
        if getattr(model, "needs_mrope", False) and grids:
            from sglang_tpu.models.qwen2_vl import compute_mrope_positions

            mm_tokens = {model.image_token_id}
            vt = getattr(model, "video_token_id", None)
            if vt is not None:
                mm_tokens.add(vt)
            req.mrope_positions, req.mrope_delta = compute_mrope_positions(
                req.input_ids, mm_tokens, grids,
                merge=model.mm_merge,
            )

    def _mrope_args(self, req, a: int, b: int) -> dict:
        """SeqInput mrope kwargs for new tokens [a, b) of req (Qwen2-VL;
        generated tokens past the prompt fall back to position+delta)."""
        mp = req.mrope_positions
        if mp is None:
            return {"mrope_delta": req.mrope_delta} if req.mrope_delta else {}
        L = mp.shape[1]
        if b <= L:
            return {"mrope_positions": mp[:, a:b],
                    "mrope_delta": req.mrope_delta}
        out = np.empty((3, b - a), np.int32)
        head = max(L - a, 0)
        if head:
            out[:, :head] = mp[:, a:L]
        out[:, head:] = np.arange(max(a, L), b, dtype=np.int32) + req.mrope_delta
        return {"mrope_positions": out, "mrope_delta": req.mrope_delta}

    def _pd_send_ready_pages(
        self,
        req: Req,
        final: bool = False,
        first_token: int = -1,
        logprob: Optional[float] = None,
    ) -> None:
        """Ship newly completed KV pages as a KVChunk (ref early-chunk
        send, scheduler.py:3598-3601). Mid-prefill only FULL pages go;
        the final call sends the remainder plus the first token.

        The gather's np.asarray waits for the chunk's launched program
        (the pool handles it reads are that program's outputs), so bytes
        on the wire are always post-write."""
        from sglang_tpu.disaggregation.base import KVChunk

        ps = self.page_size
        sent = getattr(req, "_pd_sent_pages", 0)
        fill = len(req.input_ids)
        target = cdiv(fill, ps) if final else (req.prefill_progress // ps)
        if target <= sent and not final:
            return
        swa_bytes = None
        if target > sent:
            kv_bytes = self._pd_codec.gather_bytes(
                self.runner.kv_pool.kv,
                np.asarray(req.pages[sent:target], np.int32),
            )
            if self._pd_swa_codec is not None:
                # 0 slots (trimmed / pre-window) gather the trash page —
                # garbage bytes the decode side masks by the window.
                swa_bytes = self._pd_swa_codec.gather_bytes(
                    self.runner.kv_pool.kv,
                    np.asarray(req.swa_pages[sent:target], np.int32),
                )
        else:  # final with nothing new (page-aligned fill already sent)
            kv_bytes = np.zeros(
                (0, len(self._pd_codec.layer_ids),
                 self._pd_codec.page_bytes), np.uint8,
            )
            if self._pd_swa_codec is not None:
                swa_bytes = np.zeros(
                    (0, len(self._pd_swa_codec.layer_ids),
                     self._pd_swa_codec.page_bytes), np.uint8,
                )
        req._pd_sent_pages = target
        self.kv_sender.send(
            KVChunk(
                room=getattr(req, "bootstrap_room", req.rid),
                start_page=sent,
                kv_pages=kv_bytes,
                swa_pages=swa_bytes,
                is_last=final,
                token_ids=list(req.input_ids) if final else None,
                first_token=first_token,
                first_logprob=logprob,
            )
        )

    def _pd_handoff(self, req: Req, first_token: int, logprob: float) -> None:
        """Ship the finished prefill's remaining KV pages + first token."""
        self._pd_send_ready_pages(
            req, final=True, first_token=first_token, logprob=logprob
        )

    def _pd_poll_admissions(self) -> bool:
        """Decode-side auto-admission loop (ref DisaggDecodePreallocQueue
        polling, srt/disaggregation/decode.py): admit every parked request
        whose KV transfer has completed."""
        if self.kv_receiver is None or not self.pd_prealloc:
            return False
        admitted = False
        for room in list(self.pd_prealloc):
            if len(self.running) >= self.args.max_running_requests:
                break
            handoff = self.kv_receiver.poll(room)
            if handoff is None:
                continue
            req = self.pd_prealloc.pop(room)
            self._admit_prebuilt(req, handoff)
            # The first token was sampled on the PREFILL engine and rode
            # the handoff; this engine's stream must still deliver it
            # (the gateway's client only talks to the decode side).
            self._early_outputs.append(StepOutput(
                rid=req.rid,
                new_token=handoff.first_token,
                finish_reason=None,
                logprob=handoff.first_logprob,
                completion_tokens=1,
                cached_tokens=req.cached_len,
                prompt_tokens=len(req.input_ids),
            ))
            admitted = True
        return admitted

    def _admit_prebuilt(self, req: Req, handoff) -> Req:
        """Restore a handoff's KV into freshly allocated pages and resume
        `req` directly in RUNNING (ForwardMode.PREBUILT analog, ref
        scheduler.py:3594)."""
        import jax.numpy as jnp

        if self.hybrid_swa and getattr(handoff, "swa_pages", None) is None:
            raise ValueError(
                "decode engine has hybrid SWA pools but the handoff "
                "carries no swa_pages (prefill side older or non-SWA?)"
            )
        ps = self.page_size
        if handoff.token_ids and list(req.input_ids) != list(handoff.token_ids):
            logger.warning(
                "PD room %s: decode-side prompt differs from handoff tokens; "
                "using the handoff's", handoff.room,
            )
            req.input_ids = list(handoff.token_ids)
        fill = len(handoff.token_ids)
        npages = cdiv(fill + 1, ps)
        kv_npages = handoff.kv_pages.shape[0]
        pages = self.allocator.alloc(npages)
        if pages is None:
            self._evict_for(npages)
            pages = self.allocator.alloc(npages)
            if pages is None:
                raise RuntimeError("decode engine out of KV pages")
        K = kv_npages
        new_kv = self._pd_codec.scatter_bytes(
            self.runner.kv_pool.kv, handoff.kv_pages, pages[:K]
        )
        swa_pages_alloc = None
        if self._pd_swa_codec is not None:
            swa_pages_alloc = self._swa_alloc(npages)
            if swa_pages_alloc is None:
                raise RuntimeError("decode engine out of SWA pages")
            new_kv = self._pd_swa_codec.scatter_bytes(
                new_kv, handoff.swa_pages, swa_pages_alloc[:K]
            )
        self.runner.kv_pool.swap(new_kv)

        req.output_ids = [handoff.first_token]
        if req.return_logprob and handoff.first_logprob is not None:
            req.output_logprobs = [handoff.first_logprob]
        req.status = ReqStatus.RUNNING
        req.pages = pages
        if swa_pages_alloc is not None:
            # out-of-window slots hold restored garbage; the window mask
            # hides them and _swa_trim frees them on the next steps.
            req.swa_pages = list(swa_pages_alloc)
            req.swa_adopted = 0
            req._swa_trim_ptr = 0
        req.cached_len = (fill // ps) * ps
        req.prefill_progress = fill
        req._fill_len = fill
        req._device_seq_len = fill
        req._device_step = 1
        req.req_slot = self.slots.alloc()
        self.runner.override_next_tokens([req.req_slot], [handoff.first_token])
        self.running.append(req)
        return req

    def add_prebuilt_request(self, handoff, sampling_params, rid=None) -> Req:
        """Decode-side admission of a PD handoff by explicit call (tests,
        external orchestrators); serving uses the auto-admission loop."""
        req = Req(rid or handoff.room, handoff.token_ids, sampling_params)
        self.add_request(req)
        if req in self.waiting:
            self.waiting.remove(req)
        self.pd_prealloc.pop(getattr(req, "bootstrap_room", None), None)
        return self._admit_prebuilt(req, handoff)

    def _check_stop_strings(self, req: Req) -> Optional[FinishReason]:
        if self.tokenizer is None:
            return None
        sp = req.sampling_params
        max_stop = max((len(s) for s in sp.stop), default=0)
        if sp.stop_regex:
            max_stop = max(max_stop, 64)
        tail_tokens = req.output_ids[-(max_stop + 16) :]
        text = self.tokenizer.decode(tail_tokens)
        for s in sp.stop:
            if s in text:
                return FinishReason("stop", matched_str=s)
        if sp.stop_regex:
            import re

            pat = getattr(req, "_stop_regex_c", None)
            if pat is None:
                pat = re.compile(sp.stop_regex)
                req._stop_regex_c = pat
            m = pat.search(text)
            if m:
                return FinishReason("stop", matched_str=m.group(0))
        return None

    def _maybe_log(self) -> None:
        now = time.time()
        t0, n0 = self._tp_last
        if now - t0 > 2.0:
            self.gen_throughput = (self.num_generated_tokens - n0) / (now - t0)
            self._tp_last = (now, self.num_generated_tokens)
        if now - self.last_log > 10:
            self.last_log = now
            logger.info(
                "running=%d waiting=%d gen_tokens=%d free_pages=%d radix_pages=%d",
                len(self.running),
                len(self.waiting),
                self.num_generated_tokens,
                self.allocator.available_pages(),
                self.radix.total_cached_pages(),
            )
