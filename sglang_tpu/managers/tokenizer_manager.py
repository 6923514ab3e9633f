"""TokenizerManager: async request hub in the API-server process.

Ref: srt/managers/tokenizer_manager.py (generate_request:765,
_tokenize_one_request:998, _send_one_request:1561, handle_loop:2215).
Tokenizes, ships requests to the scheduler over ZMQ, and awaits
detokenized outputs; also owns the control-plane RPCs (flush/health/
server-info/weight-update).
"""

from __future__ import annotations

import asyncio
import dataclasses
import pickle

import numpy as np
import logging
import time
from collections import deque
from typing import Any, AsyncGenerator, Dict, List, Optional

import zmq
import zmq.asyncio

from sglang_tpu.managers import zmq_utils
from sglang_tpu.managers.io_struct import (
    AbortReq,
    ReleaseMemoryReq,
    ReleaseMemoryResp,
    ResumeMemoryReq,
    ResumeMemoryResp,
    BatchStrOut,
    FlushCacheReq,
    FlushCacheResp,
    GenerateReqInput,
    GetServerInfoReq,
    GetServerInfoResp,
    HealthCheckReq,
    HealthCheckResp,
    SchedulerReady,
    TokenizedGenerateReqInput,
    UpdateWeightsReq,
    UpdateWeightsResp,
)
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ReqState:
    rid: str
    queue: asyncio.Queue
    text: str = ""
    output_ids: List[Any] = dataclasses.field(default_factory=list)
    logprobs: List[float] = dataclasses.field(default_factory=list)
    top_logprobs: List[Any] = dataclasses.field(default_factory=list)
    hidden_states: List[Any] = dataclasses.field(default_factory=list)
    finished: bool = False
    created: float = dataclasses.field(default_factory=time.time)
    last_token_time: float = 0.0


class TokenizerManager:
    def __init__(self, server_args: ServerArgs, port_args):
        self.server_args = server_args
        self.port_args = port_args
        if server_args.skip_tokenizer_init:
            self.tokenizer = None
        else:
            from sglang_tpu.tokenizer import get_tokenizer

            self.tokenizer = get_tokenizer(
                server_args.tokenizer_path, server_args.trust_remote_code
            )
        ctx = zmq_utils.get_ctx(port_args.tokenizer_ipc)
        actx = zmq.asyncio.Context.shadow(ctx.underlying)
        self.recv_sock = actx.socket(zmq.PULL)
        self.recv_sock.set_hwm(0)
        self.recv_sock.bind(port_args.tokenizer_ipc)
        self.send_sock = actx.socket(zmq.PUSH)
        self.send_sock.set_hwm(0)
        self.send_sock.connect(port_args.scheduler_ipc)

        self.rid_to_state: Dict[str, ReqState] = {}
        self.metrics = None  # TokenizerMetrics, set when --enable-metrics
        # Sessions: multi-turn context with BRANCHING (ref srt/session/
        # session_controller.py) — session_params {id, rid, offset,
        # replace, drop_previous_output} fork the turn tree; KV reuse
        # across branches comes from the radix cache automatically.
        from sglang_tpu.managers.session import Session

        self.sessions: Dict[str, Session] = {}
        self._control_waiters: Dict[type, deque] = {}
        self.ready = asyncio.Event()
        # Multi-tokenizer analog (ref --tokenizer-worker-num, srt/managers/
        # multi_tokenizer_mixin.py): HF fast tokenizers release the GIL, so
        # a thread pool parallelizes CPU tokenization instead of N processes
        # and keeps long-prompt encodes off the event loop.
        from concurrent.futures import ThreadPoolExecutor

        self._tok_pool = ThreadPoolExecutor(
            max_workers=max(1, server_args.tokenizer_worker_num),
            thread_name_prefix="tokenizer",
        )
        self.scheduler_info: Dict[str, Any] = {}
        self._handle_task: Optional[asyncio.Task] = None
        # Multimodal processor (lazy; ref srt/multimodal/processors).
        self._mm_processor = None
        self._mm_cfg = None

    def _get_mm(self):
        if self._mm_cfg is None:
            from transformers import AutoConfig

            from sglang_tpu.multimodal.processors import get_mm_processor

            cfg = AutoConfig.from_pretrained(
                self.server_args.model_path,
                trust_remote_code=self.server_args.trust_remote_code,
            )
            proc = get_mm_processor(
                list(getattr(cfg, "architectures", []) or []), cfg
            )
            self._mm_cfg = (cfg, proc)
        return self._mm_cfg

    def _process_images(self, gri, input_ids):
        """Expand image placeholders and build mm_inputs payloads.

        The chat template leaves ONE image token per image; each expands to
        the processor's per-image token count. Ref: srt/multimodal/
        processors/base_processor.py placeholder expansion."""
        from sglang_tpu.multimodal.processors import load_image

        cfg, proc = self._get_mm()
        if proc is None:
            raise ValueError(
                f"model {self.server_args.model_path} has no mm processor"
            )
        is_audio = getattr(proc, "modality", "image") == "audio"
        if is_audio:
            mm_tok = getattr(cfg, "audio_token_id",
                             getattr(cfg, "audio_token_index", None))
            items = gri.audio_data if gri.audio_data is not None \
                else gri.image_data
        else:
            mm_tok = getattr(cfg, "image_token_id",
                             getattr(cfg, "image_token_index", None))
            items = gri.image_data
        if items is not None and not isinstance(items, list):
            items = [items]
        if getattr(proc, "encoder_decoder", False):
            # Whisper-class ASR: the prompt is the DECODER start sequence
            # (ref srt/entrypoints/openai/serving_transcription.py builds
            # it via HF get_decoder_prompt_ids); the audio bypasses token
            # expansion and becomes cross-attention context.
            pr = proc(items[0])
            out_ids = self._whisper_decoder_prompt(gri)
            return out_ids, [dict(
                pixel_values=pr.features,
                grid_thw=None,
                mm_hash=pr.mm_hash,
                num_tokens=0,
                offset=0,
            )]
        if is_audio:
            processed = [proc(d) for d in items]
            payloads = [dict(
                pixel_values=pr.features,
                grid_thw=(pr.num_frames,),
                mm_hash=pr.mm_hash,
                num_tokens=pr.num_tokens,
            ) for pr in processed]
        else:
            processed = [proc(load_image(d)) for d in (items or [])]
            payloads = [dict(
                pixel_values=pr.pixel_values,
                grid_thw=pr.grid_thw,
                mm_hash=pr.mm_hash,
                num_tokens=pr.num_tokens,
            ) for pr in processed]
        # Video items expand through their own placeholder token; EVS
        # token pruning shrinks the placeholder span to the RETAINED
        # count before scheduling (ref srt/multimodal/evs/evs_core.py
        # tokens_per_frame — counts are deterministic pre-encode even
        # though the retention MASK needs the ViT embeddings).
        video_payloads = []
        video_tok = getattr(cfg, "video_token_id", None)
        if getattr(gri, "video_data", None) is not None and not is_audio:
            from sglang_tpu.multimodal.processors import load_video

            if not getattr(proc, "supports_video", False):
                raise ValueError(
                    f"model {self.server_args.model_path} does not "
                    "support video input"
                )
            vids = gri.video_data
            if not isinstance(vids, list) or (
                vids and not isinstance(vids[0], (list, dict, str))
                and not hasattr(vids[0], "ndim")
            ):
                vids = [vids]
            q = float(getattr(self.server_args,
                              "evs_video_pruning_rate", 0.0) or 0.0)
            for v in vids:
                pr = proc.process_video(load_video(v))
                num_tokens = pr.num_tokens
                if q > 0.0:
                    from sglang_tpu.multimodal.evs import (
                        compute_retained_tokens_count,
                    )

                    t = pr.grid_thw[0]
                    num_tokens = compute_retained_tokens_count(
                        tokens_per_frame=pr.num_tokens // t,
                        num_frames=t, q=q,
                    )
                video_payloads.append(dict(
                    pixel_values=pr.pixel_values,
                    grid_thw=pr.grid_thw,
                    mm_hash=pr.mm_hash,
                    num_tokens=num_tokens,
                    modality="video",
                    evs_q=q,
                ))
        out_ids: List[int] = []
        mm_inputs = []
        mm_i = 0
        vid_i = 0
        for tok in input_ids:
            if tok == mm_tok and mm_i < len(payloads):
                pl = dict(payloads[mm_i])
                mm_i += 1
            elif (video_tok is not None and tok == video_tok
                  and vid_i < len(video_payloads)):
                pl = dict(video_payloads[vid_i])
                vid_i += 1
                tok = video_tok
            else:
                out_ids.append(tok)
                continue
            pl["offset"] = len(out_ids)
            mm_inputs.append(pl)
            out_ids.extend([tok] * pl["num_tokens"])
        if mm_i != len(payloads):
            kind = "audios" if is_audio else "images"
            raise ValueError(
                f"{len(payloads)} {kind} but only {mm_i} placeholder tokens "
                "in the prompt"
            )
        if vid_i != len(video_payloads):
            raise ValueError(
                f"{len(video_payloads)} videos but only {vid_i} video "
                "placeholder tokens in the prompt"
            )
        return out_ids, mm_inputs

    def _whisper_decoder_prompt(self, gri) -> List[int]:
        """[<|startoftranscript|>, <|lang|>, <|task|>, <|notimestamps|>] —
        HF WhisperTokenizer.get_decoder_prompt_ids semantics. Language
        comes from a 'Language: xx.' hint in the request text (the audio
        endpoints append it); task=translate when the text asks for
        translation; defaults: en / transcribe."""
        import re as _re

        tok = self.tokenizer
        tid = tok.convert_tokens_to_ids
        text = gri.text if isinstance(gri.text, str) else ""
        lang = "en"
        m = _re.search(r"[Ll]anguage:\s*([a-z]{2,3})", text)
        if m:
            lang = m.group(1)
        task = "translate" if "ranslate" in text else "transcribe"
        unk = getattr(tok, "unk_token_id", None)
        ids = []
        for t in (
            "<|startoftranscript|>", f"<|{lang}|>", f"<|{task}|>",
            "<|notimestamps|>",
        ):
            i = tid(t)
            if i is not None and i != unk:
                ids.append(int(i))
        if not ids:  # pathological tokenizer: fall back to BOS
            ids = [int(getattr(tok, "bos_token_id", 0) or 0)]
        return ids

    # ------------------------------------------------------------- lifecycle
    def start(self) -> None:
        if self._handle_task is None:
            self._handle_task = asyncio.get_event_loop().create_task(
                self.handle_loop()
            )

    async def wait_ready(self, timeout: float = 600) -> None:
        self.start()
        await asyncio.wait_for(self.ready.wait(), timeout)

    async def handle_loop(self) -> None:
        while True:
            data = await self.recv_sock.recv()
            msg = pickle.loads(data)
            if isinstance(msg, BatchStrOut):
                self._handle_batch_output(msg)
            elif isinstance(msg, SchedulerReady):
                self.scheduler_info = msg.info
                self.ready.set()
            else:
                waiters = self._control_waiters.get(type(msg))
                if waiters:
                    fut = waiters.popleft()
                    if not fut.done():
                        fut.set_result(msg)
                else:
                    logger.warning("unexpected message %r", type(msg))

    def _handle_batch_output(self, msg: BatchStrOut) -> None:
        for i, rid in enumerate(msg.rids):
            st = self.rid_to_state.get(rid)
            if st is None:
                continue
            st.text += msg.delta_texts[i]
            st.output_ids.extend(msg.output_ids[i])
            if msg.logprobs[i] is not None:
                st.logprobs.append(msg.logprobs[i])
            if msg.top_logprobs[i] is not None:
                st.top_logprobs.append(msg.top_logprobs[i])
            hs = getattr(msg, "hidden_states", None)
            if hs and hs[i] is not None:
                st.hidden_states.append(hs[i])
            fr = msg.finish_reasons[i]
            if fr is not None:
                st.finished = True
            if self.metrics is not None:
                now = time.time()
                if st.last_token_time == 0.0:
                    self.metrics.ttft.observe(now - st.created)
                else:
                    self.metrics.itl.observe(now - st.last_token_time)
                st.last_token_time = now
                if fr is not None:
                    self.metrics.e2e.observe(now - st.created)
                    self.metrics.num_requests_total.inc()
            st.queue.put_nowait(
                dict(
                    delta=msg.delta_texts[i],
                    finish_reason=fr,
                    completion_tokens=msg.completion_tokens[i],
                    cached_tokens=msg.cached_tokens[i],
                    prompt_tokens=msg.prompt_tokens[i],
                    embedding=msg.embeddings[i],
                )
            )

    # ------------------------------------------------------------ generation
    def _tokenize(self, gri: GenerateReqInput) -> List[int]:
        if gri.input_ids is not None:
            return list(gri.input_ids)
        if getattr(gri, "input_embeds", None) is not None:
            # Placeholder ids; the embeddings replace them on device.
            return [0] * len(gri.input_embeds)
        if self.tokenizer is None:
            raise ValueError("tokenizer disabled; pass input_ids")
        return self.tokenizer.encode(gri.text)

    def _to_tokenized(self, gri: GenerateReqInput) -> TokenizedGenerateReqInput:
        sp_dict = dict(gri.sampling_params or {})
        if getattr(gri, "is_embedding", False):
            sp_dict = {"max_new_tokens": 0, "temperature": 0.0}
        sp = SamplingParams(**sp_dict)
        sp.normalize()
        input_ids = self._tokenize(gri)
        mm_inputs = None
        if (getattr(gri, "image_data", None) is not None
                or getattr(gri, "audio_data", None) is not None
                or getattr(gri, "video_data", None) is not None):
            input_ids, mm_inputs = self._process_images(gri, input_ids)
        ctx_limit = self.server_args.context_length
        if ctx_limit and len(input_ids) >= ctx_limit:
            raise ValueError(
                f"prompt ({len(input_ids)} tokens) exceeds context length "
                f"{ctx_limit}"
            )
        return TokenizedGenerateReqInput(
            rid=gri.rid,
            input_ids=input_ids,
            sampling_params=sp,
            return_logprob=bool(gri.return_logprob),
            top_logprobs_num=int(gri.top_logprobs_num or 0),
            return_hidden_states=bool(
                getattr(gri, "return_hidden_states", False)),
            custom_logit_processor=getattr(
                gri, "custom_logit_processor", None),
            stream=gri.stream,
            lora_path=gri.lora_path,
            priority=int(getattr(gri, "priority", 0) or 0),
            is_embedding=bool(getattr(gri, "is_embedding", False)),
            input_embeds=(
                np.asarray(gri.input_embeds, np.float32)
                if getattr(gri, "input_embeds", None) is not None else None
            ),
            mm_inputs=mm_inputs,
            label_token_ids=getattr(gri, "label_token_ids", None),
            bootstrap_room=getattr(gri, "bootstrap_room", None),
        )

    async def generate_request(
        self, gri: GenerateReqInput
    ) -> AsyncGenerator[Dict[str, Any], None]:
        """Yields cumulative output dicts; final one carries finish_reason.

        n>1 parallel sampling fans each prompt out into n independent
        requests (ref tokenizer_manager batch expansion); the radix cache
        shares the common prompt KV. Each yielded dict carries "index".
        """
        await self.wait_ready()
        singles: List[GenerateReqInput] = []
        for g in gri.normalize():
            sp = g.sampling_params if isinstance(g.sampling_params, dict) else {}
            n = int((sp or {}).get("n") or 1)
            if n <= 1 or g.is_embedding:
                singles.append(g)
                continue
            for i in range(n):
                c = dataclasses.replace(
                    g,
                    sampling_params=dict(sp, n=1),
                    rid=g.rid if i == 0 else f"{g.rid}-n{i}",
                )
                seed = c.sampling_params.get("sampling_seed")
                if seed is not None:
                    c.sampling_params["sampling_seed"] = int(seed) + i
                singles.append(c)
        if len(singles) == 1:
            async for out in self._generate_one(singles[0]):
                out["index"] = 0
                yield out
            return
        if gri.stream:
            # Merged stream: deltas from all sub-requests interleave as they
            # arrive, tagged with their choice index.
            queue: asyncio.Queue = asyncio.Queue()

            async def pump(i: int, g: GenerateReqInput):
                try:
                    async for out in self._generate_one(g):
                        out["index"] = i
                        await queue.put(out)
                except Exception as e:  # noqa: BLE001
                    await queue.put(e)

            tasks = [
                asyncio.get_running_loop().create_task(pump(i, g))
                for i, g in enumerate(singles)
            ]
            remaining = len(singles)
            try:
                while remaining:
                    item = await queue.get()
                    if isinstance(item, Exception):
                        raise item
                    if item["meta_info"]["finish_reason"] is not None:
                        remaining -= 1
                    yield item
            finally:
                for t in tasks:
                    t.cancel()
            return

        # Non-stream batch: run concurrently, yield per-item finals in order.
        async def collect(g):
            last = None
            async for out in self._generate_one(g):
                last = out
            return last

        results = await asyncio.gather(*(collect(g) for g in singles))
        for i, r in enumerate(results):
            if r is not None:
                r["index"] = i
            yield r

    async def _generate_one(self, gri: GenerateReqInput):
        from sglang_tpu.plugins import REGISTRY as _plugins

        if _plugins._request_hooks:
            _plugins.fire_request(gri)
        treq = await asyncio.get_running_loop().run_in_executor(
            self._tok_pool, self._to_tokenized, gri
        )
        sess_params = gri.session_params or {}
        session_id = sess_params.get("id")
        sess = parent_node = None
        if session_id is not None:
            sess = self.sessions.get(session_id)
            if sess is None:
                raise ValueError(f"unknown session {session_id!r}")
            parent_node = sess.resolve_parent(sess_params.get("rid"))
            if sess_params.get("replace"):
                # fork-and-replace: abort the parent's other descendants
                for dead_rid in sess.prune_children(parent_node):
                    if dead_rid in self.rid_to_state:
                        await self.abort_request(dead_rid)
            ctx = sess.context(
                parent_node,
                offset=sess_params.get("offset"),
                drop_previous_output=bool(
                    sess_params.get("drop_previous_output")
                ),
            )
            treq.input_ids = ctx + treq.input_ids
            sess.add_turn(treq.rid, parent_node, treq.input_ids)
        state = ReqState(rid=treq.rid, queue=asyncio.Queue())
        self.rid_to_state[treq.rid] = state
        await self.send_sock.send(pickle.dumps(treq, protocol=5))
        try:
            while True:
                try:
                    item = await asyncio.wait_for(state.queue.get(), timeout=300)
                except asyncio.TimeoutError:
                    raise RuntimeError(f"request {treq.rid} timed out")
                out = self._build_output(gri, treq, state, item)
                if gri.stream or item["finish_reason"] is not None:
                    yield out
                if item["finish_reason"] is not None:
                    if sess is not None:
                        sess.commit(treq.rid, state.output_ids)
                    return
        finally:
            self.rid_to_state.pop(treq.rid, None)
            if sess is not None and treq.rid in sess.nodes \
                    and not sess.nodes[treq.rid].committed:
                sess.drop_uncommitted(treq.rid)

    def _build_output(self, gri, treq, state: ReqState, item) -> Dict[str, Any]:
        meta = {
            "id": treq.rid,
            "finish_reason": item["finish_reason"],
            "prompt_tokens": item["prompt_tokens"] or len(treq.input_ids),
            "completion_tokens": item["completion_tokens"],
            "cached_tokens": item["cached_tokens"],
            "e2e_latency": time.time() - state.created,
        }
        if item.get("embedding") is not None:
            return {
                "embedding": item["embedding"],
                "meta_info": meta,
            }
        if treq.return_logprob:
            decode_text = (
                getattr(gri, "return_text_in_logprobs", False)
                and self.tokenizer is not None
            )
            meta["output_token_logprobs"] = [
                (lp, tid,
                 self.tokenizer.decode([tid]) if decode_text else None)
                for lp, tid in zip(state.logprobs, state.output_ids)
            ]
            if treq.top_logprobs_num:
                if decode_text:
                    meta["output_top_logprobs"] = [
                        (vals, ids, [self.tokenizer.decode([t]) for t in ids])
                        for vals, ids in state.top_logprobs
                    ]
                else:
                    meta["output_top_logprobs"] = list(state.top_logprobs)
        if getattr(treq, "return_hidden_states", False):
            meta["hidden_states"] = list(state.hidden_states)
        return {
            "text": state.text,
            "output_ids": list(state.output_ids),
            "meta_info": meta,
        }

    def open_session(self, session_id: Optional[str] = None,
                     timeout: Optional[float] = None) -> str:
        from sglang_tpu.managers.session import Session

        sess = Session(session_id, timeout=timeout)
        self.sessions.setdefault(sess.session_id, sess)
        self._reap_timed_out_sessions()
        return sess.session_id

    def close_session(self, session_id: str) -> bool:
        return self.sessions.pop(session_id, None) is not None

    def get_session_tree(self, session_id: str) -> Optional[str]:
        sess = self.sessions.get(session_id)
        return sess.tree_str() if sess is not None else None

    def _reap_timed_out_sessions(self) -> None:
        for sid in [s for s, v in self.sessions.items() if v.is_timed_out()]:
            del self.sessions[sid]

    async def abort_request(self, rid: str) -> None:
        await self.send_sock.send(
            pickle.dumps(AbortReq(rid=rid), protocol=5)
        )

    # -------------------------------------------------------------- control
    async def _control_rpc(self, req, resp_type, timeout: float = 120):
        fut = asyncio.get_event_loop().create_future()
        self._control_waiters.setdefault(resp_type, deque()).append(fut)
        await self.send_sock.send(pickle.dumps(req, protocol=5))
        return await asyncio.wait_for(fut, timeout)

    async def flush_cache(self) -> bool:
        resp = await self._control_rpc(FlushCacheReq(), FlushCacheResp)
        return resp.success

    async def init_weights_update_group(self, group_addr: str):
        from sglang_tpu.managers.io_struct import (
            InitWeightsGroupReq,
            InitWeightsGroupResp,
        )

        resp = await self._control_rpc(
            InitWeightsGroupReq(group_addr=group_addr), InitWeightsGroupResp
        )
        return resp.success, resp.message

    async def update_weights_from_distributed(self, names, timeout=120.0):
        from sglang_tpu.managers.io_struct import (
            UpdateWeightsFromDistributedReq,
        )

        resp = await self._control_rpc(
            UpdateWeightsFromDistributedReq(names=list(names),
                                            timeout=timeout),
            UpdateWeightsResp,
            timeout=timeout + 30,
        )
        return resp.success, resp.message

    async def pause_generation(self, pause: bool) -> bool:
        from sglang_tpu.managers.io_struct import (
            PauseGenerationReq,
            PauseGenerationResp,
        )

        resp = await self._control_rpc(
            PauseGenerationReq(pause=pause), PauseGenerationResp
        )
        return resp.success

    async def expert_distribution(self, action: str):
        from sglang_tpu.managers.io_struct import (
            ExpertDistributionReq,
            ExpertDistributionResp,
        )

        resp = await self._control_rpc(
            ExpertDistributionReq(action=action), ExpertDistributionResp
        )
        return resp.data

    async def eplb_rebalance(self):
        from sglang_tpu.managers.io_struct import (
            EplbRebalanceReq,
            EplbRebalanceResp,
        )

        resp = await self._control_rpc(EplbRebalanceReq(), EplbRebalanceResp)
        return resp.success, resp.message

    async def elastic_ep(self, dead_ranks):
        """Elastic EP scale event: route MoE tokens around dead EP shards
        (ref srt/elastic_ep/elastic_ep.py)."""
        from sglang_tpu.managers.io_struct import (
            EplbRebalanceReq,
            EplbRebalanceResp,
        )

        resp = await self._control_rpc(
            EplbRebalanceReq(dead_ranks=list(dead_ranks)), EplbRebalanceResp
        )
        return resp.success, resp.message

    async def health(self) -> bool:
        try:
            resp = await self._control_rpc(HealthCheckReq(), HealthCheckResp, 30)
            return resp.ok
        except asyncio.TimeoutError:
            return False

    async def get_server_info(self) -> Dict[str, Any]:
        resp = await self._control_rpc(GetServerInfoReq(), GetServerInfoResp)
        return resp.info

    async def release_memory_occupation(self, tags=None):
        resp = await self._control_rpc(
            ReleaseMemoryReq(tags=tags or ["kv_cache"]), ReleaseMemoryResp
        )
        return resp.success, resp.message

    async def resume_memory_occupation(self, tags=None):
        resp = await self._control_rpc(
            ResumeMemoryReq(tags=tags or ["kv_cache"]), ResumeMemoryResp,
            timeout=600,
        )
        return resp.success, resp.message

    async def update_weights_from_tensor(self, named_tensors):
        from sglang_tpu.managers.io_struct import UpdateWeightsFromTensorReq

        resp = await self._control_rpc(
            UpdateWeightsFromTensorReq(named_tensors=list(named_tensors)),
            UpdateWeightsResp,
            timeout=600,
        )
        return resp.success, resp.message

    async def load_lora_adapter(self, lora_name: str, lora_path: str):
        from sglang_tpu.managers.io_struct import (
            LoadLoRAAdapterReq,
            LoRAUpdateResp,
        )

        resp = await self._control_rpc(
            LoadLoRAAdapterReq(lora_name=lora_name, lora_path=lora_path),
            LoRAUpdateResp,
            timeout=300,
        )
        return resp.success, resp.message, resp.loaded_adapters

    async def unload_lora_adapter(self, lora_name: str):
        from sglang_tpu.managers.io_struct import (
            LoRAUpdateResp,
            UnloadLoRAAdapterReq,
        )

        resp = await self._control_rpc(
            UnloadLoRAAdapterReq(lora_name=lora_name), LoRAUpdateResp,
            timeout=300,
        )
        return resp.success, resp.message, resp.loaded_adapters

    async def update_weights_from_disk(self, model_path: str,
                                       load_format: str = "auto"):
        resp = await self._control_rpc(
            UpdateWeightsReq(model_path=model_path, load_format=load_format),
            UpdateWeightsResp,
            timeout=600,
        )
        return resp.success, resp.message
