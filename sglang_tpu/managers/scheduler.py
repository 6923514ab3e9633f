"""Scheduler event loop: wraps ScheduleCore with the ZMQ control plane.

Ref: srt/managers/scheduler.py:4930 (run_scheduler_process) +
event_loop_overlap:1718. One scheduler owns the whole TPU mesh (single
jit program across chips) — unlike the reference's one-process-per-GPU
NCCL layout, there is no per-rank fan-out on a single host.
"""

from __future__ import annotations

import logging
import time
from typing import List, Optional

import zmq

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore, StepOutput
from sglang_tpu.managers.io_struct import (
    AbortReq,
    ReleaseMemoryReq,
    ReleaseMemoryResp,
    ResumeMemoryReq,
    ResumeMemoryResp,
    BatchTokenOut,
    EplbRebalanceReq,
    EplbRebalanceResp,
    InitWeightsGroupReq,
    InitWeightsGroupResp,
    PauseGenerationReq,
    PauseGenerationResp,
    UpdateWeightsFromDistributedReq,
    ExpertDistributionReq,
    ExpertDistributionResp,
    FlushCacheReq,
    FlushCacheResp,
    GetServerInfoReq,
    GetServerInfoResp,
    HealthCheckReq,
    HealthCheckResp,
    LoadLoRAAdapterReq,
    LoRAUpdateResp,
    UnloadLoRAAdapterReq,
    SchedulerReady,
    TokenizedGenerateReqInput,
    UpdateWeightsFromTensorReq,
    UpdateWeightsReq,
    UpdateWeightsResp,
)
from sglang_tpu.managers.zmq_utils import drain_pyobj, make_socket, send_pyobj
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.server_args import ServerArgs

logger = logging.getLogger(__name__)


class Scheduler:
    def __init__(self, server_args: ServerArgs, port_args):
        self.server_args = server_args
        self.recv_sock = make_socket(port_args.scheduler_ipc, zmq.PULL, bind=True)
        self.to_detok = make_socket(port_args.detokenizer_ipc, zmq.PUSH, bind=False)

        from sglang_tpu.tokenizer import get_tokenizer

        tokenizer = (
            None
            if server_args.skip_tokenizer_init
            else get_tokenizer(server_args.tokenizer_path,
                               server_args.trust_remote_code)
        )
        self.runner = ModelRunner(server_args)
        if server_args.enable_pdmux:
            from sglang_tpu.multiplex import PDMuxCoordinator

            self.core = PDMuxCoordinator(server_args, self.runner, tokenizer)
        else:
            self.core = ScheduleCore(server_args, self.runner, tokenizer)
        self._req_meta = {}  # rid -> (skip_special, spaces_between, stop, no_trim)

    def handle_msg(self, msg) -> None:
        if isinstance(msg, TokenizedGenerateReqInput):
            sp = msg.sampling_params
            req = Req(
                msg.rid,
                msg.input_ids,
                sp,
                return_logprob=msg.return_logprob,
                top_logprobs_num=msg.top_logprobs_num,
                lora_id=msg.lora_path,
                priority=getattr(msg, "priority", 0),
                is_embedding=getattr(msg, "is_embedding", False),
            )
            embeds = getattr(msg, "input_embeds", None)
            if embeds is not None:
                req.mm_positions = list(range(len(embeds)))
                req.mm_embeds = embeds
            mm_inputs = getattr(msg, "mm_inputs", None)
            if mm_inputs:
                self.core.attach_mm_inputs(req, mm_inputs)
            req.label_token_ids = getattr(msg, "label_token_ids", None)
            req.return_hidden_states = getattr(
                msg, "return_hidden_states", False)
            clp_spec = getattr(msg, "custom_logit_processor", None)
            if clp_spec is not None:
                from sglang_tpu.sampling.custom_logit_processor import (
                    resolve_custom_logit_processor,
                )

                req.custom_logit_processor = resolve_custom_logit_processor(
                    clp_spec,
                    allow_pickle=bool(getattr(
                        self.server_args, "enable_custom_logit_processor",
                        False)),
                )
            room = getattr(msg, "bootstrap_room", None)
            if room:
                req.bootstrap_room = room
            self._req_meta[msg.rid] = (
                sp.skip_special_tokens,
                sp.spaces_between_special_tokens,
                list(sp.stop or []),
                sp.no_stop_trim,
            )
            self.core.add_request(req)
        elif isinstance(msg, AbortReq):
            self.core.abort_request(msg.rid)
            # Resolve the client's stream immediately (a parked/waiting
            # request never reaches the step loop, so no output would
            # otherwise flow back — e.g. PD decode whose prefill died).
            send_pyobj(
                self.to_detok,
                self.outputs_to_msg([StepOutput(
                    rid=msg.rid, new_token=None,
                    finish_reason={"type": "abort"},
                )]),
            )
        elif isinstance(msg, FlushCacheReq):
            ok = self.core.flush_cache()
            send_pyobj(self.to_detok, FlushCacheResp(success=ok))
        elif isinstance(msg, HealthCheckReq):
            send_pyobj(self.to_detok, HealthCheckResp(ok=True))
        elif isinstance(msg, PauseGenerationReq):
            self.core.paused = msg.pause
            send_pyobj(self.to_detok, PauseGenerationResp(success=True))
        elif isinstance(msg, ExpertDistributionReq):
            from sglang_tpu.eplb import RECORDER

            data = None
            if msg.action == "start":
                RECORDER.start()
                # maybe_record branches at TRACE time — drop compiled
                # programs so recording takes effect on the next step.
                self.runner.clear_compiled()
            elif msg.action == "stop":
                RECORDER.stop()
                self.runner.clear_compiled()
            elif msg.action == "dump":
                data = RECORDER.dump()
            send_pyobj(
                self.to_detok, ExpertDistributionResp(success=True, data=data)
            )
        elif isinstance(msg, EplbRebalanceReq):
            if msg.dead_ranks is not None:
                ok, message = self.runner.elastic_ep_scale(msg.dead_ranks)
            else:
                ok, message = self.runner.eplb_rebalance()
            send_pyobj(
                self.to_detok, EplbRebalanceResp(success=ok, message=message)
            )
        elif isinstance(msg, GetServerInfoReq):
            send_pyobj(
                self.to_detok,
                GetServerInfoResp(
                    info=dict(
                        running_requests=len(self.core.running),
                        waiting_requests=len(self.core.waiting),
                        max_total_tokens=self.runner.max_total_tokens,
                        free_pages=self.core.allocator.available_pages(),
                        radix_pages=self.core.radix.total_cached_pages(),
                        generated_tokens=self.core.num_generated_tokens,
                        prefill_tokens=self.core.num_prefill_tokens,
                        cached_tokens=self.core.num_cached_tokens,
                        token_usage=1.0
                        - self.core.allocator.available_pages()
                        / max(self.core.allocator.num_pages - 1, 1),
                        gen_throughput=self.core.gen_throughput,
                        model_path=self.server_args.model_path,
                    )
                ),
            )
        elif isinstance(msg, ReleaseMemoryReq):
            if self.core.has_work():
                send_pyobj(self.to_detok,
                           ReleaseMemoryResp(False, "requests in flight"))
            else:
                self.runner.release_memory(msg.tags)
                send_pyobj(self.to_detok, ReleaseMemoryResp(True))
        elif isinstance(msg, ResumeMemoryReq):
            self.runner.resume_memory(msg.tags)
            # reset the tree BEFORE clearing the allocator: reset frees node
            # pages into the free list, so the other order would leave
            # duplicate entries (double-allocation -> KV corruption).
            self.core.radix.reset()
            self.core.allocator.clear()
            if self.core.hybrid_swa:
                self.core.swa_shadow.map.clear()
                self.core.swa_allocator.clear()
            send_pyobj(self.to_detok, ResumeMemoryResp(True))
        elif isinstance(msg, UpdateWeightsReq):
            try:
                from sglang_tpu.model_exec.weight_loader import load_model_weights

                self.runner.params = load_model_weights(
                    self.runner.model,
                    self.runner.specs,
                    self.runner.mesh_ctx,
                    msg.model_path,
                    load_format=msg.load_format,
                    seed=self.server_args.random_seed,
                )
                send_pyobj(self.to_detok, UpdateWeightsResp(True, "ok"))
            except Exception as e:  # noqa: BLE001
                send_pyobj(self.to_detok, UpdateWeightsResp(False, str(e)))
        elif isinstance(msg, LoadLoRAAdapterReq):
            try:
                self.runner.ensure_lora_manager().load(
                    msg.lora_name, msg.lora_path
                )
                send_pyobj(self.to_detok, LoRAUpdateResp(
                    True, "ok",
                    loaded_adapters=list(self.runner.lora_manager.adapters),
                ))
            except Exception as e:  # noqa: BLE001
                send_pyobj(self.to_detok, LoRAUpdateResp(False, str(e)))
        elif isinstance(msg, UnloadLoRAAdapterReq):
            lm = self.runner.lora_manager
            ok = lm is not None and lm.unload(msg.lora_name)
            send_pyobj(self.to_detok, LoRAUpdateResp(
                ok, "ok" if ok else f"adapter {msg.lora_name!r} not loaded",
                loaded_adapters=list(lm.adapters) if lm else [],
            ))
        elif isinstance(msg, InitWeightsGroupReq):
            try:
                import zmq

                from sglang_tpu.managers.zmq_utils import make_socket

                self._weight_group = make_socket(
                    msg.group_addr, zmq.PULL, bind=False
                )
                send_pyobj(self.to_detok, InitWeightsGroupResp(True, "ok"))
            except Exception as e:  # noqa: BLE001
                send_pyobj(self.to_detok, InitWeightsGroupResp(False, str(e)))
        elif isinstance(msg, UpdateWeightsFromDistributedReq):
            try:
                import pickle as _pkl

                import zmq

                sock = getattr(self, "_weight_group", None)
                if sock is None:
                    raise RuntimeError(
                        "call /init_weights_update_group first"
                    )
                sock.setsockopt(zmq.RCVTIMEO, int(msg.timeout * 1000))
                named = []
                want = set(msg.names)
                while want:
                    name, arr = _pkl.loads(sock.recv())
                    if name not in want:
                        logger.warning("unexpected weight %s", name)
                        continue
                    want.discard(name)
                    named.append((name, arr))
                from sglang_tpu.model_exec.weight_loader import (
                    update_params_from_named_tensors,
                )

                self.runner.params = update_params_from_named_tensors(
                    self.runner.model,
                    self.runner.specs,
                    self.runner.mesh_ctx,
                    self.runner.params,
                    named,
                )
                send_pyobj(self.to_detok, UpdateWeightsResp(True, "ok"))
            except Exception as e:  # noqa: BLE001
                send_pyobj(self.to_detok, UpdateWeightsResp(False, str(e)))
        elif isinstance(msg, UpdateWeightsFromTensorReq):
            try:
                from sglang_tpu.model_exec.weight_loader import (
                    update_params_from_named_tensors,
                )

                self.runner.params = update_params_from_named_tensors(
                    self.runner.model,
                    self.runner.specs,
                    self.runner.mesh_ctx,
                    self.runner.params,
                    msg.named_tensors,
                )
                send_pyobj(self.to_detok, UpdateWeightsResp(True, "ok"))
            except Exception as e:  # noqa: BLE001
                send_pyobj(self.to_detok, UpdateWeightsResp(False, str(e)))
        else:
            logger.warning("unknown message %r", type(msg))

    def outputs_to_msg(self, outs: List[StepOutput]) -> BatchTokenOut:
        msg = BatchTokenOut(
            rids=[], tokens=[], finish_reasons=[], logprobs=[], top_logprobs=[],
            completion_tokens=[], cached_tokens=[], prompt_tokens=[],
            embeddings=[], skip_special_tokens=[],
            spaces_between_special_tokens=[], stop_strs=[], no_stop_trim=[],
        )
        for o in outs:
            meta = self._req_meta.get(o.rid, (True, True, [], False))
            msg.rids.append(o.rid)
            msg.tokens.append(o.new_token)
            msg.finish_reasons.append(o.finish_reason)
            msg.logprobs.append(o.logprob)
            msg.top_logprobs.append(o.top_logprobs)
            msg.completion_tokens.append(o.completion_tokens)
            msg.cached_tokens.append(o.cached_tokens)
            msg.prompt_tokens.append(o.prompt_tokens)
            msg.embeddings.append(o.embedding)
            msg.skip_special_tokens.append(meta[0])
            msg.spaces_between_special_tokens.append(meta[1])
            msg.stop_strs.append(meta[2])
            msg.no_stop_trim.append(meta[3])
            msg.hidden_states.append(getattr(o, "hidden_state", None))
            if o.finish_reason is not None:
                self._req_meta.pop(o.rid, None)
        return msg

    def event_loop(self) -> None:
        from sglang_tpu.utils.watchdog import SoftWatchdog

        watchdog = SoftWatchdog(timeout=300.0)
        watchdog.start()
        poller = zmq.Poller()
        poller.register(self.recv_sock, zmq.POLLIN)
        while True:
            watchdog.pet()
            for msg in drain_pyobj(self.recv_sock):
                if msg is None:
                    return
                self.handle_msg(msg)
            if self.core.has_work():
                outs = self.core.step()
                if outs:
                    send_pyobj(self.to_detok, self.outputs_to_msg(outs))
            else:
                poller.poll(timeout=2)


# In-process scheduler registry (single-process mode): lets the Engine
# expose ScheduleCore for introspection (tests, /get_server_info).
LOCAL_SCHEDULERS = {}


def run_scheduler(server_args: ServerArgs, port_args, ready_event=None):
    """Process/thread target."""
    from sglang_tpu.utils import assert_jax_platform

    assert_jax_platform()
    try:
        sched = Scheduler(server_args, port_args)
        LOCAL_SCHEDULERS[port_args.scheduler_ipc] = sched
    except Exception:
        logger.exception("scheduler init failed")
        if ready_event is not None:
            ready_event.set()  # unblock launcher; it will see failure on use
        raise
    send_pyobj(
        sched.to_detok,
        SchedulerReady(
            ok=True, info=dict(max_total_tokens=sched.runner.max_total_tokens)
        ),
    )
    if ready_event is not None:
        ready_event.set()
    sched.event_loop()
