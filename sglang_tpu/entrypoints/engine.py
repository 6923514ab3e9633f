"""Engine: offline in-process API (and the server's backbone).

Ref: srt/entrypoints/engine.py:199 (Engine), :352 (generate), :1036
(_launch_subprocesses); EngineBase abstract surface (EngineBase.py:7-77).

Topology: like the reference we keep TokenizerManager (here, in-caller
asyncio), Scheduler (own proc/thread — owns the TPU mesh), and Detokenizer
(own proc/thread), connected by ZMQ. With enable_single_process=True the
three run as threads over inproc:// sockets (same code path) — used for
tests and notebook/offline use; the HTTP server launches real processes.
"""

from __future__ import annotations

import asyncio
import atexit
import logging
import multiprocessing as mp
import threading
import time
from typing import Any, AsyncGenerator, Dict, Iterator, List, Optional, Union

from sglang_tpu.managers.io_struct import GenerateReqInput
from sglang_tpu.server_args import PortArgs, ServerArgs
from sglang_tpu.utils import configure_logger

logger = logging.getLogger(__name__)


def _inproc_port_args() -> PortArgs:
    import random

    base = f"inproc://sglang_tpu_{random.randint(0, 1 << 62)}"
    return PortArgs(
        tokenizer_ipc=f"{base}_tok",
        scheduler_ipc=f"{base}_sched",
        detokenizer_ipc=f"{base}_detok",
    )


def launch_managers(server_args: ServerArgs):
    """Start detokenizer + scheduler(s) (+ DP controller for dp_size > 1).

    Returns (port_args, workers, deferred_threads). In single-process mode
    the threads are returned UNSTARTED (deferred_threads) so the caller can
    bind the TokenizerManager's inproc socket first; in multi-process mode
    everything is started and deferred_threads is None.
    """
    import dataclasses as _dc

    from sglang_tpu.managers.detokenizer_manager import run_detokenizer
    from sglang_tpu.managers.scheduler import run_scheduler

    dp = max(server_args.dp_size, 1)

    def make_targets(port_args):
        targets = [("detokenizer", run_detokenizer, (server_args, port_args))]
        if dp > 1:
            from sglang_tpu.managers.data_parallel_controller import (
                run_dp_controller,
            )

            worker_addrs = [
                f"{port_args.scheduler_ipc}_w{i}" for i in range(dp)
            ]
            targets.append(
                ("dp-controller", run_dp_controller,
                 (server_args, port_args, worker_addrs))
            )
            for i, addr in enumerate(worker_addrs):
                wp = _dc.replace(port_args, scheduler_ipc=addr)
                targets.append(
                    (f"scheduler-{i}", run_scheduler, (server_args, wp))
                )
        else:
            targets.append(("scheduler", run_scheduler, (server_args, port_args)))
        return targets

    if server_args.enable_ray:
        # Ref srt/ray/engine.py: Ray owns manager lifecycle.
        from sglang_tpu.ray_mode.engine import launch_managers_ray

        port_args, workers = launch_managers_ray(server_args)
        return port_args, workers, None
    if server_args.enable_single_process:
        port_args = _inproc_port_args()
        threads = [
            threading.Thread(target=fn, args=args, daemon=True, name=name)
            for name, fn, args in make_targets(port_args)
        ]
        return port_args, threads, threads
    port_args = PortArgs.init_new(server_args)
    ctx = mp.get_context("spawn")
    procs = []
    for name, fn, args in make_targets(port_args):
        p = ctx.Process(target=fn, args=args, daemon=True, name=name)
        p.start()
        procs.append(p)
    return port_args, procs, None


class Engine:
    """Synchronous offline API; also usable async via async_generate."""

    def __init__(self, server_args: Optional[ServerArgs] = None, **kwargs):
        if server_args is None:
            server_args = ServerArgs(**kwargs)
        from sglang_tpu.utils import assert_jax_platform

        assert_jax_platform()
        configure_logger(server_args.log_level)
        self.server_args = server_args

        from sglang_tpu.environ import envs
        from sglang_tpu.plugins import REGISTRY, load_plugins

        plugin_spec = server_args.plugins or envs.SGLANG_TPU_PLUGINS.get()
        if plugin_spec:
            load_plugins(plugin_spec)
            REGISTRY.fire_startup(server_args)

        # Dedicated asyncio loop thread for the TokenizerManager.
        self._loop = asyncio.new_event_loop()
        self._loop_thread = threading.Thread(
            target=self._loop.run_forever, daemon=True, name="engine-loop"
        )
        self._loop_thread.start()

        port_args, self._workers, deferred = launch_managers(server_args)
        self.port_args = port_args
        # TokenizerManager must bind tokenizer_ipc before others connect.
        self.tokenizer_manager = self._run_coro(
            self._make_tm(server_args, port_args)
        )
        if deferred:
            for i, t in enumerate(deferred):
                t.start()
                if i == 0:
                    time.sleep(0.05)  # binder (detok) first
        # Poll readiness so a crashed scheduler/detokenizer surfaces as an
        # immediate error instead of a silent wait (the managers run as
        # daemon threads/processes; a dead one can never become ready).
        deadline = time.monotonic() + 600
        while True:
            try:
                self._run_coro(self.tokenizer_manager.wait_ready(timeout=2))
                break
            except (asyncio.TimeoutError, TimeoutError):
                dead = [
                    getattr(w, "name", str(w))
                    for w in self._workers
                    if not w.is_alive()
                ]
                if dead:
                    raise RuntimeError(
                        f"manager worker(s) died during startup: {dead}"
                    ) from None
                if time.monotonic() > deadline:
                    raise
        atexit.register(self.shutdown)

    @staticmethod
    async def _make_tm(server_args, port_args):
        from sglang_tpu.managers.tokenizer_manager import TokenizerManager

        tm = TokenizerManager(server_args, port_args)
        tm.start()
        return tm

    def scheduler_core(self):
        """The in-process ScheduleCore (single-process mode only)."""
        from sglang_tpu.managers.scheduler import LOCAL_SCHEDULERS

        sched = LOCAL_SCHEDULERS.get(self.port_args.scheduler_ipc)
        return sched.core if sched is not None else None

    # ---------------------------------------------------------------- utils
    def _run_coro(self, coro):
        return asyncio.run_coroutine_threadsafe(coro, self._loop).result()

    # ------------------------------------------------------------------ API
    def generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[Dict, List[Dict]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        return_logprob: bool = False,
        top_logprobs_num: int = 0,
        return_hidden_states: bool = False,
        custom_logit_processor=None,
        stream: bool = False,
        rid: Optional[str] = None,
        session_params: Optional[Dict] = None,
        input_embeds=None,
        lora_path: Optional[str] = None,
        image_data=None,
        video_data=None,
    ):
        gri = GenerateReqInput(
            text=prompt,
            input_ids=input_ids,
            sampling_params=sampling_params,
            return_logprob=return_logprob,
            top_logprobs_num=top_logprobs_num,
            return_hidden_states=return_hidden_states,
            custom_logit_processor=custom_logit_processor,
            stream=stream,
            rid=rid,
            session_params=session_params,
            input_embeds=input_embeds,
            lora_path=lora_path,
            image_data=image_data,
            video_data=video_data,
        )
        if stream:
            return self._stream_sync(gri)
        outs = self._run_coro(self._collect(gri))
        sp0 = sampling_params if isinstance(sampling_params, dict) else {}
        if not gri.is_batch() and int((sp0 or {}).get("n") or 1) <= 1:
            return outs[0]
        return outs

    async def _collect(self, gri: GenerateReqInput):
        outs = []
        async for out in self.tokenizer_manager.generate_request(gri):
            outs.append(out)
        return outs

    def _stream_sync(self, gri: GenerateReqInput) -> Iterator[Dict]:
        import queue as _q

        q: _q.Queue = _q.Queue()

        async def pump():
            try:
                async for out in self.tokenizer_manager.generate_request(gri):
                    q.put(out)
            except Exception as e:  # noqa: BLE001
                q.put(e)
            finally:
                q.put(StopIteration)

        asyncio.run_coroutine_threadsafe(pump(), self._loop)
        while True:
            item = q.get()
            if item is StopIteration:
                return
            if isinstance(item, Exception):
                raise item
            yield item

    async def async_generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[Dict, List[Dict]]] = None,
        input_ids=None,
        return_logprob: bool = False,
        top_logprobs_num: int = 0,
        return_hidden_states: bool = False,
        stream: bool = False,
        rid: Optional[str] = None,
        image_data=None,
    ):
        gri = GenerateReqInput(
            text=prompt,
            input_ids=input_ids,
            sampling_params=sampling_params,
            return_logprob=return_logprob,
            top_logprobs_num=top_logprobs_num,
            return_hidden_states=return_hidden_states,
            stream=stream,
            rid=rid,
            image_data=image_data,
        )
        if stream:
            return self.tokenizer_manager.generate_request(gri)
        outs = []
        async for out in self.tokenizer_manager.generate_request(gri):
            outs.append(out)
        return outs[0] if not gri.is_batch() else outs

    def encode(self, prompt=None, input_ids=None):
        """Embedding API (ref: engine.encode, entrypoints/engine.py:549)."""
        gri = GenerateReqInput(
            text=prompt, input_ids=input_ids, is_embedding=True,
        )
        outs = self._run_coro(self._collect(gri))
        return outs[0] if not gri.is_batch() else outs

    def flush_cache(self) -> bool:
        return self._run_coro(self.tokenizer_manager.flush_cache())

    def init_weights_update_group(self, group_addr: str):
        """RL weight-sync channel (ref init_weights_update_group): connect
        the scheduler to a trainer's ZMQ PUSH endpoint."""
        return self._run_coro(
            self.tokenizer_manager.init_weights_update_group(group_addr)
        )

    def update_weights_from_distributed(self, names, timeout: float = 120.0):
        """Receive the named tensors from the weight group and apply them
        (ref update_weights_from_distributed)."""
        return self._run_coro(
            self.tokenizer_manager.update_weights_from_distributed(
                names, timeout
            )
        )

    def pause_generation(self) -> bool:
        return self._run_coro(self.tokenizer_manager.pause_generation(True))

    def continue_generation(self) -> bool:
        return self._run_coro(self.tokenizer_manager.pause_generation(False))

    def score(self, query, items, label_token_ids, apply_softmax=False,
              item_first=False):
        """/v1/score analog (ref Engine.score): probabilities of
        label_token_ids at the next-token position of query+item."""
        if isinstance(items, str) or (items and isinstance(items[0], int)):
            items = [items]
        seqs = []
        for it in items:
            if isinstance(query, str):
                a, b = (it, query) if item_first else (query, it)
                seqs.append(a + b)
            else:
                itt = it if isinstance(it, list) else [it]
                a, b = (itt, query) if item_first else (query, itt)
                seqs.append(list(a) + list(b))
        kw = {"prompt": seqs} if isinstance(seqs[0], str) else {
            "input_ids": seqs
        }
        gri = GenerateReqInput(
            text=kw.get("prompt"),
            input_ids=kw.get("input_ids"),
            is_embedding=True,
            label_token_ids=list(label_token_ids),
        )
        outs = self._run_coro(self._collect(gri))
        scores = []
        for o in outs:
            p = list(o["embedding"])
            if apply_softmax:
                s = sum(p) or 1.0
                p = [x / s for x in p]
            scores.append(p)
        return scores

    def start_expert_distribution_record(self):
        return self._run_coro(
            self.tokenizer_manager.expert_distribution("start")
        )

    def stop_expert_distribution_record(self):
        return self._run_coro(
            self.tokenizer_manager.expert_distribution("stop")
        )

    def dump_expert_distribution_record(self):
        return self._run_coro(
            self.tokenizer_manager.expert_distribution("dump")
        )

    def eplb_rebalance(self):
        """Recompute expert placement from the recorded distribution
        (sglang_tpu/eplb.py; ref srt/eplb/eplb_manager.py)."""
        return self._run_coro(self.tokenizer_manager.eplb_rebalance())

    def get_server_info(self) -> Dict[str, Any]:
        return self._run_coro(self.tokenizer_manager.get_server_info())

    def load_lora_adapter(self, lora_name: str, lora_path: str):
        return self._run_coro(
            self.tokenizer_manager.load_lora_adapter(lora_name, lora_path)
        )

    def unload_lora_adapter(self, lora_name: str):
        return self._run_coro(
            self.tokenizer_manager.unload_lora_adapter(lora_name)
        )

    def update_weights_from_disk(self, model_path: str, load_format="auto"):
        return self._run_coro(
            self.tokenizer_manager.update_weights_from_disk(
                model_path, load_format
            )
        )

    def update_weights_from_tensor(self, named_tensors):
        """RL hook: push updated weights as (hf_name, array) pairs without
        touching disk (ref engine.update_weights_from_tensor)."""
        return self._run_coro(
            self.tokenizer_manager.update_weights_from_tensor(named_tensors)
        )

    def release_memory_occupation(self, tags=None):
        return self._run_coro(
            self.tokenizer_manager.release_memory_occupation(tags)
        )

    def resume_memory_occupation(self, tags=None):
        return self._run_coro(
            self.tokenizer_manager.resume_memory_occupation(tags)
        )

    def open_session(self, session_id=None) -> str:
        return self.tokenizer_manager.open_session(session_id)

    def close_session(self, session_id: str) -> bool:
        return self.tokenizer_manager.close_session(session_id)

    def health(self) -> bool:
        return self._run_coro(self.tokenizer_manager.health())

    def shutdown(self) -> None:
        for w in getattr(self, "_workers", []):
            if isinstance(w, mp.Process) and w.is_alive():
                w.terminate()
