"""PD multiplexing: colocated prefill + decode engines on one chip.

Ref: srt/multiplex/multiplexing_mixin.py:101 + srt/multiplex/
pdmux_context.py. The reference partitions GPU SMs with green contexts
and runs a prefill scheduler and a decode scheduler concurrently on the
two partitions so long prefills never stall in-flight decodes.

TPU recast: a TPU core has no SM-partitioning primitive — one XLA
program owns the chip for the duration of a step. The equivalent
mechanism is TIME-DIVISION multiplexing with a decode-first tick:

- TWO ScheduleCores (disaggregation roles "prefill" and "decode") share
  ONE ModelRunner — one copy of the weights, one KV pool. The pool's
  page space is statically partitioned between the roles (RangeAllocator)
  the way PDMux partitions SMs.
- Each coordinator tick steps the decode core first, then lets the
  prefill core launch at most one (chunked) prefill batch. Decode ITL is
  therefore bounded by one prefill-chunk forward, tunable via
  --pdmux-prefill-chunk (the analog of choosing the SM split).
- KV handoff rides the same chunked wire protocol as real PD
  disaggregation (disaggregation/base.py) over the in-process transport,
  so a PDMux deployment exercises exactly the disaggregated code paths —
  requests park in the decode core's prealloc queue and auto-admit when
  their KV lands.

The client-visible stream comes from the DECODE core only (matching the
reference, where the decode side owns the token stream: the handoff
carries the first token).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore, StepOutput
from sglang_tpu.mem.allocator import PageAllocator
from sglang_tpu.server_args import ServerArgs

logger = logging.getLogger(__name__)


class RangeAllocator(PageAllocator):
    """PageAllocator restricted to pages [lo, hi) of a shared pool."""

    def __init__(self, num_pages: int, page_size: int, lo: int, hi: int):
        assert 0 < lo < hi <= num_pages
        self.num_pages = num_pages
        self.page_size = page_size
        self.lo, self.hi = lo, hi
        self.free_pages = list(range(hi - 1, lo - 1, -1))

    def free(self, pages) -> None:
        for p in pages:
            assert self.lo <= p < self.hi, (
                f"page {p} outside role partition [{self.lo}, {self.hi})"
            )
        self.free_pages.extend(pages)

    def clear(self) -> None:
        self.free_pages = list(range(self.hi - 1, self.lo - 1, -1))


class PDMuxCoordinator:
    """Drop-in ScheduleCore replacement multiplexing P+D roles on one chip."""

    def __init__(self, server_args: ServerArgs, runner, tokenizer=None):
        if getattr(runner, "dcp_pool_sharded", False):
            raise ValueError("PDMux does not compose with DCP pool sharding")
        if server_args.enable_kv_canary:
            raise ValueError("PDMux does not compose with --enable-kv-canary")
        self.args = server_args
        self.runner = runner
        chunk = server_args.pdmux_prefill_chunk or min(
            server_args.chunked_prefill_size or 2048, 2048
        )
        p_args = dataclasses.replace(
            server_args,
            disaggregation_mode="prefill",
            disaggregation_transport="fake",
            chunked_prefill_size=chunk,
        )
        d_args = dataclasses.replace(
            server_args,
            disaggregation_mode="decode",
            disaggregation_transport="fake",
        )
        self.prefill = ScheduleCore(p_args, runner, tokenizer)
        self.decode = ScheduleCore(d_args, runner, tokenizer)
        # Partition the shared pool's page space between the roles (the
        # SM-split analog). Prefill holds KV only until handoff, so the
        # decode side gets the larger share by default.
        n = runner.kv_pool.config.num_pages
        split = max(2, min(n - 2, int(n * server_args.pdmux_prefill_ratio)))
        self.prefill.allocator = RangeAllocator(
            n, server_args.page_size, 1, split
        )
        self.decode.allocator = RangeAllocator(
            n, server_args.page_size, split, n
        )
        self._tick = 0

    # ---- ScheduleCore-compatible surface ----

    @property
    def running(self):
        return self.decode.running

    @property
    def waiting(self):
        return self.prefill.waiting

    def add_request(self, req: Req) -> None:
        room = f"pdmux:{req.rid}"
        # Decode twin: parks in the prealloc queue until KV arrives.
        req.bootstrap_room = room
        self.decode.add_request(req)
        # Prefill twin: same prompt, first token only, ships KV.
        psp = dataclasses.replace(req.sampling_params)
        preq = Req(room, list(req.input_ids), psp, lora_id=req.lora_id)
        preq.bootstrap_room = room
        self.prefill.add_request(preq)

    def abort_request(self, rid: str) -> None:
        self.prefill.abort_request(f"pdmux:{rid}")
        self.decode.abort_request(rid)

    def has_work(self) -> bool:
        return self.prefill.has_work() or self.decode.has_work()

    def step(self) -> List[StepOutput]:
        """One multiplex tick: decode first, then one prefill launch."""
        self._tick += 1
        outputs: List[StepOutput] = []
        if self.decode.has_work():
            outputs.extend(self.decode.step())
        if self.prefill.has_work():
            # The prefill core's stream is internal: its first-token
            # outputs reach the client through the decode-side handoff.
            self.prefill.step()
        return outputs

    def flush_cache(self) -> bool:
        a = self.prefill.flush_cache()
        b = self.decode.flush_cache()
        return a and b

    @property
    def paused(self):
        return self.decode.paused

    @paused.setter
    def paused(self, v):
        self.prefill.paused = v
        self.decode.paused = v
