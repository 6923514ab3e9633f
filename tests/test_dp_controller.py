"""Data-parallel controller e2e: dp_size=2 schedulers behind one Engine.

Ref: srt/managers/data_parallel_controller.py (round-robin dispatch).
"""

import pytest


def test_dp2_engine(tiny_llama_dir):
    from sglang_tpu.entrypoints.engine import Engine

    eng = Engine(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
        max_running_requests=8,
        dp_size=2,
        enable_single_process=True,
        log_level="warning",
    )
    try:
        outs = eng.generate(
            prompt=[f"w{10 + i} w{20 + i}" for i in range(6)],
            sampling_params={"temperature": 0, "max_new_tokens": 4,
                             "ignore_eos": True},
        )
        assert len(outs) == 6
        for o in outs:
            assert len(o["output_ids"]) == 4
        # same prompt must give identical output regardless of dp worker
        a = eng.generate(prompt="w30 w31",
                         sampling_params={"temperature": 0, "max_new_tokens": 4,
                                          "ignore_eos": True})
        b = eng.generate(prompt="w30 w31",
                         sampling_params={"temperature": 0, "max_new_tokens": 4,
                                          "ignore_eos": True})
        assert a["output_ids"] == b["output_ids"]
    finally:
        eng.shutdown()
