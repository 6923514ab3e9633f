"""Ray mode (ref srt/ray/): manager lifecycle through the actor API.
Runs on the in-repo process-backed ray implementation (fake_ray) —
the same surface real Ray provides; actors are real spawned processes.
"""

import time

import pytest

from sglang_tpu.ray_mode import fake_ray, get_ray


class Counter:
    def __init__(self, start=0):
        self.v = start

    def add(self, n):
        self.v += n
        return self.v

    def get(self):
        return self.v

    def boom(self):
        raise ValueError("boom")


def test_fake_ray_actor_roundtrip():
    fake_ray.init()
    actor = fake_ray.remote(Counter).remote(10)
    assert fake_ray.get(actor.add.remote(5), timeout=30) == 15
    assert fake_ray.get(actor.get.remote(), timeout=30) == 15
    with pytest.raises(RuntimeError, match="boom"):
        fake_ray.get(actor.boom.remote(), timeout=30)
    # errors don't kill the actor
    assert fake_ray.get(actor.add.remote(1), timeout=30) == 16
    assert actor.is_alive()
    fake_ray.kill(actor)
    deadline = time.monotonic() + 10
    while actor.is_alive() and time.monotonic() < deadline:
        time.sleep(0.05)
    assert not actor.is_alive()
    fake_ray.shutdown()


def test_get_ray_fallback():
    ray = get_ray("auto")
    assert hasattr(ray, "remote") and hasattr(ray, "get")
    assert get_ray("fake") is fake_ray


def test_ray_engine_generate(tiny_llama_dir):
    """Full engine with Ray-actor managers: generate greedy tokens and
    match the in-process engine's output."""
    from sglang_tpu.entrypoints.engine import Engine

    fake_ray.init()
    try:
        eng = Engine(
            model_path=tiny_llama_dir, dtype="float32",
            attention_backend="xla_native", page_size=4,
            max_total_tokens=512, max_running_requests=2,
            enable_ray=True, ray_backend="fake",
        )
        try:
            out = eng.generate(
                input_ids=[[5, 6, 7, 8]],
                sampling_params={"temperature": 0.0, "max_new_tokens": 4,
                                 "ignore_eos": True},
            )
            toks_ray = out[0]["output_ids"]
            assert len(toks_ray) == 4
            workers = eng._workers
            assert all(w.is_alive() for w in workers)
        finally:
            eng.shutdown()
    finally:
        fake_ray.shutdown()
