"""Frontend DSL e2e (ref: python/sglang/lang tests)."""

import pytest

import sglang_tpu.lang as sgl


@pytest.fixture(scope="module")
def engine_backend(tiny_llama_dir):
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.lang import EngineBackend

    eng = Engine(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=4096,
        enable_single_process=True,
        log_level="warning",
    )
    backend = EngineBackend(eng)
    sgl.set_default_backend(backend)
    yield backend
    eng.shutdown()


def test_basic_gen(engine_backend):
    @sgl.function
    def hello(s):
        s += "w10 w11 w12 "
        s += sgl.gen("out", max_tokens=5, temperature=0.0, ignore_eos=True)

    state = hello.run()
    assert isinstance(state["out"], str)
    assert state.text().startswith("w10 w11 w12 ")


def test_select(engine_backend):
    @sgl.function
    def pick(s):
        s += "w20 w21 "
        s += sgl.select("choice", choices=["w3", "w4"])

    state = pick.run()
    assert state["choice"] in ("w3", "w4")


def test_multi_gen_and_vars(engine_backend):
    @sgl.function
    def chain(s, start):
        s += start + " "
        s += sgl.gen("a", max_tokens=3, temperature=0.0, ignore_eos=True)
        s += " and "
        s += sgl.gen("b", max_tokens=3, temperature=0.0, ignore_eos=True)

    state = chain.run(start="w40")
    assert state["a"] and state["b"]
    assert " and " in state.text()


def test_run_batch(engine_backend):
    @sgl.function
    def f(s, w):
        s += w + " "
        s += sgl.gen("x", max_tokens=2, temperature=0.0, ignore_eos=True)

    states = f.run_batch([{"w": "w50"}, {"w": "w51"}])
    assert len(states) == 2
    assert all(st["x"] for st in states)
