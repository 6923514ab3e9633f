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


def test_fork_and_run_parallel(engine_backend):
    """fork(n) continuations share the prefix and run concurrently
    (ref lang/interpreter.py fork/join)."""
    @sgl.function
    def base(s):
        s += "w30 w31 w32 "

    state = base.run()
    forks = state.fork(3)

    def continue_fork(st):
        st += sgl.gen("tail", max_tokens=4, temperature=0.0,
                      ignore_eos=True)

    sgl.run_parallel([(continue_fork, st) for st in forks])
    tails = [st["tail"] for st in forks]
    assert all(isinstance(t, str) and t for t in tails)
    # greedy + same prefix -> identical continuations
    assert tails[0] == tails[1] == tails[2]
    # the parent state is untouched
    assert "tail" not in state.variables


def test_run_batch_parallel(engine_backend):
    @sgl.function
    def prog(s, start):
        s += start + " "
        s += sgl.gen("o", max_tokens=3, temperature=0.0, ignore_eos=True)

    states = prog.run_batch([{"start": f"w{40 + i}"} for i in range(4)],
                            num_threads=4)
    assert len(states) == 4
    assert all(st["o"] for st in states)


def test_image_video_primitives(engine_backend):
    """image()/video() append placeholders + stash media on the state
    (backend delivery tested via the VLM e2e suites)."""
    st = sgl.api.ProgramState(engine_backend) if hasattr(sgl, "api") else None
    from sglang_tpu.lang.api import ProgramState

    st = ProgramState(engine_backend)
    st += "look: "
    st += sgl.image("/tmp/fake.png")
    st += sgl.video({"frames": ["/tmp/f0.png"]})
    assert st.images == ["/tmp/fake.png"]
    assert st.videos == [{"frames": ["/tmp/f0.png"]}]
    assert "<image>" in st.text() and "<video>" in st.text()


def test_openai_anthropic_backends_against_own_server(
    tiny_llama_dir, tmp_path_factory
):
    """The OpenAI/Anthropic remote backends drive THIS framework's own
    protocol endpoints (ref lang/backend/{openai,anthropic}.py)."""
    import os
    import subprocess
    import sys
    import time

    import requests

    from sglang_tpu.lang import AnthropicBackend, OpenAIBackend
    from sglang_tpu.utils import find_free_port

    port = find_free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               TOKENIZERS_PARALLELISM="false")
    log_f = open(tmp_path_factory.mktemp("dsl_srv") / "log.txt", "wb")
    proc = subprocess.Popen(
        [sys.executable, "-m", "sglang_tpu.launch_server",
         "--model-path", tiny_llama_dir, "--dtype", "float32",
         "--attention-backend", "xla_native", "--page-size", "4",
         "--max-total-tokens", "2048", "--max-running-requests", "4",
         "--port", str(port), "--log-level", "warning"],
        env=env, stdout=log_f, stderr=subprocess.STDOUT,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 240
        while True:
            try:
                if requests.get(base + "/health", timeout=2).ok:
                    break
            except Exception:
                pass
            assert proc.poll() is None, "server died"
            assert time.time() < deadline
            time.sleep(0.5)

        for backend in (OpenAIBackend(base, model="tiny"),
                        AnthropicBackend(base, model="tiny")):
            sgl.set_default_backend(backend)

            @sgl.function
            def ask(s):
                with sgl.user(s):
                    s += "w10 w11"
                s += sgl.gen("out", max_tokens=4, temperature=0.0,
                             ignore_eos=True)

            state = ask.run()
            assert isinstance(state["out"], str)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=30)
        log_f.close()
