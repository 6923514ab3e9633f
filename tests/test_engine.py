"""Engine e2e (single-process topology: threads + inproc ZMQ).

Ref: srt/entrypoints/engine.py API surface (generate/async_generate/
flush_cache/get_server_info/update_weights).
"""

import pytest


@pytest.fixture(scope="module")
def engine(tiny_llama_dir):
    from sglang_tpu.entrypoints.engine import Engine

    eng = Engine(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=4096,
        max_running_requests=16,
        enable_custom_logit_processor=True,
        enable_single_process=True,
        log_level="warning",
    )
    yield eng
    eng.shutdown()


def test_generate_text(engine):
    out = engine.generate(
        prompt="w10 w11 w12 w13",
        sampling_params={"temperature": 0, "max_new_tokens": 8, "ignore_eos": True},
    )
    assert isinstance(out["text"], str)
    assert len(out["output_ids"]) == 8
    assert out["meta_info"]["finish_reason"]["type"] == "length"
    assert out["meta_info"]["prompt_tokens"] == 4
    assert out["meta_info"]["completion_tokens"] == 8


def test_generate_input_ids(engine):
    out = engine.generate(
        input_ids=[5, 6, 7, 8],
        sampling_params={"temperature": 0, "max_new_tokens": 4, "ignore_eos": True},
    )
    assert len(out["output_ids"]) == 4


def test_batch_generate(engine):
    outs = engine.generate(
        prompt=["w10 w11 w12", "w20 w21 w22 w23"],
        sampling_params={"temperature": 0, "max_new_tokens": 5, "ignore_eos": True},
    )
    assert len(outs) == 2
    for o in outs:
        assert len(o["output_ids"]) == 5


def test_streaming(engine):
    chunks = list(
        engine.generate(
            prompt="w30 w31 w32",
            sampling_params={"temperature": 0, "max_new_tokens": 6,
                             "ignore_eos": True},
            stream=True,
        )
    )
    assert len(chunks) >= 2
    assert chunks[-1]["meta_info"]["finish_reason"] is not None
    # cumulative text grows monotonically
    for a, b in zip(chunks, chunks[1:]):
        assert b["text"].startswith(a["text"]) or a["text"] == ""


def test_deterministic_same_prompt(engine):
    sp = {"temperature": 0, "max_new_tokens": 6, "ignore_eos": True}
    o1 = engine.generate(prompt="w40 w41 w42 w43 w44", sampling_params=sp)
    o2 = engine.generate(prompt="w40 w41 w42 w43 w44", sampling_params=sp)
    assert o1["output_ids"] == o2["output_ids"]
    assert o2["meta_info"]["cached_tokens"] > 0  # radix hit on second run


def test_logprobs(engine):
    out = engine.generate(
        prompt="w50 w51 w52",
        sampling_params={"temperature": 0, "max_new_tokens": 4, "ignore_eos": True},
        return_logprob=True,
        top_logprobs_num=3,
    )
    lps = out["meta_info"]["output_token_logprobs"]
    assert len(lps) == 4
    for lp, tid, _ in lps:
        assert lp <= 0.0
    assert len(out["meta_info"]["output_top_logprobs"]) == 4


def test_n_parallel_sampling(engine):
    outs = engine.generate(
        prompt="w10 w11 w12",
        sampling_params={
            "temperature": 0.9, "top_p": 0.9, "max_new_tokens": 6,
            "n": 3, "sampling_seed": 7, "ignore_eos": True,
        },
    )
    assert isinstance(outs, list) and len(outs) == 3
    for i, o in enumerate(outs):
        assert len(o["output_ids"]) == 6
        assert o["index"] == i
    # distinct seeds per choice -> not all identical (overwhelmingly likely)
    assert len({tuple(o["output_ids"]) for o in outs}) >= 2


def test_sampling_seed_reproducible(engine):
    sp = {
        "temperature": 0.9,
        "top_p": 0.9,
        "max_new_tokens": 8,
        "sampling_seed": 1234,
        "ignore_eos": True,
    }
    o1 = engine.generate(prompt="w60 w61", sampling_params=dict(sp))
    o2 = engine.generate(prompt="w60 w61", sampling_params=dict(sp))
    assert o1["output_ids"] == o2["output_ids"]


def test_server_info_and_flush(engine):
    info = engine.get_server_info()
    assert info["max_total_tokens"] > 0
    assert engine.health()
    assert engine.flush_cache() in (True, False)


def test_stop_string(engine, tiny_llama_dir):
    # find what greedy generates, then stop on a substring of it
    base = engine.generate(
        prompt="w70 w71 w72",
        sampling_params={"temperature": 0, "max_new_tokens": 6, "ignore_eos": True},
    )
    words = base["text"].split()
    assert len(words) >= 3
    stop_word = words[2]
    out = engine.generate(
        prompt="w70 w71 w72",
        sampling_params={
            "temperature": 0,
            "max_new_tokens": 6,
            "stop": [stop_word],
            "ignore_eos": True,
        },
    )
    assert stop_word not in out["text"]
    assert out["meta_info"]["finish_reason"]["type"] == "stop"


def test_sessions_multi_turn(engine):
    sid = engine.open_session()
    o1 = engine.generate(
        prompt="w80 w81",
        sampling_params={"temperature": 0, "max_new_tokens": 3,
                         "ignore_eos": True},
        session_params={"id": sid},
    )
    o2 = engine.generate(
        prompt="w82",
        sampling_params={"temperature": 0, "max_new_tokens": 3,
                         "ignore_eos": True},
        session_params={"id": sid},
    )
    # turn 2 context includes turn 1 (prompt grows)
    assert o2["meta_info"]["prompt_tokens"] > o1["meta_info"]["prompt_tokens"]
    # the shared context should hit the radix cache
    assert o2["meta_info"]["cached_tokens"] > 0
    assert engine.close_session(sid)


def test_session_branching(engine):
    """Fork from an earlier turn via session_params.rid (ref
    srt/session/session_controller.py tree semantics)."""
    sp = {"temperature": 0, "max_new_tokens": 3, "ignore_eos": True}
    sid = engine.open_session()
    o1 = engine.generate(prompt="w80 w81", sampling_params=dict(sp),
                         session_params={"id": sid}, rid="turn1")
    o2 = engine.generate(prompt="w82", sampling_params=dict(sp),
                         session_params={"id": sid}, rid="turn2")
    # branch a SIBLING of turn2 off turn1: context is turn1's, not turn2's
    o3 = engine.generate(prompt="w83", sampling_params=dict(sp),
                         session_params={"id": sid, "rid": "turn1"},
                         rid="turn3")
    assert o3["meta_info"]["prompt_tokens"] == o2["meta_info"]["prompt_tokens"]
    # continue from the branch: prompt grows past turn3
    o4 = engine.generate(prompt="w84", sampling_params=dict(sp),
                         session_params={"id": sid, "rid": "turn3"})
    assert o4["meta_info"]["prompt_tokens"] > o3["meta_info"]["prompt_tokens"]
    tree = engine.tokenizer_manager.get_session_tree(sid)
    assert "turn1" in tree and tree.index("turn3") > tree.index("turn1")
    assert engine.close_session(sid)
    _ = o1


def test_session_replace_and_drop_output(engine):
    sp = {"temperature": 0, "max_new_tokens": 3, "ignore_eos": True}
    sid = engine.open_session()
    engine.generate(prompt="w90 w91", sampling_params=dict(sp),
                    session_params={"id": sid}, rid="root")
    engine.generate(prompt="w92", sampling_params=dict(sp),
                    session_params={"id": sid, "rid": "root"}, rid="a")
    # replace=True prunes 'a' (and descendants) before forking 'b'
    engine.generate(prompt="w93", sampling_params=dict(sp),
                    session_params={"id": sid, "rid": "root",
                                    "replace": True}, rid="b")
    sess = engine.tokenizer_manager.sessions[sid]
    assert "a" not in sess.nodes and "b" in sess.nodes
    assert [c.rid for c in sess.nodes["root"].children] == ["b"]
    # drop_previous_output: context excludes the parent's generated tokens
    o_drop = engine.generate(prompt="w94", sampling_params=dict(sp),
                             session_params={"id": sid, "rid": "root",
                                             "drop_previous_output": True})
    o_keep = engine.generate(prompt="w94", sampling_params=dict(sp),
                             session_params={"id": sid, "rid": "root"})
    assert (o_keep["meta_info"]["prompt_tokens"]
            - o_drop["meta_info"]["prompt_tokens"]) == 3  # the 3 output toks
    assert engine.close_session(sid)


def test_release_resume_memory(engine, tiny_llama_dir):
    import time as _t

    _t.sleep(0.5)  # let prior work settle
    ok, msg = engine.release_memory_occupation(["kv_cache"])
    assert ok, msg
    ok, msg = engine.resume_memory_occupation(["kv_cache"])
    assert ok, msg
    out = engine.generate(
        prompt="w90 w91",
        sampling_params={"temperature": 0, "max_new_tokens": 3,
                         "ignore_eos": True},
    )
    assert len(out["output_ids"]) == 3


def test_update_weights_from_tensor(engine):
    """RL weight push: replacing lm_head must change greedy outputs, and
    fused-slot tensors (k_proj -> kv_proj slot 0) must route correctly."""
    import numpy as np

    prompt = "w40 w41 w42 w43 w44"
    sp = {"temperature": 0, "max_new_tokens": 6, "ignore_eos": True}
    before = engine.generate(prompt=prompt, sampling_params=sp)["output_ids"]

    rng = np.random.default_rng(0)
    new_head = rng.standard_normal((256, 64), dtype=np.float32)
    ok, msg = engine.update_weights_from_tensor([("lm_head.weight", new_head)])
    assert ok, msg
    engine.flush_cache()
    after = engine.generate(prompt=prompt, sampling_params=sp)["output_ids"]
    assert after != before

    # fused slot update (k part of kv_proj) — must not error and must be
    # deterministic across calls
    new_k = rng.standard_normal((32, 64), dtype=np.float32) * 0.02
    ok, msg = engine.update_weights_from_tensor(
        [("model.layers.0.self_attn.k_proj.weight", new_k)]
    )
    assert ok, msg
    engine.flush_cache()
    a = engine.generate(prompt=prompt, sampling_params=sp)["output_ids"]
    b = engine.generate(prompt=prompt, sampling_params=sp)["output_ids"]
    assert a == b


def test_logit_bias(engine):
    """OpenAI-style logit_bias: a +100 bias must force that token."""
    out = engine.generate(
        prompt="w70 w71 w72",
        sampling_params={
            "temperature": 0,
            "max_new_tokens": 4,
            "ignore_eos": True,
            "logit_bias": {"123": 100.0},
        },
    )
    assert out["output_ids"] == [123, 123, 123, 123]
    # strong negative bias must exclude the token
    out2 = engine.generate(
        prompt="w70 w71 w72",
        sampling_params={
            "temperature": 0,
            "max_new_tokens": 4,
            "ignore_eos": True,
            "logit_bias": {"123": -100.0},
        },
    )
    assert 123 not in out2["output_ids"]


def test_stop_regex(engine):
    """stop_regex finishes the request when the decoded tail matches."""
    out = engine.generate(
        prompt="w80 w81 w82",
        sampling_params={
            "temperature": 0,
            "max_new_tokens": 12,
            "ignore_eos": True,
            "logit_bias": {"123": 100.0},  # force a predictable stream
            "stop_regex": r"w123\s*w123",
        },
    )
    assert out["meta_info"]["finish_reason"]["type"] == "stop"
    assert len(out["output_ids"]) < 12


def test_return_hidden_states(engine):
    """GenerateReqInput.return_hidden_states: one [H] vector per generated
    token in meta_info (ref io_struct.py return_hidden_states)."""
    out = engine.generate(
        prompt="w10 w11 w12",
        sampling_params={"temperature": 0.0, "max_new_tokens": 4,
                         "ignore_eos": True},
        return_hidden_states=True,
    )
    hs = out["meta_info"]["hidden_states"]
    assert len(hs) == 4
    H = len(hs[0])
    assert H > 0 and all(len(v) == H for v in hs)
    assert any(abs(x) > 0 for x in hs[0])
    # plain requests stay unaffected
    out2 = engine.generate(
        prompt="w10 w11 w12",
        sampling_params={"temperature": 0.0, "max_new_tokens": 4,
                         "ignore_eos": True},
    )
    assert "hidden_states" not in out2["meta_info"]
    assert out2["output_ids"] == out["output_ids"]


def test_custom_logit_processor(engine):
    """A serialized processor reshapes logits per step; params arrive as
    [B] arrays (sampling/custom_logit_processor.py; ref
    srt/sampling/custom_logit_processor.py)."""
    import jax.numpy as jnp

    from sglang_tpu.sampling.custom_logit_processor import (
        CustomLogitProcessor,
    )

    class ForceToken(CustomLogitProcessor):
        def __call__(self, logits, custom_params):
            tok = custom_params["token_id"].astype(jnp.int32)
            B = logits.shape[0]
            forced = jnp.full_like(logits, -1e30)
            forced = forced.at[jnp.arange(B), tok].set(0.0)
            return forced

    out = engine.generate(
        prompt="w10 w11 w12",
        sampling_params={"temperature": 0.0, "max_new_tokens": 4,
                         "ignore_eos": True,
                         "custom_params": {"token_id": 7}},
        custom_logit_processor=ForceToken().to_str(),
    )
    assert out["output_ids"] == [7, 7, 7, 7]
    # a second request with a different param value reuses the program
    out2 = engine.generate(
        prompt="w10 w11 w12",
        sampling_params={"temperature": 0.0, "max_new_tokens": 3,
                         "ignore_eos": True,
                         "custom_params": {"token_id": 9}},
        custom_logit_processor=ForceToken().to_str(),
    )
    assert out2["output_ids"] == [9, 9, 9]


def test_custom_logit_processor_requires_flag(tiny_llama_dir):
    """Pickled processors are rejected without
    --enable-custom-logit-processor (registry names always work)."""
    from sglang_tpu.sampling.custom_logit_processor import (
        resolve_custom_logit_processor,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="enable-custom-logit-processor"):
        resolve_custom_logit_processor("aGk=", allow_pickle=False)
