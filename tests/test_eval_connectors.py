"""Offline units for the eval harnesses and connector factory.

Ref: python/sglang/test/simple_eval_* scoring behavior and
srt/connector/ URL dispatch. The graded paths run without a server —
answer extraction, math equality, HumanEval sandboxed execution, and
the file:// connector round trip.
"""

import json
import os

import numpy as np
import pytest


def test_mc_answer_extraction():
    from sglang_tpu.eval.simple_eval_common import extract_mc_answer

    assert extract_mc_answer("blah blah\nAnswer: C") == "C"
    assert extract_mc_answer("Answer: $B$") == "B"
    assert extract_mc_answer("answer:  d") == "D"
    assert extract_mc_answer("no answer here") is None


def test_math_equal():
    from sglang_tpu.eval.simple_eval_common import math_equal

    assert math_equal("1,024", "1024")
    assert math_equal("$3.50", "3.5")
    assert not math_equal("12", "13")
    assert math_equal("0.5000000001", "0.5")


def test_humaneval_sandbox_pass_and_fail():
    from sglang_tpu.eval.simple_eval_humaneval import check_correctness

    test = "def check(f):\n    assert f(2) == 4\n    assert f(3) == 9\n"
    good = "def sq(x):\n    return x * x\n"
    bad = "def sq(x):\n    return x + x\n"
    hang = "def sq(x):\n    while True:\n        pass\n"
    assert check_correctness(good, test, "sq")
    assert not check_correctness(bad, test, "sq")
    assert not check_correctness(hang, test, "sq", timeout=2.0)


def test_humaneval_code_extraction():
    from sglang_tpu.eval.simple_eval_humaneval import extract_code

    prompt = "def add(a, b):\n    \"\"\"Add.\"\"\"\n"
    fenced = "```python\ndef add(a, b):\n    return a + b\n```"
    assert "return a + b" in extract_code(fenced, prompt)
    body_only = "    return a + b\n"
    assert extract_code(body_only, prompt).startswith("def add")


def test_gpqa_shuffle_is_deterministic(tmp_path):
    import csv

    from sglang_tpu.eval.simple_eval_gpqa import GPQAEval

    p = tmp_path / "gpqa.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[
            "Question", "Correct Answer", "Incorrect Answer 1",
            "Incorrect Answer 2", "Incorrect Answer 3"])
        w.writeheader()
        w.writerow({"Question": "Q1", "Correct Answer": "right",
                    "Incorrect Answer 1": "w1", "Incorrect Answer 2": "w2",
                    "Incorrect Answer 3": "w3"})
    e1 = GPQAEval(str(p))
    e2 = GPQAEval(str(p))
    assert e1.examples == e2.examples
    q, opts, gold = e1.examples[0]
    assert opts["ABCD".index(gold)] == "right"


def test_mmlu_scoring_with_fake_sampler(tmp_path):
    import csv

    from sglang_tpu.eval.simple_eval_mmlu import MMLUEval

    p = tmp_path / "mmlu.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["Question", "A", "B", "C", "D",
                                          "Answer"])
        w.writeheader()
        w.writerow({"Question": "2+2?", "A": "3", "B": "4", "C": "5",
                    "D": "6", "Answer": "B"})
        w.writerow({"Question": "1+1?", "A": "2", "B": "4", "C": "5",
                    "D": "6", "Answer": "A"})
    ev = MMLUEval(str(p))
    res = ev(lambda msgs: "thinking...\nAnswer: B")
    assert res.n == 2 and abs(res.score - 0.5) < 1e-9


def test_file_connector_roundtrip(tmp_path):
    import safetensors.numpy as st

    from sglang_tpu.connector import create_remote_connector

    src = tmp_path / "model"
    os.makedirs(src)
    st.save_file({"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
                 str(src / "model.safetensors"))
    (src / "config.json").write_text(json.dumps({"a": 1}))

    with create_remote_connector(f"file://{src}") as conn:
        ws = dict(conn.weight_iterator())
        assert list(ws) == ["w"] and ws["w"].shape == (2, 3)
        conn.pull_files(allow_pattern=["*.json"])
        assert os.path.exists(os.path.join(conn.get_local_dir(),
                                           "config.json"))
        assert not os.path.exists(os.path.join(conn.get_local_dir(),
                                               "model.safetensors"))


def test_connector_scheme_gating():
    from sglang_tpu.connector import create_remote_connector

    with pytest.raises(ImportError):
        create_remote_connector("s3://bucket/model")
    with pytest.raises(ValueError):
        create_remote_connector("ftp://x/y")
