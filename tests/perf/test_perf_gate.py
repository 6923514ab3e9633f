"""Throughput gate: fails CI when the serving bench regresses.

Ref: /root/reference/test/registered/perf/test_bench_serving_1gpu_part1.py:41-43
(the reference asserts >3800 tok/s for Llama-3.1-8B on its 1-GPU runner).
This gate runs the repo bench (bench.py, 1B trend config) on the REAL TPU
and asserts a floor below the documented session-drift band (PERF_NOTES.md:
same-commit runs span roughly +-10%; r3 steady state ~2700-2800 tok/s).

Requires real hardware: enabled only with SGLANG_PERF_GATE=1 (run via
`python tests/run_suite.py --suite perf`), so the CPU suite skips it.
"""

import json
import os
import subprocess
import sys

import pytest

GATE_1B_TOK_S = 2400.0
# North-star config floor (ref test_bench_serving_1gpu_part1.py:41-43 gates
# 3800): set just under the round-4 recorded 733.5 so the number the whole
# project is judged on can't silently regress; raise each round.
GATE_8B_TOK_S = 650.0

_needs_tpu = pytest.mark.skipif(
    os.environ.get("SGLANG_PERF_GATE") != "1",
    reason="perf gate needs a real TPU; enable with SGLANG_PERF_GATE=1",
)


def _run_bench(only: str) -> dict:
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ, BENCH_ONLY=only)
    env.pop("JAX_PLATFORMS", None)  # the bench must see the TPU
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines()
            if l.strip().startswith("{")][-1]
    return json.loads(line)


@_needs_tpu
def test_bench_1b_throughput_gate():
    result = _run_bench("1b")
    tok_s = result["extra"]["1b"]
    assert tok_s and tok_s >= GATE_1B_TOK_S, (
        f"1B bench regressed: {tok_s} tok/s < gate {GATE_1B_TOK_S} "
        f"(full result: {result})"
    )


@_needs_tpu
def test_bench_8b_throughput_gate():
    result = _run_bench("8b")
    tok_s = result["extra"]["8b"]
    assert tok_s and tok_s >= GATE_8B_TOK_S, (
        f"8B north-star bench regressed: {tok_s} tok/s < gate "
        f"{GATE_8B_TOK_S} (full result: {result})"
    )
