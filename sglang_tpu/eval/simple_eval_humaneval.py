"""HumanEval pass@1 eval (execution-based).

Ref: python/sglang/test/simple_eval_humaneval.py. Data: local
HumanEval.jsonl (fields task_id, prompt, entry_point, test). Generated
completions run in a subprocess sandbox with a timeout; pass@1 =
fraction of tasks whose checks all pass.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import re

from sglang_tpu.eval.simple_eval_common import (
    ChatCompletionSampler,
    aggregate,
    map_with_progress,
)

INSTRUCTION = ("Read the following function signature and docstring, and "
               "fully implement the function described. Your response "
               "should only contain the code for this function.\n")

CODE_BLOCK = re.compile(r"```(?:python)?\n(.*?)```", re.DOTALL)


def extract_code(response: str, prompt: str) -> str:
    m = CODE_BLOCK.search(response)
    body = m.group(1) if m else response
    # If the model repeated the signature, run the body standalone;
    # otherwise append it to the official prompt.
    if "def " in body:
        return body
    return prompt + body


def _run_check(code: str, test: str, entry_point: str, q):
    try:
        env: dict = {}
        exec(code, env)
        exec(test, env)
        env["check"](env[entry_point])
        q.put(True)
    except BaseException:
        q.put(False)


def check_correctness(code: str, test: str, entry_point: str,
                      timeout: float = 10.0) -> bool:
    # fork, not spawn: a spawned child re-runs sitecustomize (device
    # plugin init) which can hang far beyond the check timeout.
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    p = ctx.Process(target=_run_check, args=(code, test, entry_point, q))
    p.start()
    p.join(timeout)
    if p.is_alive():
        p.terminate()
        p.join()
        return False
    try:
        return bool(q.get_nowait())
    except Exception:
        return False


class HumanEval:
    def __init__(self, data_path: str, num_examples: int = 0):
        with open(data_path) as f:
            tasks = [json.loads(l) for l in f if l.strip()]
        if num_examples:
            tasks = tasks[:num_examples]
        self.tasks = tasks

    def __call__(self, sampler) -> "EvalResult":
        def one(task):
            resp = sampler([{
                "role": "user",
                "content": INSTRUCTION + task["prompt"],
            }])
            code = extract_code(resp, task["prompt"])
            ok = check_correctness(code, task["test"],
                                   task["entry_point"])
            return 1.0 if ok else 0.0

        return aggregate(map_with_progress(one, self.tasks, num_threads=4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", required=True)
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--num-examples", type=int, default=0)
    args = ap.parse_args()
    ev = HumanEval(args.data_path, args.num_examples)
    res = ev(ChatCompletionSampler(args.base_url, max_tokens=2048))
    print({"pass@1": res.score, "n": res.n})


if __name__ == "__main__":
    main()
