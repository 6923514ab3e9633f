"""MMLU multiple-choice eval. Ref: python/sglang/test/simple_eval_mmlu.py.

Data: local csv with columns Question,A,B,C,D,Answer (the standard MMLU
test csv). Usage:
    python -m sglang_tpu.eval.simple_eval_mmlu --base-url http://H:P \
        --data-path mmlu.csv --num-examples 200
"""

from __future__ import annotations

import argparse
import csv
import random

from sglang_tpu.eval.simple_eval_common import (
    ChatCompletionSampler,
    aggregate,
    extract_mc_answer,
    map_with_progress,
)

QUERY_TEMPLATE = """Answer the following multiple choice question. The
last line of your response should be of the following format:
'Answer: $LETTER' (without quotes) where LETTER is one of ABCD. Think
step by step before answering.

{Question}

A) {A}
B) {B}
C) {C}
D) {D}
""".strip()


class MMLUEval:
    def __init__(self, data_path: str, num_examples: int = 0, seed: int = 0):
        with open(data_path, newline="") as f:
            rows = list(csv.DictReader(f))
        if num_examples and num_examples < len(rows):
            rows = random.Random(seed).sample(rows, num_examples)
        self.rows = rows

    def __call__(self, sampler) -> "EvalResult":
        def one(row):
            prompt = QUERY_TEMPLATE.format(**row)
            resp = sampler([{"role": "user", "content": prompt}])
            got = extract_mc_answer(resp)
            return 1.0 if got == row["Answer"].strip().upper() else 0.0

        return aggregate(map_with_progress(one, self.rows))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", required=True)
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--num-examples", type=int, default=0)
    ap.add_argument("--max-tokens", type=int, default=1024)
    args = ap.parse_args()
    ev = MMLUEval(args.data_path, args.num_examples)
    res = ev(ChatCompletionSampler(args.base_url,
                                   max_tokens=args.max_tokens))
    print({"score": res.score, "n": res.n})


if __name__ == "__main__":
    main()
