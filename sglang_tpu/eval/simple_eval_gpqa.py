"""GPQA multiple-choice eval with shuffled options.

Ref: python/sglang/test/simple_eval_gpqa.py. Data: local csv with
fields Question, Correct Answer, Incorrect Answer 1..3 (the
gpqa_diamond csv).
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


class GPQAEval:
    def __init__(self, data_path: str, num_examples: int = 0,
                 seed: int = 0):
        with open(data_path, newline="") as f:
            rows = list(csv.DictReader(f))
        rng = random.Random(seed)
        if num_examples and num_examples < len(rows):
            rows = rng.sample(rows, num_examples)
        self.examples = []
        for row in rows:
            opts = [row["Correct Answer"], row["Incorrect Answer 1"],
                    row["Incorrect Answer 2"], row["Incorrect Answer 3"]]
            perm = rng.sample(range(4), 4)
            gold = "ABCD"[perm.index(0)]
            shuffled = [opts[i] for i in perm]
            self.examples.append((row["Question"], shuffled, gold))

    def __call__(self, sampler) -> "EvalResult":
        def one(ex):
            question, opts, gold = ex
            prompt = QUERY_TEMPLATE.format(
                Question=question, A=opts[0], B=opts[1], C=opts[2],
                D=opts[3],
            )
            resp = sampler([{"role": "user", "content": prompt}])
            return 1.0 if extract_mc_answer(resp) == gold else 0.0

        return aggregate(map_with_progress(one, self.examples))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", required=True)
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--num-examples", type=int, default=0)
    args = ap.parse_args()
    ev = GPQAEval(args.data_path, args.num_examples)
    res = ev(ChatCompletionSampler(args.base_url, max_tokens=2048))
    print({"score": res.score, "n": res.n})


if __name__ == "__main__":
    main()
