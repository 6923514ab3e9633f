"""MATH / AIME-style numeric-answer eval.

Ref: python/sglang/test/simple_eval_math.py + simple_eval_aime25.py.
Data: local jsonl with fields {problem|question, answer}. Grading is
loose numeric equality on the extracted 'Answer:' line (the reference
uses an LLM grader; numeric equality covers AIME/GSM-style answers
without needing a second model).
"""

from __future__ import annotations

import argparse
import json

from sglang_tpu.eval.simple_eval_common import (
    ANSWER_PATTERN,
    ChatCompletionSampler,
    aggregate,
    map_with_progress,
    math_equal,
)

QUERY_TEMPLATE = """Solve the following math problem step by step. The
last line of your response should be of the form Answer: $ANSWER
(without quotes) where $ANSWER is the answer to the problem.

{problem}

Remember to put your answer on its own line after "Answer:".
""".strip()


class MathEval:
    def __init__(self, data_path: str, num_examples: int = 0):
        with open(data_path) as f:
            rows = [json.loads(l) for l in f if l.strip()]
        if num_examples:
            rows = rows[:num_examples]
        self.rows = rows

    def __call__(self, sampler) -> "EvalResult":
        def one(row):
            problem = row.get("problem") or row.get("question")
            resp = sampler([{
                "role": "user",
                "content": QUERY_TEMPLATE.format(problem=problem),
            }])
            m = ANSWER_PATTERN.search(resp)
            got = m.group(1) if m else ""
            return 1.0 if math_equal(got, str(row["answer"])) else 0.0

        return aggregate(map_with_progress(one, self.rows))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", required=True)
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--num-examples", type=int, default=0)
    ap.add_argument("--max-tokens", type=int, default=4096)
    args = ap.parse_args()
    ev = MathEval(args.data_path, args.num_examples)
    res = ev(ChatCompletionSampler(args.base_url,
                                   max_tokens=args.max_tokens))
    print({"score": res.score, "n": res.n})


if __name__ == "__main__":
    main()
