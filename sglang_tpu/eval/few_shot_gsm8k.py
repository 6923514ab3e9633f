"""Few-shot GSM8K accuracy eval against a running server.

Ref: python/sglang/test/few_shot_gsm8k.py (accuracy gates in CI).
Needs the GSM8K jsonl locally (zero-egress images can't download):

    python -m sglang_tpu.eval.few_shot_gsm8k --base-url http://...:30000 \
        --data-path /path/to/gsm8k_test.jsonl --num-questions 200
"""

from __future__ import annotations

import argparse
import asyncio
import json
import re
import sys

import aiohttp

FEW_SHOT = """Question: There are 15 trees in the grove. Grove workers will plant trees in the grove today. After they are done, there will be 21 trees. How many trees did the grove workers plant today?
Answer: There are 15 trees originally. Then there were 21 trees after some more were planted. So there must have been 21 - 15 = 6. The answer is 6.

Question: If there are 3 cars in the parking lot and 2 more cars arrive, how many cars are in the parking lot?
Answer: There are originally 3 cars. 2 more cars arrive. 3 + 2 = 5. The answer is 5.

Question: Leah had 32 chocolates and her sister had 42. If they ate 35, how many pieces do they have left in total?
Answer: Originally, Leah had 32 chocolates. Her sister had 42. So in total they had 32 + 42 = 74. After eating 35, they had 74 - 35 = 39. The answer is 39.

Question: Jason had 20 lollipops. He gave Denny some lollipops. Now Jason has 12 lollipops. How many lollipops did Jason give to Denny?
Answer: Jason started with 20 lollipops. Then he had 12 after giving some to Denny. So he gave Denny 20 - 12 = 8. The answer is 8.

"""

ANS_RE = re.compile(r"The answer is\s*(-?[\d,]+)")
GOLD_RE = re.compile(r"####\s*(-?[\d,]+)")


def _norm(s: str):
    return s.replace(",", "").strip()


async def eval_one(session, base_url, q, gold, results):
    prompt = FEW_SHOT + f"Question: {q}\nAnswer:"
    async with session.post(
        base_url + "/generate",
        json={
            "text": prompt,
            "sampling_params": {
                "max_new_tokens": 256,
                "temperature": 0.0,
                "stop": ["Question:", "\n\n"],
            },
        },
    ) as resp:
        out = await resp.json()
    m = ANS_RE.search(out.get("text", ""))
    pred = _norm(m.group(1)) if m else None
    results.append(pred == _norm(gold))


async def run(args):
    items = []
    with open(args.data_path) as f:
        for line in f:
            d = json.loads(line)
            g = GOLD_RE.search(d["answer"])
            if g:
                items.append((d["question"], g.group(1)))
            if len(items) >= args.num_questions:
                break
    results = []
    async with aiohttp.ClientSession() as sess:
        await asyncio.gather(
            *(eval_one(sess, args.base_url, q, a, results) for q, a in items)
        )
    acc = sum(results) / max(len(results), 1)
    print(json.dumps({"num_questions": len(results), "accuracy": acc}))
    return acc


def main(argv=None):
    parser = argparse.ArgumentParser("sglang-tpu gsm8k eval")
    parser.add_argument("--base-url", default="http://127.0.0.1:30000")
    parser.add_argument("--data-path", required=True)
    parser.add_argument("--num-questions", type=int, default=200)
    args = parser.parse_args(argv)
    asyncio.run(run(args))


if __name__ == "__main__":
    main()
