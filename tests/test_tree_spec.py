"""EAGLE top-k TREE speculative decoding.

Ref: srt/speculative/eagle_worker_v2.py:489 (tree drafts), :1492 (tree
verify). Invariant under greedy: tree spec must produce byte-identical
outputs to plain decoding regardless of draft quality. The stub-worker
test force-feeds the TRUE continuation as one tree branch so multi-token
acceptance and the KV compaction path are actually exercised (subsequent
decode steps read the compacted slots — wrong compaction would diverge).
"""

import numpy as np

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.speculative.tree import (
    TreeDraft,
    accept_tree_greedy,
    chain_draft,
)


def test_accept_tree_greedy_walk():
    #       0
    #     /   \
    #    1(a)  2(b)
    #   /  \
    #  3(c) 4(d)
    tree = TreeDraft(
        tokens=[99, 10, 20, 30, 40],
        parents=np.asarray([-1, 0, 0, 1, 1], np.int32),
        depths=np.asarray([0, 1, 1, 2, 2], np.int32),
    )
    # target wants 10 at root, 40 at node 1, 7 at node 4 -> accept 1, 4
    tgt = {0: 10, 1: 40, 2: 55, 3: 66, 4: 7}
    target = np.asarray([tgt[i] for i in range(5)])
    emit, path = accept_tree_greedy(tree, target)
    assert emit == [10, 40, 7]
    assert path == [1, 4]
    # target rejects at root -> bonus only
    target2 = np.asarray([11, 0, 0, 0, 0])
    emit, path = accept_tree_greedy(tree, target2)
    assert emit == [11] and path == []
    # second branch
    target3 = np.asarray([20, 0, 33, 0, 0])
    emit, path = accept_tree_greedy(tree, target3)
    assert emit == [20, 33] and path == [2]


def test_padded_tree_never_accepts_padding():
    tree = chain_draft([5]).padded(4)
    assert tree.size == 4
    # target's token 0 equals the padding token id — must NOT accept
    target = np.asarray([0, 0, 0, 0])
    emit, path = accept_tree_greedy(tree, target)
    assert emit == [0] and path == []


def run_core(model_dir, prompts, n_new, spec_kw=None, stub=None):
    kw = dict(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=4096,
        max_running_requests=16,
    )
    if spec_kw:
        kw.update(spec_kw)
    args = ServerArgs(**kw)
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    if stub is not None:
        core.draft_worker = stub
    reqs = []
    for i, p in enumerate(prompts):
        sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                            ignore_eos=True)
        sp.normalize()
        r = Req(f"t{i}", p, sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 2000
    return [r.output_ids for r in reqs], core


def test_eagle_tree_matches_plain_greedy(tiny_llama_dir):
    """Dummy draft head, real protocol: outputs unchanged."""
    rng = np.random.default_rng(21)
    prompts = [
        [int(t) for t in rng.integers(3, 200, size=9)],
        [int(t) for t in rng.integers(3, 200, size=13)],
    ]
    plain, _ = run_core(tiny_llama_dir, prompts, 10)
    spec, core = run_core(
        tiny_llama_dir, prompts, 10,
        spec_kw=dict(
            speculative_algorithm="EAGLE",
            speculative_num_draft_tokens=5,
            speculative_eagle_topk=2,
            speculative_num_steps=2,
            load_format="auto",
        ),
    )
    assert spec == plain
    assert core.num_spec_steps > 0


class _StubTreeWorker:
    """Drafts the known true continuation as the first branch plus junk
    siblings — acceptance must take the whole path every round."""

    is_tree = True
    needs_hidden = False

    def __init__(self, continuations, depth=3):
        self.continuations = continuations  # rid -> full output list
        self.depth = depth
        self.tree_size = 1 + 2 * depth  # chain of `depth` + junk siblings
        self.budget = self.tree_size

    def propose_tree(self, reqs):
        out = []
        for req in reqs:
            done = len(req.output_ids)
            cont = self.continuations[req.rid][done:done + self.depth]
            if not cont:
                out.append(None)
                continue
            tokens = [req.all_ids[-1]]
            parents = [-1]
            depths = [0]
            prev = 0
            for d, tok in enumerate(cont):
                # true child
                tokens.append(int(tok))
                parents.append(prev)
                depths.append(d + 1)
                true_id = len(tokens) - 1
                # junk sibling (guaranteed-wrong token id)
                tokens.append(1)
                parents.append(prev)
                depths.append(d + 1)
                prev = true_id
            out.append(TreeDraft(
                tokens=tokens,
                parents=np.asarray(parents, np.int32),
                depths=np.asarray(depths, np.int32),
            ))
        return out

    def observe_and_extend(self, entries, hidden):
        pass

    def release(self, rid):
        pass


def test_tree_multi_accept_and_kv_compaction(tiny_llama_dir):
    """Force full-path acceptance: every round must commit depth+1 tokens
    and later decode/verify rounds must read correct (compacted) KV."""
    rng = np.random.default_rng(33)
    prompts = [
        [int(t) for t in rng.integers(3, 200, size=11)],
        [int(t) for t in rng.integers(3, 200, size=7)],
    ]
    n_new = 12
    plain, _ = run_core(tiny_llama_dir, prompts, n_new)
    conts = {f"t{i}": plain[i] for i in range(len(prompts))}
    stub = _StubTreeWorker(conts, depth=3)
    spec, core = run_core(
        tiny_llama_dir, prompts, n_new,
        spec_kw=dict(speculative_algorithm="NGRAM"),  # enables spec loop
        stub=stub,
    )
    assert spec == plain
    # full-path acceptance: ~3 accepted per round
    assert core.num_spec_accepted >= len(prompts) * (n_new // 4 - 1) * 3


def test_accept_tree_sampled_distribution():
    """Monte-Carlo: the rejection-sampled walk over deterministic draft
    proposals must emit the FIRST token exactly from the target
    distribution p, for any candidate set."""
    from sglang_tpu.speculative.tree import accept_tree_sampled

    rng = np.random.default_rng(0)
    V = 6
    p = np.asarray([0.3, 0.25, 0.2, 0.1, 0.1, 0.05])
    # root with two draft children: tokens 1 and 3
    tree = TreeDraft(
        tokens=[99, 1, 3],
        parents=np.asarray([-1, 0, 0], np.int32),
        depths=np.asarray([0, 1, 1], np.int32),
    )
    p_cand = np.zeros((3, 2), np.float32)
    p_cand[0] = [p[1], p[3]]  # root's candidates
    counts = np.zeros(V)
    n = 40000
    for _ in range(n):
        # fallback: sample from p excluding {1, 3}, renormalized
        q = p.copy()
        q[[1, 3]] = 0
        q /= q.sum()
        fb = rng.choice(V, p=q)
        fb_tok = np.asarray([fb, 0, 0])
        fb_lp = np.log(np.maximum([p[fb], 1, 1], 1e-20))
        emit, path, lps = accept_tree_sampled(
            tree, p_cand, fb_tok, fb_lp, rng.random
        )
        counts[emit[0]] += 1
    freq = counts / n
    np.testing.assert_allclose(freq, p, atol=0.012)


def test_tree_sampled_mixed_batch_greedy_rows_exact(tiny_llama_dir):
    """A mixed batch (greedy + temperature rows) through the sampled tree
    path: the GREEDY row's output must stay byte-identical to plain
    decoding; the sampled row must emit valid tokens with finite
    logprobs."""
    rng = np.random.default_rng(41)
    g_prompt = [int(t) for t in rng.integers(3, 200, size=10)]
    s_prompt = [int(t) for t in rng.integers(3, 200, size=8)]

    plain, _ = run_core(tiny_llama_dir, [g_prompt], 10)

    from sglang_tpu.core.req import Req
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=4096,
        max_running_requests=16,
        speculative_algorithm="EAGLE",
        speculative_num_draft_tokens=5,
        speculative_eagle_topk=2,
        speculative_num_steps=2,
        load_format="auto",
        random_seed=3,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    sp_g = SamplingParams(temperature=0.0, max_new_tokens=10,
                          ignore_eos=True)
    sp_g.normalize()
    rg = Req("g", list(g_prompt), sp_g)
    rg.return_logprob = True
    sp_s = SamplingParams(temperature=0.8, top_p=0.9, max_new_tokens=10,
                          ignore_eos=True)
    sp_s.normalize()
    rs = Req("s", list(s_prompt), sp_s)
    rs.return_logprob = True
    core.add_request(rg)
    core.add_request(rs)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 2000
    assert rg.output_ids == plain[0]
    assert len(rs.output_ids) == 10
    assert all(np.isfinite(lp) and lp <= 0 for lp in rs.output_logprobs)
    assert core.num_spec_steps > 0
