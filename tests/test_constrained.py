"""Native grammar engine tests (ref: srt/constrained/, test strategy
test/registered/constrained_decoding)."""

import json

import numpy as np
import pytest

from sglang_tpu.constrained.json_schema import json_schema_to_regex
from sglang_tpu.constrained.regex_fsm import compile_regex
from sglang_tpu.constrained.token_mask import MaskCache, TokenTrie


def accepts(dfa, s: str) -> bool:
    st = dfa.walk(0, s.encode())
    return st >= 0 and dfa.is_accepting(st)


def test_regex_basics():
    dfa = compile_regex(r"ab+c?")
    assert accepts(dfa, "ab")
    assert accepts(dfa, "abbbc")
    assert not accepts(dfa, "ac")
    assert not accepts(dfa, "abcc")

    dfa = compile_regex(r"(foo|bar){2,3}")
    assert accepts(dfa, "foobar")
    assert accepts(dfa, "barbarfoo")
    assert not accepts(dfa, "foo")
    assert not accepts(dfa, "foofoofoofoo")

    dfa = compile_regex(r"[a-c]\d{2}")
    assert accepts(dfa, "b42")
    assert not accepts(dfa, "d42")
    assert not accepts(dfa, "b4")

    dfa = compile_regex(r"-?\d+(?:\.\d+)?")
    assert accepts(dfa, "-3.14")
    assert accepts(dfa, "42")
    assert not accepts(dfa, "1.")


def test_regex_char_class_negation():
    dfa = compile_regex(r'"[^"]*"')
    assert accepts(dfa, '"hello world"')
    assert not accepts(dfa, '"a"b"')


@pytest.mark.parametrize(
    "schema,good,bad",
    [
        (
            {"type": "object", "properties": {"a": {"type": "integer"},
                                              "b": {"type": "boolean"}}},
            '{"a": 5, "b": true}',
            '{"a": true, "b": 5}',
        ),
        (
            {"type": "array", "items": {"type": "integer"}, "maxItems": 3},
            "[1, 2, 3]",
            '["x"]',
        ),
        (
            {"enum": ["red", "green", 7]},
            '"green"',
            '"blue"',
        ),
        (
            {"type": "object", "properties": {
                "name": {"type": "string", "maxLength": 10},
                "tags": {"type": "array", "items": {"type": "string"}},
            }},
            '{"name": "bob", "tags": ["x", "y"]}',
            '{"name": 42}',
        ),
    ],
)
def test_json_schema_accepts(schema, good, bad):
    dfa = compile_regex(json_schema_to_regex(schema))
    assert accepts(dfa, good), good
    assert not accepts(dfa, bad), bad


def test_token_mask_brute_force():
    vocab = [b"a", b"b", b"ab", b"ba", b"abc", b"c", b"<eos>"]
    eos_id = 6
    trie = TokenTrie(vocab, len(vocab))
    dfa = compile_regex(r"(ab)+c")
    cache = MaskCache(dfa, trie, [eos_id])

    def allowed_set(state):
        packed = cache.get_mask(state)
        bits = np.unpackbits(packed.view(np.uint8), bitorder="little")
        return {i for i in range(len(vocab)) if bits[i]}

    # state 0: tokens that are a live prefix path: a, ab, abc
    assert allowed_set(0) == {0, 2, 4}
    s_a = dfa.walk(0, b"a")
    assert allowed_set(s_a) == {1, 3}  # "b", "ba"
    s_abc = dfa.walk(0, b"abc")
    assert dfa.is_accepting(s_abc)
    assert eos_id in allowed_set(s_abc)


def test_matcher_accept_and_jump(tiny_llama_dir):
    from sglang_tpu.constrained.grammar_backend import GrammarBackend
    from sglang_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(tiny_llama_dir)
    backend = GrammarBackend(tok, [tok.eos_token_id], vocab_size=256)
    # tokens decode as "w<N>"; build a regex over those strings
    m = backend.get_matcher("regex", r"w10w11w12")
    tid = tok.convert_tokens_to_ids("w10")
    assert m.accept_token(tid)
    forced = m.jump_forward()
    assert forced == b"w11w12"


def test_e2e_regex_constrained(tiny_llama_dir):
    """Greedy decode constrained to a regex over token strings."""
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs
    from sglang_tpu.tokenizer import get_tokenizer

    args = ServerArgs(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
    )
    runner = ModelRunner(args)
    tok = get_tokenizer(tiny_llama_dir)
    core = ScheduleCore(args, runner, tok)

    # constrain outputs to tokens w20/w21 three times then w30
    sp = SamplingParams(
        temperature=0.0, max_new_tokens=10,
        regex=r"(w20|w21){3}w3",
    )
    sp.normalize()
    req = Req("g1", [5, 6, 7], sp)
    core.add_request(req)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 200
    texts = [tok.decode([t]) for t in req.output_ids]
    assert texts[:3] != [] and all(t in ("w20", "w21") for t in texts[:3])
    assert texts[3] == "w3"
    # after w3 the grammar accepts -> EOS allowed; greedy may stop or hit
    # max_new_tokens; either way the constrained segment must be exact.


def test_e2e_jump_forward(tiny_llama_dir):
    """Deterministic grammar runs are emitted without model steps and the
    request re-extends over the forced tokens (scheduler jump-forward)."""
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs
    from sglang_tpu.tokenizer import get_tokenizer

    args = ServerArgs(
        model_path=tiny_llama_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=2048,
    )
    runner = ModelRunner(args)
    tok = get_tokenizer(tiny_llama_dir)
    core = ScheduleCore(args, runner, tok)

    sp = SamplingParams(
        temperature=0.0, max_new_tokens=12,
        regex=r"w20w21w22w23w24w25",
    )
    sp.normalize()
    req = Req("jf", [5, 6, 7], sp)
    core.add_request(req)
    decode_steps = 0
    while core.has_work():
        core.step()
        decode_steps += 1
        assert decode_steps < 200
    texts = [tok.decode([t]) for t in req.output_ids]
    assert texts[:6] == ["w20", "w21", "w22", "w23", "w24", "w25"], texts
    # w21..w25 (5 tokens) must have been jump-forwarded, not decoded
    assert core.num_jump_tokens >= 4, core.num_jump_tokens


def test_ebnf_to_regex():
    from sglang_tpu.constrained.ebnf import ebnf_to_regex

    grammar = r'''
# choose an action
root   ::= action " " target
action ::= "move" | "take" | "look"
target ::= [a-z]{1,8}
'''
    dfa = compile_regex(ebnf_to_regex(grammar))
    assert accepts(dfa, "move north")
    assert accepts(dfa, "take lamp")
    assert not accepts(dfa, "run fast")
    assert not accepts(dfa, "move NORTH")


def test_ebnf_quantifiers_and_groups():
    from sglang_tpu.constrained.ebnf import ebnf_to_regex

    grammar = r'''
root ::= "id-" digit+ ("," digit+)*
digit ::= [0-9]
'''
    dfa = compile_regex(ebnf_to_regex(grammar))
    assert accepts(dfa, "id-42")
    assert accepts(dfa, "id-1,22,333")
    assert not accepts(dfa, "id-")


def test_ebnf_recursion_rejected():
    from sglang_tpu.constrained.ebnf import EbnfError, ebnf_to_regex

    grammar = 'root ::= "(" root ")" | "x"'
    import pytest as _pytest

    with _pytest.raises(EbnfError):
        ebnf_to_regex(grammar)


def test_structural_tag_end_to_end(tiny_llama_dir):
    """Structural tags: free text until the `begin` trigger appears, then
    schema/regex-constrained content, then free text again."""
    import json

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=tiny_llama_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=2048, max_running_requests=8,
    )
    runner = ModelRunner(args)
    from sglang_tpu.tokenizer import get_tokenizer

    core = ScheduleCore(args, runner, get_tokenizer(tiny_llama_dir, False))
    tag = {
        "type": "structural_tag",
        "structures": [{"begin": "w9", "regex": "w5w6", "end": ""}],
        "triggers": ["w9"],
    }
    sp = SamplingParams(
        temperature=0.0, max_new_tokens=6, ignore_eos=True,
        logit_bias={"9": 100.0},  # free-text steps always pick w9
        structural_tag=json.dumps(tag),
    )
    sp.normalize()
    req = Req("st", [10, 11, 12], sp)
    core.add_request(req)
    n = 0
    while core.has_work():
        core.step()
        n += 1
        assert n < 200
    # trigger -> constrained w5 w6 -> detach -> trigger again -> ...
    assert req.output_ids == [9, 5, 6, 9, 5, 6], req.output_ids
