"""Byte-level regex -> DFA compiler (the core of the native grammar engine).

The reference uses xgrammar (srt/constrained/xgrammar_backend.py); that
library isn't in this image, so this is a from-scratch engine. Pipeline:

    regex string -> AST -> NFA (Thompson) -> DFA (subset construction,
    lazy/complete) over UTF-8 BYTES (alphabet 0..255)

Byte-level matching composes directly with BPE token byte sequences for
token-bitmask computation (token_mask.py). Supported syntax: literals,
escapes (\\d \\w \\s \\. etc.), classes [a-z^...], '.', anchors are
implicit (whole-string match), groups (), alternation |, quantifiers
* + ? {m,n}, non-capturing (?:...).
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Optional, Set, Tuple

BYTE_ALPHABET = 256


# ---------------------------------------------------------------- regex AST
class Node:
    pass


class Lit(Node):  # byte set (one consumed byte from the set)
    def __init__(self, bytes_set: Set[int]):
        self.bytes_set = bytes_set


class Seq(Node):
    def __init__(self, parts: List[Node]):
        self.parts = parts


class Alt(Node):
    def __init__(self, options: List[Node]):
        self.options = options


class Repeat(Node):
    def __init__(self, inner: Node, lo: int, hi: Optional[int]):
        self.inner = inner
        self.lo = lo
        self.hi = hi  # None = unbounded


CLASS_D = set(range(ord("0"), ord("9") + 1))
CLASS_W = (
    CLASS_D
    | set(range(ord("a"), ord("z") + 1))
    | set(range(ord("A"), ord("Z") + 1))
    | {ord("_")}
)
CLASS_S = {ord(" "), ord("\t"), ord("\n"), ord("\r"), 0x0B, 0x0C}
ANY_BYTE = set(range(BYTE_ALPHABET)) - {ord("\n")}
ALL_BYTES = set(range(BYTE_ALPHABET))


class RegexParser:
    def __init__(self, pattern: str):
        self.src = pattern.encode("utf-8")
        self.pos = 0

    def parse(self) -> Node:
        node = self._alt()
        if self.pos != len(self.src):
            raise ValueError(
                f"unexpected char at {self.pos}: {chr(self.src[self.pos])!r}"
            )
        return node

    def _peek(self) -> int:
        return self.src[self.pos] if self.pos < len(self.src) else -1

    def _next(self) -> int:
        b = self.src[self.pos]
        self.pos += 1
        return b

    def _alt(self) -> Node:
        opts = [self._seq()]
        while self._peek() == ord("|"):
            self._next()
            opts.append(self._seq())
        return opts[0] if len(opts) == 1 else Alt(opts)

    def _seq(self) -> Node:
        parts: List[Node] = []
        while True:
            c = self._peek()
            if c in (-1, ord("|"), ord(")")):
                break
            parts.append(self._quant())
        return Seq(parts)

    def _quant(self) -> Node:
        atom = self._atom()
        while True:
            c = self._peek()
            if c == ord("*"):
                self._next()
                atom = Repeat(atom, 0, None)
            elif c == ord("+"):
                self._next()
                atom = Repeat(atom, 1, None)
            elif c == ord("?"):
                self._next()
                atom = Repeat(atom, 0, 1)
            elif c == ord("{"):
                save = self.pos
                self._next()
                spec = bytearray()
                while self._peek() not in (-1, ord("}")):
                    spec.append(self._next())
                if self._peek() != ord("}"):
                    self.pos = save
                    break
                self._next()
                s = spec.decode()
                if "," in s:
                    lo_s, hi_s = s.split(",", 1)
                    lo = int(lo_s) if lo_s else 0
                    hi = int(hi_s) if hi_s.strip() else None
                else:
                    lo = hi = int(s)
                atom = Repeat(atom, lo, hi)
            else:
                break
        return atom

    def _atom(self) -> Node:
        c = self._next()
        if c == ord("("):
            if self._peek() == ord("?"):
                self._next()
                nxt = self._next()
                if nxt != ord(":"):
                    raise ValueError("only (?:...) groups supported")
            node = self._alt()
            if self._next() != ord(")"):
                raise ValueError("unbalanced parens")
            return node
        if c == ord("["):
            return Lit(self._char_class())
        if c == ord("."):
            return Lit(set(ANY_BYTE))
        if c == ord("\\"):
            return Lit(self._escape(self._next()))
        if c in (ord("^"), ord("$")):
            return Seq([])  # whole-string semantics: anchors are no-ops
        return Lit(self._literal_bytes(c))

    def _literal_bytes(self, first: int) -> Set[int]:
        return {first}

    def _escape(self, c: int) -> Set[int]:
        table = {
            ord("d"): set(CLASS_D),
            ord("D"): ALL_BYTES - CLASS_D,
            ord("w"): set(CLASS_W),
            ord("W"): ALL_BYTES - CLASS_W,
            ord("s"): set(CLASS_S),
            ord("S"): ALL_BYTES - CLASS_S,
            ord("n"): {ord("\n")},
            ord("t"): {ord("\t")},
            ord("r"): {ord("\r")},
        }
        if c in table:
            return set(table[c])
        if c == ord("x"):
            h = chr(self._next()) + chr(self._next())
            return {int(h, 16)}
        return {c}  # escaped literal (\. \\ \" \{ ...)

    def _char_class(self) -> Set[int]:
        negate = False
        if self._peek() == ord("^"):
            self._next()
            negate = True
        out: Set[int] = set()
        first = True
        while True:
            c = self._peek()
            if c == -1:
                raise ValueError("unterminated character class")
            if c == ord("]") and not first:
                self._next()
                break
            first = False
            c = self._next()
            if c == ord("\\"):
                sub = self._escape(self._next())
                out |= sub
                continue
            if self._peek() == ord("-") and self.pos + 1 < len(self.src) and \
                    self.src[self.pos + 1] != ord("]"):
                self._next()
                hi = self._next()
                if hi == ord("\\"):
                    hi = next(iter(self._escape(self._next())))
                out |= set(range(c, hi + 1))
            else:
                out.add(c)
        return (ALL_BYTES - out) if negate else out


# ---------------------------------------------------------------------- NFA
class NFA:
    """Thompson construction. States are ints; transitions byte->set,
    plus epsilon sets."""

    def __init__(self):
        self.eps: List[Set[int]] = []
        self.trans: List[Dict[int, Set[int]]] = []  # state -> byte -> states

    def new_state(self) -> int:
        self.eps.append(set())
        self.trans.append({})
        return len(self.eps) - 1

    def add_eps(self, a: int, b: int) -> None:
        self.eps[a].add(b)

    def add_bytes(self, a: int, bytes_set: Set[int], b: int) -> None:
        t = self.trans[a]
        for byte in bytes_set:
            t.setdefault(byte, set()).add(b)


def _build_nfa(node: Node, nfa: NFA) -> Tuple[int, int]:
    if isinstance(node, Lit):
        s, e = nfa.new_state(), nfa.new_state()
        nfa.add_bytes(s, node.bytes_set, e)
        return s, e
    if isinstance(node, Seq):
        s = e = nfa.new_state()
        for part in node.parts:
            ps, pe = _build_nfa(part, nfa)
            nfa.add_eps(e, ps)
            e = pe
        return s, e
    if isinstance(node, Alt):
        s, e = nfa.new_state(), nfa.new_state()
        for opt in node.options:
            os_, oe = _build_nfa(opt, nfa)
            nfa.add_eps(s, os_)
            nfa.add_eps(oe, e)
        return s, e
    if isinstance(node, Repeat):
        s = e = nfa.new_state()
        # required copies
        for _ in range(node.lo):
            ps, pe = _build_nfa(node.inner, nfa)
            nfa.add_eps(e, ps)
            e = pe
        if node.hi is None:
            ps, pe = _build_nfa(node.inner, nfa)
            nfa.add_eps(e, ps)
            nfa.add_eps(pe, ps)
            end = nfa.new_state()
            nfa.add_eps(e, end)
            nfa.add_eps(pe, end)
            return s, end
        # bounded optional copies
        ends = [e]
        cur = e
        for _ in range(node.hi - node.lo):
            ps, pe = _build_nfa(node.inner, nfa)
            nfa.add_eps(cur, ps)
            cur = pe
            ends.append(pe)
        end = nfa.new_state()
        for x in ends:
            nfa.add_eps(x, end)
        return s, end
    raise TypeError(node)


# ---------------------------------------------------------------------- DFA
class DFA:
    """Complete DFA with a dead state at index -1 (represented as None in
    transition maps). States numbered from 0; state 0 is the start."""

    __slots__ = ("transitions", "accepting", "num_states")

    def __init__(self, transitions: List[Dict[int, int]], accepting: Set[int]):
        self.transitions = transitions  # state -> {byte: next_state}
        self.accepting = accepting
        self.num_states = len(transitions)

    def next_state(self, state: int, byte: int) -> int:
        """Returns -1 for dead."""
        return self.transitions[state].get(byte, -1)

    def is_accepting(self, state: int) -> bool:
        return state in self.accepting

    def walk(self, state: int, data: bytes) -> int:
        for byte in data:
            state = self.transitions[state].get(byte, -1)
            if state < 0:
                return -1
        return state


def compile_regex(pattern: str) -> DFA:
    ast = RegexParser(pattern).parse()
    nfa = NFA()
    start, end = _build_nfa(ast, nfa)

    def eps_closure(states: FrozenSet[int]) -> FrozenSet[int]:
        stack = list(states)
        seen = set(states)
        while stack:
            s = stack.pop()
            for t in nfa.eps[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    start_set = eps_closure(frozenset([start]))
    dfa_ids: Dict[FrozenSet[int], int] = {start_set: 0}
    transitions: List[Dict[int, int]] = [{}]
    accepting: Set[int] = set()
    if end in start_set:
        accepting.add(0)
    work = [start_set]
    while work:
        cur = work.pop()
        cur_id = dfa_ids[cur]
        # group target sets by byte
        byte_targets: Dict[int, Set[int]] = {}
        for s in cur:
            for byte, targets in nfa.trans[s].items():
                byte_targets.setdefault(byte, set()).update(targets)
        for byte, targets in byte_targets.items():
            closed = eps_closure(frozenset(targets))
            if closed not in dfa_ids:
                dfa_ids[closed] = len(transitions)
                transitions.append({})
                if end in closed:
                    accepting.add(dfa_ids[closed])
                work.append(closed)
            transitions[cur_id][byte] = dfa_ids[closed]
    return DFA(transitions, accepting)
