"""EBNF (GBNF-style) grammars -> regex for the byte-DFA engine.

Ref: xgrammar's EBNF support (srt/constrained/xgrammar_backend.py accepts
`ebnf`). This converter handles the practical non-left-recursive subset by
inlining rule references (bounded depth); truly recursive grammars (nested
JSON etc.) are approximated by bounded expansion and deep recursion is
rejected with a clear error.

Syntax: `name ::= alternatives`, literals "...", char classes [a-z],
groups ( ), quantifiers * + ? {m,n}, alternation |, rule references.
Comments start with '#'. The start rule is `root`.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

MAX_DEPTH = 24


class EbnfError(ValueError):
    pass


def _tokenize(src: str) -> List[Tuple[str, str]]:
    tokens = []
    i = 0
    n = len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if src.startswith("::=", i):
            tokens.append(("ASSIGN", "::="))
            i += 3
            continue
        if c == '"':
            j = i + 1
            buf = []
            while j < n and src[j] != '"':
                if src[j] == "\\":
                    esc = src[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r",
                                '"': '"', "\\": "\\"}.get(esc, esc))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise EbnfError("unterminated string literal")
            tokens.append(("LIT", "".join(buf)))
            i = j + 1
            continue
        if c == "[":
            j = i + 1
            depth_esc = False
            while j < n and (src[j] != "]" or depth_esc):
                depth_esc = src[j] == "\\" and not depth_esc
                j += 1
            if j >= n:
                raise EbnfError("unterminated char class")
            tokens.append(("CLASS", src[i : j + 1]))
            i = j + 1
            continue
        if c in "()|*+?":
            tokens.append((c, c))
            i += 1
            continue
        if c == "{":
            j = src.index("}", i)
            tokens.append(("REPEAT", src[i : j + 1]))
            i = j + 1
            continue
        m = re.match(r"[A-Za-z_][A-Za-z0-9_-]*", src[i:])
        if m:
            tokens.append(("NAME", m.group()))
            i += len(m.group())
            continue
        raise EbnfError(f"unexpected char {c!r} at {i}")
    return tokens


def _split_rules(tokens) -> Dict[str, List]:
    rules: Dict[str, List] = {}
    i = 0
    while i < len(tokens):
        if tokens[i][0] != "NAME" or i + 1 >= len(tokens) or tokens[i + 1][0] != "ASSIGN":
            raise EbnfError(f"expected 'name ::=' at token {i}: {tokens[i]}")
        name = tokens[i][1]
        i += 2
        body = []
        while i < len(tokens):
            if (tokens[i][0] == "NAME" and i + 1 < len(tokens)
                    and tokens[i + 1][0] == "ASSIGN"):
                break
            body.append(tokens[i])
            i += 1
        rules[name] = body
    return rules


_ESCAPE = set(r"\.^$*+?{}[]()|/")


def _lit_regex(s: str) -> str:
    out = []
    for ch in s:
        if ch in _ESCAPE:
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    return "".join(out)


def ebnf_to_regex(src: str, start: str = "root") -> str:
    rules = _split_rules(_tokenize(src))
    if start not in rules:
        raise EbnfError(f"no {start!r} rule")

    def conv(body: List, depth: int) -> str:
        if depth > MAX_DEPTH:
            raise EbnfError(
                "grammar too deeply recursive for the DFA engine "
                f"(depth > {MAX_DEPTH}); bound the recursion or use a regex"
            )
        parts = ["(?:"]
        for kind, val in body:
            if kind == "LIT":
                parts.append(_lit_regex(val))
            elif kind == "CLASS":
                parts.append(val)
            elif kind == "NAME":
                if val not in rules:
                    raise EbnfError(f"unknown rule {val!r}")
                parts.append(conv(rules[val], depth + 1))
            elif kind == "(":
                parts.append("(?:")
            elif kind == ")":
                parts.append(")")
            elif kind in ("*", "+", "?"):
                parts.append(kind)
            elif kind == "REPEAT":
                parts.append(val)
            elif kind == "|":
                parts.append("|")
            else:
                raise EbnfError(f"unexpected token {kind}")
        parts.append(")")
        return "".join(parts)

    return conv(rules[start], 0)
