"""JSON schema -> regex conversion for structured output.

Behavioral reference: xgrammar's JSON-schema grammar (used via
srt/constrained/xgrammar_backend.py) and the outlines-style schema->regex
approach. Produces a byte-level regex for regex_fsm.compile_regex.

Supported: object (properties/required/additionalProperties:false), string
(pattern/enum/const/min/maxLength), integer, number, boolean, null, array
(items/min/maxItems), enum/const of scalars, anyOf/oneOf, $defs/$ref
(inlined, non-recursive), empty schema (any JSON value, bounded depth).
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, Optional

WS = r"[ \n\t]{0,4}"  # optional whitespace (bounded to keep the DFA small)
STR_CHAR = r'(?:[^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})'
INTEGER = r"-?(?:0|[1-9]\d{0,15})"
NUMBER = INTEGER + r"(?:\.\d{1,16})?(?:[eE][+-]?\d{1,3})?"
BOOLEAN = r"(?:true|false)"
NULL = r"null"
STRING = f'"{STR_CHAR}{{0,256}}"'


def _escape_literal(s: str) -> str:
    out = []
    for ch in s:
        if ch in r"\.^$*+?{}[]()|/":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _json_literal_regex(value: Any) -> str:
    return _escape_literal(json.dumps(value, ensure_ascii=True))


def _any_value(depth: int) -> str:
    scalar = f"(?:{STRING}|{NUMBER}|{BOOLEAN}|{NULL})"
    if depth <= 0:
        return scalar
    inner = _any_value(depth - 1)
    arr = (
        rf"\[{WS}(?:{inner}(?:{WS},{WS}{inner}){{0,8}})?{WS}\]"
    )
    obj = (
        rf"\{{{WS}(?:{STRING}{WS}:{WS}{inner}"
        rf"(?:{WS},{WS}{STRING}{WS}:{WS}{inner}){{0,8}})?{WS}\}}"
    )
    return f"(?:{scalar}|{arr}|{obj})"


class SchemaConverter:
    def __init__(self, root_schema: Dict[str, Any]):
        self.root = root_schema
        self.defs = root_schema.get("$defs", {}) or root_schema.get(
            "definitions", {}
        )
        self._depth = 0

    def _resolve_ref(self, ref: str) -> Dict[str, Any]:
        for prefix in ("#/$defs/", "#/definitions/"):
            if ref.startswith(prefix):
                name = ref[len(prefix):]
                if name in self.defs:
                    return self.defs[name]
        raise ValueError(f"unsupported $ref: {ref}")

    def convert(self, schema: Any) -> str:
        self._depth += 1
        if self._depth > 32:
            raise ValueError("schema nesting too deep (recursion?)")
        try:
            return self._convert(schema)
        finally:
            self._depth -= 1

    def _convert(self, schema: Any) -> str:
        if schema is True or schema == {}:
            return _any_value(2)
        if "$ref" in schema:
            return self.convert(self._resolve_ref(schema["$ref"]))
        if "const" in schema:
            return _json_literal_regex(schema["const"])
        if "enum" in schema:
            opts = "|".join(_json_literal_regex(v) for v in schema["enum"])
            return f"(?:{opts})"
        for key in ("anyOf", "oneOf"):
            if key in schema:
                opts = "|".join(self.convert(s) for s in schema[key])
                return f"(?:{opts})"
        t = schema.get("type")
        if isinstance(t, list):
            opts = "|".join(
                self.convert({**schema, "type": tt}) for tt in t
            )
            return f"(?:{opts})"
        if t == "string":
            if "pattern" in schema:
                inner = schema["pattern"]
                inner = inner.lstrip("^").rstrip("$")
                return f'"(?:{inner})"'
            lo = schema.get("minLength", 0)
            hi = schema.get("maxLength", 256)
            return f'"{STR_CHAR}{{{lo},{hi}}}"'
        if t == "integer":
            return INTEGER
        if t == "number":
            return NUMBER
        if t == "boolean":
            return BOOLEAN
        if t == "null":
            return NULL
        if t == "array":
            items = schema.get("items", {})
            inner = self.convert(items if items is not None else {})
            lo = schema.get("minItems", 0)
            hi = schema.get("maxItems", 16)
            if hi <= 0:
                return rf"\[{WS}\]"
            more = max(hi - max(lo, 1), 0)
            if lo == 0:
                return (
                    rf"\[{WS}(?:{inner}(?:{WS},{WS}{inner}){{0,{more}}})?{WS}\]"
                )
            req = max(lo - 1, 0)
            opt = max(hi - lo, 0)
            return (
                rf"\[{WS}{inner}(?:{WS},{WS}{inner}){{{req},{req + opt}}}{WS}\]"
            )
        if t == "object" or "properties" in schema:
            props: Dict[str, Any] = schema.get("properties", {})
            if not props:
                return _any_value(1)
            # All properties emitted, in declaration order. (Generating
            # every optional property is a strict subset of the schema —
            # outputs always validate; the reference's xgrammar allows
            # skipping optionals, which we defer.)
            parts = []
            for i, (name, sub) in enumerate(props.items()):
                key_re = _escape_literal(json.dumps(name)) + f"{WS}:{WS}"
                val_re = self.convert(sub)
                sep = "" if i == 0 else f"{WS},{WS}"
                parts.append(f"{sep}{key_re}{val_re}")
            body = "".join(parts)
            return rf"\{{{WS}{body}{WS}\}}"
        # unknown -> any value
        return _any_value(1)


def json_schema_to_regex(schema: Any) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return SchemaConverter(schema).convert(schema)
