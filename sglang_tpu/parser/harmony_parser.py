"""Harmony channel parser (gpt-oss output protocol).

Ref behavior: srt/parser/harmony_parser.py — gpt-oss emits messages as
channel blocks:

    <|start|>assistant<|channel|>analysis<|message|>...thinking...<|end|>
    <|start|>assistant<|channel|>commentary to=functions.get_weather
        <|constrain|>json<|message|>{"city":"Tokyo"}<|call|>
    <|start|>assistant<|channel|>final<|message|>Hello!<|return|>

Channels map to API surfaces: `analysis` -> reasoning_content,
`final` -> content, `commentary`/`analysis` ending in <|call|> ->
tool calls. There is also a de-tokenized TEXT fallback where the special
tokens are gone and the text reads "analysis ...assistantfinal ..." —
both forms are handled, switching strategy on first evidence.

This is a from-scratch implementation of the protocol (event model and
edge-case policy follow the reference: unknown channels hold, final may
end at EOF without <|return|>, standalone structural tokens are dropped,
partial analysis streams early).
"""

from __future__ import annotations

import dataclasses
import re
from typing import List, Optional, Tuple

MARKERS = (
    "<|start|>", "<|channel|>", "<|message|>", "<|constrain|>",
    "<|end|>", "<|call|>", "<|return|>",
)
_END_OF = {  # valid block terminators per channel
    "final": ("<|return|>", "<|end|>"),
    "analysis": ("<|end|>", "<|call|>"),
    "commentary": ("<|end|>", "<|call|>"),
}


@dataclasses.dataclass
class Event:
    type: str  # "normal" | "reasoning" | "tool_call"
    content: str
    raw: str = ""  # full block text for tool_call (detector input)


def _hold_len(text: str) -> int:
    """Bytes to hold back: longest suffix that is a proper prefix of any
    marker (so a marker split across chunks is never emitted as text)."""
    best = 0
    m = min(len(text), 12)
    for k in range(1, m + 1):
        suf = text[-k:]
        if any(t.startswith(suf) for t in MARKERS):
            best = k
    return best


def _channel_of(header: str) -> Optional[str]:
    h = header.strip().lower()
    for c in ("analysis", "commentary", "final"):
        if h.startswith(c):
            return c
    return None


class _Canonical:
    """Canonical form with <|...|> markers."""

    def parse(self, text: str, eof: bool) -> Tuple[List[Event], str]:
        events: List[Event] = []
        pos = 0
        n = len(text)
        while pos < n:
            # find the next structural marker
            nxt = text.find("<|", pos)
            if nxt < 0:
                hold = 0 if eof else _hold_len(text[pos:])
                emit = text[pos: n - hold]
                if emit and emit.strip() not in MARKERS:
                    events.append(Event("normal", emit))
                return events, text[n - hold:]
            if nxt > pos:
                chunk = text[pos:nxt]
                if chunk.strip() and chunk.strip() not in MARKERS:
                    events.append(Event("normal", chunk))
                pos = nxt
            if not any(text.startswith(t, pos) for t in MARKERS):
                # unknown <|...|> token or split marker: hold if it could
                # still complete, else emit "<|" as text
                if not eof and any(
                    t.startswith(text[pos:pos + 12][: len(t)])
                    or t.startswith(text[pos:])
                    for t in MARKERS
                ) and n - pos < 12:
                    return events, text[pos:]
                events.append(Event("normal", "<|"))
                pos += 2
                continue
            if text.startswith("<|start|>", pos) or text.startswith(
                "<|channel|>", pos
            ):
                out = self._parse_block(text, pos, eof)
                if out is None:
                    # incomplete: stream partial analysis early
                    ev, rest = self._partial_analysis(text, pos)
                    if ev is not None:
                        events.append(ev)
                        return events, rest
                    return events, text[pos:]
                ev, pos = out
                if ev is not None:
                    events.append(ev)
                continue
            # a structural token outside a block (e.g. bare <|message|>
            # tool response, or noise): tool responses route to normal
            if text.startswith("<|message|>", pos):
                out = self._parse_bare_message(text, pos)
                if out is None:
                    return events, text[pos:]
                ev, pos = out
                if ev is not None:
                    events.append(ev)
                continue
            # standalone terminator tokens are structural noise: drop
            for t in MARKERS:
                if text.startswith(t, pos):
                    pos += len(t)
                    break
        return events, ""

    def _parse_bare_message(self, text: str, pos: int):
        body_start = pos + len("<|message|>")
        ends = [(text.find(t, body_start), t)
                for t in ("<|end|>", "<|call|>", "<|return|>")]
        ends = [(i, t) for i, t in ends if i >= 0]
        if not ends:
            return None
        i, t = min(ends)
        return Event("normal", text[body_start:i]), i + len(t)

    def _parse_block(self, text: str, pos: int, eof: bool):
        start = pos
        if text.startswith("<|start|>", pos):
            pos += len("<|start|>")
        ch = text.find("<|channel|>", pos)
        msg = text.find("<|message|>", pos)
        if msg < 0:
            return None
        if ch < 0 or ch > msg:
            # no channel header: tool response frame -> normal text
            return self._parse_bare_message(text, msg)
        header = text[ch + len("<|channel|>"): msg]
        channel = _channel_of(header)
        if channel is None:
            return None  # malformed/unknown channel: hold
        body_start = msg + len("<|message|>")
        ends = [(text.find(t, body_start), t) for t in _END_OF[channel]]
        ends = [(i, t) for i, t in ends if i >= 0]
        if not ends:
            if channel == "final" and eof:
                # final may end at end-of-output without <|return|>
                return Event("normal", text[body_start:]), len(text)
            return None
        i, t = min(ends)
        content = text[body_start:i]
        nxt = i + len(t)
        if t == "<|call|>":
            return Event("tool_call", content.strip(),
                         text[start:nxt]), nxt
        if channel == "analysis":
            return Event("reasoning", content), nxt
        return Event("normal", content), nxt

    def _partial_analysis(self, text: str, pos: int):
        """Stream analysis content before its <|end|> arrives; keep the
        block header in the residue so the next parse stays in-frame."""
        ch = text.find("<|channel|>", pos)
        msg = text.find("<|message|>", pos)
        if ch < 0 or msg < 0 or ch > msg:
            return None, ""
        if _channel_of(text[ch + len("<|channel|>"): msg]) != "analysis":
            return None, ""
        body_start = msg + len("<|message|>")
        body = text[body_start:]
        hold = _hold_len(body)
        emit = body[: len(body) - hold]
        if not emit:
            return None, ""
        # residue keeps the structural prefix with an empty body
        residue = text[pos:body_start] + body[len(body) - hold:]
        return Event("reasoning", emit), residue


class _TextFallback:
    """De-tokenized form: 'analysis ... assistantfinal ...' (special
    tokens stripped by the tokenizer)."""

    _final_re = re.compile(r"(?:assistant)?final", re.IGNORECASE)

    def parse(self, text: str, eof: bool) -> Tuple[List[Event], str]:
        events: List[Event] = []
        body = text
        m = re.match(r"\s*(?:assistant)?\s*analysis", body, re.IGNORECASE)
        f = self._final_re.search(body)
        if m:
            start = m.end()
            if f and f.start() >= start:
                events.append(Event("reasoning", body[start:f.start()]))
                events.append(Event("normal", body[f.end():]))
                return events, "" if eof else ""
            if eof:
                events.append(Event("reasoning", body[start:]))
                return events, ""
            # hold a potential split "assistantfinal"
            hold = 0
            low = body.lower()
            for k in range(1, min(len("assistantfinal"), len(body)) + 1):
                if "assistantfinal".startswith(low[-k:]):
                    hold = k
            emit = body[start: len(body) - hold]
            if emit:
                events.append(Event("reasoning", emit))
            return events, body[len(body) - hold:] if hold else ""
        if f:
            pre = body[: f.start()]
            if pre.strip():
                events.append(Event("reasoning", pre))
            events.append(Event("normal", body[f.end():]))
            return events, ""
        if eof:
            if body:
                events.append(Event("normal", body))
            return events, ""
        return events, body


class HarmonyParser:
    """Streaming facade: feed chunks, receive completed events."""

    def __init__(self):
        self._buffer = ""
        self._strategy = None

    def parse(self, chunk: str) -> List[Event]:
        self._buffer += chunk
        return self._drain(eof=False)

    def flush(self) -> List[Event]:
        return self._drain(eof=True)

    def _drain(self, eof: bool) -> List[Event]:
        if self._strategy is None:
            if "<|" in self._buffer:
                self._strategy = _Canonical()
            elif re.search(
                r"(?:^|\s)(?:assistant)?\s*(analysis|commentary|"
                r"assistantfinal)", self._buffer, re.IGNORECASE,
            ):
                self._strategy = _TextFallback()
            elif not eof:
                # ambiguous start: hold a short prefix, else treat as text
                if len(self._buffer) < 24:
                    return []
                self._strategy = _Canonical()
            else:
                self._strategy = _Canonical()
        events, rest = self._strategy.parse(self._buffer, eof)
        self._buffer = rest
        # drop empty-content normal noise
        return [e for e in events if e.content or e.type == "tool_call"]
