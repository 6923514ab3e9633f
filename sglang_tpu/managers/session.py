"""Session trees: multi-turn context with branching / replace semantics.

Behavioral reference: srt/session/session_controller.py — a session is a
TREE of request nodes: `session_params.rid` selects which earlier turn to
continue from (fork), `replace` aborts the forked-from node's existing
descendants, `offset` truncates the inherited context, and
`drop_previous_output` omits the parent's generated tokens. TPU redesign:
the reference mutates shared token arrays in place to dodge Python-list
copies on its hot path; here the radix cache already dedups the KV for
shared prefixes across branches, so nodes simply store their committed
token history and context assembly is a single concat per turn.
"""

from __future__ import annotations

import time
import uuid
from typing import Dict, List, Optional


class SessionNode:
    __slots__ = ("rid", "prompt_ids", "output_ids", "parent", "children",
                 "committed")

    def __init__(self, rid: str, prompt_ids: List[int],
                 parent: Optional["SessionNode"]):
        self.rid = rid
        self.prompt_ids = list(prompt_ids)  # full prompt incl. inherited ctx
        self.output_ids: List[int] = []
        self.parent = parent
        self.children: List["SessionNode"] = []
        self.committed = False  # outputs confirmed at finish
        if parent is not None:
            parent.children.append(self)

    @property
    def all_ids(self) -> List[int]:
        return self.prompt_ids + self.output_ids


class Session:
    def __init__(self, session_id: Optional[str] = None,
                 timeout: Optional[float] = None):
        self.session_id = session_id or uuid.uuid4().hex
        self.timeout = timeout
        self.last_active = time.monotonic()
        self.nodes: Dict[str, SessionNode] = {}
        self.last_rid: Optional[str] = None

    def is_timed_out(self) -> bool:
        return (self.timeout is not None
                and time.monotonic() - self.last_active > self.timeout)

    # ------------------------------------------------------------- context
    def resolve_parent(self, parent_rid: Optional[str]
                       ) -> Optional[SessionNode]:
        """session_params.rid (None = the most recent turn)."""
        if parent_rid is not None:
            node = self.nodes.get(parent_rid)
            if node is None:
                raise ValueError(
                    f"session {self.session_id}: unknown request "
                    f"{parent_rid!r} to branch from"
                )
            return node
        return self.nodes.get(self.last_rid) if self.last_rid else None

    def context(self, parent: Optional[SessionNode],
                offset: Optional[int] = None,
                drop_previous_output: bool = False) -> List[int]:
        """Tokens the new turn inherits (ref _concat_token_arrays)."""
        self.last_active = time.monotonic()
        if parent is None:
            return []
        ctx = parent.prompt_ids if drop_previous_output else parent.all_ids
        if offset:
            ctx = ctx[:offset]
        return list(ctx)

    # ------------------------------------------------------------- updates
    def prune_children(self, parent: Optional[SessionNode]) -> List[str]:
        """`replace=True`: drop the parent's existing descendants; returns
        their rids so in-flight ones can be aborted (ref clear_children)."""
        if parent is None:
            return []
        dropped: List[str] = []
        stack = list(parent.children)
        parent.children = []
        while stack:
            node = stack.pop()
            dropped.append(node.rid)
            self.nodes.pop(node.rid, None)
            stack.extend(node.children)
        if self.last_rid in dropped:
            self.last_rid = parent.rid
        return dropped

    def add_turn(self, rid: str, parent: Optional[SessionNode],
                 prompt_ids: List[int]) -> SessionNode:
        node = SessionNode(rid, prompt_ids, parent)
        self.nodes[rid] = node
        self.last_rid = rid
        return node

    def commit(self, rid: str, output_ids: List[int]) -> None:
        node = self.nodes.get(rid)
        if node is not None:
            node.output_ids = list(output_ids)
            node.committed = True

    def drop_uncommitted(self, rid: str) -> None:
        """A turn that died before finishing leaves no node behind."""
        node = self.nodes.pop(rid, None)
        if node is None:
            return
        if node.parent is not None and node in node.parent.children:
            node.parent.children.remove(node)
        # re-parent any children onto the grandparent (rare: turn aborted
        # after a fork was taken from it)
        for child in node.children:
            child.parent = node.parent
            if node.parent is not None:
                node.parent.children.append(child)
        if self.last_rid == rid:
            self.last_rid = node.parent.rid if node.parent else None

    def tree_str(self) -> str:
        roots = [n for n in self.nodes.values() if n.parent is None]
        lines: List[str] = []

        def walk(node: SessionNode, depth: int) -> None:
            mark = "*" if node.rid == self.last_rid else ""
            lines.append("  " * depth + f"{node.rid}{mark} "
                         f"(+{len(node.output_ids)} tok)")
            for c in node.children:
                walk(c, depth + 1)

        for r in roots:
            walk(r, 0)
        return "\n".join(lines)
