"""Conversation storage for the gateway (/v1/conversations CRUD).

Behavioral reference: sgl-model-gateway/src/data_connector (conversation
+ item storage with memory and database backends, surfaced as the OpenAI
Conversations API and consumed by /v1/responses `conversation=`).
Backends here: in-memory (default) and sqlite (stdlib, durable across
restarts) behind one interface.
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from typing import Any, Dict, List, Optional


def _conv_id() -> str:
    return "conv_" + uuid.uuid4().hex


def _item_id() -> str:
    return "msg_" + uuid.uuid4().hex


class ConversationStore:
    """Interface. Conversations hold ordered items (messages/tool calls)."""

    def create(self, metadata: Optional[Dict] = None,
               items: Optional[List[Dict]] = None) -> Dict: ...
    def get(self, conv_id: str) -> Optional[Dict]: ...
    def update(self, conv_id: str, metadata: Dict) -> Optional[Dict]: ...
    def delete(self, conv_id: str) -> bool: ...
    def add_items(self, conv_id: str, items: List[Dict]) -> Optional[List[Dict]]: ...
    def list_items(self, conv_id: str, limit: int = 100,
                   order: str = "asc", after: Optional[str] = None
                   ) -> Optional[List[Dict]]: ...
    def get_item(self, conv_id: str, item_id: str) -> Optional[Dict]: ...
    def delete_item(self, conv_id: str, item_id: str) -> bool: ...

    # ------------------------------------------------------------- helpers
    def _normalize_item(self, item: Dict) -> Dict:
        out = dict(item)
        out.setdefault("id", _item_id())
        out.setdefault("type", "message")
        out.setdefault("status", "completed")
        return out

    def conversation_header(self, conv_id: str, created_at: float,
                            metadata: Dict) -> Dict:
        return {
            "id": conv_id,
            "object": "conversation",
            "created_at": int(created_at),
            "metadata": metadata,
        }


class MemoryConversationStore(ConversationStore):
    def __init__(self, max_conversations: int = 100_000):
        self._lock = threading.Lock()
        self._convs: Dict[str, Dict] = {}
        self.max_conversations = max_conversations

    def create(self, metadata=None, items=None):
        with self._lock:
            if len(self._convs) >= self.max_conversations:
                oldest = min(self._convs, key=lambda c: self._convs[c]["created_at"])
                del self._convs[oldest]
            cid = _conv_id()
            conv = {
                "created_at": time.time(),
                "metadata": metadata or {},
                "items": [self._normalize_item(i) for i in (items or [])],
            }
            self._convs[cid] = conv
            return self.conversation_header(cid, conv["created_at"], conv["metadata"])

    def get(self, conv_id):
        with self._lock:
            c = self._convs.get(conv_id)
            if c is None:
                return None
            return self.conversation_header(conv_id, c["created_at"], c["metadata"])

    def update(self, conv_id, metadata):
        with self._lock:
            c = self._convs.get(conv_id)
            if c is None:
                return None
            c["metadata"] = metadata
            return self.conversation_header(conv_id, c["created_at"], metadata)

    def delete(self, conv_id):
        with self._lock:
            return self._convs.pop(conv_id, None) is not None

    def add_items(self, conv_id, items):
        with self._lock:
            c = self._convs.get(conv_id)
            if c is None:
                return None
            new = [self._normalize_item(i) for i in items]
            c["items"].extend(new)
            return new

    def list_items(self, conv_id, limit=100, order="asc", after=None):
        with self._lock:
            c = self._convs.get(conv_id)
            if c is None:
                return None
            items = list(c["items"])
        if order == "desc":
            items = items[::-1]
        if after is not None:
            idx = next((i for i, it in enumerate(items) if it["id"] == after), None)
            items = items[idx + 1:] if idx is not None else []
        return items[:limit]

    def get_item(self, conv_id, item_id):
        with self._lock:
            c = self._convs.get(conv_id)
            if c is None:
                return None
            return next((i for i in c["items"] if i["id"] == item_id), None)

    def delete_item(self, conv_id, item_id):
        with self._lock:
            c = self._convs.get(conv_id)
            if c is None:
                return False
            n = len(c["items"])
            c["items"] = [i for i in c["items"] if i["id"] != item_id]
            return len(c["items"]) < n


class SqliteConversationStore(ConversationStore):
    """Durable backend over stdlib sqlite3 (the reference's database
    data-connector analog; no external DB in this image)."""

    def __init__(self, path: str):
        import sqlite3

        self._lock = threading.Lock()
        self._db = sqlite3.connect(path, check_same_thread=False)
        self._db.execute(
            "CREATE TABLE IF NOT EXISTS conversations ("
            "id TEXT PRIMARY KEY, created_at REAL, metadata TEXT)"
        )
        self._db.execute(
            "CREATE TABLE IF NOT EXISTS items ("
            "id TEXT PRIMARY KEY, conv_id TEXT, seq INTEGER, body TEXT)"
        )
        self._db.execute(
            "CREATE INDEX IF NOT EXISTS items_conv ON items(conv_id, seq)"
        )
        self._db.commit()

    def create(self, metadata=None, items=None):
        cid, now = _conv_id(), time.time()
        with self._lock:
            self._db.execute(
                "INSERT INTO conversations VALUES (?, ?, ?)",
                (cid, now, json.dumps(metadata or {})),
            )
            for seq, item in enumerate(items or []):
                it = self._normalize_item(item)
                self._db.execute(
                    "INSERT INTO items VALUES (?, ?, ?, ?)",
                    (it["id"], cid, seq, json.dumps(it)),
                )
            self._db.commit()
        return self.conversation_header(cid, now, metadata or {})

    def get(self, conv_id):
        with self._lock:
            row = self._db.execute(
                "SELECT created_at, metadata FROM conversations WHERE id=?",
                (conv_id,),
            ).fetchone()
        if row is None:
            return None
        return self.conversation_header(conv_id, row[0], json.loads(row[1]))

    def update(self, conv_id, metadata):
        with self._lock:
            cur = self._db.execute(
                "UPDATE conversations SET metadata=? WHERE id=?",
                (json.dumps(metadata), conv_id),
            )
            self._db.commit()
            if cur.rowcount == 0:
                return None
            row = self._db.execute(
                "SELECT created_at FROM conversations WHERE id=?", (conv_id,)
            ).fetchone()
        return self.conversation_header(conv_id, row[0], metadata)

    def delete(self, conv_id):
        with self._lock:
            cur = self._db.execute(
                "DELETE FROM conversations WHERE id=?", (conv_id,)
            )
            self._db.execute("DELETE FROM items WHERE conv_id=?", (conv_id,))
            self._db.commit()
        return cur.rowcount > 0

    def _next_seq(self, conv_id) -> int:
        row = self._db.execute(
            "SELECT COALESCE(MAX(seq), -1) FROM items WHERE conv_id=?",
            (conv_id,),
        ).fetchone()
        return row[0] + 1

    def add_items(self, conv_id, items):
        with self._lock:
            if self._db.execute(
                "SELECT 1 FROM conversations WHERE id=?", (conv_id,)
            ).fetchone() is None:
                return None
            seq = self._next_seq(conv_id)
            new = []
            for item in items:
                it = self._normalize_item(item)
                self._db.execute(
                    "INSERT INTO items VALUES (?, ?, ?, ?)",
                    (it["id"], conv_id, seq, json.dumps(it)),
                )
                seq += 1
                new.append(it)
            self._db.commit()
        return new

    def list_items(self, conv_id, limit=100, order="asc", after=None):
        with self._lock:
            if self._db.execute(
                "SELECT 1 FROM conversations WHERE id=?", (conv_id,)
            ).fetchone() is None:
                return None
            rows = self._db.execute(
                f"SELECT body FROM items WHERE conv_id=? ORDER BY seq "
                f"{'DESC' if order == 'desc' else 'ASC'}",
                (conv_id,),
            ).fetchall()
        items = [json.loads(r[0]) for r in rows]
        if after is not None:
            idx = next((i for i, it in enumerate(items) if it["id"] == after), None)
            items = items[idx + 1:] if idx is not None else []
        return items[:limit]

    def get_item(self, conv_id, item_id):
        with self._lock:
            row = self._db.execute(
                "SELECT body FROM items WHERE conv_id=? AND id=?",
                (conv_id, item_id),
            ).fetchone()
        return json.loads(row[0]) if row else None

    def delete_item(self, conv_id, item_id):
        with self._lock:
            cur = self._db.execute(
                "DELETE FROM items WHERE conv_id=? AND id=?", (conv_id, item_id)
            )
            self._db.commit()
        return cur.rowcount > 0


def make_store(kind: str, path: Optional[str] = None) -> ConversationStore:
    if kind == "memory":
        return MemoryConversationStore()
    if kind == "sqlite":
        return SqliteConversationStore(path or "conversations.db")
    raise ValueError(f"unknown conversation store: {kind}")


def add_routes(app, store: ConversationStore) -> None:
    """Mount the OpenAI Conversations API onto an aiohttp app."""
    from aiohttp import web

    def _404():
        return web.json_response(
            {"error": {"message": "not found", "type": "invalid_request_error"}},
            status=404,
        )

    async def create(request):
        body = await request.json() if request.can_read_body else {}
        return web.json_response(
            store.create(body.get("metadata"), body.get("items"))
        )

    async def get(request):
        c = store.get(request.match_info["cid"])
        return web.json_response(c) if c else _404()

    async def update(request):
        body = await request.json()
        c = store.update(request.match_info["cid"], body.get("metadata") or {})
        return web.json_response(c) if c else _404()

    async def delete(request):
        cid = request.match_info["cid"]
        if not store.delete(cid):
            return _404()
        return web.json_response(
            {"id": cid, "object": "conversation.deleted", "deleted": True}
        )

    async def add_items(request):
        body = await request.json()
        new = store.add_items(request.match_info["cid"], body.get("items") or [])
        if new is None:
            return _404()
        return web.json_response(
            {"object": "list", "data": new,
             "first_id": new[0]["id"] if new else None,
             "last_id": new[-1]["id"] if new else None, "has_more": False}
        )

    async def list_items(request):
        q = request.rel_url.query
        items = store.list_items(
            request.match_info["cid"],
            limit=int(q.get("limit", 100)),
            order=q.get("order", "asc"),
            after=q.get("after"),
        )
        if items is None:
            return _404()
        return web.json_response(
            {"object": "list", "data": items,
             "first_id": items[0]["id"] if items else None,
             "last_id": items[-1]["id"] if items else None, "has_more": False}
        )

    async def get_item(request):
        it = store.get_item(request.match_info["cid"], request.match_info["iid"])
        return web.json_response(it) if it else _404()

    async def delete_item(request):
        cid, iid = request.match_info["cid"], request.match_info["iid"]
        if not store.delete_item(cid, iid):
            return _404()
        return web.json_response(
            {"id": iid, "object": "conversation.item.deleted", "deleted": True}
        )

    app.router.add_post("/v1/conversations", create)
    app.router.add_get("/v1/conversations/{cid}", get)
    app.router.add_post("/v1/conversations/{cid}", update)
    app.router.add_delete("/v1/conversations/{cid}", delete)
    app.router.add_post("/v1/conversations/{cid}/items", add_items)
    app.router.add_get("/v1/conversations/{cid}/items", list_items)
    app.router.add_get("/v1/conversations/{cid}/items/{iid}", get_item)
    app.router.add_delete("/v1/conversations/{cid}/items/{iid}", delete_item)
