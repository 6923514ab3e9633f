"""Sqlite L3 storage tier: single-file transactional blob store.

Ref: srt/mem_cache/storage/ — the embedded-database backend class
(reference backends persist page metadata + blobs in stores like eic;
sqlite is the no-dependency equivalent in this image). Durable across
restarts, LRU-bounded by byte budget, one file instead of one file per
page (wins when pages are small and the FS dislikes many inodes).
"""

from __future__ import annotations

import hashlib
import os
import sqlite3
import threading
from typing import Optional, Tuple

import numpy as np


def _key_name(key: Tuple[int, ...]) -> str:
    return hashlib.sha1(np.asarray(key, np.int64).tobytes()).hexdigest()


class SqliteStorageTier:
    def __init__(self, directory: str, max_bytes: int = 8 << 30):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, "kv_store.sqlite")
        self.max_bytes = max_bytes
        self._lock = threading.Lock()
        self._db = sqlite3.connect(self.path, check_same_thread=False)
        self._db.execute(
            "CREATE TABLE IF NOT EXISTS pages ("
            "k TEXT PRIMARY KEY, dtype TEXT, shape TEXT, nbytes INTEGER, "
            "touched INTEGER, blob BLOB)"
        )
        self._db.execute(
            "CREATE INDEX IF NOT EXISTS pages_lru ON pages(touched)"
        )
        self._db.commit()
        self._clock = 0
        row = self._db.execute(
            "SELECT COALESCE(MAX(touched), 0), COALESCE(SUM(nbytes), 0) "
            "FROM pages"
        ).fetchone()
        self._clock, self.bytes = int(row[0]), int(row[1])
        self.num_put = 0
        self.num_hit = 0

    def put(self, key: Tuple[int, ...], page: np.ndarray) -> None:
        name = _key_name(key)
        page = np.ascontiguousarray(page)
        with self._lock:
            self._clock += 1
            old = self._db.execute(
                "SELECT nbytes FROM pages WHERE k=?", (name,)
            ).fetchone()
            if old is not None:
                self.bytes -= old[0]
            self._db.execute(
                "INSERT OR REPLACE INTO pages VALUES (?, ?, ?, ?, ?, ?)",
                (name, str(page.dtype),
                 ",".join(map(str, page.shape)), page.nbytes,
                 self._clock, page.tobytes()),
            )
            self.bytes += page.nbytes
            while self.bytes > self.max_bytes:
                victim = self._db.execute(
                    "SELECT k, nbytes FROM pages ORDER BY touched LIMIT 1"
                ).fetchone()
                if victim is None:
                    break
                self._db.execute("DELETE FROM pages WHERE k=?", (victim[0],))
                self.bytes -= victim[1]
            self._db.commit()
            self.num_put += 1

    def get(self, key: Tuple[int, ...]) -> Optional[np.ndarray]:
        name = _key_name(key)
        with self._lock:
            row = self._db.execute(
                "SELECT dtype, shape, blob FROM pages WHERE k=?", (name,)
            ).fetchone()
            if row is None:
                return None
            self._clock += 1
            self._db.execute(
                "UPDATE pages SET touched=? WHERE k=?", (self._clock, name)
            )
            self.num_hit += 1
        dtype, shape, blob = row
        arr = np.frombuffer(blob, dtype=np.dtype(dtype))
        return arr.reshape(tuple(int(s) for s in shape.split(",")))
