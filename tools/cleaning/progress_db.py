"""SQLite progress tracking for idempotent, resumable batch jobs.

The offline pipelines (captioning, contrast filtering) mark every processed
zip in a SQLite DB so re-runs skip completed work and crashed runs resume
exactly where they stopped (reference src/data/cleaning/main.py:79-94,
filter_by_contrast.py:48-61)."""

from __future__ import annotations

import os
import sqlite3
import threading
from typing import Iterable, List, Optional


class ProgressDB:
    def __init__(self, path: str, table: str = "processed"):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self.table = table
        self._lock = threading.Lock()
        self._conn = sqlite3.connect(path, check_same_thread=False)
        with self._conn:
            self._conn.execute(
                f"CREATE TABLE IF NOT EXISTS {table} ("
                "  name TEXT PRIMARY KEY,"
                "  status TEXT NOT NULL,"
                "  detail TEXT,"
                "  ts DATETIME DEFAULT CURRENT_TIMESTAMP)"
            )

    def mark(self, name: str, status: str, detail: str = ""):
        with self._lock, self._conn:
            self._conn.execute(
                f"INSERT OR REPLACE INTO {self.table}(name, status, detail) VALUES (?,?,?)",
                (name, status, detail),
            )

    def status(self, name: str) -> Optional[str]:
        cur = self._conn.execute(
            f"SELECT status FROM {self.table} WHERE name=?", (name,)
        )
        row = cur.fetchone()
        return row[0] if row else None

    def is_processed(self, name: str) -> bool:
        return self.status(name) is not None

    def all_with_status(self, status: str) -> List[str]:
        cur = self._conn.execute(
            f"SELECT name FROM {self.table} WHERE status=?", (status,)
        )
        return [r[0] for r in cur.fetchall()]

    def processed_names(self) -> List[str]:
        cur = self._conn.execute(f"SELECT name FROM {self.table}")
        return [r[0] for r in cur.fetchall()]

    def close(self):
        self._conn.close()
