"""etcd-shaped key-value store with prefix watches.

The reference's control plane is etcd3: blocks watch command keys, put
status/response keys (reference: blocks/block_base.py:151-153,
pipeline-control/.../etcd_control.py:229-314).  The TPU framework keeps the
same protocol shape behind a minimal interface so it can run against

- :class:`MemoryStore` — in-process, for tests and single-host operation
  (the analog of ``EtcdCorrControl(simulated=True)``,
  reference: etcd_control.py:276-277), and
- a real etcd3 cluster via :func:`connect` when the ``etcd3`` package and a
  server are available (not bundled in this environment).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass


@dataclass
class Event:
    key: str
    value: str


class WatchResponse:
    def __init__(self, events):
        self.events = list(events)


class MemoryStore:
    """Thread-safe KV store with add_watch_prefix_callback semantics."""

    def __init__(self):
        self._lock = threading.Lock()
        self._data: dict[str, str] = {}
        self._watches: dict[int, tuple[str, callable]] = {}
        self._watch_id = 0

    def put(self, key: str, value: str) -> None:
        with self._lock:
            self._data[key] = value
            watchers = [cb for prefix, cb in self._watches.values()
                        if key.startswith(prefix)]
        # Callbacks run outside the lock, like etcd3's watch thread.
        for cb in watchers:
            cb(WatchResponse([Event(key, value)]))

    def get(self, key: str) -> str | None:
        with self._lock:
            return self._data.get(key)

    def get_prefix(self, prefix: str) -> dict[str, str]:
        with self._lock:
            return {k: v for k, v in self._data.items()
                    if k.startswith(prefix)}

    def delete(self, key: str) -> None:
        with self._lock:
            self._data.pop(key, None)

    def add_watch_prefix_callback(self, prefix: str, callback) -> int:
        with self._lock:
            self._watch_id += 1
            self._watches[self._watch_id] = (prefix, callback)
            return self._watch_id

    def cancel_watch(self, watch_id: int) -> None:
        with self._lock:
            self._watches.pop(watch_id, None)


class Etcd3Store:
    """Thin adapter giving a real etcd3 client the MemoryStore interface."""

    def __init__(self, host: str = "localhost", port: int = 2379):
        import etcd3  # gated: not bundled in this environment

        self._ec = etcd3.client(host=host, port=port)

    def put(self, key, value):
        self._ec.put(key, value)

    def get(self, key):
        val, _ = self._ec.get(key)
        return val.decode() if val is not None else None

    def get_prefix(self, prefix):
        return {meta.key.decode(): val.decode()
                for val, meta in self._ec.get_prefix(prefix)}

    def delete(self, key):
        self._ec.delete(key)

    def add_watch_prefix_callback(self, prefix, callback):
        return self._ec.add_watch_prefix_callback(prefix, callback)

    def cancel_watch(self, watch_id):
        self._ec.cancel_watch(watch_id)


def connect(host: str | None = None, port: int = 2379):
    """Store factory.

    - ``None`` -> in-process MemoryStore
    - ``"kv://HOST:PORT"`` -> the bundled TCP store
      (:mod:`.netstore`, etcd-less multi-process control)
    - anything else -> a real etcd3 client at host:port
    """
    if not host:
        return MemoryStore()
    if host.startswith("kv://"):
        from .netstore import NetStore

        hp = host[5:]
        h, _, p = hp.partition(":")
        return NetStore(h or "127.0.0.1", int(p or 4440))
    return Etcd3Store(host, port)
