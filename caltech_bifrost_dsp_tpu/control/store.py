"""etcd-shaped key-value store with prefix watches.

The reference's control plane is etcd3: blocks watch command keys, put
status/response keys (reference: blocks/block_base.py:151-153,
pipeline-control/.../etcd_control.py:229-314).  The TPU framework keeps the
same protocol shape behind a minimal interface so it can run against

- :class:`MemoryStore` — in-process, for tests and single-host operation
  (the analog of ``EtcdCorrControl(simulated=True)``,
  reference: etcd_control.py:276-277), and
- a real etcd3 cluster via :func:`connect` — the etcd v3 gRPC wire
  protocol spoken directly over grpcio (:mod:`.etcd3_wire`; no
  python-etcd3 dependency), which also works against this package's
  bundled etcd-protocol server (``scripts/xeng_manager.py --serve-etcd``).
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


def Etcd3Store(host: str = "localhost", port: int = 2379):
    """etcd3 client with the MemoryStore interface.

    Speaks the etcd v3 gRPC wire protocol directly over grpcio
    (:class:`.etcd3_wire.Etcd3Client`) — no python-etcd3 dependency;
    works against a real etcd cluster and against the bundled
    etcd-protocol server (:class:`.etcd3_wire.Etcd3Server`)."""
    from .etcd3_wire import Etcd3Client

    return Etcd3Client(host, port)


def connect(host: str | None = None, port: int = 2379):
    """Store factory.

    - ``None`` -> in-process MemoryStore
    - ``"kv://HOST:PORT"`` -> the bundled TCP store
      (:mod:`.netstore`, etcd-less multi-process control)
    - anything else -> an etcd3 wire client at host:port
    """
    if not host:
        return MemoryStore()
    if host.startswith("kv://"):
        from .netstore import NetStore

        hp = host[5:]
        h, _, p = hp.partition(":")
        return NetStore(h or "127.0.0.1", int(p or 4440))
    return Etcd3Store(host, port)
