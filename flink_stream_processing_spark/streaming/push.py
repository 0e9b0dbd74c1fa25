"""K5: WebSocket metrics push sink (SURVEY.md §2.2).

The reference pushes formatted metrics to dashboard clients over a STOMP
WebSocket: ``SimpMessagingTemplate.convertAndSend("/topic/metrics", payload)``
(MetricsService.java:104) on a broker configured at WebSocketConfig.java:26-49.
Spring supplies the WebSocket server there; here the push channel is a
dependency-free RFC 6455 server (handshake + unmasked server->client text
frames — the only frame direction a broadcast sink needs) fed by a
``StreamingQueryListener``. Where the reference POLLS Prometheus every 5 s
and re-pushes (O2), Spark delivers progress events push-style, so the
listener broadcasts each micro-batch's metrics with no scrape gap.

Scale note: the listener runs on the driver and the payload is O(1) per
micro-batch (already-aggregated progress metrics, never data rows), so the
sink adds no executor-side work at any corpus size; fan-out cost is
O(connected dashboard clients), same as the reference's SimpleBroker.
"""

from __future__ import annotations

import base64
import hashlib
import json
import socket
import threading
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener

from .metrics import bytes_to_mb

# Fixed GUID every WebSocket handshake concatenates to the client key
# (RFC 6455 §1.3).
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def websocket_accept_key(client_key: str) -> str:
    """Sec-WebSocket-Accept for a client's Sec-WebSocket-Key (RFC 6455 §4.2.2)."""
    digest = hashlib.sha1((client_key + _WS_GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def encode_text_frame(payload: str) -> bytes:
    """One unmasked FIN text frame (RFC 6455 §5.2; servers MUST NOT mask)."""
    data = payload.encode("utf-8")
    n = len(data)
    head = bytearray([0x81])  # FIN=1, opcode=0x1 (text)
    if n < 126:
        head.append(n)
    elif n < 1 << 16:
        head.append(126)
        head += n.to_bytes(2, "big")
    else:
        head.append(127)
        head += n.to_bytes(8, "big")
    return bytes(head) + data


class MetricsPushServer:
    """Minimal broadcast-only WebSocket server: accepts connections, performs
    the RFC 6455 handshake, and fans every ``broadcast()`` payload out to all
    connected clients. Client->server frames are not consumed (a metrics feed
    is one-directional; the reference's dashboard likewise only subscribes).
    Dead clients are dropped on the first failed send."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0) -> None:
        self._srv = socket.create_server((host, port))
        self._srv.settimeout(0.2)
        self.host, self.port = self._srv.getsockname()[:2]
        self._clients: list[socket.socket] = []
        self._lock = threading.Lock()
        self._closing = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def _accept_loop(self) -> None:
        while not self._closing.is_set():
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            try:
                self._handshake(conn)
            except (OSError, ValueError):
                conn.close()
                continue
            with self._lock:
                self._clients.append(conn)

    @staticmethod
    def _handshake(conn: socket.socket) -> None:
        conn.settimeout(5.0)
        request = b""
        while b"\r\n\r\n" not in request:
            chunk = conn.recv(4096)
            if not chunk:
                raise ValueError("client closed before handshake completed")
            request += chunk
        key = None
        for line in request.split(b"\r\n"):
            name, _, value = line.partition(b":")
            if name.strip().lower() == b"sec-websocket-key":
                key = value.strip().decode("ascii")
        if key is None:
            raise ValueError("not a WebSocket upgrade request")
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {websocket_accept_key(key)}\r\n"
                "\r\n"
            ).encode("ascii")
        )

    def broadcast(self, payload: str) -> int:
        """Send one text frame to every client; returns clients reached."""
        frame = encode_text_frame(payload)
        sent = 0
        with self._lock:
            alive = []
            for c in self._clients:
                try:
                    c.sendall(frame)
                    alive.append(c)
                    sent += 1
                except OSError:
                    c.close()
            self._clients = alive
        return sent

    @property
    def client_count(self) -> int:
        with self._lock:
            return len(self._clients)

    def close(self) -> None:
        self._closing.set()
        self._thread.join(timeout=5)
        with self._lock:
            for c in self._clients:
                c.close()
            self._clients = []
        self._srv.close()


def dashboard_path() -> str:
    """Absolute path of the bundled live dashboard (reference parity:
    flink-app's static/index.html). Open it in a browser with
    ``?ws=ws://host:port`` pointing at a ``MetricsPushServer``."""
    import os

    return os.path.join(os.path.dirname(__file__), "static", "dashboard.html")


class WebSocketMetricsPush(StreamingQueryListener):
    """O2 push loop as a listener: each micro-batch's progress becomes one
    JSON payload broadcast to every dashboard client — the same metric names
    and unit conventions the reference pushes (rates in rows/s, latency in
    ms, memory in MB; MetricsService.java:117-140 via :104)."""

    def __init__(self, server: MetricsPushServer) -> None:
        self.server = server

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state = p.stateOperators[0] if p.stateOperators else None
        payload: dict[str, Any] = {
            "topic": "/topic/metrics",
            "batch_id": p.batchId,
            "input_rate_rows_per_sec": p.inputRowsPerSecond,
            "output_rate_rows_per_sec": p.processedRowsPerSecond,
            "latency_ms": p.durationMs.get("triggerExecution"),
            "state_memory_mb": bytes_to_mb(state.memoryUsedBytes) if state else 0.0,
        }
        self.server.broadcast(json.dumps(payload))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
