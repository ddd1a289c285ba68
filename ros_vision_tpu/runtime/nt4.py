"""NetworkTables 4 client + AprilTag data sender.

Robot-bus output parity with the reference's ntcore-based sender
(AprilTagDataSender.cpp:9-44): connects to the roboRIO's NT4 server
(table_address from system_config network_tables_config), publishes a
double-array topic with the flattened [collect_time, id, x, y, z]* layout
(apriltags_cuda_detector.cu:465-502) plus a raw protobuf topic
(apriltag.proto schema), flushing after each send.

Implemented directly against the NT4 WebSocket wire protocol (JSON text
frames for pub/sub control, msgpack binary frames for values) so no ntcore
native dependency is required. An in-process NT4 *server* is provided for
tests — the same isolated-instance technique as apriltag_sender_test.cu.
"""
from __future__ import annotations

import json
import logging
import threading
import time
from typing import Optional

from ros_vision_tpu.runtime import msgpack_mini as mp

log = logging.getLogger(__name__)

NT4_PORT = 5810
TYPE_IDS = {"boolean": 0, "double": 1, "int": 2, "float": 3, "string": 4,
            "raw": 5, "boolean[]": 16, "double[]": 17, "int[]": 18,
            "float[]": 19, "string[]": 20}


class NT4Client:
    def __init__(self, server: str, client_name: str = "ros_vision_tpu",
                 port: int = NT4_PORT, connect_timeout: float = 5.0):
        from websockets.sync.client import connect
        # accept "host" or "host:port" (an explicit port in the address
        # wins over the default NT4 port)
        if ":" in server:
            server, port_s = server.rsplit(":", 1)
            port = int(port_s)
        self._uri = f"ws://{server}:{port}/nt/{client_name}"
        self._ws = connect(
            self._uri, subprotocols=["v4.1.networktables.first.wpi.edu",
                                     "networktables.first.wpi.edu"],
            open_timeout=connect_timeout)
        self._next_pubuid = 1
        self._pubs = {}
        self._lock = threading.Lock()
        self._t0 = time.monotonic_ns()
        self._server_offset_us = 0
        self._sync_time()

    def _now_us(self) -> int:
        return (time.monotonic_ns() - self._t0) // 1000 + \
            self._server_offset_us

    def _sync_time(self) -> None:
        """RTT exchange: binary msg to topic -1 carrying our clock."""
        t1 = (time.monotonic_ns() - self._t0) // 1000
        self._ws.send(mp.pack([-1, 0, TYPE_IDS["int"], int(t1)]))
        try:
            msg = self._ws.recv(timeout=2.0)
            if isinstance(msg, (bytes, bytearray)):
                arr, _ = mp.unpack(bytes(msg))
                if arr and arr[0] == -1:
                    server_time = arr[1]
                    t2 = (time.monotonic_ns() - self._t0) // 1000
                    rtt = (t2 - t1) // 2
                    self._server_offset_us = int(server_time) - int(t1) - rtt
        except Exception:
            log.debug("NT4 time sync response not received; using local time")

    def publish(self, name: str, type_str: str,
                properties: Optional[dict] = None) -> int:
        with self._lock:
            uid = self._next_pubuid
            self._next_pubuid += 1
            self._pubs[name] = (uid, type_str)
            self._ws.send(json.dumps([{
                "method": "publish",
                "params": {"name": name, "pubuid": uid, "type": type_str,
                           "properties": properties or {}},
            }]))
            return uid

    def set_value(self, name: str, value, timestamp_us: int = 0) -> None:
        uid, type_str = self._pubs[name]
        tid = TYPE_IDS[type_str if not type_str.startswith("proto:")
                       else "raw"]
        if isinstance(value, (list, tuple)) and type_str == "double[]":
            value = [float(v) for v in value]
        ts = timestamp_us or self._now_us()
        self._ws.send(mp.pack([uid, int(ts), tid, value]))

    def flush(self) -> None:
        pass  # the sync websocket sends eagerly; kept for API parity

    def close(self) -> None:
        try:
            self._ws.close()
        except Exception:
            pass


class AprilTagDataSender:
    """Publishes `<table>/<key>` double[] + `<table>/<key>_protobuf` raw
    (AprilTagDataSender.cpp behavior)."""

    def __init__(self, key: str, table_address: str,
                 table_name: str = "/SmartDashboard",
                 client: NT4Client | None = None, port: int = NT4_PORT):
        self._client = client or NT4Client(table_address, port=port)
        base = table_name.rstrip("/")
        self._da_name = f"{base}/{key}"
        self._pb_name = f"{base}/{key}_protobuf"
        self._client.publish(self._da_name, "double[]")
        self._client.publish(
            self._pb_name, "proto:com.team766.vision.ApriltagListProto")

    def send_value(self, values: list) -> None:
        self._client.set_value(self._da_name, list(values))
        self._client.flush()

    def send_protobuf(self, payload: bytes) -> None:
        self._client.set_value(self._pb_name, bytes(payload))

    def set_default_value(self, values: list) -> None:
        self.send_value(values)

    def close(self):
        self._client.close()


def flatten_detections(detections, collect_time: float) -> list:
    """[t, id, x, y, z] per detection (apriltags_cuda_detector.cu:465-502)."""
    out = []
    for d in detections:
        t = d.pose_t if d.pose_t is not None else (0.0, 0.0, 0.0)
        out += [float(collect_time), float(d.tag_id),
                float(t[0]), float(t[1]), float(t[2])]
    return out


class NT4TestServer:
    """Minimal in-process NT4 server for round-trip tests (the role of the
    isolated NetworkTableInstance in apriltag_sender_test.cu:14-50)."""

    def __init__(self, port: int = 0):
        from websockets.sync.server import serve
        self.received = []        # (name, timestamp_us, value)
        self._topics = {}         # pubuid -> name
        self._announced = []
        self._cv = threading.Condition()

        def handler(ws):
            # pubuids are scoped per client connection (NT4 spec) — a
            # multi-camera system runs one client per sender and their uids
            # collide if tracked globally
            conn_topics = {}
            while True:
                try:
                    msg = ws.recv()
                except Exception:
                    return
                if isinstance(msg, str):
                    for op in json.loads(msg):
                        if op.get("method") == "publish":
                            p = op["params"]
                            conn_topics[p["pubuid"]] = p["name"]
                            self._topics[p["pubuid"]] = p["name"]
                            with self._cv:
                                self._announced.append(p)
                                self._cv.notify_all()
                else:
                    arr, _ = mp.unpack(bytes(msg))
                    uid, ts, tid, val = arr
                    if uid == -1:   # RTT: echo with server time
                        ws.send(mp.pack([-1, int(time.monotonic_ns() // 1000),
                                         2, val]))
                        continue
                    with self._cv:
                        self.received.append(
                            (conn_topics.get(uid, f"#{uid}"), ts, val))
                        self._cv.notify_all()

        self._server = serve(handler, "127.0.0.1", port)
        self.port = self._server.socket.getsockname()[1] \
            if hasattr(self._server, "socket") else port
        if self.port == 0:
            self.port = list(self._server.server.sockets)[0].getsockname()[1]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()

    def wait_for(self, n_values: int, timeout: float = 5.0) -> bool:
        with self._cv:
            return self._cv.wait_for(lambda: len(self.received) >= n_values,
                                     timeout)

    def close(self):
        self._server.shutdown()
