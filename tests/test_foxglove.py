"""Foxglove ws-protocol bridge tests (launch_vision.py:313 role parity)."""
import base64
import json
import struct

import numpy as np
import pytest


@pytest.fixture
def bridge():
    from ros_vision_tpu.runtime.foxglove import FoxgloveBridge
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    b = FoxgloveBridge(port=port)
    yield b
    b.close()


def _connect(bridge):
    from websockets.sync.client import connect
    return connect(f"ws://127.0.0.1:{bridge.port}",
                   subprotocols=["foxglove.websocket.v1"])


def test_handshake_and_image_roundtrip(bridge):
    bridge.add_channel("/center/image", "foxglove.CompressedImage")
    with _connect(bridge) as ws:
        info = json.loads(ws.recv(timeout=5))
        assert info["op"] == "serverInfo"
        ad = json.loads(ws.recv(timeout=5))
        assert ad["op"] == "advertise"
        chan = next(c for c in ad["channels"]
                    if c["topic"] == "/center/image")
        assert chan["schemaName"] == "foxglove.CompressedImage"

        ws.send(json.dumps({"op": "subscribe", "subscriptions": [
            {"id": 7, "channelId": chan["id"]}]}))
        # publish after the subscribe lands (poll until delivered)
        img = np.full((24, 32), 128, np.uint8)
        data = None
        for _ in range(50):
            bridge.publish_image("/center/image", img, timestamp_ns=123)
            try:
                data = ws.recv(timeout=0.1)
                break
            except TimeoutError:
                continue
        assert isinstance(data, bytes)
        op, sid, ts = struct.unpack_from("<BIQ", data)
        assert (op, sid, ts) == (1, 7, 123)
        msg = json.loads(data[13:])
        assert msg["format"] == "jpeg"
        import cv2
        dec = cv2.imdecode(np.frombuffer(
            base64.b64decode(msg["data"]), np.uint8), cv2.IMREAD_GRAYSCALE)
        assert dec.shape == (24, 32)
        assert abs(int(dec.mean()) - 128) < 3


def test_poses_channel(bridge):
    class D:
        pose_t = np.array([1.0, 2.0, 3.0])
        pose_R = np.eye(3)

    with _connect(bridge) as ws:
        json.loads(ws.recv(timeout=5))          # serverInfo (no channels yet)
        bridge.publish_poses("/april_tags/poses", [D()])   # advertises
        ad = json.loads(ws.recv(timeout=5))
        assert ad["op"] == "advertise"
        cid = ad["channels"][0]["id"]
        ws.send(json.dumps({"op": "subscribe", "subscriptions": [
            {"id": 1, "channelId": cid}]}))
        data = None
        for _ in range(50):
            bridge.publish_poses("/april_tags/poses", [D()],
                                 timestamp_ns=5)
            try:
                data = ws.recv(timeout=0.1)
                break
            except TimeoutError:
                continue
        msg = json.loads(data[13:])
        assert msg["poses"][0]["position"] == {"x": 1.0, "y": 2.0, "z": 3.0}
        assert abs(msg["poses"][0]["orientation"]["w"] - 1.0) < 1e-9


def test_unsubscribe_stops_delivery(bridge):
    bridge.add_channel("/t", "foxglove.CompressedImage")
    with _connect(bridge) as ws:
        json.loads(ws.recv(timeout=5))
        ad = json.loads(ws.recv(timeout=5))
        cid = ad["channels"][0]["id"]
        ws.send(json.dumps({"op": "subscribe",
                            "subscriptions": [{"id": 2, "channelId": cid}]}))
        img = np.zeros((8, 8), np.uint8)
        got = False
        for _ in range(50):
            bridge.publish_image("/t", img)
            try:
                ws.recv(timeout=0.1)
                got = True
                break
            except TimeoutError:
                continue
        assert got
        ws.send(json.dumps({"op": "unsubscribe", "subscriptionIds": [2]}))
        # drain anything in flight, then confirm silence
        import time
        time.sleep(0.2)
        try:
            while True:
                ws.recv(timeout=0.05)
        except TimeoutError:
            pass
        bridge.publish_image("/t", img)
        with pytest.raises(TimeoutError):
            ws.recv(timeout=0.3)
