"""Serving daemon: frames over TCP -> track JSON back."""

# Compile-heavy integration module: full tier. The core tier
# (pytest -m 'not slow', <15 min cold) covers the same semantics
# via the cheap unit/oracle tests; run the full tier once per
# round (docs/TESTING.md).
import pytest

pytestmark = pytest.mark.slow

import json
import socket
import struct
import threading

import cv2
import numpy as np
import pytest

from botsort_tpu.cli import serve


def send_frame(sock, img):
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    data = buf.tobytes()
    sock.sendall(struct.pack(">I", len(data)) + data)
    (length,) = struct.unpack(">I", serve.recv_exact(sock, 4))
    return json.loads(serve.recv_exact(sock, length))


def test_serve_roundtrip():
    import socketserver

    class Args:
        weights_dir = "weights"
        mini = True

    factory = serve.build_pipeline_factory(Args)
    server = socketserver.TCPServer(("127.0.0.1", 0),
                                    serve.make_handler(factory))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        rng = np.random.default_rng(0)
        with socket.create_connection(("127.0.0.1", port)) as sock:
            for n in range(1, 4):
                img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
                out = send_frame(sock, img)
                assert out["frame"] == n
                assert isinstance(out["tracks"], list)
            # Garbage payload -> structured error, connection survives.
            sock.sendall(struct.pack(">I", 3) + b"xyz")
            (length,) = struct.unpack(">I", serve.recv_exact(sock, 4))
            err = json.loads(serve.recv_exact(sock, length))
            assert "error" in err
            # Clean shutdown.
            sock.sendall(struct.pack(">I", 0))
        # Second connection gets a fresh tracker (frame counter resets).
        with socket.create_connection(("127.0.0.1", port)) as sock:
            img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
            out = send_frame(sock, img)
            assert out["frame"] == 1
            sock.sendall(struct.pack(">I", 0))
    finally:
        server.shutdown()
        server.server_close()
