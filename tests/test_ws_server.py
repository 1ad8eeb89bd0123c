"""End-to-end WebSocket serving test: real sockets, scripted backend."""

import asyncio
import json

import numpy as np
import pytest

from tilawa_tpu.streaming import ws as wslib
from tilawa_tpu.streaming.server import RecitationServer


@pytest.fixture(scope="module")
def db():
    from tilawa_tpu.data.quran import QuranDB

    return QuranDB()


def test_ws_roundtrip_verse_match(db):
    async def scenario():
        texts = iter(["قل هو الله احد"])
        last = "قل هو الله احد"

        def transcribe(audio):
            return next(texts, last)

        server = RecitationServer(transcribe, db=db)
        srv = await wslib.serve(server.handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]

        sock = await wslib.connect("127.0.0.1", port)
        # status round-trip
        await sock.send_text("status")
        status = json.loads((await sock.receive()).text)
        assert status["total_verses"] == 6236

        rng = np.random.default_rng(0)
        audio = (0.1 * rng.standard_normal(16000 * 3)).astype(np.float32)
        # stream 300ms chunks
        messages = []

        for start in range(0, len(audio), 4800):
            await sock.send_bytes(audio[start : start + 4800].tobytes())

        async def read_until_match():
            while True:
                msg = await sock.receive()
                if msg.is_text:
                    m = json.loads(msg.text)
                    messages.append(m)
                    if m["type"] == "verse_match":
                        return m

        m = await asyncio.wait_for(read_until_match(), timeout=30)
        assert (m["surah"], m["ayah"]) == (112, 1)
        assert m["confidence"] >= 0.99
        assert any(v["is_current"] for v in m["surrounding_verses"])

        await sock.close()
        srv.close()
        await srv.wait_closed()

    asyncio.run(scenario())


def test_ws_binary_frames_and_close(db):
    async def scenario():
        server = RecitationServer(lambda a: "", db=db)
        srv = await wslib.serve(server.handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        sock = await wslib.connect("127.0.0.1", port)
        # silence → no messages; close cleanly
        await sock.send_bytes(np.zeros(4800, dtype=np.float32).tobytes())
        await sock.close()
        srv.close()
        await srv.wait_closed()

    asyncio.run(scenario())


def test_text_protocol_reset_setconfig_debug(db):
    async def scenario():
        server = RecitationServer(lambda a: "", db=db, engine="tracker")
        srv = await wslib.serve(server.handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        sock = await wslib.connect("127.0.0.1", port)

        await sock.send_text(json.dumps({"type": "set_debug", "enabled": True}))
        await sock.send_text(json.dumps(
            {"type": "set_config", "preset": "conservative"}))
        await sock.send_text(json.dumps({"type": "reset"}))
        msg = json.loads((await asyncio.wait_for(sock.receive(), 10)).text)
        assert msg["type"] == "reset_done"
        await sock.close()
        srv.close()
        await srv.wait_closed()

    asyncio.run(scenario())


def test_http_static_app_shell(db):
    """GET / serves the browser app (web/index.html) beside the WS endpoint."""

    async def scenario():
        server = RecitationServer(lambda a: "", db=db)
        srv = await wslib.serve(server.handle, "127.0.0.1", 0,
                                http_handler=server.api.handle)
        port = srv.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b"GET / HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n")
        await writer.drain()
        data = await asyncio.wait_for(reader.read(), 10)
        writer.close()
        head, _, body = data.partition(b"\r\n\r\n")
        assert b"200" in head.split(b"\r\n")[0]
        assert b"text/html" in head
        assert b"Tilawa" in body
        # path traversal rejected
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b"GET /../SURVEY.md HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n")
        await writer.drain()
        data = await asyncio.wait_for(reader.read(), 10)
        writer.close()
        assert b"404" in data.split(b"\r\n")[0]

    asyncio.run(scenario())


def test_model_loading_gate(db):
    """Audio fed before the model is ready gets model_loading progress
    replies instead of being decoded (server-side analogue of the
    reference's model-cache download progress, model-cache.ts:38-70)."""

    class FakeLoader:
        state = {"phase": "verify", "progress": 0.4, "ready": False}

        def __call__(self, audio):  # pragma: no cover - must not be hit
            raise AssertionError("transcribe called before ready")

    async def scenario():
        server = RecitationServer(FakeLoader(), db=db)
        srv = await wslib.serve(server.handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        sock = await wslib.connect("127.0.0.1", port)

        await sock.send_text("status")
        status = json.loads((await sock.receive()).text)
        assert status["model"]["phase"] == "verify"

        await sock.send_bytes(np.zeros(4800, np.float32).tobytes())
        reply = json.loads((await sock.receive()).text)
        assert reply["type"] == "model_loading"
        assert reply["phase"] == "verify"
        assert reply["progress"] == 0.4

        await sock.close()
        srv.close()
        await srv.wait_closed()

    asyncio.run(scenario())


def test_api_status_includes_model_state(db, tmp_path):
    from tilawa_tpu.streaming.api import ApiService

    api = ApiService(
        db=db, storage_dir=tmp_path, backend="test",
        model_state=lambda: {"phase": "warmup", "progress": 0.66,
                             "ready": False},
    )
    assert api.status()["model"]["phase"] == "warmup"


def test_static_serves_sw_and_manifest():
    from tilawa_tpu.streaming.api import ApiService

    for route, ctype in (
        ("/sw.js", "text/javascript"),
        ("/manifest.webmanifest", "application/manifest+json"),
    ):
        got = ApiService._static(route)
        assert got is not None, route
        status, content_type, body = got
        assert status == 200 and content_type.startswith(ctype) and body
