"""REST API service: status, surah lookup, reports, diagnostics, admin."""

import asyncio
import base64
import json

import pytest

from tilawa_tpu.streaming.api import ApiService


@pytest.fixture()
def api(tmp_path):
    return ApiService(storage_dir=tmp_path, backend="test")


def call(api, method, path, body=b""):
    return asyncio.run(api.handle(method, path, {}, body))


class TestApi:
    def test_status(self, api):
        status, ctype, payload = call(api, "GET", "/api/status")
        assert status == 200 and ctype == "application/json"
        data = json.loads(payload)
        assert data["status"] == "ok" and data["verses"] == 6236

    def test_surah(self, api):
        status, _, payload = call(api, "GET", "/api/surah/112")
        assert status == 200
        data = json.loads(payload)
        assert data["surah"] == 112 and len(data["verses"]) == 4

    def test_surah_bad(self, api):
        assert call(api, "GET", "/api/surah/999")[0] == 404
        assert call(api, "GET", "/api/surah/abc")[0] == 400

    def test_report_roundtrip(self, api, tmp_path):
        body = json.dumps(
            {
                "expected": "1:1",
                "got": "2:1",
                "audio_base64": base64.b64encode(b"RIFFfake").decode(),
            }
        ).encode()
        status, _, payload = call(api, "POST", "/api/reports", body)
        assert status == 201
        rid = json.loads(payload)["id"]
        d = tmp_path / "reports" / rid
        assert (d / "report.json").exists()
        assert (d / "audio.wav").read_bytes() == b"RIFFfake"
        saved = json.loads((d / "report.json").read_text())
        assert "audio_base64" not in saved and saved["expected"] == "1:1"

    def test_diagnostics(self, api, tmp_path):
        body = json.dumps({"events": [{"type": "commit"}]}).encode()
        status, _, payload = call(api, "POST", "/api/diagnostics", body)
        assert status == 201
        files = list((tmp_path / "diagnostics").iterdir())
        assert len(files) == 1

    def test_admin_counts(self, api):
        call(api, "POST", "/api/reports", b"{}")
        call(api, "POST", "/api/diagnostics", b"{}")
        status, _, payload = call(api, "GET", "/admin")
        data = json.loads(payload)
        assert status == 200
        assert data["reports"] == 1 and data["diagnostics"] == 1

    def test_unknown_route(self, api):
        assert call(api, "GET", "/nope")[0] == 404

    def test_bad_json_body(self, api):
        status, _, _ = call(api, "POST", "/api/diagnostics", b"not json")
        assert status == 201  # degrades to empty payload, still stored


class TestHttpOverSocket:
    def test_rest_on_ws_port(self, tmp_path):
        """GET /api/status over a real socket served by ws.serve."""
        import urllib.request

        from tilawa_tpu.streaming import ws as wslib

        api = ApiService(storage_dir=tmp_path, backend="sock")

        async def run():
            async def handler(sock, path):  # pragma: no cover - no WS traffic
                await sock.receive()

            srv = await wslib.serve(handler, "127.0.0.1", 0,
                                    http_handler=api.handle)
            port = srv.sockets[0].getsockname()[1]

            def fetch():
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/api/status", timeout=5
                ) as r:
                    return r.status, r.read()

            loop = asyncio.get_event_loop()
            status, body = await loop.run_in_executor(None, fetch)
            srv.close()
            await srv.wait_closed()
            return status, body

        status, body = asyncio.run(run())
        assert status == 200
        assert json.loads(body)["backend"] == "sock"
