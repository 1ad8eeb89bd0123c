"""WebSocket recitation server (reference: web/server.py rebuilt on the
stdlib WS layer + transport-free RecitationSession).

Protocol (parity with the reference): client sends raw float32 PCM frames
as binary messages; server replies with JSON text messages of type
verse_match / word_progress / raw_transcript. A REST-ish text message
"status" returns backend info (reference /api/status equivalent).

Backends:
  real   — FastConformer EncoderRuntime (latest checkpoint or random)
  fake   — text scripted per-connection for tests (see tests)

Inference is serialized with an asyncio lock exactly like the reference's
single transcribe lock (server.py:569) — one TPU, one stream of forwards.
"""

from __future__ import annotations

import argparse
import asyncio
import json

import numpy as np

from tilawa_tpu.data.quran import QuranDB
from tilawa_tpu.streaming import ws as wslib
from tilawa_tpu.streaming.session import RecitationSession


class RecitationServer:
    def __init__(self, transcribe, db: QuranDB | None = None,
                 storage_dir: str = "storage", backend: str = "real"):
        from tilawa_tpu.streaming.api import ApiService

        self.transcribe = transcribe
        self.db = db or QuranDB()
        self._lock = asyncio.Lock()
        self.api = ApiService(db=self.db, storage_dir=storage_dir,
                              backend=backend)

    async def handle(self, sock: wslib.WebSocket, path: str) -> None:
        loop = asyncio.get_event_loop()
        lock = self._lock

        def locked_transcribe(audio: np.ndarray) -> str:
            return self.transcribe(audio)

        session = RecitationSession(locked_transcribe, db=self.db)
        while True:
            msg = await sock.receive()
            if msg.is_text:
                if msg.text.strip() == "status":
                    await sock.send_text(
                        json.dumps(
                            {"type": "status", "ok": True,
                             "total_verses": self.db.total_verses}
                        )
                    )
                continue
            samples = np.frombuffer(msg.data, dtype=np.float32)
            async with lock:
                out = await loop.run_in_executor(None, session.feed, samples)
            for m in out:
                await sock.send_text(json.dumps(m, ensure_ascii=False))


def _real_transcribe():
    from tilawa_tpu.models.fastconformer import FastConformerConfig
    from tilawa_tpu.pipeline.predict import Recognizer
    from tilawa_tpu.pipeline.runtime import EncoderRuntime
    from tilawa_tpu.train.checkpoint import latest_checkpoint, load_variables

    ckpt = latest_checkpoint()
    if ckpt:
        config, variables = load_variables(ckpt)
        runtime = EncoderRuntime(config, variables)
    else:
        runtime = EncoderRuntime(FastConformerConfig.large())
    recognizer = Recognizer(runtime)
    return recognizer.transcribe_audio


async def _amain(host: str, port: int, backend: str):
    if backend == "real":
        transcribe = _real_transcribe()
    else:
        raise SystemExit(f"unknown backend {backend!r}")
    server = RecitationServer(transcribe, backend=backend)
    srv = await wslib.serve(server.handle, host, port,
                            http_handler=server.api.handle)
    print(f"tilawa-tpu WS server on ws://{host}:{port}/ws "
          f"(REST: /api/status, /api/surah/{{n}}, /api/reports, "
          f"/api/diagnostics, /admin)")
    async with srv:
        await srv.serve_forever()


def main():
    parser = argparse.ArgumentParser(description="tilawa-tpu streaming server")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--backend", default="real")
    args = parser.parse_args()
    asyncio.run(_amain(args.host, args.port, args.backend))


if __name__ == "__main__":
    main()
