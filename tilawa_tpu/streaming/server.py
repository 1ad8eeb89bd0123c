"""WebSocket recitation server (reference: web/server.py rebuilt on the
stdlib WS layer + transport-free streaming engines).

Protocol (parity with the reference worker/server message surface):
  binary frames    raw float32 PCM 16 kHz mono chunks
  "status"         → {"type": "status", ...}      (REST /api/status twin)
  {"type":"reset"}                                 rebuild the engine state
  {"type":"set_config", "preset"|knobs...}         live config update
                     (reference: worker set_config, inference.ts:65-69)
  {"type":"set_debug","enabled":true}              stream tracker diagnostic
                     events as {"type":"debug",...} (inference.ts:31-39)
Replies: verse_match / word_progress / raw_transcript / debug JSON.

Engines:
  tracker  — full RecitationTracker (browser brain: discovery/tracking FSM,
             acoustic fusion, deferred emission; lib/tracker.ts)
  session  — server-flavored RecitationSession (web/server.py FSM)

Inference is serialized with an asyncio lock exactly like the reference's
single transcribe lock (server.py:569) — one TPU, one stream of forwards.
The REST/static surface (/, /api/*, /admin) rides the same port via
ApiService.
"""

from __future__ import annotations

import argparse
import asyncio
import json

import numpy as np

from tilawa_tpu.data.quran import QuranDB
from tilawa_tpu.streaming import ws as wslib


class RecitationServer:
    def __init__(self, transcribe, db: QuranDB | None = None,
                 storage_dir: str = "storage", backend: str = "real",
                 engine: str = "session"):
        from tilawa_tpu.streaming.api import ApiService

        self.transcribe = transcribe
        self.db = db or QuranDB()
        self.engine = engine
        self._lock = asyncio.Lock()
        self.api = ApiService(db=self.db, storage_dir=storage_dir,
                              backend=backend)

    def _make_engine(self, debug_sink):
        if self.engine == "tracker":
            from tilawa_tpu.streaming.tracker import (
                RecitationTracker,
                TranscribeResult,
            )

            def as_result(audio: np.ndarray) -> TranscribeResult:
                out = self.transcribe(audio)
                if isinstance(out, TranscribeResult):
                    return out
                return TranscribeResult(text=out or "")

            return RecitationTracker(
                as_result, db=self.db, on_diagnostic=debug_sink
            )
        from tilawa_tpu.streaming.session import RecitationSession

        def as_text(audio: np.ndarray) -> str:
            out = self.transcribe(audio)
            return out if isinstance(out, str) else out.text

        return RecitationSession(as_text, db=self.db)

    async def handle(self, sock: wslib.WebSocket, path: str) -> None:
        loop = asyncio.get_event_loop()
        debug_on = False
        debug_events: list[dict] = []

        def debug_sink(event: dict) -> None:
            if debug_on:
                debug_events.append(event)

        engine = self._make_engine(debug_sink)
        while True:
            msg = await sock.receive()
            if msg.is_text:
                text = msg.text.strip()
                if text == "status":
                    await sock.send_text(json.dumps(
                        {"type": "status", "ok": True, "engine": self.engine,
                         "total_verses": self.db.total_verses,
                         "model_size_bytes": getattr(
                             self.transcribe, "model_size_bytes", 0),
                         "weights": getattr(self.transcribe, "weights", "")}))
                    continue
                try:
                    cmd = json.loads(text)
                except json.JSONDecodeError:
                    continue
                ctype = cmd.get("type")
                if ctype == "reset":
                    engine = self._make_engine(debug_sink)
                    await sock.send_text(json.dumps({"type": "reset_done"}))
                elif ctype == "set_config" and hasattr(engine, "set_config"):
                    partial = {k: v for k, v in cmd.items() if k != "type"}
                    preset = partial.pop("preset", None)
                    if preset is not None:
                        from tilawa_tpu.streaming.config import STREAMING_PRESETS

                        base = STREAMING_PRESETS.get(preset)
                        if base is not None:
                            engine.set_config(base)
                    if partial:
                        try:
                            engine.set_config(partial)
                        except (ValueError, TypeError) as e:
                            await sock.send_text(json.dumps(
                                {"type": "error", "error": str(e)}))
                elif ctype == "set_debug":
                    debug_on = bool(cmd.get("enabled", True))
                continue
            samples = np.frombuffer(msg.data, dtype=np.float32)
            async with self._lock:
                out = await loop.run_in_executor(None, engine.feed, samples)
            for event in debug_events:
                await sock.send_text(json.dumps(
                    {"type": "debug", "event": event}, ensure_ascii=False,
                    default=str))
            debug_events.clear()
            for m in out:
                await sock.send_text(json.dumps(m, ensure_ascii=False))


def _real_transcribe():
    """Checkpoint-backed acoustic decode returning TranscribeResult (text +
    log-probs for the tracker's acoustic fusion)."""
    from tilawa_tpu.models.fastconformer import FastConformerConfig
    from tilawa_tpu.pipeline.predict import Recognizer
    from tilawa_tpu.pipeline.runtime import EncoderRuntime
    from tilawa_tpu.train.checkpoint import load_variables, shipped_checkpoint

    ckpt = shipped_checkpoint()
    if ckpt:
        config, variables = load_variables(ckpt)
        runtime = EncoderRuntime(config, variables)
    else:
        runtime = EncoderRuntime(FastConformerConfig.large())
    recognizer = Recognizer(runtime)
    def fn(audio):
        return recognizer.transcribe_result(audio)

    # surfaced in the WS/REST status payloads (the browser's analogue of
    # the reference's model-cache progress display, model-cache.ts:38-70)
    fn.model_size_bytes = recognizer.model_size()
    fn.weights = str(ckpt) if ckpt else "random-init"
    return fn


async def _amain(host: str, port: int, backend: str, engine: str):
    if backend == "real":
        transcribe = _real_transcribe()
    else:
        raise SystemExit(f"unknown backend {backend!r}")
    server = RecitationServer(transcribe, backend=backend, engine=engine)
    srv = await wslib.serve(server.handle, host, port,
                            http_handler=server.api.handle)
    print(f"tilawa-tpu WS server on ws://{host}:{port}/ws "
          f"(engine={engine}; app: http://{host}:{port}/, REST: /api/status, "
          f"/api/surah/{{n}}, /api/reports, /api/diagnostics, /admin)")
    async with srv:
        await srv.serve_forever()


def main():
    parser = argparse.ArgumentParser(description="tilawa-tpu streaming server")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--backend", default="real")
    parser.add_argument("--engine", default="session",
                        choices=["tracker", "session"])
    args = parser.parse_args()
    asyncio.run(_amain(args.host, args.port, args.backend, args.engine))


if __name__ == "__main__":
    main()
