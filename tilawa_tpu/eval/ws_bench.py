"""Live WS endpoint benchmark: replay corpus audio against a running
server and score the emitted verse sequence.

Parity with the reference's endpoint benchmark (reference:
scripts/benchmark_streaming_endpoint.py — replay at 300 ms chunks plus a
4 s silence tail so the final-flush path fires, score with
score_sequence).

Usage (server already running):
  python -m tilawa_tpu.eval.ws_bench --port 8765 --corpus v1 --limit 5
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import numpy as np

from tilawa_tpu.data.audio import UnsupportedAudioFormat, load_audio
from tilawa_tpu.eval.metrics import score_sequence
from tilawa_tpu.eval.runner import load_manifest
from tilawa_tpu.streaming import ws as wslib

SAMPLE_RATE = 16000
CHUNK_SECONDS = 0.3
TAIL_SILENCE_SECONDS = 4.0


async def run_sample(
    host: str, port: int, audio: np.ndarray, realtime: bool = False,
    grace_s: float = 1.0,
) -> list[dict]:
    sock = await wslib.connect(host, port)
    messages: list[dict] = []
    chunk = int(SAMPLE_RATE * CHUNK_SECONDS)
    padded = np.concatenate(
        [audio, np.zeros(int(SAMPLE_RATE * TAIL_SILENCE_SECONDS), np.float32)]
    )

    last_msg_t = [time.perf_counter()]

    async def reader():
        try:
            while True:
                msg = await sock.receive()
                if msg.is_text:
                    messages.append(json.loads(msg.text))
                    last_msg_t[0] = time.perf_counter()
        except wslib.ConnectionClosed:
            pass

    task = asyncio.create_task(reader())
    for i in range(0, len(padded), chunk):
        await sock.send_bytes(padded[i:i + chunk].astype(np.float32).tobytes())
        if realtime:
            await asyncio.sleep(CHUNK_SECONDS)
    # grace: wait for the server to drain + flush — adaptive so a loaded
    # server still gets to answer (the realtime_ok bound is measured
    # separately; closing early would just delete the evidence)
    waited = 0.0
    last_n = len(messages)
    while waited < max(grace_s, 8.0):
        await asyncio.sleep(0.5)
        waited += 0.5
        if len(messages) != last_n:
            last_n = len(messages)
            continue
        if waited >= grace_s:
            break
    await sock.close()
    await asyncio.wait_for(task, timeout=5)
    return messages, last_msg_t[0]


def emissions_from_messages(messages: list[dict]) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for m in messages:
        if m.get("type") == "verse_rollback":
            end = m.get("ayah_end") or m["ayah"]
            refs = {(m["surah"], a) for a in range(m["ayah"], end + 1)}
            out = [r for r in out if r not in refs]
        elif m.get("type") == "verse_match":
            end = m.get("ayah_end") or m["ayah"]
            for a in range(m["ayah"], end + 1):
                ref = (m["surah"], a)
                if ref not in out:
                    out.append(ref)
    return out


async def run_concurrent(args, samples, corpus_dir) -> dict:
    """--clients N: N concurrent real-time streams, one WS connection
    each, all live at once — the TPU micro-batch dispatcher coalesces
    their decode windows (streaming/dispatcher.py). Per-client
    realtime_ok is falsifiable: a client that keeps real-time pace
    finishes within its own audio duration + tail + fixed slack; a
    server that falls behind the pace fails the bound."""
    loaded = []
    for s in samples:
        path = corpus_dir / s["file"]
        if not path.exists():
            continue
        try:
            loaded.append((s, load_audio(path)))
        except UnsupportedAudioFormat:
            continue
        if len(loaded) >= args.clients:
            break
    if len(loaded) < args.clients:
        print(f"only {len(loaded)} decodable samples for "
              f"{args.clients} clients")

    async def one(s, audio):
        t0 = time.perf_counter()
        messages, last_t = await run_sample(args.host, args.port, audio, True,
                                            grace_s=2.5)
        # wall to the server's LAST message — the client-side grace loop
        # must not count against the server
        wall = last_t - t0
        duration = len(audio) / SAMPLE_RATE + TAIL_SILENCE_SECONDS
        # replay floor: pacing + 1 s grace + close; slack covers scheduling
        ok = wall <= duration + 3.0
        expected = s.get(
            "expected_verses", [{"surah": s["surah"], "ayah": s["ayah"]}]
        )
        got = emissions_from_messages(messages)
        sc = score_sequence(
            expected, [{"surah": g[0], "ayah": g[1]} for g in got]
        )
        return {
            "id": s["id"], "wall_s": round(wall, 2),
            "audio_s": round(duration, 2), "realtime_ok": ok,
            "sequence_accuracy": sc["sequence_accuracy"],
            "recall": sc["recall"],
        }

    t0 = time.perf_counter()
    rows = await asyncio.gather(*(one(s, a) for s, a in loaded))
    wall = time.perf_counter() - t0
    result = {
        "clients": len(rows),
        "all_realtime_ok": all(r["realtime_ok"] for r in rows),
        "wall_s": round(wall, 2),
        "mean_seq_acc": round(
            sum(r["sequence_accuracy"] for r in rows) / max(len(rows), 1), 4
        ),
        "per_client": list(rows),
    }
    print(json.dumps(result, indent=1))
    return result


async def amain(args) -> dict:
    samples, corpus_dir = load_manifest(args.corpus)
    if args.category:
        samples = [s for s in samples if s["category"] == args.category]
    if args.clients > 1:
        return await run_concurrent(args, samples, corpus_dir)
    if args.limit:
        samples = samples[: args.limit]

    totals = {"recall": 0.0, "precision": 0.0, "sequence_accuracy": 0.0}
    n = 0
    latencies = []
    for s in samples:
        path = corpus_dir / s["file"]
        if not path.exists():
            continue
        try:
            audio = load_audio(path)
        except UnsupportedAudioFormat:
            continue
        t0 = time.perf_counter()
        messages, _last = await run_sample(
            args.host, args.port, audio, args.realtime
        )
        latencies.append(time.perf_counter() - t0)
        expected = s.get(
            "expected_verses", [{"surah": s["surah"], "ayah": s["ayah"]}]
        )
        got = emissions_from_messages(messages)
        sc = score_sequence(
            expected, [{"surah": g[0], "ayah": g[1]} for g in got]
        )
        for k in totals:
            totals[k] += sc[k]
        n += 1
        print(f"  {s['id']}: expected {expected} got {got} "
              f"seq_acc={sc['sequence_accuracy']:.2f}")

    result = {
        "n": n,
        **{k: round(v / n, 4) if n else 0.0 for k, v in totals.items()},
        "mean_wall_s": round(sum(latencies) / n, 3) if n else None,
    }
    print(json.dumps(result))
    return result


def main(argv=None):
    parser = argparse.ArgumentParser(description="live WS endpoint benchmark")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--corpus", default="v1")
    parser.add_argument("--category", default=None)
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--realtime", action="store_true",
                        help="pace chunks at real time instead of flat out")
    parser.add_argument("--clients", type=int, default=1,
                        help=">1: that many concurrent real-time streams "
                             "(exercises the TPU micro-batch dispatcher)")
    args = parser.parse_args(argv)
    asyncio.run(amain(args))


if __name__ == "__main__":
    main()
