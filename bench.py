#!/usr/bin/env python
"""tilawa-tpu headline benchmark.

Runs the champion pipeline (c2c-direct-mixed-tta equivalent: jitted int4
FastConformer forward + greedy decode + retrieval + batched on-device CTC
rerank + gated TTA) over the v1 corpus audio on the real TPU and reports
p50 end-to-end latency per clip against the reference's 0.84 s champion
number (BASELINE.md; reference: benchmark/results/latest.json).

Budget-safe by construction: a hard deadline (BENCH_BUDGET_S, default 420 s)
is checked between stages and between clips, a SIGTERM handler emits the
JSON line even if an outer `timeout` fires first, and partial results carry
"partial": true. Progress streams to stderr.

Warm-up cost model (measured on the tunneled v5e backend): the FIRST big
program in a process pays ~110 s (fp) / ~230 s (int4) of server-side
compile that no client-side cache can remove (.jax_cache only covers the
~3 s client phase); every further program shape in the same process is
~5 s because Mosaic kernel compiles are shared in-session. So the schedule
is: absorb one big warm-up on the smallest bucket, then cheap sibling
warm-ups, then the timed loop at ~0.07 s/forward steady state.

Prints ONE JSON line:
  {"metric": "p50_latency_s_per_clip_v1", "value": ..., "unit": "s",
   "vs_baseline": <value / 0.84>, ...extras}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(Path(__file__).parent / ".jax_cache"))

import numpy as np

REPO = Path(__file__).resolve().parent
BASELINE_P50_S = 0.84  # reference champion mean/median latency per clip
BUDGET_S = float(os.getenv("BENCH_BUDGET_S", "420"))
_T0 = time.monotonic()


def _left() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _log(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


OUT: dict = {
    "metric": "p50_latency_s_per_clip_v1",
    "value": None,
    "unit": "s",
    "vs_baseline": None,
    "partial": True,
}


def _emit() -> None:
    print(json.dumps(OUT), flush=True)


def main() -> None:
    from tilawa_tpu.data.audio import UnsupportedAudioFormat, load_audio
    from tilawa_tpu.eval.metrics import predict_to_emissions, score_sequence
    from tilawa_tpu.eval.runner import load_manifest
    from tilawa_tpu.models.fastconformer import FastConformerConfig
    from tilawa_tpu.pipeline.predict import Recognizer
    from tilawa_tpu.pipeline.runtime import EncoderRuntime, bucket_length
    from tilawa_tpu.train.checkpoint import load_variables, shipped_checkpoint

    # Pay the per-process device-acquisition cost up front and report it
    # separately: on the tunneled backend the FIRST device op of a process
    # blocks 80-450 s (measured; varies with server load) regardless of
    # program size — it is queue/session time, not compile time, and must
    # not be conflated with warm-up or per-clip latency.
    import jax.numpy as jnp

    _log(f"budget {BUDGET_S:.0f}s; acquiring device")
    t = time.monotonic()
    float(jnp.ones(8).sum())
    OUT["device_init_s"] = round(time.monotonic() - t, 1)
    _log(f"device ready in {OUT['device_init_s']}s; loading checkpoint")
    ckpt = shipped_checkpoint()
    if ckpt:
        config, variables = load_variables(ckpt)
        runtime = EncoderRuntime(config, variables)
        weights = str(ckpt)
        model_size = sum(
            f.stat().st_size for f in Path(ckpt).iterdir() if f.is_file()
        )
    else:
        runtime = EncoderRuntime(FastConformerConfig.large(quant="int4"))
        weights = "random-init (latency-representative; trained ckpt not present)"
        model_size = 0
    recognizer = Recognizer(runtime, tta=True)
    OUT["weights"] = weights
    OUT["model_size_bytes"] = model_size
    _log(f"checkpoint ready ({weights})")

    samples, corpus_dir = load_manifest("v1")
    audios: list[tuple[str, np.ndarray, list[dict]]] = []
    skipped = 0
    for s in samples:
        path = corpus_dir / s["file"]
        if not path.exists():
            skipped += 1
            continue
        try:
            audio = load_audio(path)
        except UnsupportedAudioFormat:
            skipped += 1
            continue
        expected = s.get(
            "expected_verses", [{"surah": s["surah"], "ayah": s["ayah"]}]
        )
        audios.append((s["id"], audio, expected))
    OUT["n_total_manifest"] = len(samples)
    OUT["n_skipped_undecodable_or_absent"] = skipped
    # Short clips first: if the deadline cuts the run, the cheap buckets
    # (most samples) are already measured.
    audios.sort(key=lambda x: len(x[1]))
    _log(f"{len(audios)} clips decodable ({skipped} absent/undecodable)")

    # Warmup: compile/load each audio bucket once (uncounted; reference
    # excludes warmup too: benchmark/runner.py:271-280). Ascending order so
    # budget exhaustion leaves the small buckets (most clips) warm.
    seen = set()
    for _sid, audio, _exp in audios:
        b = bucket_length(len(audio))
        if b in seen:
            continue
        if _left() < 30:
            _log(f"budget: skipping warmup of bucket {b}+")
            break
        seen.add(b)
        t = time.monotonic()
        recognizer.predict_audio(audio)
        _log(f"warm bucket {b}: {time.monotonic() - t:.1f}s")

    latencies: list[float] = []
    total_audio_s = 0.0
    scores = {"recall": 0.0, "precision": 0.0, "sequence_accuracy": 0.0}
    n_done = 0
    for sid, audio, expected in audios:
        if _left() < 10:
            _log(f"budget: stopping timed loop after {n_done} clips")
            break
        t0 = time.perf_counter()
        result = recognizer.predict_audio(audio)
        latencies.append(time.perf_counter() - t0)
        total_audio_s += len(audio) / 16000.0
        s = score_sequence(expected, predict_to_emissions(result))
        for k in scores:
            scores[k] += s[k]
        n_done += 1
    _log(f"timed loop: {n_done} clips in {sum(latencies):.1f}s")

    n = len(latencies)
    if n:
        lat = sorted(latencies)
        wall = sum(latencies)
        OUT["value"] = round(lat[n // 2], 4)
        OUT["vs_baseline"] = round(lat[n // 2] / BASELINE_P50_S, 4)
        OUT["mean_latency_s"] = round(wall / n, 4)
        OUT["p90_latency_s"] = round(lat[int(0.9 * (n - 1))], 4)
        OUT["audio_sec_per_sec"] = round(total_audio_s / wall, 2) if wall else None
        OUT["n_clips"] = n
        OUT["recall"] = round(scores["recall"] / n, 4)
        OUT["seq_acc"] = round(scores["sequence_accuracy"] / n, 4)
        OUT["partial"] = n < len(audios)

    # Whole-corpus batched throughput (TPU batch-axis parallelism) — only
    # with comfortable headroom; it compiles [8, bucket] shapes.
    if n == len(audios) and _left() > 120:
        _log("batched corpus eval")
        from tilawa_tpu.eval.batched import batched_corpus_eval

        batched = batched_corpus_eval(recognizer, audios, batch_size=8)
        OUT["audio_sec_per_sec_batched"] = batched["audio_sec_per_sec"]
        OUT["batched_recall"] = batched["recall"]
    else:
        _log("skipping batched eval (budget or partial timed loop)")


def _on_term(signum, frame):  # noqa: ARG001 — signal handler signature
    OUT["error"] = f"killed by signal {signum} at +{time.monotonic() - _T0:.0f}s"
    _emit()
    sys.stdout.flush()
    os._exit(124)


if __name__ == "__main__":
    import signal

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    try:
        main()
    except Exception as e:  # the JSON line must survive any failure
        OUT["error"] = f"{type(e).__name__}: {e}"
        import traceback

        traceback.print_exc()
    _emit()
