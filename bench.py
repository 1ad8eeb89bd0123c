#!/usr/bin/env python
"""tilawa-tpu headline benchmark.

Runs the champion pipeline (c2c-direct-mixed-tta equivalent: jitted int4
FastConformer forward + greedy decode + retrieval + batched on-device CTC
rerank + gated TTA) over the v1 corpus audio on the real TPU and reports
end-to-end latency per clip against the reference champion
(BASELINE.md; reference: benchmark/results/latest.json — mean 0.84 s,
easy-sample median ~0.25 s per
reference experiments/c2c-direct-mixed-tta/run.py:22-26).

Budget-safe by construction: a hard deadline (BENCH_BUDGET_S, default 420 s)
is checked between stages and between clips, a SIGTERM handler emits the
JSON line even if an outer `timeout` fires first, and partial results carry
"partial": true. Progress streams to stderr.

Schedule (BENCH_r02 lesson — the batched metric starved at the end of the
budget): device init → checkpoint (quantized to int4 if the source is fp)
→ warm the per-clip programs (bucket forwards + TTA + rerank shapes; with
a crop-trained checkpoint and long_chunking, >16 s clips instead run as
ONE [K, 256000] stitched dispatch) → BATCHED corpus eval → per-clip
timed loop.

Prints ONE JSON line:
  {"metric": "p50_latency_s_per_clip_v1", "value": ..., "unit": "s",
   "vs_baseline": <p50 / 0.25 reference median>, ...extras}
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
# Honest comparators (VERDICT r2: 0.84 was the reference MEAN mislabeled
# as p50). Median on easy samples ~0.25 s: reference
# experiments/c2c-direct-mixed-tta/run.py:22-26.
REF_MEAN_S = 0.84
REF_MEDIAN_S = 0.25
V5E_BF16_PEAK_FLOPS = 197e12
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
    "baseline": {"ref_mean_s": REF_MEAN_S, "ref_median_easy_s": REF_MEDIAN_S},
    "partial": True,
}


def _emit() -> None:
    print(json.dumps(OUT), flush=True)


def main() -> None:
    from tilawa_tpu.data.audio import UnsupportedAudioFormat, load_audio
    from tilawa_tpu.eval.metrics import best_emission_score, predict_to_emissions
    from tilawa_tpu.eval.runner import load_manifest
    from tilawa_tpu.models.fastconformer import FastConformerConfig, forward_flops
    from tilawa_tpu.pipeline.predict import Recognizer
    from tilawa_tpu.pipeline.runtime import (
        LONG_THRESHOLD,
        EncoderRuntime,
        bucket_length,
    )
    from tilawa_tpu.train.checkpoint import load_variables, shipped_checkpoint

    # Pay the per-process device-acquisition cost up front and report it
    # separately: on the tunneled backend the FIRST device op of a process
    # blocks 80-450 s (measured; varies with server load) regardless of
    # program size — it is queue/session time, not compile time, and must
    # not be conflated with warm-up or per-clip latency.
    import jax.numpy as jnp

    _log(f"budget {BUDGET_S:.0f}s; acquiring device")
    t = time.monotonic()
    # Dead-tunnel guard: acquisition blocks FOREVER if the relay daemon is
    # gone (observed in round 3) — probe in a thread and emit a structured
    # error instead of dying to the outer timeout with no JSON.
    import threading

    probe_done = threading.Event()

    def _probe():
        float(jnp.ones(8).sum())
        probe_done.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not probe_done.wait(timeout=max(60.0, BUDGET_S * 0.6)):
        OUT["error"] = (
            f"device acquisition timed out after {max(60.0, BUDGET_S * 0.6):.0f}s "
            "(TPU tunnel relay down?)"
        )
        _emit()
        os._exit(3)
    OUT["device_init_s"] = round(time.monotonic() - t, 1)
    _log(f"device ready in {OUT['device_init_s']}s; loading checkpoint")
    ckpt = shipped_checkpoint()
    if ckpt:
        config, variables = load_variables(ckpt)
        weights = str(ckpt)
        if config.quant != "int4":
            # The headline claims the int4 champion path — quantize a fp
            # checkpoint on the fly rather than silently measuring fp
            # (ADVICE r2 low #5).
            from tilawa_tpu.train.quantize import (
                quantize_variables,
                quantized_config,
            )

            _log(f"checkpoint is {config.quant or 'fp'}; packing int4")
            variables = quantize_variables(variables)
            config = quantized_config(config)
            weights += " (int4-packed at load)"
        runtime = EncoderRuntime(config, variables)
    else:
        config = FastConformerConfig.large(quant="int4")
        runtime = EncoderRuntime(config)
        weights = "random-init (latency-representative; trained ckpt not present)"
    recognizer = Recognizer(runtime, tta=True)
    OUT["weights"] = weights
    # Packed on-device bytes — the deployable-artifact size, consistent
    # with validate_streaming's model_size (ADVICE r2 low #5).
    OUT["model_size_bytes"] = recognizer.model_size()
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
        audios.append((s["id"], audio, expected, s.get("also_accept")))
    OUT["n_total_manifest"] = len(samples)
    OUT["n_skipped_undecodable_or_absent"] = skipped
    # Short clips first: if the deadline cuts the run, the cheap buckets
    # (most samples) are already measured.
    audios.sort(key=lambda x: len(x[1]))
    _log(f"{len(audios)} clips decodable ({skipped} absent/undecodable)")

    # ---- Warmup (uncounted; the reference excludes warmup too:
    # benchmark/runner.py:271-280). One compile per program the timed loop
    # can hit: [1, bucket] forwards, [K, 256000] stitched-long forwards,
    # the [2, bucket] TTA shape, and the rerank lattice.
    warm_shapes: list[tuple[str, object]] = []
    seen_buckets: set[int] = set()
    seen_k: set[int] = set()
    tta_bucket = 0
    for _sid, audio, _exp, _alt in audios:
        n = len(audio)
        if runtime.long_chunking and n > LONG_THRESHOLD:
            k = runtime.chunk_count(n)
            if k not in seen_k:
                seen_k.add(k)
                warm_shapes.append((f"long k={k}", ("long", n)))
        else:
            b = bucket_length(n)
            if b not in seen_buckets:
                seen_buckets.add(b)
                warm_shapes.append((f"bucket {b}", ("single", b)))
            if n <= LONG_THRESHOLD:
                # TTA batches bucket by the 0.9x (lengthened) variant —
                # warm THAT shape, not the original's bucket (code review
                # r3 finding #5)
                tta_bucket = max(tta_bucket, bucket_length(int(n / 0.9) + 1))
    if tta_bucket:
        warm_shapes.append((f"tta [2, {tta_bucket}]", ("tta", tta_bucket)))

    for label, spec in warm_shapes:
        if _left() < 30:
            _log(f"budget: skipping warmup of {label}+")
            break
        t = time.monotonic()
        kind, n = spec
        if kind == "single":
            recognizer.predict_audio(np.zeros(n, dtype=np.float32))
        elif kind == "long":
            runtime.forward_long(np.zeros(n, dtype=np.float32))
        else:  # tta 2-batch
            runtime.forward_batch(
                [np.zeros(n, dtype=np.float32), np.zeros(n - 1, dtype=np.float32)]
            )
        _log(f"warm {label}: {time.monotonic() - t:.1f}s")
    # rerank lattice shape (T=512, C=512, L=128) — predict warm-ups only
    # reach it when their dummy audio fails the text gate, so warm directly.
    if _left() > 20:
        from tilawa_tpu.pipeline.rerank import score_token_lists

        t = time.monotonic()
        lp = jnp.zeros((512, config.vocab_size + 1), jnp.float32)
        score_token_lists(lp, 400, [[1, 2, 3]] * 64, blank_id=config.blank_id)
        _log(f"warm rerank lattice: {time.monotonic() - t:.1f}s")

    # ---- Batched corpus throughput FIRST (the r02 schedule starved it).
    audio_s_total = sum(len(a) / 16000.0 for _s, a, _e, _alt in audios)
    # per-clip FLOPs sum: the T^2 attention term must use each clip's own
    # length, not the corpus total (code review r3 finding #2)
    corpus_flops = sum(
        forward_flops(config, len(a) / 16000.0) for _s, a, _e, _alt in audios
    )
    if _left() > 60:
        _log("batched corpus eval")
        try:
            from tilawa_tpu.eval.batched import batched_corpus_eval

            batched = batched_corpus_eval(
                recognizer,
                [(sid, a, e) for sid, a, e, _alt in audios],
                batch_size=int(os.getenv("TILAWA_BATCHED_BS", "8")),
            )
            OUT["audio_sec_per_sec_batched"] = batched["audio_sec_per_sec"]
            OUT["batched_recall"] = batched["recall"]
            # TTA-inclusive: the batched throughput and the batched recall
            # now come from the SAME path (VERDICT r3 weak #2)
            OUT["batched_tta_clips"] = batched.get("n_tta", 0)
            if batched.get("wall_s"):
                # forwards overlap the host stack now, so device-only time
                # is no longer separable on host: report end-to-end MFU
                # (conservative — includes host decision-stack time).
                mfu = (
                    corpus_flops / batched["wall_s"] / V5E_BF16_PEAK_FLOPS
                )
                OUT["mfu_batched_e2e"] = round(mfu, 5)
                OUT["batched_fetch_wait_s"] = batched.get("fetch_wait_s")
                OUT["batched_decode_s"] = batched.get("decode_s")
                OUT["batched_predict_s"] = batched.get("predict_s")
                OUT["batched_wall_s"] = batched.get("wall_s")
        except Exception as e:  # noqa: BLE001 — batched eval must not kill the bench
            _log(f"batched eval failed: {e}")
            OUT["batched_error"] = str(e)
    else:
        _log("skipping batched eval (budget)")

    # ---- Per-clip timed loop.
    latencies: list[float] = []
    total_audio_s = 0.0
    scores = {"recall": 0.0, "precision": 0.0, "sequence_accuracy": 0.0}
    n_done = 0
    for sid, audio, expected, also_accept in audios:
        if _left() < 10:
            _log(f"budget: stopping timed loop after {n_done} clips")
            break
        t0 = time.perf_counter()
        result = recognizer.predict_audio(audio)
        latencies.append(time.perf_counter() - t0)
        total_audio_s += len(audio) / 16000.0
        s = best_emission_score(
            expected, predict_to_emissions(result), also_accept
        )
        for k in scores:
            scores[k] += s[k]
        n_done += 1
    _log(f"timed loop: {n_done} clips in {sum(latencies):.1f}s")

    n = len(latencies)
    if n:
        lat = sorted(latencies)
        wall = sum(latencies)
        p50 = lat[n // 2]
        OUT["value"] = round(p50, 4)
        OUT["vs_baseline"] = round(p50 / REF_MEDIAN_S, 4)
        OUT["mean_latency_s"] = round(wall / n, 4)
        OUT["vs_baseline_mean"] = round(wall / n / REF_MEAN_S, 4)
        OUT["p90_latency_s"] = round(lat[int(0.9 * (n - 1))], 4)
        OUT["audio_sec_per_sec"] = round(total_audio_s / wall, 2) if wall else None
        OUT["partial"] = n < len(audios)
        # mfu only on a full run: corpus_flops covers every clip, so a
        # budget-truncated loop would understate it (ADVICE r3 medium #1 —
        # the partial flag must be updated BEFORE this guard reads it).
        if not OUT["partial"] and wall:
            OUT["mfu_sequential"] = round(
                corpus_flops / wall / V5E_BF16_PEAK_FLOPS, 5
            )
        OUT["n_clips"] = n
        OUT["recall"] = round(scores["recall"] / n, 4)
        OUT["seq_acc"] = round(scores["sequence_accuracy"] / n, 4)


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
