#!/usr/bin/env python
"""tilawa-tpu headline benchmark.

Runs the champion pipeline (c2c-direct-mixed equivalent: jitted FastConformer
forward at the reference's 115M-param scale + greedy decode + retrieval +
batched on-device CTC rerank) over the v1 corpus audio on the real TPU and
reports p50 end-to-end latency per clip against the reference's 0.84 s
champion number (BASELINE.md; reference: benchmark/results/latest.json).

Latency is weight-agnostic (same architecture, same dispatch pattern), so
random weights measure the same compute path the trained model will use;
accuracy of the decision stack is tracked separately by the oracle
experiment (100/100/100 on v1 — benchmark/results/latest.json).

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


def main() -> None:
    from tilawa_tpu.data.audio import UnsupportedAudioFormat, load_audio
    from tilawa_tpu.eval.metrics import predict_to_emissions, score_sequence
    from tilawa_tpu.eval.runner import load_manifest
    from tilawa_tpu.models.fastconformer import FastConformerConfig
    from tilawa_tpu.pipeline.predict import Recognizer
    from tilawa_tpu.pipeline.runtime import EncoderRuntime
    from tilawa_tpu.train.checkpoint import load_variables, shipped_checkpoint

    t_setup = time.perf_counter()
    ckpt = shipped_checkpoint()
    if ckpt:
        config, variables = load_variables(ckpt)
        if config.quant != "int4":
            from tilawa_tpu.train.quantize import quantize_variables, quantized_config

            variables = quantize_variables(variables)
            config = quantized_config(config)
        runtime = EncoderRuntime(config, variables)
        weights = str(ckpt)
    else:
        # Champion configuration: int4 packed weights, Pallas dequant
        # matmuls (c2c-direct-mixed-tta equivalent).
        runtime = EncoderRuntime(FastConformerConfig.large(quant="int4"))
        weights = "random-init (latency-representative; trained ckpt not present)"
    recognizer = Recognizer(runtime, tta=True)

    samples, corpus_dir = load_manifest("v1")
    audios: list[tuple[str, np.ndarray, list[dict]]] = []
    for s in samples:
        path = corpus_dir / s["file"]
        if not path.exists():
            continue
        try:
            audio = load_audio(path)
        except UnsupportedAudioFormat:
            continue
        expected = s.get(
            "expected_verses", [{"surah": s["surah"], "ayah": s["ayah"]}]
        )
        audios.append((s["id"], audio, expected))

    # Warmup: compile every audio bucket + rerank shapes (uncounted,
    # reference excludes warmup too: benchmark/runner.py:271-280).
    seen_buckets = set()
    from tilawa_tpu.pipeline.runtime import bucket_length

    for _sid, audio, _exp in audios:
        b = bucket_length(len(audio))
        if b not in seen_buckets:
            seen_buckets.add(b)
            recognizer.predict_audio(audio)
    setup_s = time.perf_counter() - t_setup

    latencies = []
    total_audio_s = 0.0
    scores = {"recall": 0.0, "precision": 0.0, "sequence_accuracy": 0.0}
    for _sid, audio, expected in audios:
        t0 = time.perf_counter()
        result = recognizer.predict_audio(audio)
        latencies.append(time.perf_counter() - t0)
        total_audio_s += len(audio) / 16000.0
        s = score_sequence(expected, predict_to_emissions(result))
        for k in scores:
            scores[k] += s[k]

    n = len(latencies)
    lat = sorted(latencies)
    p50 = lat[n // 2] if n else float("nan")
    mean = sum(latencies) / n if n else float("nan")
    wall = sum(latencies)

    # Whole-corpus batched throughput (TPU batch-axis parallelism).
    from tilawa_tpu.eval.batched import batched_corpus_eval

    batched = batched_corpus_eval(recognizer, audios, batch_size=8)

    out = {
        "metric": "p50_latency_s_per_clip_v1",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(p50 / BASELINE_P50_S, 4),
        "mean_latency_s": round(mean, 4),
        "p90_latency_s": round(lat[int(0.9 * (n - 1))], 4) if n else None,
        "audio_sec_per_sec": round(total_audio_s / wall, 2) if wall else None,
        "audio_sec_per_sec_batched": batched["audio_sec_per_sec"],
        "n_clips": n,
        "recall": round(scores["recall"] / n, 4) if n else None,
        "seq_acc": round(scores["sequence_accuracy"] / n, 4) if n else None,
        "batched_recall": batched["recall"],
        "weights": weights,
        "setup_s": round(setup_s, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
