#!/usr/bin/env python
"""Round-3 stream6 gate + quantized streaming eval (one process).

For each candidate stream6 checkpoint (newest first):
  1. batch guard: c2c-direct v1-short must hold >= 0.94 (the crop
     curriculum must not regress full-clip accuracy — round-2 recipe)
  2. tracker streaming on v1 (chunked windows via the encoder cache)
Winner = best v1 streaming seq-acc among guard-passing checkpoints; it is
exported int8 (<200 MB product constraint, reference README.md:198-208)
and the full v1/v2/v3 streaming rows run through the int8 bundle and save
to latest.json (VERDICT r2 #3/#5).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

T0 = time.monotonic()


def log(msg: str) -> None:
    print(f"[stream-eval +{time.monotonic() - T0:7.1f}s] {msg}", flush=True)


def batch_guard(ckpt: Path) -> float:
    from tilawa_tpu.eval.runner import load_manifest, run_experiment
    from tilawa_tpu.pipeline.predict import Recognizer
    from tilawa_tpu.pipeline.runtime import EncoderRuntime
    from tilawa_tpu.train.checkpoint import load_variables

    config, variables = load_variables(ckpt)
    rec = Recognizer(EncoderRuntime(config, variables), tta=False)
    samples, corpus_dir = load_manifest("v1")
    samples = [s for s in samples if s.get("category") == "short"]
    result = run_experiment(f"guard@{ckpt.name}", rec, samples, corpus_dir)
    return result["sequence_accuracy"]


def streaming_eval(ckpt: Path, corpus: str, save: bool = False) -> dict:
    from tilawa_tpu.data.quran import QuranDB
    from tilawa_tpu.data.token_store import TokenStore
    from tilawa_tpu.eval.validate_streaming import run_validation, save_results
    from tilawa_tpu.pipeline.predict import Recognizer
    from tilawa_tpu.pipeline.runtime import EncoderRuntime
    from tilawa_tpu.train.checkpoint import load_variables

    config, variables = load_variables(ckpt)
    # long_chunking: crop-trained checkpoints handle 16 s windows; the
    # streaming cache then re-forwards only the tail chunk per cycle
    rec = Recognizer(EncoderRuntime(config, variables, long_chunking=True))

    def fn(audio):
        return rec.transcribe_result(audio)

    fn.model_size_bytes = rec.model_size()
    result = run_validation(
        fn, corpus=corpus, db=QuranDB(), token_store=TokenStore.load_default(),
        verbose=False, name=f"tracker-streaming",
    )
    if save:
        save_results([result], mode="streaming", category=None,
                     chunk_seconds=0.3)
    return result


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", default="stream6")
    parser.add_argument("--steps", default=None,
                        help="comma list of step suffixes (default: all, newest first)")
    parser.add_argument("--guard-bar", type=float, default=0.94)
    parser.add_argument("--skip-select", default=None,
                        help="skip selection; use this checkpoint directly")
    args = parser.parse_args()

    import jax.numpy as jnp

    log("acquiring device")
    float(jnp.ones(8).sum())
    log("device ready")

    if args.skip_select:
        best = Path(args.skip_select)
    else:
        run_dir = REPO / "checkpoints" / args.run
        if args.steps:
            cands = [run_dir / f"step_{s.zfill(6)}" for s in args.steps.split(",")]
        else:
            cands = sorted(run_dir.glob("step_*"), reverse=True)
        best, best_seq = None, -1.0
        for ckpt in cands:
            g = batch_guard(ckpt)
            log(f"{ckpt.name}: batch guard v1-short seq {g:.3f}")
            if g < args.guard_bar:
                log(f"  guard failed (< {args.guard_bar}); skip")
                continue
            r = streaming_eval(ckpt, "v1")
            log(
                f"  v1 streaming: R {r['recall']:.3f} P {r['precision']:.3f} "
                f"Seq {r['sequence_accuracy']:.3f} "
                f"viterbi {r['viterbi_sequence_accuracy']:.3f} "
                f"cycle_p90 {r['cycle_p90']}"
            )
            if r["sequence_accuracy"] > best_seq:
                best, best_seq = ckpt, r["sequence_accuracy"]
        if best is None:
            log("no checkpoint passed the guard")
            return 1
    log(f"winner: {best}")

    # int8 export + full streaming rows through the quantized bundle.
    # int4 craters partial-window decodes (round-3: v1 streaming 0.364 fp
    # -> 0.250 int4; v2 0.163) — int8 is ~135 MB, still under the 200 MB
    # product constraint, and numerically near-fp.
    from tilawa_tpu.train.export import export_bundle

    out = REPO / "exports" / f"{args.run}-int8"
    export_bundle(best, out, quant="int8")
    log(f"exported {out}")
    for corpus in ("v1", "v2", "v3"):
        r = streaming_eval(out, corpus, save=True)
        log(
            f"int8 streaming {corpus}: R {r['recall']:.3f} "
            f"P {r['precision']:.3f} Seq {r['sequence_accuracy']:.3f} "
            f"viterbi {r['viterbi_sequence_accuracy']:.3f} "
            f"exact {r['exact_set_accuracy']:.3f} "
            f"model {r['model_size']} "
            f"decode_cycle_p50/p90 {r['decode_cycle_p50']}/{r['decode_cycle_p90']} "
            f"realtime_ok {r['realtime_ok']}"
        )
        row = {k: v for k, v in r.items() if k != "per_sample"}
        (REPO / "benchmark" / "results" / f"round3_stream_{corpus}.json").write_text(
            json.dumps(row, ensure_ascii=False)
        )
    log("done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
