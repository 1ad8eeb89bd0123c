#!/usr/bin/env python
"""Round-3 post-training TPU eval queue (one process, one device init).

A) Champion batch rows refresh (VERDICT r2 #8): c2c-direct-mixed-tta on
   v1/v2/v3 with TILAWA_PROFILE stage breakdowns, saved to latest.json.
   Also validates the chunked long-clip forward end to end (v1 must stay
   100%).
B) Held-out phase-2 checkpoint selection: heldout3 step_* on v2 (fit
   guard) and v1 (the honest held-out number).

Usage: python scripts/round3_eval.py [--skip-champion] [--heldout-steps 6000,4000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("TILAWA_PROFILE", "1")

from tilawa_tpu.eval.runner import load_manifest, run_experiment, save_results


def log(msg: str) -> None:
    print(f"[r3eval +{time.monotonic() - T0:7.1f}s] {msg}", flush=True)


T0 = time.monotonic()


def champion_rows() -> None:
    from tilawa_tpu.eval.experiments import get_experiment

    exp = get_experiment("c2c-direct-mixed-tta")
    for corpus in ("v1", "v2", "v3"):
        samples, corpus_dir = load_manifest(corpus)
        if not (corpus_dir / "manifest.json").exists():
            continue
        log(f"champion {corpus}: {len(samples)} samples")
        result = run_experiment(
            "c2c-direct-mixed-tta", exp, samples, corpus_dir
        )
        log(
            f"champion {corpus}: R {result['recall']:.3f} "
            f"P {result['precision']:.3f} Seq {result['sequence_accuracy']:.3f} "
            f"mean {result['avg_latency']:.2f}s p50 {result['p50_latency']:.2f}s "
            f"n={result['total']}"
        )
        # stage breakdown from the profile rows
        stages: dict[str, float] = {}
        for row in result["per_sample"]:
            for k, v in row.get("profile", {}).items():
                stages[k] = stages.get(k, 0.0) + v
        n = max(len(result["per_sample"]), 1)
        log("stage means: " + ", ".join(
            f"{k}={v / n:.3f}s" for k, v in sorted(stages.items())
        ))
        save_results([result], mode="full", category=None)
        out = REPO / "benchmark" / "results" / f"round3_champion_{corpus}_profile.json"
        out.write_text(json.dumps(result, ensure_ascii=False, indent=1))
        log(f"saved {out.name}")


def heldout_rows(step_dirs: list[Path]) -> None:
    from tilawa_tpu.pipeline.predict import Recognizer
    from tilawa_tpu.pipeline.runtime import EncoderRuntime
    from tilawa_tpu.train.checkpoint import load_variables

    for ckpt in step_dirs:
        if not (ckpt / "variables.msgpack").exists():
            log(f"skip {ckpt} (missing)")
            continue
        log(f"heldout eval {ckpt}")
        config, variables = load_variables(ckpt)
        rec = Recognizer(EncoderRuntime(config, variables), tta=True)
        for corpus in ("v2", "v1"):
            samples, corpus_dir = load_manifest(corpus)
            result = run_experiment(f"heldout3@{ckpt.name}", rec, samples, corpus_dir)
            log(
                f"  {ckpt.name} {corpus}: R {result['recall']:.3f} "
                f"P {result['precision']:.3f} Seq {result['sequence_accuracy']:.3f} "
                f"n={result['total']}"
            )
            out = (
                REPO / "benchmark" / "results"
                / f"round3_heldout3_{ckpt.name}_{corpus}.json"
            )
            out.write_text(json.dumps(
                {k: v for k, v in result.items() if k != "dispositions"},
                ensure_ascii=False,
            ))
        del rec, variables  # free HBM before the next checkpoint


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip-champion", action="store_true")
    parser.add_argument("--heldout-steps", default="006000",
                        help="comma list of heldout3 step suffixes, or 'none'")
    args = parser.parse_args()

    import jax.numpy as jnp

    log("acquiring device")
    float(jnp.ones(8).sum())
    log("device ready")

    if not args.skip_champion:
        champion_rows()
    if args.heldout_steps != "none":
        steps = [
            REPO / "checkpoints" / "heldout3" / f"step_{s.zfill(6)}"
            for s in args.heldout_steps.split(",")
        ]
        heldout_rows(steps)
    log("done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
