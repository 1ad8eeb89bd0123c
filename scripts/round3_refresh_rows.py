#!/usr/bin/env python
"""End-of-round latest.json refresh (VERDICT r2 #8).

1. Drop rows predating the current checkpoint generation (2026-08-20) —
   they carry model_size 0 and lack the acoustics marker.
2. Re-run the CPU-cheap experiments (oracle, oracle-hard, lm-fusion)
   so their rows regenerate with acoustics markers.
3. Optionally (--chip) re-run c2c-direct-mixed (non-TTA) batch rows.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))



def prune_stale(cutoff: str = "2026-08-20") -> int:
    path = REPO / "benchmark" / "results" / "latest.json"
    rows = json.loads(path.read_text())
    fresh = [r for r in rows if r.get("timestamp", "")[:10] >= cutoff]
    path.write_text(json.dumps(fresh, ensure_ascii=False, indent=1))
    return len(rows) - len(fresh)


def run_and_save(name: str, corpus: str, category: str | None = None) -> None:
    from tilawa_tpu.eval.experiments import get_experiment
    from tilawa_tpu.eval.runner import load_manifest, run_experiment, save_results

    samples, corpus_dir = load_manifest(corpus)
    if category:
        samples = [s for s in samples if s.get("category") == category]
    result = run_experiment(name, get_experiment(name), samples, corpus_dir)
    print(
        f"{name} {corpus}/{category or 'all'}: "
        f"R {result['recall']:.3f} Seq {result['sequence_accuracy']:.3f} "
        f"n={result['total']} acoustics={result['acoustics']}"
    )
    save_results([result], mode="full", category=category)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--chip", action="store_true",
                        help="also refresh c2c-direct-mixed rows (needs TPU)")
    args = parser.parse_args()

    if not args.chip:
        # CPU-only rows: the axon plugin hooks get_backend and ignores
        # JAX_PLATFORMS from the environment — config.update is the
        # reliable override (same as tests/conftest.py, tracker_oracle).
        import jax

        jax.config.update("jax_platforms", "cpu")

    dropped = prune_stale()
    print(f"pruned {dropped} stale rows")

    run_and_save("oracle", "v1")
    run_and_save("oracle-hard", "v1", "short")
    run_and_save("fastconformer-quran-lm-fusion", "v1", "short")

    if args.chip:
        run_and_save("c2c-direct-mixed", "v1")
        run_and_save("c2c-direct-mixed", "v2")
        run_and_save("c2c-direct-mixed", "v3")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
