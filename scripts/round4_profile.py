#!/usr/bin/env python
"""Round-4 champion v1 profile row (TILAWA_PROFILE stage table)."""
import json, os, sys, time
from pathlib import Path
REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ["TILAWA_PROFILE"] = "1"
from tilawa_tpu.eval.runner import load_manifest, run_experiment
from tilawa_tpu.eval.experiments import get_experiment

exp = get_experiment("c2c-direct-mixed-tta")
samples, corpus_dir = load_manifest("v1")
result = run_experiment("c2c-direct-mixed-tta", exp, samples, corpus_dir)
stages: dict[str, float] = {}
for row in result["per_sample"]:
    for k, v in row.get("profile", {}).items():
        stages[k] = stages.get(k, 0.0) + v
n = max(len(result["per_sample"]), 1)
print("seq_acc", result["sequence_accuracy"], "p50", result["p50_latency"])
print("stage means:", {k: round(v / n, 4) for k, v in sorted(stages.items())})
out = REPO / "benchmark" / "results" / "round4_champion_v1_profile.json"
out.write_text(json.dumps(result, ensure_ascii=False, indent=1))
print("saved", out)
