#!/usr/bin/env python
"""Measured MFU / dispatch-overhead profile for the batched forward.

VERDICT r3 task 7: demonstrate the TPU doing dense work with a measured
(not analytic-only) profile — or prove the residual is tunnel round-trip
that no code change can remove. Method:

  1. warm a [B, N] forward program;
  2. SEQUENTIAL: run K dispatches, each synchronized — per-dispatch wall
     includes one full host->device->host round trip;
  3. PIPELINED: queue K dispatches asynchronously, sync once — the round
     trip amortizes across the queue, so per-dispatch wall approaches the
     device's pure compute time;
  4. compare with the analytic FLOPs bound (models/fastconformer.py
     forward_flops) at the v5e bf16 peak.

sequential-minus-pipelined is the per-dispatch overhead (tunnel RTT +
host sync), and pipelined-vs-analytic is the honest device MFU.

Writes benchmark/results/mfu_profile.json and prints a table.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

V5E_BF16_PEAK_FLOPS = 197e12


def main() -> int:
    from tilawa_tpu.models.fastconformer import forward_flops
    from tilawa_tpu.pipeline.runtime import EncoderRuntime
    from tilawa_tpu.train.checkpoint import load_variables, shipped_checkpoint

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 256000
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    ckpt = shipped_checkpoint()
    config, variables = load_variables(ckpt)
    rt = EncoderRuntime(config, variables)
    rng = np.random.default_rng(0)
    waves = [
        (0.05 * rng.standard_normal(N)).astype(np.float32) for _ in range(B)
    ]

    # warm
    rt.forward_batch(waves)
    rt.forward_batch(waves)

    # sequential: sync every dispatch
    seq = []
    for _ in range(K):
        t = time.perf_counter()
        _lp, _lens, _ids = rt.forward_batch(waves)
        seq.append(time.perf_counter() - t)

    # pipelined: queue all, sync last
    t0 = time.perf_counter()
    inflight = [rt.forward_batch_async(waves) for _ in range(K)]
    np.asarray(inflight[-1][1])
    pipelined_total = time.perf_counter() - t0
    for _lp, p in inflight:
        np.asarray(p)

    seq_med = sorted(seq)[len(seq) // 2]
    pipe_per = pipelined_total / K
    flops = B * forward_flops(config, N / 16000.0)
    compute_bound_s = flops / V5E_BF16_PEAK_FLOPS
    out = {
        "batch": B,
        "samples": N,
        "dispatches": K,
        "sequential_ms_per_dispatch_p50": round(seq_med * 1e3, 1),
        "pipelined_ms_per_dispatch": round(pipe_per * 1e3, 1),
        "dispatch_overhead_ms": round((seq_med - pipe_per) * 1e3, 1),
        "analytic_flops_per_dispatch": flops,
        "compute_bound_ms": round(compute_bound_s * 1e3, 2),
        "mfu_sequential": round(compute_bound_s / seq_med, 5),
        "mfu_pipelined": round(compute_bound_s / pipe_per, 5),
        "audio_sec_per_sec_pipelined": round(B * (N / 16000.0) / pipe_per, 1),
    }
    Path("benchmark/results/mfu_profile.json").write_text(
        json.dumps(out, indent=2)
    )
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
