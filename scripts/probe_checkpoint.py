#!/usr/bin/env python
"""Quick decode-quality probe of a training checkpoint: full-clip and
prefix-window decodes on a few v1 clips + greedy token WER vs expected
verse text. Used to pick the EARLIEST stage-A checkpoint whose decodes
are established (the stage-B crop continuation wants a non-memorized
init; EXPERIMENTS.md round-4 campaign).

Usage: python scripts/probe_checkpoint.py checkpoints/scratch-a/step_004000 [n_clips]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tilawa_tpu.data.audio import load_audio
from tilawa_tpu.data.normalizer import normalize_arabic
from tilawa_tpu.eval.runner import load_manifest
from tilawa_tpu.pipeline.predict import Recognizer
from tilawa_tpu.pipeline.runtime import EncoderRuntime
from tilawa_tpu.text.levenshtein import ratio
from tilawa_tpu.train.checkpoint import load_variables


def main() -> int:
    ckpt = sys.argv[1]
    n_clips = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    config, variables = load_variables(ckpt)
    rec = Recognizer(EncoderRuntime(config, variables))
    samples, cdir = load_manifest("v1")
    from tilawa_tpu.data.quran import QuranDB

    db = QuranDB()
    done = 0
    full_r = []
    pref_r = []
    for s in samples:
        path = cdir / s["file"]
        if not path.exists() or done >= n_clips:
            continue
        try:
            audio = load_audio(path)
        except Exception:  # noqa: BLE001
            continue
        v = db.get_verse(s["surah"], s["ayah"])
        want = normalize_arabic(v["text_clean"]) if v else ""
        full = rec.transcribe_audio(audio)
        pref = rec.transcribe_audio(audio[: int(len(audio) * 0.6)])
        rf = ratio(full, want) if want else 0.0
        rp = ratio(pref, want[: max(1, int(len(want) * 0.6))]) if want else 0.0
        full_r.append(rf)
        pref_r.append(rp)
        print(f"{s['id']:24s} full_ratio={rf:.2f} prefix_ratio={rp:.2f} "
              f"decode[:40]={full[:40]!r}")
        done += 1
    if full_r:
        print(f"== {ckpt}: mean full {np.mean(full_r):.3f} "
              f"prefix {np.mean(pref_r):.3f} over {done} clips")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
