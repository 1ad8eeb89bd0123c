#!/usr/bin/env python
"""Pick the best phoneme checkpoint: phoneme-string similarity + verse
retrieval hit-rate over a few v1 clips per checkpoint."""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tilawa_tpu.data.audio import load_audio
from tilawa_tpu.data.phonemes import PhonemeStore
from tilawa_tpu.eval.runner import load_manifest
from tilawa_tpu.pipeline.phoneme import PhonemePipeline
from tilawa_tpu.pipeline.runtime import EncoderRuntime
from tilawa_tpu.text.levenshtein import ratio
from tilawa_tpu.train.checkpoint import load_variables

store = PhonemeStore.load_default()
samples, cdir = load_manifest("v1")
clips = []
for s in samples:
    p = cdir / s["file"]
    exp = s.get("expected_verses") or [{"surah": s["surah"], "ayah": s["ayah"]}]
    if p.exists() and s.get("category") in ("short", "medium") and len(exp) == 1:
        try:
            clips.append((s, load_audio(p)))
        except Exception:
            pass
    if len(clips) >= 8:
        break

for ck in sorted(Path("checkpoints/phoneme").glob("step_*")):
    config, variables = load_variables(ck)
    pipe = PhonemePipeline(EncoderRuntime(config, variables), store=store)
    sims, hits = [], 0
    for s, audio in clips:
        pred = pipe.transcribe_phonemes_audio(audio)
        want = store.reference_phonemes(s["surah"], s["ayah"]) or ""
        sims.append(ratio(pred, want))
        m = store.match_verse(pred, top_k=1)
        if m and (m[0]["surah"], m[0]["ayah"]) == (s["surah"], s["ayah"]):
            hits += 1
    print(f"{ck.name}: mean phoneme ratio {np.mean(sims):.3f} "
          f"retrieval {hits}/{len(clips)}  sample={pred[:50]!r}")
