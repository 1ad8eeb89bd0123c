"""Batched corpus eval: bucket-batched forwards + the batched TTA pass."""

import numpy as np

from tilawa_tpu.models.fastconformer import FastConformerConfig
from tilawa_tpu.pipeline.predict import Recognizer
from tilawa_tpu.pipeline.runtime import EncoderRuntime


def test_batched_eval_with_tta_runs():
    # Random-init small model: every clip is low-confidence, so the TTA
    # pass exercises the batched 0.9x/1.1x variant path end to end.
    rt = EncoderRuntime(FastConformerConfig.small())
    rec = Recognizer(rt, tta=True)
    rng = np.random.default_rng(0)
    audios = [
        (f"s{i}", (0.05 * rng.standard_normal(16000 * 2)).astype(np.float32),
         [{"surah": 1, "ayah": 1}])
        for i in range(3)
    ]
    from tilawa_tpu.eval.batched import batched_corpus_eval

    out = batched_corpus_eval(rec, audios, batch_size=2)
    assert out["n"] == 3
    assert out["n_tta"] == 3          # all low-confidence -> all re-run
    assert len(out["predictions"]) == 3
    for p in out["predictions"].values():
        assert "tta" in p             # every prediction went through the vote


def test_batched_eval_no_tta_flag():
    rt = EncoderRuntime(FastConformerConfig.small())
    rec = Recognizer(rt, tta=False)
    rng = np.random.default_rng(1)
    audios = [("a", (0.05 * rng.standard_normal(16000)).astype(np.float32),
               [{"surah": 1, "ayah": 1}])]
    from tilawa_tpu.eval.batched import batched_corpus_eval

    out = batched_corpus_eval(rec, audios, batch_size=2)
    assert out["n_tta"] == 0
