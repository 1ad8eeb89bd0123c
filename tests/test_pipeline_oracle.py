"""End-to-end champion pipeline over the oracle acoustic backend:
decode → candidate build → confidence gate → batched CTC rerank."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def oracle_exp():
    from tilawa_tpu.eval.experiments import OracleExperiment

    return OracleExperiment(error_rate=0.0, noise=0.3)


def _predict_refs(exp, refs):
    lp, t = exp.runtime.render(refs)
    return exp.recognizer._predict_from_logprobs(lp, t)


def test_single_verse(oracle_exp):
    out = _predict_refs(oracle_exp, [(112, 1, None)])
    assert (out["surah"], out["ayah"]) == (112, 1)
    assert out["ayah_end"] == 1


def test_clean_transcript_uses_text_gate(oracle_exp):
    out = _predict_refs(oracle_exp, [(1, 2, None)])
    assert (out["surah"], out["ayah"]) == (1, 2)
    # clean emission → text score above the 0.80 gate → rerank skipped
    assert out["source"] == "text"


def test_multi_verse_span(oracle_exp):
    out = _predict_refs(oracle_exp, [(112, 2, None), (112, 3, None)])
    assert out["surah"] == 112
    assert out["ayah"] == 2
    assert out["ayah_end"] == 3


def test_noisy_transcript_falls_back_to_rerank():
    from tilawa_tpu.eval.experiments import OracleExperiment

    exp = OracleExperiment(error_rate=0.12, noise=1.0, seed=42)
    out = _predict_refs(exp, [(36, 1, None), (36, 2, None)])
    assert out["surah"] == 36
    assert out["ayah"] == 1


def test_transcribe_roundtrip(oracle_exp):
    lp, t = oracle_exp.runtime.render([(112, 1, None)])
    text = oracle_exp.recognizer.greedy_decode(lp, t)
    assert "قل هو الله احد" in text
