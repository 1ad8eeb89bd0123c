"""score_sequence cases (modeled on the reference's tests/test_scoring.py
intent: ordered-subsequence recall/precision/seq-acc)."""

from tilawa_tpu.eval.metrics import (
    exact_set_accuracy,
    predict_to_emissions,
    score_sequence,
)


def v(s, a):
    return {"surah": s, "ayah": a}


def test_perfect_match():
    out = score_sequence([v(1, 1), v(1, 2)], [v(1, 1), v(1, 2)])
    assert out == {"recall": 1.0, "precision": 1.0, "sequence_accuracy": 1.0}


def test_empty_expected_is_perfect():
    assert score_sequence([], [v(1, 1)])["sequence_accuracy"] == 1.0


def test_empty_predicted_is_zero():
    assert score_sequence([v(1, 1)], []) == {
        "recall": 0.0, "precision": 0.0, "sequence_accuracy": 0.0
    }


def test_partial_recall():
    out = score_sequence([v(1, 1), v(1, 2), v(1, 3)], [v(1, 1), v(1, 3)])
    assert out["recall"] == 2 / 3
    assert out["precision"] == 1.0
    assert out["sequence_accuracy"] == 0.0


def test_extra_predictions_hit_precision():
    out = score_sequence([v(1, 1)], [v(2, 5), v(1, 1), v(3, 3)])
    assert out["recall"] == 1.0
    assert out["precision"] == 1 / 3
    assert out["sequence_accuracy"] == 0.0


def test_order_matters_for_recall():
    # expected order 1,2 — predicted 2,1: only one can match in order
    out = score_sequence([v(1, 1), v(1, 2)], [v(1, 2), v(1, 1)])
    assert out["recall"] == 0.5
    assert out["sequence_accuracy"] == 0.0


def test_duplicate_predictions():
    out = score_sequence([v(1, 1)], [v(1, 1), v(1, 1)])
    assert out["recall"] == 1.0
    assert out["precision"] == 0.5


def test_exact_set_accuracy():
    assert exact_set_accuracy([v(1, 1), v(1, 2)], [v(1, 2), v(1, 1)]) == 1.0
    assert exact_set_accuracy([v(1, 1)], [v(1, 2)]) == 0.0


def test_predict_to_emissions_span_expansion():
    out = predict_to_emissions({"surah": 2, "ayah": 5, "ayah_end": 7, "score": 0.9})
    assert [(e["surah"], e["ayah"]) for e in out] == [(2, 5), (2, 6), (2, 7)]


def test_predict_to_emissions_empty():
    assert predict_to_emissions({"surah": 0, "ayah": 0}) == []
    assert predict_to_emissions({}) == []


def test_predict_to_emissions_single():
    out = predict_to_emissions({"surah": 112, "ayah": 1, "ayah_end": None, "score": 1.0})
    assert out == [{"surah": 112, "ayah": 1, "score": 1.0}]
