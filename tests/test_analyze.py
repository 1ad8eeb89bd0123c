"""Failure-taxonomy classifier (reference: analyze-v3-stability.ts:75-117)."""

from tilawa_tpu.eval.analyze import analyze_results, classify_run


def test_exact():
    assert classify_run(["1:1"], ["1:1"]) == "exact"
    assert classify_run(["1:1", "1:2"], ["1:1", "1:2"]) == "exact"


def test_no_emit():
    assert classify_run(["1:1"], []) == "no_emit"


def test_missing_only_single():
    # single expected verse, nothing extra but also nothing right -> missing
    assert classify_run(["1:1", "1:2"], ["1:1"]) == "partial_multi"


def test_partial_multi():
    assert classify_run(["2:1", "2:2", "2:3"], ["2:1", "2:3"]) == "partial_multi"


def test_wrong_initial():
    assert classify_run(["1:1"], ["5:5", "1:1"]) == "wrong_initial"


def test_extra_after_expected():
    assert classify_run(["1:1"], ["1:1", "1:2"]) == "extra_after_expected"


def test_extra_before_expected_interleaved():
    # expected seen but neither prefix nor clean subsequence from the start
    assert classify_run(["1:2"], ["1:2", "1:3"]) == "extra_after_expected"
    assert classify_run(["1:2", "1:3"], ["1:2", "9:9", "1:3"]) in (
        "extra_before_expected", "wrong_surah_jump", "extra_after_expected",
    )


def test_wrong_surah_jump():
    # full expected emitted, then a jump to an unrelated surah
    assert classify_run(["1:1", "1:2"], ["1:1", "1:2", "50:3"]) == "wrong_surah_jump"


def test_analyze_results_span_expansion():
    results = {
        "name": "exp",
        "per_sample": [
            {
                "id": "a",
                "expected": [{"surah": 1, "ayah": 1}, {"surah": 1, "ayah": 2}],
                "predicted": [{"surah": 1, "ayah": 1, "ayah_end": 2}],
            },
            {
                "id": "b",
                "expected": [{"surah": 112, "ayah": 1}],
                "predicted": [],
            },
        ],
    }
    rep = analyze_results(results)
    assert rep["counts"] == {"exact": 1, "no_emit": 1}
    assert rep["failures"][0]["id"] == "b"


def test_compare_results_classes():
    from tilawa_tpu.eval.compare import compare_results

    batch = {"per_sample": [
        {"id": "a", "expected": [{"surah": 1, "ayah": 1}],
         "predicted": [{"surah": 1, "ayah": 1}]},
        {"id": "b", "expected": [{"surah": 1, "ayah": 2}],
         "predicted": [{"surah": 1, "ayah": 2}]},
        {"id": "c", "expected": [{"surah": 2, "ayah": 5}],
         "predicted": [{"surah": 9, "ayah": 9}]},
        {"id": "d", "expected": [{"surah": 3, "ayah": 3}],
         "predicted": []},
    ]}
    streaming = {"per_sample": [
        {"id": "a", "expected": [{"surah": 1, "ayah": 1}],
         "predicted": [{"surah": 1, "ayah": 1}]},
        {"id": "b", "expected": [{"surah": 1, "ayah": 2}],
         "predicted": []},
        {"id": "c", "expected": [{"surah": 2, "ayah": 5}],
         "predicted": [{"surah": 8, "ayah": 8}]},
        {"id": "d", "expected": [{"surah": 3, "ayah": 3}],
         "predicted": [{"surah": 3, "ayah": 3}]},
    ]}
    rep = compare_results(batch, streaming)
    assert rep["counts"] == {
        "both_exact": 1, "streaming_loss": 1, "model_floor": 1,
        "streaming_rescue": 1,
    }
    assert rep["classes"]["streaming_loss"] == ["b"]
