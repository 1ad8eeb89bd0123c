"""CTC forced alignment (train/align.py) + int4 dequantize round trip."""

import numpy as np

from tilawa_tpu.train.align import viterbi_align
import pytest

pytestmark = pytest.mark.slow



def _logprobs_from_path(path, vocab, peak=0.0, floor=-20.0):
    """[T, V] log-probs that strongly prefer `path` frame-by-frame."""
    t = len(path)
    lp = np.full((t, vocab), floor, np.float32)
    lp[np.arange(t), path] = peak
    return lp


class TestViterbiAlign:
    BLANK = 0

    def test_simple_two_tokens(self):
        # frames: b b 5 5 b 7 b
        path = [0, 0, 5, 5, 0, 7, 0]
        lp = _logprobs_from_path(path, vocab=10)
        spans = viterbi_align(lp, [5, 7], self.BLANK)
        assert spans is not None
        assert spans[0].tolist() == [2, 4]
        assert spans[1].tolist() == [5, 6]

    def test_repeated_token_needs_blank(self):
        # 3 3 b 3 3 → tokens [3, 3]: the blank splits the two emissions
        path = [3, 3, 0, 3, 3]
        lp = _logprobs_from_path(path, vocab=5)
        spans = viterbi_align(lp, [3, 3], self.BLANK)
        assert spans is not None
        assert spans[0].tolist() == [0, 2]
        assert spans[1].tolist() == [3, 5]

    def test_infeasible_returns_none(self):
        lp = _logprobs_from_path([0, 1], vocab=5)
        assert viterbi_align(lp, [1, 2, 3], self.BLANK) is None

    def test_empty_tokens(self):
        lp = _logprobs_from_path([0, 0], vocab=5)
        spans = viterbi_align(lp, [], self.BLANK)
        assert spans is not None and spans.shape == (0, 2)

    def test_noisy_logprobs_recover_spans(self):
        rng = np.random.default_rng(0)
        path = [0, 0, 2, 2, 2, 0, 0, 4, 4, 0, 2, 0]
        lp = _logprobs_from_path(path, vocab=6) + rng.normal(
            scale=0.5, size=(len(path), 6)
        ).astype(np.float32)
        spans = viterbi_align(lp, [2, 4, 2], self.BLANK)
        assert spans is not None
        # token order and non-overlap
        assert spans[0][1] <= spans[1][0] <= spans[1][1] <= spans[2][0]
        # first token covers the 2-run
        assert spans[0][0] in (2, 3) and spans[0][1] in (4, 5)


class TestDequantizeRoundTrip:
    def test_params_round_trip(self):
        from tilawa_tpu.train.quantize import dequantize_params, quantize_params

        rng = np.random.default_rng(1)
        params = {
            "lin1": {"kernel": rng.normal(size=(64, 32)).astype(np.float32),
                     "bias": np.zeros(32, np.float32)},
            "conv": {"kernel": rng.normal(size=(3, 8, 8)).astype(np.float32)},
        }
        q = quantize_params(params)
        assert "packed" in q["lin1"] and "kernel" in q["conv"]
        d = dequantize_params(q)
        assert d["lin1"]["kernel"].shape == (64, 32)
        # int4 is lossy but bounded: max |err| <= scale/2 per block
        err = np.abs(np.asarray(d["lin1"]["kernel"]) - params["lin1"]["kernel"])
        assert err.max() < np.abs(params["lin1"]["kernel"]).max() / 7
        np.testing.assert_array_equal(
            np.asarray(d["conv"]["kernel"]), params["conv"]["kernel"]
        )

    def test_scan_stacked_round_trip(self):
        from tilawa_tpu.train.quantize import dequantize_params, quantize_params

        rng = np.random.default_rng(2)
        params = {"q": {"kernel": rng.normal(size=(4, 64, 32)).astype(np.float32)}}
        d = dequantize_params(quantize_params(params))
        assert d["q"]["kernel"].shape == (4, 64, 32)
