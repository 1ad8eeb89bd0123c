"""Tracker-oracle window transcriber: alignment → window-cropped decodes.

The oracle harness (tilawa_tpu/eval/tracker_oracle.py) replaces the
acoustic model with forced-alignment token spans; these tests pin the
window→token mapping and the garble edge-cut behavior on synthetic
alignments (reference analogue: the mocked-transcribe fixtures in
web/frontend/test/tracker-deferred.test.ts and
tests/test_streaming_pipeline.py:36-60).
"""

import numpy as np
import pytest

from tilawa_tpu.data.assets import BLANK_ID, VOCAB_TOKENS
from tilawa_tpu.data.tokenizer import SentencePieceBPE
from tilawa_tpu.eval.tracker_oracle import OracleWindowTranscriber
from tilawa_tpu.pipeline.runtime import OracleRuntime


@pytest.fixture(scope="module")
def tokenizer():
    return SentencePieceBPE.load_default()


def make_transcriber(tokenizer, cut_mode="drop", noise=0.0):
    # Three tokens at 1 s, 2 s, 3 s (16 kHz), each 0.2 s long.
    token_ids = np.array([10, 20, 30], np.int32)
    starts = np.array([16000, 32000, 48000], np.int64)
    ends = starts + 3200
    renderer = OracleRuntime(
        lambda *a: [], blank_id=BLANK_ID, vocab_size=VOCAB_TOKENS,
        noise=noise, seed=0,
    )
    return OracleWindowTranscriber(
        token_ids, starts, ends, tokenizer, renderer,
        cut_mode=cut_mode, rng=np.random.default_rng(0),
    )


def test_window_contains_only_fully_inside_tokens(tokenizer):
    tr = make_transcriber(tokenizer)
    tr.on_chunk(40000)  # window covers [0, 40000): tokens 1 and 2 inside
    res = tr(np.zeros(40000, np.float32))
    assert res.token_ids == [10, 20]
    # log-probs are paced CTC frames covering the ids
    assert res.log_probs.shape[1] == VOCAB_TOKENS
    assert res.t_valid >= 2 * 3  # >= frames_per_token per id


def test_window_start_cuts_earlier_tokens(tokenizer):
    tr = make_transcriber(tokenizer)
    tr.on_chunk(60000)
    # Short rolling window [30000, 60000): only tokens 2 and 3 fit fully.
    res = tr(np.zeros(30000, np.float32))
    assert res.token_ids == [20, 30]


def test_drop_mode_omits_edge_cut_token(tokenizer):
    tr = make_transcriber(tokenizer)
    tr.on_chunk(33000)  # cuts through token 2 ([32000, 35200))
    res = tr(np.zeros(33000, np.float32))
    assert res.token_ids == [10]


def test_garble_mode_substitutes_edge_cut_token(tokenizer):
    tr = make_transcriber(tokenizer, cut_mode="garble")
    tr.on_chunk(33000)
    res = tr(np.zeros(33000, np.float32))
    assert len(res.token_ids) == 2  # token 1 + one garbled id at the edge
    assert res.token_ids[0] == 10
    assert res.token_ids[1] != 20 or True  # random id, just must exist


def test_empty_window_yields_empty_result(tokenizer):
    tr = make_transcriber(tokenizer)
    tr.on_chunk(8000)  # before any token
    res = tr(np.zeros(8000, np.float32))
    assert res.token_ids == []
    assert res.text == ""
