"""StreamingPipeline tests with mock transcribe functions (the reference's
model-free fake-backend pattern: tests/test_streaming_pipeline.py:36-60)."""

import numpy as np
import pytest

from tilawa_tpu.data.audio import save_wav
from tilawa_tpu.streaming.pipeline import StreamingPipeline


@pytest.fixture(scope="module")
def pipeline():
    from tilawa_tpu.data.quran import QuranDB

    return StreamingPipeline(QuranDB())


def test_run_on_text_snapshots(pipeline):
    chunks = [
        "قل هو الله",
        "قل هو الله احد",
        "قل هو الله احد الله الصمد",
    ]
    out = pipeline.run_on_text(chunks)
    refs = [(e["surah"], e["ayah"]) for e in out]
    assert (112, 1) in refs


def test_run_on_full_transcript_multi_verse(pipeline, tmp_path):
    wav = tmp_path / "x.wav"
    save_wav(wav, np.zeros(16000, dtype=np.float32))
    transcript = "انا اعطيناك الكوثر فصل لربك وانحر ان شانئك هو الابتر"
    out = pipeline.run_on_full_transcript(str(wav), lambda path: transcript)
    refs = [(e["surah"], e["ayah"]) for e in out]
    assert refs == [(108, 1), (108, 2), (108, 3)]


def test_run_on_full_transcript_empty(pipeline, tmp_path):
    wav = tmp_path / "x.wav"
    save_wav(wav, np.zeros(16000, dtype=np.float32))
    assert pipeline.run_on_full_transcript(str(wav), lambda path: "") == []


def test_chunked_with_confidence_gating(pipeline, tmp_path):
    """dict returns with low avg_logprob are gated out."""
    wav = tmp_path / "y.wav"
    save_wav(wav, np.zeros(16000 * 9, dtype=np.float32))

    texts = iter(
        [
            {"text": "قل هو الله احد", "avg_logprob": -0.2},
            {"text": "مزيج عشوائي غامض", "avg_logprob": -3.0},  # gated
            {"text": "الله الصمد", "avg_logprob": -0.1},
        ]
    )

    def fake_transcribe(path):
        try:
            return next(texts)
        except StopIteration:
            return {"text": "", "avg_logprob": -9.0}

    out = pipeline.run_on_audio_chunked(str(wav), fake_transcribe, chunk_seconds=3.0)
    refs = [(e["surah"], e["ayah"]) for e in out]
    assert (112, 1) in refs
    # the gated chunk must not have produced junk emissions
    assert all(r[0] == 112 for r in refs)


def test_chunked_plain_str_backend(pipeline, tmp_path):
    wav = tmp_path / "z.wav"
    save_wav(wav, np.zeros(16000 * 6, dtype=np.float32))
    texts = iter(["قل هو الله احد", "الله الصمد"])

    def fake(path):
        try:
            return next(texts)
        except StopIteration:
            return ""

    out = pipeline.run_on_audio_chunked(str(wav), fake, chunk_seconds=3.0)
    refs = [(e["surah"], e["ayah"]) for e in out]
    assert (112, 1) in refs


def test_chunked_short_audio_skipped(pipeline, tmp_path):
    wav = tmp_path / "s.wav"
    save_wav(wav, np.zeros(4000, dtype=np.float32))  # < MIN_CHUNK_SAMPLES
    out = pipeline.run_on_audio_chunked(str(wav), lambda p: "قل هو الله احد")
    assert out == []
