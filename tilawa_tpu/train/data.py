"""Training data: the v1 corpus as a CTC dataset (audio, token targets).

The reference's data pipeline builds NeMo manifests from Iqra/TTS/RetaSy/
TLOG sources (reference: scripts/train_fastconformer_phoneme_modal.py
prepare_data:330-816) — those sources need network access. In this
environment the decodable corpus audio + quran.json transcripts form an
overfit-scale dataset that exercises the identical loop mechanics
(variable-length batching, padded CTC loss, checkpointing).
"""

from __future__ import annotations

import itertools
from pathlib import Path

import numpy as np

from tilawa_tpu.data.audio import UnsupportedAudioFormat, load_audio
from tilawa_tpu.data.token_store import TokenStore


def load_corpus_examples(
    corpus: str = "v1", max_audio_s: float = 20.0
) -> list[tuple[np.ndarray, list[int]]]:
    """(waveform, target token ids) pairs for every decodable corpus clip."""
    from tilawa_tpu.eval.runner import load_manifest

    store = TokenStore.load_default()
    samples, corpus_dir = load_manifest(corpus)
    out = []
    for s in samples:
        path = corpus_dir / s["file"]
        if not path.exists():
            continue
        try:
            audio = load_audio(path)
        except UnsupportedAudioFormat:
            continue
        if len(audio) > max_audio_s * 16000:
            continue
        ids: list[int] = []
        for e in s.get(
            "expected_verses", [{"surah": s["surah"], "ayah": s["ayah"]}]
        ):
            ids.extend(store.ids_for_key(e["surah"], e["ayah"]) or [])
        if ids:
            out.append((audio, ids))
    return out


def pad_batch(examples, audio_pad: int, token_pad: int):
    b = len(examples)
    audio = np.zeros((b, audio_pad), dtype=np.float32)
    audio_lens = np.zeros(b, dtype=np.int32)
    tokens = np.zeros((b, token_pad), dtype=np.int32)
    token_lens = np.zeros(b, dtype=np.int32)
    for i, (a, ids) in enumerate(examples):
        a = a[:audio_pad]
        ids = ids[:token_pad]
        audio[i, : len(a)] = a
        audio_lens[i] = len(a)
        tokens[i, : len(ids)] = ids
        token_lens[i] = len(ids)
    return audio, audio_lens, tokens, token_lens


def corpus_batches(
    batch_size: int = 8,
    corpus: str = "v1",
    seed: int = 0,
    max_audio_s: float = 20.0,
):
    """Infinite iterator of fixed-shape padded batches (one XLA program)."""
    examples = load_corpus_examples(corpus, max_audio_s=max_audio_s)
    if not examples:
        raise RuntimeError("no decodable training examples found")
    audio_pad = int(max_audio_s * 16000)
    token_pad = max(len(ids) for _a, ids in examples)
    token_pad = int(np.ceil(token_pad / 32) * 32)
    rng = np.random.default_rng(seed)
    idx = np.arange(len(examples))
    while True:
        rng.shuffle(idx)
        for chunk_start in range(0, len(idx) - batch_size + 1, batch_size):
            chunk = [examples[i] for i in idx[chunk_start : chunk_start + batch_size]]
            yield pad_batch(chunk, audio_pad, token_pad)


def synthetic_batches(
    batch_size: int = 4,
    n_samples: int = 16000,
    vocab: int = 1024,
    token_len: int = 12,
    seed: int = 0,
):
    """Deterministic synthetic batches for unit/dryrun use (no assets)."""
    rng = np.random.default_rng(seed)
    while True:
        audio = rng.normal(scale=0.1, size=(batch_size, n_samples)).astype(np.float32)
        audio_lens = np.full(batch_size, n_samples, dtype=np.int32)
        tokens = rng.integers(0, vocab, size=(batch_size, token_len)).astype(np.int32)
        token_lens = np.full(batch_size, token_len, dtype=np.int32)
        yield audio, audio_lens, tokens, token_lens
