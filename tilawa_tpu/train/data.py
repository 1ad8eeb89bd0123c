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
    corpus: str = "v1", max_audio_s: float = 20.0,
    only_ids: set[str] | None = None,
) -> list[tuple[np.ndarray, list[int]]]:
    """(waveform, target token ids) pairs for every decodable corpus clip.
    only_ids restricts to specific sample ids (hard-example continuation
    driven by tilawa_tpu.train.fit_report)."""
    from tilawa_tpu.eval.runner import load_manifest

    store = TokenStore.load_default()
    samples, corpus_dir = load_manifest(corpus)
    out = []
    for s in samples:
        if only_ids is not None and s["id"] not in only_ids:
            continue
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


# (bucket seconds, batch size): roughly constant audio-samples per step so
# every bucket's XLA program has a similar cost; 7 compiled train-step
# shapes total (length-bucketed padding per SURVEY.md §7 Phase 2).
BUCKETS: list[tuple[float, int]] = [
    (8.0, 16), (12.0, 12), (16.0, 8), (24.0, 6), (32.0, 4), (48.0, 3), (64.0, 2),
    (96.0, 1), (160.0, 1),
]


def _augment(audio: np.ndarray, rng: np.random.Generator, pad: int) -> np.ndarray:
    """Speed perturb (0.9x-1.1x), gain, light noise — the reference trains
    with NeMo speed perturbation and tests with 0.9/1.0/1.1 TTA
    (reference: experiments/c2c-direct-mixed-tta/run.py:60-71)."""
    from tilawa_tpu.data.audio import speed_perturb

    if rng.random() < 0.5:
        factor = float(rng.uniform(0.9, 1.1))
        if len(audio) * factor < pad:
            audio = speed_perturb(audio, factor)
    gain = float(rng.uniform(0.7, 1.3))
    audio = audio * gain
    if rng.random() < 0.3:
        rms = float(np.sqrt((audio**2).mean()) + 1e-8)
        audio = audio + rng.normal(
            scale=0.02 * rms, size=audio.shape
        ).astype(np.float32)
    return np.clip(audio, -1.0, 1.0).astype(np.float32)


def bucketed_corpus_batches(
    corpora: tuple[str, ...] = ("v1", "v2", "v3"),
    seed: int = 0,
    augment: bool = True,
    buckets: list[tuple[float, int]] | None = None,
    weighting: str = "prop",
    only_ids: set[str] | None = None,
    rehearsal: float = 0.25,
):
    """Infinite iterator over length-bucketed batches from several corpora.

    Each bucket is one fixed (audio_pad, token_pad, batch) shape — a handful
    of XLA programs instead of one worst-case pad. Bucket sampling:
    weighting="prop" ∝ example count, "sqrt" ∝ sqrt(count) (oversamples the
    sparse long-audio buckets), "uniform" equal per bucket.

    only_ids focuses training on hard examples; `rehearsal` then mixes in
    that fraction of the full corpus anyway (anti-forgetting: a pure
    hard-only continuation measurably regressed the rest of the corpus).
    """
    buckets = buckets or BUCKETS
    examples: list[tuple[np.ndarray, list[int]]] = []
    for corpus in corpora:
        examples.extend(
            load_corpus_examples(
                corpus, max_audio_s=buckets[-1][0], only_ids=only_ids
            )
        )
    if not examples:
        raise RuntimeError("no decodable training examples found")
    if only_ids is not None and rehearsal > 0:
        rng0 = np.random.default_rng(seed + 7)
        rest: list[tuple[np.ndarray, list[int]]] = []
        for corpus in corpora:
            rest.extend(
                load_corpus_examples(corpus, max_audio_s=buckets[-1][0])
            )
        n_mix = int(len(rest) * rehearsal)
        if n_mix:
            picks = rng0.choice(len(rest), size=n_mix, replace=False)
            examples.extend(rest[int(i)] for i in picks)

    by_bucket: list[list[tuple[np.ndarray, list[int]]]] = [[] for _ in buckets]
    for a, ids in examples:
        for bi, (sec, _bs) in enumerate(buckets):
            if len(a) <= sec * 16000:
                by_bucket[bi].append((a, ids))
                break
    live = [bi for bi, ex in enumerate(by_bucket) if ex]
    token_pads = []
    for bi, ex in enumerate(by_bucket):
        tp = max((len(ids) for _a, ids in ex), default=8)
        token_pads.append(int(np.ceil(tp / 16) * 16))
    weights = np.array([len(by_bucket[bi]) for bi in live], dtype=np.float64)
    if weighting == "sqrt":
        weights = np.sqrt(weights)
    elif weighting == "uniform":
        weights = np.ones_like(weights)
    weights /= weights.sum()

    rng = np.random.default_rng(seed)
    while True:
        bi = int(rng.choice(live, p=weights))
        sec, bs = buckets[bi]
        pad = int(sec * 16000)
        pool = by_bucket[bi]
        picks = rng.choice(len(pool), size=min(bs, len(pool)), replace=len(pool) < bs)
        chunk = []
        for i in picks:
            a, ids = pool[int(i)]
            if augment:
                a = _augment(a, rng, pad)
            chunk.append((a, ids))
        while len(chunk) < bs:  # fixed batch dim per bucket
            chunk.append(chunk[len(chunk) % max(1, len(picks))])
        yield pad_batch(chunk, pad, token_pads[bi])


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
