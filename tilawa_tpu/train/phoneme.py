"""Phoneme-head fine-tune: champion encoder + fresh 69-token CTC head.

The reference's browser-shipped model was exactly this: the Arabic-text
FastConformer with its CTC head swapped to a 69-token Buckwalter phoneme
vocabulary and fine-tuned on phoneme targets (reference:
experiments/fastconformer-phoneme/run.py:42-55; training:
scripts/train_fastconformer_phoneme_modal.py _PhonemeTokenizer injection,
lines 940-982). Here: dequantize the champion export, re-initialize
`ctc_head` for vocab 69 (+ blank 69), and continue CTC training against
PhonemeStore targets built from quran_phonemes.json.

Usage:
  python -m tilawa_tpu.train.phoneme --steps 3000 \
      --checkpoint-dir checkpoints/phoneme
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tilawa_tpu.data.phonemes import PhonemeStore
from tilawa_tpu.train.data import BUCKETS, pad_batch


def phoneme_corpus_batches(
    corpora: tuple[str, ...] = ("v1", "v2", "v3"),
    seed: int = 0,
    augment: bool = True,
    weighting: str = "sqrt",
    aug_strength: str = "base",
):
    """Length-bucketed batches of (audio, phoneme-id targets)."""
    from tilawa_tpu.data.audio import UnsupportedAudioFormat, load_audio
    from tilawa_tpu.eval.runner import load_manifest
    from tilawa_tpu.train.data import _augment

    store = PhonemeStore.load_default()
    examples: list[tuple[np.ndarray, list[int]]] = []
    for corpus in corpora:
        try:
            samples, corpus_dir = load_manifest(corpus)
        except FileNotFoundError:
            continue
        for s in samples:
            path = corpus_dir / s["file"]
            if not path.exists():
                continue
            try:
                audio = load_audio(path)
            except UnsupportedAudioFormat:
                continue
            if len(audio) > BUCKETS[-1][0] * 16000:
                continue
            ids: list[int] = []
            for e in s.get(
                "expected_verses", [{"surah": s["surah"], "ayah": s["ayah"]}]
            ):
                verse_ids = store.verse_ids(e["surah"], e["ayah"])
                if verse_ids:
                    if ids:
                        ids.append(store.encode_phonemes("|")[0])
                    ids.extend(verse_ids)
            if ids:
                examples.append((audio, ids))
    if not examples:
        raise RuntimeError("no phoneme training examples found")

    by_bucket: list[list[tuple[np.ndarray, list[int]]]] = [[] for _ in BUCKETS]
    for a, ids in examples:
        for bi, (sec, _bs) in enumerate(BUCKETS):
            if len(a) <= sec * 16000:
                by_bucket[bi].append((a, ids))
                break
    live = [bi for bi, ex in enumerate(by_bucket) if ex]
    token_pads = [
        int(np.ceil(max((len(i) for _a, i in ex), default=8) / 16) * 16)
        for ex in by_bucket
    ]
    weights = np.array([len(by_bucket[bi]) for bi in live], dtype=np.float64)
    if weighting == "sqrt":
        weights = np.sqrt(weights)
    elif weighting == "uniform":
        weights = np.ones_like(weights)
    weights /= weights.sum()

    rng = np.random.default_rng(seed)
    while True:
        bi = int(rng.choice(live, p=weights))
        sec, bs = BUCKETS[bi]
        pad = int(sec * 16000)
        pool = by_bucket[bi]
        picks = rng.choice(len(pool), size=min(bs, len(pool)), replace=len(pool) < bs)
        chunk = []
        for i in picks:
            a, ids = pool[int(i)]
            if augment:
                a = _augment(a, rng, pad, strength=aug_strength)
            chunk.append((a, ids))
        while len(chunk) < bs:
            chunk.append(chunk[len(chunk) % max(1, len(picks))])
        yield pad_batch(chunk, pad, token_pads[bi])


def swap_head_for_phonemes(config, variables, num_classes: int, seed: int = 0):
    """Replace the trained text CTC head with a fresh phoneme head."""
    d = config.d_model
    rng = jax.random.PRNGKey(seed)
    params = dict(variables["params"])
    init = jax.nn.initializers.lecun_normal()
    params["ctc_head"] = {
        "kernel": np.asarray(init(rng, (d, num_classes), jnp.float32)),
        "bias": np.zeros(num_classes, np.float32),
    }
    new_vars = dict(variables)
    new_vars["params"] = params
    new_config = dataclasses.replace(config, vocab_size=num_classes - 1)
    return new_config, new_vars


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="phoneme-head finetune")
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--init", default="exports/champion-int4")
    parser.add_argument("--corpora", default="v1,v2,v3")
    parser.add_argument("--checkpoint-dir", default="checkpoints/phoneme")
    parser.add_argument("--checkpoint-every", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--aug-strength", default="base",
                        choices=["base", "strong"])
    args = parser.parse_args(argv)

    from tilawa_tpu.train.checkpoint import load_variables, save_variables
    from tilawa_tpu.train.quantize import dequantize_variables, dequantized_config
    from tilawa_tpu.train.train import train

    store = PhonemeStore.load_default()
    config, variables = load_variables(args.init)
    if config.quant:
        print(f"dequantizing {args.init} for continuation")
        variables = dequantize_variables(variables)
        config = dequantized_config(config)
    if config.vocab_size == store.num_classes - 1:  # head outputs vocab+blank
        # already a phoneme checkpoint (continuation training) — keep the
        # trained head instead of re-initializing it
        print(f"continuing phoneme training from {args.init}")
    else:
        config, variables = swap_head_for_phonemes(
            config, variables, store.num_classes, seed=args.seed
        )
        print(f"phoneme head: {store.num_classes} classes "
              f"(blank {store.blank_id})")
    from pathlib import Path

    init_dir = Path(args.checkpoint_dir) / "init"
    save_variables(init_dir, config, variables)

    batches = phoneme_corpus_batches(
        corpora=tuple(args.corpora.split(",")),
        seed=args.seed,
        aug_strength=args.aug_strength,
    )
    train(
        config,
        batches,
        steps=args.steps,
        lr=args.lr,
        seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        init_from=init_dir,
        freeze_bn=True,
        warmup_steps=max(100, args.steps // 10),
    )
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
