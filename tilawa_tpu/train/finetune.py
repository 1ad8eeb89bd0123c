"""Streaming-robustness continuation training from the int4 champion.

Warm-starts from the dequantized champion export (the only surviving
checkpoint form) and continues CTC training over a mixture of full clips
(rehearsal — keeps batch accuracy) and forced-alignment random-window
crops (random_window_crop — teaches the partial-window + in-length
silence shapes the streaming tracker actually feeds; see
tilawa_tpu/train/align.py for why).

Recipe notes (learned from a failed first attempt, checkpoints/stream1):
lr 1e-4 with live BatchNorm statistics collapsed full-clip accuracy to
53%/11% within 2000 steps — the crop/silence distribution drifts the BN
running stats inference depends on, and params co-adapt (splicing the
original stats back made it WORSE, 6%). Defaults here: frozen BN,
lr 3e-5, dropout 0.1 re-enabled (the champion trained at 0.0 and
memorizes full-utterance attention context — prefix decodes WER ~0.98 at
1-5 s, eval/context_sweep.py), crop_prob 0.35.

Usage:
  python -m tilawa_tpu.train.finetune --steps 2000 \
      --checkpoint-dir checkpoints/stream2
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="streaming finetune")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--lr", type=float, default=3e-5)
    parser.add_argument("--crop-prob", type=float, default=0.35)
    parser.add_argument("--dropout", type=float, default=0.1)
    parser.add_argument("--no-specaug", dest="specaug", action="store_false",
                        help="disable SpecAugment (default: on)")
    parser.add_argument(
        "--live-bn", action="store_true",
        help="update BatchNorm running stats (default: frozen; see module docstring)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--corpora", default="v1,v2,v3")
    parser.add_argument(
        "--aug-strength", default="base", choices=["base", "strong"],
        help="'strong' adds channel/speaker simulation (EQ tilt, synthetic "
             "reverb, soft clip, 10-30 dB SNR noise, wider resample) — the "
             "held-out generalization recipe",
    )
    parser.add_argument("--weighting", default="prop",
                        choices=["prop", "sqrt", "uniform"])
    parser.add_argument("--init", default="exports/champion-int4")
    parser.add_argument("--checkpoint-dir", default="checkpoints/stream2")
    parser.add_argument("--checkpoint-every", type=int, default=250)
    args = parser.parse_args(argv)

    from tilawa_tpu.train.checkpoint import load_variables, save_variables
    from tilawa_tpu.train.data import bucketed_corpus_batches
    from tilawa_tpu.train.quantize import dequantize_variables, dequantized_config
    from tilawa_tpu.train.train import train

    config, variables = load_variables(args.init)
    if config.quant:
        print(f"dequantizing {args.init} ({config.quant}) for continuation")
        variables = dequantize_variables(variables)
        config = dequantized_config(config)
    if args.dropout != config.dropout:
        # dropout is stateless — safe to change for continuation training
        config = dataclasses.replace(config, dropout=args.dropout)
    if args.specaug:
        # NeMo-flavored defaults; only active when deterministic=False, so
        # the exported inference behavior is unchanged
        config = dataclasses.replace(
            config, sa_freq_masks=2, sa_time_masks=10, sa_time_frac=0.05
        )
    init_dir = Path(args.checkpoint_dir) / "init"
    save_variables(init_dir, config, variables)

    batches = bucketed_corpus_batches(
        corpora=tuple(args.corpora.split(",")),
        seed=args.seed,
        crop_prob=args.crop_prob,
        aug_strength=args.aug_strength,
        weighting=args.weighting,
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
        freeze_bn=not args.live_bn,
        warmup_steps=max(100, args.steps // 10),
    )
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
