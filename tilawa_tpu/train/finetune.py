"""Streaming-robustness continuation training from the int4 champion.

Warm-starts from the dequantized champion export (the only surviving
checkpoint form) and continues CTC training over a mixture of full clips
(rehearsal — keeps batch accuracy) and forced-alignment random-window
crops (random_window_crop — teaches the partial-window + in-length
silence shapes the streaming tracker actually feeds; see
tilawa_tpu/train/align.py for why).

Usage:
  python -m tilawa_tpu.train.finetune --steps 3000 --crop-prob 0.5 \
      --checkpoint-dir checkpoints/stream1
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="streaming finetune")
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--crop-prob", type=float, default=0.5)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--corpora", default="v1,v2,v3")
    parser.add_argument("--init", default="exports/champion-int4")
    parser.add_argument("--checkpoint-dir", default="checkpoints/stream1")
    parser.add_argument("--checkpoint-every", type=int, default=1000)
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
    init_dir = Path(args.checkpoint_dir) / "init"
    save_variables(init_dir, config, variables)

    batches = bucketed_corpus_batches(
        corpora=tuple(args.corpora.split(",")),
        seed=args.seed,
        crop_prob=args.crop_prob,
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
    )
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
