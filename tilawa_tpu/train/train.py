"""CTC training loop: optax AdamW + cosine schedule, SPMD over the mesh.

The reference trains via NeMo/Lightning on a single remote A100 with
CTC-only steps monkey-patched onto a hybrid model (reference:
scripts/train_fastconformer_phoneme_modal.py:170-252, 817-1332). Here the
loop is a jitted train_step over a ("data","model") mesh: batch sharded on
"data", wide matmuls optionally sharded on "model"
(tilawa_tpu.parallel.sharding), XLA inserting the collectives.

Data: any iterable of (audio [B,N] f32, audio_lens [B], tokens [B,L],
token_lens [B]) — see tilawa_tpu.train.data for the corpus-overfit dataset
used in integration tests.
"""

from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from tilawa_tpu.models.fastconformer import FastConformerConfig, FastConformerCTC
from tilawa_tpu.parallel.mesh import make_mesh
from tilawa_tpu.parallel.sharding import shard_variables


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(
    lr: float = 3e-4, warmup_steps: int = 100, total_steps: int = 10_000,
    weight_decay: float = 1e-4,
):
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1)
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def ctc_loss_fn(log_probs, enc_lens, tokens, token_lens, blank_id: int):
    """Mean per-sequence CTC NLL (optax.ctc_loss over padded batches)."""
    b, t, _v = log_probs.shape
    logit_paddings = (
        jnp.arange(t)[None, :] >= enc_lens[:, None]
    ).astype(jnp.float32)
    label_paddings = (
        jnp.arange(tokens.shape[1])[None, :] >= token_lens[:, None]
    ).astype(jnp.float32)
    losses = optax.ctc_loss(
        log_probs, logit_paddings, tokens, label_paddings, blank_id=blank_id
    )
    return losses.mean()


def make_train_step(model: FastConformerCTC, tx, blank_id: int, freeze_bn: bool = False):
    """freeze_bn=True runs BatchNorm with frozen running statistics —
    continuation training on a shifted input distribution (window crops,
    in-length silence) otherwise drifts the running stats that inference
    depends on, and the params co-adapt to the drifted stats (measured:
    splicing original stats back into a crop-finetuned model DROPPED
    v1-short from 53% to 6%)."""

    def train_step(state: TrainState, batch, rng):
        audio, audio_lens, tokens, token_lens = batch
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            if freeze_bn:
                log_probs, enc_lens = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    audio, audio_lens,
                    deterministic=False,
                    use_running_average=True,
                    rngs={"dropout": dropout_rng},
                )
                return (
                    ctc_loss_fn(log_probs, enc_lens, tokens, token_lens, blank_id),
                    state.batch_stats,
                )
            (log_probs, enc_lens), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                audio, audio_lens,
                deterministic=False,
                use_running_average=False,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            loss = ctc_loss_fn(log_probs, enc_lens, tokens, token_lens, blank_id)
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
            ),
            loss,
        )

    return train_step


def init_state(
    config: FastConformerConfig, tx, seed: int = 0, example_samples: int = 32000
) -> tuple[FastConformerCTC, TrainState]:
    model = FastConformerCTC(config)
    variables = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, example_samples), jnp.float32),
        jnp.array([example_samples], jnp.int32),
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    return model, state


def train(
    config: FastConformerConfig,
    batches: Iterator,
    steps: int,
    lr: float = 3e-4,
    mesh=None,
    seed: int = 0,
    log_every: int = 20,
    checkpoint_dir: str | Path | None = None,
    checkpoint_every: int = 500,
    init_from: str | Path | None = None,
    freeze_bn: bool = False,
    warmup_steps: int = 100,
):
    """Run the training loop; returns (model, final state, loss history).

    init_from: checkpoint dir to warm-start params/batch_stats from (fresh
    optimizer state — continuation training, not exact resume)."""
    tx = make_optimizer(lr=lr, total_steps=steps, warmup_steps=warmup_steps)
    model, state = init_state(config, tx, seed=seed)
    if init_from:
        from tilawa_tpu.train.checkpoint import load_variables

        ckpt_config, variables = load_variables(init_from)
        if ckpt_config != config:
            raise ValueError(
                f"init_from config mismatch: {ckpt_config} != {config}"
            )
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
        )
    if mesh is not None:
        state = state.replace(
            params=shard_variables({"params": state.params}, mesh)["params"],
        )
    step_fn = jax.jit(
        make_train_step(model, tx, config.blank_id, freeze_bn=freeze_bn),
        donate_argnums=0,
    )
    rng = jax.random.PRNGKey(seed + 1)

    history: list[float] = []
    t0 = time.time()
    for i in range(steps):
        batch = next(batches)
        state, loss = step_fn(state, batch, rng)
        if i % log_every == 0 or i == steps - 1:
            lv = float(loss)
            history.append(lv)
            shape = getattr(batch[0], "shape", None)
            print(
                f"step {i:5d}  loss {lv:8.4f}  "
                f"[{shape[0]}x{shape[1]//16000}s]  ({time.time()-t0:.0f}s)"
            )
        if checkpoint_dir and (i + 1) % checkpoint_every == 0:
            _save(checkpoint_dir, config, state, i + 1)
    if checkpoint_dir:
        _save(checkpoint_dir, config, state, steps)
    return model, state, history


def _save(checkpoint_dir, config, state, step):
    from tilawa_tpu.train.checkpoint import save_variables

    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    path = Path(checkpoint_dir) / f"step_{step:06d}"
    save_variables(path, config, variables)
    print(f"checkpoint -> {path}")


def main():  # pragma: no cover - CLI
    import argparse

    from tilawa_tpu.train.data import bucketed_corpus_batches, corpus_batches

    parser = argparse.ArgumentParser(description="tilawa-tpu CTC training")
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--preset", default="small", choices=["small", "large"])
    parser.add_argument("--checkpoint-dir", default="checkpoints/run")
    parser.add_argument("--checkpoint-every", type=int, default=500)
    parser.add_argument(
        "--corpora", default="v1",
        help="comma-separated corpora; >1 or 'all' selects bucketed batches",
    )
    parser.add_argument("--init-from", default=None)
    parser.add_argument("--no-augment", action="store_true")
    parser.add_argument("--weighting", default="prop",
                        choices=["prop", "sqrt", "uniform"])
    parser.add_argument(
        "--crop-prob", type=float, default=0.0,
        help="fraction of examples replaced by forced-alignment window "
             "crops (streaming robustness; see train/finetune.py)",
    )
    parser.add_argument("--dropout", type=float, default=None,
                        help="override config dropout")
    parser.add_argument(
        "--specaug", action="store_true",
        help="enable in-graph SpecAugment (2 freq masks, 10 time masks "
             "<=5%% of valid length — ops/specaug.py)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--only-ids", default=None,
        help="JSON from train.fit_report (or comma list): restrict training "
             "to these sample ids",
    )
    args = parser.parse_args()

    if args.init_from:
        from tilawa_tpu.train.checkpoint import load_config

        config = load_config(args.init_from)
    else:
        config = (
            FastConformerConfig.small()
            if args.preset == "small"
            else FastConformerConfig.large()
        )
    import dataclasses as _dc

    if args.dropout is not None and args.dropout != config.dropout:
        config = _dc.replace(config, dropout=args.dropout)
    if args.specaug:
        config = _dc.replace(
            config, sa_freq_masks=2, sa_time_masks=10, sa_time_frac=0.05
        )
    corpora = (
        ("v1", "v2", "v3") if args.corpora == "all"
        else tuple(args.corpora.split(","))
    )
    if len(corpora) > 1:
        only_ids = None
        if args.only_ids:
            from pathlib import Path as _P

            if _P(args.only_ids).exists():
                import json as _json

                rows = _json.loads(_P(args.only_ids).read_text())
                only_ids = {r["id"] for r in rows}
            else:
                only_ids = set(args.only_ids.split(","))
        batches = bucketed_corpus_batches(
            corpora=corpora, augment=not args.no_augment,
            weighting=args.weighting, only_ids=only_ids,
            crop_prob=args.crop_prob, seed=args.seed,
        )
    else:
        batches = corpus_batches(batch_size=args.batch_size, corpus=corpora[0])
    train(
        config, batches, args.steps, lr=args.lr, seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        init_from=args.init_from,
        warmup_steps=max(100, args.steps // 20),
    )


if __name__ == "__main__":  # pragma: no cover
    main()
