"""Frame-level self-distillation for streaming robustness.

The streaming gap is partial-window decode quality: the champion decodes
full clips near-perfectly but produces garbage on window crops of the same
audio (EXPERIMENTS.md context-sweep: token WER 0.96 on a 10 s prefix of a
clip it decodes perfectly in full). Sequence-level crop CTC training
(stream2-6) plateaued at v3 streaming recall 0.72 vs the reference's 0.893
(reference: README.md:219).

This module adds the supervision the CTC recipe can't provide: the student
sees a CROPPED window while the TEACHER (batch champion) sees the FULL
clip, and the student is trained to reproduce the teacher's frame-level
posteriors over the crop's frames — i.e. to decode partial context the way
a full-context model would. This is the "dual-mode / streaming
distillation" idea from streaming-ASR practice, expressed TPU-natively:
teacher forward, per-sample window slice, and masked KL all live in ONE
jitted step; the crop start is snapped to the 1280-sample encoder frame
stride so teacher/student frames align exactly (mel hop 160 x subsampling
8 — ops/frontend.py, models/fastconformer.py subsampled_length).

Teacher and student run in the same XLA program; the teacher's log-probs
are computed without gradients. An auxiliary CTC loss on the crop's
forced-alignment labels (train/align.py spans) keeps the student anchored
to the label space.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tilawa_tpu.models.fastconformer import FastConformerConfig, FastConformerCTC
from tilawa_tpu.train.train import TrainState, make_optimizer

# encoder frame stride in audio samples: mel hop 160 x subsampling 8
FRAME_STRIDE = 1280


def _ctc_per_token(log_probs, enc_lens, tokens, token_lens, blank_id: int):
    """CTC NLL normalized per label token (mean over the batch)."""
    import optax as _optax

    b, t, _v = log_probs.shape
    logit_paddings = (
        jnp.arange(t)[None, :] >= enc_lens[:, None]
    ).astype(jnp.float32)
    label_paddings = (
        jnp.arange(tokens.shape[1])[None, :] >= token_lens[:, None]
    ).astype(jnp.float32)
    losses = _optax.ctc_loss(
        log_probs, logit_paddings, tokens, label_paddings, blank_id=blank_id
    )
    return (losses / jnp.maximum(token_lens, 1)).mean()


# --------------------------------------------------------------------------
# batch construction (host side)


def snap_crop(
    audio: np.ndarray,
    ids: list[int],
    spans: np.ndarray,
    rng: np.random.Generator,
    min_crop_s: float = 1.2,
) -> tuple[int, int, list[int]]:
    """Pick a window like train.data.random_window_crop but return
    (start, length, kept_ids) with start/end snapped to FRAME_STRIDE so the
    student's encoder frames land exactly on teacher frames.

    Cut points are inter-token gap midpoints (a cut through a token leaves
    audible speech labelled as nothing — see random_window_crop)."""
    sr = 16000
    n = len(audio)
    L = len(ids)
    cuts = np.empty(L + 1, np.int64)
    cuts[0] = 0
    cuts[-1] = n
    if L > 1:
        cuts[1:-1] = (spans[:-1, 1] + spans[1:, 0]) // 2
    # snap to the frame grid (nearest multiple; gaps are >> 80 ms typically)
    cuts = np.clip((cuts + FRAME_STRIDE // 2) // FRAME_STRIDE * FRAME_STRIDE, 0, n)
    min_len = min(n, int(min_crop_s * sr))

    mode = rng.random()
    if mode < 0.4:          # prefix (discovery window)
        i0 = 0
        valid = np.nonzero(cuts - cuts[0] >= min_len)[0]
        i1 = int(rng.choice(valid)) if len(valid) else L
    elif mode < 0.6:        # suffix (post-trim tracking window)
        i1 = L
        valid = np.nonzero(cuts[-1] - cuts >= min_len)[0]
        i0 = int(rng.choice(valid)) if len(valid) else 0
    else:                   # interior window
        i0 = int(rng.integers(0, L))
        valid = np.nonzero(cuts - cuts[i0] >= min_len)[0]
        i1 = int(rng.choice(valid)) if len(valid) else L
    s0, s1 = int(cuts[i0]), int(cuts[i1])
    if s1 <= s0:
        return 0, n, list(ids)
    return s0, s1 - s0, [ids[i] for i in range(i0, i1)]


def distill_batches(
    corpora: tuple[str, ...] = ("v1", "v2", "v3"),
    seed: int = 0,
    augment: bool = True,
    crop_prob: float = 0.85,
    buckets: list[tuple[float, int]] | None = None,
    weighting: str = "sqrt",
    min_crop_s: float = 1.2,
) -> Iterator[tuple]:
    """Infinite iterator of distillation batches.

    Yields (audio [B,Npad] f32, audio_lens [B], crop_start [B],
    crop_len [B], tokens [B,L], token_lens [B]): full audio for the
    teacher, crop window + crop labels for the student. Samples without
    forced alignments (or drawn as full-window by 1-crop_prob) get
    crop_start=0, crop_len=audio_len — the student then sees exactly the
    teacher's input and the KL is a consistency term.

    Augmentation (speed/gain/noise — train.data._augment) applies to the
    FULL clip before the crop is taken, so teacher and student always see
    the same audio content.
    """
    from tilawa_tpu.train.data import (
        BUCKETS, _attach_spans, _augment, load_corpus_examples,
    )

    buckets = buckets or [b for b in BUCKETS if b[0] <= 48.0]
    raw = []
    for corpus in corpora:
        raw.extend(
            load_corpus_examples(
                corpus, max_audio_s=buckets[-1][0], return_ids=True
            )
        )
    if not raw:
        raise RuntimeError("no decodable training examples found")
    examples = _attach_spans(corpora, raw)

    by_bucket: list[list] = [[] for _ in buckets]
    for a, ids, spans in examples:
        for bi, (sec, _bs) in enumerate(buckets):
            if len(a) <= sec * 16000:
                by_bucket[bi].append((a, ids, spans))
                break
    live = [bi for bi, ex in enumerate(by_bucket) if ex]
    token_pads = []
    for ex in by_bucket:
        tp = max((len(ids) for _a, ids, _sp in ex), default=8)
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
        picks = rng.choice(
            len(pool), size=min(bs, len(pool)), replace=len(pool) < bs
        )
        rows = []
        for i in picks:
            a, ids, spans = pool[int(i)]
            if augment:
                a = _augment(a, rng, pad)
            a = a[:pad]
            if (
                spans is not None and len(spans) == len(ids) and len(spans)
                and rng.random() < crop_prob
            ):
                # spans were aligned on the un-augmented clip; speed perturb
                # rescales time. Rescale the spans by the actual length
                # ratio (gap midpoints just need to land in the gaps).
                sp = spans.astype(np.float64) * (len(a) / len(pool[int(i)][0]))
                s0, slen, kept = snap_crop(
                    a, ids, sp.astype(np.int64), rng, min_crop_s=min_crop_s
                )
            else:
                s0, slen, kept = 0, len(a), list(ids)
            rows.append((a, s0, slen, kept))
        while len(rows) < bs:
            rows.append(rows[len(rows) % max(1, len(picks))])

        b = len(rows)
        audio = np.zeros((b, pad), np.float32)
        audio_lens = np.zeros(b, np.int32)
        crop_start = np.zeros(b, np.int32)
        crop_len = np.zeros(b, np.int32)
        tokens = np.zeros((b, token_pads[bi]), np.int32)
        token_lens = np.zeros(b, np.int32)
        for i, (a, s0, slen, kept) in enumerate(rows):
            audio[i, : len(a)] = a
            audio_lens[i] = len(a)
            crop_start[i] = s0
            crop_len[i] = slen
            kept = kept[: token_pads[bi]]
            tokens[i, : len(kept)] = kept
            token_lens[i] = len(kept)
        yield audio, audio_lens, crop_start, crop_len, tokens, token_lens


# --------------------------------------------------------------------------
# the jitted distillation step


def _slice_to_front(x: jnp.ndarray, start: jnp.ndarray, length: jnp.ndarray):
    """Per-sample roll-to-front + zero beyond `length` along axis 1.

    dynamic_slice can't take a window that runs past the end, so roll
    (which wraps) then mask the wrapped tail to zero."""
    rolled = jax.vmap(lambda row, s: jnp.roll(row, -s, axis=0))(x, start)
    idx = jnp.arange(x.shape[1])
    if rolled.ndim == 2:
        return jnp.where(idx[None, :] < length[:, None], rolled, 0.0)
    return jnp.where((idx[None, :] < length[:, None])[..., None], rolled, 0.0)


def _pool_teacher_time(t_lp: jnp.ndarray, pool: int) -> jnp.ndarray:
    """Average teacher probabilities over a +-pool frame window (then
    re-log). CTC peaks are alignment artifacts: a full-context teacher may
    place a token's spike a frame or two away from where a partial-context
    student can — frame-exact KL punishes that placement, which measurably
    HURT streaming quality (distill1: v1 0.477 vs crop-CTC stream6 0.636).
    Pooling keeps the token identity supervision while tolerating small
    time shifts."""
    if pool <= 0:
        return t_lp
    probs = jnp.exp(t_lp)
    k = 2 * pool + 1
    kernel = jnp.ones((k,), t_lp.dtype) / k
    pooled = jax.vmap(  # over batch
        lambda p: jax.vmap(  # over vocab
            lambda col: jnp.convolve(col, kernel, mode="same"), in_axes=1,
            out_axes=1,
        )(p)
    )(probs)
    return jnp.log(jnp.maximum(pooled, 1e-10))


def make_distill_step(
    student: FastConformerCTC,
    teacher: FastConformerCTC,
    tx,
    blank_id: int,
    kl_weight: float = 1.0,
    ctc_weight: float = 0.3,
    teacher_pool: int = 0,
):
    """One jitted step: teacher forward on full audio (no grad), student
    forward on the crop, masked frame-KL + auxiliary crop-CTC loss.

    BatchNorm runs with frozen running statistics (the stream1 live-BN
    collapse — EXPERIMENTS.md 2026-08-19 — reproduces on any shifted input
    distribution)."""

    def step(state: TrainState, teacher_variables, batch, rng):
        audio, audio_lens, crop_start, crop_len, tokens, token_lens = batch
        dropout_rng = jax.random.fold_in(rng, state.step)

        # Teacher: full-context posteriors, constant w.r.t. the student.
        t_lp, t_enc_lens = teacher.apply(
            teacher_variables, audio, audio_lens,
            deterministic=True, use_running_average=True,
        )
        t_lp = jax.lax.stop_gradient(_pool_teacher_time(t_lp, teacher_pool))
        # Align teacher frames to the student's crop: student frame t is
        # teacher frame t + crop_start/FRAME_STRIDE.
        frame_off = crop_start // FRAME_STRIDE
        t_lp_crop = _slice_to_front(
            t_lp, frame_off, jnp.full_like(frame_off, t_lp.shape[1])
        )

        student_audio = _slice_to_front(audio, crop_start, crop_len)

        def loss_fn(params):
            s_lp, s_enc_lens = student.apply(
                {"params": params, "batch_stats": state.batch_stats},
                student_audio, crop_len,
                deterministic=False,
                use_running_average=True,
                rngs={"dropout": dropout_rng},
            )
            t = s_lp.shape[1]
            # valid student frames that also exist in the teacher's clip
            frames_ok = jnp.minimum(
                s_enc_lens, jnp.maximum(t_enc_lens - frame_off, 0)
            )
            mask = (jnp.arange(t)[None, :] < frames_ok[:, None]).astype(
                jnp.float32
            )
            tl = t_lp_crop[:, :t, :]
            kl = jnp.sum(
                jnp.exp(tl) * (tl - s_lp), axis=-1
            )  # [B, T] per-frame KL(teacher || student)
            kl = jnp.sum(kl * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            # per-TOKEN CTC so the two terms share a scale (a raw
            # per-sequence NLL of ~50-100 would drown the ~1-nat KL and
            # turn this back into the plateaued crop-CTC recipe)
            ctc = _ctc_per_token(
                s_lp, s_enc_lens, tokens, token_lens, blank_id
            )
            return kl_weight * kl + ctc_weight * ctc, (kl, ctc)

        (loss, (kl, ctc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt
            ),
            (loss, kl, ctc),
        )

    return step


def train_distill(
    student_init: str | Path,
    teacher_ckpt: str | Path,
    batches: Iterator,
    steps: int,
    lr: float = 3e-5,
    seed: int = 0,
    checkpoint_dir: str | Path | None = None,
    checkpoint_every: int = 500,
    kl_weight: float = 1.0,
    ctc_weight: float = 0.3,
    teacher_pool: int = 0,
    log_every: int = 20,
    dropout: float = 0.1,
):
    """Distillation loop. student_init / teacher_ckpt may be quantized
    exports — both are dequantized to fp for training/forward (int8 round
    trip is quality-neutral; EXPERIMENTS.md round-3 quantization entry)."""
    import dataclasses

    from tilawa_tpu.train.checkpoint import load_variables
    from tilawa_tpu.train.quantize import dequantize_variables, dequantized_config

    s_cfg, s_vars = load_variables(student_init)
    if s_cfg.quant:
        s_vars = dequantize_variables(s_vars)
        s_cfg = dequantized_config(s_cfg)
    s_cfg = dataclasses.replace(s_cfg, dropout=dropout)
    t_cfg, t_vars = load_variables(teacher_ckpt)
    if t_cfg.quant:
        t_vars = dequantize_variables(t_vars)
        t_cfg = dequantized_config(t_cfg)

    student = FastConformerCTC(s_cfg)
    teacher = FastConformerCTC(t_cfg)
    tx = make_optimizer(lr=lr, total_steps=steps,
                        warmup_steps=max(100, steps // 20))
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=s_vars["params"],
        batch_stats=s_vars["batch_stats"],
        opt_state=tx.init(s_vars["params"]),
    )
    step_fn = jax.jit(
        make_distill_step(
            student, teacher, tx, s_cfg.blank_id,
            kl_weight=kl_weight, ctc_weight=ctc_weight,
            teacher_pool=teacher_pool,
        ),
        donate_argnums=0,
    )
    # teacher weights ride as an ARGUMENT (device-resident), never as
    # compiled-in constants — baking them into the HLO blew the remote
    # compile payload limit (HTTP 413) and would re-upload per bucket shape
    t_vars = jax.device_put(t_vars)
    rng = jax.random.PRNGKey(seed + 1)

    history = []
    t0 = time.time()
    for i in range(steps):
        batch = next(batches)
        state, (loss, kl, ctc) = step_fn(state, t_vars, batch, rng)
        if i % log_every == 0 or i == steps - 1:
            lv, klv, ctcv = float(loss), float(kl), float(ctc)
            history.append(lv)
            shape = batch[0].shape
            print(
                f"step {i:5d}  loss {lv:8.4f}  kl {klv:8.4f}  ctc {ctcv:8.2f}"
                f"  [{shape[0]}x{shape[1]//16000}s]  ({time.time()-t0:.0f}s)",
                flush=True,
            )
        if checkpoint_dir and (i + 1) % checkpoint_every == 0:
            _save(checkpoint_dir, s_cfg, state, i + 1)
    if checkpoint_dir:
        _save(checkpoint_dir, s_cfg, state, steps)
    return state, history


def _save(checkpoint_dir, config, state, step):
    import dataclasses

    from tilawa_tpu.train.checkpoint import save_variables

    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    # checkpoints are inference artifacts: save with dropout 0
    path = Path(checkpoint_dir) / f"step_{step:06d}"
    save_variables(path, dataclasses.replace(config, dropout=0.0), variables)
    print(f"checkpoint -> {path}", flush=True)


def main(argv=None) -> int:  # pragma: no cover - CLI
    import argparse

    parser = argparse.ArgumentParser(
        description="frame-level streaming self-distillation"
    )
    parser.add_argument("--student-init", default="exports/stream6-int8")
    parser.add_argument("--teacher", default="exports/champion-int4")
    parser.add_argument("--steps", type=int, default=4000)
    parser.add_argument("--lr", type=float, default=3e-5)
    parser.add_argument("--kl-weight", type=float, default=1.0)
    parser.add_argument("--ctc-weight", type=float, default=0.3)
    parser.add_argument("--teacher-pool", type=int, default=0,
                        help="+-K frame teacher probability pooling "
                             "(tolerates CTC peak shift)")
    parser.add_argument("--crop-prob", type=float, default=0.85)
    parser.add_argument("--corpora", default="all")
    parser.add_argument("--checkpoint-dir", default="checkpoints/distill1")
    parser.add_argument("--checkpoint-every", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dropout", type=float, default=0.1)
    args = parser.parse_args(argv)

    corpora = (
        ("v1", "v2", "v3") if args.corpora == "all"
        else tuple(args.corpora.split(","))
    )
    batches = distill_batches(
        corpora=corpora, seed=args.seed, crop_prob=args.crop_prob
    )
    train_distill(
        args.student_init, args.teacher, batches, args.steps,
        lr=args.lr, seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        kl_weight=args.kl_weight, ctc_weight=args.ctc_weight,
        teacher_pool=args.teacher_pool,
        dropout=args.dropout,
    )
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
