"""Frame-level distillation step invariants (train/distill.py), CPU-sized.

Key contract: with an identical teacher/student and a full-window "crop",
the KL term is exactly the self-consistency zero — which pins the
teacher-frame/student-frame alignment (crop_start // 1280 offset) as a
measurable identity rather than a hope."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tilawa_tpu.models.fastconformer import FastConformerConfig, FastConformerCTC
from tilawa_tpu.train.distill import (
    FRAME_STRIDE, distill_batches, make_distill_step, snap_crop,
)
from tilawa_tpu.train.train import TrainState, init_state, make_optimizer

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = FastConformerConfig(
        vocab_size=32, n_mels=16, d_model=32, num_layers=2, num_heads=2,
        ff_expansion=2, conv_kernel=5, subsampling_channels=16,
        dropout=0.0, dtype=jnp.float32, scan_layers=True, use_pallas=False,
    )
    tx = make_optimizer(lr=1e-3, total_steps=4)
    model, state = init_state(cfg, tx, example_samples=8000)
    return cfg, tx, model, state


def _batch(crop_start, crop_len):
    rng = np.random.default_rng(0)
    audio = rng.normal(scale=0.1, size=(2, 16000)).astype(np.float32)
    return (
        audio,
        np.array([16000, 12800], np.int32),
        np.asarray(crop_start, np.int32),
        np.asarray(crop_len, np.int32),
        np.array([[1, 2, 3, 0], [4, 5, 0, 0]], np.int32),
        np.array([3, 2], np.int32),
    )


def test_self_distill_full_window_kl_is_zero(tiny):
    cfg, tx, model, state = tiny
    teacher_vars = {"params": state.params, "batch_stats": state.batch_stats}
    step = make_distill_step(
        model, model, tx, cfg.blank_id,
        kl_weight=1.0, ctc_weight=0.0,
    )
    batch = _batch([0, 0], [16000, 12800])
    _new, (loss, kl, _ctc) = step(state, teacher_vars, batch, jax.random.PRNGKey(0))
    # identical nets, identical input window -> KL == 0 (up to fp noise)
    assert float(kl) < 1e-4, float(kl)
    assert float(loss) < 1e-4


def test_cropped_window_trains_and_freezes_bn(tiny):
    cfg, _tx, model, state = tiny
    import optax

    tx = optax.adam(1e-3)  # constant LR: the scheduled tx is 0 at step 0
    state = TrainState(
        step=state.step, params=state.params,
        batch_stats=state.batch_stats, opt_state=tx.init(state.params),
    )
    teacher_vars = {"params": state.params, "batch_stats": state.batch_stats}
    step = make_distill_step(
        model, model, tx, cfg.blank_id,
        kl_weight=1.0, ctc_weight=0.3,
    )
    # crops aligned to the frame stride
    batch = _batch([FRAME_STRIDE * 2, FRAME_STRIDE], [6400, 6400])
    new, (loss, kl, ctc) = step(state, teacher_vars, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss)) and np.isfinite(float(ctc))
    # cropped window differs from full-context teacher -> KL strictly > 0
    assert float(kl) > 1e-6
    # params moved, BN stats frozen
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        state.params, new.params,
    )
    assert any(jax.tree_util.tree_leaves(changed))
    same_bs = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state.batch_stats, new.batch_stats,
    )
    assert all(jax.tree_util.tree_leaves(same_bs))


def test_snap_crop_frame_aligned():
    rng = np.random.default_rng(1)
    audio = np.zeros(64000, np.float32)
    ids = [5, 6, 7, 8]
    spans = np.array(
        [[2000, 9000], [11000, 20000], [25000, 40000], [45000, 60000]],
        np.int64,
    )
    for _ in range(20):
        s0, slen, kept = snap_crop(audio, ids, spans, rng)
        assert s0 % FRAME_STRIDE == 0
        assert 0 < slen <= len(audio)
        assert len(kept) <= len(ids)


def test_distill_batches_shapes():
    it = distill_batches(corpora=("v1",), seed=0, crop_prob=0.5)
    audio, lens, cs, cl, toks, tl = next(it)
    b, n = audio.shape
    assert lens.shape == (b,) and cs.shape == (b,) and cl.shape == (b,)
    assert toks.shape[0] == b and tl.shape == (b,)
    assert (cs + cl <= lens).all()
    assert (cs % FRAME_STRIDE == 0).all()
    assert (cl > 0).all()
