"""Training-step invariants, CPU-sized model.

freeze_bn exists because continuation training on window crops drifted
BatchNorm running stats and collapsed full-clip eval (EXPERIMENTS.md
2026-08-19); these tests pin the contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tilawa_tpu.models.fastconformer import FastConformerConfig
from tilawa_tpu.train.train import init_state, make_optimizer, make_train_step

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def tiny():
    cfg = FastConformerConfig(
        vocab_size=32, n_mels=16, d_model=32, num_layers=2, num_heads=2,
        ff_expansion=2, conv_kernel=5, subsampling_channels=16,
        dropout=0.1, dtype=jnp.float32, scan_layers=True, use_pallas=False,
        sa_freq_masks=1, sa_time_masks=2,
    )
    tx = make_optimizer(lr=1e-3, total_steps=4)
    model, state = init_state(cfg, tx, example_samples=8000)
    batch = (
        np.random.default_rng(0).normal(scale=0.1, size=(2, 8000)).astype(np.float32),
        np.array([8000, 6000], np.int32),
        np.array([[1, 2, 3, 0], [4, 5, 0, 0]], np.int32),
        np.array([3, 2], np.int32),
    )
    return cfg, tx, model, state, batch


def _trees_equal(a, b):
    return jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda x, y: bool(np.allclose(np.asarray(x), np.asarray(y))), a, b
        )
    )


def test_freeze_bn_keeps_stats_and_updates_params(tiny):
    cfg, tx, model, state, batch = tiny
    step = jax.jit(make_train_step(model, tx, cfg.blank_id, freeze_bn=True))
    s1, loss = step(state, batch, jax.random.PRNGKey(0))
    s2, loss = step(s1, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert _trees_equal(state.batch_stats, s2.batch_stats)
    assert not _trees_equal(state.params, s2.params)


def test_live_bn_updates_stats(tiny):
    cfg, tx, model, state, batch = tiny
    step = jax.jit(make_train_step(model, tx, cfg.blank_id, freeze_bn=False))
    s1, loss = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert not _trees_equal(state.batch_stats, s1.batch_stats)
