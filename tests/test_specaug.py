"""SpecAugment: masking stays in-bounds, deterministic mode is a no-op."""

import jax
import jax.numpy as jnp
import numpy as np

from tilawa_tpu.ops.specaug import spec_augment
import pytest

pytestmark = pytest.mark.slow



def test_masks_zero_some_features_within_valid_region():
    rng = jax.random.PRNGKey(0)
    feats = jnp.ones((2, 120, 80))
    lengths = jnp.array([120, 60], jnp.int32)
    out = np.asarray(
        spec_augment(feats, lengths, rng, freq_masks=2, freq_width=20,
                     time_masks=4, time_frac=0.1)
    )
    assert out.shape == (2, 120, 80)
    # something got masked
    assert (out == 0.0).sum() > 0
    # example 1: nothing beyond its valid length was newly masked by a
    # *time* mask (freq masks span all time, so compare rows fully masked)
    tail = out[1, 60:, :]
    # freq-masked columns are zero everywhere; a time mask would zero a
    # full row in the tail — rows in the tail must keep non-masked columns
    col_alive = (out[1, :60, :] != 0).any(axis=0)
    assert (tail[:, col_alive] != 0).all()


def test_zero_masks_is_identity():
    rng = jax.random.PRNGKey(0)
    feats = jnp.ones((1, 50, 80))
    lengths = jnp.array([50], jnp.int32)
    out = spec_augment(feats, lengths, rng, freq_masks=0, time_masks=0)
    assert (np.asarray(out) == 1.0).all()


def test_model_specaug_only_in_training_mode():
    from tilawa_tpu.models.fastconformer import FastConformerConfig, FastConformerCTC

    cfg = FastConformerConfig.small(
        n_mels=32, use_pallas=False, sa_freq_masks=2, sa_time_masks=2
    )
    model = FastConformerCTC(cfg)
    audio = jnp.asarray(
        np.random.default_rng(0).normal(scale=0.1, size=(1, 16000)), jnp.float32
    )
    lens = jnp.array([16000], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), audio, lens)
    # deterministic: no dropout rng needed even with sa_* configured
    lp1, _ = model.apply(variables, audio, lens, deterministic=True)
    lp2, _ = model.apply(variables, audio, lens, deterministic=True)
    assert np.allclose(np.asarray(lp1), np.asarray(lp2))
    # training mode consumes rng and changes the output
    lp3, _ = model.apply(
        variables, audio, lens, deterministic=False,
        use_running_average=True, rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert not np.allclose(np.asarray(lp1), np.asarray(lp3))
