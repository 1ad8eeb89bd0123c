"""FastConformer model shape/masking/determinism tests (small config)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tilawa_tpu.models.fastconformer import (  # noqa: E402

    FastConformerCTC,
    FastConformerConfig,
    count_params,
    subsampled_length,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def small_model():
    cfg = FastConformerConfig.small()
    model = FastConformerCTC(cfg)
    rng = np.random.default_rng(0)
    audio = rng.normal(scale=0.1, size=(2, 16000)).astype(np.float32)
    lengths = np.array([16000, 9600], dtype=np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.array(audio), jnp.array(lengths))
    return cfg, model, variables, audio, lengths


def test_output_shapes(small_model):
    cfg, model, variables, audio, lengths = small_model
    lp, enc_lens = model.apply(variables, jnp.array(audio), jnp.array(lengths))
    assert lp.shape[0] == 2
    assert lp.shape[2] == cfg.num_classes
    assert int(enc_lens[0]) == subsampled_length((16000 - 400) // 160 + 1)
    assert int(enc_lens[1]) < int(enc_lens[0])


def test_log_probs_normalized(small_model):
    _, model, variables, audio, lengths = small_model
    lp, _ = model.apply(variables, jnp.array(audio), jnp.array(lengths))
    sums = np.exp(np.asarray(lp)).sum(axis=-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)


def test_padding_invariance(small_model):
    """Valid-region log-probs must be identical whether or not the batch
    carries extra padding — replaces the reference's ±3-6-sample ONNX
    jitter handling with exact determinism (SURVEY.md §5.2)."""
    _, model, variables, audio, lengths = small_model
    lp_a, lens_a = model.apply(
        variables, jnp.array(audio[1:2, :9600]), jnp.array([9600], dtype=jnp.int32)
    )
    lp_b, lens_b = model.apply(
        variables, jnp.array(audio[1:2]), jnp.array([9600], dtype=jnp.int32)
    )
    t = int(lens_a[0])
    assert int(lens_b[0]) == t
    np.testing.assert_allclose(
        np.asarray(lp_a[0, :t]), np.asarray(lp_b[0, :t]), atol=2e-4
    )


def test_determinism(small_model):
    _, model, variables, audio, lengths = small_model
    lp1, _ = model.apply(variables, jnp.array(audio), jnp.array(lengths))
    lp2, _ = model.apply(variables, jnp.array(audio), jnp.array(lengths))
    np.testing.assert_array_equal(np.asarray(lp1), np.asarray(lp2))


def test_large_config_param_count():
    """The large config lands in the reference's 115M-param class."""
    cfg = FastConformerConfig.large()
    model = FastConformerCTC(cfg)
    audio = jnp.zeros((1, 8000), dtype=jnp.float32)
    lengths = jnp.array([8000], dtype=jnp.int32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), audio, lengths)
    )
    n = count_params(variables["params"])
    assert 90e6 < n < 130e6, f"got {n/1e6:.1f}M params"
