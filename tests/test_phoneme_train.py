"""Phoneme training path: target encoding, retrieval, head swap."""

import numpy as np
import pytest

from tilawa_tpu.data.phonemes import PhonemeStore


@pytest.fixture(scope="module")
def store():
    return PhonemeStore.load_default()


def test_encode_decode_roundtrip(store):
    ids = store.encode_phonemes(store.reference_phonemes(1, 1))
    assert ids and all(0 <= i < store.blank_id for i in ids)
    # decode collapses CTC repeats; re-encoding the decode is stable
    txt = store.decode_ids(ids)
    assert store.decode_ids(store.encode_phonemes(txt)) == txt


def test_match_verse_exact_and_corrupt(store):
    m = store.match_verse(store.reference_phonemes(112, 1))
    assert (m[0]["surah"], m[0]["ayah"]) == (112, 1)
    assert m[0]["score"] == 1.0
    toks = store.reference_phonemes(2, 255).split()
    toks[3] = "a"
    toks[11] = "u"
    m2 = store.match_verse(" ".join(toks))
    assert (m2[0]["surah"], m2[0]["ayah"]) == (2, 255)


def test_verse_ids_span(store):
    single = store.verse_ids(103, 1)
    span = store.verse_ids(103, 1, 2)
    assert len(span) > len(single)


def test_swap_head_for_phonemes():
    from tilawa_tpu.models.fastconformer import FastConformerConfig
    from tilawa_tpu.train.phoneme import swap_head_for_phonemes

    cfg = FastConformerConfig.small()
    import jax
    import jax.numpy as jnp

    from tilawa_tpu.models.fastconformer import FastConformerCTC

    model = FastConformerCTC(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16000), jnp.float32),
        jnp.array([16000], jnp.int32),
    )
    new_cfg, new_vars = swap_head_for_phonemes(cfg, variables, 70)
    assert new_cfg.vocab_size == 69
    assert new_vars["params"]["ctc_head"]["kernel"].shape == (cfg.d_model, 70)
    # swapped model runs end to end
    model2 = FastConformerCTC(new_cfg)
    lp, lens = model2.apply(
        new_vars, jnp.zeros((1, 16000), jnp.float32),
        jnp.array([16000], jnp.int32),
        deterministic=True, use_running_average=True,
    )
    assert lp.shape[-1] == 70


def test_phoneme_peel_sequence_multi_verse():
    """Concatenated reference phonemes of 36:1-5 (with mild corruption)
    peel back into the contiguous sequence."""
    from tilawa_tpu.data.phonemes import PhonemeStore
    from tilawa_tpu.eval.experiments import PhonemeExperiment

    store = PhonemeStore.load_default()
    exp = PhonemeExperiment.__new__(PhonemeExperiment)  # no model needed
    exp.store = store
    parts = [store.refs[(36, a)] for a in range(1, 6)]
    text = " | ".join(parts)
    seq = exp._peel_sequence(text)
    assert [(s, a) for s, a, _sc in seq] == [(36, a) for a in range(1, 6)]


def test_phoneme_peel_sequence_single_verse():
    from tilawa_tpu.data.phonemes import PhonemeStore
    from tilawa_tpu.eval.experiments import PhonemeExperiment

    store = PhonemeStore.load_default()
    exp = PhonemeExperiment.__new__(PhonemeExperiment)
    exp.store = store
    seq = exp._peel_sequence(store.refs[(112, 1)])
    assert [(s, a) for s, a, _sc in seq] == [(112, 1)]
