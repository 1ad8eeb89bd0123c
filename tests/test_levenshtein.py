import pytest

from tilawa_tpu.text import levenshtein as lev


def test_distance_basic():
    assert lev.distance("", "") == 0
    assert lev.distance("abc", "") == 3
    assert lev.distance("", "abc") == 3
    assert lev.distance("kitten", "sitting") == 3
    assert lev.distance("abc", "abc") == 0


def test_ratio_matches_python_levenshtein_semantics():
    # python-Levenshtein ratio uses indel distance (sub cost 2):
    # ratio("kitten","sitting") = (13 - 5) / 13
    assert lev.ratio("kitten", "sitting") == pytest.approx(8 / 13)
    assert lev.ratio("", "") == 1.0
    assert lev.ratio("a", "") == 0.0
    assert lev.ratio("abc", "abc") == 1.0


def test_indel_distance():
    assert lev.indel_distance("kitten", "sitting") == 5
    assert lev.indel_distance("abc", "abc") == 0
    assert lev.indel_distance("abc", "def") == 6


def test_semi_global_distance():
    assert lev.semi_global_distance("abc", "xxabcxx") == 0
    assert lev.semi_global_distance("abd", "xxabcxx") == 1
    assert lev.semi_global_distance("", "xyz") == 0
    assert lev.semi_global_distance("abc", "") == 3


def test_fragment_score():
    assert lev.fragment_score("abc", "xxabcxx") == 1.0
    assert lev.fragment_score("", "anything") == 1.0
    assert lev.fragment_score("abcd", "xxabcxx") == pytest.approx(0.75)


def test_partial_ratio():
    assert lev.partial_ratio("abc", "xxabcxx") == 1.0
    assert lev.partial_ratio("", "x") == 0.0
    # symmetric in argument order (shorter slides over longer)
    assert lev.partial_ratio("xxabcxx", "abc") == 1.0


def test_native_and_python_agree():
    cases = [
        ("kitten", "sitting"),
        ("الحمد لله", "الحمد لله رب العالمين"),
        ("", "abc"),
        ("same", "same"),
        ("قل هو الله احد", "قل اعوذ برب الفلق"),
    ]
    for a, b in cases:
        assert lev._py_distance(a, b) == lev.distance(a, b)
        assert lev._py_indel(a, b) == lev.indel_distance(a, b)
        assert lev._py_semi_global(a, b) == lev.semi_global_distance(a, b)


def test_corpus_batch():
    texts = ["hello", "world", "help", "", "yelp"]
    c = lev.Corpus(texts)
    br = c.batch_ratio("help")
    bd = c.batch_distance("help")
    bf = c.batch_fragment_score("hel")
    bp = c.batch_partial_ratio("hel")
    for i, t in enumerate(texts):
        assert br[i] == pytest.approx(lev.ratio("help", t))
        assert bd[i] == lev.distance("help", t)
        assert bf[i] == pytest.approx(lev.fragment_score("hel", t))
        assert bp[i] == pytest.approx(lev.partial_ratio("hel", t))
