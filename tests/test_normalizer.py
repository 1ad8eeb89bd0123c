from tilawa_tpu.data.normalizer import normalize_arabic


def test_strips_diacritics():
    assert normalize_arabic("بِسْمِ") == "بسم"


def test_unifies_alef_variants():
    assert normalize_arabic("آٱٲٳ") == "ا" * 4


def test_khanjar_alef_after_alef_collapses():
    # اٰ must become a single alef, not two
    assert normalize_arabic("اٰ") == "ا"


def test_standalone_khanjar_alef_becomes_alef():
    assert normalize_arabic("رٰ") == "را"


def test_farsi_letters():
    assert normalize_arabic("یےک") == "ييك"


def test_quranic_annotations_removed():
    assert normalize_arabic("ابcۖ۝ۭ") == "ابc"


def test_digits_and_ornate_parens_removed():
    assert normalize_arabic("﴿١٢۳﴾") == ""


def test_tatweel_removed():
    assert normalize_arabic("بـــسم") == "بسم"


def test_punctuation_removed():
    assert normalize_arabic("a,b;c،؛؟d") == "abcd"


def test_bom_and_direction_marks_removed():
    assert normalize_arabic("﻿‏a‎") == "a"


def test_whitespace_collapsed():
    assert normalize_arabic("  a   b\t c ") == "a b c"


def test_strip_hamza_rules():
    assert normalize_arabic("ءأإئ", strip_hamza=True) == ""
    assert normalize_arabic("ى", strip_hamza=True) == "ي"
    # وة -> اة and واة -> اة
    assert normalize_arabic("وة", strip_hamza=True) == "اة"
    assert normalize_arabic("واة", strip_hamza=True) == "اة"
    assert normalize_arabic("يي", strip_hamza=True) == "ي"
    assert normalize_arabic("بصط", strip_hamza=True) == "بسط"
    assert normalize_arabic("صيطر", strip_hamza=True) == "سيطر"
    assert normalize_arabic("الل", strip_hamza=True) == "ال"


def test_flags_can_disable_groups():
    assert normalize_arabic("١", verse_numbers=False) == "١"
    assert normalize_arabic("a.b", punctuation=False) == "a.b"
