"""Arabic shaping + bidi tests with hand-derived golden forms."""

from reptext_tpu.conditioning import (
    bidi_reorder,
    contains_arabic,
    prepare_display_text,
    shape_arabic,
)


def test_contains_arabic():
    assert contains_arabic("سلام")
    assert contains_arabic("hello سلام")
    assert not contains_arabic("hello 123")


def test_shape_salam():
    # سلام: seen-initial, lam-medial, alef-final(lam-alef not applicable: lam
    # is medial-joined to seen)... actually س ل ا م: seen init, lam+alef is a
    # ligature in FINAL form (prev seen joins), meem isolated (alef blocks).
    shaped = shape_arabic("سلام")
    assert shaped == "ﺳﻼﻡ"  # seen-init, lam-alef-final, meem-iso


def test_shape_alsalam():
    # السلام: alef-iso, lam-init, seen-medial, lam-alef-final, meem-iso
    shaped = shape_arabic("السلام")
    assert shaped == "ﺍﻟﺴﻼﻡ"


def test_shape_muhammad():
    # محمد: meem-init, hah-medial, meem-medial, dal-final
    shaped = shape_arabic("محمد")
    assert shaped == "ﻣﺤﻤﺪ"


def test_shape_isolated_letter():
    assert shape_arabic("ب") == "ﺏ"  # beh isolated


def test_shape_with_diacritics_transparent():
    # beh + fatha + noon: diacritic must not break joining: beh-init, noon-final
    shaped = shape_arabic("بَن")
    assert shaped == "ﺑَﻦ"


def test_shape_preserves_non_arabic():
    assert shape_arabic("abc 123") == "abc 123"


def test_bidi_pure_rtl_reverses():
    shaped = shape_arabic("محمد")
    vis = bidi_reorder(shaped)
    assert vis == shaped[::-1]


def test_bidi_mixed_base_rtl():
    # Arabic first -> base RTL; Latin run keeps internal order but moves left.
    out = bidi_reorder("عرب abc")
    assert out == "abc " + "عرب"[::-1]


def test_bidi_mixed_base_ltr():
    # Latin first -> base LTR; Arabic run reversed in place.
    out = bidi_reorder("abc عرب def")
    assert out == "abc " + "عرب"[::-1] + " def"


def test_bidi_numbers_in_rtl_stay_ltr():
    out = bidi_reorder("عرب 123")
    assert "123" in out          # digits not reversed
    assert out == "123 " + "عرب"[::-1]


def test_bidi_bracket_mirroring():
    out = bidi_reorder("(عرب)")
    # whole string is one RTL run: reversed, brackets mirrored
    assert out == "(" + "عرب"[::-1] + ")"


def test_prepare_display_text_latin_identity():
    assert prepare_display_text("Shakker Labs") == "Shakker Labs"


def test_prepare_display_text_arabic():
    out = prepare_display_text("السلام")
    # shaped then reversed for LTR rendering
    assert out == "ﺍﻟﺴﻼﻡ"[::-1]
