"""Record bidi golden fixtures from GNU FriBidi (the known-good reference).

Run manually: ``python tests/record_bidi_fixtures.py`` — writes
``tests/fixtures/bidi_cases.json`` with {logical, visual} pairs produced by
libfribidi's fribidi_log2vis (UAX#9 reference implementation). The committed
fixture file is what tests assert against; fribidi is only needed to
re-record.
"""

import ctypes
import ctypes.util
import json
import os

CASES = [
    # pure scripts
    "hello world",
    "مرحبا بالعالم",
    # Arabic + Arabic-script numbers context (EN after AL -> AN)
    "غرفة 101",
    "الطابق 3 شقة 14",
    "سعر 25.50 دولار",
    "خصم 50% اليوم",
    # Arabic + Latin mixes
    "افتح GPS الآن",
    "قهوة Coffee House طازجة",
    "welcome أهلا back",
    "اشرب pepsi بارد",
    # numbers in LTR context stay EN
    "room 101 فندق",
    # punctuation + brackets (N0)
    "قال (مرحبا) ثم ذهب",
    "عنوان [مهم] هنا",
    "قال: hello!",
    "هل تعمل؟",
    "اتصل 555-1234 الآن",
    # quotes / mixed neutral runs
    'قهوة "فاخرة" جدا',
    "أ+ب=ج",
    # directional marks: RLM forces trailing Latin into RTL paragraph order
    "ملف pdf‏",
    "عدد 7 ‎ok",
    # ALM before digits
    "؜123 عدد",
    # Latin base with embedded Arabic
    "open مقهى door",
    "price: 30 ريال",
    "شارع king fahd رقم 12",
    "مكتب (office) رقم 5",
    "تخفيضات 20% على apple iphone 15",
]


# directional marks/codes an LTR renderer must not draw (matches
# reptext_tpu.conditioning.bidi._REMOVED)
_MARKS = {0x200E, 0x200F, 0x061C, 0x202A, 0x202B, 0x202C, 0x202D, 0x202E,
          0x2066, 0x2067, 0x2068, 0x2069}

_FLAG_SHAPE_MIRRORING = 0x00000001


def log2vis(text: str, lib) -> str:
    """Pure UAX#9 reorder + mirroring via fribidi's low-level API.

    (fribidi_log2vis is not used because it also runs Arabic joining/shaping
    with ligature FEFF placeholders; shaping has its own golden tests.)
    """
    n = len(text)
    FriBidiChar = ctypes.c_uint32
    str_in = (FriBidiChar * n)(*[ord(c) for c in text])
    pbase = ctypes.c_uint32()

    btypes = (ctypes.c_uint32 * n)()
    lib.fribidi_get_bidi_types(str_in, n, btypes)
    lib.fribidi_get_par_direction.restype = ctypes.c_uint32
    pbase.value = lib.fribidi_get_par_direction(btypes, n)

    brackets = (ctypes.c_uint32 * n)()
    lib.fribidi_get_bracket_types(str_in, n, btypes, brackets)

    levels = (ctypes.c_int8 * n)()
    lib.fribidi_get_par_embedding_levels_ex.restype = ctypes.c_int8
    ok = lib.fribidi_get_par_embedding_levels_ex(
        btypes, brackets, n, ctypes.byref(pbase), levels)
    assert ok, text

    visual = (FriBidiChar * n)(*[ord(c) for c in text])
    # L4 mirroring operates on the logical string given the levels; it is a
    # separate call (fribidi_reorder_line's flag only controls internals).
    lib.fribidi_shape_mirroring(levels, n, visual)
    lib.fribidi_reorder_line.restype = ctypes.c_int8
    ok = lib.fribidi_reorder_line(
        _FLAG_SHAPE_MIRRORING, btypes, n, 0, pbase.value, levels, visual, None)
    assert ok, text
    return "".join(chr(c) for c in visual[:n] if c not in _MARKS)


def main():
    path = ctypes.util.find_library("fribidi") or "libfribidi.so.0"
    lib = ctypes.CDLL(path)
    fixtures = [{"logical": t, "visual": log2vis(t, lib)} for t in CASES]
    out_path = os.path.join(os.path.dirname(__file__), "fixtures", "bidi_cases.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(fixtures, f, ensure_ascii=False, indent=1)
    print(f"wrote {len(fixtures)} cases to {out_path}")
    for fx in fixtures:
        print(repr(fx["logical"]), "->", repr(fx["visual"]))


if __name__ == "__main__":
    main()
