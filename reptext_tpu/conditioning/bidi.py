"""UAX#9 bidirectional reordering (implicit levels, brackets, marks).

The reference does no bidi at all (plain ``draw.text``, RepText/infer.py:74-76
— SURVEY.md §2.1 "Arabic caveat"); this module implements the Unicode
Bidirectional Algorithm core needed to render mixed Arabic / Latin / number /
punctuation text correctly for an LTR glyph renderer:

- P2/P3 base direction from the first strong character;
- W1-W7 weak-type resolution with EN and AN kept SEPARATE (Arabic numbers
  after Arabic letters become AN; European numbers after L stay EN — this is
  the common mixed "Arabic + digits" case the collapsed-class version got
  structurally wrong);
- N0 bracket pairs (BD16 stack pairing + strong-context resolution);
- N1/N2 neutral resolution with EN/AN acting as R;
- I1/I2 implicit levels, L1 trailing-whitespace reset, L2 run reversal,
  L4 mirroring at odd levels;
- directional marks LRM/RLM/ALM participate as strong types and are then
  removed from the visual output (they are zero-width formatting characters),
  as are the explicit embedding/isolate codes this implementation treats as
  removed-BN (X9).

Explicit embedding state machines (X1-X8) are not implemented — inline
LRE/RLE/LRO/RLO/isolates are rare in rendered captions; the marks cover the
practical override cases. Fixtures recorded from GNU FriBidi pin behavior
(tests/fixtures/bidi_cases.json).
"""

from __future__ import annotations

import unicodedata
from typing import List, Optional, Tuple

# Directional formatting characters removed from visual output (X9 / marks)
_REMOVED = {
    0x200E, 0x200F, 0x061C,              # LRM, RLM, ALM (strong, zero-width)
    0x202A, 0x202B, 0x202C, 0x202D, 0x202E,   # LRE, RLE, PDF, LRO, RLO
    0x2066, 0x2067, 0x2068, 0x2069,      # LRI, RLI, FSI, PDI
}

# Common bidi-mirrored pairs (BidiBrackets + BidiMirroring core set)
_MIRROR_PAIRS = {
    "(": ")", ")": "(", "[": "]", "]": "[", "{": "}", "}": "{",
    "<": ">", ">": "<", "«": "»", "»": "«", "‹": "›", "›": "‹",
    "⟨": "⟩", "⟩": "⟨", "“": "”", "”": "“", "‘": "’", "’": "‘",
}
# Canonical open->close bracket pairs for BD16 (subset: ASCII + common)
_BRACKETS = {"(": ")", "[": "]", "{": "}", "⟨": "⟩"}
_BRACKETS_CLOSE = {v: k for k, v in _BRACKETS.items()}


def _cls(ch: str) -> str:
    b = unicodedata.bidirectional(ch)
    return b if b else "ON"  # unassigned -> neutral


def base_direction(text: str, default: str = "ltr") -> str:
    """P2/P3: first strong character decides the paragraph direction."""
    for ch in text:
        c = _cls(ch)
        if c in ("R", "AL"):
            return "rtl"
        if c == "L":
            return "ltr"
    return default


def _resolve_weak(types: List[str], sos: str) -> None:
    """W1-W7 in place. ``types`` uses raw UAX#9 classes."""
    n = len(types)

    # W1: NSM takes the type of the previous character (sos -> ON)
    prev = sos
    for i in range(n):
        if types[i] == "NSM":
            types[i] = prev if prev not in ("NSM",) else "ON"
        prev = types[i]

    # W2: EN -> AN when the last strong type before it is AL
    strong = sos
    for i in range(n):
        t = types[i]
        if t in ("L", "R", "AL"):
            strong = t
        elif t == "EN" and strong == "AL":
            types[i] = "AN"

    # W3: AL -> R
    for i in range(n):
        if types[i] == "AL":
            types[i] = "R"

    # W4: single ES between EN/EN -> EN; single CS between same numbers -> that
    for i in range(1, n - 1):
        if types[i] == "ES" and types[i - 1] == "EN" and types[i + 1] == "EN":
            types[i] = "EN"
        elif types[i] == "CS" and types[i - 1] == types[i + 1] and \
                types[i - 1] in ("EN", "AN"):
            types[i] = types[i - 1]

    # W5: runs of ET adjacent to EN -> EN
    i = 0
    while i < n:
        if types[i] == "ET":
            j = i
            while j < n and types[j] == "ET":
                j += 1
            before = types[i - 1] if i > 0 else sos
            after = types[j] if j < n else "ON"
            if before == "EN" or after == "EN":
                for k in range(i, j):
                    types[k] = "EN"
            i = j
        else:
            i += 1

    # W6: remaining separators/terminators -> ON
    for i in range(n):
        if types[i] in ("ET", "ES", "CS"):
            types[i] = "ON"

    # W7: EN -> L when the last strong type before it is L
    strong = sos
    for i in range(n):
        t = types[i]
        if t in ("L", "R"):
            strong = t
        elif t == "EN" and strong == "L":
            types[i] = "L"


def _pair_brackets(chars: List[str], types: List[str]) -> List[Tuple[int, int]]:
    """BD16: stack-based bracket pairing over ON characters."""
    stack: List[Tuple[str, int]] = []
    pairs: List[Tuple[int, int]] = []
    for i, (ch, t) in enumerate(zip(chars, types)):
        if t != "ON":
            continue
        if ch in _BRACKETS:
            if len(stack) < 63:
                stack.append((_BRACKETS[ch], i))
        elif ch in _BRACKETS_CLOSE:
            for s in range(len(stack) - 1, -1, -1):
                if stack[s][0] == ch:
                    pairs.append((stack[s][1], i))
                    del stack[s:]
                    break
    return sorted(pairs)


def _resolve_brackets(chars, types, pairs, e_dir, sos):
    """N0: set matched bracket pairs to a strong direction from context."""
    o_dir = "R" if e_dir == "L" else "L"

    def strong_of(t):
        if t in ("R", "EN", "AN"):
            return "R"
        if t == "L":
            return "L"
        return None

    for open_i, close_i in pairs:
        inside = None
        found_opposite = False
        for k in range(open_i + 1, close_i):
            s = strong_of(types[k])
            if s == e_dir:
                inside = e_dir
                break
            if s == o_dir:
                found_opposite = True
        if inside == e_dir:
            types[open_i] = types[close_i] = e_dir
        elif found_opposite:
            # preceding context: first strong before the opening bracket
            context = sos
            for k in range(open_i - 1, -1, -1):
                s = strong_of(types[k])
                if s is not None:
                    context = s
                    break
            if context == o_dir:
                types[open_i] = types[close_i] = o_dir
            else:
                types[open_i] = types[close_i] = e_dir
        # else: no strong inside -> leave for N1/N2


def _resolve_neutrals(types: List[str], base_level: int, sos: str) -> None:
    """N1/N2; EN/AN act as R on both sides."""
    n = len(types)
    e_dir = "R" if base_level % 2 else "L"

    def as_strong(t: str) -> Optional[str]:
        if t in ("R", "EN", "AN"):
            return "R"
        if t == "L":
            return "L"
        return None

    neutral = ("B", "S", "WS", "ON")
    i = 0
    while i < n:
        if types[i] in neutral:
            j = i
            while j < n and types[j] in neutral:
                j += 1
            before = as_strong(types[i - 1]) if i > 0 else sos
            after = as_strong(types[j]) if j < n else sos
            fill = before if (before == after and before is not None) else e_dir
            for k in range(i, j):
                types[k] = fill
            i = j
        else:
            i += 1


def resolve_levels(text: str, base: Optional[str] = None) -> Tuple[List[int], List[str]]:
    """Run the implicit bidi algorithm; returns (levels, kept_chars_mask-ready
    types). Characters in ``_REMOVED`` get level -1 (dropped from display)."""
    chars = list(text)
    raw = [_cls(c) for c in chars]
    if base is None:
        base = base_direction(text)
    base_level = 1 if base == "rtl" else 0
    sos = "R" if base_level % 2 else "L"

    # X9: strip explicit codes for resolution (keep positions for -1 marking).
    keep_idx = [i for i, c in enumerate(chars) if ord(c) not in _REMOVED
                or raw[i] in ("L", "R", "AL")]
    # marks (LRM/RLM/ALM) participate as strong types, then get dropped later
    work_idx = keep_idx
    types = [raw[i] for i in work_idx]
    wchars = [chars[i] for i in work_idx]

    _resolve_weak(types, sos)
    pairs = _pair_brackets(wchars, types)
    _resolve_brackets(wchars, types, pairs, sos, sos)  # e_dir == sos here
    _resolve_neutrals(types, base_level, sos)

    # I1/I2: implicit levels
    levels_w = []
    for t in types:
        if base_level % 2 == 0:
            levels_w.append({"L": 0, "R": 1, "AN": 2, "EN": 2}.get(t, 0))
        else:
            levels_w.append({"L": 2, "R": 1, "AN": 2, "EN": 2}.get(t, 1))

    # L1: trailing whitespace (and WS before S/B) resets to the base level
    for i in range(len(levels_w) - 1, -1, -1):
        if raw[work_idx[i]] in ("WS", "B", "S"):
            levels_w[i] = base_level
        else:
            break

    levels = [-1] * len(chars)
    for wi, i in enumerate(work_idx):
        levels[i] = levels_w[wi]
    for i, c in enumerate(chars):
        if ord(c) in _REMOVED:
            levels[i] = -1  # marks are zero-width: never displayed
    return levels, raw


def reorder_visual(text: str, base: Optional[str] = None) -> str:
    """Logical -> visual order for an LTR renderer (L2 + L4 + mark removal)."""
    if not text:
        return text
    levels, _raw = resolve_levels(text, base)
    chars = list(text)

    # L4: mirror glyphs at odd levels before reversal
    chars = [
        _MIRROR_PAIRS.get(c, c) if lv >= 0 and lv % 2 else c
        for c, lv in zip(chars, levels)
    ]

    # Drop removed marks, keeping level alignment
    kept = [(c, lv) for c, lv in zip(chars, levels) if lv >= 0]
    if not kept:
        return ""
    chars = [c for c, _ in kept]
    lvls = [lv for _, lv in kept]

    # L2: reverse maximal runs from the highest level down to 1
    n = len(chars)
    for level in range(max(lvls), 0, -1):
        i = 0
        while i < n:
            if lvls[i] >= level:
                j = i
                while j < n and lvls[j] >= level:
                    j += 1
                chars[i:j] = chars[i:j][::-1]
                lvls[i:j] = lvls[i:j][::-1]
                i = j
            else:
                i += 1
    return "".join(chars)
