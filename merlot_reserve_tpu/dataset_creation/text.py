"""Text cleaning for dataset creation (/root/reference/data/clean_text.py
capability): aggressive ASCII-ification, emoji/control stripping, and
randomized number/time spell-out so ASR-style text looks uniform."""

from __future__ import annotations

import random
import re
import unicodedata
from typing import Optional

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]


def number_to_words(n: int) -> str:
    """Spell out 0..999999 in words."""
    if n < 0:
        return "negative " + number_to_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        t, o = divmod(n, 10)
        return _TENS[t] + ("" if o == 0 else " " + _ONES[o])
    if n < 1000:
        h, r = divmod(n, 100)
        return _ONES[h] + " hundred" + ("" if r == 0 else " " + number_to_words(r))
    if n < 1_000_000:
        th, r = divmod(n, 1000)
        return number_to_words(th) + " thousand" + (
            "" if r == 0 else " " + number_to_words(r))
    return str(n)


def asciify(text: str) -> str:
    """Strip accents/emoji/control chars down to printable ASCII."""
    text = unicodedata.normalize("NFKD", text)
    text = text.encode("ascii", "ignore").decode("ascii")
    return re.sub(r"[\x00-\x08\x0b-\x1f\x7f]", "", text)


def spell_out_numbers(text: str, rng: Optional[random.Random] = None,
                      prob: float = 0.5) -> str:
    """Randomly replace digit runs with spelled-out words (p=prob each), the
    reference's randomized convention (clean_text.py:81-115)."""
    rng = rng or random

    def _sub(m):
        if rng.random() > prob:
            return m.group(0)
        try:
            return number_to_words(int(m.group(0)))
        except ValueError:
            return m.group(0)

    return re.sub(r"\b\d{1,6}\b", _sub, text)


def clean_text(text: str, rng: Optional[random.Random] = None) -> str:
    """Full cleaning chain: asciify, collapse whitespace, spell out numbers."""
    text = asciify(text)
    text = spell_out_numbers(text, rng)
    return re.sub(r"\s+", " ", text).strip()
