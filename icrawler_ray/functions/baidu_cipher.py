"""Baidu objURL substitution-cipher deobfuscation (SURVEY.md P5).

Same two-stage cipher as the reference
(/root/reference/icrawler/builtin/baidu.py:82-127): stage 1 replaces the
three multi-char tokens (``_z2C$q``->``:``, ``_z&e3B``->``.``,
``AzdH3F``->``/``); stage 2 is a single-character substitution map.

Implemented here with ``str.translate`` (C-speed) instead of a per-char
Python loop; :func:`encode_url` is the exact inverse, used by the synthetic
fixture generator. ``decode_batch`` vectorizes over a pandas Series.
"""

from __future__ import annotations

import pandas as pd

TOKENS = {"_z2C$q": ":", "_z&e3B": ".", "AzdH3F": "/"}

CHAR_MAP = {
    "w": "a", "k": "b", "v": "c", "1": "d", "j": "e", "u": "f", "2": "g",
    "i": "h", "t": "i", "3": "j", "h": "k", "s": "l", "4": "m", "g": "n",
    "5": "o", "r": "p", "q": "q", "6": "r", "f": "s", "p": "t", "7": "u",
    "e": "v", "o": "w", "8": "1", "d": "2", "n": "3", "9": "4", "c": "5",
    "m": "6", "0": "7", "b": "8", "l": "9", "a": "0",
}
_TRANS = str.maketrans(CHAR_MAP)
# inverse (for fixture generation): plaintext char -> cipher char
_INV_CHAR = {v: k for k, v in CHAR_MAP.items()}
_INV_TRANS = str.maketrans(_INV_CHAR)
_INV_TOKENS = {v: k for k, v in TOKENS.items()}

CIPHER_FROM = "".join(CHAR_MAP.keys())
CIPHER_TO = "".join(CHAR_MAP.values())


def decode_url(encrypted: str) -> str:
    for cipher, plain in TOKENS.items():
        encrypted = encrypted.replace(cipher, plain)
    return encrypted.translate(_TRANS)


def encode_url(url: str) -> str:
    """Inverse of :func:`decode_url` (fixture generator only).

    Note decode's stage order means cipher chars produced by the inverse
    char-map must not accidentally form a stage-1 token; the token strings
    contain non-mapped chars ("_", "$", "&", uppercase) so inverse-mapped
    output (lowercase+digits only) cannot collide.
    """
    out = url.translate(_INV_TRANS)
    for plain, cipher in _INV_TOKENS.items():
        out = out.replace(plain, cipher)
    return out


def decode_batch(urls: pd.Series) -> pd.Series:
    s = urls.astype("string")
    for cipher, plain in TOKENS.items():
        s = s.str.replace(cipher, plain, regex=False)
    return s.map(lambda u: u.translate(_TRANS), na_action="ignore")
