"""Text-analysis operators for training-data pipelines (beyond the
reference's surface; SURVEY.md 'beyond' scope): token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All are vectorized map_batches bodies over the ``documents`` table schema
(doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

STOPWORDS = ("the", "a")

# tiny per-language stopword profiles for the n-gram/stopword langid
# heuristic (public-knowledge common words)
LANG_PROFILES = {
    "en": {"the", "a", "of", "and", "to"},
    "es": {"el", "la", "de", "y", "que"},
    "fr": {"le", "la", "de", "et", "que"},
    "de": {"der", "die", "und", "das", "zu"},
    "zh": {"de", "le", "shi", "he", "zai"},
}


def token_stats(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens, n_stop, stop_ratio, avg_word_len — single-space
    tokenization (the corpus generator's join convention); formulas chosen
    to be exactly replicable in SQL."""
    text = pd.Series(batch["text"].to_pylist(), dtype="string")
    n_tokens = text.str.count(" ").to_numpy() + 1
    toks = text.str.split(" ")
    n_stop = np.array([sum(t in STOPWORDS for t in ts) for ts in toks], dtype=np.int64)
    n_chars = text.str.len().to_numpy()
    avg_word_len = np.round((n_chars - n_tokens + 1) / n_tokens, 6)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens.astype(np.int64)),
            "n_stop": pa.array(n_stop),
            "stop_ratio": pa.array(np.round(n_stop / n_tokens, 6)),
            "avg_word_len": pa.array(avg_word_len),
        }
    )


def fingerprint(batch: pa.Table) -> pa.Table:
    """doc_id, fingerprint = md5 hex of the text — content-defined doc
    identity (SQL-oracle-matchable; md5 exists in DuckDB)."""
    texts = batch["text"].to_pylist()
    fps = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, type=pa.string())})


def langid_scores(batch: pa.Table) -> pa.Table:
    """Stopword-profile language-ID heuristic: per doc, the profile with
    the highest token hit-rate (ties broken by profile name). Heuristic —
    no SQL oracle; driver does a rows-only check."""
    text = pd.Series(batch["text"].to_pylist(), dtype="string")
    toks = text.str.lower().str.split(" ")
    langs = sorted(LANG_PROFILES)
    scores = np.zeros((len(text), len(langs)))
    for j, lang in enumerate(langs):
        prof = LANG_PROFILES[lang]
        scores[:, j] = [sum(t in prof for t in ts) / max(1, len(ts)) for ts in toks]
    best = np.argmax(scores, axis=1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array([langs[i] for i in best], type=pa.string()),
            "score": pa.array(np.round(scores[np.arange(len(text)), best], 6)),
        }
    )


def rolling_hashes(batch: pa.Table, window: int = 8, base: int = 257,
                   mod: int = (1 << 61) - 1) -> pa.Table:
    """Rabin-Karp rolling-hash document fingerprint: min hash over all
    character windows (a winnowing-style content signature)."""
    texts = batch["text"].to_pylist()
    out = []
    for t in texts:
        b = t.encode()
        if len(b) < window:
            out.append(int.from_bytes(hashlib.md5(b).digest()[:8], "big"))
            continue
        h = 0
        top = pow(base, window - 1, mod)
        best = None
        for i, c in enumerate(b):
            if i >= window:
                h = (h - b[i - window] * top) % mod
            h = (h * base + c) % mod
            if i >= window - 1:
                best = h if best is None else min(best, h)
        out.append(best)
    return pa.table(
        {"doc_id": batch["doc_id"], "rolling_min_hash": pa.array(out, type=pa.uint64())}
    )
