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
    ex = text.str.split(" ").explode()  # vectorized: explode + isin + per-doc sum
    n_stop = (ex.isin(STOPWORDS).groupby(level=0).sum()
              .reindex(range(len(text)), fill_value=0).to_numpy().astype(np.int64))
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
    the highest token hit-rate (ties broken by profile name, i.e. the
    alphabetically-first max). Vectorized (explode + isin per profile);
    the raw-double hit-rate is bit-identical to the DuckDB oracle's
    list_filter/len division (queries.py SQL_LANGID)."""
    text = pd.Series(batch["text"].to_pylist(), dtype="string")
    toks = text.str.lower().str.split(" ")
    lens = toks.str.len().clip(lower=1).to_numpy()
    ex = toks.explode()
    langs = sorted(LANG_PROFILES)
    n = len(text)
    scores = np.zeros((n, len(langs)))
    for j, lang in enumerate(langs):
        hits = ex.isin(LANG_PROFILES[lang]).groupby(level=0).sum()
        scores[:, j] = hits.reindex(range(n), fill_value=0).to_numpy() / lens
    best = np.argmax(scores, axis=1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array([langs[i] for i in best], type=pa.string()),
            "score": pa.array(scores[np.arange(n), best]),
        }
    )


def quality_scores(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens, stop_ratio, avg_word_len, keep — the composite
    quality gate of a training-data pipeline (length / stopword /
    word-length bands). Raw-double ratios so the DuckDB oracle's identical
    divisions hash-match (queries.py SQL_QUALITY_FILTER)."""
    text = pd.Series(batch["text"].to_pylist(), dtype="string")
    n_tokens = (text.str.count(" ") + 1).astype("int64")
    ex = text.str.lower().str.split(" ").explode()
    n_stop = (ex.isin(STOPWORDS).groupby(level=0).sum()
              .reindex(range(len(text)), fill_value=0).to_numpy().astype(np.int64))
    n_chars = text.str.len().to_numpy()
    nt = n_tokens.to_numpy()
    stop_ratio = n_stop / nt
    avg_word_len = (n_chars - nt + 1) / nt
    keep = (nt >= 10) & (avg_word_len >= 2.0) & (avg_word_len <= 12.0) & (stop_ratio <= 0.6)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(nt),
            "stop_ratio": pa.array(stop_ratio),
            "avg_word_len": pa.array(avg_word_len),
            "keep": pa.array(keep),
        }
    )


#: BPE-ish pre-tokenizer approximation (GPT-2-style character classes —
#: letter runs, digit runs, punctuation runs; no lookahead so the SAME
#: pattern runs under DuckDB's RE2 for the oracle)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_counts(batch: pa.Table) -> pa.Table:
    """doc_id, n_ws_tokens (whitespace), n_bpe_tokens (regex pre-tokenizer)
    — the two token-count flavors a training-data pipeline budgets with;
    vectorized str.count / str.findall-free via pandas str.count on the
    alternation (count of non-overlapping matches)."""
    text = pd.Series(batch["text"].to_pylist(), dtype="string")
    n_ws = text.str.count(r"\S+").astype("int64")
    n_bpe = text.str.count(BPE_TOKEN_RE).astype("int64")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ws_tokens": pa.array(n_ws.to_numpy()),
            "n_bpe_tokens": pa.array(n_bpe.to_numpy()),
        }
    )


def rolling_hashes(batch: pa.Table, window: int = 8, base: int = 257,
                   mod: int = (1 << 31) - 1) -> pa.Table:
    """Rabin-Karp rolling-hash document fingerprint: min polynomial hash
    over all byte windows (a winnowing-style content signature).

    Vectorized: per doc, a (n_windows, window) byte view dotted with the
    power vector in int64 (Mersenne-31 modulus keeps every product under
    2^42 — no Python loop over characters, and the same formula is
    SQL-expressible for the DuckDB oracle, queries.py
    SQL_ROLLING_FINGERPRINT)."""
    from numpy.lib.stride_tricks import sliding_window_view

    texts = batch["text"].to_pylist()
    powv = np.array([pow(base, window - 1 - j, mod) for j in range(window)],
                    dtype=np.int64)
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode(), dtype=np.uint8)
        if len(b) < window:
            out[i] = int.from_bytes(hashlib.md5(bytes(b)).digest()[:8], "big") % mod
            continue
        wins = sliding_window_view(b, window).astype(np.int64)
        out[i] = (wins @ powv % mod).min()
    return pa.table(
        {"doc_id": batch["doc_id"], "rolling_min_hash": pa.array(out, type=pa.int64())}
    )
