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


#: CDC gear parameters: boundary when the 4-gram code-point hash's
#: Knuth-multiplied low 32 bits are 0 mod CDC_DIVISOR -> expected chunk
#: length ~= CDC_DIVISOR chars.  Both steps are SQL-expressible
#: (queries.py SQL_CDC_CHUNK_DEDUP replays them exactly).
CDC_WINDOW = 4
CDC_DIVISOR = 64
_CDC_MULT = np.uint64(2654435761)
_CDC_M32 = np.uint64(1 << 32)


def cdc_chunk_spans(text: str):
    """Content-defined chunk spans of ``text``: (starts, ends) arrays of
    0-based code-point offsets, chunk j = text[starts[j]:ends[j]].

    A position ``i`` (1-based end, i >= CDC_WINDOW) closes a chunk when
    the polynomial code-point hash of the window ending at ``i`` — sum
    of cp * 31^k reduced mod 2^32, Knuth-multiplied, mod 2^32 — falls
    below 2^32 / CDC_DIVISOR (the HIGH bits of a multiplicative hash
    are the mixed ones; a low-bits ``% divisor`` test degenerates to a
    function of the window's low bits); the doc end always closes the
    last chunk.
    Content-defined boundaries survive insertions/deletions upstream of
    them, which is why CDC dedup (LBFS, Muthitacharoen et al. SOSP'01;
    FastCDC, Xia et al. ATC'16) catches shifted duplicate regions that
    fixed-size or paragraph chunking miss."""
    n = len(text)
    if n == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    if n < CDC_WINDOW:
        return (np.array([0], dtype=np.int64), np.array([n], dtype=np.int64))
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    s = (cp[:-3] * np.uint64(31 ** 3) + cp[1:-2] * np.uint64(31 ** 2)
         + cp[2:-1] * np.uint64(31) + cp[3:]) % _CDC_M32
    h = (s * _CDC_MULT) % _CDC_M32
    ends = np.nonzero(h < _CDC_M32 // np.uint64(CDC_DIVISOR))[0] + CDC_WINDOW
    ends = ends.astype(np.int64)
    if not len(ends) or ends[-1] != n:
        ends = np.append(ends, n)
    starts = np.concatenate([[0], ends[:-1]])
    return starts, ends


def cdc_chunk_rows(batch: pa.Table) -> pa.Table:
    """Per-doc CDC chunking -> NARROW chunk identity rows: (doc_id,
    start, h = md5-lower of the chunk text, n_chars).  The chunk TEXT
    never leaves the task — downstream first-occurrence dedup exchanges
    16-byte identities only."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_doc, out_start, out_h, out_len = [], [], [], []
    for did, t in zip(doc_ids, texts):
        starts, ends = cdc_chunk_spans(t)
        for a, b in zip(starts.tolist(), ends.tolist()):
            chunk = t[a:b]
            out_doc.append(did)
            out_start.append(a)
            out_h.append(int.from_bytes(
                hashlib.md5(chunk.encode()).digest()[8:16], "little"))
            out_len.append(b - a)
    return pa.table({
        "doc_id": pa.array(out_doc, type=pa.int64()),
        "start": pa.array(out_start, type=pa.int64()),
        "h": pa.array(np.array(out_h, dtype=np.uint64).astype(np.int64),
                      type=pa.int64()),
        "n_chars": pa.array(out_len, type=pa.int64())})


# ---------------------------------------------------------------------------
# Hashed-token Naive-Bayes quality classifier (the GPT-3 / CCNet
# "model-based quality filter" shape: train a cheap linear classifier with
# curated sources as the positive class, score every doc, gate on the
# score). Training is ONE narrow exchange of (feature, count) combiner
# partials; the fitted model is a V-sized weight vector (32 KB at V=4096)
# broadcast via ray.put; scoring is a shuffle-free map_batches pass.
# ---------------------------------------------------------------------------

#: hashed-feature vocabulary size (md5 % NB_V, oracle-reproducible)
NB_V = 4096


def _nb_features(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Flat md5-lower % NB_V feature ids across the batch + per-doc token
    counts. One md5_pair call per batch."""
    from icrawler_ray.stages.dedup import md5_pair

    toks: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        parts = t.split(" ")
        counts[i] = len(parts)
        toks.extend(parts)
    f = (md5_pair(toks)[:, 0] % np.uint64(NB_V)).astype(np.int64)
    return f, counts


def nb_train_partial(batch: pa.Table, text_col: str,
                     good_mask: np.ndarray) -> pa.Table:
    """Per-batch combiner: (f, cg, cb) token-occurrence counts per hashed
    feature, plus one f=-1 row carrying the batch's doc-label counts (for
    the class prior). The exchange moves at most NB_V+1 rows per batch."""
    texts = batch[text_col].to_pylist()
    f, counts = _nb_features(texts)
    doc_good = np.repeat(good_mask, counts)
    cg = np.bincount(f[doc_good], minlength=NB_V)
    cb = np.bincount(f[~doc_good], minlength=NB_V)
    nz = np.flatnonzero(cg | cb)
    return pa.table({
        "f": pa.array(np.r_[nz, -1].astype(np.int64)),
        "cg": pa.array(np.r_[cg[nz], int(good_mask.sum())].astype(np.int64)),
        "cb": pa.array(np.r_[cb[nz],
                             int((~good_mask).sum())].astype(np.int64)),
    })


def nb_fit(parts: "pd.DataFrame") -> tuple[np.ndarray, float]:
    """Reduce summed (f, cg, cb) rows into the per-feature log-odds weight
    vector w[NB_V] (Laplace alpha=1) and the log prior-odds scalar."""
    doc_row = parts[parts["f"] == -1]
    n_good_docs = int(doc_row["cg"].sum())
    n_bad_docs = int(doc_row["cb"].sum())
    feat = parts[parts["f"] >= 0]
    cg = np.zeros(NB_V, dtype=np.float64)
    cb = np.zeros(NB_V, dtype=np.float64)
    cg[feat["f"].to_numpy()] = feat["cg"].to_numpy()
    cb[feat["f"].to_numpy()] = feat["cb"].to_numpy()
    ng, nb = cg.sum(), cb.sum()
    w = (np.log((cg + 1.0) / (ng + NB_V))
         - np.log((cb + 1.0) / (nb + NB_V)))
    prior = float(np.log(n_good_docs / n_bad_docs))
    return w, prior


def nb_score_batch(batch: pa.Table, text_col: str, id_col: str,
                   w: np.ndarray, prior: float) -> pa.Table:
    """Shuffle-free scoring pass: per-doc sum of broadcast feature weights
    (np.add.reduceat over the flat feature array) + the prior."""
    texts = batch[text_col].to_pylist()
    f, counts = _nb_features(texts)
    starts = np.r_[0, np.cumsum(counts)[:-1]]
    s = np.add.reduceat(w[f], starts) + prior if len(f) else \
        np.empty(0, dtype=np.float64)
    return pa.table({
        id_col: batch[id_col],
        "nb_score": pa.array(np.round(s, 6)),
        "pred_good": pa.array(s > 0.0),
    })


def bm25_topk(docs, terms: list[str], *, k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
    """Okapi BM25 (Lucene idf form) top-``k`` documents for a bag of
    query ``terms`` — ranked retrieval over the corpus, the scoring core
    of a decontamination / targeted-harvest sweep.

    Scale shape: ONE pass over the heavy text column extracts a narrow
    integer table (doc_id, dl, tf per term) that is materialized in the
    object store (n_docs x ~48 bytes — spillable, never on the driver);
    corpus stats (N, sum dl, df per term) reduce from one partial row
    per block; scoring re-scans the narrow table with the stats closure
    and each batch keeps only its local top-k (same (score desc, id asc)
    tie-break the final merge ranks by, so truncation can never change
    the merged result — the driver sees n_blocks x k rows).

    Tokens are single-space-delimited (the corpus generator's join
    convention, as token_stats) and tf uses whitespace-boundary
    non-overlapping matches, replicated exactly by the SQL oracle's
    list_filter-over-string_split."""
    import re as _re

    import ray

    pats = [_re.compile(r"(?<!\S)" + _re.escape(t) + r"(?!\S)") for t in terms]
    nt = len(terms)

    def tf_pass(batch: pa.Table) -> pa.Table:
        text = pd.Series(batch["text"].to_pylist())
        cols = {"doc_id": batch["doc_id"],
                "dl": pa.array((text.str.count(" ") + 1).to_numpy(dtype=np.int64))}
        for j, p in enumerate(pats):
            cols[f"tf{j}"] = pa.array(text.str.count(p).to_numpy(dtype=np.int64))
        return pa.table(cols)

    tfd = docs.map_batches(tf_pass, batch_format="pyarrow").materialize()

    def stat_partial(t: pa.Table) -> pa.Table:
        row = {"n": pa.array([t.num_rows], type=pa.int64()),
               "sdl": pa.array([int(np.sum(t["dl"].to_numpy(zero_copy_only=False)))])}
        for j in range(nt):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False)
            row[f"df{j}"] = pa.array([int(np.count_nonzero(tf > 0))])
        return pa.table(row)

    st = tfd.map_batches(stat_partial, batch_format="pyarrow").to_pandas().sum()
    n_docs, avgdl = int(st["n"]), float(st["sdl"]) / int(st["n"])
    # ln(1 + x), NOT log1p: the SQL oracle's ln(1 + ...) must see the
    # identical float64 operation sequence
    idf = [float(np.log(1.0 + (n_docs - int(st[f"df{j}"]) + 0.5)
                        / (int(st[f"df{j}"]) + 0.5))) for j in range(nt)]
    consts_ref = ray.put((idf, avgdl))

    def score_topk(t: pa.Table) -> pa.Table:
        idf_, avgdl_ = ray.get(consts_ref)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        norm = k1 * (1.0 - b + b * (dl / avgdl_))
        score = np.zeros(len(dl))
        for j in range(nt):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False).astype(np.float64)
            score = score + idf_[j] * (tf * (k1 + 1.0)) / (tf + norm)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        top = np.lexsort((ids, -score))[:k]
        return pa.table({"doc_id": pa.array(ids[top]),
                         "score": pa.array(score[top])})

    parts = tfd.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    out = (parts.sort_values(["score", "doc_id"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    out["score"] = np.round(out["score"], 6)
    return out
