"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units", ACL).

The corpus-sized step is the word-count extraction — per-batch
(word, count) combiner partials, so the exchange is
distinct-words-per-block, never token-count-sized.  Merge learning then
runs on the VOCABULARY (the standard BPE formulation: the count dict,
not the corpus), which is orders of magnitude smaller than the corpus —
at web scale the vocab itself hash-partitions, but every per-iteration
kernel here is already vectorized pandas/numpy over the vocab frame.

Symbol sequences are encoded as ``|``-delimited strings with leading and
trailing delimiters ("abc" -> "|a|b|c|"), so applying merge (l, r) is a
plain non-regex string replace of ``|l|r|`` with ``|lr|`` — repeated
REP_PASSES times because boundary-sharing occurrences ("|a|a|a|" under
merge (a,a)) are skipped by one non-rescanning left-to-right pass and
picked up by the next.  Repeated passes converge to EXACTLY the classic
left-to-right BPE merge (pinned by test vs a reference implementation),
and the same nested-``replace`` runs verbatim in the DuckDB oracle, so
engine and SQL agree by construction.

No counterpart in /root/reference (the reference crawler has no
tokenizer); this is part of the training-data operator surface.
"""

from __future__ import annotations

import pandas as pd
import ray.data

#: replace passes per merge application.  One pass misses every second
#: occurrence of a boundary-sharing chain, so P passes handle chains of
#: length 2^P; corpus words are bounded far below 2^6 symbols.
REP_PASSES = 6


def word_counts(ds: ray.data.Dataset, text_col: str = "text") -> pd.DataFrame:
    """Corpus -> (word, n) vocabulary via per-batch combiner partials.
    The exchange is distinct-words-per-block-sized."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df[text_col].str.split(" ").explode()
        w = w[w != ""]
        return w.value_counts().rename_axis("w").rename("n").reset_index()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("w", as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out


def _encode_seqs(words: pd.Series) -> pd.Series:
    """word -> '|'-delimited character sequence ('abc' -> '|a|b|c|')."""
    return "|" + words.str.replace("", "|", regex=False).str.strip("|") + "|"


def apply_merge(seqs: pd.Series, left: str, right: str) -> pd.Series:
    """Apply ONE merge to delimited sequences — the nested-replace form
    shared verbatim with the SQL oracle."""
    pat, rep = f"|{left}|{right}|", f"|{left}{right}|"
    for _ in range(REP_PASSES):
        seqs = seqs.str.replace(pat, rep, regex=False)
    return seqs


def pair_counts(seqs: pd.Series, n: pd.Series) -> pd.DataFrame:
    """Adjacent-symbol pair counts weighted by word count, vectorized:
    explode the symbol lists and pair each row with its group-wise
    shift(-1)."""
    syms = seqs.str.strip("|").str.split("|")
    e = pd.DataFrame({"l": syms, "n": n.to_numpy()}).explode("l")
    e["r"] = e.groupby(level=0)["l"].shift(-1)
    e = e.dropna(subset=["r"])
    out = e.groupby(["l", "r"], as_index=False, sort=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out


def fit(vocab: pd.DataFrame, n_merges: int) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Learn ``n_merges`` BPE merges over a (w, n) vocabulary.  Ties
    break (count DESC, left ASC, right ASC).  Returns (merges frame with
    step/l/r/n, final vocab frame with w/s/n where s is the merged
    delimited sequence)."""
    v = vocab.copy()
    v["s"] = _encode_seqs(v["w"])
    merges = []
    for step in range(1, n_merges + 1):
        pc = pair_counts(v["s"], v["n"])
        pc = pc.sort_values(["n", "l", "r"], ascending=[False, True, True],
                            kind="mergesort")
        top = pc.iloc[0]
        merges.append({"step": step, "l": top["l"], "r": top["r"],
                       "n": int(top["n"])})
        v["s"] = apply_merge(v["s"], top["l"], top["r"])
    m = pd.DataFrame(merges)
    m["step"] = m["step"].astype("int64")
    m["n"] = m["n"].astype("int64")
    return m, v


def sym_counts(vocab_seqs: pd.DataFrame) -> dict[str, int]:
    """word -> symbol count map from a fitted vocab frame (w, s)."""
    counts = vocab_seqs["s"].str.strip("|").str.count(r"\|") + 1
    return dict(zip(vocab_seqs["w"], counts.astype(int)))
