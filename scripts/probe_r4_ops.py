"""Scale probes for the round-4 operator additions: run each new
operator on synthetic input 10-100x the sf0.1 bench scale and report
wall time + output sanity.  Mirrors the round-3 probe protocol
(BASELINE.md scale-trend evidence).

Usage: python scripts/probe_r4_ops.py [probe ...]
Probes: triangle join cdc dsir pca triangle_part hits_part kcore_part
"""

from __future__ import annotations

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def probe_triangle() -> dict:
    """2M-edge power-law-ish multigraph over 200k nodes."""
    from icrawler_ray.stages.linkgraph import triangle_counts

    n = 200_000
    rng = np.random.default_rng(11)
    m = 2_000_000
    # skewed endpoints: hub nodes get a large share of edges
    src = (rng.zipf(1.3, m) - 1) % n
    dst = (src + 1 + (rng.zipf(1.3, m) - 1)) % n
    edges = rd.from_pandas(pd.DataFrame({
        "src": src.astype(np.int64), "dst": dst.astype(np.int64)})
    ).repartition(64)
    t0 = time.time()
    out = triangle_counts(edges, n)
    dt = time.time() - t0
    return {"probe": "triangle", "nodes": n, "edges": m,
            "sec": round(dt, 2), "total_triangles": int(out["tri"].sum()) // 3}


def probe_join() -> dict:
    """5M-row probe side with one key holding 20% of rows (planted hot
    key) joined against a 1M-row build side."""
    from icrawler_ray.stages.joins import salted_hash_join

    rng = np.random.default_rng(5)
    n, nb = 5_000_000, 1_000_000
    keys = rng.integers(0, nb, n)
    hot_mask = rng.random(n) < 0.2
    keys[hot_mask] = 777
    probe = pd.DataFrame({"k": keys.astype(np.int64),
                          "rowid": np.arange(n, dtype=np.int64),
                          "val": rng.random(n)})
    build = pd.DataFrame({"k": np.arange(nb, dtype=np.int64),
                          "grp": (np.arange(nb) % 13).astype(np.int64)})

    def agg(j: pd.DataFrame) -> pd.DataFrame:
        g = j.groupby("grp")["val"]
        return pd.DataFrame({"grp": g.sum().index, "n": g.size().to_numpy(),
                             "s": g.sum().to_numpy()})

    t0 = time.time()
    parts = salted_hash_join(
        rd.from_pandas(probe).repartition(64),
        rd.from_pandas(build).repartition(32),
        "k", salt=16, hot_threshold=100_000, num_partitions=64,
        probe_salt_col="rowid", agg_fn=agg).to_pandas()
    out = parts.groupby("grp").agg(n=("n", "sum"), s=("s", "sum"))
    dt = time.time() - t0
    assert int(out["n"].sum()) == n
    return {"probe": "join", "probe_rows": n, "build_rows": nb,
            "hot_share": 0.2, "sec": round(dt, 2)}


def probe_cdc() -> dict:
    """200k docs (~60 MB text) with planted cross-doc duplicate regions."""
    from icrawler_ray.stages.textfns import cdc_chunk_rows

    n = 200_000

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(int(ids[0]))
        texts = []
        shared = ("a shared boilerplate passage that recurs across the "
                  "corpus with different surroundings " * 3)
        for i in ids:
            body = " ".join(rng.choice(
                ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"],
                40).tolist())
            texts.append(body + " " + shared + " " + body[::-1])
        return pd.DataFrame({"doc_id": ids, "text": texts})

    docs = rd.range(n).map_batches(gen, batch_format="pandas")
    P = 64
    t0 = time.time()
    rows = docs.map_batches(cdc_chunk_rows, batch_format="pyarrow")
    rows = rows.map_batches(
        lambda df: df.assign(part=(df["h"].to_numpy(dtype=np.int64)
                                   % np.int64(P) + P) % P),
        batch_format="pandas")

    def first_of_run(g: pd.DataFrame) -> pd.DataFrame:
        rank = (g["doc_id"].to_numpy(dtype=np.uint64) << np.uint64(32)) \
            | g["start"].to_numpy(dtype=np.uint64)
        o = np.lexsort((rank, g["h"].to_numpy()))
        h_sorted = g["h"].to_numpy()[o]
        kept = np.ones(len(g), dtype=bool)
        kept[1:] = h_sorted[1:] != h_sorted[:-1]
        return pd.DataFrame({"n": [len(g)], "k": [int(kept.sum())]})

    parts = (rows.groupby("part")
             .map_groups(first_of_run, batch_format="pandas")).to_pandas()
    dt = time.time() - t0
    return {"probe": "cdc", "docs": n, "chunks": int(parts["n"].sum()),
            "kept": int(parts["k"].sum()), "sec": round(dt, 2)}


def probe_dsir() -> dict:
    """DSIR passes over 200k synthetic docs."""
    from icrawler_ray.stages.dedup import md5_pair

    n = 200_000
    B = 1024

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(int(ids[0]))
        vocab = np.array([f"tok{i}" for i in range(5000)])
        texts = [" ".join(rng.choice(vocab, 60).tolist()) for _ in ids]
        return pd.DataFrame({"doc_id": ids, "text": texts,
                             "source": np.where(ids % 10 == 0, "tgt", "bg")})

    docs = rd.range(n).map_batches(gen, batch_format="pandas").materialize()

    def pass1(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].str.split(" ").explode()
        uniq, inv = np.unique(ex.to_numpy(), return_inverse=True)
        bk = (md5_pair(uniq)[:, 0] % np.uint64(B)).astype(np.int64)[inv]
        tgt = df["source"].eq("tgt").reindex(ex.index).to_numpy()
        g = pd.DataFrame({"t": tgt, "b": bk}).groupby(["t", "b"]).size()
        gi = g.index.to_frame(index=False)
        return pd.DataFrame({"t": gi["t"].to_numpy(),
                             "b": gi["b"].to_numpy(), "n": g.to_numpy()})

    t0 = time.time()
    parts = docs.map_batches(pass1, batch_format="pandas").to_pandas()
    vec_t = np.zeros(B)
    vec_b = np.zeros(B)
    for t, vec in ((True, vec_t), (False, vec_b)):
        sub = parts[parts["t"] == t].groupby("b")["n"].sum()
        vec[sub.index.to_numpy()] = sub.to_numpy()
    lam = (np.log((vec_t + 1.0) / (vec_t.sum() + B))
           - np.log((vec_b + 1.0) / (vec_b.sum() + B)))
    lam_ref = ray.put(lam)

    def pass2(df: pd.DataFrame) -> pd.DataFrame:
        lam_v = ray.get(lam_ref)
        ex = df["text"].str.split(" ").explode()
        uniq, inv = np.unique(ex.to_numpy(), return_inverse=True)
        bk = (md5_pair(uniq)[:, 0] % np.uint64(B)).astype(np.int64)[inv]
        ssum = pd.Series(lam_v[bk], index=ex.index).groupby(level=0).sum()
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "score": ssum.reindex(df.index).to_numpy()})

    out = docs.map_batches(pass2, batch_format="pandas")
    n_out = out.count()
    dt = time.time() - t0
    return {"probe": "dsir", "docs": n, "scored": n_out, "sec": round(dt, 2)}


def probe_pca() -> dict:
    """PCA combiner over 1M x 64 synthetic embeddings."""
    n, d = 1_000_000, 64

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(int(ids[0]))
        m = rng.standard_normal((len(ids), d))
        m[:, 3] *= 5.0  # dominant direction
        return pd.DataFrame({"vec_id": ids,
                             "embedding": [r.tolist() for r in m]})

    ds = rd.range(n).map_batches(gen, batch_format="pandas").materialize()

    def cov_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.asarray(df["embedding"].tolist())
        c = m.T @ m
        i, j = np.meshgrid(np.arange(d, dtype=np.int64),
                           np.arange(d, dtype=np.int64), indexing="ij")
        return pd.DataFrame({"i": i.ravel(), "j": j.ravel(), "c": c.ravel()})

    t0 = time.time()
    parts = ds.map_batches(cov_partial, batch_format="pandas").to_pandas()
    g = parts.groupby(["i", "j"])["c"].sum()
    C = np.zeros((d, d))
    C[g.index.get_level_values(0), g.index.get_level_values(1)] = g.to_numpy()
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(3):
        v = C @ v
        v /= np.sqrt(np.sum(v * v))
    dt = time.time() - t0
    top = int(np.argmax(np.abs(v)))
    return {"probe": "pca", "rows": n, "dim": d, "sec": round(dt, 2),
            "top_dim": top}




def _big_graph(n=200_000, m=2_000_000, seed=11):
    rng = np.random.default_rng(seed)
    src = (rng.zipf(1.3, m) - 1) % n
    dst = (src + 1 + (rng.zipf(1.3, m) - 1)) % n
    return n, rd.from_pandas(pd.DataFrame({
        "src": src.astype(np.int64),
        "dst": dst.astype(np.int64)})).repartition(64)


def probe_triangle_part() -> dict:
    """Same 2M-edge graph through the partitioned-degree path."""
    from icrawler_ray.stages.linkgraph import triangle_counts

    n, edges = _big_graph()
    t0 = time.time()
    out = triangle_counts(edges, n, deg_mode="partitioned")
    dt = time.time() - t0
    return {"probe": "triangle_part", "nodes": n, "edges": 2_000_000,
            "sec": round(dt, 2), "total_triangles": int(out["tri"].sum()) // 3}


def probe_hits_part() -> dict:
    from icrawler_ray.stages.linkgraph import hits_partitioned

    n, edges = _big_graph()
    t0 = time.time()
    out = hits_partitioned(edges, n, iters=2, num_partitions=64)
    dt = time.time() - t0
    return {"probe": "hits_part", "nodes": n, "edges": 2_000_000,
            "sec": round(dt, 2),
            "top_auth": int(out.sort_values("auth").iloc[-1]["node"])}


def probe_kcore_part() -> dict:
    from icrawler_ray.stages.linkgraph import kcore_membership_partitioned

    n, edges = _big_graph()
    t0 = time.time()
    # sweeps=2 matches the committed BASELINE measurement (59.3 s)
    out = kcore_membership_partitioned(edges, n, k=3, sweeps=2,
                                       num_partitions=64)
    dt = time.time() - t0
    return {"probe": "kcore_part", "nodes": n, "edges": 2_000_000,
            "sweeps": 2, "sec": round(dt, 2),
            "in_core": int(out["in_core"].sum())}




def _tmp_table(name: str, df: pd.DataFrame) -> str:
    """Write a single-table dir shaped like the driver's sf dirs."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="icrawler_ray_probe_")
    # small row groups so Ray's parquet read fans out: a single-row-group
    # file reads as ONE block and serializes every downstream stage
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{d}/{name}.parquet", row_group_size=16_384)
    return d


def _fake_docs(n_docs: int, rng, n_words: int = 50) -> pd.DataFrame:
    vocab = np.array(["key", "agg", "row", "scan", "slow", "fast", "table",
                      "value", "part", "hash", "merge", "batch", "spark",
                      "line", "sort", "window", "query", "stream", "group",
                      "join", "order", "data", "column", "small", "big"])
    words = vocab[rng.integers(0, len(vocab), (n_docs, n_words))]
    texts = [" ".join(w) for w in words]
    # plant near-dup tails: every 40th doc is a 2-word edit of its neighbor
    for i in range(40, n_docs, 40):
        texts[i] = texts[i - 1].replace(texts[i - 1].split()[0], "probe", 1)
    return pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "source": [f"src{i % 20}" for i in range(n_docs)],
    })


def probe_charlm() -> dict:
    """200k docs (~60 MB text) through the char-bigram LM two-pass score."""
    from icrawler_ray.queries import q_charlm_quality

    rng = np.random.default_rng(3)
    docs = _fake_docs(200_000, rng)[["doc_id", "text"]]
    d = _tmp_table("documents", docs)
    import shutil
    try:
        t0 = time.time()
        out = q_charlm_quality(d)
        dt = time.time() - t0
        return {"probe": "charlm", "docs": 200_000, "sec": round(dt, 2),
                "mean_nll": round(float(out["nll"].mean()), 4)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_incr() -> dict:
    """200k docs (5% new shard) through the incremental band-dedup gate."""
    from icrawler_ray.stages.dedup import incremental_band_dedup

    rng = np.random.default_rng(7)
    docs = _fake_docs(200_000, rng)
    ds = rd.from_pandas(docs).repartition(64)
    t0 = time.time()
    out = incremental_band_dedup(ds, new_source="src18")
    dt = time.time() - t0
    return {"probe": "incr_dedup", "docs": 200_000,
            "new_shard": int(len(out)), "dups": int(out["is_dup"].sum()),
            "sec": round(dt, 2)}


def probe_prank() -> dict:
    """5M-row percent-rank (window function) over 5 partitions."""
    from icrawler_ray.queries import q_percent_rank

    rng = np.random.default_rng(13)
    n = 5_000_000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": np.array(["en", "de", "fr", "es", "zh"])[rng.integers(0, 5, n)],
        "n_chars": rng.integers(40, 600, n).astype(np.int64),
    })
    d = _tmp_table("documents", df)
    import shutil
    try:
        t0 = time.time()
        out = q_percent_rank(d)
        dt = time.time() - t0
        assert len(out) == n
        return {"probe": "percent_rank", "rows": n, "sec": round(dt, 2)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_transitions() -> dict:
    """5M events / 100k users through the LAG-transition counter."""
    from icrawler_ray.queries import q_event_transitions

    rng = np.random.default_rng(17)
    n = 5_000_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 100_000, n).astype(np.int64),
        "ts": pd.to_datetime(1_700_000_000_000_000
                             + rng.integers(0, 10**12, n), unit="us"),
        "event_type": np.array(["view", "click", "buy", "share", "exit"]
                               )[rng.integers(0, 5, n)],
    })
    d = _tmp_table("events", df)
    import shutil
    try:
        t0 = time.time()
        out = q_event_transitions(d)
        dt = time.time() - t0
        return {"probe": "transitions", "events": n,
                "pairs": int(out["n"].sum()), "sec": round(dt, 2)}
    finally:
        shutil.rmtree(d, ignore_errors=True)




def probe_countmin() -> dict:
    """200k docs (~10M token stream) through the CMS build + queries."""
    from icrawler_ray.queries import q_countmin_freq

    rng = np.random.default_rng(23)
    docs = _fake_docs(200_000, rng)[["text"]].assign(
        doc_id=np.arange(200_000, dtype=np.int64))
    d = _tmp_table("documents", docs)
    import shutil
    try:
        t0 = time.time()
        out = q_countmin_freq(d)
        dt = time.time() - t0
        return {"probe": "countmin", "docs": 200_000,
                "max_overcount": int((out["est"] - out["exact"]).max()),
                "sec": round(dt, 2)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_precedence() -> dict:
    """1M docs with heavy opening-prefix collisions through the
    source-precedence winner combiner."""
    from icrawler_ray.queries import q_precedence_dedup

    rng = np.random.default_rng(29)
    n = 1_000_000
    prefixes = [f"tpl{i} head word" for i in range(5_000)]
    texts = [prefixes[i % 5_000] + f" body {i}" for i in range(n)]
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts,
                         "source": [f"src{i % 20}" for i in range(n)]})
    d = _tmp_table("documents", docs)
    import shutil
    try:
        t0 = time.time()
        out = q_precedence_dedup(d)
        dt = time.time() - t0
        assert len(out) == 5_000
        return {"probe": "precedence", "docs": n, "keys": 5_000,
                "sec": round(dt, 2)}
    finally:
        shutil.rmtree(d, ignore_errors=True)




def probe_refinery() -> dict:
    """200k docs through the full five-stage refinery composition."""
    from icrawler_ray.queries import q_corpus_refinery

    rng = np.random.default_rng(31)
    docs = _fake_docs(200_000, rng)
    docs["lang"] = np.array(["en", "de", "fr", "es", "zh"])[
        rng.integers(0, 5, len(docs))]
    docs["n_chars"] = docs["text"].str.len().astype(np.int64)
    d = _tmp_table("documents", docs[["doc_id", "text", "lang", "n_chars"]])
    import shutil
    try:
        t0 = time.time()
        out = q_corpus_refinery(d)
        dt = time.time() - t0
        return {"probe": "refinery", "docs": 200_000,
                "survivors": int(len(out)), "sec": round(dt, 2)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_snm() -> dict:
    """200k docs through sorted-neighborhood window pairs."""
    from icrawler_ray.stages.dedup import sorted_neighborhood_pairs

    rng = np.random.default_rng(37)
    docs = _fake_docs(200_000, rng)
    docs["n_chars"] = docs["text"].str.len().astype(np.int64)
    ds = rd.from_pandas(docs).repartition(64)
    t0 = time.time()
    out = sorted_neighborhood_pairs(ds, ["n_chars"], window=4, threshold=0.9)
    dt = time.time() - t0
    return {"probe": "snm", "docs": 200_000, "pairs": int(len(out)),
            "sec": round(dt, 2)}


def probe_bpe() -> dict:
    """200k docs (~60 MB text) through BPE training (3 merges) and
    corpus encoding."""
    from icrawler_ray.queries import q_bpe_encode, q_bpe_merges

    rng = np.random.default_rng(21)
    docs = _fake_docs(200_000, rng)[["doc_id", "text"]]
    d = _tmp_table("documents", docs)
    import shutil
    try:
        t0 = time.time()
        merges = q_bpe_merges(d)
        t_fit = time.time() - t0
        t0 = time.time()
        enc = q_bpe_encode(d)
        t_enc = time.time() - t0
        return {"probe": "bpe", "docs": 200_000,
                "fit_sec": round(t_fit, 2), "encode_sec": round(t_enc, 2),
                "top_merge": f"{merges.iloc[0]['l']}+{merges.iloc[0]['r']}",
                "mean_syms": round(float(enc["n_syms"].mean()), 1)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_pii() -> dict:
    """200k docs through the three-pattern PII redaction pass."""
    from icrawler_ray.queries import q_pii_redact

    rng = np.random.default_rng(22)
    docs = _fake_docs(200_000, rng)[["doc_id", "text"]]
    d = _tmp_table("documents", docs)
    import shutil
    try:
        t0 = time.time()
        out = q_pii_redact(d)
        dt = time.time() - t0
        return {"probe": "pii", "docs": 200_000, "sec": round(dt, 2),
                "redacted": int(out[["n_emails", "n_phones", "n_ips"]].sum().sum())}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_pq() -> dict:
    """200k x 64-dim vectors through PQ codebook training + ADC top-k
    for 16 queries."""
    from icrawler_ray.stages.similarity import pq_topk

    rng = np.random.default_rng(23)
    n, dim = 200_000, 64
    x = rng.normal(0, 1, (n, dim))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [r.tolist() for r in x]})
    ds = rd.from_pandas(df).repartition(64)
    queries = x[:16]
    t0 = time.time()
    out = pq_topk(ds, queries, k=5, m=8, k_codes=16, n_iter=2,
                  query_ids=np.arange(16))
    dt = time.time() - t0
    return {"probe": "pq", "vectors": n, "dim": dim, "sec": round(dt, 2),
            "rows": int(len(out))}


def probe_substring() -> dict:
    """200k docs through exact duplicated-substring removal."""
    from icrawler_ray.queries import q_substring_dedup

    rng = np.random.default_rng(41)
    docs = _fake_docs(200_000, rng)[["doc_id", "text"]]
    d = _tmp_table("documents", docs)
    import shutil
    try:
        t0 = time.time()
        out = q_substring_dedup(d)
        dt = time.time() - t0
        return {"probe": "substring", "docs": 200_000, "sec": round(dt, 2),
                "rows": int(len(out))}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_nb() -> dict:
    """200k docs through NB train + score + the calibration rollup."""
    from icrawler_ray.queries import q_nb_calibration

    rng = np.random.default_rng(43)
    docs = _fake_docs(200_000, rng)
    docs["source"] = np.where(np.arange(len(docs)) % 5 == 0, "cur0",
                              docs["source"])
    d = _tmp_table("documents", docs[["doc_id", "text", "source"]])
    import shutil
    try:
        t0 = time.time()
        out = q_nb_calibration(d)
        dt = time.time() - t0
        return {"probe": "nb_calibration", "docs": 200_000,
                "sec": round(dt, 2), "bins": int(len(out))}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_refinery_paired() -> dict:
    """Scale-trend evidence: the five-stage refinery at 200k THEN 1M
    docs in the SAME process (identical host state), reporting per-doc
    wall time at both scales."""
    from icrawler_ray.queries import q_corpus_refinery

    import shutil

    out = {"probe": "refinery_paired"}
    for n in (200_000, 1_000_000):
        rng = np.random.default_rng(31)
        docs = _fake_docs(n, rng)
        docs["lang"] = np.array(["en", "de", "fr", "es", "zh"])[
            rng.integers(0, 5, len(docs))]
        docs["n_chars"] = docs["text"].str.len().astype(np.int64)
        d = _tmp_table("documents", docs[["doc_id", "text", "lang", "n_chars"]])
        try:
            t0 = time.time()
            res = q_corpus_refinery(d)
            dt = time.time() - t0
            out[f"sec_{n}"] = round(dt, 2)
            out[f"us_per_doc_{n}"] = round(dt / n * 1e6, 2)
            out[f"survivors_{n}"] = int(len(res))
        finally:
            shutil.rmtree(d, ignore_errors=True)
    return out


def _fake_events(n: int, rng, n_users: int = 100_000) -> pd.DataFrame:
    base = np.int64(1_700_000_000_000_000)
    ts = base + np.cumsum(rng.integers(0, 2_000_000, n))  # arrival-ordered
    # 2% of events arrive very late (event time far behind the watermark)
    late = rng.random(n) < 0.02
    ts = np.where(late, ts - rng.integers(3_600, 86_400, n) * 1_000_000, ts)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us"),
        "user_id": (rng.zipf(1.4, n) - 1) % n_users,  # skewed key
        "event_type": [f"t{i % 5}" for i in range(n)],
    })


def probe_mmpack() -> dict:
    """2M docs through the multimodal tape pack (prefix sum + seq reduce)."""
    from icrawler_ray.queries import q_multimodal_pack

    import shutil
    rng = np.random.default_rng(21)
    d = _tmp_table("documents", _fake_docs(2_000_000, rng)[["doc_id", "text"]])
    try:
        t0 = time.time()
        out = q_multimodal_pack(d).to_pandas()
        dt = time.time() - t0
        return {"probe": "mmpack", "docs": 2_000_000, "seqs": int(len(out)),
                "sec": round(dt, 2)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_late() -> dict:
    """10M-event watermark lateness audit (prefix-max scan)."""
    from icrawler_ray.queries import q_late_events

    import shutil
    rng = np.random.default_rng(22)
    d = _tmp_table("events", _fake_events(10_000_000, rng))
    try:
        t0 = time.time()
        out = q_late_events(d)
        dt = time.time() - t0
        return {"probe": "late_events", "events": 10_000_000,
                "late": int(out["n_late"].sum()), "sec": round(dt, 2)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_skew() -> dict:
    """10M-event key-skew audit (zipf user key, ~n_users distinct)."""
    from icrawler_ray.queries import q_skew_audit

    import shutil
    rng = np.random.default_rng(23)
    d = _tmp_table("events", _fake_events(10_000_000, rng))
    try:
        t0 = time.time()
        out = q_skew_audit(d)
        dt = time.time() - t0
        return {"probe": "skew_audit", "events": 10_000_000,
                "n_keys": int(out["n_keys"][0]), "gini": float(out["gini"][0]),
                "top1": float(out["top1_share"][0]), "sec": round(dt, 2)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_lpa() -> dict:
    """2M-edge zipf graph over 200k nodes, 3 LPA sweeps."""
    from icrawler_ray.stages.linkgraph import label_propagation

    n = 200_000
    rng = np.random.default_rng(24)
    m = 2_000_000
    src = (rng.zipf(1.3, m) - 1) % n
    dst = (src + 1 + (rng.zipf(1.3, m) - 1)) % n
    edges = rd.from_pandas(pd.DataFrame({
        "src": src.astype(np.int64), "dst": dst.astype(np.int64)})
    ).repartition(64)
    t0 = time.time()
    labels = label_propagation(edges, n, iters=3)
    dt = time.time() - t0
    import collections
    ncomm = len(collections.Counter(labels.tolist()))
    return {"probe": "lpa", "nodes": n, "edges": m, "communities": ncomm,
            "sec": round(dt, 2)}


def probe_editverify() -> dict:
    """500k docs through the SNM + vectorized-Levenshtein verify join."""
    from icrawler_ray.stages.dedup import snm_edit_pairs

    rng = np.random.default_rng(25)
    docs = _fake_docs(500_000, rng)
    docs["n_chars"] = docs["text"].str.len().astype(np.int64)
    ds = rd.from_pandas(docs).repartition(64)
    t0 = time.time()
    out = snm_edit_pairs(ds, ["n_chars"], window=4, prefix_len=24, max_dist=14)
    dt = time.time() - t0
    return {"probe": "edit_verify", "docs": 500_000, "pairs": int(len(out)),
            "sec": round(dt, 2)}


def probe_cumusers() -> dict:
    """10M events / 100k zipf users through the running-distinct curve."""
    from icrawler_ray.queries import q_cumulative_users

    import shutil
    rng = np.random.default_rng(27)
    d = _tmp_table("events", _fake_events(10_000_000, rng))
    try:
        t0 = time.time()
        out = q_cumulative_users(d)
        dt = time.time() - t0
        return {"probe": "cumulative_users", "events": 10_000_000,
                "days": int(len(out)), "users": int(out["cum_users"].iloc[-1]),
                "sec": round(dt, 2)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_qblend() -> dict:
    """2M docs through the two-mode percent-rank ensemble blend."""
    from icrawler_ray.queries import q_quantile_blend

    import shutil
    rng = np.random.default_rng(28)
    docs = _fake_docs(2_000_000, rng)[["doc_id", "text"]]
    docs["n_chars"] = docs["text"].str.len().astype(np.int64)
    d = _tmp_table("documents", docs)
    try:
        t0 = time.time()
        out = q_quantile_blend(d)
        dt = time.time() - t0
        return {"probe": "quantile_blend", "docs": 2_000_000,
                "sec": round(dt, 2),
                "blend_max": round(float(out["blend"].max()), 4)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_outer() -> dict:
    """5M-order x 1M-customer LEFT OUTER rollup (partitioned merge)."""
    from icrawler_ray.queries import q_left_outer_orders

    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(26)
    n, nc = 5_000_000, 1_000_000
    d = tempfile.mkdtemp(prefix="icrawler_ray_probe_")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "o_custkey": rng.integers(0, nc, n).astype(np.int64),
        "o_totalprice": rng.random(n) * 1000.0}), preserve_index=False),
        f"{d}/orders.parquet", row_group_size=262_144)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "c_custkey": np.arange(nc, dtype=np.int64),
        "c_acctbal": rng.random(nc) * 100.0}), preserve_index=False),
        f"{d}/customer.parquet", row_group_size=262_144)
    try:
        t0 = time.time()
        out = q_left_outer_orders(d).to_pandas()
        dt = time.time() - t0
        return {"probe": "left_outer", "orders": n, "customers": nc,
                "zero_order_customers": int((out["n_orders"] == 0).sum()),
                "sec": round(dt, 2)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


PROBES = {"triangle": probe_triangle, "join": probe_join, "cdc": probe_cdc,
          "bpe": probe_bpe, "pii": probe_pii, "pq": probe_pq,
          "substring": probe_substring, "nb": probe_nb,
          "refinery_paired": probe_refinery_paired,
          "dsir": probe_dsir, "pca": probe_pca,
          "triangle_part": probe_triangle_part, "hits_part": probe_hits_part,
          "kcore_part": probe_kcore_part,
          "charlm": probe_charlm, "incr": probe_incr,
          "prank": probe_prank, "transitions": probe_transitions,
          "countmin": probe_countmin, "precedence": probe_precedence,
          "refinery": probe_refinery, "snm": probe_snm,
          "mmpack": probe_mmpack, "late": probe_late, "skew": probe_skew,
          "lpa": probe_lpa, "editverify": probe_editverify,
          "cumusers": probe_cumusers, "qblend": probe_qblend,
          "outer": probe_outer}


def main() -> None:
    import json
    import logging

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        print(json.dumps(PROBES[name]()), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
