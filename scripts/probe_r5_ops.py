"""Scale probes for the round-5 fixes: evidence that each VERDICT r4
"What's wrong" item is actually retired at scale.  Mirrors the r3/r4
probe protocol (BASELINE.md scale-trend evidence).

Usage: python scripts/probe_r5_ops.py [probe ...]
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


def _hotkey_dataset(n_hot: int, docs_per_hot: int, n_cold_groups: int,
                    seed: int = 7) -> rd.Dataset:
    """Zipf-ish grouped corpus: ``n_hot`` hot keys of ``docs_per_hot``
    docs each (one planted near-dup pair per key) plus small cold
    groups."""
    rows = []
    for g in range(n_hot):
        base = [f"w{g}_{i}" for i in range(30)]
        rows.append({"doc_id": g * 10_000 + 1, "text": " ".join(base),
                     "source": f"hot{g}"})
        rows.append({"doc_id": g * 10_000 + 2,
                     "text": " ".join(base[:-1] + ["zz"]),
                     "source": f"hot{g}"})
        for v in range(docs_per_hot - 2):
            rows.append({"doc_id": g * 10_000 + 10 + v,
                         "text": " ".join(f"u{g}_{v}_{j}" for j in range(25)),
                         "source": f"hot{g}"})
    for c in range(n_cold_groups):
        for v in range(4):
            rows.append({"doc_id": 90_000_000 + c * 100 + v,
                         "text": " ".join(f"c{c}_{v}_{j}" for j in range(25)),
                         "source": f"cold{c}"})
    rng = np.random.default_rng(seed)
    rng.shuffle(rows)
    return rd.from_pandas(pd.DataFrame(rows)).repartition(32)


def probe_hotkeys() -> dict:
    """VERDICT r4 #1 evidence: wall time of ngram_jaccard_pairs_grouped
    must be ~FLAT in the number of hot keys at fixed data size (one
    grouped-LSH pass), not linear (one full-dataset rescan per key).
    64 hot keys vs 4 hot keys over the same ~26k-doc corpus."""
    from icrawler_ray.stages.dedup import ngram_jaccard_pairs_grouped

    out = {"probe": "hotkeys"}
    # same total doc count both ways: 64x80 hot docs vs 4x1280
    for tag, n_hot, per in (("hot4", 4, 1280), ("hot64", 64, 80)):
        ds = _hotkey_dataset(n_hot, per, n_cold_groups=5_000)
        ds = ds.materialize()
        t0 = time.time()
        pairs = ngram_jaccard_pairs_grouped(ds, threshold=0.6,
                                            hot_group_threshold=50)
        dt = time.time() - t0
        out[tag] = {"n_hot": n_hot, "docs": ds.count(),
                    "pairs": len(pairs), "sec": round(dt, 2)}
    out["ratio_64_over_4"] = round(out["hot64"]["sec"] / out["hot4"]["sec"], 2)
    return out


PROBES = {"hotkeys": probe_hotkeys}


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
