"""THE correctness gate (north rule): the distributed frontier crawl must
reproduce the sequential oracle's outputs exactly — span-sequence equality
per doc on (kind, text, media_ref, order), final URL-seen-set equality, and
crawl-order/filename equality — under the same seed list + politeness
budget, at any parallelism and in both execution modes."""

import numpy as np
import pandas as pd
import pytest
import ray

from icrawler_ray.oracle import OracleCrawl
from icrawler_ray.pipelines.greedy import GreedyCrawl, greedy_crawl
from icrawler_ray.stages.politeness import HostPolicy
from icrawler_ray.synthweb.generate import make_synthweb


@pytest.fixture(scope="module")
def small_web():
    return make_synthweb(n_pages=60, n_hosts=3, seed=7)


@pytest.fixture(scope="module")
def small_map(small_web):
    return small_web.url_map()


@pytest.fixture(scope="module")
def small_ref(small_map, ray_session):
    return ray.put(small_map)


@pytest.fixture(scope="module")
def policy(small_web):
    return HostPolicy(small_web.host_policy, round_ms=1000)


@pytest.fixture(scope="module")
def golden(small_map, small_web, policy):
    o = OracleCrawl(small_map, small_web.domains, policy=policy, max_num=25, max_depth=3)
    docs, results = o.run()
    return o, docs, results


def _assert_parity(golden, docs, results):
    oracle, odocs, oresults = golden
    odoc_map = {d["doc_id"]: d["spans"] for d in odocs}
    edf = docs.to_pandas()
    edoc_map = {r.doc_id: [dict(s) for s in r.spans] for r in edf.itertuples()}
    assert set(odoc_map) == set(edoc_map)
    for k in odoc_map:  # span-sequence equality (kind, text, media_ref, order)
        assert edoc_map[k] == odoc_map[k], k
    rdf = results.to_pandas().sort_values("filename")
    assert list(zip(rdf.file_url, rdf.filename)) == [
        (r["file_url"], r["filename"]) for r in oresults
    ]
    assert list(zip(rdf.img_w, rdf.img_h)) == [(r["img_w"], r["img_h"]) for r in oresults]


def test_driver_mode_matches_oracle(small_web, small_ref, policy, golden):
    docs, results, _ = greedy_crawl(
        small_ref, small_web.domains, policy=policy, max_num=25, max_depth=3,
        num_shards=4, mode="driver",
    )
    _assert_parity(golden, docs, results)


def test_dataset_mode_matches_oracle(small_web, small_ref, policy, golden):
    docs, results, _ = greedy_crawl(
        small_ref, small_web.domains, policy=policy, max_num=25, max_depth=3,
        num_shards=2, mode="dataset",
    )
    _assert_parity(golden, docs, results)


def test_seen_set_equality(small_web, small_map, small_ref, policy):
    """Final URL-seen sets equal the oracle's (exact shard mode so filter FP
    can't blur the comparison; cuckoo mode is equal w.h.p. and covered by
    the parity tests above)."""
    from icrawler_ray.functions.urlnorm import hash_urls

    o = OracleCrawl(small_map, small_web.domains, policy=policy, max_num=0, max_depth=2)
    o.run()
    crawl = GreedyCrawl(
        small_ref, small_web.domains, policy=policy, max_num=0, max_depth=2,
        num_shards=2, mode="driver", exact_seen=True,
    )
    try:
        crawl.run()
        expected_pages = set(int(h) for h in hash_urls(sorted(o.seen_pages)))
        expected_files = set(int(h) for h in hash_urls(sorted(o.seen_files)))
        def shard_keys(seen):
            out = set()
            for shard in seen.shards:
                payload = ray.get(shard.serialize.remote())["exact"]
                out |= {int(k) for k in np.frombuffer(payload, dtype=np.uint64)}
            return out

        got_pages = shard_keys(crawl.seen_pages)
        got_files = shard_keys(crawl.seen_files)
        assert got_pages == expected_pages
        assert got_files == expected_files
    finally:
        crawl.shutdown()


def test_resume_equals_fresh(small_web, small_ref, policy, golden, tmp_path):
    c1 = GreedyCrawl(
        small_ref, small_web.domains, policy=policy, max_num=25, max_depth=3,
        num_shards=2, mode="driver", checkpoint_dir=str(tmp_path), max_rounds=2,
    )
    c1.run()
    c1.shutdown()
    c2 = GreedyCrawl(
        small_ref, small_web.domains, policy=policy, max_num=25, max_depth=3,
        num_shards=2, mode="driver", checkpoint_dir=str(tmp_path),
    )
    docs, results, _ = c2.run()
    c2.shutdown()
    assert c2.start_round == 2  # actually resumed, not re-run
    _assert_parity(golden, docs, results)


@pytest.mark.parametrize("mode", ["driver", "dataset"])
def test_shard_actor_death_recovers_in_process(small_web, small_ref, policy, golden,
                                               tmp_path, mode):
    """Kill a seen-shard actor right after the round-1 checkpoint: the
    round loop must detect the actor death (direct ray.get in driver mode;
    wrapped RayTaskError surfacing from the claim-fused parse tasks in
    dataset mode), respawn a fresh shard fleet, rewind to the checkpoint
    IN-PROCESS, and finish with outputs equal to an undisturbed run."""
    import ray

    class FaultyCrawl(GreedyCrawl):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self._killed = False

        def _checkpoint(self, round_idx, metrics):
            super()._checkpoint(round_idx, metrics)
            if round_idx == 1 and not self._killed:
                self._killed = True
                shard = self.seen_pages.shards[0]
                ray.kill(shard)
                # ray.kill is async — block until the actor is actually
                # dead so the NEXT round deterministically observes the
                # failure (otherwise a fast crawl can finish first and
                # the recovery assertion below flakes)
                while True:
                    try:
                        ray.get(shard.stats.remote(), timeout=10)
                    except Exception:  # noqa: BLE001 — RayActorError = dead
                        break

    c = FaultyCrawl(
        small_ref, small_web.domains, policy=policy, max_num=25, max_depth=3,
        num_shards=2, mode=mode, checkpoint_dir=str(tmp_path / mode),
    )
    docs, results, _ = c.run()
    c.shutdown()
    assert c._killed and c._recoveries == 1 and c._seen_gen == 1
    _assert_parity(golden, docs, results)


def test_recovery_equals_resume_with_host_rank(small_web, small_ref, policy, tmp_path):
    """The host-rank counter is deliberately NOT checkpointed (it re-warms
    after resume); in-process fault recovery must follow the same
    semantics — reset, not double-count — so a recovered run's outputs
    EQUAL a fresh-process interrupted+resumed run's."""
    import ray

    kw = dict(policy=policy, max_num=25, max_depth=3, num_shards=2,
              mode="driver", host_rank_priority=True)

    # reference: interrupt at the round-2 boundary, resume in a new object
    c1 = GreedyCrawl(small_ref, small_web.domains, checkpoint_dir=str(tmp_path / "a"),
                     max_rounds=2, **kw)
    c1.run()
    c1.shutdown()
    c2 = GreedyCrawl(small_ref, small_web.domains, checkpoint_dir=str(tmp_path / "a"), **kw)
    rdocs, rres, _ = c2.run()
    c2.shutdown()

    class FaultyCrawl(GreedyCrawl):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self._killed = False

        def _checkpoint(self, round_idx, metrics):
            super()._checkpoint(round_idx, metrics)
            if round_idx == 1 and not self._killed:
                self._killed = True
                shard = self.seen_pages.shards[0]
                ray.kill(shard)
                while True:
                    try:
                        ray.get(shard.stats.remote(), timeout=10)
                    except Exception:  # noqa: BLE001
                        break

    cf = FaultyCrawl(small_ref, small_web.domains, checkpoint_dir=str(tmp_path / "b"), **kw)
    fdocs, fres, _ = cf.run()
    cf.shutdown()
    assert cf._recoveries == 1

    a = rres.to_pandas().sort_values("filename").reset_index(drop=True)
    b = fres.to_pandas().sort_values("filename").reset_index(drop=True)
    assert list(zip(a.file_url, a.filename)) == list(zip(b.file_url, b.filename))
    assert set(rdocs.to_pandas()["doc_id"]) == set(fdocs.to_pandas()["doc_id"])


def test_host_rank_priority_scores_frontier(ray_session):
    """Opt-in link-graph scheduler signal: new frontier rows get priority
    1 + log1p(cumulative admitted in-links of their host); identical in
    driver and dataset round modes (flag off stays oracle-parity, covered
    by every other test in this file)."""
    import math

    import ray

    body = (b'<html><a href="http://b.com/b1.html">1</a>'
            b'<a href="http://b.com/b2.html">2</a>'
            b'<a href="http://b.com/b3.html">3</a>'
            b'<a href="http://c.com/c1.html">4</a></html>')
    m = {"http://a.com": (200, body)}
    for u in ("http://b.com/b1.html", "http://b.com/b2.html",
              "http://b.com/b3.html", "http://c.com/c1.html"):
        m[u] = (200, b"<html>leaf</html>")
    ref = ray.put(m)
    domains = ["a.com", "b.com", "c.com"]

    fronts = {}
    for mode in ("driver", "dataset"):
        c = GreedyCrawl(ref, domains, max_depth=3, max_rounds=1, mode=mode,
                        num_shards=2, host_rank_priority=True)
        c.run()
        f = c._frontier_as_table().to_pandas().sort_values("url").reset_index(drop=True)
        fronts[mode] = f[["url", "host", "priority"]]
        c.shutdown()

    f = fronts["driver"]
    by_host = {h: g["priority"].iloc[0] for h, g in f.groupby("host")}
    assert abs(by_host["b.com"] - (1 + math.log1p(3))) < 1e-12
    assert abs(by_host["c.com"] - (1 + math.log1p(1))) < 1e-12
    pd.testing.assert_frame_equal(fronts["driver"], fronts["dataset"])


def test_parallelism_invariance(small_web, small_ref, policy, golden):
    """Same outputs regardless of shard count / batch sizes (the engine's
    ordering is defined, not emergent — SURVEY.md §4 ordering row)."""
    docs, results, _ = greedy_crawl(
        small_ref, small_web.domains, policy=policy, max_num=25, max_depth=3,
        num_shards=7, mode="driver",
    )
    _assert_parity(golden, docs, results)


def test_retry_path_does_not_change_results(small_web, small_map):
    """Transient transport failures (retried inside the session with <=3
    attempts, T2 / parser.py:82-94) leave stage outputs unchanged; a URL
    failing more than max_retry times becomes an error row."""
    import pyarrow as pa

    from icrawler_ray.stages.fetch_parse import FetchParse

    pages = [u for u in small_web.pages if small_web.page_status[u] == 200][:5]
    batch = pa.table({"url": pages})
    clean = FetchParse(small_map, "greedy", {"domains": small_web.domains})(batch)
    flaky = FetchParse(small_map, "greedy", {"domains": small_web.domains},
                       flaky={pages[0]: 2, pages[1]: 1})(batch)
    assert clean.to_pydict() == flaky.to_pydict()
    dead = FetchParse(small_map, "greedy", {"domains": small_web.domains},
                      flaky={pages[0]: 99})(batch)
    df = dead.to_pandas()
    assert (df[df.page_url == pages[0]].row_kind == "error").all()


# ---------------------------------------------------------------------------
# Depth-boundary claim race (ADVICE r1): within a round, the min-order
# emission of a URL claims its canon BEFORE the depth check (oracle.py
# claimed_links semantics). A depth-capped winner suppresses every later
# same-round emission of that URL but is neither admitted nor marked seen —
# so the URL stays admittable in a LATER round. Both engine modes must match
# the oracle on a web constructed to hit exactly that boundary.

def _depth_race_web():
    """Hand-built web (max_depth=2, per-host budget 1 except c unbounded=1):

    seeds  c.com(seq0) a.com/s1(1) a.com/s2(2) a.com/s3(3) b.com(4)
    r0: fetch c.com,s1,b.com          -> p1(seq5,d1)
    r1: fetch s2,p1                   -> p2a(6,d2) p2(7,d2)
    r2: fetch s3,p2a (p2 deferred)    -> q1(8,d1); p2a emits W: CAPPED claim
        wins (only claim) -> W dropped, NOT seen-marked
    r3: fetch p2(d2,seq7), q1(d1,seq8): both emit X -> p2's capped claim has
        min packed -> X dropped forever (q1's eligible claim loses);
        q1 also emits W (eligible, unseen) -> W admitted (seq9,d2)
    r4: fetch W; its link wy is capped -> frontier drains.

    Oracle doc set: 10 docs, X and wy never fetched. An engine that skips
    capped claims fetches X (11 docs); one that seen-marks capped winners
    never fetches W (9 docs).
    """
    from icrawler_ray.functions.html import render_page

    link = lambda u: ("link", "", u)  # noqa: E731
    text = ("text", "hello", "")
    pages = {
        "http://c.com": [link("http://c.com/p1")],
        "http://a.com/s1": [text],
        "http://a.com/s2": [text],
        "http://a.com/s3": [link("http://b.com/q1")],
        "http://b.com": [text],
        "http://c.com/p1": [link("http://c.com/p2a"), link("http://c.com/p2")],
        "http://c.com/p2a": [link("http://c.com/w")],
        "http://c.com/p2": [link("http://c.com/x")],
        "http://b.com/q1": [link("http://c.com/x"), link("http://c.com/w")],
        "http://c.com/x": [text],
        "http://c.com/w": [link("http://c.com/wy")],
        "http://c.com/wy": [text],
    }
    url_map = {u: (200, render_page(s).encode()) for u, s in pages.items()}
    seeds = ["http://c.com", "http://a.com/s1", "http://a.com/s2",
             "http://a.com/s3", "http://b.com"]
    pol = HostPolicy(
        {h: {"crawl_delay_ms": 1000, "robots_disallow": []} for h in ("a.com", "b.com", "c.com")},
        round_ms=1000,
    )
    return url_map, seeds, pol


@pytest.mark.parametrize("mode", ["driver", "dataset"])
def test_depth_capped_claim_wins_then_url_stays_admittable(mode):
    url_map, seeds, pol = _depth_race_web()
    odocs, _ = OracleCrawl(url_map, seeds, policy=pol, max_num=0, max_depth=2).run()
    oracle_ids = {d["doc_id"] for d in odocs}
    assert "http://c.com/w" in oracle_ids      # re-admitted after capped claim
    assert "http://c.com/x" not in oracle_ids  # capped min-order claim kills it
    assert len(oracle_ids) == 10
    docs, _, _ = greedy_crawl(ray.put(url_map), seeds, policy=pol,
                              max_num=0, max_depth=2, num_shards=2, mode=mode)
    assert set(docs.to_pandas()["doc_id"]) == oracle_ids


def test_max_idle_time_watchdog(ray_session):
    """D10 (downloader.py:195-205): with max_idle_time set, the crawl
    stops after the idle window once rounds stop producing docs/downloads/
    links — here five 404-only seeds on one budget-1 host would otherwise
    burn five zero-progress rounds."""
    seeds = [f"http://a.com/s{i}" for i in range(5)]
    url_map = {u: (404, b"gone") for u in seeds}
    pol = HostPolicy({"a.com": {"crawl_delay_ms": 1000, "robots_disallow": []}},
                     round_ms=1000)
    ref = ray.put(url_map)
    _d, _r, metrics = greedy_crawl(ref, seeds, policy=pol, max_num=0, max_depth=2,
                                   num_shards=2, mode="driver")
    assert len(metrics) == 5  # no watchdog: one idle round per deferred seed
    _d, _r, metrics = greedy_crawl(ref, seeds, policy=pol, max_num=0, max_depth=2,
                                   num_shards=2, mode="driver", max_idle_time=0.0)
    assert len(metrics) == 1 and metrics[-1].get("idle_stop")


def test_delta_checkpoints_resume_across_chain(ray_session, tmp_path):
    """Rounds between full snapshots checkpoint only the inserted-key
    delta (O(novel) bytes, not O(capacity)); resuming from the middle of a
    delta chain replays onto the last full snapshot and continues to the
    same outputs as a fresh run."""
    import os

    web = make_synthweb(n_pages=60, n_hosts=3, seed=7)
    pol = HostPolicy(web.host_policy, round_ms=1000)
    ref = ray.put(web.url_map())
    ck = str(tmp_path / "ck")

    golden, gres, _ = greedy_crawl(ref, web.domains, policy=pol, max_num=25,
                                   max_depth=3, num_shards=2, mode="driver")

    c1 = GreedyCrawl(ref, web.domains, policy=pol, max_num=25, max_depth=3,
                     num_shards=2, mode="driver", checkpoint_dir=ck,
                     seen_full_every=100, max_rounds=3)  # rounds 1-2 = deltas
    c1.run()
    c1.shutdown()
    assert os.path.isfile(os.path.join(ck, "round=0", "seen_pages.parquet"))
    for r in (1, 2):
        assert os.path.isfile(os.path.join(ck, f"round={r}", "seen_pages.delta.parquet"))
        assert not os.path.isfile(os.path.join(ck, f"round={r}", "seen_pages.parquet"))
    # delta files are key-sized, far smaller than the full filter snapshot
    full_sz = os.path.getsize(os.path.join(ck, "round=0", "seen_pages.parquet"))
    delta_sz = os.path.getsize(os.path.join(ck, "round=2", "seen_pages.delta.parquet"))
    assert delta_sz < full_sz / 10

    c2 = GreedyCrawl(ref, web.domains, policy=pol, max_num=25, max_depth=3,
                     num_shards=2, mode="driver", checkpoint_dir=ck,
                     seen_full_every=100)
    docs, results, _ = c2.run()
    c2.shutdown()
    assert c2.start_round == 3  # resumed from the tip of the delta chain
    gdf = golden.to_pandas()
    edf = docs.to_pandas()
    assert set(gdf["doc_id"]) == set(edf["doc_id"])
    grf = gres.to_pandas().sort_values("filename")
    erf = results.to_pandas().sort_values("filename")
    assert list(zip(grf.file_url, grf.filename)) == list(zip(erf.file_url, erf.filename))


def test_checkpoint_pruning_keeps_only_resume_chain(ray_session, tmp_path):
    """After each round's atomic publish, bulky state a resume can no
    longer need is pruned: rounds before the latest full snapshot vanish,
    delta rounds in the live chain lose their frontier snapshot (kept
    only for the tip), while manifest lineage/metrics keep full history."""
    import json
    import os

    web = make_synthweb(n_pages=60, n_hosts=3, seed=7)
    pol = HostPolicy(web.host_policy, round_ms=1000)
    ref = ray.put(web.url_map())
    ck = str(tmp_path / "ck")

    c = GreedyCrawl(ref, web.domains, policy=pol, max_num=25, max_depth=3,
                    num_shards=2, mode="driver", checkpoint_dir=ck,
                    seen_full_every=2)  # fulls at rounds 0, 2, ...
    c.run()
    c.shutdown()
    last = json.load(open(os.path.join(ck, "MANIFEST.json")))["last_round"]
    assert last >= 2
    fulls = [r for r in range(last + 1)
             if os.path.isfile(os.path.join(ck, f"round={r}", "seen_pages.parquet"))]
    last_full = max(f for f in fulls if f <= last)
    for r in range(last_full):  # pre-chain rounds: all checkpoint state gone
        rd = os.path.join(ck, f"round={r}")
        assert not os.path.isdir(os.path.join(rd, "frontier")), r
        assert not any(f.startswith("seen_") for f in os.listdir(rd)), r
    for r in range(last_full, last):  # live chain: seen kept, frontier pruned
        rd = os.path.join(ck, f"round={r}")
        assert any(f.startswith("seen_") for f in os.listdir(rd)), r
        assert not os.path.isdir(os.path.join(rd, "frontier")), r
    # output partitions survive pruning (they are final data, not state)
    assert os.path.isdir(os.path.join(ck, "round=0", "docs"))
    # manifest lineage still records every round
    m = json.load(open(os.path.join(ck, "MANIFEST.json")))
    assert [x["round"] for x in m["lineage"]][:3] == [0, 1, 2]

    # a fresh GreedyCrawl still resumes from the pruned dir
    c2 = GreedyCrawl(ref, web.domains, policy=pol, max_num=25, max_depth=3,
                     num_shards=2, mode="driver", checkpoint_dir=ck,
                     seen_full_every=2)
    c2.run()
    c2.shutdown()
    assert c2.start_round == last + 1


def test_dataset_mode_resume_equals_fresh(small_web, small_ref, policy, golden, tmp_path):
    """Checkpoint/resume parity on the pure-Ray-Data (dataset) round path:
    interrupt after 2 rounds, resume with a new GreedyCrawl, outputs equal
    the fresh golden run (frontier checkpointed via distributed parquet)."""
    c1 = GreedyCrawl(
        small_ref, small_web.domains, policy=policy, max_num=25, max_depth=3,
        num_shards=2, mode="dataset", checkpoint_dir=str(tmp_path), max_rounds=2,
    )
    c1.run()
    c1.shutdown()
    c2 = GreedyCrawl(
        small_ref, small_web.domains, policy=policy, max_num=25, max_depth=3,
        num_shards=2, mode="dataset", checkpoint_dir=str(tmp_path),
    )
    docs, results, _ = c2.run()
    c2.shutdown()
    assert c2.start_round == 2
    _assert_parity(golden, docs, results)


def test_host_rank_sharded_counters_match_dict_and_hold_1e5_hosts(ray_session):
    """Above host_rank_shard_threshold the counter state migrates to
    hash-partitioned shard actors; counts must equal the dict path
    exactly and the driver must hold NO per-host state afterwards —
    exercised at >= 1e5 distinct hosts (the scale the driver dict was
    flagged for)."""
    import numpy as np

    from icrawler_ray.state.hostrank import HostRankState

    rng = np.random.default_rng(3)
    n_hosts = 120_000
    hosts = np.array([f"h{i}.example.com" for i in range(n_hosts)], dtype=object)

    dict_state = HostRankState(shard_threshold=10**9)
    shard_state = HostRankState(shard_threshold=50_000, num_shards=4)
    expect = {}
    for _round in range(3):
        take = rng.integers(0, n_hosts, size=60_000)
        uniq, ns = np.unique(hosts[take], return_counts=True)
        a = dict_state.update_and_counts(uniq, ns)
        b = shard_state.update_and_counts(uniq, ns)
        np.testing.assert_array_equal(a, b)
        for h, n, c in zip(uniq.tolist(), ns.tolist(), a.tolist()):
            expect[h] = expect.get(h, 0) + n
            assert expect[h] == c
    assert shard_state.sharded and shard_state.local == {}  # driver dict gone
    assert not dict_state.sharded
    shard_state.reset()
    dict_state.reset()


def test_host_rank_ds_rewrite_1m_hosts_off_driver(ray_session):
    """VERDICT r4 #4: in sharded mode the per-round distinct-host frame
    must stay a Dataset — rewrite_priorities_ds over a 1M-distinct-host
    round frontier built OFF-driver, with a driver RSS pin (the old path
    pulled the (host, n) frame to the driver: ~100 MB of host strings at
    this scale) and exact priorities spot-checked against the counter
    semantics."""
    import resource

    import numpy as np
    import pyarrow as _pa

    from icrawler_ray.schemas import FRONTIER
    from icrawler_ray.state.hostrank import HostRankState, rewrite_priorities_ds

    n = 1_000_000

    def make_rows(t):
        ids = t["id"].to_numpy()
        z = np.zeros(len(ids))
        return _pa.table({
            "url": _pa.array([f"http://h{i}.com/p" for i in ids]),
            "url_canon": _pa.array([f"http://h{i}.com/p" for i in ids]),
            "url_hash": _pa.array(ids.astype(np.uint64)),
            "host": _pa.array([f"h{i}.com" for i in ids]),
            "depth": _pa.array(np.ones(len(ids), dtype=np.int32)),
            "priority": _pa.array(z + 1.0),
            "discovered_seq": _pa.array(ids.astype(np.int64)),
            "parent_doc_id": _pa.array([""] * len(ids)),
        }, schema=FRONTIER)

    state = HostRankState(shard_threshold=0, num_shards=4)
    state.maybe_migrate(1)
    assert state.sharded and state.local == {}
    # warm-up on a small frame pays Ray Data's one-time driver machinery
    warm = ray.data.range(1000).map_batches(make_rows, batch_format="pyarrow")
    rewrite_priorities_ds(state, warm, FRONTIER).materialize()
    state.reset()
    state = HostRankState(shard_threshold=0, num_shards=4)
    state.maybe_migrate(1)

    frontier = ray.data.range(n).map_batches(make_rows, batch_format="pyarrow")
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    out = rewrite_priorities_ds(state, frontier, FRONTIER).materialize()
    assert out.count() == n
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert (rss1 - rss0) * 1024 < 48 << 20, (
        f"driver RSS grew {(rss1 - rss0) // 1024} MiB in sharded host-rank")
    # each host unique: every priority must be 1 + log1p(1)
    sample = out.limit(500).to_pandas()
    np.testing.assert_allclose(sample["priority"], 1.0 + np.log1p(1.0))
    # second round doubles the counts -> 1 + log1p(2)
    out2 = rewrite_priorities_ds(state, frontier, FRONTIER).materialize()
    sample2 = out2.limit(500).to_pandas()
    np.testing.assert_allclose(sample2["priority"], 1.0 + np.log1p(2.0))
    state.reset()


def test_host_rank_crawl_parity_dict_vs_sharded(ray_session):
    """A host-rank crawl forced onto the sharded-counter path from the
    first round produces the identical frontier priorities as the dict
    path, in both round modes."""
    import ray

    body = (b'<html><a href="http://b.com/b1.html">1</a>'
            b'<a href="http://b.com/b2.html">2</a>'
            b'<a href="http://b.com/b3.html">3</a>'
            b'<a href="http://c.com/c1.html">4</a></html>')
    m = {"http://a.com": (200, body)}
    for u in ("http://b.com/b1.html", "http://b.com/b2.html",
              "http://b.com/b3.html", "http://c.com/c1.html"):
        m[u] = (200, b"<html>leaf</html>")
    ref = ray.put(m)
    domains = ["a.com", "b.com", "c.com"]

    fronts = {}
    for mode in ("driver", "dataset"):
        for thresh in (None, 0):  # None = dict path, 0 = sharded from round 0
            c = GreedyCrawl(ref, domains, max_depth=3, max_rounds=1, mode=mode,
                            num_shards=2, host_rank_priority=True,
                            host_rank_shard_threshold=thresh)
            c.run()
            f = c._frontier_as_table().to_pandas().sort_values("url") \
                .reset_index(drop=True)
            fronts[(mode, thresh)] = f[["url", "host", "priority"]]
            if thresh == 0:
                assert c._host_rank.sharded and c._host_rank.local == {}
            c.shutdown()
    for mode in ("driver", "dataset"):
        pd.testing.assert_frame_equal(fronts[(mode, None)], fronts[(mode, 0)])
    pd.testing.assert_frame_equal(fronts[("driver", 0)], fronts[("dataset", 0)])
