"""THE correctness gate (north rule): the distributed frontier crawl must
reproduce the sequential oracle's outputs exactly — span-sequence equality
per doc on (kind, text, media_ref, order), final URL-seen-set equality, and
crawl-order/filename equality — under the same seed list + politeness
budget, at any parallelism and in both execution modes."""

import numpy as np
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
