"""The canonical end-to-end drive from .claude/skills/verify/SKILL.md:
crawl the synthetic web with the Ray engine and assert doc-span and
crawl-order parity against the sequential oracle.  Run from the repo
root: ``python scripts/verify_drive.py``."""

import logging
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import ray
import ray.data


def main() -> None:
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from icrawler_ray.oracle import OracleCrawl
    from icrawler_ray.pipelines.greedy import greedy_crawl
    from icrawler_ray.stages.politeness import HostPolicy
    from icrawler_ray.synthweb.generate import make_synthweb

    web = make_synthweb(n_pages=100, n_hosts=4, seed=42)
    m = web.url_map()
    pol = HostPolicy(web.host_policy, round_ms=1000)
    odocs, oresults = OracleCrawl(m, web.domains, policy=pol, max_num=30,
                                  max_depth=3).run()
    docs, results, _metrics = greedy_crawl(ray.put(m), web.domains,
                                           policy=pol, max_num=30,
                                           max_depth=3, mode="driver")
    odoc_map = {d["doc_id"]: d["spans"] for d in odocs}
    edf = docs.to_pandas()
    edoc_map = {r.doc_id: [dict(s) for s in r.spans] for r in edf.itertuples()}
    assert set(odoc_map) == set(edoc_map)
    for k in odoc_map:
        assert edoc_map[k] == odoc_map[k], k
    rdf = results.to_pandas().sort_values("filename")
    assert list(zip(rdf.file_url, rdf.filename)) == [
        (r["file_url"], r["filename"]) for r in oresults]
    ray.shutdown()
    print("VERIFY PASS: docs/spans/crawl-order == oracle")


if __name__ == "__main__":
    main()
