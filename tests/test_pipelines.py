"""End-to-end pipelines: urllist (§3.3 minimum slice) and the four
search-engine crawls (§3.1) over the synthetic web."""

import numpy as np
import pandas as pd

from icrawler_ray.functions.urlnorm import canonicalize
from icrawler_ray.pipelines.search import search_crawl
from icrawler_ray.pipelines.urllist import urllist_crawl
from icrawler_ray.synthweb import fakeimg


def test_urllist_end_to_end(web, url_map, url_map_ref):
    out = urllist_crawl(url_map_ref, web.seeds, max_num=1000).to_pandas()
    # expected: unique live decodable seed files, in input order
    seen, expected = set(), []
    for u in web.seeds:
        c = canonicalize(pd.Series([u]))[0]
        if c in seen:
            continue
        seen.add(c)
        status, body = url_map.get(c, url_map.get(u, (404, b"")))
        if 200 <= status < 300 and fakeimg.decode_size(body) is not None:
            expected.append(u)
    got = out.sort_values("dl_seq")
    assert got.file_url.tolist() == expected
    assert got.filename.tolist()[0].startswith("000001.")
    assert (got.img_w > 0).all() and got.success.all()
    # dense sequential numbering
    nums = [int(f.split(".")[0]) for f in got.sort_values("dl_seq").filename]
    assert nums == list(range(1, len(expected) + 1))


def test_urllist_max_num_and_offset(web, url_map_ref):
    out = urllist_crawl(url_map_ref, web.seeds, max_num=5, file_idx_offset=10).to_pandas()
    assert len(out) == 5
    nums = sorted(int(f.split(".")[0]) for f in out.filename)
    assert nums == [11, 12, 13, 14, 15]


def _expected_search_downloads(web, url_map, engine_host, max_num):
    """Replay feeder-order extraction + dedup + keep gates sequentially."""
    expected = []
    seen = set()
    for url in web.search_expected:  # insertion order == feeder order
        if engine_host not in url or "getSizes" in url:
            continue
        for u in web.search_expected[url]:
            c = canonicalize(pd.Series([u]))[0]
            if c in seen:
                continue
            seen.add(c)
            status, body = url_map.get(c, url_map.get(u, (404, b"")))
            if 200 <= status < 300 and fakeimg.decode_size(body) is not None:
                expected.append(u)
            if len(expected) >= max_num:
                return expected
    return expected


def test_search_crawl_each_engine(web, url_map, url_map_ref):
    for engine, host, kwargs in [
        ("google", "google.com", {"keyword": "cat", "max_num": 300}),
        ("bing", "bing.com", {"keyword": "cat", "max_num": 60}),
        ("baidu", "baidu.com", {"keyword": "cat", "max_num": 90}),
        ("flickr", "flickr.com", {"max_num": 25,
                                  "flickr_kwargs": {"per_page": 10, "max_pages": 3}}),
    ]:
        out = search_crawl(url_map_ref, engine, **kwargs).to_pandas().sort_values("dl_seq")
        expected = _expected_search_downloads(web, url_map, host, kwargs["max_num"])
        assert out.file_url.tolist() == expected, engine
        nums = [int(f.split(".")[0]) for f in out.filename]
        assert nums == list(range(1, len(expected) + 1)), engine


def test_search_crawl_1000_cap(url_map_ref):
    from icrawler_ray.pipelines.search import expand_search

    urls, _, _ = expand_search("google", "cat", offset=900, max_num=500)
    assert len(urls) == 1  # clamped to 100 remaining / step 100
    try:
        expand_search("bing", "cat", offset=1200, max_num=10)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_flickr_meta_passthrough(web, url_map_ref):
    out = search_crawl(
        url_map_ref, "flickr", max_num=5,
        flickr_kwargs={"per_page": 10, "max_pages": 1},
    ).to_pandas()
    assert len(out) and out.meta_json.str.contains('"id"').all()
