"""Parser rules P2-P7 against the synthetic search fixtures (each in its
engine's native response format, FIXTURES.md §6)."""

from icrawler_ray.stages.parsers import BaiduRules, BingRules, FlickrRules, GoogleRules, GreedyRules
from icrawler_ray.synthweb.fetchstub import StubResponse, StubSession


def _tasks(emissions):
    return [e[1] for e in emissions if e[0] == "task"]


def test_google_parse(web, url_map):
    rules = GoogleRules()
    checked = 0
    for url, expected in web.search_expected.items():
        if "google.com" not in url:
            continue
        _, emissions = rules.parse(StubResponse(url, 200, web.search_pages[url]))
        assert _tasks(emissions) == expected
        checked += 1
    assert checked >= 3


def test_google_first_script_wins_and_escape():
    body = b'<script>var a=1</script><script>["http://x/a.jpg","http://x/b.png"]</script><script>["http://x/c.jpg"]</script>'
    _, em = GoogleRules().parse(StubResponse("u", 200, body))
    assert _tasks(em) == ["http://x/a.jpg", "http://x/b.png"]
    # unicode-escape decoding (google.py:164)
    body = b'<script>["http://x/a\\u003db.jpg"]</script>'
    _, em = GoogleRules().parse(StubResponse("u", 200, body))
    assert _tasks(em) == ["http://x/a=b.jpg"]


def test_bing_parse(web, url_map):
    rules = BingRules()
    checked = 0
    for url, expected in web.search_expected.items():
        if "bing.com" not in url:
            continue
        _, emissions = rules.parse(StubResponse(url, 200, web.search_pages[url]))
        assert _tasks(emissions) == expected
        checked += 1
    assert checked >= 3


def test_bing_missing_m_attr_skipped():
    body = (
        b'<div class="imgpt"><a>no m</a></div>'
        b'<div class="imgpt"><a m="{&quot;murl&quot;:&quot;http://x/a.jpg&quot;}">y</a></div>'
    )
    _, em = BingRules().parse(StubResponse("u", 200, body))
    assert _tasks(em) == ["http://x/a.jpg"]


def test_baidu_parse(web, url_map):
    rules = BaiduRules()
    checked = 0
    for url, expected in web.search_expected.items():
        if "baidu.com" not in url:
            continue
        _, emissions = rules.parse(StubResponse(url, 200, web.search_pages[url]))
        assert _tasks(emissions) == expected
        checked += 1
    assert checked >= 3
    # malformed json -> no tasks (baidu.py:133-135)
    assert BaiduRules().parse(StubResponse("u", 200, b"not json"))[1] == []


def test_flickr_parse_with_secondary_fetch(web, url_map):
    session = StubSession(url_map)
    rules = FlickrRules(apikey="stub-key")
    checked = 0
    for url, expected in web.search_expected.items():
        if "flickr.com" not in url or "getSizes" in url:
            continue
        _, emissions = rules.parse(StubResponse(url, 200, web.search_pages[url]), session=session)
        assert _tasks(emissions) == expected
        assert all(e[2] for e in emissions if e[0] == "task")  # meta_json filled
        checked += 1
    assert checked >= 3


def test_greedy_parse_emission_order_and_spans():
    body = (
        '<p>intro</p>'
        '<a href="/p/1.html">l1</a>'
        '<img src="http://img/a.jpg"/>'
        '<a href="http://h0.example.com/p/2.html">l2</a>'
        '<img src="//img/b.png"/>'
        '<a href="http://img/c.gif">imglink</a>'
        '<a href="http://other.com/x.html">off</a>'
    )
    rules = GreedyRules(["http://h0.example.com"])
    spans, emissions = rules.parse(StubResponse("http://h0.example.com/p/0.html", 200, body.encode()))
    # spans: document order, raw refs
    assert [s[0] for s in spans] == ["text", "link", "media", "link", "media", "link", "link"]
    assert spans[4] == ("media", "", "//img/b.png")
    # emissions: ALL img tasks first (doc order, // fixed up), then href walk
    assert emissions == [
        ("task", "http://img/a.jpg", ""),
        ("task", "http://img/b.png", ""),
        ("link", "http://h0.example.com/p/1.html", ""),
        ("link", "http://h0.example.com/p/2.html", ""),
        ("task", "http://img/c.gif", ""),
    ]


def test_flickr_deferred_sizes_stage_matches_nested_and_batches_roundtrips(web, url_map):
    """SURVEY P6 fan-out: defer_sizes parse emits photo rows with NO
    session traffic; the FlickrSizes stage resolves a whole batch in ONE
    measured round-trip and yields the identical task set (url, meta) in
    the identical order as the reference's nested per-photo fetch."""
    import pyarrow as pa

    from icrawler_ray.stages.parsers import FlickrSizes

    nested_session = StubSession(url_map)
    nested = FlickrRules(apikey="stub-key")
    deferred = FlickrRules(apikey="stub-key", defer_sizes=True)
    checked = 0
    for url in web.search_expected:
        if "flickr.com" not in url or "getSizes" in url:
            continue
        _, em_nested = nested.parse(
            StubResponse(url, 200, web.search_pages[url]), session=nested_session)
        _, em_photo = deferred.parse(
            StubResponse(url, 200, web.search_pages[url]), session=None)
        assert all(e[0] == "photo" for e in em_photo)
        n_photos = len(em_photo)
        if n_photos < 2:
            continue
        batch = pa.table({
            "row_kind": ["photo"] * n_photos,
            "file_url": [e[1] for e in em_photo],
            "meta_json": [e[2] for e in em_photo],
            "parent_seq": list(range(n_photos)),
        })
        stage = FlickrSizes(url_map)
        out = stage(batch)
        # one batched round-trip for the whole photo batch, vs one per
        # photo on the nested path
        assert stage.session.request_count == 1
        assert nested_session.request_count >= n_photos
        got = list(zip(out["file_url"].to_pylist(), out["meta_json"].to_pylist()))
        want = [(e[1], e[2]) for e in em_nested if e[0] == "task"]
        assert got == want
        assert out["row_kind"].to_pylist() == ["task"] * len(want)
        nested_session = StubSession(url_map)  # reset counter per page
        checked += 1
    assert checked >= 3
