"""Seed sources S2-S7 (feeder expansion semantics, feeder.py / builtin)."""

import datetime

import pytest

from icrawler_ray.sources.seeds import (
    baidu_search_urls,
    bing_search_urls,
    flickr_search_urls,
    google_search_urls,
    simple_se_urls,
    url_list_seeds,
)


def test_url_list_window_and_errors(tmp_path):
    urls = [f"http://a/{i}" for i in range(10)]
    assert url_list_seeds(urls) == urls
    assert url_list_seeds(urls, offset=3, max_num=4) == urls[3:7]
    assert url_list_seeds(urls, offset=8, max_num=100) == urls[8:]
    p = tmp_path / "list.txt"
    p.write_text("\n".join(urls) + "\n")
    assert url_list_seeds(str(p)) == urls
    with pytest.raises(ValueError):
        url_list_seeds(urls, offset=10)
    with pytest.raises(OSError):
        url_list_seeds("/no/such/file.txt")
    with pytest.raises(TypeError):
        url_list_seeds(123)


def test_simple_se_pagination():
    urls = simple_se_urls("http://se/?q={}&p={}", "cat", 0, 50, 20)
    assert urls == ["http://se/?q=cat&p=0", "http://se/?q=cat&p=20", "http://se/?q=cat&p=40"]


def test_google_urls_step100():
    urls = google_search_urls("cat", 0, 250, language="en",
                              filters={"type": "photo"})
    assert len(urls) == 3
    assert "ijn=0" in urls[0] and "start=0" in urls[0]
    assert "ijn=2" in urls[2] and "start=200" in urls[2]
    assert "tbs=itp%3Aphoto" in urls[0] and "lr=lang_en" in urls[0] and "tbm=isch" in urls[0]


def test_bing_urls_step20():
    urls = bing_search_urls("dog", 0, 60, filters={"color": "red"})
    assert len(urls) == 3
    assert urls[0].endswith("&qft=+filterui:color2-FGcls_RED")
    assert "first=40" in urls[2]


def test_baidu_urls_step30():
    urls = baidu_search_urls("x", 0, 90, filters={"size": "large"})
    assert len(urls) == 3
    assert "pn=60" in urls[2] and urls[0].endswith("&z=3")


def test_flickr_urls():
    urls = flickr_search_urls("k", per_page=100)
    assert len(urls) == 40  # ceil(4000/100)
    assert urls[0].endswith("&page=1") and urls[-1].endswith("&page=40")
    urls = flickr_search_urls("k", per_page=1000)
    assert len(urls) == 4
    # date coercion
    urls = flickr_search_urls("k", per_page=2000,
                              min_upload_date=datetime.date(2020, 1, 2))
    assert "min_upload_date=2020-01-02" in urls[0]
    with pytest.raises(ValueError):
        flickr_search_urls("k", bogus_param=1)
    with pytest.raises(ValueError):
        flickr_search_urls("k", min_upload_date=3.14)


def test_sitemap_seeds():
    from icrawler_ray.sources.seeds import sitemap_seeds

    body = """<?xml version="1.0"?>
    <urlset><url><loc>http://a.com/1.html</loc></url>
    <url><loc> http://a.com/2.html </loc><lastmod>2024-01-01</lastmod></url></urlset>"""
    idx = "<sitemapindex><sitemap><loc>http://a.com/s2.xml</loc></sitemap></sitemapindex>"
    assert sitemap_seeds([body, idx]) == [
        "http://a.com/1.html", "http://a.com/2.html", "http://a.com/s2.xml"]


def test_parse_robots_groups_and_policy():
    from icrawler_ray.functions.robots import parse_robots, policy_from_robots

    body = """
    # global comment
    Sitemap: http://h.com/sitemap.xml

    User-agent: *
    Disallow: /private/
    Crawl-delay: 2

    User-agent: raybot
    User-agent: otherbot
    Disallow: /raysecret/
    Disallow:
    Allow: /raysecret/ok/
    Crawl-delay: 0.5
    """
    star = parse_robots(body, agent="someagent")
    assert star["robots_disallow"] == ["/private/"]
    assert star["crawl_delay_ms"] == 2000
    assert star["sitemaps"] == ["http://h.com/sitemap.xml"]
    ray_ = parse_robots(body, agent="raybot/1.0")
    assert ray_["robots_disallow"] == ["/raysecret/"]  # empty Disallow skipped
    assert ray_["allow"] == ["/raysecret/ok/"]
    assert ray_["crawl_delay_ms"] == 500

    pol = policy_from_robots({"h.com": body}, agent="raybot")
    assert pol["h.com"]["robots_disallow"] == ["/raysecret/"]
    assert pol["h.com"]["crawl_delay_ms"] == 500

    # the parsed shape drives the real gate
    from icrawler_ray.stages.politeness import HostPolicy

    hp = HostPolicy(pol, round_ms=1000)
    assert hp.budget("h.com") == 2 and hp.disallowed("h.com") == ["/raysecret/"]
