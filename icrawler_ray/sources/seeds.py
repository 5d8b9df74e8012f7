"""Seed sources (SURVEY.md §2.1, S1-S8).

The reference's feeders are threads pushing URL strings onto a queue
(/root/reference/icrawler/feeder.py). Here every feeder is a *pure
plan-time expansion* returning the full seed list (they are all bounded:
pagination caps of 1000/4000 results — google.py:190-202, flickr.py:12-14),
wrapped into a ``ray.data.Dataset`` by :func:`seed_dataset`. Unbounded
frontier iteration (GreedyFeeder's parking loop, greedy.py:10-15) becomes
the explicit driver round loop in pipelines/greedy.py.
"""

from __future__ import annotations

import datetime
import math
import os.path as osp
from urllib.parse import urlencode

import ray.data

from icrawler_ray.functions.filters import baidu_filter, bing_filter, google_filter

# Flickr search-param whitelist (/root/reference/icrawler/builtin/flickr.py:16-45)
FLICKR_PARAMS = frozenset(
    [
        "user_id", "tags", "tag_mode", "text", "license", "sort", "privacy_filter",
        "accuracy", "safe_search", "content_type", "machine_tags", "machine_tag_mode",
        "group_id", "contacts", "woe_id", "place_id", "has_geo", "geo_context",
        "lat", "lon", "radius", "radius_units", "is_commons", "in_gallery",
        "is_getty", "extras", "per_page", "page", "color_codes", "styles", "orientation",
    ]
)
FLICKR_DATE_PARAMS = frozenset(
    ["min_upload_date", "max_upload_date", "min_taken_date", "max_taken_date"]
)


def url_list_seeds(url_list, offset: int = 0, max_num: int = 0) -> list[str]:
    """UrlListFeeder semantics (/root/reference/icrawler/feeder.py:47-70):
    a filename (one URL per line) or a list; offset/max_num window with the
    reference's exact validation errors."""
    if isinstance(url_list, str):
        if osp.isfile(url_list):
            with open(url_list) as fin:
                url_list = [line.rstrip("\n") for line in fin]
        else:
            raise OSError(f"url list file {url_list} not found")
    elif not isinstance(url_list, list):
        raise TypeError('"url_list" can only be a filename or a str list')
    if offset < 0 or offset >= len(url_list):
        raise ValueError('"offset" exceed the list length')
    end = min(len(url_list), offset + max_num) if max_num > 0 else len(url_list)
    return list(url_list[offset:end])


def simple_se_urls(url_template: str, keyword: str, offset: int, max_num: int,
                   page_step: int) -> list[str]:
    """SimpleSEFeeder (/root/reference/icrawler/feeder.py:73-89)."""
    return [url_template.format(keyword, i) for i in range(offset, offset + max_num, page_step)]


def google_search_urls(keyword: str, offset: int = 0, max_num: int = 1000,
                       language: str | None = None, filters: dict | None = None) -> list[str]:
    """GoogleFeeder (/root/reference/icrawler/builtin/google.py:131-141):
    pagination step 100 (ijn/start), tbs filter string with sep=",",
    optional lr=lang_xx."""
    filter_str = google_filter().apply(filters, sep=",")
    urls = []
    for i in range(offset, offset + max_num, 100):
        params = {"q": keyword, "ijn": int(i / 100), "start": i, "tbs": filter_str, "tbm": "isch"}
        if language:
            params["lr"] = "lang_" + language
        urls.append("https://www.google.com/search?" + urlencode(params))
    return urls


def bing_search_urls(keyword: str, offset: int = 0, max_num: int = 1000,
                     filters: dict | None = None) -> list[str]:
    """BingFeeder (/root/reference/icrawler/builtin/bing.py:105-114):
    pagination step 20, ``&qft=`` filter suffix."""
    filter_str = bing_filter().apply(filters)
    suffix = ("&qft=" + filter_str) if filter_str else ""
    return [
        f"https://www.bing.com/images/async?q={keyword}&first={i}" + suffix
        for i in range(offset, offset + max_num, 20)
    ]


def baidu_search_urls(keyword: str, offset: int = 0, max_num: int = 1000,
                      filters: dict | None = None) -> list[str]:
    """BaiduFeeder (/root/reference/icrawler/builtin/baidu.py:69-78):
    pagination step 30, filters joined with "&"."""
    filter_str = baidu_filter().apply(filters, sep="&")
    urls = []
    for i in range(offset, offset + max_num, 30):
        url = f"http://image.baidu.com/search/acjson?tn=resultjson_com&ipn=rj&word={keyword}&pn={i}&rn=30"
        if filter_str:
            url += "&" + filter_str
        urls.append(url)
    return urls


def flickr_search_urls(apikey: str, max_num: int = 4000, per_page: int | None = None,
                       max_pages: int | None = None, **kwargs) -> list[str]:
    """FlickrFeeder (/root/reference/icrawler/builtin/flickr.py:11-78):
    param whitelist, date coercion (datetime.date -> %Y-%m-%d), 4000-result
    cap, pages = ceil(4000/per_page). Unknown params raise (the reference
    only logs; eager validation is this engine's plan-time stance)."""
    max_num = min(max_num, 4000)
    params = {"method": "flickr.photos.search", "api_key": apikey, "format": "json",
              "nojsoncallback": 1}
    if per_page is not None:
        kwargs["per_page"] = per_page
    for key, val in kwargs.items():
        if key in FLICKR_PARAMS:
            params[key] = val
        elif key in FLICKR_DATE_PARAMS:
            if isinstance(val, datetime.date):
                params[key] = val.strftime("%Y-%m-%d")
            elif isinstance(val, (int, str)):
                params[key] = val
            else:
                raise ValueError(f"{key} is invalid")
        else:
            raise ValueError(f"Unrecognized search param: {key}")
    url = "https://api.flickr.com/services/rest/?" + urlencode(params)
    pp = params.get("per_page", 100)
    page = params.get("page", 1)
    page_max = int(math.ceil(4000.0 / pp))
    if max_pages is not None:
        page_max = min(page_max, max_pages)
    return [f"{url}&page={i}" for i in range(page, page + page_max)]


def seed_dataset(urls: list[str], *, override_num_blocks: int | None = None) -> ray.data.Dataset:
    """Seed Dataset with an ``url`` column. Seed lists are tiny (search
    expansions cap at ~dozens of page URLs) — block count is bounded so a
    10-row seed list doesn't schedule 10 tasks."""
    n = override_num_blocks or max(1, min(16, len(urls) // 64 or 1))
    return ray.data.from_items([{"url": u} for u in urls], override_num_blocks=n)


_SITEMAP_LOC_RE = None


def sitemap_seeds(bodies: list[str]) -> list[str]:
    """Seed source from sitemap.xml bodies: every <loc> in document order
    (urlset AND sitemapindex entries — callers fetch nested sitemaps and
    call again). Regex-scanned like the rest of this engine's parsing; no
    XML library dependency."""
    import re

    global _SITEMAP_LOC_RE
    if _SITEMAP_LOC_RE is None:
        _SITEMAP_LOC_RE = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.S | re.I)
    out = []
    for body in bodies:
        out.extend(_SITEMAP_LOC_RE.findall(body))
    return out
