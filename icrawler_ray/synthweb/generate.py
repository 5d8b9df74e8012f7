"""Deterministic synthetic web (FIXTURES.md §1-§6).

Everything is generated from a single integer seed with numpy's PCG64 —
same seed, same web, on any machine. The web is *closed*: every link span
targets a URL the stub can serve (or a deliberate dead/discard URL), every
media span targets a generated blob, so crawls are fully hermetic.

Shapes exercised on purpose:
- power-law host skew: host 0 holds ~``hot_frac`` of all pages (skew
  mitigation target, SURVEY.md §7.4)
- link forms: absolute / root-relative / protocol-relative / discard-class
  (javascript:, #fragment, .zip, android-app://), the taxonomy of
  /root/reference/icrawler/builtin/greedy.py:43-67
- blob statuses 200/404/500, undecodable bodies, sizes crossing the
  min/max gates of /root/reference/icrawler/downloader.py:242-263
- robots-disallowed path prefixes + per-host crawl delays (north-rule
  politeness; the reference has none)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from icrawler_ray.functions.html import render_page
from icrawler_ray.synthweb import fakeimg

_WORDS = (
    "the a fast slow big small key value row column table scan join merge sort "
    "hash agg group window stream batch vector query filter order part line "
    "customer data spark dup"
).split()

IMG_EXTS = ("jpg", "jpg", "jpg", "png", "gif", "bmp")


@dataclass
class SynthWeb:
    seed: int
    hosts: list[str]
    domains: list[str]                       # crawlable domain set (greedy crawl input)
    pages: dict[str, list[tuple[str, str, str]]]   # url -> ordered spans (kind, text, ref)
    page_status: dict[str, int]
    blobs: dict[str, tuple[int, bytes, int, int]]  # file_url -> (status, content, w, h)
    host_policy: dict[str, dict]             # host -> {crawl_delay_ms, max_inflight, robots_disallow}
    seeds: list[str] = field(default_factory=list)       # urllist-pipeline seed URLs
    seed_kinds: list[str] = field(default_factory=list)  # "page"|"file"|"dead" labels
    search_pages: dict[str, bytes] = field(default_factory=dict)  # search URL -> body
    search_expected: dict[str, list[str]] = field(default_factory=dict)

    def body_of(self, url: str) -> bytes:
        return render_page(self.pages[url]).encode()

    def url_map(self) -> dict[str, tuple[int, bytes]]:
        """url -> (status, body) for the fetch stub (pages + blobs + search)."""
        m = {}
        for url, spans in self.pages.items():
            m[url] = (self.page_status[url], render_page(spans).encode())
        for url, (status, content, _w, _h) in self.blobs.items():
            m[url] = (status, content)
        for url, body in self.search_pages.items():
            m[url] = (200, body)
        return m

    def corpus_table(self) -> pa.Table:
        """The interleaved corpus table (input_hint schema) for all live pages."""
        doc_ids, span_lists = [], []
        for url in sorted(self.pages):
            if self.page_status[url] != 200:
                continue
            doc_ids.append(url)
            span_lists.append(
                [
                    {"kind": k, "text": t, "media_ref": r, "offset": i}
                    for i, (k, t, r) in enumerate(self.pages[url])
                ]
            )
        from icrawler_ray.schemas import CORPUS

        return pa.table({"doc_id": doc_ids, "spans": span_lists}, schema=CORPUS)

    def host_policy_table(self) -> pa.Table:
        hosts = sorted(self.host_policy)
        return pa.table(
            {
                "host": hosts,
                "crawl_delay_ms": [self.host_policy[h]["crawl_delay_ms"] for h in hosts],
                "max_inflight": [self.host_policy[h]["max_inflight"] for h in hosts],
                "robots_disallow": [self.host_policy[h]["robots_disallow"] for h in hosts],
            }
        )


def make_synthweb(
    n_pages: int = 200,
    n_hosts: int = 5,
    seed: int = 42,
    hot_frac: float = 0.5,
    max_spans: int = 12,
    n_images: int | None = None,
    n_seeds: int = 40,
) -> SynthWeb:
    rng = np.random.default_rng(seed)
    n_images = n_images or max(8, n_pages)
    hosts = [f"h{i}.example.com" for i in range(n_hosts)]
    img_hosts = [f"img{i}.example.com" for i in range(max(1, n_hosts // 2))]

    # --- page URL space: hot host gets hot_frac of pages, rest uniform
    page_host_idx = np.where(
        rng.random(n_pages) < hot_frac, 0, rng.integers(1, max(2, n_hosts), n_pages)
    )
    page_urls = []
    for i in range(n_pages):
        host = hosts[int(page_host_idx[i]) % n_hosts]
        prefix = "/private" if rng.random() < 0.06 else ""
        page_urls.append(f"http://{host}{prefix}/p/{i}.html")
    # per-host root pages (greedy-crawl entry points: "http://host")
    root_urls = [f"http://{h}" for h in hosts]

    # --- image blobs (sizes straddle the keep_file gates, incl. boundaries)
    blob_urls, blobs = [], {}
    for j in range(n_images):
        ext = IMG_EXTS[int(rng.integers(0, len(IMG_EXTS)))]
        url = f"http://{img_hosts[j % len(img_hosts)]}/i/{j}.{ext}"
        w = int(rng.integers(10, 400))
        h = int(rng.integers(10, 400))
        if rng.random() < 0.05:  # exact-boundary cases
            w, h = 100, 100
        r = rng.random()
        status = 200 if r < 0.92 else (404 if r < 0.97 else 500)
        if rng.random() < 0.05:
            content = b"NOTANIMAGE" + bytes([int(x) for x in rng.integers(0, 256, 8)])
        else:
            content = fakeimg.encode(w, h, bytes([int(x) for x in rng.integers(0, 256, 16)]))
        blobs[url] = (status, content, w, h)
        blob_urls.append(url)

    # --- spans per page
    def text_span():
        k = int(rng.integers(3, 10))
        return ("text", " ".join(_WORDS[int(w)] for w in rng.integers(0, len(_WORDS), k)), "")

    def media_span():
        url = blob_urls[int(rng.integers(0, len(blob_urls)))]
        if rng.random() < 0.1:  # protocol-relative src (greedy.py:33-35 fixup path)
            return ("media", "", url[len("http:"):])
        return ("media", "", url)

    def link_span(self_host: str):
        r = rng.random()
        if r < 0.60:  # absolute page link
            return ("link", "", page_urls[int(rng.integers(0, n_pages))])
        if r < 0.75:  # root-relative, same host
            tgt = page_urls[int(rng.integers(0, n_pages))]
            path = tgt.split(self_host, 1)[-1] if self_host in tgt else "/p/0.html"
            if not path.startswith("/"):
                path = "/p/0.html"
            return ("link", "", path)
        if r < 0.83:  # protocol-relative
            return ("link", "", page_urls[int(rng.integers(0, n_pages))][len("http:"):])
        # discard-class
        d = int(rng.integers(0, 4))
        return (
            "link",
            "",
            [
                "javascript:void(0)",
                "#section-" + str(int(rng.integers(0, 9))),
                f"http://{self_host}/files/a{int(rng.integers(0, 99))}.zip",
                "android-app://com.example.app/page",
            ][d],
        )

    pages: dict[str, list] = {}
    page_status: dict[str, int] = {}
    for i, url in enumerate(page_urls):
        host = hosts[int(page_host_idx[i]) % n_hosts]
        n_spans = int(rng.integers(1, max_spans + 1))
        spans = []
        for _ in range(n_spans):
            r = rng.random()
            if r < 0.5:
                spans.append(text_span())
            elif r < 0.7:
                spans.append(media_span())
            else:
                spans.append(link_span(host))
        pages[url] = spans
        page_status[url] = 200 if rng.random() < 0.95 else 404
    for h, root in zip(hosts, root_urls):
        # root pages link into the site (always live: crawl entry points)
        k = int(rng.integers(2, 7))
        spans = [text_span()]
        for _ in range(k):
            spans.append(("link", "", page_urls[int(rng.integers(0, n_pages))]))
        pages[root] = spans
        page_status[root] = 200

    # --- politeness / robots policy
    host_policy = {}
    for h in hosts + img_hosts:
        host_policy[h] = {
            "crawl_delay_ms": int(rng.choice([0, 100, 250, 500])),
            "max_inflight": int(rng.choice([2, 4, 8])),
            "robots_disallow": ["/private"] if rng.random() < 0.5 else [],
        }

    # --- urllist seeds: direct file urls + dups + dead
    seeds, seed_kinds = [], []
    for _ in range(n_seeds):
        r = rng.random()
        if r < 0.85:
            u = blob_urls[int(rng.integers(0, len(blob_urls)))]
            seeds.append(u)
            seed_kinds.append("file")
        else:
            seeds.append(f"http://img0.example.com/i/missing{int(rng.integers(0, 999))}.jpg")
            seed_kinds.append("dead")
    dup_n = max(1, n_seeds // 10)
    for i in range(dup_n):  # ~10% duplicates
        seeds.append(seeds[int(rng.integers(0, n_seeds))])
        seed_kinds.append("dup")

    return SynthWeb(
        seed=seed,
        hosts=hosts + img_hosts,
        domains=[f"http://{h}" for h in hosts],
        pages=pages,
        page_status=page_status,
        blobs=blobs,
        host_policy=host_policy,
        seeds=seeds,
        seed_kinds=seed_kinds,
    )


# ----------------------------------------------------------- search fixtures

def add_search_fixtures(web: SynthWeb, keyword: str = "cat", per_page: int = 10) -> None:
    """Register synthetic search-engine result pages in the web, one body per
    feeder-built request URL, in each engine's native format
    (google: script-embedded URIs /root/reference/icrawler/builtin/google.py:144-168;
    bing: div.imgpt + murl markup, bing.py:117-131;
    baidu: JSON with cipher-obfuscated objURL, baidu.py:129-143;
    flickr: photos page + per-photo getSizes JSON, flickr.py:81-110).
    """
    import json

    from icrawler_ray.functions.baidu_cipher import encode_url
    from icrawler_ray.sources.seeds import (
        baidu_search_urls,
        bing_search_urls,
        flickr_search_urls,
        google_search_urls,
    )

    rng = np.random.default_rng(web.seed + 1)
    blob_urls = sorted(web.blobs)

    def pick(n, want_jpgish=None):
        out = []
        idx = rng.integers(0, len(blob_urls), n * 3)
        for i in idx:
            u = blob_urls[int(i)]
            if want_jpgish and not u.endswith(tuple(want_jpgish)):
                continue
            out.append(u)
            if len(out) == n:
                break
        return out

    # google: pagination step 100
    for url in google_search_urls(keyword, offset=0, max_num=300):
        urls = pick(per_page, want_jpgish=(".jpg", ".png", ".bmp"))
        body = "<html><script>var data=[" + ",".join(f'"{u}"' for u in urls) + "]</script></html>"
        web.search_pages[url] = body.encode()
        web.search_expected[url] = urls

    # bing: step 20
    for url in bing_search_urls(keyword, offset=0, max_num=60):
        urls = pick(per_page, want_jpgish=(".jpg",))
        divs = []
        for u in urls:
            # compact separators: the reference murl regex (bing.py:120)
            # expects 'murl":"' with no space
            m = json.dumps({"murl": u}, separators=(",", ":")).replace('"', "&quot;")
            divs.append(f'<div class="imgpt"><a m="{m}">x</a></div>')
        web.search_pages[url] = ("<html>" + "".join(divs) + "</html>").encode()
        web.search_expected[url] = urls

    # baidu: step 30, objURL cipher + hoverURL fallback + empty items
    for url in baidu_search_urls(keyword, offset=0, max_num=90):
        urls = pick(per_page)
        items = []
        for k, u in enumerate(urls):
            if k % 3 == 2:
                items.append({"hoverURL": u})
            else:
                items.append({"objURL": encode_url(u)})
        items.append({"irrelevant": 1})  # no-URL item: skipped by the parser
        web.search_pages[url] = json.dumps({"data": items}).encode()
        web.search_expected[url] = urls

    # flickr: photos pages + per-photo getSizes
    apikey = "stub-key"
    photo_id = 0
    for url in flickr_search_urls(apikey, per_page=per_page, max_pages=3):
        photos = []
        expected = []
        for _ in range(per_page):
            u = blob_urls[int(rng.integers(0, len(blob_urls)))]
            pid = str(photo_id)
            photo_id += 1
            photos.append({"id": pid, "title": f"photo {pid}"})
            sizes = {
                "stat": "ok",
                "sizes": {"size": [
                    {"label": "Square", "source": u + "?sz=sq"},
                    {"label": "Original", "source": u},
                ]},
            }
            from urllib.parse import urlencode

            sz_url = "https://api.flickr.com/services/rest/?" + urlencode(
                {
                    "method": "flickr.photos.getSizes",
                    "api_key": apikey,
                    "photo_id": pid,
                    "format": "json",
                    "nojsoncallback": 1,
                }
            )
            web.search_pages[sz_url] = json.dumps(sizes).encode()
            expected.append(u)  # "original" preferred by default order
        body = {"stat": "ok", "photos": {"photo": photos}}
        web.search_pages[url] = json.dumps(body).encode()
        web.search_expected[url] = expected
