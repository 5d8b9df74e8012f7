"""Procedural synthetic web: pages synthesized ON FETCH, deterministically.

The map-based SynthWeb (generate.py) materializes every body up front —
right for oracle-parity tests, wrong for scale (a 10^7-page web would mean
gigabytes broadcast to every worker). This variant carries only a few
integers of state; ``body_of(i)`` derives page i's spans from a counter-
seeded PCG64 stream, so any worker can serve any URL with zero shared
state — the fetch-stub analogue of the real web's "the work is at the
edge". Benchmarks (bench.py) use this to saturate CPUs at 10^5-10^6 pages;
the design point (10^10 frontier) is the same shape with more hosts.

URL scheme:
  page  i -> http://h{host(i)}.example.com/p/{i}.html
  image j -> http://img{j % n_img_hosts}.example.com/i/{j}.{ext(j)}
  root     -> http://h{k}.example.com  (links into the site)

host(i): first ``hot_frac`` of pages on host 0 (hot-host skew), rest
spread by multiplicative hash. All randomness is PCG64(seed * M + i) —
same (seed, i) -> same page, on any machine or process.
"""

from __future__ import annotations

import re

import numpy as np

from icrawler_ray.functions.html import render_page
from icrawler_ray.functions.retry import retrying
from icrawler_ray.synthweb import fakeimg
from icrawler_ray.synthweb.fetchstub import StubResponse

_WORDS = (
    "the a fast slow big small key value row column table scan join merge sort "
    "hash agg group window stream batch vector query filter order part line "
    "customer data spark dup"
).split()
_WORDS_ARR = np.asarray(_WORDS, dtype=object)
_EXTS = ("jpg", "jpg", "jpg", "png", "gif", "bmp")

_PAGE_RE = re.compile(r"^http://h(\d+)\.example\.com(?:/p/(\d+)\.html)?/?$")
_IMG_RE = re.compile(r"^http://img(\d+)\.example\.com/i/(\d+)\.(\w+)$")


class ProceduralWeb:
    def __init__(self, n_pages: int, n_hosts: int = 16, seed: int = 0,
                 spans_per_page: int = 48, hot_frac: float = 0.3,
                 dead_frac: float = 0.03, links_per_page: int | None = None):
        self.n_pages = n_pages
        self.n_hosts = n_hosts
        self.n_img_hosts = max(1, n_hosts // 2)
        self.seed = seed
        self.spans_per_page = spans_per_page
        self.hot_frac = hot_frac
        self.dead_frac = dead_frac
        self.n_images = n_pages
        self.hosts = [f"h{i}.example.com" for i in range(n_hosts)] + [
            f"img{i}.example.com" for i in range(self.n_img_hosts)
        ]
        self.domains = [f"http://h{i}.example.com" for i in range(n_hosts)]

    # ------------------------------------------------------- deterministic ids
    def host_of(self, i: int) -> int:
        if i < self.n_pages * self.hot_frac:
            return 0
        return 1 + (i * 2654435761) % max(1, self.n_hosts - 1)

    def url_of(self, i: int) -> str:
        return f"http://h{self.host_of(i)}.example.com/p/{i}.html"

    def img_url_of(self, j: int) -> str:
        ext = _EXTS[j % len(_EXTS)]
        return f"http://img{j % self.n_img_hosts}.example.com/i/{j}.{ext}"

    def _rng(self, kind: int, i: int) -> np.random.Generator:
        return np.random.Generator(np.random.PCG64(((self.seed * 4 + kind) << 40) + i))

    # ------------------------------------------------------------ page bodies
    def page_spans(self, i: int) -> list[tuple[str, str, str]]:
        rng = self._rng(0, i)
        n = int(rng.integers(self.spans_per_page // 2, self.spans_per_page + 1))
        kinds = rng.random(n)
        word_idx = rng.integers(0, len(_WORDS), n * 8).reshape(n, 8)
        targets = rng.integers(0, self.n_pages, n)
        imgs = rng.integers(0, self.n_images, n)
        # one vectorized word gather + per-row join (content-identical to
        # the per-word genexpr, ~2x cheaper — this generator bounds the
        # measured fetch throughput of every bench)
        word_rows = _WORDS_ARR[word_idx].tolist()
        spans = []
        for s in range(n):
            r = kinds[s]
            if r < 0.55:
                spans.append(("text", " ".join(word_rows[s]), ""))
            elif r < 0.75:
                spans.append(("media", "", self.img_url_of(int(imgs[s]))))
            else:
                spans.append(("link", "", self.url_of(int(targets[s]))))
        return spans

    def root_spans(self, k: int) -> list[tuple[str, str, str]]:
        rng = self._rng(1, k)
        targets = rng.integers(0, self.n_pages, 8)
        return [("text", "root", "")] + [("link", "", self.url_of(int(t))) for t in targets]

    def page_status(self, i: int) -> int:
        return 404 if (i * 40503) % 1000 < self.dead_frac * 1000 else 200

    def blob_of(self, j: int) -> tuple[int, bytes]:
        rng = self._rng(2, j)
        w = int(rng.integers(10, 400))
        h = int(rng.integers(10, 400))
        r = (j * 69069) % 100
        status = 200 if r < 92 else (404 if r < 97 else 500)
        if (j * 48271) % 100 < 5:
            return status, b"NOTANIMAGE" + bytes(rng.integers(0, 256, 4).astype(np.uint8))
        return status, fakeimg.encode(w, h)

    def seed_urls(self, n: int) -> list[str]:
        """n page URLs spread across the id space (broad BFS round 1)."""
        step = max(1, self.n_pages // max(1, n))
        return [self.url_of(i) for i in range(0, self.n_pages, step)][:n]

    def spec(self) -> dict:
        return {
            "n_pages": self.n_pages, "n_hosts": self.n_hosts, "seed": self.seed,
            "spans_per_page": self.spans_per_page, "hot_frac": self.hot_frac,
            "dead_frac": self.dead_frac,
        }


class ProceduralSession:
    """Session over a ProceduralWeb — same contract as StubSession."""

    def __init__(self, spec: dict):
        self.web = ProceduralWeb(**spec)
        self.request_count = 0

        @retrying(sleep=lambda s: None)
        def _get(url: str) -> StubResponse:
            self.request_count += 1
            m = _IMG_RE.match(url)
            if m:
                j = int(m.group(2))
                if j >= self.web.n_images:
                    return StubResponse(url, 404, b"")
                status, body = self.web.blob_of(j)
                return StubResponse(url, status, body)
            m = _PAGE_RE.match(url.rstrip("/"))
            if m:
                host, page = int(m.group(1)), m.group(2)
                if host >= self.web.n_hosts:
                    return StubResponse(url, 404, b"")
                if page is None:
                    return StubResponse(url, 200, render_page(self.web.root_spans(host)).encode())
                i = int(page)
                if i >= self.web.n_pages or self.web.host_of(i) != host:
                    return StubResponse(url, 404, b"")
                if self.web.page_status(i) != 200:
                    return StubResponse(url, self.web.page_status(i), b"gone")
                return StubResponse(url, 200, render_page(self.web.page_spans(i)).encode())
            return StubResponse(url, 404, b"not found")

        self._get = _get

    def get(self, url: str, timeout=None, headers=None) -> StubResponse:
        return self._get(url)
