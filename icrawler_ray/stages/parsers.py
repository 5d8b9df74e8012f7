"""Per-engine page-parse rules (SURVEY.md P2-P9).

Each rules class is instantiated once per FetchParse actor (compiled
regexes amortized, the reference does the same per parser instance at
/root/reference/icrawler/builtin/greedy.py:19-21) and exposes

    parse(response, session) -> (spans, emissions)

- ``spans``: ordered (kind, text, media_ref) page spans for the corpus row
  (document order; empty for search engines, which have no doc semantics)
- ``emissions``: ordered list of ("task", file_url, meta_json) |
  ("link", url) in the reference's *emission* order — for the greedy rules
  that is all <img src> tasks first, then hrefs, matching the two
  find_all passes of greedy.py:31-40 — this order drives crawl ordering
  and filename assignment downstream.
"""

from __future__ import annotations

import html as htmllib
import json
import re
from urllib.parse import urljoin

from icrawler_ray.functions.baidu_cipher import decode_url
from icrawler_ray.functions.html import scan_page
from icrawler_ray.functions.urlnorm import HTML_EXTS, IMAGE_URL_RE, OK_SCHEMES, base_url_of


class GreedyRules:
    """GreedyParser semantics (/root/reference/icrawler/builtin/greedy.py:29-71)."""

    def __init__(self, domains: list[str]):
        self.domains = list(domains)
        self.pattern = IMAGE_URL_RE
        # single C-level scan instead of a Python any()-loop over domains
        # (semantics identical to any(d in href for d in domains))
        self._domain_re = re.compile("|".join(map(re.escape, self.domains))) \
            if self.domains else None

    def _norm_href(self, href: str, base_url: str):
        if len(href) < 2:
            return None
        if href[0:2] == "//":
            return "http:" + href.rstrip("/")
        if href[0] == "/":
            return urljoin(base_url, href.strip("/"))
        if href[0] == "#":
            return None
        h = href.rstrip("/")
        # fast path: urljoin(base, h) == h for well-formed absolute
        # http(s) URLs (property-fuzzed vs the vectorized twin; the
        # exceptions — empty netloc, bare trailing '?'/'#', edge
        # whitespace, embedded tab/CR/LF which urllib strips, case-folded
        # scheme — fall through). urljoin dominates parse CPU (60%
        # measured) when every href is absolute, the common crawl case.
        if (
            (h.startswith("http://") and len(h) > 7 and h[7] != "/")
            or (h.startswith("https://") and len(h) > 8 and h[8] != "/")
        ) and h[-1] not in "?# \t\r\n" and ";" not in h and "?#" not in h \
                and "\t" not in h and "\r" not in h and "\n" not in h:
            return h
        return urljoin(base_url, h)

    def _classify(self, href: str):
        """file | page | None(discard), after the image check failed."""
        tmp = href.split("/")[-1].split(".")
        if len(tmp) > 1 and tmp[-1] not in HTML_EXTS:
            return None
        if href.find("javascript", 0, 10) == 0:
            return None
        scheme = href.split(":", 1)[0].lower() if ":" in href else ""
        if scheme not in OK_SCHEMES:
            return None
        if self._domain_re is not None and self._domain_re.search(href):
            return "page"
        return None

    def parse(self, response, session=None):
        body = response.content.decode("utf-8", "ignore")
        spans = scan_page(body)
        base_url = base_url_of(response.url)
        emissions = []
        # pass 1: img srcs matching the image pattern (// scheme fixup)
        for kind, _text, ref in spans:
            if kind == "media" and self.pattern.match(ref):
                img_url = "http:" + ref if ref.startswith("//") else ref
                emissions.append(("task", img_url, ""))
        # pass 2: hrefs -> normalize -> image-task | same-domain page | discard
        for kind, _text, ref in spans:
            if kind != "link":
                continue
            href = self._norm_href(ref, base_url)
            if href is None:
                continue
            if self.pattern.match(href):
                emissions.append(("task", href, ""))
                continue
            if self._classify(href) == "page":
                emissions.append(("link", href, ""))
        return spans, emissions


class GoogleRules:
    """GoogleParser semantics (/root/reference/icrawler/builtin/google.py:144-168):
    first <script> block yielding regex hits wins; unicode-escape decode."""

    SCRIPT_RE = re.compile(r"<script[^>]*>.*?</script>", re.S)
    URI_RE_1 = re.compile(r"http[^\[]*?.(?:jpg|png|bmp)")
    URI_RE_2 = re.compile(r"http[^\[]*?\.(?:jpg|png|bmp)")

    def parse(self, response, session=None):
        txt_all = response.content.decode("utf-8", "ignore")
        for script in self.SCRIPT_RE.findall(txt_all):
            uris = self.URI_RE_1.findall(script)
            if not uris:
                uris = self.URI_RE_2.findall(script)
            uris = [bytes(u, "utf-8").decode("unicode-escape") for u in uris]
            if uris:
                return [], [("task", u, "") for u in uris]
        return [], []


class BingRules:
    """BingParser semantics (/root/reference/icrawler/builtin/bing.py:117-131)."""

    DIV_RE = re.compile(r"<div class=\"imgpt\".*?</div>", re.S)
    M_RE = re.compile(r"<a [^>]*?m=\"([^\"]*)\"")
    MURL_RE = re.compile(r"murl\":\"(.*?)\.jpg")

    def parse(self, response, session=None):
        txt = response.content.decode("utf-8", "ignore")
        emissions = []
        for div in self.DIV_RE.findall(txt):
            m = self.M_RE.search(div)
            if not m:  # the KeyError-continue path of bing.py:123-125
                continue
            href_str = htmllib.unescape(m.group(1))
            match = self.MURL_RE.search(href_str)
            if match:
                emissions.append(("task", f"{match.group(1)}.jpg", ""))
        return [], emissions


class BaiduRules:
    """BaiduParser semantics (/root/reference/icrawler/builtin/baidu.py:129-143):
    JSON (strict=False, ``\\'`` fixup); objURL via the substitution cipher,
    hoverURL fallback, itemless rows skipped."""

    def parse(self, response, session=None):
        try:
            content = response.content.decode("utf-8", "ignore").replace("\\'", "'")
            data = json.loads(content, strict=False)
        except (ValueError, KeyError):
            return [], []
        emissions = []
        for item in data.get("data", []):
            if "objURL" in item:
                emissions.append(("task", decode_url(item["objURL"]), ""))
            elif "hoverURL" in item:
                emissions.append(("task", item["hoverURL"], ""))
        return [], emissions


class FlickrRules:
    """FlickrParser semantics (/root/reference/icrawler/builtin/flickr.py:81-110):
    per-photo secondary getSizes call through the session (nested fetch
    inside the actor), size-preference pick, photo record as task meta."""

    # Verbatim reference default order (flickr.py:137-150). NB "large Square"
    # keeps its capital S: labels are lowercased before comparison
    # (flickr.py:104), so that entry never matches — preserved quirk.
    DEFAULT_ORDER = [
        "original", "large 2048", "large 1600", "large", "medium 800", "medium 640",
        "medium", "small 320", "small", "thumbnail", "large Square", "square",
    ]

    def __init__(self, apikey: str, size_preference=None):
        self.apikey = apikey
        self.size_preference = size_preference or self.DEFAULT_ORDER

    def parse(self, response, session=None):
        from urllib.parse import urlencode

        try:
            content = json.loads(response.content.decode("utf-8", "ignore"))
        except ValueError:
            return [], []
        if content.get("stat") != "ok":
            return [], []
        emissions = []
        for photo in content["photos"]["photo"]:
            params = {
                "method": "flickr.photos.getSizes",
                "api_key": self.apikey,
                "photo_id": photo["id"],
                "format": "json",
                "nojsoncallback": 1,
            }
            try:
                ret = session.get("https://api.flickr.com/services/rest/?" + urlencode(params))
                info = json.loads(ret.content.decode())
            except Exception:
                continue
            if info.get("stat") != "ok":
                continue
            urls = {str(s["label"]).lower(): s["source"] for s in info["sizes"]["size"]}
            for sz in self.size_preference:
                if sz in urls:
                    emissions.append(("task", urls[sz], json.dumps(photo, sort_keys=True)))
                    break
        return [], emissions


RULES_REGISTRY = {
    "greedy": GreedyRules,
    "google": GoogleRules,
    "bing": BingRules,
    "baidu": BaiduRules,
    "flickr": FlickrRules,
}
