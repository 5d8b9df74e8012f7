"""Drop-in reference API facade (SURVEY.md §3.1-3.3 entry points).

A user of hellock/icrawler can switch imports to this module and run the
same call sites::

    from icrawler_ray.compat import GoogleImageCrawler
    GoogleImageCrawler(storage={"root_dir": "imgs"},
                       downloader_threads=4).crawl("cat", max_num=50)

Each class mirrors its reference constructor and ``crawl`` signature
(google.py:171-212, bing.py:139-168, baidu.py:150-180, flickr.py:113-178,
greedy.py:74-97, urllist.py:35-47, crawler.py:30-72) but executes the Ray
Data pipelines of this engine and writes downloaded files through the
storage-sink registry (KV blob contract, storage/sinks.py) with the
reference's filename sequence.

Deviations, by design:
- ``*_threads`` map to Ray actor-pool concurrency upper bounds.
- component-class overrides (``feeder_cls``/``parser_cls``/
  ``downloader_cls``) are the reference's extension surface; this engine's
  equivalent is :class:`icrawler_ray.pipelines.plan.CrawlPlan` — passing a
  non-default class here raises with that pointer.
- ``session_spec`` (extra kwarg): a ``make_session`` spec — defaults to
  the live-network adapter; hermetic tests pass a stub url-map ref.
- ``max_idle_time`` maps to the bounded-round watchdog (greedy) and is a
  no-op for the inherently bounded list/search pipelines.
"""

from __future__ import annotations

import pyarrow as pa

from icrawler_ray.defaults import DEFAULT_EXT
from icrawler_ray.storage.sinks import resolve_sink

_DEFAULT_STORAGE = {"backend": "FileSystem", "root_dir": "images"}


def _write_files(ds, sink, overwrite: bool) -> int:
    """Distributed KV write of a results dataset's (filename, content)
    rows through a sink; skip-existing unless overwrite (the reference
    downloader's storage.exists gate, downloader.py:109-116)."""

    def write_batch(t: pa.Table) -> pa.Table:
        n = 0
        for name, content in zip(t["filename"].to_pylist(), t["content"].to_pylist()):
            if content is None:
                continue
            if not overwrite and sink.exists(name):
                continue
            sink.write(name, content)
            n += 1
        return pa.table({"written": pa.array([n], type=pa.int64())})

    out = ds.map_batches(write_batch, batch_format="pyarrow").sum("written")
    return int(out or 0)


class _CompatCrawler:
    _ENGINE: str | None = None

    def __init__(self, feeder_cls=None, parser_cls=None, downloader_cls=None,
                 feeder_threads: int = 1, parser_threads: int = 1,
                 downloader_threads: int = 1, storage=None, log_level=None,
                 extra_feeder_args=None, extra_parser_args=None,
                 extra_downloader_args=None, session_spec=None):
        if any(c is not None for c in (feeder_cls, parser_cls, downloader_cls)):
            raise NotImplementedError(
                "component-class overrides are the reference's extension "
                "surface; use icrawler_ray.pipelines.plan.CrawlPlan for "
                "custom feeders/parsers/downloaders")
        self.parse_concurrency = (1, max(1, parser_threads))
        self.fetch_concurrency = (1, max(1, downloader_threads))
        self.storage = resolve_sink(dict(storage or _DEFAULT_STORAGE))
        self.extra_feeder_args = extra_feeder_args or {}
        self.extra_parser_args = extra_parser_args or {}
        self.extra_downloader_args = extra_downloader_args or {}
        self.session_spec = session_spec if session_spec is not None else ("live", {})

    # -- shared crawl tail -------------------------------------------------
    def _resolve_offset(self, file_idx_offset):
        """file_idx_offset='auto' resumes from the storage scan
        (downloader.py:53-58)."""
        if file_idx_offset == "auto":
            return self.storage.max_file_idx()
        return int(file_idx_offset)

    def _finish(self, results, overwrite: bool) -> int:
        return _write_files(results, self.storage, overwrite)


class _SearchEngineCrawler(_CompatCrawler):
    def crawl(self, keyword, filters=None, offset=0, max_num=1000,
              min_size=None, max_size=None, language=None,
              file_idx_offset=0, overwrite=False, max_idle_time=None):
        from icrawler_ray.pipelines.search import search_crawl

        kwargs = {}
        if self._ENGINE == "google":
            kwargs["language"] = language
        results = search_crawl(
            self.session_spec, self._ENGINE, keyword=keyword, max_num=max_num,
            offset=offset, filters=filters, min_size=min_size, max_size=max_size,
            file_idx_offset=self._resolve_offset(file_idx_offset),
            parse_concurrency=self.parse_concurrency,
            fetch_concurrency=self.fetch_concurrency, keep_content=True,
            **kwargs,
        )
        return self._finish(results, overwrite)


class GoogleImageCrawler(_SearchEngineCrawler):
    _ENGINE = "google"


class BingImageCrawler(_SearchEngineCrawler):
    _ENGINE = "bing"


class BaiduImageCrawler(_SearchEngineCrawler):
    _ENGINE = "baidu"


class FlickrImageCrawler(_CompatCrawler):
    def __init__(self, apikey=None, *args, **kwargs):
        import os

        if apikey is None:
            apikey = os.getenv("FLICKR_APIKEY")
            if not apikey:
                raise RuntimeError("apikey is not specified")
        self.apikey = apikey
        super().__init__(*args, **kwargs)

    def crawl(self, max_num=1000, size_preference=None, min_size=None,
              max_size=None, file_idx_offset=0, overwrite=False,
              max_idle_time=None, **kwargs):
        from icrawler_ray.pipelines.search import search_crawl

        results = search_crawl(
            self.session_spec, "flickr", max_num=max_num, min_size=min_size,
            max_size=max_size, file_idx_offset=self._resolve_offset(file_idx_offset),
            apikey=self.apikey, flickr_kwargs=kwargs,
            parse_concurrency=self.parse_concurrency,
            fetch_concurrency=self.fetch_concurrency, keep_content=True,
        )
        return self._finish(results, overwrite)


class GreedyImageCrawler(_CompatCrawler):
    def crawl(self, domains, max_num=0, min_size=None, max_size=None,
              file_idx_offset=0, overwrite=False, max_idle_time=None):
        from icrawler_ray.pipelines.greedy import greedy_crawl

        _docs, results, _metrics = greedy_crawl(
            self.session_spec, domains, max_num=max_num, min_size=min_size,
            max_size=max_size, keep_content=True, default_ext=DEFAULT_EXT,
            parse_concurrency=self.parse_concurrency,
            fetch_concurrency=self.fetch_concurrency,
            max_idle_time=max_idle_time,
            file_idx_offset=self._resolve_offset(file_idx_offset),
        )
        if results is None:
            return 0
        return self._finish(results, overwrite)


class UrlListCrawler(_CompatCrawler):
    def crawl(self, url_list, max_num=1000, file_idx_offset=0,
              overwrite=False, max_idle_time=None):
        from icrawler_ray.pipelines.urllist import urllist_crawl
        from icrawler_ray.sources.seeds import url_list_seeds

        urls = url_list_seeds(url_list, **self.extra_feeder_args)
        results = urllist_crawl(
            self.session_spec, urls, max_num=max_num,
            file_idx_offset=self._resolve_offset(file_idx_offset),
            concurrency=self.fetch_concurrency, keep_content=True,
        )
        return self._finish(results, overwrite)

