"""CLI entry point: ``python -m icrawler_ray <crawler> [options]``.

Maps the reference's builtin crawler API (compat.py) onto a GNU-style
command line so the engine is drivable without writing Python::

    python -m icrawler_ray google --keyword cat --max-num 50 --out imgs
    python -m icrawler_ray greedy --domains example.com --max-num 100 --out imgs
    python -m icrawler_ray urllist --url-list urls.txt --out imgs

Runs against the live network by default (``--session live``); pass
``--session stub:<path.json>`` with a {url: [status, body]} JSON map for
hermetic runs (tests use the Python API directly).
"""

from __future__ import annotations

import argparse
import sys


def _session_spec(arg: str):
    if arg == "live":
        return ("live", {})
    if arg.startswith("stub:"):
        import base64
        import json

        with open(arg[5:]) as f:
            raw = json.load(f)
        return {u: (int(s), base64.b64decode(b) if isinstance(b, str) else bytes(b))
                for u, (s, b) in raw.items()}
    raise SystemExit(f"unknown --session spec: {arg}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="icrawler_ray")
    p.add_argument("crawler", choices=["google", "bing", "baidu", "flickr",
                                       "greedy", "urllist"])
    p.add_argument("--keyword", default="")
    p.add_argument("--domains", nargs="*", default=[])
    p.add_argument("--url-list", dest="url_list", default=None)
    p.add_argument("--max-num", dest="max_num", type=int, default=100)
    p.add_argument("--out", default="images", help="storage root_dir")
    p.add_argument("--storage-backend", default="FileSystem",
                   help="sink registry name (FileSystem, CloudStorage, ...)")
    p.add_argument("--min-size", dest="min_size", type=int, nargs=2, default=None)
    p.add_argument("--max-size", dest="max_size", type=int, nargs=2, default=None)
    p.add_argument("--file-idx-offset", dest="file_idx_offset", default="0")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--downloader-threads", type=int, default=4)
    p.add_argument("--parser-threads", type=int, default=2)
    p.add_argument("--apikey", default=None)
    p.add_argument("--session", default="live")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")

    from icrawler_ray import compat

    offset = args.file_idx_offset if args.file_idx_offset == "auto" else int(args.file_idx_offset)
    common = dict(
        storage={"backend": args.storage_backend, "root_dir": args.out},
        parser_threads=args.parser_threads,
        downloader_threads=args.downloader_threads,
        session_spec=_session_spec(args.session),
    )
    try:
        if args.crawler in ("google", "bing", "baidu"):
            cls = {"google": compat.GoogleImageCrawler, "bing": compat.BingImageCrawler,
                   "baidu": compat.BaiduImageCrawler}[args.crawler]
            n = cls(**common).crawl(args.keyword, max_num=args.max_num,
                                    min_size=args.min_size, max_size=args.max_size,
                                    file_idx_offset=offset, overwrite=args.overwrite)
        elif args.crawler == "flickr":
            n = compat.FlickrImageCrawler(apikey=args.apikey, **common).crawl(
                max_num=args.max_num, min_size=args.min_size, max_size=args.max_size,
                file_idx_offset=offset, overwrite=args.overwrite, text=args.keyword)
        elif args.crawler == "greedy":
            if not args.domains:
                raise SystemExit("greedy requires --domains")
            n = compat.GreedyImageCrawler(**common).crawl(
                args.domains, max_num=args.max_num, min_size=args.min_size,
                max_size=args.max_size, file_idx_offset=offset,
                overwrite=args.overwrite)
        else:
            if not args.url_list:
                raise SystemExit("urllist requires --url-list")
            n = compat.UrlListCrawler(**common).crawl(
                args.url_list, max_num=args.max_num, file_idx_offset=offset,
                overwrite=args.overwrite)
        print(f"downloaded {n} files to {args.out}")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
