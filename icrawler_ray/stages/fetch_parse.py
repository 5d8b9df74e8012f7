"""FetchParse actor-pool stage (SURVEY.md P1).

The reference's Parser.worker_exec (/root/reference/icrawler/parser.py:43-128)
is a thread loop: dequeue page URL -> GET with Referer + <=3 retries ->
parse -> route dict results downstream and str results back into its own
queue. Here it is a callable CLASS for ``map_batches``:

- ``__init__`` runs once per actor: builds the (stub) session and the
  parser rules (compiled regexes, domain lists) — state amortized across
  batches (SURVEY.md T1/T2/T6)
- ``__call__`` runs per Arrow batch of frontier rows and returns one Arrow
  table of heterogeneous rows tagged ``row_kind`` in {"doc","task","link",
  "error"}; downstream ``filter`` splits the stream (the two-queue routing
  of parser.py:102-119 became one dataset + predicate splits)

The URL map is broadcast once via ``ray.put`` on the driver; each actor
reads it in ``__init__`` — never shipped per batch.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from icrawler_ray import schemas
from icrawler_ray.functions.urlnorm import canonicalize, hash_urls
from icrawler_ray.stages.parsers import RULES_REGISTRY
from icrawler_ray.synthweb.fetchstub import StubSession

import pandas as pd

FETCH_PARSE_SCHEMA = pa.schema(
    [
        ("row_kind", pa.string()),
        ("page_url", pa.string()),
        ("status", pa.int32()),
        ("depth", pa.int32()),
        ("parent_seq", pa.int64()),
        ("emit_ord", pa.int32()),
        ("file_url", pa.string()),
        ("link_url", pa.string()),
        ("meta_json", pa.string()),
        ("doc_id", pa.string()),
        ("spans", pa.list_(schemas.SPAN_STRUCT)),
        ("error", pa.string()),
    ]
)


class FetchParse:
    def __init__(self, url_map_ref, rules: str, rules_kwargs: dict | None = None,
                 flaky: dict | None = None, emit_docs: bool = True):
        url_map = ray.get(url_map_ref) if isinstance(url_map_ref, ray.ObjectRef) else url_map_ref
        self.session = StubSession(url_map, flaky=flaky)
        self.rules = RULES_REGISTRY[rules](**(rules_kwargs or {}))
        self.emit_docs = emit_docs

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        depths = batch["depth"].to_pylist() if "depth" in batch.column_names else [0] * len(urls)
        seqs = batch["seq"].to_pylist() if "seq" in batch.column_names else [-1] * len(urls)

        rows = {name: [] for name in FETCH_PARSE_SCHEMA.names}

        def emit(row_kind, page_url, status, depth, parent_seq, emit_ord=-1, file_url="",
                 link_url="", meta_json="", doc_id="", spans=None, error=""):
            rows["row_kind"].append(row_kind)
            rows["page_url"].append(page_url)
            rows["status"].append(status)
            rows["depth"].append(depth)
            rows["parent_seq"].append(parent_seq)
            rows["emit_ord"].append(emit_ord)
            rows["file_url"].append(file_url)
            rows["link_url"].append(link_url)
            rows["meta_json"].append(meta_json)
            rows["doc_id"].append(doc_id)
            rows["spans"].append(spans)
            rows["error"].append(error)

        for url, depth, seq in zip(urls, depths, seqs):
            try:
                resp = self.session.get(url)
            except Exception as e:  # retries exhausted (parser.py:88-94 path)
                emit("error", url, -1, depth, seq, error=str(e))
                continue
            if not (200 <= resp.status_code < 300):
                emit("error", url, resp.status_code, depth, seq, error="http status")
                continue
            spans, emissions = self.rules.parse(resp, session=self.session)
            if self.emit_docs:
                emit(
                    "doc", url, resp.status_code, depth, seq,
                    doc_id=url,
                    spans=[
                        {"kind": k, "text": t, "media_ref": r, "offset": i}
                        for i, (k, t, r) in enumerate(spans)
                    ],
                )
            for ord_, em in enumerate(emissions):
                if em[0] == "task":
                    emit("task", url, resp.status_code, depth, seq, emit_ord=ord_,
                         file_url=em[1], meta_json=em[2])
                else:
                    emit("link", url, resp.status_code, depth, seq, emit_ord=ord_,
                         link_url=em[1])
        return pa.table(rows, schema=FETCH_PARSE_SCHEMA)


_FP_CACHE: dict = {}


def make_fetch_parse_fn(url_map_ref, rules: str, rules_kwargs: dict | None = None,
                        emit_docs: bool = True):
    """Task-pool variant of FetchParse with a worker-process-level cache.

    An iterative crawl runs one Ray Data execution per round; an actor pool
    would re-pay actor startup + session build every round. Stateless
    map_batches tasks run on Ray's reusable core workers, so caching the
    constructed FetchParse in a module global amortizes state across
    batches AND rounds — same state-amortization contract as the actor
    pool, without per-execution spin-up. The ObjectRef travels in the task
    closure; the url map is fetched once per worker process.
    """
    import json as _json

    key = (
        url_map_ref.hex() if hasattr(url_map_ref, "hex") else str(id(url_map_ref)),
        rules, _json.dumps(rules_kwargs or {}, sort_keys=True), emit_docs,
    )

    def fn(batch: pa.Table) -> pa.Table:
        fp = _FP_CACHE.get(key)
        if fp is None:
            fp = FetchParse(url_map_ref, rules, rules_kwargs, emit_docs=emit_docs)
            _FP_CACHE[key] = fp
        return fp(batch)

    return fn


def split_fetch_parse(ds):
    """Split a FetchParse output dataset into (docs, tasks, links, errors).

    Each is a lazy predicate ``filter`` over the same blocks — no extra
    pass over the data until consumed. Tasks/links get canonical URL + hash
    columns appended vectorized (dedup keys, SURVEY.md F5/Q1).
    """
    import pyarrow.compute as pc

    docs = ds.filter(expr="row_kind == 'doc'").select_columns(
        ["doc_id", "spans", "depth", "parent_seq", "status"]
    )
    errors = ds.filter(expr="row_kind == 'error'")

    def _with_keys(col):
        def fn(t: pa.Table) -> pa.Table:
            s = pd.Series(t[col].to_pylist(), dtype="string")
            canon = canonicalize(s)
            t = t.append_column("url_canon", pa.array(canon.astype(object), type=pa.string()))
            t = t.append_column("url_hash", pa.array(hash_urls(canon.fillna("")), type=pa.uint64()))
            return t

        return fn

    tasks = (
        ds.filter(expr="row_kind == 'task'")
        .select_columns(["file_url", "page_url", "meta_json", "depth", "parent_seq", "emit_ord"])
        .map_batches(_with_keys("file_url"), batch_format="pyarrow")
    )
    links = (
        ds.filter(expr="row_kind == 'link'")
        .select_columns(["link_url", "page_url", "depth", "parent_seq", "emit_ord"])
        .map_batches(_with_keys("link_url"), batch_format="pyarrow")
    )
    return docs, tasks, links, errors
