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
from icrawler_ray.synthweb.fetchstub import make_session, session_spec_key

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
    def __init__(self, url_map_ref, rules, rules_kwargs: dict | None = None,
                 flaky: dict | None = None, emit_docs: bool = True,
                 with_keys: bool = False, claim: tuple | None = None,
                 slim: bool = False, inflight: str | None = None):
        self.session = make_session(url_map_ref, flaky=flaky)
        # rules: a RULES_REGISTRY name, or a rules CLASS shipped by value
        # in the task closure (custom parsers need no worker-side registry
        # registration — SURVEY §2.9 / compat parser_cls)
        rules_cls = rules if isinstance(rules, type) else RULES_REGISTRY[rules]
        self.rules = rules_cls(**(rules_kwargs or {}))
        self.emit_docs = emit_docs
        # inflight: name of a HostInflightLimiter actor — exact per-host
        # concurrent-request caps (politeness.py); one slot per (task,
        # host-run), URLs walked host-grouped so each host costs one
        # acquire/release round trip per batch.
        if inflight:
            from icrawler_ray.stages.politeness import InflightGuard

            self.guard = InflightGuard(inflight)
        else:
            self.guard = None
        # with_keys: compute url_canon/url_hash for task/link rows INSIDE
        # the parallel task (vectorized per batch) instead of a serial
        # driver pass — keeps the round loop's serial fraction small.
        self.with_keys = with_keys
        # claim: (pages_set_name, files_set_name, num_shards, max_depth) —
        # fused seen-shard claim routing: each batch pushes its candidate
        # (hash, packed) pairs to the shard actors before returning, so
        # the frontier-dedup exchange rides the parse execution (no extra
        # pass, no shuffle).
        self.claim = claim
        # slim: emit only the throughput-critical columns (ints + the two
        # URL strings); requires emit_docs=False. Halves materialized bytes.
        self.slim = slim and not emit_docs

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Hot path: builds output columns as flat Python lists appended
        inline (no per-row closure), spans as one flat StructArray +
        offsets (no per-span dicts) — ~2-3x over the naive row-dict build
        at bench scale."""
        import numpy as np  # noqa: F401 (used throughout)

        urls = batch["url"].to_pylist()
        n = len(urls)
        depths = batch["depth"].to_pylist() if "depth" in batch.column_names else [0] * n
        seqs = batch["seq"].to_pylist() if "seq" in batch.column_names else [-1] * n

        row_kind: list = []
        page_url: list = []
        status: list = []
        depth_c: list = []
        parent_seq: list = []
        emit_ord: list = []
        file_url: list = []
        link_url: list = []
        meta_json: list = []
        doc_id: list = []
        error: list = []
        # flat span storage (doc rows only)
        span_offsets = [0]
        sp_kind: list = []
        sp_text: list = []
        sp_ref: list = []
        sp_off: list = []
        span_row_idx: list = []  # row index of each doc row (for ListArray assembly)

        if self.guard is not None:
            from icrawler_ray.functions.urlnorm import host_of_one

            hosts = [host_of_one(u) for u in urls]
            order = sorted(range(n), key=hosts.__getitem__)  # stable host runs
        else:
            hosts, order = None, range(n)
        held: str | None = None
        try:
            for _i in order:
                url, depth, seq = urls[_i], depths[_i], seqs[_i]
                if hosts is not None and hosts[_i] != held:
                    if held is not None:
                        self.guard.release(held)
                        held = None
                    self.guard.acquire(hosts[_i])
                    held = hosts[_i]
                self._one(url, depth, seq, row_kind, page_url, status, depth_c,
                          parent_seq, emit_ord, file_url, link_url, meta_json,
                          doc_id, error, span_offsets, sp_kind, sp_text, sp_ref,
                          sp_off, span_row_idx)
        finally:
            if held is not None:
                self.guard.release(held)

        return self._assemble(row_kind, page_url, status, depth_c,
                              parent_seq, emit_ord, file_url, link_url,
                              meta_json, doc_id, error, span_offsets, sp_kind,
                              sp_text, sp_ref, sp_off, span_row_idx)

    def _one(self, url, depth, seq, row_kind, page_url, status, depth_c,
             parent_seq, emit_ord, file_url, link_url, meta_json, doc_id,
             error, span_offsets, sp_kind, sp_text, sp_ref, sp_off,
             span_row_idx) -> None:
        try:
            resp = self.session.get(url)
        except Exception as e:  # retries exhausted (parser.py:88-94 path)
            row_kind.append("error"); page_url.append(url); status.append(-1)
            depth_c.append(depth); parent_seq.append(seq); emit_ord.append(-1)
            file_url.append(""); link_url.append(""); meta_json.append("")
            doc_id.append(""); error.append(str(e))
            return
        if not (200 <= resp.status_code < 300):
            row_kind.append("error"); page_url.append(url); status.append(resp.status_code)
            depth_c.append(depth); parent_seq.append(seq); emit_ord.append(-1)
            file_url.append(""); link_url.append(""); meta_json.append("")
            doc_id.append(""); error.append("http status")
            return
        spans, emissions = self.rules.parse(resp, session=self.session)
        if self.emit_docs:
            row_kind.append("doc"); page_url.append(url); status.append(resp.status_code)
            depth_c.append(depth); parent_seq.append(seq); emit_ord.append(-1)
            file_url.append(""); link_url.append(""); meta_json.append("")
            doc_id.append(url); error.append("")
            span_row_idx.append(len(row_kind) - 1)
            for i, (k, t, r) in enumerate(spans):
                sp_kind.append(k); sp_text.append(t); sp_ref.append(r); sp_off.append(i)
            span_offsets.append(len(sp_kind))
        for ord_, em in enumerate(emissions):
            if em[0] == "task":
                row_kind.append("task"); file_url.append(em[1]); link_url.append("")
                meta_json.append(em[2])
            elif em[0] == "photo":
                # deferred Flickr getSizes (SURVEY P6): file_url carries
                # the sizes-request URL until FlickrSizes resolves it
                row_kind.append("photo"); file_url.append(em[1]); link_url.append("")
                meta_json.append(em[2])
            else:
                row_kind.append("link"); file_url.append(""); link_url.append(em[1])
                meta_json.append("")
            page_url.append(url); status.append(resp.status_code)
            depth_c.append(depth); parent_seq.append(seq); emit_ord.append(ord_)
            doc_id.append(""); error.append("")

    def _assemble(self, row_kind, page_url, status, depth_c, parent_seq,
                  emit_ord, file_url, link_url, meta_json, doc_id, error,
                  span_offsets, sp_kind, sp_text, sp_ref, sp_off,
                  span_row_idx) -> pa.Table:
        import numpy as np

        total = len(row_kind)
        if self.slim:
            # slim schema for throughput mode: ints + the two URL columns
            # only — halves the bytes materialized per round
            out = pa.table(
                {
                    "row_kind": pa.array(row_kind, type=pa.string()),
                    "status": pa.array(status, type=pa.int32()),
                    "depth": pa.array(depth_c, type=pa.int32()),
                    "parent_seq": pa.array(parent_seq, type=pa.int64()),
                    "emit_ord": pa.array(emit_ord, type=pa.int32()),
                    "file_url": pa.array(file_url, type=pa.string()),
                    "link_url": pa.array(link_url, type=pa.string()),
                }
            )
            return self._finish(out, file_url, link_url, parent_seq, emit_ord)
        # spans column: null for non-doc rows; doc rows take consecutive
        # slices of the flat struct array.
        struct = pa.StructArray.from_arrays(
            [pa.array(sp_kind, type=pa.string()), pa.array(sp_text, type=pa.string()),
             pa.array(sp_ref, type=pa.string()), pa.array(sp_off, type=pa.int32())],
            fields=list(schemas.SPAN_STRUCT),
        )
        # doc rows take consecutive slices of the flat struct array; other
        # rows get empty slices and a null mask.
        offsets = np.zeros(total + 1, dtype=np.int32)
        mask = np.ones(total, dtype=bool)  # True = null (pyarrow mask convention)
        if span_row_idx:
            mask[np.asarray(span_row_idx)] = False
        pos = 0
        doc_iter = iter(zip(span_row_idx, span_offsets[1:]))
        nxt = next(doc_iter, None)
        for i in range(total):
            offsets[i] = pos
            if nxt is not None and i == nxt[0]:
                pos = nxt[1]
                nxt = next(doc_iter, None)
        offsets[total] = pos
        spans_arr = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), struct,
            mask=pa.array(mask) if total else None,
        )

        out = pa.table(
            {
                "row_kind": pa.array(row_kind, type=pa.string()),
                "page_url": pa.array(page_url, type=pa.string()),
                "status": pa.array(status, type=pa.int32()),
                "depth": pa.array(depth_c, type=pa.int32()),
                "parent_seq": pa.array(parent_seq, type=pa.int64()),
                "emit_ord": pa.array(emit_ord, type=pa.int32()),
                "file_url": pa.array(file_url, type=pa.string()),
                "link_url": pa.array(link_url, type=pa.string()),
                "meta_json": pa.array(meta_json, type=pa.string()),
                "doc_id": pa.array(doc_id, type=pa.string()),
                "spans": spans_arr,
                "error": pa.array(error, type=pa.string()),
            },
            schema=FETCH_PARSE_SCHEMA,
        )
        return self._finish(out, file_url, link_url, parent_seq, emit_ord)

    def _finish(self, out: pa.Table, file_url, link_url, parent_seq, emit_ord) -> pa.Table:
        import numpy as np

        if self.with_keys:
            # one vectorized pass: tasks use file_url, links use link_url.
            # Only the 64-bit hash ships (dedup/seen key); the canonical
            # string is recomputed downstream for the few admitted rows —
            # shipping it for every emission would double the table bytes.
            merged = pd.Series(file_url, dtype="string")
            lnk = pd.Series(link_url, dtype="string")
            merged = merged.mask(merged == "", lnk)
            canon = canonicalize(merged)
            uh = hash_urls(canon.fillna(""))
            out = out.append_column("url_hash", pa.array(uh, type=pa.uint64()))
            # int64 bit-view of the hash: Ray's sort/groupby machinery
            # round-trips keys through int64; raw uint64 overflows it
            out = out.append_column("url_hash_i", pa.array(uh.view(np.int64)))
            # packed order key: min over a hash group == min (parent_seq,
            # emit_ord). Fits int64 up to parent_seq < 2^43 (8.8e12 pages,
            # above the 10^10 design point) with emit_ord < 2^20 per page.
            packed = (np.asarray(parent_seq, dtype=np.int64) << np.int64(20)) + np.asarray(
                emit_ord, dtype=np.int64)
            out = out.append_column("packed", pa.array(packed, type=pa.int64()))
        if self.claim is not None:
            from icrawler_ray.state.seen import route_claims

            # claim_round is set per round by make_fetch_parse_fn on the
            # cached instance (rounds run sequentially): the shard-side
            # fence drops any straggler tagged with an older round
            route_claims(out, *self.claim,
                         round_idx=getattr(self, "claim_round", None))
        return out


_FP_CACHE: dict = {}


def make_fetch_parse_fn(url_map_ref, rules: str, rules_kwargs: dict | None = None,
                        emit_docs: bool = True, with_keys: bool = False,
                        claim: tuple | None = None, slim: bool = False,
                        inflight: str | None = None,
                        claim_round: int | None = None):
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
        session_spec_key(url_map_ref),
        rules, _json.dumps(rules_kwargs or {}, sort_keys=True, default=repr),
        emit_docs, with_keys, claim, slim, inflight,
    )

    def fn(batch: pa.Table) -> pa.Table:
        fp = _FP_CACHE.get(key)
        if fp is None:
            fp = FetchParse(url_map_ref, rules, rules_kwargs, emit_docs=emit_docs,
                            with_keys=with_keys, claim=claim, slim=slim,
                            inflight=inflight)
            _FP_CACHE[key] = fp
        # round tag rides on the closure, NOT the cache key: the cached
        # session/state survives across rounds while each round's claims
        # carry its own fence tag (rounds execute sequentially)
        fp.claim_round = claim_round
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
