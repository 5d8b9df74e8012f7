"""ray-frontier-crawl: a Ray-Data-native distributed crawl/data engine.

From-scratch reimplementation of the query/data-processing capabilities of
hellock/icrawler (reference snapshot at /root/reference, cited per-module as
``file:line``) as idiomatic ``ray.data.Dataset`` pipelines:

- seed expansion + search-filter DSLs as plan-time functions (``sources/``)
- fetch/parse and download as ``map_batches`` actor pools over zero-copy
  Arrow batches (``stages/``)
- URL dedup as a hash-partitioned sharded bloom+cuckoo seen-set (``state/``)
- per-host politeness/robots gating as groupby(host)->sort(priority)
  shuffles (``stages/politeness.py``)
- outputs as tables of interleaved text+media documents
  (doc_id, spans: list<struct<kind, text, media_ref, offset>>)

Everything is hermetic: the synthetic web (``synthweb/``) replaces the live
network for tests and benchmarks.
"""

import logging as _logging

from icrawler_ray import schemas  # noqa: F401
from icrawler_ray.defaults import DEFAULT_HEADERS, MAX_RETRIES  # noqa: F401

# Ray 2.49 logs a benign "Failed to hash the schemas (for deduplication):
# unhashable type: 'dict'" warning whenever a pandas-block UDF output meets
# its schema-dedup fast path (ray/data/_internal/arrow_ops/
# transform_pyarrow.py:181 — a missed optimization, not an error). Every
# worker imports this package for its UDFs, so silencing the one logger
# here keeps per-worker stderr clean without masking other ray.data
# warnings.
_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).setLevel(_logging.ERROR)

__version__ = "0.1.0"
