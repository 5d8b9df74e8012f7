"""In-process HTTP session stub (hermetic replacement for requests.Session).

Mirrors the *contract* of the reference's retrying session
(/root/reference/icrawler/utils/session.py:14-59): ``get(url)`` returns a
response with ``.url``, ``.status_code``, ``.content``; transport errors are
retried up to 3 attempts with random-exponential backoff (here: injectable
sleep, deterministic RNG). Divergence from the reference, by design: cookie
jars are per-session (per actor) rather than process-global — the stub sets
no cookies, so the hermetic fixtures can't observe the difference
(SURVEY.md §7.4).

The URL map is built once by the driver from a SynthWeb and shipped to every
actor via ``ray.put`` (broadcast once, zero-copy reads), never per batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from icrawler_ray.functions.retry import RetryableError, retrying


@dataclass
class StubResponse:
    url: str
    status_code: int
    content: bytes

    @property
    def text(self) -> str:
        return self.content.decode("utf-8", "ignore")


class StubSession:
    """Serves (status, body) from an in-memory url map.

    ``flaky`` maps url -> number of transport failures to raise before
    succeeding (exercises the retry path, parser.py:82-94 semantics).
    """

    def __init__(self, url_map: dict[str, tuple[int, bytes]], flaky: dict[str, int] | None = None,
                 latency_cb=None):
        self._map = url_map
        self._flaky = dict(flaky or {})
        self._latency_cb = latency_cb  # optional hook for politeness tests
        self.request_count = 0

        @retrying(sleep=lambda s: None)
        def _get(url: str) -> StubResponse:
            self.request_count += 1
            if self._flaky.get(url, 0) > 0:
                self._flaky[url] -= 1
                raise RetryableError(f"transient failure for {url}")
            if self._latency_cb is not None:
                self._latency_cb(url)
            key = url.rstrip("/") if url not in self._map else url
            if key in self._map:
                status, body = self._map[key]
                return StubResponse(url=url, status_code=status, content=body)
            return StubResponse(url=url, status_code=404, content=b"not found")

        self._get = _get

    def get(self, url: str, timeout=None, headers=None) -> StubResponse:
        return self._get(url)

    def get_many(self, urls: list) -> list:
        """Batched fetch: models ONE multiplexed round-trip for the whole
        batch (what a pipelined HTTP/2 connection or a concurrent pool
        amortizes to) — request_count increases by 1 per call, which is
        what the FlickrSizes round-trip test measures.  Per-url retry /
        flaky semantics are unchanged."""
        before = self.request_count
        out = [self._get(u) for u in urls]
        self.request_count = before + (1 if urls else 0)
        return out


def make_session(spec, flaky: dict | None = None):
    """Session factory used by the fetch stages.

    spec forms:
      dict                      -> StubSession over the literal url map
      ray.ObjectRef             -> StubSession over a broadcast url map
      ("procedural", params)    -> ProceduralSession (zero shared state;
                                   bodies synthesized on fetch — the
                                   bench/scale path)
      ("live", kwargs)          -> LiveSession (real requests.Session with
                                   the reference's retry/cookie/header
                                   semantics, functions/live_session.py)
    """
    import ray

    if isinstance(spec, tuple) and len(spec) == 2 and spec[0] == "procedural":
        from icrawler_ray.synthweb.procedural import ProceduralSession

        return ProceduralSession(spec[1])
    if isinstance(spec, tuple) and len(spec) == 2 and spec[0] == "live":
        from icrawler_ray.functions.live_session import LiveSession

        return LiveSession(**(spec[1] or {}))
    url_map = ray.get(spec) if isinstance(spec, ray.ObjectRef) else spec
    return StubSession(url_map, flaky=flaky)


def session_spec_key(spec) -> str:
    """Stable hashable cache key for a session spec."""
    import json

    if isinstance(spec, tuple) and spec and spec[0] in ("procedural", "live"):
        return spec[0] + ":" + json.dumps(spec[1], sort_keys=True, default=str)
    return spec.hex() if hasattr(spec, "hex") else str(id(spec))
