"""Live-network session adapter (SURVEY.md T1; VERDICT r1 missing #1).

Real-HTTP counterpart of the hermetic stub behind the same
``make_session`` interface, with the reference Session's semantics
(/root/reference/icrawler/utils/session.py:14-59):

- per-instance (= per map_batches actor) ``requests.Session`` with its own
  cookie jar; ``Set-Cookie`` responses update the jar (session.py:56-57)
- default headers from defaults.DEFAULT_HEADERS, caller-extendable
  (crawler.py:129-142 set_session wiring)
- retry on ``requests.RequestException`` with MAX_RETRIES attempts and
  random-exponential backoff of base BACKOFF_BASE (session.py:29-33) —
  the same policy object as the hermetic stub (functions/retry.py)
- ``raise_for_status()`` INSIDE the retry, so transient 5xx responses are
  retried and a final non-2xx propagates as HTTPError (session.py:58)
- optional ProxyPool integration with weight feedback: the proxy's weight
  increases on success and decreases on transport failure
  (session.py:44-52, state/proxy.py)

``requests`` is imported lazily so the hermetic test environment never
needs it on the module import path.
"""

from __future__ import annotations

import time
from urllib.parse import urlsplit

from icrawler_ray.defaults import DEFAULT_HEADERS
from icrawler_ray.functions.retry import retrying


class LiveSession:
    def __init__(self, headers=None, cookies=None, proxy_state=None,
                 timeout: float = 5.0, sleep=time.sleep, rng=None):
        import requests

        if sleep is None:  # spec-form ("live", {"sleep": None}): no backoff
            sleep = lambda _s: None  # noqa: E731

        self._requests = requests
        self._s = requests.Session()
        self._s.headers.update(DEFAULT_HEADERS)
        if headers:
            self._s.headers.update(headers)
        if cookies:
            self._s.cookies.update(cookies)
        self.proxy_state = proxy_state
        self.timeout = timeout
        self.request_count = 0
        self._get = retrying(retry_on=(requests.RequestException,),
                             sleep=sleep, rng=rng)(self._request_once)

    @property
    def cookies(self):
        return self._s.cookies

    @property
    def headers(self):
        return self._s.headers

    def _request_once(self, url: str):
        self.request_count += 1
        if self.proxy_state is not None:
            proxy = self.proxy_state.get_next(urlsplit(url).scheme or "http")
        else:
            proxy = None
        try:
            resp = self._s.get(
                url, timeout=self.timeout,
                proxies=proxy.format() if proxy is not None else None,
            )
        except self._requests.RequestException:
            if proxy is not None:
                self.proxy_state.decrease_weight(proxy)
            raise
        if proxy is not None:
            self.proxy_state.increase_weight(proxy)
        if "set-cookie" in resp.headers:
            self._s.cookies.update(resp.cookies)
        resp.raise_for_status()
        return resp

    def get(self, url: str, timeout=None, headers=None):
        """Fetch with retry; returns a requests.Response (``.url``,
        ``.status_code``, ``.content`` — the stage contract shared with
        StubResponse)."""
        return self._get(url)
