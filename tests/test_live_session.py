"""LiveSession parity with the reference's retrying requests.Session
(/root/reference/icrawler/utils/session.py:14-59), exercised against an
in-process HTTP handler on loopback — no external network."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from icrawler_ray.defaults import DEFAULT_HEADERS
from icrawler_ray.functions.live_session import LiveSession
from icrawler_ray.synthweb.fetchstub import make_session

PAGE = b'<html><body><a href="/p/next.html">x</a><img src="http://f.com/a.jpg"/></body></html>'


class Handler(BaseHTTPRequestHandler):
    flaky_left = {}

    def log_message(self, *a):
        pass

    def do_GET(self):
        if self.path == "/ok.html":
            self.send_response(200)
            self.end_headers()
            self.wfile.write(PAGE)
        elif self.path == "/headers":
            self.send_response(200)
            self.end_headers()
            self.wfile.write(json.dumps(dict(self.headers)).encode())
        elif self.path == "/setcookie":
            self.send_response(200)
            self.send_header("Set-Cookie", "sid=abc123; Path=/")
            self.end_headers()
            self.wfile.write(b"ok")
        elif self.path == "/flaky":
            left = Handler.flaky_left.get("flaky", 0)
            if left > 0:
                Handler.flaky_left["flaky"] = left - 1
                self.send_response(503)
                self.end_headers()
                self.wfile.write(b"unavailable")
            else:
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"recovered")
        else:
            self.send_response(404)
            self.end_headers()
            self.wfile.write(b"nope")


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_live_session_basics_headers_cookies(server):
    s = LiveSession(headers={"X-Extra": "1"}, sleep=lambda _: None)
    r = s.get(server + "/ok.html")
    assert r.status_code == 200 and r.content == PAGE

    seen = json.loads(s.get(server + "/headers").content)
    # default headers ride every request (session.py:21-22 + defaults)
    assert seen.get("User-Agent") == DEFAULT_HEADERS["User-Agent"]
    assert seen.get("X-Extra") == "1"

    # Set-Cookie updates the per-session jar and is replayed (session.py:56-57)
    s.get(server + "/setcookie")
    assert s.cookies.get("sid") == "abc123"
    seen = json.loads(s.get(server + "/headers").content)
    assert "sid=abc123" in seen.get("Cookie", "")


def test_live_session_retries_5xx_then_succeeds(server):
    Handler.flaky_left["flaky"] = 2  # two 503s, third attempt succeeds
    s = LiveSession(sleep=lambda _: None)
    r = s.get(server + "/flaky")
    assert r.status_code == 200 and r.content == b"recovered"
    assert s.request_count == 3  # MAX_RETRIES attempts, last wins

    # a persistent non-2xx exhausts the retries and propagates (HTTPError)
    import requests

    s2 = LiveSession(sleep=lambda _: None)
    with pytest.raises(requests.HTTPError):
        s2.get(server + "/missing")
    assert s2.request_count == 3


def test_live_session_proxy_weight_feedback(server):
    from icrawler_ray.state.proxy import Proxy, ProxyPoolState

    st = ProxyPoolState()
    # loopback "proxy" that cannot accept connections -> transport error
    bad = Proxy("127.0.0.1:1", protocol="http")
    st.add(bad)
    import requests

    s = LiveSession(proxy_state=st, timeout=0.5, sleep=lambda _: None)
    with pytest.raises(requests.RequestException):
        s.get(server + "/ok.html")
    assert bad.weight < 1.0  # decreased on every failed attempt


def test_fetch_parse_over_live_session(server, ray_session):
    """FetchParse drives the live adapter end-to-end: make_session(('live',
    ...)) inside the stage, parse spans/emissions from a real HTTP body."""
    from icrawler_ray.stages.fetch_parse import FetchParse

    fp = FetchParse(("live", {"sleep": None}), "greedy",
                    {"domains": [server]})
    # sleep=None is not picklable-friendly for the spec key; build directly
    batch = pa.table({"url": [server + "/ok.html", server + "/missing"]})
    out = fp(batch).to_pandas()
    ok = out[out.page_url == server + "/ok.html"]
    assert set(ok.row_kind) >= {"doc", "link", "task"}
    assert (out[out.page_url == server + "/missing"].row_kind == "error").all()
