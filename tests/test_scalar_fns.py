"""Filter DSLs (F1-F4), Baidu cipher (P5), HTML scanner, retry policy."""

import datetime

import pandas as pd
import pytest

from icrawler_ray.functions.baidu_cipher import CHAR_MAP, TOKENS, decode_batch, decode_url, encode_url
from icrawler_ray.functions.filters import baidu_filter, bing_filter, google_filter
from icrawler_ray.functions.html import render_page, scan_page
from icrawler_ray.functions.retry import RetryableError, retrying

# ------------------------------------------------------------------ cipher


def test_cipher_known_mapping():
    # token stage: _z2C$q -> ':', _z&e3B -> '.', AzdH3F -> '/'
    assert decode_url("ippr_z2C$qAzdH3FAzdH3F") == "http://"
    # char stage spot checks from the reference map (baidu.py:85-121)
    assert decode_url("w") == "a" and decode_url("8") == "1" and decode_url("a") == "0"


def test_cipher_roundtrip_and_batch():
    urls = [
        "http://img1.example.com/i/5.jpg",
        "https://a.b/c_d.png?x=1&y=2",
        "http://t1.baidu.com/it/u=123,456&fm=21",
    ]
    for u in urls:
        assert decode_url(encode_url(u)) == u
    enc = pd.Series([encode_url(u) for u in urls])
    assert decode_batch(enc).tolist() == urls


def test_cipher_full_char_map():
    for cipher, plain in CHAR_MAP.items():
        assert decode_url(cipher) == plain
    for cipher, plain in TOKENS.items():
        assert decode_url(cipher) == plain


# ----------------------------------------------------------------- filters


def test_google_filter_fragments():
    f = google_filter()
    assert f.apply({"type": "linedrawing"}) == "itp:lineart"
    assert f.apply({"type": "photo"}) == "itp:photo"
    assert f.apply({"color": "blackandwhite"}) == "ic:gray"
    assert f.apply({"color": "red"}) == "ic:specific,isc:red"
    assert f.apply({"size": "large"}) == "isz:l"
    assert f.apply({"size": ">4mp"}) == "isz:lt,islt:4mp"
    assert f.apply({"size": "=640x480"}) == "isz:ex,iszw:640,iszh:480"
    assert f.apply({"license": "commercial,modify"}) == "sur:fmc"
    assert f.apply({"date": "pastweek"}) == "qdr:w"
    assert f.apply({"date": "anytime"}) == ""
    got = f.apply({"date": ((2020, 1, 2), datetime.date(2021, 3, 4))})
    assert got == "cdr:1,cd_min:01/02/2020,cd_max:03/04/2021"
    assert f.apply({"type": "photo", "size": "large"}, sep=",") == "itp:photo,isz:l"


def test_filter_validation_errors():
    f = google_filter()
    with pytest.raises(KeyError):
        f.apply({"bogus": 1})
    with pytest.raises(ValueError):
        f.apply({"type": "oilpainting"})
    with pytest.raises(TypeError):
        f.apply({"date": 42})
    assert f.apply(None) == ""


def test_bing_filter_fragments():
    f = bing_filter()
    assert f.apply({"type": "animated"}) == "+filterui:photo-animatedgif"
    assert f.apply({"color": "red"}) == "+filterui:color2-FGcls_RED"
    assert f.apply({"color": "blackandwhite"}) == "+filterui:color2-bw"
    assert f.apply({"size": "extralarge"}) == "+filterui:imagesize-wallpaper"
    assert f.apply({"size": ">800x600"}) == "+filterui:imagesize-custom_800_600"
    assert f.apply({"license": "commercial"}) == "+filterui:license-L2_L3_L4"
    assert f.apply({"layout": "wide"}) == "+filterui:aspect-wide"
    assert f.apply({"people": "face"}) == "+filterui:face-face"
    assert f.apply({"date": "pastmonth"}) == "+filterui:age-lt43200"


def test_baidu_filter_fragments():
    f = baidu_filter()
    assert f.apply({"type": "animated"}) == "s=0&lm=6&st=-1&face=0"
    assert f.apply({"color": "blue"}) == "ic=16"
    assert f.apply({"size": "extralarge"}) == "z=9"
    assert f.apply({"size": "=300x200"}, sep="&") == "width=300&height=200"
    with pytest.raises(ValueError):
        f.apply({"size": ">800x600"})  # baidu has no > form


# -------------------------------------------------------------------- html


def test_html_roundtrip():
    spans = [
        ("text", "hello world", ""),
        ("media", "", "http://img.com/a.jpg"),
        ("link", "", "/p/1.html"),
        ("media", "", "//img.com/b.png"),
        ("text", "tail", ""),
    ]
    assert scan_page(render_page(spans)) == spans


def test_html_attribute_noise():
    body = '<img class="x" src="http://a/i.jpg" width=3><a rel="nofollow" href="/p.html">t</a>'
    assert scan_page(body) == [("media", "", "http://a/i.jpg"), ("link", "", "/p.html")]


# ------------------------------------------------------------------- retry


def test_retrying_gives_up_and_succeeds():
    calls = {"n": 0}

    @retrying(max_attempts=3, sleep=lambda s: None)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RetryableError("boom")
        return "ok"

    assert flaky() == "ok" and calls["n"] == 3

    @retrying(max_attempts=3, sleep=lambda s: None)
    def always():
        raise RetryableError("nope")

    with pytest.raises(RetryableError):
        always()


# ------------------------------------------------------- CDC chunking

def test_cdc_chunk_spans_cover_text_exactly():
    from icrawler_ray.stages.textfns import cdc_chunk_spans

    for t in ["", "ab", "abcd", "the quick brown fox " * 37,
              "é中文 mixed unicode content " * 23]:
        starts, ends = cdc_chunk_spans(t)
        assert "".join(t[a:b] for a, b in zip(starts, ends)) == t
        if t:
            assert starts[0] == 0 and ends[-1] == len(t)
            assert (ends > starts).all()


def test_cdc_chunking_is_shift_robust():
    """A shared region keeps its interior chunk identities when its
    offset shifts — the property paragraph/fixed chunking lacks."""
    from icrawler_ray.stages.textfns import cdc_chunk_spans

    shared = ("common duplicated passage that appears in two documents "
              "with different prefixes and should still dedup " * 8)
    a = "short prefix. " + shared
    b = "a much longer and entirely different prefix sentence here! " + shared

    def chunks(t):
        s, e = cdc_chunk_spans(t)
        return [t[x:y] for x, y in zip(s, e)]

    ca, cb = chunks(a), chunks(b)
    # chunks of `a` lying fully inside the shared region (by offset)
    sa, ea = cdc_chunk_spans(a)
    interior = [a[x:y] for x, y in zip(sa, ea)
                if x >= len("short prefix. ") + 60 and y < len(a) - 60]
    assert len(interior) >= 3
    # every interior chunk identity must reappear in the shifted doc
    missing = [c for c in interior if c not in set(cb)]
    assert not missing
