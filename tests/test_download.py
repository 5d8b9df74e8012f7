"""Download stage D1-D5: size gates (boundary-inclusive), status gate
(intended, non-inverted), filename extension whitelist."""

import pyarrow as pa

from icrawler_ray.stages.download import Fetcher, size_gt, size_lt
from icrawler_ray.synthweb import fakeimg


def test_size_gates_both_dims_and_boundaries():
    # _size_gt: max>=max and min>=min (downloader.py:239-240)
    assert size_gt((100, 200), (100, 200))          # exact boundary kept
    assert size_gt((200, 100), (100, 200))          # orientation-agnostic
    assert not size_gt((99, 200), (100, 200))
    assert size_lt((100, 200), (100, 200))
    assert not size_lt((100, 201), (100, 200))


def _run_fetcher(url_map, urls, **kw):
    f = Fetcher(url_map, **kw)
    return f(pa.table({"file_url": urls}))


def test_fetcher_status_and_decode_gates():
    url_map = {
        "http://a/ok.jpg": (200, fakeimg.encode(50, 60)),
        "http://a/small.jpg": (200, fakeimg.encode(5, 5)),
        "http://a/broken.jpg": (200, b"NOTANIMAGE"),
        "http://a/gone.jpg": (404, b"x"),
        "http://a/err.jpg": (500, b"x"),
    }
    out = _run_fetcher(
        url_map,
        list(url_map) + ["http://a/missing.jpg"],
        min_size=(10, 10),
    ).to_pandas().set_index("file_url")
    assert out.loc["http://a/ok.jpg", "success"]
    assert out.loc["http://a/ok.jpg", "img_w"] == 50
    assert not out.loc["http://a/small.jpg", "success"]       # size gate
    assert not out.loc["http://a/broken.jpg", "success"]      # undecodable (PIL-reject path)
    assert not out.loc["http://a/gone.jpg", "success"]        # 404: intended 2xx gate
    assert out.loc["http://a/gone.jpg", "status"] == 404
    assert not out.loc["http://a/err.jpg", "success"]
    assert not out.loc["http://a/missing.jpg", "success"]     # stub 404


def test_fetcher_keep_content_flag():
    url_map = {"http://a/ok.jpg": (200, fakeimg.encode(50, 60, b"payload"))}
    with_c = _run_fetcher(url_map, ["http://a/ok.jpg"]).to_pandas()
    without = _run_fetcher(url_map, ["http://a/ok.jpg"], keep_content=False).to_pandas()
    assert with_c.content[0] is not None and without.content[0] is None


def test_filename_ext_whitelist(ray_session, url_map_ref):
    """ImageDownloader.get_filename whitelist (downloader.py:265-274):
    non-image extensions fall back to default_ext."""
    import ray

    from icrawler_ray.stages.download import assign_filenames
    from icrawler_ray.synthweb import fakeimg as fi

    url_map = {
        "http://a/x.png": (200, fi.encode(10, 10)),
        "http://a/y.exe": (200, fi.encode(10, 10)),
        "http://a/noext": (200, fi.encode(10, 10)),
        "http://a/z.TIFF": (200, fi.encode(10, 10)),
    }
    ds = ray.data.from_items([{"file_url": u, "seq": i} for i, u in enumerate(url_map)])
    fetched = ds.map_batches(
        Fetcher, fn_constructor_kwargs={"url_map_ref": ray.put(url_map)},
        batch_format="pyarrow", concurrency=1,
    )
    out = assign_filenames(fetched, ["seq"], default_ext="jpg").to_pandas()
    names = dict(zip(out.file_url, out.filename))
    assert names["http://a/x.png"] == "000001.png"
    assert names["http://a/y.exe"] == "000002.jpg"   # whitelist fallback
    assert names["http://a/noext"] == "000003.jpg"
    assert names["http://a/z.TIFF"] == "000004.TIFF"  # case-insensitive check, original kept
