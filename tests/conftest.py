import logging

import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def web():
    from icrawler_ray.synthweb.generate import add_search_fixtures, make_synthweb

    w = make_synthweb(n_pages=100, n_hosts=4, seed=42)
    add_search_fixtures(w, keyword="cat")
    return w


@pytest.fixture(scope="session")
def url_map(web):
    return web.url_map()


@pytest.fixture(scope="session")
def url_map_ref(url_map, ray_session):
    return ray.put(url_map)
