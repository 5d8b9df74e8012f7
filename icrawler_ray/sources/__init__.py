from icrawler_ray.sources.seeds import (  # noqa: F401
    baidu_search_urls,
    bing_search_urls,
    flickr_search_urls,
    google_search_urls,
    seed_dataset,
    simple_se_urls,
    url_list_seeds,
)
