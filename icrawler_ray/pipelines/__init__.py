from icrawler_ray.pipelines.greedy import GreedyCrawl, greedy_crawl  # noqa: F401
from icrawler_ray.pipelines.search import search_crawl  # noqa: F401
from icrawler_ray.pipelines.urllist import urllist_crawl  # noqa: F401
