from icrawler_ray.state.bloom import BloomFilter  # noqa: F401
from icrawler_ray.state.cuckoo import CuckooFilter  # noqa: F401
from icrawler_ray.state.seen import ShardedSeenSet  # noqa: F401
