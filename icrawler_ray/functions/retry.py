"""Retry policy (SURVEY.md T2).

The reference wraps Session.request with tenacity: 3 attempts,
random-exponential backoff with exp_base 1.2, retrying on RequestException
(/root/reference/icrawler/utils/session.py:29-33,
/root/reference/icrawler/defaults.py:1-2). tenacity is not installed here,
so this is a tiny equivalent with an injectable sleep (tests/stub pass
``sleep=lambda s: None``) and a seeded RNG for deterministic backoff.
"""

from __future__ import annotations

import random
import time
from functools import wraps

from icrawler_ray.defaults import BACKOFF_BASE, MAX_RETRIES


class RetryableError(Exception):
    """Transport-level error that should be retried (stands in for
    requests.RequestException in hermetic mode)."""


def retrying(max_attempts=MAX_RETRIES, exp_base=BACKOFF_BASE, retry_on=(RetryableError,),
             sleep=time.sleep, rng=None):
    rng = rng or random.Random(0)

    def deco(fn):
        @wraps(fn)
        def wrapper(*args, **kwargs):
            last = None
            for attempt in range(max_attempts):
                try:
                    return fn(*args, **kwargs)
                except retry_on as e:  # noqa: PERF203
                    last = e
                    if attempt < max_attempts - 1:
                        sleep(rng.uniform(0, exp_base**attempt))
            raise last

        return wrapper

    return deco
