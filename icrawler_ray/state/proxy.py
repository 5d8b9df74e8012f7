"""Weighted proxy pool (SURVEY.md T3).

Reimplements the reference ProxyPool semantics
(/root/reference/icrawler/utils/proxy_pool.py:12-150) as plain state that
can live either as a singleton named Ray actor (shared weights) or as a
per-fetch-actor copy (weight updates are commutative multiplicative, so
per-actor copies converge — the documented trade-off):

- get_next(protocol): weighted random choice with weight-rejection
  resampling (proxy_pool.py:140-141)
- increase_weight: w = min(1, w / 0.9); decrease_weight: w *= 0.9;
  remove below 0.2 (the reference's multiplicative update constants)
- scanners (the reference scrapes 4 public proxy sites,
  proxy_pool.py:225-355) are a live-web concern: here a file loader plus
  a ``register_scanner`` plugin hook mirror the offline surface.

No live validation threads: the stub web has no proxies to validate; the
validation hook is injectable for real deployments.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field

import ray

WEIGHT_DECAY = 0.9
MIN_WEIGHT = 0.2


@dataclass
class Proxy:
    addr: str
    protocol: str = "http"  # "http" | "https"
    weight: float = 1.0
    last_checked: int = 0

    def format(self) -> dict:
        return {self.protocol: f"{self.protocol}://{self.addr}"}


@dataclass
class ProxyPoolState:
    proxies: dict[str, list] = field(default_factory=lambda: {"http": [], "https": []})
    rng: random.Random = field(default_factory=lambda: random.Random(0))

    def add(self, proxy: Proxy) -> None:
        self.proxies.setdefault(proxy.protocol, []).append(proxy)

    def get_next(self, protocol: str = "http") -> Proxy | None:
        """Weighted choice with weight-rejection resampling: draw a
        candidate uniformly, accept with probability = weight
        (proxy_pool.py:133-143 semantics)."""
        pool = self.proxies.get(protocol) or []
        if not pool:
            return None
        for _ in range(64):
            cand = pool[self.rng.randrange(len(pool))]
            if self.rng.random() < cand.weight:
                return cand
        return max(pool, key=lambda p: p.weight)

    def increase_weight(self, proxy: Proxy) -> None:
        proxy.weight = min(1.0, proxy.weight / WEIGHT_DECAY)

    def decrease_weight(self, proxy: Proxy) -> None:
        proxy.weight *= WEIGHT_DECAY
        if proxy.weight < MIN_WEIGHT:
            pool = self.proxies.get(proxy.protocol) or []
            if proxy in pool:
                pool.remove(proxy)

    def load_file(self, path: str) -> int:
        """File scanner (proxy_pool.py file format: one JSON per line or
        addr per line)."""
        n = 0
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                    self.add(Proxy(addr=rec["addr"], protocol=rec.get("protocol", "http"),
                                   weight=float(rec.get("weight", 1.0))))
                except (ValueError, KeyError):
                    self.add(Proxy(addr=line))
                n += 1
        return n


_SCANNERS: dict[str, callable] = {}


def register_scanner(name: str, fn) -> None:
    """Plugin hook mirroring proxy_pool.py:378-386 (register_func)."""
    _SCANNERS[name] = fn


def run_scanner(name: str, state: ProxyPoolState, **kwargs) -> int:
    return _SCANNERS[name](state, **kwargs)


@ray.remote(num_cpus=0)
class ProxyPoolActor:
    """Singleton shared pool (named actor). Fetch stages call
    ``get_next``/``report`` per request when configured with one."""

    def __init__(self, seed: int = 0):
        self.state = ProxyPoolState(rng=random.Random(seed))

    def add(self, addr: str, protocol: str = "http", weight: float = 1.0) -> None:
        self.state.add(Proxy(addr=addr, protocol=protocol, weight=weight))

    def get_next(self, protocol: str = "http"):
        p = self.state.get_next(protocol)
        return None if p is None else (p.addr, p.protocol, p.weight)

    def report(self, addr: str, protocol: str, success: bool) -> None:
        pool = self.state.proxies.get(protocol) or []
        for p in pool:
            if p.addr == addr:
                (self.state.increase_weight if success else self.state.decrease_weight)(p)
                return

    def snapshot(self) -> list[tuple]:
        return [
            (p.addr, p.protocol, round(p.weight, 4))
            for pool in self.state.proxies.values() for p in pool
        ]
