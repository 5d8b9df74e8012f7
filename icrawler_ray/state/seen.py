"""Sharded URL-seen set (SURVEY.md Q1-Q3; the north-rule dedup core).

The reference's seen-set is a per-queue OrderedDict
(/root/reference/icrawler/utils/cached_queue.py:26-51): O(1) membership,
single-threaded, unbounded memory, lost on crash. This engine shards it:

    shard(key) = url_hash % S      (url_hash = SipHash64 of canonical URL)

Each shard is a named Ray actor holding a bloom pre-filter + a cuckoo
filter (deletable, bounded FP). Candidates are routed to shards with a
``groupby(shard)`` shuffle — each group makes exactly ONE actor call per
round, batching all its keys (no per-row RPCs). At cluster scale the S
actors spread across nodes and the groupby is the hash-partitioned
exchange the north rule prescribes.

``filter_and_insert`` is atomic per shard: membership test + insert of the
novel keys in one call, so a key seen twice in different rounds is admitted
exactly once. Within-round duplicates are removed by an exact
``groupby(url_canon)`` first (cached_queue dedup is insertion-ordered;
the engine keeps the candidate with the smallest order key).

Checkpoint: each shard serializes (bloom, cuckoo, counters) to bytes;
restore rebuilds actors from payloads (state/checkpoint.py).
"""

from __future__ import annotations

import os

import numpy as np
import ray

from icrawler_ray.state.bloom import BloomFilter
from icrawler_ray.state.cuckoo import CuckooFilter


@ray.remote(num_cpus=0.1)  # shards are bursty (one batched call per round);
class SeenShard:           # a full-CPU reservation per shard would starve
                           # the map stages on small machines
    def __init__(self, capacity: int, use_bloom: bool = True, use_cuckoo: bool = True):
        self.bloom = BloomFilter(capacity) if use_bloom else None
        self.cuckoo = CuckooFilter(capacity) if use_cuckoo else None
        self.exact: set | None = None if use_cuckoo else set()
        self.num_items = 0
        self.num_queries = 0
        self.num_hits = 0

    def filter_and_insert(self, keys: np.ndarray) -> np.ndarray:
        """Returns novel-mask; novel keys are inserted."""
        keys = np.asarray(keys, dtype=np.uint64)
        self.num_queries += len(keys)
        if self.cuckoo is not None:
            if self.bloom is not None:
                maybe = self.bloom.contains(keys)  # pre-filter: definite-new skips cuckoo probe
                seen = np.zeros(len(keys), dtype=bool)
                if maybe.any():
                    seen[maybe] = self.cuckoo.contains(keys[maybe])
            else:
                seen = self.cuckoo.contains(keys)
            novel = ~seen
            # batch-internal first-occurrence wins
            _, first_idx = np.unique(keys, return_index=True)
            first_mask = np.zeros(len(keys), dtype=bool)
            first_mask[first_idx] = True
            novel &= first_mask
            if novel.any():
                self.cuckoo.add(keys[novel])
                if self.bloom is not None:
                    self.bloom.add(keys[novel])
        else:  # exact mode (test oracle cross-check)
            novel = np.zeros(len(keys), dtype=bool)
            for i, k in enumerate(keys):
                if int(k) not in self.exact:
                    self.exact.add(int(k))
                    novel[i] = True
        self.num_items += int(novel.sum())
        self.num_hits += int(len(keys) - novel.sum())
        if novel.any():  # delta-checkpoint capture (keys since last ckpt)
            if not hasattr(self, "_delta") or self._delta is None:
                self._delta = []
            self._delta.append(keys[novel].copy())
        return novel

    # ---- round-scoped claim protocol (frontier dedup without a shuffle):
    # parse tasks push (key, order) pairs for their shard; finish_round
    # computes min-order winners per key (vectorized), filters them
    # against the persistent seen state, inserts the novel ones and
    # returns them. Claims are commutative -> arrival order irrelevant ->
    # deterministic winners at any parallelism.

    def begin_round(self, round_idx: int) -> None:
        """Open the claim window for ``round_idx``. Tagged claims whose
        round doesn't match the open window are dropped (counted in
        stale_claims) — in-flight stragglers from a timed-out previous
        round can neither inflate the next round's delivery counter nor
        steal its min-packed winner slots (ADVICE r3 #1). Untagged claims
        (round_idx=None at the call site) bypass the fence."""
        self._round = round_idx

    def claim(self, keys: np.ndarray, packed: np.ndarray,
              eligible: np.ndarray | None = None,
              round_idx: int | None = None) -> int:
        if round_idx is not None and round_idx != getattr(self, "_round", None):
            self._stale_n = getattr(self, "_stale_n", 0) + len(keys)
            return 0
        if not hasattr(self, "_claims") or self._claims is None:
            self._claims = []
        n = len(keys)
        if eligible is None:
            eligible = np.ones(n, dtype=bool)
        self._claims.append((np.asarray(keys, dtype=np.uint64),
                             np.asarray(packed, dtype=np.int64),
                             np.asarray(eligible, dtype=bool)))
        # round-scoped delivery counter: the driver's flush barrier
        # compares this against the claimable-row count it derives from
        # the materialized parse output ([[claim-protocol-design]])
        self._claimed_n = getattr(self, "_claimed_n", 0) + n
        return n

    def claims_received(self) -> int:
        """Rows received by claim() since the last finish_round — the
        flush-barrier signal for non-blocking claim submission."""
        return getattr(self, "_claimed_n", 0)

    def finish_round(self):
        """-> (novel_keys, novel_packed): min-order first occurrence per
        key among this round's claims, minus already-seen; novel keys are
        inserted into the persistent filters.

        ``eligible`` (e.g. depth < max_depth for link claims) participates
        in the claim race but not in admission: an INeligible min-order
        winner suppresses every later same-round emission of its key yet is
        neither admitted nor inserted into the persistent seen state —
        matching the oracle's claimed-before-depth-check semantics
        (oracle.py:176-185) and dataset mode's dedup-then-depth-filter."""
        claims = getattr(self, "_claims", None)
        self._claims = []
        self._claimed_n = 0
        self._round = None  # close the window: late tagged stragglers drop
        if not claims:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
        keys = np.concatenate([c[0] for c in claims])
        packed = np.concatenate([c[1] for c in claims])
        elig = np.concatenate([c[2] for c in claims])
        order = np.lexsort((packed, keys))  # key-major, then order
        ks, ps, es = keys[order], packed[order], elig[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        ks, ps, es = ks[first], ps[first], es[first]
        ks, ps = ks[es], ps[es]  # capped winners: dropped, never seen-marked
        novel = self.filter_and_insert(ks)
        return ks[novel], ps[novel]

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if self.cuckoo is not None:
            return self.cuckoo.contains(keys)
        return np.array([int(k) in self.exact for k in keys], dtype=bool)

    def delete(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if self.cuckoo is not None:
            removed = self.cuckoo.delete(keys)
            self.num_items -= int(removed.sum())
            return removed
        removed = np.array([int(k) in self.exact for k in keys], dtype=bool)
        for k in keys:
            self.exact.discard(int(k))
        self.num_items -= int(removed.sum())
        return removed

    def stats(self) -> dict:
        return {
            "num_items": self.num_items,
            "num_queries": self.num_queries,
            "num_hits": self.num_hits,
            "stale_claims": getattr(self, "_stale_n", 0),
        }

    def serialize(self) -> dict:
        out = {"num_items": self.num_items, "num_queries": self.num_queries,
               "num_hits": self.num_hits}
        out["bloom"] = self.bloom.serialize() if self.bloom else None
        out["cuckoo"] = self.cuckoo.serialize() if self.cuckoo else None
        out["exact"] = np.array(sorted(self.exact), dtype=np.uint64).tobytes() if self.exact is not None else None
        self._delta = []  # full snapshot subsumes any pending delta
        return out

    # ---- incremental checkpoints: a full filter snapshot costs
    # O(capacity) bytes EVERY round; at the 10^10-key design point that is
    # ~21 GiB/round. The delta is just the keys inserted since the last
    # checkpoint — O(novel) — and restore replays deltas onto the most
    # recent full snapshot.

    def take_delta(self) -> np.ndarray:
        d = getattr(self, "_delta", None) or []
        self._delta = []
        return np.concatenate(d) if d else np.empty(0, dtype=np.uint64)

    def replay(self, keys: np.ndarray) -> None:
        """Re-insert checkpointed delta keys (restore path): membership
        structures + num_items only — per-round query/hit counters are not
        reconstructed from deltas (documented approximation)."""
        keys = np.asarray(keys, dtype=np.uint64)
        if not len(keys):
            return
        if self.cuckoo is not None:
            self.cuckoo.add(keys)
            if self.bloom is not None:
                self.bloom.add(keys)
        else:
            self.exact.update(int(k) for k in keys)
        self.num_items += len(keys)

    def restore(self, payload: dict) -> None:
        # drop any mid-round claim/delta state: restore() rewinds this
        # shard to a round BOUNDARY (in-process fault recovery restores
        # surviving shards alongside respawned ones)
        self._claims = []
        self._delta = []
        self._round = None  # re-opened by the driver's next begin_round
        self.num_items = payload["num_items"]
        self.num_queries = payload["num_queries"]
        self.num_hits = payload["num_hits"]
        self.bloom = BloomFilter.deserialize(payload["bloom"]) if payload["bloom"] else None
        self.cuckoo = CuckooFilter.deserialize(payload["cuckoo"]) if payload["cuckoo"] else None
        self.exact = set(np.frombuffer(payload["exact"], dtype=np.uint64).tolist()) if payload["exact"] is not None else None


class ShardedSeenSet:
    """Driver-side handle to S SeenShard actors (named, per-run namespace)."""

    def __init__(self, name: str, num_shards: int, capacity_per_shard: int = 1 << 20,
                 exact: bool = False):
        self.name = name
        self.num_shards = num_shards
        self.shards = [
            SeenShard.options(name=f"seen:{name}:{i}", get_if_exists=True).remote(
                capacity_per_shard, use_bloom=not exact, use_cuckoo=not exact
            )
            for i in range(num_shards)
        ]

    def shard_of(self, keys: np.ndarray) -> np.ndarray:
        return (np.asarray(keys, dtype=np.uint64) % np.uint64(self.num_shards)).astype(np.int32)

    def filter_and_insert_array(self, keys: np.ndarray) -> np.ndarray:
        """Driver-side bulk path (bench + small rounds): scatter keys to all
        shards in parallel, gather novel masks."""
        keys = np.asarray(keys, dtype=np.uint64)
        shard = self.shard_of(keys)
        futs, idxs = [], []
        for s in range(self.num_shards):
            m = shard == s
            if m.any():
                futs.append(self.shards[s].filter_and_insert.remote(keys[m]))
                idxs.append(np.nonzero(m)[0])
        novel = np.zeros(len(keys), dtype=bool)
        for fut, idx in zip(futs, idxs):
            novel[idx] = ray.get(fut)
        return novel

    def finish_round_winners(self):
        """Gather each shard's round winners -> (keys, packed) arrays."""
        res = ray.get([s.finish_round.remote() for s in self.shards])
        keys = np.concatenate([r[0] for r in res]) if res else np.empty(0, dtype=np.uint64)
        packed = np.concatenate([r[1] for r in res]) if res else np.empty(0, dtype=np.int64)
        return keys, packed

    def claims_received(self) -> int:
        """Total claim rows the shards have received this round."""
        return int(sum(ray.get([s.claims_received.remote() for s in self.shards])))

    def begin_round(self, round_idx: int) -> None:
        """Open every shard's claim window for ``round_idx`` (round fence)."""
        ray.get([s.begin_round.remote(round_idx) for s in self.shards])

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def serialize(self) -> list[dict]:
        return ray.get([s.serialize.remote() for s in self.shards])

    def take_deltas(self) -> list[np.ndarray]:
        return ray.get([s.take_delta.remote() for s in self.shards])

    def restore(self, payloads: list[dict],
                deltas: list[list[np.ndarray]] | None = None) -> None:
        ray.get([s.restore.remote(p) for s, p in zip(self.shards, payloads)])
        if deltas:
            futs = []
            for per_round in deltas:
                futs.extend(s.replay.remote(k) for s, k in zip(self.shards, per_round)
                            if len(k))
            if futs:
                ray.get(futs)

    def shutdown(self) -> None:
        for s in self.shards:
            try:
                ray.kill(s)
            except Exception:  # noqa: BLE001 — shard may already be dead
                pass


_ACTOR_CACHE: dict = {}


def get_shard_actor(name: str, shard: int):
    key = (name, shard)
    a = _ACTOR_CACHE.get(key)
    if a is None:
        a = ray.get_actor(f"seen:{name}:{shard}")
        _ACTOR_CACHE[key] = a
    return a


#: escape hatch / A-B knob: ICRAWLER_CLAIMS_BLOCK=1 restores the blocking
#: submission (workers inherit the driver's environment)
_CLAIMS_BLOCK_DEFAULT = os.environ.get("ICRAWLER_CLAIMS_BLOCK", "0") == "1"
#: per-worker outstanding-claim window (see route_claims backpressure note)
_CLAIMS_WINDOW = int(os.environ.get("ICRAWLER_CLAIMS_WINDOW", "64"))
_PENDING: list = []


def route_claims(t, pages_set: str, files_set: str, num_shards: int,
                 max_depth: int, block: bool | None = None,
                 round_idx: int | None = None) -> int:
    """Push one Arrow block's candidate (url_hash, packed) pairs to their
    seen-set shard actors (link rows -> pages set, task rows -> files set).
    Depth-capped link rows claim too — eligible=False — so the min-order
    emission wins the claim race exactly as in the oracle/dataset modes;
    finish_round drops ineligible winners without seen-marking them.

    Non-blocking by default: a parse task blocked in ray.get on actor
    round-trips makes the raylet borrow its CPU and over-spawn cold
    workers (observed 130-140 processes on a 32-CPU box, with the crawl's
    final small round absorbing their import cost — 1.2 s -> 13-27 s
    run-to-run swings). Delivery is instead guaranteed by the driver's
    flush barrier (GreedyCrawl._flush_claims): it compares the shards'
    claims_received() totals against the claimable-row counts of the
    materialized parse output, and falls back to a blocking driver-side
    resend (claims are idempotent within a round — min packed wins) in
    the rare lost-submission case. ``block=True`` keeps the old behavior
    for that resend path and for standalone callers."""
    import pyarrow.compute as pc

    futs = []
    n_pushed = 0
    for kind, set_name in (("task", files_set), ("link", pages_set)):
        m = pc.equal(t["row_kind"], kind).to_numpy(zero_copy_only=False)
        if not m.any():
            continue
        keys = t["url_hash"].to_numpy(zero_copy_only=False)[m]
        packed = t["packed"].to_numpy(zero_copy_only=False)[m]
        if kind == "link":
            elig = t["depth"].to_numpy(zero_copy_only=False)[m] < max_depth
        else:
            elig = None
        shard = (keys % np.uint64(num_shards)).astype(np.int32)
        for s in np.unique(shard):
            sel = shard == s
            futs.append(get_shard_actor(set_name, int(s)).claim.remote(
                keys[sel], packed[sel], None if elig is None else elig[sel],
                round_idx))
            n_pushed += int(sel.sum())
    if block is None:
        block = _CLAIMS_BLOCK_DEFAULT
    if block and futs:
        return sum(ray.get(futs))
    # bounded-window backpressure: fully unbounded submission lets fat
    # rounds outrun the shard actors and the object store (measured: the
    # old always-blocking call accidentally paced 1M-page rounds), while
    # per-call blocking over-spawns workers. Keep up to _CLAIMS_WINDOW
    # claim futures outstanding per worker process and drain half when
    # the window fills — a short wait instead of a per-call round-trip.
    _PENDING.extend(futs)
    if len(_PENDING) > _CLAIMS_WINDOW:
        done, rest = ray.wait(_PENDING, num_returns=len(_PENDING) // 2,
                              fetch_local=False)
        _PENDING[:] = rest
    return n_pushed


def make_claim_fn(pages_set: str, files_set: str, num_shards: int, max_depth: int):
    """Standalone claim pass (when not fused into the parse stage)."""
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        n = route_claims(t, pages_set, files_set, num_shards, max_depth, block=True)
        return pa.table({"claimed": pa.array([n], type=pa.int64())})

    return fn


# NB: the former ``seen_filter_dataset`` (groupby(shard)-shuffled seen
# filtering) was retired in round 2: both crawl modes now route claims to
# the shard actors INSIDE the parse pass (route_claims above) — zero
# shuffles — and admit winners with a broadcast filter
# (pipelines/greedy.py::_admitted_rows).
