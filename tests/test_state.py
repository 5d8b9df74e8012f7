"""Seen-set state layer: bloom, cuckoo, shard actors (Q1-Q3 / north rule)."""

import numpy as np
import pytest

from icrawler_ray.state.bloom import BloomFilter
from icrawler_ray.state.cuckoo import CuckooFilter
from icrawler_ray.state.seen import ShardedSeenSet


def keys(n, seed=0):
    return np.random.default_rng(seed).integers(0, 2**63, n, dtype=np.uint64)


def test_bloom_membership_and_fp_rate():
    k = keys(20000)
    other = keys(20000, seed=1)
    b = BloomFilter(25000)
    b.add(k)
    assert b.contains(k).all()
    assert b.contains(other).mean() < 0.02  # ~0.7% expected at 10 bits/key


def test_bloom_serialize_roundtrip():
    k = keys(1000)
    b = BloomFilter(2000)
    b.add(k)
    b2 = BloomFilter.deserialize(b.serialize())
    assert b2.contains(k).all() and b2.num_items == 1000


def test_cuckoo_membership_delete_fp():
    k = keys(20000)
    other = keys(20000, seed=1)
    c = CuckooFilter(25000)
    c.add(k)
    assert c.contains(k).all()
    assert c.contains(other).mean() < 0.001  # 16-bit fp, 4 slots
    removed = c.delete(k[:500])
    assert removed.all()
    assert c.contains(k[:500]).mean() < 0.01  # deleted (residual = fp collisions)
    assert c.contains(k[500:]).all()


def test_cuckoo_serialize_roundtrip():
    k = keys(5000)
    c = CuckooFilter(6000)
    c.add(k)
    c2 = CuckooFilter.deserialize(c.serialize())
    assert c2.contains(k).all() and c2.num_items == c.num_items


def test_cuckoo_overfill_grows_generations():
    # a frontier that outruns the sized capacity opens new generations
    # (scalable-filter pattern) instead of raising; every key stays a hit
    c = CuckooFilter(64)
    k = keys(5000)
    c.add(k)
    assert len(c.gens) > 1
    assert c.contains(k).all()
    assert c.num_items == 5000
    # fresh keys are still overwhelmingly misses (FP rate stays bounded)
    fresh = keys(5000, seed=123)
    assert c.contains(fresh).mean() < 0.05


def test_cuckoo_growth_serialize_roundtrip():
    c = CuckooFilter(64)
    k = keys(3000)
    c.add(k)
    assert len(c.gens) > 1
    c2 = CuckooFilter.deserialize(c.serialize())
    assert len(c2.gens) == len(c.gens)
    assert c2.contains(k).all()
    assert c2.num_items == c.num_items


def test_bloom_overfill_grows_generations():
    from icrawler_ray.state.bloom import BloomFilter

    b = BloomFilter(100)
    k = keys(5000)
    # scalable bloom: inserts past sized capacity open new generations so
    # the pre-filter never saturates into all-maybe
    for lo in range(0, 5000, 250):
        b.add(k[lo:lo + 250])
    assert len(b.gens) > 1
    assert b.contains(k).all()
    fresh = keys(5000, seed=321)
    assert b.contains(fresh).mean() < 0.2
    b2 = BloomFilter.deserialize(b.serialize())
    assert len(b2.gens) == len(b.gens)
    assert b2.contains(k).all()


def test_sharded_seen_set_bulk(ray_session):
    seen = ShardedSeenSet("t1", num_shards=4, capacity_per_shard=4096)
    try:
        k = keys(1000)
        novel = seen.filter_and_insert_array(k)
        assert novel.all()
        again = seen.filter_and_insert_array(k)
        assert not again.any()
        mixed = np.concatenate([k[:10], keys(10, seed=9)])
        novel = seen.filter_and_insert_array(mixed)
        assert not novel[:10].any() and novel[10:].all()
        stats = seen.stats()
        assert sum(s["num_items"] for s in stats) == 1010
    finally:
        seen.shutdown()


def test_sharded_seen_checkpoint_restore(ray_session, tmp_path):
    from icrawler_ray.state.checkpoint import CheckpointManager

    seen = ShardedSeenSet("t2", num_shards=2, capacity_per_shard=4096)
    k = keys(500)
    seen.filter_and_insert_array(k)
    payloads = seen.serialize()
    seen.shutdown()

    ck = CheckpointManager(str(tmp_path))
    ck.save_round(0, None, payloads, payloads, {"dl_count": 0, "next_seq": 0}, {})
    _, restored, _ = ck.load_round(0)

    seen2 = ShardedSeenSet("t3", num_shards=2, capacity_per_shard=4096)
    seen2.restore(*restored)  # (full payloads, delta chain)
    assert not seen2.filter_and_insert_array(k).any()  # all remembered
    seen2.shutdown()


def test_exact_mode_matches_filter_mode(ray_session):
    k = np.concatenate([keys(300), keys(300)])  # 50% dups
    a = ShardedSeenSet("t4", num_shards=2, exact=True)
    b = ShardedSeenSet("t5", num_shards=2, capacity_per_shard=4096)
    try:
        na = a.filter_and_insert_array(k)
        nb = b.filter_and_insert_array(k)
        assert (na == nb).all()  # no FP at this tiny scale
    finally:
        a.shutdown()
        b.shutdown()


def test_claim_flush_counter_and_idempotent_resend(ray_session):
    """Non-blocking claim protocol: claims_received tracks round rows,
    finish_round resets it, and a duplicate resend cannot change the
    winner set (min packed per key)."""
    import numpy as np
    from icrawler_ray.state.seen import ShardedSeenSet

    seen = ShardedSeenSet("flushtest", num_shards=2, capacity_per_shard=4096)
    try:
        keys = np.array([10, 20, 11, 30], dtype=np.uint64)
        packed = np.array([5, 7, 3, 9], dtype=np.int64)
        for s in range(2):
            m = (keys % 2) == s
            seen.shards[s].claim.remote(keys[m], packed[m])
        # poll-style barrier: wait until all 4 rows are received
        import time
        deadline = time.time() + 5
        while seen.claims_received() < 4 and time.time() < deadline:
            time.sleep(0.01)
        assert seen.claims_received() == 4
        # duplicate resend (the fallback path) — counter grows, winners don't
        for s in range(2):
            m = (keys % 2) == s
            seen.shards[s].claim.remote(keys[m], packed[m])
        while seen.claims_received() < 8 and time.time() < deadline:
            time.sleep(0.01)
        wk, wp = seen.finish_round_winners()
        assert dict(zip(wk.tolist(), wp.tolist())) == {10: 5, 20: 7, 11: 3, 30: 9}
        assert seen.claims_received() == 0  # finish_round resets
    finally:
        seen.shutdown()


def test_claims_pending_window_is_bounded(ray_session):
    """The per-worker outstanding-claims buffer drains at the window
    bound instead of growing with round size."""
    import numpy as np
    import pyarrow as pa
    from icrawler_ray.state import seen as seen_mod
    from icrawler_ray.state.seen import ShardedSeenSet, route_claims

    s = ShardedSeenSet("wintest", num_shards=2, capacity_per_shard=4096)
    try:
        seen_mod._PENDING.clear()
        for i in range(200):
            t = pa.table({
                "row_kind": pa.array(["task", "link"]),
                "url_hash": pa.array([i * 2, i * 2 + 1], type=pa.uint64()),
                "packed": pa.array([i, i], type=pa.int64()),
                "depth": pa.array([0, 0], type=pa.int32()),
            })
            route_claims(t, "wintest", "wintest", 2, max_depth=4)
            assert len(seen_mod._PENDING) <= seen_mod._CLAIMS_WINDOW + 4
    finally:
        s.shutdown()
        seen_mod._PENDING.clear()


def test_claim_round_fence_drops_stragglers(ray_session):
    """Cross-round fence (ADVICE r3 #1): a claim tagged with a stale
    round neither lands in the next round's claim set nor inflates its
    delivery counter; untagged claims bypass the fence."""
    import numpy as np
    import ray
    from icrawler_ray.state.seen import ShardedSeenSet

    seen = ShardedSeenSet("fencetest", num_shards=1, capacity_per_shard=4096)
    try:
        sh = seen.shards[0]
        seen.begin_round(0)
        ray.get(sh.claim.remote(np.array([7], dtype=np.uint64),
                                np.array([5], dtype=np.int64), None, 0))
        wk, wp = seen.finish_round_winners()
        assert dict(zip(wk.tolist(), wp.tolist())) == {7: 5}

        # straggler from round 0 arrives after finish_round: dropped
        assert ray.get(sh.claim.remote(np.array([8], dtype=np.uint64),
                                       np.array([1], dtype=np.int64), None, 0)) == 0
        assert seen.claims_received() == 0

        seen.begin_round(1)
        # stale round-0 straggler mid-round-1: dropped, counter untouched
        assert ray.get(sh.claim.remote(np.array([9], dtype=np.uint64),
                                       np.array([1], dtype=np.int64), None, 0)) == 0
        assert seen.claims_received() == 0
        # round-1 claim and an untagged claim: both accepted
        ray.get(sh.claim.remote(np.array([9], dtype=np.uint64),
                                np.array([4], dtype=np.int64), None, 1))
        ray.get(sh.claim.remote(np.array([12], dtype=np.uint64),
                                np.array([6], dtype=np.int64)))
        assert seen.claims_received() == 2
        wk, wp = seen.finish_round_winners()
        assert dict(zip(wk.tolist(), wp.tolist())) == {9: 4, 12: 6}
        assert seen.stats()[0]["stale_claims"] == 2
    finally:
        seen.shutdown()
