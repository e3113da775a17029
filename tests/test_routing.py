"""compositeId routing: published MurmurHash3 vectors, shard-key
co-location, ring coverage."""

import numpy as np

from lucene_solr_ray.state.routing import (
    composite_id_hash,
    murmur3_32,
    route_batch,
    shard_of,
    shard_ranges,
)


def test_murmur3_published_vectors():
    assert murmur3_32(b"") == 0
    assert murmur3_32(b"", seed=1) == 0x514E28B7
    assert murmur3_32(b"hello") == 0x248BFA47
    assert murmur3_32(b"hello, world") == 0x149BBB7F
    assert murmur3_32(
        b"The quick brown fox jumps over the lazy dog") == 0x2E4FF723


def test_composite_id_colocation():
    # same shard key -> same top 16 bits -> same shard (any count <= 65536)
    ids = [f"tenantA!doc{i}" for i in range(50)]
    for n in (2, 4, 16, 64):
        shards = {shard_of(i, n) for i in ids}
        assert len(shards) == 1, n
    # different shard keys spread
    many = {shard_of(f"t{k}!x", 16) for k in range(200)}
    assert len(many) > 8


def test_plain_ids_spread_and_ranges_cover():
    rngs = shard_ranges(8)
    assert rngs[0][0] == 0 and rngs[-1][1] == (1 << 32) - 1
    for (a, b), (c, d) in zip(rngs, rngs[1:]):
        assert c == b + 1
    a = route_batch([f"doc-{i}" for i in range(10_000)], 8)
    counts = np.bincount(a, minlength=8)
    assert counts.min() > 800


def test_hash_matches_range_assignment():
    for did in ["plain", "t!k", "abc!def", "x"]:
        h = composite_id_hash(did)
        s = shard_of(did, 4)
        lo, hi = shard_ranges(4)[s]
        assert lo <= h <= hi
