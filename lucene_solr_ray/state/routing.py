"""Document routing — Solr's compositeId router.

``solr/solrj/src/java/org/apache/solr/common/cloud/CompositeIdRouter.java``
routes ``shardKey!docKey`` ids: the 32-bit hash takes its TOP 16 bits
from MurmurHash3(shardKey) and its BOTTOM 16 bits from
MurmurHash3(docKey), so every doc sharing a shard key lands in the same
hash-range slice (co-location) while still spreading within it. Plain
ids hash whole. Shards own contiguous ranges of the 32-bit ring
(``HashBasedRouter.java``).

MurmurHash3 here is the standard public x86 32-bit algorithm (Appleby,
public domain) over UTF-8 bytes — hash-compatible with a real Solr
cluster: Solr's ``Hash.murmurhash3_x86_32(CharSequence)``
(``solr/solrj/.../util/Hash.java:296``) explicitly "returns the
MurmurHash3_x86_32 hash of the UTF-8 bytes of the String without
actually encoding the string", i.e. it is the byte-for-byte UTF-8
hash computed char-by-char; verified against published test vectors.

Ray shape: routing is a pure per-row function — ``route_batch`` runs
inside map_batches, so an ingest stream partitions itself by
``shard_of`` and writes per-shard parquet (the pre-partitioned build
input this engine's ``build_index`` consumes per shard).
"""

from __future__ import annotations

import numpy as np


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (the exact public algorithm)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n - (n & 3)
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def composite_id_hash(doc_id: str) -> int:
    """CompositeIdRouter.sliceHash: 'shardKey!docKey' -> top 16 bits
    from the shard key's hash, bottom 16 from the doc key's; plain ids
    hash whole."""
    if "!" in doc_id:
        shard_key, _, doc_key = doc_id.partition("!")
        hi = murmur3_32(shard_key.encode("utf-8"))
        lo = murmur3_32(doc_key.encode("utf-8"))
        return ((hi & 0xFFFF0000) | (lo & 0x0000FFFF)) & 0xFFFFFFFF
    return murmur3_32(doc_id.encode("utf-8"))


def shard_ranges(num_shards: int) -> list[tuple[int, int]]:
    """Contiguous 32-bit hash ranges, one per shard (HashBasedRouter's
    equal split of the ring)."""
    step = (1 << 32) // num_shards
    return [(i * step,
             ((i + 1) * step - 1) if i < num_shards - 1
             else (1 << 32) - 1)
            for i in range(num_shards)]


def shard_of(doc_id: str, num_shards: int) -> int:
    h = composite_id_hash(doc_id)
    step = (1 << 32) // num_shards
    return min(h // step, num_shards - 1)


def route_batch(ids: list[str], num_shards: int) -> np.ndarray:
    """Vector of shard assignments for one batch (map_batches body)."""
    return np.fromiter((shard_of(i, num_shards) for i in ids),
                       np.int64, count=len(ids))
