"""Cuckoo filter: the deletable alternative to the Bloom URL-seen filter.

BASELINE.json names a "partitioned Bloom/cuckoo URL-seen filter"; the
engine's default is the Bloom path (crawler/bloom.py — pure bit ops,
smallest broadcast). This module provides the cuckoo variant (Fan et
al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014) for
the case Bloom can't serve: *eviction* — recrawl policies that expire
URLs from the seen set (delete support) without rebuilding the filter.

Same vectorized discipline as the Bloom path: build inserts keys
batch-at-a-time with numpy; membership probes are fully vectorized
(two bucket gathers + fingerprint compares). Partitioned use mirrors
bloom.py: one filter shard per partition via ``mapInPandas``, shards
broadcast for probing. Buckets hold 4 fingerprints of 16 bits — the
paper's recommended sweet spot (~95% load, ~0.1% fpp).
"""

from __future__ import annotations

import numpy as np

from findopendata_spark.crawler.graph import mix

BUCKET_SLOTS = 4
FP_BITS = 16
_EMPTY = np.uint16(0)
MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int):
        n_buckets = max(8, int(capacity / (BUCKET_SLOTS * 0.95)))
        self.n_buckets = 1 << int(np.ceil(np.log2(n_buckets)))  # pow2
        self.table = np.zeros((self.n_buckets, BUCKET_SLOTS), dtype=np.uint16)
        self.size = 0

    # -- hashing ------------------------------------------------------------
    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = (mix(h, 0xC0FFEE) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == _EMPTY, np.uint16(1), fp)  # 0 marks empty

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (mix(h, 0xC1) % np.uint64(self.n_buckets)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key displacement: i2 = i1 xor hash(fp)
        alt = mix(fp.astype(np.uint64), 0xC2) % np.uint64(self.n_buckets)
        return (i1.astype(np.uint64) ^ alt).astype(np.int64) % self.n_buckets

    # -- ops ----------------------------------------------------------------
    def _bulk_place(self, fps: np.ndarray, buckets: np.ndarray) -> np.ndarray:
        """Vectorized scatter of fingerprints into their buckets.

        Group-by-bucket + intra-group rank: within one call, the r-th
        incoming key of a bucket takes the (r+1)-th free slot; keys whose
        rank exceeds the bucket's free slots stay unplaced. Returns a
        boolean placed-mask aligned with the inputs. One numpy pass — no
        per-key Python.
        """
        n = len(fps)
        if n == 0:
            return np.zeros(0, dtype=bool)
        order = np.argsort(buckets, kind="stable")
        bs = buckets[order]
        first = np.r_[True, bs[1:] != bs[:-1]]
        grp_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
        rank = np.arange(n) - grp_start
        free = self.table[bs] == _EMPTY              # (n, SLOTS), pre-place state
        n_free = free.sum(axis=1)                    # same for all rows of a group
        can = rank < n_free
        slot_order = np.argsort(~free, axis=1, kind="stable")  # free slots first
        slots = slot_order[np.arange(n), np.minimum(rank, BUCKET_SLOTS - 1)]
        self.table[bs[can], slots[can]] = fps[order][can]
        self.size += int(can.sum())
        placed = np.zeros(n, dtype=bool)
        placed[order[can]] = True
        return placed

    def insert_batch(self, hashes: np.ndarray) -> int:
        """Insert signed-int64 key hashes; returns number inserted (drops
        on table-full after MAX_KICKS — caller should size capacity).

        Two vectorized scatter passes (bucket i1, then i2 for the
        spill-over); only keys that miss both buckets — a few per batch
        at sane load factors — fall back to the per-key kick loop.
        """
        h = hashes.astype(np.int64).view(np.uint64)
        fps, i1s = self._fp(h), self._i1(h)
        i2s = self._i2(i1s, fps)
        placed = self._bulk_place(fps, i1s)
        rest = ~placed
        if rest.any():
            placed2 = self._bulk_place(fps[rest], i2s[rest])
            rest_idx = np.nonzero(rest)[0][~placed2]
        else:
            rest_idx = np.zeros(0, dtype=np.int64)
        inserted = int(placed.sum()) + (int((~placed).sum()) - len(rest_idx))
        for j in rest_idx:
            if self._insert_one(np.uint16(fps[j]), int(i1s[j]), int(i2s[j])):
                inserted += 1
        return inserted

    def _insert_one(self, fp, i1, i2) -> bool:
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if len(empty):
                row[empty[0]] = fp
                self.size += 1
                return True
        i = i1
        rng_state = int(fp)
        for _ in range(MAX_KICKS):
            rng_state = (rng_state * 1103515245 + 12345) & 0x7FFFFFFF
            slot = rng_state % BUCKET_SLOTS
            fp, self.table[i, slot] = self.table[i, slot], fp
            i = int(self._i2(np.array([i]), np.array([fp], dtype=np.uint16))[0])
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if len(empty):
                row[empty[0]] = fp
                self.size += 1
                return True
        return False  # table effectively full

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: no false negatives for inserted keys."""
        h = hashes.astype(np.int64).view(np.uint64)
        fps, i1s = self._fp(h), self._i1(h)
        i2s = self._i2(i1s, fps)
        in1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        in2 = (self.table[i2s] == fps[:, None]).any(axis=1)
        return in1 | in2

    def delete_batch(self, hashes: np.ndarray) -> int:
        """Delete (one copy of) each key's fingerprint — the operation
        Bloom cannot do; returns number removed."""
        h = hashes.astype(np.int64).view(np.uint64)
        fps, i1s = self._fp(h), self._i1(h)
        i2s = self._i2(i1s, fps)
        removed = 0
        for fp, i1, i2 in zip(fps, i1s, i2s):
            for i in (int(i1), int(i2)):
                row = self.table[i]
                hit = np.flatnonzero(row == fp)
                if len(hit):
                    row[hit[0]] = _EMPTY
                    self.size -= 1
                    removed += 1
                    break
        return removed

    # -- (de)serialization for broadcast ------------------------------------
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_buckets: int) -> "CuckooFilter":
        cf = cls.__new__(cls)
        cf.n_buckets = n_buckets
        cf.table = (
            np.frombuffer(data, dtype=np.uint16)
            .reshape(n_buckets, BUCKET_SLOTS)
            .copy()
        )
        cf.size = int(np.count_nonzero(cf.table))
        return cf
