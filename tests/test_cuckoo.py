"""Cuckoo-filter unit tests: no false negatives, low fp rate, delete
support (the property the Bloom path lacks), broadcast round-trip."""

from __future__ import annotations

import numpy as np

from findopendata_spark.crawler.cuckoo import CuckooFilter
from findopendata_spark.crawler.graph import splitmix64


def _keys(n, offset=0):
    return splitmix64(np.arange(offset, offset + n, dtype=np.uint64)).astype(
        np.int64
    )


def test_no_false_negatives_and_low_fp():
    keys = _keys(20_000)
    fresh = _keys(20_000, offset=1_000_000)
    cf = CuckooFilter(capacity=30_000)
    assert cf.insert_batch(keys) == len(keys)
    assert cf.contains_batch(keys).all()  # zero false negatives
    fp = cf.contains_batch(fresh).mean()
    assert fp < 0.01  # 16-bit fingerprints, 4-slot buckets


def test_delete_then_absent():
    keys = _keys(5_000)
    cf = CuckooFilter(capacity=10_000)
    cf.insert_batch(keys)
    victims = keys[:1000]
    assert cf.delete_batch(victims) == 1000
    assert cf.contains_batch(keys[1000:]).all()  # survivors intact
    # deleted keys now (almost all) absent — residual hits are the fp rate
    assert cf.contains_batch(victims).mean() < 0.01
    assert cf.size == 4000


def test_broadcast_roundtrip():
    keys = _keys(3_000)
    cf = CuckooFilter(capacity=5_000)
    cf.insert_batch(keys)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes(), cf.n_buckets)
    assert cf2.contains_batch(keys).all()
    assert cf2.size == cf.size


def test_high_load_inserts():
    # 95% of rated capacity must fully insert
    keys = _keys(28_500)
    cf = CuckooFilter(capacity=30_000)
    assert cf.insert_batch(keys) == len(keys)
