"""Partitioned Bloom URL-seen filter: per-partition shard build + broadcast probe.

Reference analog: the URL-seen set is unique indexes + upserts in Postgres
(``sql/create_crawler_tables.sql:45,78,104``); membership there is an index
probe per row. At 10^10 URLs the exact check must become a shuffle
(anti-join on ``url_canon``), and this Bloom filter exists to keep ~99% of
genuinely-new URLs OUT of that shuffle:

- **build**: ``mapInPandas`` over the seen table's ``url_hash`` column
  computes one Bloom shard per partition (numpy bit ops); the driver ORs
  shards into one bitset — a tree-reduce at cluster scale.
- **probe**: the bitset is broadcast; a pandas UDF answers "maybe seen"
  per batch with vectorized double hashing. Definite-negatives skip the
  anti-join entirely; only maybe-positives (true hits + ~1% fp) shuffle.

Hashing: double hashing h1 + i*h2 (Kirsch–Mitzenmacher 2006) over the
splitmix64-finalized ``url_hash``, k rounds. All uint64 numpy; no per-row
Python (north-rule axis A).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from findopendata_spark.crawler.graph import mix


def _positions(url_hash: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(h), k) bit positions via double hashing."""
    h = url_hash.astype(np.uint64)
    h1 = mix(h, 0xB100)
    h2 = mix(h, 0xB200) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def bloom_size_bits(n_keys: int, bits_per_key: int) -> int:
    m = max(1024, n_keys * bits_per_key)
    return 1 << int(np.ceil(np.log2(m)))  # pow2 → cheap masking semantics


def build_bloom(seen_df, m_bits: int, k: int) -> bytes:
    """OR-reduce per-partition Bloom shards of `seen_df.url_hash`."""
    from pyspark.sql import functions as F

    def shard(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bool scatter + packbits: ~10x faster than np.bitwise_or.at
        # (unbuffered ufunc) — this runs on every seen key at build and
        # every new key each wave
        bools = np.zeros(m_bits, dtype=bool)
        any_rows = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_rows = True
            h = pdf["url_hash"].to_numpy(np.int64).view(np.uint64)
            bools[_positions(h, m_bits, k).ravel()] = True
        if any_rows:
            bits = np.packbits(bools, bitorder="little")  # bit i -> byte i>>3, 1<<(i&7)
            yield pd.DataFrame({"shard": [bits.tobytes()]})

    shards = seen_df.select(F.col("url_hash")).mapInPandas(
        shard, "shard binary"
    ).collect()
    acc = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in shards:
        acc |= np.frombuffer(row["shard"], dtype=np.uint8)
    return acc.tobytes()


def or_delta(bloom_bytes: bytes, delta_df, m_bits: int, k: int) -> bytes:
    """OR the Bloom shards of `delta_df.url_hash` into an existing bitset.

    Used for the per-wave incremental update: shards are built where the
    data lives (``mapInPandas``) and only m/8-byte bitsets travel to the
    driver — never the keys themselves."""
    delta = build_bloom(delta_df, m_bits, k)
    acc = np.frombuffer(bloom_bytes, dtype=np.uint8) | np.frombuffer(
        delta, dtype=np.uint8
    )
    return acc.tobytes()


def with_maybe_seen(df, bloom_bytes_bc, m_bits: int, k: int, hash_col="url_hash"):
    """Add boolean ``maybe_seen`` by probing the broadcast Bloom bitset."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    @F.pandas_udf(BooleanType())
    def probe(h: pd.Series) -> pd.Series:
        bits = np.frombuffer(bloom_bytes_bc.value, dtype=np.uint8)
        pos = _positions(h.to_numpy(np.int64).view(np.uint64), m_bits, k)
        hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1).astype(bool))

    return df.withColumn("maybe_seen", probe(F.col(hash_col)))


# ---------------------------------------------------------------------------
# Sharded Bloom: per-shard bitsets keyed by pmod(url_hash, n_shards)
# ---------------------------------------------------------------------------
# The 10^10 shape: one monolithic bitset at 10 bits/key is ~12.5 GB — too
# big to build driver-side or broadcast whole. Sharding by url_hash makes
# each shard an independent, individually-sized bitset:
#
# - **build** is a groupBy(shard) → one ``applyInPandas`` bitset per shard
#   (a bucketed build: the shard's keys land on one executor, exactly S
#   small bitsets travel to the driver — total m/8 bytes, instead of
#   P × m/8 partial bitsets from every input partition);
# - **probe** broadcasts the dict of shards; each Arrow batch groups its
#   rows by shard and probes the matching bitset (numpy, no per-row work);
# - at real scale S grows with the key count (cfg.bloom_shards), each
#   shard stays ~m/S bits, and shards can be rebuilt/broadcast
#   independently as their host population grows.
#
# Shard id = pmod(url_hash, S) — computable identically JVM-side
# (``F.pmod``) and numpy-side (``np.mod`` on int64); bit positions use the
# splitmix-mixed hashes, so shard choice and positions are decorrelated.


def shard_ids(h_int64: np.ndarray, n_shards: int) -> np.ndarray:
    return np.mod(h_int64, n_shards)


def build_bloom_shards(
    seen_df, m_bits_shard: int, k: int, n_shards: int
) -> dict[int, bytes]:
    """One Bloom bitset per shard of ``seen_df.url_hash``."""
    from pyspark.sql import functions as F

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["url_hash"].to_numpy(np.int64).view(np.uint64)
        bools = np.zeros(m_bits_shard, dtype=bool)
        bools[_positions(h, m_bits_shard, k).ravel()] = True
        bits = np.packbits(bools, bitorder="little")
        return pd.DataFrame({"shard_id": [int(key[0])], "bits": [bits.tobytes()]})

    rows = (
        seen_df.select(
            F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int").alias("shard_id"),
            "url_hash",
        )
        .groupBy("shard_id")
        .applyInPandas(fn, "shard_id int, bits binary")
        .collect()
    )
    empty = b"\x00" * (m_bits_shard // 8)
    shards = {i: empty for i in range(n_shards)}
    for row in rows:
        shards[int(row["shard_id"])] = bytes(row["bits"])
    return shards


def or_delta_shards(
    shards: dict[int, bytes], delta_df, m_bits_shard: int, k: int, n_shards: int
) -> dict[int, bytes]:
    """OR per-shard delta bitsets into the existing shard dict."""
    delta = build_bloom_shards(delta_df, m_bits_shard, k, n_shards)
    out = dict(shards)
    for sid, bits in delta.items():
        if any(bits):
            acc = np.frombuffer(out[sid], dtype=np.uint8) | np.frombuffer(
                bits, dtype=np.uint8
            )
            out[sid] = acc.tobytes()
    return out


def with_maybe_seen_shards(
    df, shards_bc, m_bits_shard: int, k: int, n_shards: int, hash_col="url_hash"
):
    """``maybe_seen`` via the broadcast shard dict (numpy per shard group)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    @F.pandas_udf(BooleanType())
    def probe(h: pd.Series) -> pd.Series:
        hv = h.to_numpy(np.int64)
        hu = hv.view(np.uint64)
        sh = shard_ids(hv, n_shards)
        out = np.zeros(len(hv), dtype=bool)
        shards = shards_bc.value
        for s in np.unique(sh):
            idx = np.nonzero(sh == s)[0]
            bits = np.frombuffer(shards[int(s)], dtype=np.uint8)
            pos = _positions(hu[idx], m_bits_shard, k)
            hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
            out[idx] = hit.all(axis=1)
        return pd.Series(out)

    return df.withColumn("maybe_seen", probe(F.col(hash_col)))
