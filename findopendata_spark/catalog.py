"""Snapshot-versioned table store with atomic per-wave commits.

The reference keeps all crawl/metadata/sketch state in Postgres tables
mutated by per-task upserts (``sql/create_crawler_tables.sql``,
``findopendata/ckan_crawler.py:52-63``). Our engine keeps state in
snapshot-versioned tables with **one atomic commit per wave** — the
Iceberg model. This module is a minimal file-based implementation of that
model (the sandbox has no Iceberg jars): each table is a directory of
immutable parquet snapshots, and a single ``_current.json`` pointer names
the committed snapshot of every table plus the last complete wave id.

Commit protocol (crash-safe, exactly the Iceberg sequence):

1. every table touched by wave *k* is **staged** — written to a new
   ``<table>/snap-<k>`` parquet dir; nothing reads staged data;
2. a new pointer doc naming all tables' current snapshots is written to a
   temp file and ``os.replace``-d onto ``_current.json`` (atomic on POSIX).

A run killed anywhere before step 2 leaves only unreferenced snapshot
dirs; resume reads ``_current.json`` and sees the previous wave's state
exactly (north rule: "a killed run resumes exactly"). On a real cluster
this class is replaced verbatim by an Iceberg catalog — the engine only
uses ``read`` / ``stage`` / ``commit_wave`` / ``current_wave``.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_current.json"


class SnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        # append dirs staged by THIS process for the in-flight wave;
        # distinguishes live staging from a killed run's leftovers
        self._session_staged: set[str] = set()
        os.makedirs(root, exist_ok=True)

    # -- pointer ----------------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.root, _POINTER)

    def _read_pointer(self) -> dict:
        try:
            with open(self._pointer_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"wave": -1, "tables": {}}

    def current_wave(self) -> int:
        """Last fully-committed wave id (-1 = fresh store)."""
        return int(self._read_pointer()["wave"])

    def tables(self) -> dict[str, str]:
        return dict(self._read_pointer()["tables"])

    # -- read -------------------------------------------------------------
    def read(self, spark: SparkSession, table: str) -> DataFrame | None:
        """DataFrame of the committed snapshot, or None if never committed.

        recursiveFileLookup: a snapshot may be staged in PARTS (sub-dirs
        written by independent jobs at different points in the wave —
        see :meth:`prepare_snap`); snapshots carry no partition columns,
        so a recursive flat listing is always the right read."""
        snap = self._read_pointer()["tables"].get(table)
        if snap is None:
            return None
        return (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(os.path.join(self.root, table, snap))
        )

    def read_at(self, spark: SparkSession, table: str, wave: int) -> DataFrame | None:
        """Time travel: the table as of wave `wave` (reads the wave log)."""
        log = os.path.join(self.root, "_waves", f"wave-{wave:06d}.json")
        try:
            with open(log) as f:
                snap = json.load(f)["tables"].get(table)
        except FileNotFoundError:
            return None
        if snap is None:
            return None
        return (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(os.path.join(self.root, table, snap))
        )

    # -- write ------------------------------------------------------------
    def prepare_snap(self, table: str, wave: int) -> None:
        """Clear a (possibly killed-run) snapshot dir before PART staging.

        Must be called from the driver thread before the first
        ``stage(..., part=...)`` of a (table, wave): part writes never
        remove the snapshot root themselves (two parts may be writing
        concurrently from staging threads), so a stale part from a killed
        run that the new wave doesn't rewrite would otherwise survive
        into the committed snapshot."""
        path = os.path.join(self.root, table, f"snap-{wave:06d}")
        if os.path.exists(path):
            shutil.rmtree(path)

    def stage(
        self, df: DataFrame, table: str, wave: int, part: str | None = None
    ) -> str:
        """Write an immutable snapshot dir for `table`; invisible until commit.

        ``part`` stages one named sub-dir of the snapshot, letting
        independent jobs write disjoint slices of the same snapshot at
        different points in the wave (the frontier's big carry-over base
        starts writing at selection time; the small new-URL delta lands
        after dedup). Callers must :meth:`prepare_snap` once first."""
        snap = f"snap-{wave:06d}"
        path = os.path.join(self.root, table, snap)
        if part is not None:
            path = os.path.join(path, f"part-{part}")
        if os.path.exists(path):  # leftover from a killed run — overwrite
            shutil.rmtree(path)
        df.write.mode("overwrite").parquet(path)
        return snap

    # -- keyed upsert (MERGE INTO semantics) --------------------------------
    def merge_upsert(
        self,
        spark: SparkSession,
        table: str,
        updates: DataFrame,
        keys: list[str],
        ts_col: str | None = None,
    ) -> None:
        """Iceberg-style ``MERGE INTO table USING updates ON keys``.

        WHEN MATCHED: the update wins — unless ``ts_col`` is given, in
        which case the row with the greater timestamp wins (the
        reference's conditional upsert + freshness rule, S16/F3,
        ``ckan_crawler.py:52-58`` + ``:161-171``). WHEN NOT MATCHED:
        insert. Copy-on-write snapshot commit; on a real cluster this is
        one Iceberg MERGE statement.
        """
        from pyspark.sql import Window

        current = self.read(spark, table)
        if current is None:
            combined = updates.withColumn("_src", F.lit(1))
        else:
            combined = current.withColumn("_src", F.lit(0)).unionByName(
                updates.withColumn("_src", F.lit(1))
            )
        order = (
            [F.col(ts_col).desc_nulls_last(), F.col("_src").desc()]
            if ts_col
            else [F.col("_src").desc()]
        )
        w = Window.partitionBy(*keys).orderBy(*order)
        merged = (
            combined.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_src")
        )
        wave = self.current_wave() + 1
        # Invariant guard: committing wave k makes any append-table dir
        # `<t>/wave=k` visible (readers filter wave <= current). A run
        # killed mid-wave-k may have staged such dirs without committing —
        # remove those before publishing, so "staged data is invisible
        # until its wave commits" holds even when merge tables and append
        # tables share a catalog root. Scope (ADVICE r02): only dirs NOT
        # staged by this process are dead weight; appends staged live via
        # stage_append for this wave are legitimate and publish with it.
        for entry in os.listdir(self.root):
            stale = os.path.join(self.root, entry, f"wave={wave}")
            if (
                not entry.startswith("_")
                and os.path.isdir(stale)
                and stale not in self._session_staged
            ):
                shutil.rmtree(stale)
        snap = self.stage(merged, table, wave)
        self.commit_wave(wave, {table: snap})

    # -- append-only tables (seen / docs / lineage) -------------------------
    # One immutable parquet dir per wave (``<table>/wave=<k>``); readers
    # filter ``wave <= current_wave()`` so dirs staged by a killed run are
    # invisible until their wave commits — the same visibility rule as
    # Iceberg manifests, at directory granularity. Appending per wave keeps
    # the per-wave write O(wave delta), not O(total state): at a 10^10-URL
    # seen set a full rewrite per wave would dominate the job.

    def stage_append(self, df: DataFrame, table: str, wave: int) -> None:
        path = os.path.join(self.root, table, f"wave={wave}")
        self._session_staged.add(path)
        df.write.mode("overwrite").parquet(path)

    def read_append_wave(
        self, spark: SparkSession, table: str, wave: int
    ) -> DataFrame:
        """One wave's append dir (no visibility filter — callers that
        staged the wave themselves may read it pre/post commit)."""
        return spark.read.parquet(
            os.path.join(self.root, table, f"wave={wave}")
        )

    def read_appended(
        self, spark: SparkSession, table: str, upto: int | None = None
    ) -> DataFrame | None:
        """Union of all committed wave appends (wave partition col included).

        Waves below the table's ``append_base`` (set by a compaction —
        see :meth:`commit_wave`) are invisible: a compaction rewrote
        their surviving rows into its own wave dir, Iceberg's
        rewrite-manifests move at directory granularity."""
        from pyspark.sql import functions as F

        base = os.path.join(self.root, table)
        if not os.path.isdir(base) or not any(
            e.startswith("wave=") for e in os.listdir(base)
        ):
            return None
        upto = self.current_wave() if upto is None else upto
        # Time-travel floor (ADVICE r03): a compaction at wave c raises
        # append_base — but a read at upto < c must see the PRE-compaction
        # dirs (they are kept on disk for exactly this). The floor in
        # effect at `upto` is the one recorded in that wave's log entry,
        # not the current pointer's.
        pointer = self._read_pointer()
        if upto != int(pointer["wave"]):
            log = os.path.join(self.root, "_waves", f"wave-{upto:06d}.json")
            try:
                with open(log) as f:
                    pointer = json.load(f)
            except FileNotFoundError:
                # pre-log store or uncommitted wave id: no compaction can
                # have been published at/before it without a log, so no floor
                pointer = {}
        floor = int(pointer.get("append_base", {}).get(table, 0))
        df = spark.read.option("basePath", base).parquet(base)
        return df.filter((F.col("wave") >= floor) & (F.col("wave") <= upto))

    def commit_wave(
        self,
        wave: int,
        staged: dict[str, str],
        append_base: dict[str, int] | None = None,
    ) -> None:
        """Atomically publish wave `wave`.

        `staged` maps table → snapshot name returned by :meth:`stage`.
        Tables not in `staged` keep their previous snapshot (copy-on-write
        at table granularity). ``append_base`` marks append tables whose
        content this wave REWROTE wholesale (compaction/eviction): their
        pre-`wave` append dirs become invisible atomically with the
        commit — the physical dirs stay (time travel), readers skip them.
        """
        pointer = self._read_pointer()
        if wave <= pointer["wave"]:
            raise ValueError(f"wave {wave} already committed (at {pointer['wave']})")
        pointer["tables"].update(staged)
        if append_base:
            ab = pointer.setdefault("append_base", {})
            ab.update({t: int(w) for t, w in append_base.items()})
        pointer["wave"] = wave
        os.makedirs(os.path.join(self.root, "_waves"), exist_ok=True)
        log = os.path.join(self.root, "_waves", f"wave-{wave:06d}.json")
        with open(log + ".tmp", "w") as f:
            json.dump(pointer, f)
        os.replace(log + ".tmp", log)
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(pointer, f)
        os.replace(tmp, self._pointer_path())  # the atomic publish
        self._session_staged = {
            p for p in self._session_staged if not p.endswith(f"wave={wave}")
        }
