"""Copy-on-write parquet table store.

Local stand-in for a transactional table format: Delta/Iceberg jars are
not in this image (see pyspark guide), so writes go to a new versioned
directory and a ``_CURRENT`` pointer file flips atomically — readers never
see a partial write, and failed jobs leave the previous version intact
(the reference's "commit nothing on hard error" transaction guarantee,
SURVEY §7.3 item 5, via shadow-write-then-publish).

On a real cluster, swap ParquetTable for Delta and operators/merge.py
feeds MERGE INTO unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class ParquetTable:
    def __init__(self, spark: SparkSession, path: str, keep_versions: int = 2):
        """*keep_versions* controls vacuum retention: raise it (or pass a
        large value) to keep historical versions readable for time-travel
        — pinning the exact corpus snapshot a training run consumed is
        the reproducibility guarantee a data pipeline owes its models."""
        self.spark = spark
        self.path = path
        self.keep_versions = keep_versions
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def exists(self) -> bool:
        return self.current_version() is not None

    def versions(self) -> list[int]:
        """Version numbers still on disk (ascending) — the time-travel
        horizon. Bounded by keep_versions at each flip."""
        return sorted(
            int(name[1:])
            for name in os.listdir(self.path)
            if name.startswith("v") and name[1:].isdigit()
        )

    def read(self, version: int | None = None) -> DataFrame:
        """Current version, or a pinned historical *version* (time
        travel). Raises FileNotFoundError for vacuumed/unknown versions."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no published version at {self.path}")
        out = os.path.join(self.path, f"v{v}")
        if not os.path.isdir(out):
            raise FileNotFoundError(
                f"version {v} not on disk at {self.path} "
                f"(kept: {self.versions()}; raise keep_versions to retain more)"
            )
        return self.spark.read.parquet(out)

    def stage(self, df: DataFrame) -> int:
        """Write a new version directory WITHOUT flipping the pointer.
        Readers keep seeing the old version until flip(); a failure after
        staging leaves only an unreferenced directory behind. Lets a
        multi-table promotion do all its expensive writes first and flip
        every pointer in one quick final pass."""
        v = (self.current_version() or 0) + 1
        out = os.path.join(self.path, f"v{v}")
        df.write.mode("overwrite").parquet(out)
        return v

    def flip(self, v: int) -> None:
        """Atomically point readers at a previously staged version."""
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer)
        self._vacuum(keep=self.keep_versions)

    def publish(self, df: DataFrame) -> int:
        """Write a new version, then flip the pointer (atomic rename)."""
        v = self.stage(df)
        self.flip(v)
        return v

    def append(self, df: DataFrame, evolve: bool = False) -> int:
        """Append rows as a new version. With *evolve*, either side may
        carry columns the other lacks (schema evolution on append): the
        union fills the gaps with NULLs, so old rows acquire new columns
        as NULL and late producers of a dropped column keep working —
        the additive-only evolution contract a training corpus needs
        (never silently drops or retypes existing columns)."""
        if self.exists():
            return self.publish(
                self.read().unionByName(df, allowMissingColumns=evolve)
            )
        return self.publish(df)

    def compact(self, target_files: int) -> int:
        """Rewrite the current version into *target_files* files (small-
        file compaction after many incremental appends — the OPTIMIZE
        step). Data is unchanged: readers see the same rows, just fewer,
        larger files; published as a normal new version so time travel
        and the atomic pointer flip still hold. coalesce() not
        repartition(): no shuffle, partitions merge in place."""
        return self.publish(self.read().coalesce(target_files))

    def _vacuum(self, keep: int) -> None:
        v = self.current_version() or 0
        for name in os.listdir(self.path):
            if name.startswith("v") and name[1:].isdigit() and int(name[1:]) <= v - keep:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)
