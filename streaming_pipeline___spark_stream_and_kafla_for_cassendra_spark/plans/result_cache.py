"""Plan-fingerprint result cache (Snowflake-style result reuse).

Dashboards and scheduled reports re-run identical queries against
unchanged inputs; re-executing a 100 TB scan to reproduce a KB-sized
result is pure waste. This cache keys a DataFrame's RESULT by

    md5( canonicalized-plan semantic hash
       + sorted (input file path, mtime_ns, size) list )

so a hit requires BOTH the same logical plan (Spark's
``semanticHash`` — alias/column-order insensitive) and bit-identical
input files. Any upstream rewrite (compaction, upsert, late data)
changes an mtime and silently misses to a fresh compute — correctness
never depends on TTLs or manual invalidation.

Storage follows the repo's lake discipline: each entry writes its
parquet under ``<root>/<key>/data`` then publishes with a marker file
LAST, so a crashed writer can never serve a partial result; replays
overwrite the same entry idempotently.

Scale: the fingerprint is driver-side metadata (file listing, no data
scan). Entries are result-sized, not input-sized. On object storage
the listing comes from the lake manifest instead of ``os.stat`` —
same contract, swap the stat source.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ResultCache:
    path: str

    def _entry(self, key: str) -> str:
        return os.path.join(self.path, key)

    def _marker(self, key: str) -> str:
        return os.path.join(self._entry(key), "_committed")

    @staticmethod
    def fingerprint(df: DataFrame) -> str | None:
        """Cache key = semantic plan hash + (path, mtime, size) of every
        input file. Returns ``None`` — *uncacheable* — when any input
        cannot be statted (object-store URIs, transient stat errors):
        hashing a stable sentinel there would keep serving a stale
        entry after the un-stattable input changed, silently breaking
        the "correctness never depends on TTLs" guarantee."""
        h = hashlib.md5()
        h.update(str(df.semanticHash()).encode())
        files = []
        for uri in df.inputFiles():
            p = uri[len("file:"):] if uri.startswith("file:") else uri
            try:
                st = os.stat(p)
            except OSError:
                return None
            files.append((p, st.st_mtime_ns, st.st_size))
        for rec in sorted(files):
            h.update(repr(rec).encode())
        return h.hexdigest()

    def lookup(self, spark: SparkSession, key: str) -> DataFrame | None:
        if os.path.exists(self._marker(key)):
            # Bump the entry mtime on every hit (ADVICE r7): LRU
            # pruning orders by entry-dir mtime, and publish-only
            # bumps let a HOT entry age out before an unused newer
            # one. Best-effort — a read-only or vanished entry must
            # still serve.
            try:
                os.utime(self._entry(key))
            except OSError:
                pass
            return spark.read.parquet(os.path.join(self._entry(key), "data"))
        return None

    def get_or_compute(self, df: DataFrame) -> tuple[DataFrame, bool]:
        """Return ``(result, was_hit)``; on a miss, materializes ``df``
        into the cache and serves the cached copy (so downstream reads
        never re-trigger the source scan either way)."""
        spark = df.sparkSession
        key = self.fingerprint(df)
        if key is None:  # un-stattable input: bypass, never publish
            return df, False
        hit = self.lookup(spark, key)
        if hit is not None:
            return hit, True
        data_dir = os.path.join(self._entry(key), "data")
        df.write.mode("overwrite").parquet(data_dir)
        with open(self._marker(key), "w", encoding="utf-8"):
            pass
        return spark.read.parquet(data_dir), False

    def get_or_materialize(self, spark, key: str, df_thunk):
        """Keyed variant of :meth:`get_or_compute` for SHARED
        INTERMEDIATES: the caller owns the cache key (params + input
        file stats + implementation source hash), so the DataFrame —
        and any exec-at-build pre-flight its construction runs — is
        only built on a miss (``df_thunk`` is a zero-arg callable).

        Publish is race-safe for concurrent writers: the parquet is
        written to a unique temp dir inside the entry, then
        ``os.rename``d to ``data/`` — atomic on a local filesystem,
        and the rename FAILS if a concurrent writer already published,
        in which case the loser discards its copy and serves the
        winner's (both computed the same result by construction).
        Returns ``(result_df, was_hit)``."""
        import shutil
        import uuid

        hit = self.lookup(spark, key)
        if hit is not None:
            return hit, True
        df = df_thunk()
        entry = self._entry(key)
        os.makedirs(entry, exist_ok=True)
        data_dir = os.path.join(entry, "data")
        tmp_dir = os.path.join(entry, f"data-tmp-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp_dir)
        try:
            os.rename(tmp_dir, data_dir)
        except OSError:
            # The rename fails for one BENIGN reason — a concurrent
            # writer already published ``data/`` (lost the race; both
            # computed the same result by construction, serve the
            # winner's). Any other failure (permissions, cross-device
            # link) left NO data behind; writing the marker anyway
            # would advertise an entry whose reads fail forever, so
            # re-raise instead (ADVICE r6).
            shutil.rmtree(tmp_dir, ignore_errors=True)
            if not os.path.isdir(data_dir):
                raise
        # Marker LAST, and only once data/ verifiably exists.
        if not os.path.isdir(data_dir):  # pragma: no cover - defensive
            raise OSError(f"result cache publish left no data dir: {data_dir}")
        with open(self._marker(key), "w", encoding="utf-8"):
            pass
        return spark.read.parquet(data_dir), False

    def clear(self) -> None:
        import shutil

        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
