"""Keyed side-table with merge-by-key CRUD: the API-key store analog.

Capability analog of the reference's security service, which keeps an
``ApiKey(key UNIQUE, name, is_active, is_initial, created_at,
last_used_at)`` row set in SQLite (reference
services/security_service/main.py:28-124, models.py:7-16):

  * create(key, name)            — insert-or-replace by unique key
    (main.py:90-97)
  * validate(key, now)           — active-key lookup that TOUCHES
    last_used_at on success (main.py:28-43)
  * delete_by_key(key) -> count  — (main.py:100-111)
  * delete_initial() -> count    — purge bootstrap keys (main.py:113-124)

Storage is a Parquet directory rewritten atomically (write temp + rename),
exactly the collection-sink pattern; on a cluster each operation is one
Iceberg ``MERGE INTO`` / ``DELETE FROM`` (noted per method). The table is
tiny (a side table, not a fact table), so the rewrite-whole-table fallback
is the right local shape.

Determinism: timestamps are PARAMETERS (epoch seconds), never wall clock —
the engine's byte-identity invariant extends to side tables.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEY_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("is_active", T.BooleanType()),
        T.StructField("is_initial", T.BooleanType()),
        T.StructField("created_at", T.DoubleType()),
        T.StructField("last_used_at", T.DoubleType()),
    ]
)


class KeyStore:
    """Merge-by-key CRUD over a small keyed Parquet side table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- read -----------------------------------------------------------------
    def read(self) -> DataFrame:
        if not os.path.isdir(self.path):
            return self.spark.createDataFrame([], KEY_SCHEMA)
        return self.spark.read.schema(KEY_SCHEMA).parquet(self.path)

    def _swap_in(self, df: DataFrame) -> None:
        """Atomic-ish replace: write temp, rename over (readers never see a
        half-written table)."""
        parent = os.path.dirname(self.path.rstrip("/")) or "."
        os.makedirs(parent, exist_ok=True)
        tmp = tempfile.mkdtemp(prefix="keystore_rewrite_", dir=parent)
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self.path, ignore_errors=True)
        os.rename(tmp, self.path)

    # -- CRUD -----------------------------------------------------------------
    def create(
        self, key: str, name: str, is_initial: bool = False, ts: float = 0.0
    ) -> None:
        """Insert-or-replace by unique key. Iceberg: MERGE INTO ... WHEN
        MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT."""
        row = self.spark.createDataFrame(
            [(key, name, True, is_initial, float(ts), None)], KEY_SCHEMA
        )
        kept = self.read().join(F.broadcast(row.select("key")), "key", "left_anti")
        self._swap_in(kept.unionByName(row))

    def validate(self, key: str, ts: float) -> bool:
        """True iff an ACTIVE row holds the key; on success last_used_at is
        set to ``ts`` (the reference's touch-on-use, main.py:35-41).
        Iceberg: UPDATE t SET last_used_at = ts WHERE key = ? AND
        is_active."""
        cur = self.read()
        hit = cur.filter((F.col("key") == key) & F.col("is_active")).limit(1).count() > 0
        if hit:
            touched = cur.withColumn(
                "last_used_at",
                F.when(
                    (F.col("key") == key) & F.col("is_active"), F.lit(float(ts))
                ).otherwise(F.col("last_used_at")),
            )
            self._swap_in(touched)
        return hit

    def delete_by_key(self, key: str) -> int:
        """Delete rows holding ``key``; returns the count deleted.
        Iceberg: DELETE FROM t WHERE key = ?."""
        cur = self.read()
        n_before = cur.count()
        # null-safe: `key != x` is NULL for NULL-key rows, which a plain
        # filter would silently drop (inflating the deleted count)
        kept = cur.filter(~F.col("key").eqNullSafe(F.lit(key)))
        self._swap_in(kept)
        return n_before - self.read().count()

    def delete_initial(self) -> int:
        """Purge bootstrap keys (reference main.py:113-124); returns count.
        Iceberg: DELETE FROM t WHERE is_initial."""
        cur = self.read()
        n_before = cur.count()
        self._swap_in(cur.filter(~F.col("is_initial")))
        return n_before - self.read().count()
