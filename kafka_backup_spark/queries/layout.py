"""Bucketed, co-partitioned TPC-H fact layout (r12).

The reference keys its segment store by topic/partition so restores never
shuffle (backup/engine.rs:1156-1162 — partition-aligned segment layout);
``SegmentStore.write_bucketed`` is the Spark analog for record segments.
This module applies the same storage discipline to the analytic fact
tables: ``lineitem`` and ``orders`` written ``bucketBy(N, orderkey)`` +
``sortBy(orderkey)``, one file per bucket.

What co-location buys, per plan shape:

- every ``lineitem ⋈ orders ON l_orderkey = o_orderkey`` reads co-located
  buckets — BOTH exchanges and both sort stages disappear (SMJ zips the
  pre-sorted bucket files);
- every ``GROUP BY l_orderkey[, ...]`` and ``PARTITION BY l_orderkey``
  window is satisfied by the bucket hash-partitioning — the aggregate
  runs single-phase with no exchange (HashPartitioning on a subset of the
  clustering keys satisfies ClusteredDistribution).

At 100 TB this is the layout a deployment would actually run: the
write-side shuffle is paid ONCE (at ingest/compaction time, exactly like
the reference's segment writer), then every orderkey-keyed join, rollup
and window in the workload reads it back shuffle-free.  Bucket count is a
real knob: it caps the scan parallelism of bucket-aware reads, so size it
to the cluster (total cores or a small multiple), not to the data.

Session requirements for bucket-aware reads (asserted by the probe and
tests): ``spark.sql.sources.bucketing.enabled=true`` (default) and one
file per bucket (``materialize_bucketed`` repartitions on the bucket key
before the write so each bucket is written by exactly one task — required
for the sort metadata to eliminate SMJ sorts).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

# table → (bucket/sort key, catalog-table suffix)
BUCKET_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}
MANIFEST = "bucketed_layout.json"


def _table_name(table: str) -> str:
    return f"{table}_b"


def materialize_bucketed(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    buckets: int | None = None,
    tables: tuple[str, ...] = ("lineitem", "orders"),
) -> dict:
    """One-time layout build: write each fact table bucketed + sorted by
    its orderkey into ``out_root`` and register it in the session catalog.
    Returns the layout manifest (also persisted as JSON for cross-session
    re-registration via ``register_bucketed``).

    The pre-write ``repartition(buckets, key)`` is load-bearing: bucketBy
    writes one file per bucket PER TASK, and Spark only trusts the sortBy
    metadata (and skips SMJ sorts) when each bucket is a single file."""
    from kafka_backup_spark import fsio

    out_root = fsio.require_local(out_root, "materialize_bucketed")
    if buckets is None:
        # scale-aware default: ~24 MB of compressed parquet per bucket from
        # the largest table, clamped to [2, defaultParallelism] — the same
        # input-proportional sizing logic as autosize_shuffle_partitions
        # (a bucket is a permanent reduce-task floor for every bucket-aware
        # scan, so 32 near-empty buckets at sf0.1 would pay 32-task
        # scheduling on every query; at sf10 the formula lands on the
        # parallelism cap, which is what the adoption A/B measured)
        biggest = max(
            sum(
                os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(f"{sf_dir}/{t}.parquet")
                for f in fs
                if f.endswith(".parquet")
            )
            if os.path.isdir(f"{sf_dir}/{t}.parquet")
            else os.path.getsize(f"{sf_dir}/{t}.parquet")
            for t in tables
        )
        cap = max(2, spark.sparkContext.defaultParallelism)
        buckets = min(cap, max(2, -(-biggest // (24 << 20))))
    entry: dict = {"buckets": buckets, "sf_dir": sf_dir, "tables": {}}
    os.makedirs(out_root, exist_ok=True)
    for t in tables:
        key = BUCKET_KEYS[t]
        name = _table_name(t)
        path = os.path.join(out_root, name)
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.repartition(buckets, key)
            .write.bucketBy(buckets, key)
            .sortBy(key)
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(name)
        )
        entry["tables"][t] = {
            "name": name,
            "key": key,
            "path": path,
            "schema_ddl": df.schema.toDDL(),
        }
    tmp = os.path.join(out_root, MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(entry, fh, indent=2)
    os.replace(tmp, os.path.join(out_root, MANIFEST))
    return entry


def register_bucketed(spark: SparkSession, out_root: str) -> dict | None:
    """Re-attach an existing bucketed layout to a fresh session (the
    in-memory catalog forgets tables at session end; the files and the
    layout manifest persist).  Returns the manifest, or None when
    ``out_root`` holds no layout."""
    try:
        with open(os.path.join(out_root, MANIFEST)) as fh:
            entry = json.load(fh)
    except FileNotFoundError:
        return None
    for t, spec in entry["tables"].items():
        name, key = spec["name"], spec["key"]
        if spark.catalog.tableExists(name):
            continue
        spark.sql(
            f"CREATE TABLE {name} ({spec['schema_ddl']}) USING parquet "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) "
            f"INTO {entry['buckets']} BUCKETS "
            f"LOCATION '{spec['path']}'"
        )
    return entry
