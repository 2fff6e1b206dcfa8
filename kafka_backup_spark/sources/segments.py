"""Segment store: the Parquet replacement for the reference's hand-rolled
segment files.

The reference appends length-prefixed records into a buffer, compresses the
whole block (zstd-3), adds magic + CRC32 footer, and PUTs
``topics/{topic}/partition={id}/segment-{start_offset:020}.bin.zst``
(segment/format.rs:1-65, segment/writer.rs:65-328, key layout
backup/engine.rs:1156-1162). Parquet partitioned by (topic, partition) gives
the same thing with columnar layout, zstd, min/max zone maps and checksums
built in — so P4's segment pruning becomes ordinary parquet file/row-group
skipping, and A11's CRC validation becomes parquet footer verification.

Rotation policy (≤128 MB / ≤60 s, writer.rs:237-251) maps to
``spark.sql.files.maxRecordsPerFile`` for batch and micro-batch triggers for
streaming. Storage backends (S6: s3/azure/gcs/file/memory) are Hadoop
filesystem URIs — zero custom code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_backup_spark.schema import RECORD_COLUMNS

DEFAULT_MAX_RECORDS_PER_FILE = 4_000_000  # ≈128 MB of typical ~32 B records

# Legacy JSON segment record shape (reference manifest.rs:183-266): key/value
# are optional base64 strings, header values base64, timestamp epoch-ms.
# Declared explicitly so the reader never pays schema inference.
LEGACY_JSON_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("value", StringType(), True),
        StructField(
            "headers",
            ArrayType(
                StructType(
                    [
                        StructField("key", StringType(), False),
                        StructField("value", StringType(), True),
                    ]
                )
            ),
            True,
        ),
        StructField("timestamp", LongType(), False),
        StructField("offset", LongType(), False),
    ]
)


def write_legacy_segments(root: str, records, gzip_partitions: frozenset = frozenset()) -> int:
    """Write records as legacy-format JSON segments (test/fixture scaffolding;
    the engine WRITES parquet only — this exists so the dual-format reader has
    real legacy bytes to migrate from, matching the reference serde
    manifest.rs:183-266 field-for-field).

    ``records``: iterable of dicts with topic, partition, offset, ts_ms,
    key/value (bytes | None), headers (list of (str, bytes)).  One compact
    single-line JSON array per (topic, partition), gzipped for partitions in
    ``gzip_partitions`` (exercises extension-based decompression).  Returns
    the number of segment files written."""
    import base64
    import gzip
    import json
    import os
    from collections import defaultdict

    groups = defaultdict(list)
    for r in records:
        groups[(r["topic"], r["partition"])].append(r)

    def b64(b):
        return None if b is None else base64.b64encode(bytes(b)).decode("ascii")

    n_files = 0
    for (topic, part), rows in groups.items():
        rows.sort(key=lambda r: r["offset"])
        payload = [
            {
                "key": b64(r["key"]),
                "value": b64(r["value"]),
                # null header VALUES stay null (nullable field in
                # LEGACY_JSON_SCHEMA; reference serde manifest.rs:183-266
                # distinguishes absent from empty) — ADVICE r2
                "headers": [
                    {"key": hk, "value": b64(hv)} for hk, hv in r.get("headers", [])
                ],
                "timestamp": r["ts_ms"],
                "offset": r["offset"],
            }
            for r in rows
        ]
        d = f"{root}/topics/{topic}/partition={part}"
        os.makedirs(d, exist_ok=True)
        name = f"segment-{rows[0]['offset']:020d}.json"
        data = json.dumps(payload, separators=(",", ":")).encode()
        if part in gzip_partitions:
            path = f"{d}/{name}.gz"
            tmp = path + ".tmp"
            with gzip.open(tmp, "wb") as f:
                f.write(data)
        else:
            path = f"{d}/{name}"
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
        os.replace(tmp, path)  # atomic: concurrent fixture builders converge
        n_files += 1
    return n_files


class SegmentStore:
    """Write/read the canonical record stream as a partitioned Parquet store."""

    def __init__(self, root: str):
        self.root = root.rstrip("/")

    def topics_path(self) -> str:
        return f"{self.root}/topics"

    def write(
        self,
        records: DataFrame,
        max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
        compression: str | None = None,
        zstd_level: int | None = None,
    ) -> None:
        """S4: segment sink. partitionBy(topic, partition) reproduces the
        reference's object-key layout; each task writes its own files in
        parallel (the reference's one-in-flight-upload pipeline is subsumed
        by executor parallelism).  ``compression``/``zstd_level`` map the
        reference's codec knobs (config.rs:415-419) onto the parquet writer
        (level rides the Hadoop conf — parquet reads it at write time)."""
        if zstd_level is not None:
            records.sparkSession.sparkContext._jsc.hadoopConfiguration().set(
                "parquet.compression.codec.zstd.level", str(int(zstd_level))
            )
        writer = (
            records.select(*[c for c in RECORD_COLUMNS if c in records.columns])
            # one shuffle so each (topic, partition) is written by one task →
            # no small-file explosion at 1000 executors
            .repartition("topic", "partition")
            # sort by the PARTITION COLUMNS first, then offset: the dynamic
            # partition writer requires ordering on its partition columns and
            # inserts its own NON-STABLE sort when the child doesn't provide
            # it — a bare offset sort was silently destroyed, leaving files
            # offset-shuffled within each partition dir (caught by the
            # compaction plan→execution parity test)
            .sortWithinPartitions("topic", "partition", "offset")
            .write.option("maxRecordsPerFile", max_records_per_file)
        )
        if compression is not None:
            writer = writer.option("compression", compression)
        writer.partitionBy("topic", "partition").mode("append").parquet(self.topics_path())

    def read(self, spark: SparkSession) -> DataFrame:
        """S5: segment source. Partition-column recovery of topic/partition is
        automatic; offset/timestamp predicates push down to row-group stats."""
        # load only the hive-layout topic dirs (legacy JSON segments may share
        # the store root); basePath keeps partition-column recovery rooted
        df = (
            spark.read.option("basePath", self.topics_path())
            .parquet(f"{self.topics_path()}/topic=*")
        )
        return df.withColumn("partition", df["partition"].cast("int"))

    def read_any(self, spark: SparkSession) -> DataFrame:
        """Dual-format read: union parquet segments with any legacy JSON
        segments living in the same store (the reference decides per segment
        by magic bytes, restore/helpers.rs:17-52; here format is carried by
        the file extension, so each side is a normal pruned scan and a
        migration-era store restores without any conversion step)."""
        def _hits(pattern: str) -> bool:
            # Hadoop glob, not python glob: works on any S6 backend URI
            jvm = spark._jvm
            p = jvm.org.apache.hadoop.fs.Path(pattern)
            fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
            return bool(fs.globStatus(p))

        has_legacy = _hits(f"{self.topics_path()}/*/partition=*/segment-*.json") or _hits(
            f"{self.topics_path()}/*/partition=*/segment-*.json.gz"
        )
        has_parquet = _hits(f"{self.topics_path()}/topic=*/partition=*/*.parquet")
        if has_legacy and has_parquet:
            return self.read(spark).unionByName(self.read_legacy(spark))
        if has_legacy:
            return self.read_legacy(spark)
        return self.read(spark)

    def read_legacy(self, spark: SparkSession) -> DataFrame:
        """S5 dual format: legacy JSON segments → canonical record stream.

        The reference reads segments written before its binary format as a
        JSON array of records with base64 key/value/header-value fields
        (restore/helpers.rs:17-52; serde shape manifest.rs:183-266), with
        compression detected from the file extension (compression.rs:46-54).
        Spark-first equivalent: a schema'd line-mode JSON scan — Hadoop
        codecs transparently decompress ``.gz`` by extension, a top-level
        array on a line explodes into rows, and each file is an independent
        split, so a migration store with thousands of legacy segments reads
        embarrassingly parallel.  topic/partition come from the object-key
        layout ``topics/{topic}/partition={p}/``, exactly where the reference
        writer put them (backup/engine.rs:1156-1162).

        Note: files must be the compact single-line arrays the reference's
        serde_json emits (pretty-printed JSON would need multiLine=true,
        which forces whole-file parsing and loses per-line splitting).
        """
        path = f"{self.topics_path()}/*/partition=*/segment-*.json*"
        df = spark.read.schema(LEGACY_JSON_SCHEMA).json(path)
        fn = F.input_file_name()
        return df.select(
            F.unbase64(F.col("key")).alias("key"),
            F.unbase64(F.col("value")).alias("value"),
            F.regexp_extract(fn, r"topics/([^/]+)/partition=", 1).alias("topic"),
            F.regexp_extract(fn, r"partition=(\d+)/", 1).cast("int").alias("partition"),
            F.col("offset"),
            F.timestamp_millis(F.col("timestamp")).alias("timestamp"),
            F.lit(0).alias("timestampType"),
            F.transform(
                F.col("headers"),
                lambda h: F.struct(
                    h["key"].alias("key"), F.unbase64(h["value"]).alias("value")
                ),
            ).alias("headers"),
        )

    def write_bucketed(
        self,
        records: DataFrame,
        table: str,
        buckets: int = 64,
        max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    ) -> None:
        """S4 variant: segment table bucketed + sorted by (topic, partition).

        Bucketing pre-shuffles ONCE at write time; every later equi-join or
        aggregation keyed on (topic, partition) — restore⋈mapping, as-of
        lookups, validation joins — reads co-located buckets and skips its
        exchange entirely (asserted in test_plan_quality).  At 100 TB the
        repeated-join workloads (three-phase restore, validation sweeps)
        amortize the one write-side shuffle across every downstream query.
        Requires a session catalog (saveAsTable); the plain parquet layout
        in ``write`` stays the default for catalog-less stores."""
        (
            records.write.bucketBy(buckets, "topic", "partition")
            .sortBy("topic", "partition", "offset")
            .option("maxRecordsPerFile", max_records_per_file)
            .option("path", f"{self.root}/bucketed/{table}")
            .mode("append")
            .saveAsTable(table)
        )

    def compact_bucketed(
        self,
        spark: SparkSession,
        buckets: int | None = None,
        table: str = "segments_b",
    ) -> dict:
        """Compaction that lands the store's records as a bucketed
        co-partitioned layout DIRECTLY — produced where the reference
        produces its layout (backup/engine.rs:1156-1162 keys segments at
        write time), not by a separate bench-side materialize step.

        Pays the (topic, partition) shuffle once at the compaction
        boundary; every later restore⋈mapping join, validation sweep and
        as-of window keyed on (topic, partition) reads co-located,
        offset-SORTED buckets — no exchange, and under the layout's
        one-file-per-bucket contract no sort either (the same mechanism as
        q17's partkey family).  Output is a layout ROOT
        (``{root}/bucketed``: manifest + bucketed table) that
        queries/layout.register_bucketed re-attaches in any later session;
        the plain partitioned store stays untouched as the record of
        truth.  Bucket count defaults to the same input-proportional
        sizing as the TPC-H families (~24 MB per bucket, clamped to the
        session parallelism).

        The catalog table name defaults to ``segments_b`` — a ONE STORE
        PER NAME contract: compacting a second store in the same session
        under the same name would drop and rebind the first store's
        catalog table out from under earlier references, so this raises
        when ``table`` already exists bound to a DIFFERENT store root;
        pass a distinct ``table`` per store (ADVICE r13 #3)."""
        import json
        import os

        from kafka_backup_spark import fsio
        from kafka_backup_spark.queries import layout

        if spark.catalog.tableExists(table):
            loc = layout._table_location(spark, table)
            want = layout._norm_location(os.path.join(f"{self.root}/bucketed", table))
            if loc is not None and layout._norm_location(loc) != want:
                raise ValueError(
                    f"catalog table {table!r} is already bound to {loc} — "
                    f"compacting store {self.root!r} under the same name "
                    "would silently rebind earlier references; pass a "
                    "distinct table= per store"
                )

        if buckets is None:
            nbytes = fsio.dataset_bytes(self.topics_path())
            cap = max(2, spark.sparkContext.defaultParallelism)
            buckets = min(cap, max(2, -(-nbytes // (24 << 20))))
        root = f"{self.root}/bucketed"
        spec = layout.write_bucketed_table(
            spark,
            self.read(spark),
            table,
            os.path.join(root, table),
            ["topic", "partition"],
            ["topic", "partition", "offset"],
            buckets,
        )
        entry = {"buckets": buckets, "sf_dir": self.topics_path(), "tables": {table: spec}}
        fsio.write_text(os.path.join(root, layout.MANIFEST), json.dumps(entry, indent=2))
        return entry

    def compact(
        self,
        spark: SparkSession,
        max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    ) -> None:
        """Operational compaction: incremental/streaming backups accumulate a
        file per micro-batch per (topic, partition); rewrite the store so
        each partition holds offset-sorted files of target size again (the
        reference's 128 MB segment discipline, writer.rs:237-251). Atomic
        via write-new → swap directories; at scale run per-topic to bound
        the rewrite working set."""
        import os
        import shutil

        current = self.read(spark)
        tmp_root = f"{self.root}/.compact-tmp"
        (
            current.repartition("topic", "partition")
            .sortWithinPartitions("topic", "partition", "offset")
            .write.option("maxRecordsPerFile", max_records_per_file)
            .partitionBy("topic", "partition")
            .mode("overwrite")
            .parquet(tmp_root)
        )
        old = f"{self.root}/.compact-old"
        os.rename(self.topics_path(), old)
        os.rename(tmp_root, self.topics_path())
        shutil.rmtree(old)
