"""kafka_backup_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference Kafka backup/restore tool
(osodevops/kafka-backup, surveyed in SURVEY.md).

Design: declare everything as DataFrame plans and let Catalyst/Tungsten pick
physical strategies. The reference's hand-rolled concurrency, pruning,
batching and retry machinery map onto built-in Spark primitives (see
SURVEY.md §4); only three things need custom expressions:

- Kafka murmur2 partitioner (``functions.murmur2``)
- little-endian i64/i32 header codecs (``functions.codecs``)
- glob→regex translation (``functions.globs``)

Everything else — PITR pruning, as-of offset lookups, manifest aggregation,
validation checks, repartitioning — is pure DataFrame API, designed to scale
to 1000-executor clusters (broadcast small sides, no driver-side collects in
the data path, AQE-friendly shuffles).
"""

__version__ = "0.1.0"
