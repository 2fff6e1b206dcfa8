"""CLI mirroring the reference's command surface (kafka-backup-cli/src/
main.rs:29-233): backup, restore, dry-run, describe, list, validate,
show-offset-mapping, offset-reset — each a thin driver over the engine
modules, file-backed so every command runs without a Kafka cluster (cluster
I/O goes through sources/kafka_io and is import-gated).

    python -m kafka_backup_spark backup  --config cfg.yaml --source-parquet events.parquet --store /data/bk
    python -m kafka_backup_spark restore --config cfg.yaml --store /data/bk --out /data/restored
    python -m kafka_backup_spark dry-run --config cfg.yaml --store /data/bk
    python -m kafka_backup_spark describe --store /data/bk --backup-id bk-1
    python -m kafka_backup_spark validate --store /data/bk --backup-id bk-1
"""

from __future__ import annotations

import argparse
import json
import sys

from kafka_backup_spark import config as cfgmod
from kafka_backup_spark import manifest as mani
from kafka_backup_spark.engine import BackupEngine, RestoreEngine
from kafka_backup_spark.manifest_store import ManifestStore
from kafka_backup_spark.session import get_spark
from kafka_backup_spark.sources.segments import SegmentStore


def _rows(df) -> list[dict]:
    return [r.asDict() for r in df.collect()]


def _emit(obj) -> None:
    print(json.dumps(obj, default=str))


def cmd_backup(args, doc) -> int:
    spark = get_spark("cli-backup")
    from kafka_backup_spark.schema import events_as_records

    records = events_as_records(spark.read.parquet(args.source_parquet))
    store = SegmentStore(args.store)
    engine = BackupEngine(store, cfgmod.backup_config(doc))
    manifest = engine.run(records)
    mstore = ManifestStore(args.store, doc["backup_id"])
    docjson = mstore.save(manifest, source_cluster_id=cfgmod.backup_config(doc).source_cluster)
    _emit({"backup_id": doc["backup_id"], "segments": sum(
        len(p["segments"]) for t in docjson["topics"] for p in t["partitions"]
    )})
    return 0


def cmd_restore(args, doc) -> int:
    spark = get_spark("cli-restore")
    store = SegmentStore(args.store)
    engine = RestoreEngine(store, cfgmod.restore_config(doc))
    out = engine.plan(spark)
    out.write.mode("overwrite").parquet(args.out)
    _emit({"restored_records": spark.read.parquet(args.out).count(), "out": args.out})
    return 0


def cmd_dry_run(args, doc) -> int:
    spark = get_spark("cli-dryrun")
    m = ManifestStore(args.store, doc["backup_id"]).load(spark)
    if m is None:
        print("no manifest found", file=sys.stderr)
        return 1
    r = cfgmod.restore_config(doc)
    est = mani.dry_run_estimate(m, r.window_start_ms, r.window_end_ms)
    _emit({"estimate": _rows(est.orderBy("topic", "partition"))})
    return 0


def cmd_describe(args, _doc) -> int:
    spark = get_spark("cli-describe")
    m = ManifestStore(args.store, args.backup_id).load(spark)
    if m is None:
        print("no manifest found", file=sys.stderr)
        return 1
    _emit({"describe": _rows(mani.describe(m).orderBy("topic", "partition"))})
    return 0


def cmd_list(args, _doc) -> int:
    spark = get_spark("cli-list")
    import glob as globmod
    import os

    out = []
    for path in sorted(globmod.glob(f"{args.store}/*/manifest.json")):
        backup_id = os.path.basename(os.path.dirname(path))
        m = ManifestStore(args.store, backup_id).load(spark)
        totals = mani.manifest_totals(m).collect()[0].asDict()
        out.append({"backup_id": backup_id, **totals})
    _emit({"backups": out})
    return 0


def cmd_validate(args, _doc) -> int:
    """A11-style integrity scan: manifest vs a re-scan of the store."""
    spark = get_spark("cli-validate")
    from kafka_backup_spark.validation.checks import integrity_scan, validation_summary

    m = ManifestStore(args.store, args.backup_id).load(spark)
    if m is None:
        print("no manifest found", file=sys.stderr)
        return 1
    rescan = mani.build_manifest(SegmentStore(args.store).read(spark))
    observed = rescan.select("key", "record_count", "start_offset", "end_offset")
    scan = integrity_scan(m, observed)
    summary = validation_summary(scan.withColumnRenamed("status", "status"))
    _emit({
        "segments": _rows(scan.orderBy("key")),
        "summary": _rows(summary)[0],
    })
    return 0


def cmd_show_offset_mapping(args, _doc) -> int:
    spark = get_spark("cli-mapping")
    from kafka_backup_spark.three_phase import build_offset_mapping, mapping_ranges

    target = spark.read.parquet(args.target_parquet)
    detailed = build_offset_mapping(target)
    _emit({"ranges": _rows(mapping_ranges(detailed).orderBy("topic", "partition"))})
    return 0


COMMANDS = {
    "backup": cmd_backup,
    "restore": cmd_restore,
    "dry-run": cmd_dry_run,
    "describe": cmd_describe,
    "list": cmd_list,
    "validate": cmd_validate,
    "show-offset-mapping": cmd_show_offset_mapping,
}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kafka_backup_spark")
    ap.add_argument("command", choices=sorted(COMMANDS))
    ap.add_argument("--config", help="YAML config (reference document shape)")
    ap.add_argument("--store", required=True, help="segment/manifest store root")
    ap.add_argument("--backup-id", help="backup id (for describe/validate)")
    ap.add_argument("--source-parquet", help="backup: source events parquet")
    ap.add_argument("--target-parquet", help="show-offset-mapping: restored records parquet")
    ap.add_argument("--out", help="restore: output parquet path")
    args = ap.parse_args(argv)

    doc = None
    if args.config:
        doc = cfgmod.load_config(args.config)
        if not args.backup_id:
            args.backup_id = doc.get("backup_id")
    return COMMANDS[args.command](args, doc)


if __name__ == "__main__":
    raise SystemExit(main())
