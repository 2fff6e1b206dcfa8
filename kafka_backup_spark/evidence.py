"""Evidence reports (reference: evidence/report.rs:10-43, signing.rs, pdf.rs):
a JSON document built from validation-check results, with a SHA-256 integrity
digest over the per-partition summary lines (validation/message_count.rs:
101-104,135-137) and an optional signature.

The digest is computed IN Spark (sha2 over the sorted line aggregation) so it
is oracle-checkable; report assembly and signing are driver-side. Real ECDSA
signing requires a crypto library — import-gated with an HMAC-SHA256 stand-in
clearly marked as NOT a substitute for the reference's P-256 signatures.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCHEMA_VERSION = "1.0"


def partition_summary_lines(check: DataFrame) -> DataFrame:
    """A4 evidence lines: ``topic:partition:expected:restored`` per row."""
    return check.select(
        F.concat_ws(
            ":",
            F.col("topic"),
            F.col("partition").cast("string"),
            F.col("expected_count").cast("string"),
            F.col("restored_count").cast("string"),
        ).alias("line")
    )


def integrity_digest(check: DataFrame) -> DataFrame:
    """SHA-256 hex over the newline-joined, lexicographically sorted summary
    lines — one row, one column ``sha256_hex`` (F5)."""
    lines = partition_summary_lines(check)
    return lines.agg(
        F.sha2(
            F.concat_ws("\n", F.array_sort(F.collect_list("line"))).cast("binary"), 256
        ).alias("sha256_hex")
    )


def build_report(
    backup_id: str,
    summary_row: dict[str, Any],
    digest_hex: str,
    compliance_mappings: list[str] | None = None,
) -> dict[str, Any]:
    """EvidenceReport document (evidence/report.rs:10-43 field surface)."""
    return {
        "schema_version": SCHEMA_VERSION,
        "report_id": f"evidence-{backup_id}",
        "tool": {"name": "kafka-backup-spark", "engine": "pyspark"},
        "backup": {"backup_id": backup_id},
        "validation": summary_row,
        "integrity": {"algorithm": "sha256", "digest": digest_hex},
        "compliance_mappings": compliance_mappings or [],
    }


def sign_report(report: dict[str, Any], key: bytes) -> dict[str, Any]:
    """Attach a signature. With a crypto library present this would be ECDSA
    P-256 over the canonical JSON (evidence/signing.rs); the HMAC-SHA256
    fallback is a deterministic integrity seal, NOT public-key verifiable."""
    canonical = json.dumps(report, sort_keys=True, separators=(",", ":")).encode()
    sig = hmac_mod.new(key, canonical, hashlib.sha256).hexdigest()
    return {**report, "signature": {"algorithm": "hmac-sha256-stub", "value": sig}}
