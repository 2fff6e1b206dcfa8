"""Evidence reports (reference: evidence/report.rs:10-43, signing.rs, pdf.rs):
a JSON document built from validation-check results, with a SHA-256 integrity
digest over the per-partition summary lines (validation/message_count.rs:
101-104,135-137) and an ECDSA-P256-SHA256 detached signature.

The digest is computed IN Spark (sha2 over the sorted line aggregation) so it
is oracle-checkable; report assembly and signing are driver-side.  Signing
uses the ``cryptography`` library (import-gated — an HMAC-SHA256 stand-in
remains for environments without it, clearly marked as not public-key
verifiable).  The detached ``.sig`` bundle format matches signing.rs'
SignatureBundle text layout so reference-side tooling can parse it.
"""

from __future__ import annotations

import base64
import hashlib
import hmac as hmac_mod
import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCHEMA_VERSION = "1.0"
SIG_ALGORITHM = "ECDSA-P256-SHA256"
_SIG_BEGIN = "-----BEGIN KAFKA BACKUP EVIDENCE SIGNATURE-----"
_SIG_END = "-----END KAFKA BACKUP EVIDENCE SIGNATURE-----"


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
    backup_info: dict[str, Any] | None = None,
    restore_info: dict[str, Any] | None = None,
    generated_at: str | None = None,
    triggered_by: str | None = None,
    manifest_sha256: str | None = None,
) -> dict[str, Any]:
    """EvidenceReport document (evidence/report.rs:10-43 field surface)."""
    report: dict[str, Any] = {
        "schema_version": SCHEMA_VERSION,
        "report_id": f"evidence-{backup_id}",
        "generated_at": generated_at,
        "tool": {"name": "kafka-backup-spark", "engine": "pyspark"},
        "backup": {"backup_id": backup_id, **(backup_info or {})},
        "validation": summary_row,
        "integrity": {
            "algorithm": "sha256",
            "digest": digest_hex,
            "backup_manifest_sha256": manifest_sha256,
        },
        "compliance_mappings": compliance_mappings or [],
    }
    if restore_info is not None:
        report["restore"] = restore_info
    if triggered_by is not None:
        report["triggered_by"] = triggered_by
    return report


def canonical_json(report: dict[str, Any]) -> bytes:
    return json.dumps(report, sort_keys=True, separators=(",", ":")).encode()


def generate_signing_key() -> tuple[bytes, bytes]:
    """(private_pem, public_pem) P-256 keypair for report signing."""
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import ec

    key = ec.generate_private_key(ec.SECP256R1())
    priv = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )
    pub = key.public_key().public_bytes(
        serialization.Encoding.PEM, serialization.PublicFormat.SubjectPublicKeyInfo
    )
    return priv, pub


def sign_report(report: dict[str, Any], private_key_pem: bytes) -> dict[str, Any]:
    """Detached SignatureBundle over the canonical JSON (evidence/signing.rs):
    ECDSA-P256-SHA256, DER signature base64-encoded, plus the report's
    SHA-256 hex so a verifier can pin exactly what was signed."""
    canonical = canonical_json(report)
    digest = hashlib.sha256(canonical).hexdigest()
    try:
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import ec
    except ImportError:  # pragma: no cover - crypto lib absent
        sig = hmac_mod.new(private_key_pem, canonical, hashlib.sha256).hexdigest()
        return {
            "algorithm": "hmac-sha256-stub",  # NOT public-key verifiable
            "report_id": report["report_id"],
            "report_sha256": digest,
            "signature": sig,
        }
    key = serialization.load_pem_private_key(private_key_pem, password=None)
    der_sig = key.sign(canonical, ec.ECDSA(hashes.SHA256()))
    return {
        "algorithm": SIG_ALGORITHM,
        "report_id": report["report_id"],
        "report_sha256": digest,
        "signature": base64.b64encode(der_sig).decode("ascii"),
    }


def verify_report(report: dict[str, Any], bundle: dict[str, Any], public_key_pem: bytes) -> bool:
    """True iff the bundle's signature covers exactly this report."""
    from cryptography.exceptions import InvalidSignature
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec

    canonical = canonical_json(report)
    if hashlib.sha256(canonical).hexdigest() != bundle["report_sha256"]:
        return False
    key = serialization.load_pem_public_key(public_key_pem)
    try:
        key.verify(
            base64.b64decode(bundle["signature"]), canonical, ec.ECDSA(hashes.SHA256())
        )
        return True
    except InvalidSignature:
        return False


def to_sig_file(bundle: dict[str, Any]) -> str:
    """Detached ``.sig`` text format (signing.rs SignatureBundle::to_sig_file)."""
    return (
        f"{_SIG_BEGIN}\n"
        f"Algorithm: {bundle['algorithm']}\n"
        f"Report-ID: {bundle['report_id']}\n"
        f"Report-SHA256: {bundle['report_sha256']}\n"
        f"Signature: {bundle['signature']}\n"
        f"{_SIG_END}\n"
    )


def render_report_markdown(report: dict[str, Any], bundle: dict[str, Any] | None = None) -> str:
    """Human-readable report document — the printable counterpart of the
    reference's PDF renderer (evidence/pdf.rs:21-260: title, backup block,
    validation table, integrity + signature block), emitted as markdown
    (no PDF library in this environment; the document structure is the
    parity surface, the container format is not)."""
    from kafka_backup_spark.functions.formatting import format_number

    b = report.get("backup", {})
    v = report.get("validation", {})
    i = report.get("integrity", {})
    lines = [
        "# Kafka Backup Evidence Report",
        "",
        f"- **Report ID**: {report.get('report_id')}",
        f"- **Generated at**: {report.get('generated_at')}",
        f"- **Tool**: {report.get('tool', {}).get('name')} ({report.get('tool', {}).get('engine')})",
        "",
        "## Backup",
        "",
        f"- **Backup ID**: {b.get('backup_id')}",
    ]
    if b.get("source_cluster_id") is not None:
        lines.append(f"- **Source cluster**: {b['source_cluster_id']}")
    for field, label in (
        ("total_topics", "Topics"),
        ("total_partitions", "Partitions"),
        ("total_segments", "Segments"),
        ("total_records", "Records"),
    ):
        if b.get(field) is not None:
            lines.append(f"- **{label}**: {format_number(b[field])}")
    lines += ["", "## Validation", ""]
    overall = v.get("overall", "unknown")
    lines.append(f"**Overall result: {str(overall).upper()}**")
    lines += ["", "| Check | Result |", "|---|---|"]
    for key, val in v.items():
        if key != "overall":
            lines.append(f"| {key} | {val} |")
    lines += [
        "",
        "## Integrity",
        "",
        f"- **Digest ({i.get('algorithm')})**: `{i.get('digest')}`",
    ]
    if i.get("backup_manifest_sha256"):
        lines.append(f"- **Manifest SHA-256**: `{i['backup_manifest_sha256']}`")
    if report.get("compliance_mappings"):
        lines += ["", "## Compliance mappings", ""]
        lines += [f"- {m}" for m in report["compliance_mappings"]]
    if bundle is not None:
        lines += [
            "",
            "## Signature",
            "",
            f"- **Algorithm**: {bundle['algorithm']}",
            f"- **Report SHA-256**: `{bundle['report_sha256']}`",
            f"- **Signature**: `{bundle['signature']}`",
        ]
    return "\n".join(lines) + "\n"


def from_sig_file(content: str) -> dict[str, Any]:
    fields = {"Algorithm": "", "Report-ID": "", "Report-SHA256": "", "Signature": ""}
    for line in content.splitlines():
        line = line.strip()
        for name in fields:
            if line.startswith(f"{name}: "):
                fields[name] = line[len(name) + 2 :]
    if not fields["Signature"]:
        raise ValueError("Invalid signature file: no Signature field found")
    return {
        "algorithm": fields["Algorithm"],
        "report_id": fields["Report-ID"],
        "report_sha256": fields["Report-SHA256"],
        "signature": fields["Signature"],
    }
