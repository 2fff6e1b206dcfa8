"""Evidence report: digest determinism, report surface, ECDSA signing."""

from __future__ import annotations

import hashlib

import pytest

from kafka_backup_spark import evidence


def _check_df(spark):
    return spark.createDataFrame(
        [("b", 1, 10, 10), ("a", 0, 5, 5), ("a", 1, 7, 6)],
        "topic string, partition int, expected_count long, restored_count long",
    )


def test_integrity_digest_matches_python(spark):
    got = evidence.integrity_digest(_check_df(spark)).collect()[0]["sha256_hex"]
    lines = sorted(["b:1:10:10", "a:0:5:5", "a:1:7:6"])
    exp = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    assert got == exp


@pytest.fixture()
def report(spark):
    digest = evidence.integrity_digest(_check_df(spark)).collect()[0]["sha256_hex"]
    return evidence.build_report(
        "bk-1",
        {"overall": "passed"},
        digest,
        ["SOC2-CC6.1"],
        backup_info={"total_records": 22, "total_partitions": 3},
        generated_at="2024-01-01T00:00:00Z",
        triggered_by="test",
        manifest_sha256="ab" * 32,
    )


def test_report_surface(spark, report):
    assert report["schema_version"] == evidence.SCHEMA_VERSION
    assert report["report_id"] == "evidence-bk-1"
    assert report["backup"]["total_records"] == 22
    assert report["integrity"]["backup_manifest_sha256"] == "ab" * 32
    assert report["triggered_by"] == "test"


def test_ecdsa_sign_verify_roundtrip(report):
    priv, pub = evidence.generate_signing_key()
    bundle = evidence.sign_report(report, priv)
    assert bundle["algorithm"] == evidence.SIG_ALGORITHM
    assert bundle["report_id"] == "evidence-bk-1"
    assert evidence.verify_report(report, bundle, pub)


def test_tampered_report_fails_verification(report):
    priv, pub = evidence.generate_signing_key()
    bundle = evidence.sign_report(report, priv)
    tampered = {**report, "validation": {"overall": "passed", "sneaky": True}}
    assert not evidence.verify_report(tampered, bundle, pub)


def test_wrong_key_fails_verification(report):
    priv, _ = evidence.generate_signing_key()
    _, other_pub = evidence.generate_signing_key()
    bundle = evidence.sign_report(report, priv)
    assert not evidence.verify_report(report, bundle, other_pub)


def test_sig_file_roundtrip(report):
    priv, pub = evidence.generate_signing_key()
    bundle = evidence.sign_report(report, priv)
    text = evidence.to_sig_file(bundle)
    assert text.startswith("-----BEGIN KAFKA BACKUP EVIDENCE SIGNATURE-----")
    parsed = evidence.from_sig_file(text)
    assert parsed == bundle
    assert evidence.verify_report(report, parsed, pub)


def test_sig_file_without_signature_rejected():
    with pytest.raises(ValueError, match="no Signature"):
        evidence.from_sig_file("-----BEGIN KAFKA BACKUP EVIDENCE SIGNATURE-----\n")


def test_render_report_markdown(report):
    priv, _ = evidence.generate_signing_key()
    bundle = evidence.sign_report(report, priv)
    doc = evidence.render_report_markdown(report, bundle)
    assert "# Kafka Backup Evidence Report" in doc
    assert "evidence-bk-1" in doc
    assert "**Overall result: PASSED**" in doc
    assert "**Records**: 22" in doc
    assert report["integrity"]["digest"] in doc
    assert bundle["signature"] in doc
    # renders without a signature block too
    assert "## Signature" not in evidence.render_report_markdown(report)
