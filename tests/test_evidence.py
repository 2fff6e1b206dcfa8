"""Evidence report: digest determinism, report surface, signing stub."""

from __future__ import annotations

import hashlib

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


def test_report_and_signing_stub(spark):
    digest = evidence.integrity_digest(_check_df(spark)).collect()[0]["sha256_hex"]
    report = evidence.build_report("bk-1", {"overall": "passed"}, digest, ["SOC2-CC6.1"])
    assert report["integrity"]["digest"] == digest
    assert report["schema_version"] == evidence.SCHEMA_VERSION
    signed = evidence.sign_report(report, b"secret")
    assert signed["signature"]["algorithm"] == "hmac-sha256-stub"
    # deterministic signature
    assert evidence.sign_report(report, b"secret") == signed
    assert evidence.sign_report(report, b"other") != signed
