"""Structural + content checks for the dependency-free PDF writer
(evidence/pdf.rs parity: 3-page Cover / Validation / Integrity plan)."""

import re

from kafka_backup_spark.evidence import build_report
from kafka_backup_spark.evidence_pdf import render_report_pdf


def _report(n_checks: int = 3) -> dict:
    summary = {"overall": "passed"}
    for i in range(n_checks):
        summary[f"check_{i}"] = "passed"
    return build_report(
        "bk-pdf",
        summary,
        "ab" * 32,
        compliance_mappings=["SOC2 CC6.1", "ISO 27001 A.12.3"],
        backup_info={"total_topics": 3, "total_records": 120000},
        generated_at="2026-01-01T00:00:00Z",
        manifest_sha256="cd" * 32,
    )


def _pages(pdf: bytes) -> list[bytes]:
    return re.findall(rb"stream\n(.*?)\nendstream", pdf, re.S)


def test_pdf_structure_and_xref():
    pdf = render_report_pdf(_report())
    assert pdf.startswith(b"%PDF-1.4\n")
    assert pdf.rstrip().endswith(b"%%EOF")
    # startxref points at the xref table
    startxref = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    assert pdf[startxref:startxref + 4] == b"xref"
    # every xref offset points at its "N 0 obj" header
    entries = re.findall(rb"(\d{10}) 00000 n ", pdf)
    for num, off in enumerate(entries, start=1):
        at = int(off)
        assert pdf[at:].startswith(f"{num} 0 obj".encode()), num
    # /Count matches the number of page objects
    count = int(re.search(rb"/Count (\d+)", pdf).group(1))
    assert count == pdf.count(b"/Type /Page ") == 3


def test_pdf_content_sections():
    report = _report()
    bundle = {
        "algorithm": "ECDSA-P256-SHA256",
        "report_sha256": "12" * 32,
        "signature": "MEUCIQ" + "x" * 90,
    }
    pdf = render_report_pdf(report, bundle)
    pages = _pages(pdf)
    assert len(pages) == 3
    cover, results, tail = pages
    assert b"Kafka Backup Validation" in cover
    assert b"Overall Result: PASSED" in cover
    assert b"Report ID: evidence-bk-pdf" in cover
    assert b"Records: 120,000" in cover  # format_number thousands grouping
    assert b"check_0: passed" in results and b"check_2: passed" in results
    assert b"ab" * 32 in tail  # digest
    assert b"SOC2 CC6.1" in tail
    assert b"ECDSA-P256-SHA256" in tail
    # long signature wraps across multiple lines
    assert tail.count(b"MEUCIQ") == 1 and b"xxxx" in tail


def test_pdf_escapes_delimiters():
    report = _report(1)
    report["backup"]["source_cluster_id"] = "cluster (primary) \\ east"
    pdf = render_report_pdf(report)
    assert rb"cluster \(primary\) \\ east" in _pages(pdf)[0]


def test_pdf_paginates_many_checks():
    pdf = render_report_pdf(_report(n_checks=120))
    count = int(re.search(rb"/Count (\d+)", pdf).group(1))
    assert count > 3  # validation section flows onto extra pages
    pages = _pages(pdf)
    assert b"check_119: passed" in b"".join(pages)
    # stream lengths are accurate
    for m in re.finditer(rb"/Length (\d+) >>\nstream\n", pdf):
        ln = int(m.group(1))
        start = m.end()
        assert pdf[start + ln:start + ln + 11] == b"\nendstream\n"
