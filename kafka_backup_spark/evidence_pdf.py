"""PDF evidence-report renderer (evidence/pdf.rs:1-470).

The reference renders an auditor-ready multi-page PDF via printpdf; this
container has no PDF library, so the writer below emits the PDF 1.4 file
format directly — built-in Helvetica/Helvetica-Bold Type1 fonts (no
embedding), uncompressed text-only content streams, and a hand-built xref
table.  The document structure is pinned to pdf.rs:

- Page 1 Cover (pdf.rs:36-174): two-line title, overall-result badge,
  report metadata, backup summary block
- Page 2 Validation Results (pdf.rs:175-262): per-check result table
- Page 3 Integrity & Compliance (pdf.rs:264-453): digest block, compliance
  mappings, signature block, footer

Everything is driver-side string assembly over the already-aggregated
report dict — no Spark work happens here.
"""

from __future__ import annotations

from typing import Any

# pdf.rs:11-18 layout constants (mm), converted to PostScript points
_MM = 72.0 / 25.4
PAGE_W = 210.0 * _MM
PAGE_H = 297.0 * _MM
MARGIN = 25.0 * _MM
SIZE_TITLE = 24.0
SIZE_HEADING = 14.0
SIZE_BODY = 10.0
SIZE_SMALL = 8.0
LINE_HEIGHT = 5.0 * _MM


def _esc(text: str) -> str:
    """PDF string-literal escaping; Helvetica is WinAnsi so anything outside
    latin-1 degrades to '?' rather than corrupting the stream."""
    safe = text.encode("latin-1", "replace").decode("latin-1")
    return safe.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class _Page:
    """One page's text lines, flowed downward from the top margin."""

    def __init__(self) -> None:
        self.ops: list[str] = []
        self.y = PAGE_H - MARGIN

    def text(self, s: str, size: float = SIZE_BODY, bold: bool = False,
             dy: float | None = None, x: float = MARGIN) -> None:
        font = "F2" if bold else "F1"
        self.ops.append(
            f"BT /{font} {size:g} Tf {x:.2f} {self.y:.2f} Td ({_esc(s)}) Tj ET"
        )
        self.y -= LINE_HEIGHT if dy is None else dy

    def gap(self, dy: float = LINE_HEIGHT) -> None:
        self.y -= dy

    @property
    def full(self) -> bool:
        return self.y < MARGIN + LINE_HEIGHT

    def footer(self, s: str) -> None:
        self.ops.append(
            f"BT /F1 {SIZE_SMALL:g} Tf {MARGIN:.2f} {MARGIN / 2:.2f} "
            f"Td ({_esc(s)}) Tj ET"
        )

    def stream(self) -> bytes:
        return "\n".join(self.ops).encode("latin-1")


def _serialize(pages: list[_Page], title: str) -> bytes:
    """Assemble objects + xref.  Object layout: 1 Catalog, 2 Pages,
    3 /F1 Helvetica, 4 /F2 Helvetica-Bold, then (Page, Contents) pairs."""
    objs: list[bytes] = []
    first_page_obj = 5
    kids = " ".join(
        f"{first_page_obj + 2 * i} 0 R" for i in range(len(pages))
    )
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(pages)} >>".encode()
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>")
    for i, page in enumerate(pages):
        content_obj = first_page_obj + 2 * i + 1
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R "
                f"/MediaBox [0 0 {PAGE_W:.2f} {PAGE_H:.2f}] "
                f"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> "
                f"/Contents {content_obj} 0 R >>"
            ).encode()
        )
        stream = page.stream()
        objs.append(
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def render_report_pdf(
    report: dict[str, Any], bundle: dict[str, Any] | None = None
) -> bytes:
    """EvidenceReport dict (evidence.build_report) -> PDF bytes, same
    section content as render_report_markdown, same page plan as pdf.rs."""
    from kafka_backup_spark.functions.formatting import format_number

    b = report.get("backup", {})
    v = report.get("validation", {})
    i = report.get("integrity", {})

    # ── Page 1: Cover (pdf.rs:36-174) ─────────────────────────────────
    cover = _Page()
    cover.text("Kafka Backup Validation", SIZE_TITLE, bold=True, dy=10 * _MM)
    cover.text("Evidence Report", SIZE_TITLE, bold=True, dy=15 * _MM)
    overall = str(v.get("overall", "unknown")).upper()
    cover.text(f"Overall Result: {overall}", SIZE_HEADING, bold=True, dy=10 * _MM)
    cover.text(f"Report ID: {report.get('report_id')}")
    cover.text(f"Generated: {report.get('generated_at')}")
    tool = report.get("tool", {})
    cover.text(f"Tool: {tool.get('name')} ({tool.get('engine')})")
    if report.get("triggered_by") is not None:
        cover.text(f"Triggered by: {report['triggered_by']}")
    cover.gap(10 * _MM)
    cover.text("Backup Summary", SIZE_HEADING, bold=True, dy=8 * _MM)
    cover.text(f"Backup ID: {b.get('backup_id')}")
    if b.get("source_cluster_id") is not None:
        cover.text(f"Source cluster: {b['source_cluster_id']}")
    for field, label in (
        ("total_topics", "Topics"),
        ("total_partitions", "Partitions"),
        ("total_segments", "Segments"),
        ("total_records", "Records"),
    ):
        if b.get(field) is not None:
            cover.text(f"{label}: {format_number(b[field])}")
    cover.footer("Page 1 - Cover")

    # ── Page 2+: Validation Results (pdf.rs:175-262) ──────────────────
    pages = [cover]

    def _new_results_page(n: int) -> _Page:
        p = _Page()
        p.text("Validation Results", SIZE_HEADING, bold=True, dy=8 * _MM)
        p.footer(f"Page {n} - Validation Results")
        return p

    page = _new_results_page(2)
    page.text(f"Overall result: {overall}", bold=True, dy=8 * _MM)
    for key, val in v.items():
        if key == "overall":
            continue
        if page.full:
            pages.append(page)
            page = _new_results_page(len(pages) + 1)
        page.text(f"{key}: {val}")
    pages.append(page)

    # ── Last page: Integrity & Compliance (pdf.rs:264-453) ────────────
    tail = _Page()
    tail.text("Integrity & Compliance", SIZE_HEADING, bold=True, dy=8 * _MM)
    tail.text(f"Digest ({i.get('algorithm')}):", bold=True)
    tail.text(str(i.get("digest")), SIZE_SMALL)
    if i.get("backup_manifest_sha256"):
        tail.text("Manifest SHA-256:", bold=True)
        tail.text(str(i["backup_manifest_sha256"]), SIZE_SMALL)
    mappings = report.get("compliance_mappings") or []
    if mappings:
        tail.gap()
        tail.text("Compliance mappings", SIZE_HEADING, bold=True, dy=8 * _MM)
        for m in mappings:
            tail.text(f"- {m}")
    if bundle is not None:
        tail.gap()
        tail.text("Signature", SIZE_HEADING, bold=True, dy=8 * _MM)
        tail.text(f"Algorithm: {bundle['algorithm']}")
        tail.text("Report SHA-256:", bold=True)
        tail.text(str(bundle["report_sha256"]), SIZE_SMALL)
        tail.text("Signature:", bold=True)
        sig = str(bundle["signature"])
        for start in range(0, len(sig), 88):
            tail.text(sig[start:start + 88], SIZE_SMALL, dy=4 * _MM)
    tail.footer(f"Page {len(pages) + 1} - Integrity & Compliance")
    pages.append(tail)

    return _serialize(pages, "Kafka Backup Validation Evidence Report")


def write_report_pdf(
    path: str, report: dict[str, Any], bundle: dict[str, Any] | None = None
) -> str:
    data = render_report_pdf(report, bundle)
    with open(path, "wb") as fh:
        fh.write(data)
    return path
