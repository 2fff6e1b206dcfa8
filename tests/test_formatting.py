"""F9 display formatting parity (describe.rs:184-202, status_watch.rs:333-344)."""

from __future__ import annotations

from kafka_backup_spark.functions.formatting import (
    format_bytes,
    format_duration,
    format_number,
    format_rate,
)


def test_format_bytes_thresholds():
    assert format_bytes(512) == "512 B"
    assert format_bytes(1024) == "1.00 KB"
    assert format_bytes(1536) == "1.50 KB"
    assert format_bytes(1024**2 * 3) == "3.00 MB"
    assert format_bytes(int(1024**3 * 2.5)) == "2.50 GB"
    assert format_bytes(1024**4 * 7) == "7.00 TB"
    assert format_bytes(10 * 1024**2, precision=1) == "10.0 MB"


def test_format_number_commas():
    assert format_number(0) == "0"
    assert format_number(999) == "999"
    assert format_number(1000) == "1,000"
    assert format_number(1234567890) == "1,234,567,890"


def test_format_duration():
    assert format_duration(42) == "42s"
    assert format_duration(125) == "2m 5s"
    assert format_duration(3700) == "1h 1m 40s"


def test_format_rate():
    assert format_rate(100 * 1024**2) == "100.0 MB/s"
