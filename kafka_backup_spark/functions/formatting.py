"""F9: human-readable display formatting (driver-side).

Reference parity: commands/describe.rs:184-202 (format_bytes, 2dp up to TB),
commands/status_watch.rs:332-344 (format_number comma-grouping), duration
rendering in the status/progress surfaces.  These are presentation helpers —
they format already-aggregated driver-side values, never per-record data.
"""

from __future__ import annotations

_KB = 1024
_MB = _KB * 1024
_GB = _MB * 1024
_TB = _GB * 1024


def format_bytes(n: int, precision: int = 2) -> str:
    """'{:.2f} TB/GB/MB/KB' | '{n} B' — describe.rs:184-202 thresholds."""
    n = int(n)
    for size, unit in ((_TB, "TB"), (_GB, "GB"), (_MB, "MB"), (_KB, "KB")):
        if n >= size:
            return f"{n / size:.{precision}f} {unit}"
    return f"{n} B"


def format_number(n: int) -> str:
    """Comma-grouped integer (status_watch.rs:333-344)."""
    return f"{int(n):,}"


def format_duration(seconds: float) -> str:
    """Compact h/m/s rendering used by the status surfaces."""
    seconds = int(seconds)
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    if h:
        return f"{h}h {m}m {s}s"
    if m:
        return f"{m}m {s}s"
    return f"{s}s"


def format_rate(bytes_per_sec: float) -> str:
    return f"{format_bytes(int(bytes_per_sec), precision=1)}/s"
