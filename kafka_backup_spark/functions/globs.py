"""Glob (`*`, `?`) and `~`-prefixed regex topic patterns → Java regex.

Reference semantics (crates/kafka-backup-core/src/backup/engine.rs:1352-1385,
restore/engine.rs:1569-1584): `*` matches any run, `?` one char, everything
else literal; restore additionally accepts `~regex`; an invalid regex matches
nothing. Translation runs on the driver; matching itself is a native
``rlike`` so Catalyst keeps it inside codegen and can push it to the source.
"""

from __future__ import annotations

import re


def glob_to_regex(pattern: str) -> str:
    """Translate one glob (or ``~regex``) pattern to an anchored Java regex."""
    if pattern.startswith("~"):
        body = pattern[1:]
        try:
            re.compile(body)
        except re.error:
            # invalid regex → matches nothing (reference restore/engine.rs:1578-1583)
            return r"(?!)"
        return body
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def globs_to_regex(patterns: list[str]) -> str:
    """OR-combine a pattern list into one regex; empty list matches nothing."""
    if not patterns:
        return r"(?!)"
    return "|".join(f"(?:{glob_to_regex(p)})" for p in patterns)
