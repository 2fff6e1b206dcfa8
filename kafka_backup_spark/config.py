"""Config surface: the reference's "query language" is a YAML document +
CLI flags (config.rs:7-41; validation config.rs:827-989). This module loads
the same document shape into the engine dataclasses and enforces the same
validation rules, so a user of the reference can bring their config across.

Validation rules carried over (with reference cites):
- mode ∈ {backup, restore} (config.rs:830-840)
- ``stop_at_current_offsets`` (snapshot) is incompatible with continuous
  mode (config.rs:868-876)
- zstd level ∈ [1, 22] (config.rs:878-884)
- offset range: start < end when both set (P6 semantics)
- restore window: start ≤ end when both set (P4/P5)
- partition mapping must be 1:1 (no two sources to one target)
- repartition strategy ∈ {murmur2, automatic} (config.rs:580-589)
"""

from __future__ import annotations

from typing import Any

from kafka_backup_spark.engine import BackupConfig, RestoreConfig

VALID_MODES = ("backup", "restore")
VALID_STRATEGIES = ("murmur2", "automatic")


class ConfigError(ValueError):
    pass


def expand_env_vars(text: str) -> str:
    """Expand ``${VAR}`` patterns with environment values before YAML parse
    (commands/config.rs:1-35): unset variables become the empty string (with
    a warning), and a bare ``$`` without ``{`` passes through unchanged."""
    import os
    import re
    import warnings

    def sub(m: "re.Match[str]") -> str:
        name = m.group(1)
        val = os.environ.get(name)
        if val is None:
            warnings.warn(
                f"Environment variable '{name}' is not set, using empty string",
                stacklevel=3,
            )
            return ""
        return val

    return re.sub(r"\$\{([^}]*)\}", sub, text)


def load_config(path_or_doc: str | dict[str, Any]) -> dict[str, Any]:
    """Load + validate a config document (YAML path, YAML string, or dict).
    ``${VAR}`` env references in YAML text are expanded before parsing."""
    if isinstance(path_or_doc, dict):
        doc = path_or_doc
    else:
        import yaml

        if "\n" in path_or_doc or ":" in path_or_doc.splitlines()[0]:
            doc = yaml.safe_load(expand_env_vars(path_or_doc))
        else:
            with open(path_or_doc) as fh:
                doc = yaml.safe_load(expand_env_vars(fh.read()))
    if not isinstance(doc, dict):
        raise ConfigError("config must be a mapping")
    validate(doc)
    return doc


def validate(doc: dict[str, Any]) -> None:
    mode = doc.get("mode")
    if mode not in VALID_MODES:
        raise ConfigError(f"mode must be one of {VALID_MODES}, got {mode!r}")
    if not doc.get("backup_id"):
        raise ConfigError("backup_id is required")

    b = doc.get("backup", {}) or {}
    if b.get("continuous") and b.get("stop_at_current_offsets"):
        # snapshot bound + continuous loop are contradictory (config.rs:868-876)
        raise ConfigError("stop_at_current_offsets is incompatible with continuous mode")
    level = (doc.get("storage", {}) or {}).get("zstd_level")
    if level is not None and not (1 <= int(level) <= 22):
        raise ConfigError(f"zstd level must be in [1, 22], got {level}")
    so, eo = b.get("start_offset"), b.get("end_offset")
    if so is not None and eo is not None and so >= eo:
        raise ConfigError(f"offset range [{so}, {eo}) is empty")

    r = doc.get("restore", {}) or {}
    ws, we = r.get("window_start_ms"), r.get("window_end_ms")
    if ws is not None and we is not None and ws > we:
        raise ConfigError(f"restore window start {ws} > end {we}")
    pm = r.get("partition_mapping") or {}
    targets = list(pm.values())
    if len(set(targets)) != len(targets):
        raise ConfigError("partition_mapping must be 1:1 (duplicate targets)")
    strat = r.get("repartition_strategy", "murmur2")
    if strat not in VALID_STRATEGIES:
        raise ConfigError(f"repartition_strategy must be one of {VALID_STRATEGIES}")
    if r.get("repartition_to") is not None and int(r["repartition_to"]) < 1:
        raise ConfigError("repartition_to must be >= 1")
    if r.get("repartition_to") is not None and pm:
        raise ConfigError(
            "partition_mapping and repartition_to are mutually exclusive "
            "(hash repartitioning would override the explicit mapping)"
        )

    # SASL wiring runs immediately after parse, like the reference CLI's
    # populate_sasl_plugin (commands/sasl_plugin.rs:23-28): a bad mechanism
    # or missing Kerberos state errors HERE, not mid-connect
    from kafka_backup_spark.security import SecurityError, populate_sasl_options

    try:
        populate_sasl_options((doc.get("source", {}) or {}).get("security"))
    except SecurityError as e:
        raise ConfigError(str(e)) from e


def backup_config(doc: dict[str, Any]) -> BackupConfig:
    b = doc.get("backup", {}) or {}
    st = doc.get("storage", {}) or {}
    cfg = BackupConfig(
        include_topics=list(b.get("include_topics", [])),
        exclude_topics=list(b.get("exclude_topics", [])),
        include_internal=bool(b.get("include_internal_topics", False)),
        start_offset=b.get("start_offset"),
        end_offset=b.get("end_offset"),
        inject_headers=bool(b.get("inject_headers", True)),
        source_cluster=(doc.get("source", {}) or {}).get("cluster_id"),
        segment_span=int(b.get("segment_span", 1000)),
        rate_limit_records_per_sec=b.get("rate_limit_records_per_sec"),
    )
    if st.get("segment_max_bytes") is not None:
        cfg.segment_max_bytes = int(st["segment_max_bytes"])
    if st.get("compression") is not None:
        cfg.compression = str(st["compression"])
    if st.get("zstd_level") is not None:
        cfg.zstd_level = int(st["zstd_level"])
    return cfg


def restore_config(doc: dict[str, Any]) -> RestoreConfig:
    r = doc.get("restore", {}) or {}
    return RestoreConfig(
        include_topics=list(r.get("include_topics", [])),
        exclude_topics=list(r.get("exclude_topics", [])),
        window_start_ms=r.get("window_start_ms"),
        window_end_ms=r.get("window_end_ms"),
        partitions=r.get("partitions"),
        topic_mapping=dict(r.get("topic_mapping", {})),
        partition_mapping={int(k): int(v) for k, v in (r.get("partition_mapping") or {}).items()},
        repartition_to=r.get("repartition_to"),
        repartition_strategy=r.get("repartition_strategy", "murmur2"),
        inject_headers=bool(r.get("inject_headers", False)),
    )


def effective_config(doc: dict[str, Any]) -> dict[str, Any]:
    """The defaults-resolved view of a validated document: every engine
    knob at its final value (dataclass defaults filled in), the shape
    ``config show`` prints so users see exactly what a run would use."""
    import dataclasses

    from kafka_backup_spark.security import populate_sasl_options

    return {
        "mode": doc.get("mode"),
        "backup_id": doc.get("backup_id"),
        "source": dict(doc.get("source", {}) or {}),
        "storage": dict(doc.get("storage", {}) or {}),
        "backup": dataclasses.asdict(backup_config(doc)),
        "restore": dataclasses.asdict(restore_config(doc)),
        # the compiled kafka.* connector options the run would pass to
        # spark.read.format("kafka"), with secret VALUES redacted: `config
        # show` output lands in terminal scrollback, CI logs and pasted
        # issue reports — the resolved KEYS are what operators need to see,
        # never the password or the mTLS private key
        "kafka_options": _redact_options(
            populate_sasl_options((doc.get("source", {}) or {}).get("security"))
        ),
    }


_SECRET_OPTION_FRAGMENTS = (
    "password", "jaas.config", "keystore.key", "truststore.certificates",
)


def _redact_options(opts: dict[str, str]) -> dict[str, str]:
    out = {}
    for k, v in opts.items():
        lk = k.lower()
        if any(f in lk for f in _SECRET_OPTION_FRAGMENTS):
            out[k] = "****"
        else:
            out[k] = v
    return out
