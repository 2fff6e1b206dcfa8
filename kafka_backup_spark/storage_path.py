"""Storage-path resolution: CLI path/URL → Hadoop filesystem URI + conf.

Reference: crates/kafka-backup-cli/src/commands/storage_path.rs:1-15
(``backend_from_path``: bare paths become a FilesystemBackend, ``://`` URLs
go through ``StorageBackendConfig::from_url``) and
crates/kafka-backup-core/src/storage/config.rs:119-202 (the URL grammar:
``s3://bucket/prefix?region=&endpoint=&path_style=``, ``azure://account/``
``container``, ``gcs://bucket``, ``file:///path``, ``memory://``).

The Spark-first translation: there is no backend object to construct —
every Spark read/write already goes through the Hadoop FileSystem layer, so
"resolving a storage path" means (a) rewriting the reference's scheme
grammar onto the Hadoop connector schemes (s3 → s3a, azure → abfss,
gcs → gs) and (b) translating the query-string/env credentials into the
connector's ``fs.*`` Hadoop conf keys.  The returned URI drops straight
into ``SegmentStore(root)`` / ``manifest_store`` — one code path for local
disk, S3, Azure and GCS, which is exactly the X2 StorageBackend surface.
"""

from __future__ import annotations

import os
import tempfile
from urllib.parse import parse_qs, urlparse


class StoragePathError(ValueError):
    pass


def resolve_storage_path(path: str) -> tuple[str, dict[str, str]]:
    """path/URL → ``(hadoop_uri, hadoop_conf)``.

    Bare paths (no ``://``) resolve as local filesystem directories —
    storage_path.rs:9-14's FilesystemBackend arm.
    """
    if "://" not in path:
        return os.path.abspath(path), {}
    u = urlparse(path)
    q = {k: v[-1] for k, v in parse_qs(u.query).items()}
    scheme = u.scheme.lower()
    if scheme in ("s3", "s3a"):
        bucket = u.netloc
        if not bucket:
            raise StoragePathError(f"S3 URL {path!r} has no bucket")
        prefix = u.path.strip("/")
        conf: dict[str, str] = {}
        # BUCKET-SCOPED keys (fs.s3a.bucket.<bucket>.<opt> — ADVICE r6): the
        # s3a connector rewrites these onto the base fs.s3a.* namespace when
        # it instantiates the FileSystem for THIS bucket, and Hadoop's FS
        # cache keys instances by (scheme, authority) = the bucket — so two
        # s3a stores with different endpoints/credentials in one process
        # genuinely isolate, which global fs.s3a.* keys cannot do (a cached
        # FS built under store A's creds keeps serving after store B's conf
        # lands).  Azure keys are already per-account-host; GCS has no
        # per-bucket spelling — see the gs arm's single-keyfile note.
        # DOTTED bucket names (ADVICE r7): Hadoop parses the per-bucket token
        # up to the next '.', so fs.s3a.bucket.my.backups.prod.endpoint would
        # scope to bucket "my" and silently misapply — fall back to the
        # global fs.s3a.* namespace for such buckets (correct, but process-
        # global like the GCS keyfile: one dotted-bucket store per process).
        dotted = "." in bucket

        def _bk(opt: str) -> str:
            return f"fs.s3a.{opt}" if dotted else f"fs.s3a.bucket.{bucket}.{opt}"

        if "region" in q:
            conf[_bk("endpoint.region")] = q["region"]
        if "endpoint" in q:
            conf[_bk("endpoint")] = q["endpoint"]
        if q.get("path_style") == "true":
            conf[_bk("path.style.access")] = "true"
        # env-credential fallback mirrors config.rs:150-151; the s3a default
        # chain reads the same variables, set explicitly only if present so
        # IAM-role/instance-profile chains still work when unset
        if os.environ.get("AWS_ACCESS_KEY_ID"):
            conf[_bk("access.key")] = os.environ["AWS_ACCESS_KEY_ID"]
        if os.environ.get("AWS_SECRET_ACCESS_KEY"):
            conf[_bk("secret.key")] = os.environ["AWS_SECRET_ACCESS_KEY"]
        uri = f"s3a://{bucket}" + (f"/{prefix}" if prefix else "")
        return uri, conf
    if scheme == "abfss" and "@" in u.netloc:
        # native Hadoop spelling abfss://container@account.dfs.core.windows.net/
        # — already a connector URI; translating it through the azure://
        # convenience grammar would mangle the authority. Pass through
        # verbatim, attaching env credentials keyed by the URI's REAL host:
        # sovereign/government clouds use different suffixes
        # (.dfs.core.chinacloudapi.cn, .dfs.core.usgovcloudapi.net), and a
        # hardcoded .dfs.core.windows.net key would silently never match.
        host = u.netloc.split("@", 1)[1]
        conf = {}
        key = os.environ.get("AZURE_STORAGE_KEY") or os.environ.get(
            "AZURE_STORAGE_ACCOUNT_KEY"
        )
        if key:
            conf[f"fs.azure.account.key.{host}"] = key
        return path, conf
    if scheme in ("azure", "az", "abfss"):
        account = u.netloc.split(".")[0]
        container = u.path.strip("/").split("/")[0]
        if not account or not container:
            raise StoragePathError(
                f"Azure URL {path!r} needs azure://<account>/<container>"
            )
        rest = "/".join(u.path.strip("/").split("/")[1:])
        conf = {}
        key = os.environ.get("AZURE_STORAGE_KEY") or os.environ.get(
            "AZURE_STORAGE_ACCOUNT_KEY"
        )
        if key:
            conf[f"fs.azure.account.key.{account}.dfs.core.windows.net"] = key
        uri = f"abfss://{container}@{account}.dfs.core.windows.net"
        return uri + (f"/{rest}" if rest else ""), conf
    if scheme in ("gcs", "gs"):
        bucket = u.netloc
        if not bucket:
            raise StoragePathError(f"GCS URL {path!r} has no bucket")
        conf = {}
        # the GCS connector has no per-bucket conf namespace: this keyfile is
        # process-global, so two gs:// stores needing DIFFERENT service
        # accounts cannot coexist in one process (single-store-per-process
        # limitation, documented; s3a/abfss stores are scoped and unaffected)
        if os.environ.get("GOOGLE_APPLICATION_CREDENTIALS"):
            conf["fs.gs.auth.service.account.json.keyfile"] = os.environ[
                "GOOGLE_APPLICATION_CREDENTIALS"
            ]
        prefix = u.path.strip("/")
        return f"gs://{bucket}" + (f"/{prefix}" if prefix else ""), conf
    if scheme == "file":
        # keep the scheme: a bare path would re-resolve against
        # fs.defaultFS on a cluster (hdfs://...), landing segments on a
        # different filesystem than the file:-pinned metadata writes
        return f"file://{u.path or '/'}", {}
    if scheme == "memory":
        # the reference's in-memory test backend (config.rs:196); Hadoop has
        # no RAM filesystem, so the closest single-node twin is a
        # process-local temp dir — contents die with the process, like the
        # reference's Memory backend.  One dir PER URL per process: the
        # reference resolves memory://x to the same shared store every time,
        # so a backup through memory://x must be visible to a later
        # validate/status resolving memory://x in the same process.
        key = path
        if key not in _MEMORY_STORES:
            _MEMORY_STORES[key] = tempfile.mkdtemp(prefix="kbs-memory-")
        return _MEMORY_STORES[key], {}
    raise StoragePathError(f"Unknown storage scheme: {scheme}")


_MEMORY_STORES: dict[str, str] = {}

# conf from CLI-level resolution, applied lazily once a session exists —
# metadata I/O (fsio._jvm_fs) and store_from_path both merge it, so the
# manifest/snapshot documents reach the same authenticated filesystem as
# the segments even in commands that never construct a SegmentStore.
# Scoped PER RESOLVED STORE ROOT: a library/embedded process resolving two
# stores with different endpoints/credentials must not cross-contaminate —
# apply_pending_conf(hconf, path) merges only the entries whose root
# prefixes the path being accessed (all of them when no path is given,
# which is the one-store-per-process CLI behavior).
_PENDING_CONF: dict[str, dict[str, str]] = {}


def resolve_cli_store(path: str) -> str:
    """Resolve a CLI --store path/URL ONCE at dispatch: every consumer
    (SegmentStore, ManifestStore, snapshot stores, corpus store) then sees
    the SAME resolved URI — resolving only at SegmentStore construction
    left metadata writes on the raw scheme (s3:// has no Hadoop
    filesystem; memory:// would mint a different temp dir per consumer)."""
    uri, conf = resolve_storage_path(path)
    if conf:
        _PENDING_CONF[uri] = dict(conf)
    return uri


def apply_pending_conf(hconf, path: str | None = None) -> None:
    for root, conf in _PENDING_CONF.items():
        # path-BOUNDARY prefix match: 's3a://data' must not claim
        # 's3a://data-prod/...' — only the root itself or children under it
        if path is None or path == root or path.startswith(root.rstrip("/") + "/"):
            for k, v in conf.items():
                hconf.set(k, v)


def store_from_path(spark, path: str):
    """``backend_from_path`` twin (storage_path.rs:8-15): resolve the
    path/URL, apply connector conf to the live session's Hadoop
    configuration, and return a :class:`SegmentStore` rooted there."""
    from kafka_backup_spark.sources.segments import SegmentStore

    uri, conf = resolve_storage_path(path)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)
    return SegmentStore(uri)
