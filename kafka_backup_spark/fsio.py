"""Small-file I/O through the Hadoop FileSystem layer (X2 surface).

The engine's metadata artifacts — the backup manifest, offset-rollback
snapshots, consumer-group snapshots — are single JSON documents living NEXT
TO the segment store.  When the store is an object-store URI
(``s3a://…``, ``abfss://…``, ``gs://…`` — see storage_path.py), these
documents must land on the SAME filesystem; plain ``open()`` would silently
write a local file named like the URI.  This module routes text I/O through
the active session's Hadoop FileSystem for remote paths and plain Python
I/O for local ones — one code path per artifact, any backend.

Atomicity note: local writes are tmp-file + ``os.replace`` (POSIX-atomic).
Remote writes create the object directly — object stores publish a PUT
atomically (readers see the old or the new object, never a torn one), which
is the same guarantee the reference's object-store backends provide.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def is_remote(path: str) -> bool:
    return "://" in path and not path.startswith("file://")


def _local(path: str) -> str:
    """Strip a file:// prefix so the plain-I/O branch can open it."""
    return path[len("file://"):] if path.startswith("file://") else path


def _jvm_fs(path: str):
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"remote path {path!r} needs an active SparkSession for Hadoop "
            "filesystem access — create the session before touching the store"
        )
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    # connector credentials/endpoints resolved from the CLI --store URL
    # (storage_path.resolve_cli_store) must reach metadata I/O too, not
    # just the segment reads/writes that went through store_from_path
    from kafka_backup_spark.storage_path import apply_pending_conf

    apply_pending_conf(conf, path)
    return jpath.getFileSystem(conf), jpath, jvm


def exists(path: str) -> bool:
    if not is_remote(path):
        return os.path.exists(_local(path))
    fs, jpath, _ = _jvm_fs(path)
    return bool(fs.exists(jpath))


def read_text(path: str) -> str:
    if not is_remote(path):
        with open(_local(path)) as fh:
            return fh.read()
    fs, jpath, jvm = _jvm_fs(path)
    stream = fs.open(jpath)
    try:
        # one JVM-side drain — no per-byte py4j round-trips
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def write_text(path: str, text: str) -> None:
    """Write ``text`` to ``path`` (parents created as needed).  Local:
    tmp + atomic replace.  Remote: direct create (atomic PUT semantics)."""
    if not is_remote(path):
        path = _local(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)
        return
    fs, jpath, _ = _jvm_fs(path)
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def list_dir(path: str) -> list[str]:
    """Child entry NAMES of a directory (empty when missing).  Local:
    os.listdir; remote: one Hadoop LIST.  Used only on non-hot paths
    (snapshot pruning) — the snapshot READ path resolves a pointer file
    instead of listing."""
    if not is_remote(path):
        try:
            return os.listdir(_local(path))
        except FileNotFoundError:
            return []
    fs, jpath, _ = _jvm_fs(path)
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def dataset_bytes(path: str) -> int:
    """Total DATA bytes of a file or directory tree.  Local: recursive stat
    walk (a bare getsize on a directory would return the ~4 KB inode),
    skipping writer metadata — ``_SUCCESS`` markers, ``.crc`` sidecars,
    dot-tmp files — so bucket-count sizing matches the inline ``*.parquet``
    accounting it replaced (ADVICE r13 #4).  Remote: a recursive
    ``listFiles`` walk applying the SAME hidden-leaf filter, so the same
    dataset lands on the same bucket count whether sf_dir is a local path
    or an object-store URI (ADVICE r14 #4); if the walk fails mid-iteration
    the one-call getContentSummary upper bound is the fallback (markers are
    byte-trivial).  Raises OSError when the path does not exist on either
    branch."""
    if not is_remote(path):
        p = _local(path)
        if os.path.isdir(p):
            total = 0
            for root, _dirs, files in os.walk(p):
                for f in files:
                    if f.startswith((".", "_")):
                        continue
                    total += os.path.getsize(os.path.join(root, f))
            return total
        return os.path.getsize(p)  # single file; raises OSError if unstatable
    fs, jpath, _ = _jvm_fs(path)
    if not fs.exists(jpath):
        raise OSError(f"path does not exist: {path}")
    if not fs.getFileStatus(jpath).isDirectory():
        return int(fs.getFileStatus(jpath).getLen())
    try:
        total = 0
        it = fs.listFiles(jpath, True)  # recursive, paginated server-side
        while it.hasNext():
            st = it.next()
            if not st.getPath().getName().startswith((".", "_")):
                total += int(st.getLen())
        return total
    except Exception:
        # transient listing failure: serve the documented upper bound
        return int(fs.getContentSummary(jpath).getLength())


def delete_path(path: str) -> None:
    """Recursive best-effort delete of a file OR directory (no-op when
    missing)."""
    if not is_remote(path):
        import shutil

        p = _local(path)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        else:
            try:
                os.remove(p)
            except OSError:
                pass
        return
    fs, jpath, _ = _jvm_fs(path)
    try:
        fs.delete(jpath, True)
    except Exception:
        pass  # best-effort, mirrors the local ignore_errors


def require_local(path: str, store_kind: str) -> str:
    """Guard for stores whose semantics need a real filesystem (O_EXCL
    writer locks, directory listings used as commit markers).  Remote URIs
    fail LOUDLY here instead of silently writing a local directory named
    like the URI."""
    if is_remote(path):
        raise NotImplementedError(
            f"{store_kind} is file-backed (writer-lock/listing semantics have "
            f"no object-store equivalent here); got remote path {path!r}. "
            "Use a local or file:// path, or mount the bucket."
        )
    # strip a file:// prefix: these stores use plain open()/os.listdir
    return _local(path)
