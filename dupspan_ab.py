#!/usr/bin/env python
"""dup_span_extents / dup_span_fraction decomposition + shuffle-free
word-position A/B (r16, VERDICT r15 #3: dup_span_extents at 0.30–0.34 s
was never decomposed).

The shipped ``_span_windows`` recovers each word's char position with a
running-length-sum WINDOW over the posexploded word rows — an Exchange +
Sort that ships (doc_id, text, j, w) per WORD row, i.e. the full document
text duplicated once per word through the shuffle (guide §2.3's "project
before the exchange" violation, visible as Exchange (13) carrying text in
plans/r15/dup_span_extents_after.txt).  Both span queries then PERSIST the
deduped (h, doc_id[, positions]) frame, so the bench's warm min-of-5 never
re-pays that exchange — but every COLD execution (one-shot runs, the
100 TB posture) does.

V_ssi replaces the window with arithmetic on ``substring_index``:

    i(j=0) = 1
    i(j≥1) = length(substring_index(text, ' ', j)) + 2

which is exactly Σ_{l<j}(len(w_l)+1) + 1 — the prefix before the j-th
space contains the first j words and j−1 interior spaces (consecutive
spaces yield empty split words on BOTH formulations, so the identity
holds for any input).  The anchor filter now runs BEFORE the position is
computed, and the whole window-generation path is one map-side stage: no
exchange, no sort, no text duplication.  The O(i) byte walk inside
substring_index is paid only for the ~1/4 anchor-surviving words —
the same walk the downstream substring(text, i, 40) hash already pays.

Measured here: parity (sorted-row hash, both queries), COLD A/B (frames
reconstructed per rep — each timed noop re-materializes the persist), and
WARM A/B (bench protocol: construct once, warm, min-of-N — expected ≈0
delta because the persist absorbs the change; recorded so the claim is
explicit).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from kafka_backup_spark.functions.hashing import fast_hash64
from kafka_backup_spark.queries import pipeline as P
from kafka_backup_spark.session import autosize_shuffle_partitions, get_spark


def rows_hash(df) -> str:
    rows = sorted(tuple(r) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _span_windows_ssi(c):
    """Shuffle-free twin of pipeline._span_windows (see module docstring)."""
    words = c.select(
        "doc_id", "text", F.posexplode(F.split(F.col("text"), " ")).alias("j", "w")
    )
    first_code = F.when(
        F.length("w") > 0, F.ascii(F.expr("substring(w, 1, 1)"))
    ).otherwise(F.lit(0))
    anchor = F.pmod(
        F.length("w") * P.SPAN_ANCHOR_MULT + first_code, F.lit(P.SPAN_ANCHOR_MOD)
    ) == 0
    i = F.when(F.col("j") == 0, F.lit(1).cast("long")).otherwise(
        (F.length(F.expr("substring_index(text, ' ', j)")) + 2).cast("long")
    )
    return (
        words.filter((F.col("j") == 0) | anchor)
        .select("doc_id", "text", i.alias("i"))
        .filter(F.col("i") <= F.length("text") - (P.SPAN_LEN - 1))
        .select(
            "doc_id",
            "i",
            fast_hash64(F.expr(f"substring(text, i, {P.SPAN_LEN})")).alias("h"),
        )
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "8"))
    spark = get_spark("dupspan_ab")
    sc = spark.sparkContext
    autosize_shuffle_partitions(spark, sf_dir)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    orig = P._span_windows

    def build(variant, frame_fn):
        P._span_windows = variant
        try:
            return frame_fn(P._corpus(spark, sf_dir))
        finally:
            P._span_windows = orig

    # parity, both queries
    for fname, frame_fn in (
        ("fraction", P.dup_span_fraction_frame),
        ("extents", P.dup_span_extents_frame),
    ):
        h_win = rows_hash(build(orig, frame_fn))
        h_ssi = rows_hash(build(_span_windows_ssi, frame_fn))
        print(f"parity {fname}:", json.dumps({"V_win": h_win, "V_ssi": h_ssi}))
        assert h_win == h_ssi, f"parity MISMATCH on {fname}"

    # COLD A/B: reconstruct per rep; the timed noop re-materializes the persist
    cold = {"frac_win": [], "frac_ssi": [], "ext_win": [], "ext_ssi": []}
    for rep in range(reps):
        for key, var, fn in (
            ("frac_win", orig, P.dup_span_fraction_frame),
            ("frac_ssi", _span_windows_ssi, P.dup_span_fraction_frame),
            ("ext_win", orig, P.dup_span_extents_frame),
            ("ext_ssi", _span_windows_ssi, P.dup_span_extents_frame),
        ):
            df = build(var, fn)
            sc.setJobDescription(f"dupspan:cold:{key}#r{rep}")
            t0 = time.monotonic()
            noop(df)
            cold[key].append(time.monotonic() - t0)
    sc.setJobDescription(None)
    print("cold:", json.dumps(
        {k: {"min": round(min(v), 3), "all": [round(x, 3) for x in v]} for k, v in cold.items()
    }, indent=2))

    # WARM A/B (bench protocol): construct once, warm, min-of-N.  Frames are
    # constructed IMMEDIATELY before their timing loop — the two variants of
    # one query share a persist tag, so building one unpersists the other,
    # and a frame built earlier would time cold.
    warm = {}
    for key, var, fn in (
        ("frac_win", orig, P.dup_span_fraction_frame),
        ("frac_ssi", _span_windows_ssi, P.dup_span_fraction_frame),
        ("ext_win", orig, P.dup_span_extents_frame),
        ("ext_ssi", _span_windows_ssi, P.dup_span_extents_frame),
    ):
        df = build(var, fn)
        noop(df)  # materialize this variant's persist
        ts = []
        for rep in range(reps):
            sc.setJobDescription(f"dupspan:warm:{key}#r{rep}")
            t0 = time.monotonic()
            noop(df)
            ts.append(time.monotonic() - t0)
        warm[key] = {"min": round(min(ts), 3), "all": [round(x, 3) for x in ts]}
    sc.setJobDescription(None)
    print("warm:", json.dumps(warm, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
