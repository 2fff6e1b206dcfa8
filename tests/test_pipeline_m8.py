"""Semantic invariants for the M8 training-pipeline operators
(sequence packing, PII redaction, n-gram stats, mixture weights,
incremental dedup).  Engine-vs-oracle value parity is covered by
selfcheck/the driver gate; these tests pin the *semantics*."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_backup_spark import catalog
from kafka_backup_spark.queries.pipeline import NGRAM_TOPK, PACK_BUDGET


def _q(name, spark, sf_dir):
    return catalog.queries()[name](spark, sf_dir)


def test_sequence_packing_bins_partition_the_corpus(spark, sf_dir):
    rows = _q("sequence_packing", spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total_tok = docs.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")
    ).collect()[0]["t"]
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["bin_tokens"] for r in rows) == total_tok
    # per-doc token counts, to check budget boundaries doc-by-doc
    tok_of = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id", F.size(F.split(F.col("text"), " ")).alias("t")
        ).collect()
    }
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, bins in by_lang.items():
        bins.sort(key=lambda r: r["bin_id"])
        # bin ids are dense from 0 within each shard
        assert [b["bin_id"] for b in bins] == list(range(len(bins)))
        # concat-then-chunk: every bin but the last starts before the budget
        # boundary, so doc ranges are contiguous and non-overlapping
        for prev, nxt in zip(bins, bins[1:]):
            assert prev["last_doc_id"] < nxt["first_doc_id"], lang
        # budget invariants, derived from the running sum `bin_id =
        # floor(tokens_before/budget)`: for every non-last bin b,
        #   (1) the stream crosses the (b+1)·budget boundary inside b —
        #       cumulative tokens through b reach past the boundary;
        #   (2) only the boundary-crossing (last) doc overflows — the
        #       cumulative total minus that doc stays under the boundary.
        cum = 0
        for b in bins:
            cum += b["bin_tokens"]
            boundary = (b["bin_id"] + 1) * PACK_BUDGET
            if b["bin_id"] < bins[-1]["bin_id"]:
                assert cum >= boundary, (lang, b["bin_id"])
                assert cum - tok_of[b["last_doc_id"]] < boundary, (lang, b["bin_id"])


def test_pii_redaction_counts_match_planting(spark, sf_dir):
    out = {r["doc_id"]: r for r in _q("pii_redaction", spark, sf_dir).collect()}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for doc_id in range(n_docs):
        expect = (
            1 if doc_id % 7 == 0 else 0,   # email
            1 if doc_id % 11 == 0 else 0,  # phone
            1 if doc_id % 13 == 0 else 0,  # ip
            1 if doc_id % 17 == 0 else 0,  # ssn
            1 if doc_id % 19 == 0 else 0,  # card
        )
        if sum(expect) == 0:
            assert doc_id not in out  # clean docs are filtered out
        else:
            r = out[doc_id]
            got = (r["n_emails"], r["n_phones"], r["n_ips"], r["n_ssns"], r["n_cards"])
            assert got == expect, doc_id


def test_pii_planted_cards_are_luhn_valid(spark, sf_dir):
    # independent Python Luhn validator over every planted card number:
    # the arithmetic check digit in q_pii_redaction must make each card a
    # REAL Luhn-valid number (a Luhn-verifying detector would fire on it)
    def luhn_ok(digits: str) -> bool:
        total = 0
        for i, ch in enumerate(reversed(digits)):
            x = int(ch)
            if i % 2 == 1:
                x *= 2
                if x > 9:
                    x -= 9
            total += x
        return total % 10 == 0

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    checked = 0
    for doc_id in range(0, n_docs, 19):
        v = doc_id % 1000
        a, b, c = v // 100, (v // 10) % 10, v % 10
        luhn2 = lambda x: 2 * x if x < 5 else 2 * x - 9  # noqa: E731
        k = (10 - (luhn2(a) + b + luhn2(c)) % 10) % 10
        assert luhn_ok(f"424242424242{a}{b}{c}{k}"), doc_id
        checked += 1
    assert checked > 0


def test_pii_redaction_masks_all_matches(spark, sf_dir):
    # after the full five-class redaction (cards, SSNs, emails, phones, IPs
    # — the PRODUCTION planting + redaction chain, imported so this can't
    # drift from q_pii_redaction), NO pattern of ANY class may still match
    # anywhere in the corpus
    from kafka_backup_spark.queries.pipeline import (
        CARD_RE,
        EMAIL_RE,
        IP_RE,
        PHONE_RE,
        SSN_RE,
        pii_planted_text,
        pii_redact,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    red = pii_redact(pii_planted_text(F.col("text"), F.col("doc_id")))
    residue = docs.select(
        F.sum(F.size(F.regexp_extract_all(red, F.lit(EMAIL_RE), 0))).alias("n"),
        F.sum(F.size(F.regexp_extract_all(red, F.lit(PHONE_RE), 0))).alias("p"),
        F.sum(F.size(F.regexp_extract_all(red, F.lit(IP_RE), 0))).alias("i"),
        F.sum(F.size(F.regexp_extract_all(red, F.lit(SSN_RE), 0))).alias("s"),
        F.sum(F.size(F.regexp_extract_all(red, F.lit(CARD_RE), 0))).alias("c"),
    ).collect()[0]
    assert tuple(residue) == (0, 0, 0, 0, 0)


def test_ngram_topk_is_sorted_and_exact_k(spark, sf_dir):
    rows = _q("ngram_topk", spark, sf_dir).collect()
    assert len(rows) == NGRAM_TOPK
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # deterministic tie-break: equal counts appear in gram order
    for a, b in zip(rows, rows[1:]):
        if a["n"] == b["n"]:
            assert a["gram"] < b["gram"]


def test_mixture_weights_normalize_and_smooth(spark, sf_dir):
    rows = _q("mixture_weights", spark, sf_dir).collect()
    n = len(rows)
    total_w = sum(r["weight_ppm"] for r in rows)
    total_s = sum(r["share_ppm"] for r in rows)
    # floor() loses at most 1 ppm per source
    assert 1_000_000 - n <= total_w <= 1_000_000
    assert 1_000_000 - n <= total_s <= 1_000_000
    # alpha=0.5 smoothing: the biggest source is down-weighted relative to
    # its raw share, the smallest is up-weighted
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    if big["n_tokens"] != small["n_tokens"]:
        assert big["weight_ppm"] <= big["share_ppm"]
        assert small["weight_ppm"] >= small["share_ppm"]
    # monotone: more tokens never means smaller weight
    by_tok = sorted(rows, key=lambda r: (r["n_tokens"], r["weight_ppm"]))
    ws = [r["weight_ppm"] for r in by_tok]
    assert ws == sorted(ws)


def test_incremental_dedup_null_text_parity(spark, tmp_path):
    # NULL text must survive the anti-join on BOTH engines: Spark's
    # left_anti never matches a NULL key, and the oracle's NOT EXISTS
    # (p.h = md5(b.text) is UNKNOWN for NULL) keeps the row too.  A NOT IN
    # oracle would silently return ZERO batch rows the moment any prior
    # hash were NULL — the exact divergence this fixture pins down.
    import duckdb

    from kafka_backup_spark.queries.pipeline import (
        SQL_INCREMENTAL_DEDUP,
        q_incremental_dedup,
    )

    rows = [
        # prior snapshot: doc_id % 3 == 0, including a NULL-text prior row
        (0, "en", "alpha beta"),
        (3, "en", None),
        (6, "de", "gamma delta"),
        # batch: doc_id % 3 != 0, including NULL-text batch rows
        (1, "en", "epsilon zeta"),
        (2, "en", None),
        (4, "de", "alpha beta"),  # dup of prior 0 — must be dropped
        (5, "de", None),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, lang string, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    got = {
        (r["lang"], r["n_new"], r["first_new_doc_id"])
        for r in q_incremental_dedup(spark, sf).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    want = {(r[0], r[1], r[2]) for r in con.sql(SQL_INCREMENTAL_DEDUP).fetchall()}
    assert got == want
    # NULL-text batch rows (2 and 5) survive on both engines; the md5 dups
    # (4 and the planted copies 2000000/2000006) are dropped.
    assert got == {("en", 2, 1), ("de", 1, 5)}


def test_incremental_dedup_drops_every_planted_copy(spark, sf_dir):
    rows = _q("incremental_dedup", spark, sf_dir).collect()
    # planted copies of prior-snapshot docs carry doc_id >= 2_000_000 and
    # must all be eliminated by the anti-join
    assert all(r["first_new_doc_id"] < 2_000_000 for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch_n = docs.filter(F.col("doc_id") % 3 != 0).count()
    # survivors are a subset of the genuinely-new batch docs
    assert 0 < sum(r["n_new"] for r in rows) <= batch_n
