"""Semantic invariants for the M9 corpus-curation operators (repetition
metrics, token histogram).  Engine-vs-oracle parity is covered by
selfcheck; these pin the semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_backup_spark import catalog
from kafka_backup_spark.queries.pipeline import (
    HIST_BUCKET_TOKENS,
    REP_DUP_BIGRAM_MAX,
    REP_TOP_TOKEN_MAX,
)


def _q(name, spark, sf_dir):
    return catalog.queries()[name](spark, sf_dir)


def test_repetition_metrics_bounds_and_flag(spark, sf_dir):
    rows = _q("repetition_metrics", spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs  # synthetic docs all have >= 2 tokens
    for r in rows:
        assert r["n_tokens"] >= 1
        assert 0.0 < r["distinct_frac"] <= 1.0
        assert 0.0 < r["top_token_frac"] <= 1.0
        assert 0.0 <= r["dup_bigram_frac"] < 1.0
        assert r["keep"] == (
            r["dup_bigram_frac"] <= REP_DUP_BIGRAM_MAX
            and r["top_token_frac"] <= REP_TOP_TOKEN_MAX
        )


def test_repetition_metrics_on_known_doc(spark, sf_dir):
    # hand-check one doc end-to-end against pure Python
    doc = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    words = [w for w in doc["text"].lower().split(" ") if w]
    bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    from collections import Counter

    wc = Counter(words)
    row = [
        r
        for r in _q("repetition_metrics", spark, sf_dir).collect()
        if r["doc_id"] == doc["doc_id"]
    ][0]
    assert row["n_tokens"] == len(words)
    assert row["top_token_frac"] == round(max(wc.values()) / len(words), 4)
    assert row["dup_bigram_frac"] == round(1 - len(set(bigrams)) / len(bigrams), 4)


def test_token_histogram_partitions_corpus(spark, sf_dir):
    rows = _q("token_histogram", spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    # buckets are non-negative and every (source, bucket) is unique
    keys = [(r["source"], r["bucket"]) for r in rows]
    assert len(set(keys)) == len(keys)
    assert all(r["bucket"] >= 0 for r in rows)
    # cross-check one source's bucket sum against a direct count
    src = rows[0]["source"]
    direct = docs.filter(F.col("source") == src).count()
    assert sum(r["n_docs"] for r in rows if r["source"] == src) == direct


def test_filtered_mixture_sums_and_subset(spark, sf_dir):
    """Survivor mixture: totals equal the kept-doc subset exactly, ppm
    normalization holds, and filtering can only shrink each source."""
    rows = {r["source"]: r for r in _q("filtered_mixture", spark, sf_dir).collect()}
    rep = {r["doc_id"]: r["keep"] for r in _q("repetition_metrics", spark, sf_dir).collect()}
    full = {r["source"]: r for r in _q("mixture_weights", spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source").collect()
    from collections import Counter

    kept_by_source = Counter(d["source"] for d in docs if rep.get(d["doc_id"]))
    assert {s: r["n_docs"] for s, r in rows.items()} == dict(kept_by_source)
    for s, r in rows.items():
        assert r["n_docs"] <= full[s]["n_docs"]
        assert r["n_tokens"] <= full[s]["n_tokens"]
    total = sum(r["share_ppm"] for r in rows.values())
    assert 1_000_000 - len(rows) <= total <= 1_000_000


def test_vocab_coverage_bounds_and_python_crosscheck(spark, sf_dir):
    from kafka_backup_spark.queries.pipeline import VOCAB_TOPK

    rows = {r["lang"]: r for r in _q("vocab_coverage", spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("lang", "text").collect()
    from collections import Counter, defaultdict

    by_lang: dict[str, Counter] = defaultdict(Counter)
    for d in docs:
        by_lang[d["lang"]].update(w for w in d["text"].lower().split(" ") if w)
    assert set(rows) == set(by_lang)
    for lang, wc in by_lang.items():
        r = rows[lang]
        assert r["n_distinct"] == len(wc)
        assert r["total"] == sum(wc.values())
        top = sum(c for _, c in sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_TOPK])
        assert r["coverage"] == round(top / sum(wc.values()), 4)
        assert 0.0 < r["coverage"] <= 1.0


def test_packing_efficiency_consistent_with_bins(spark, sf_dir):
    from kafka_backup_spark.queries.pipeline import PACK_BUDGET

    bins = _q("sequence_packing", spark, sf_dir).collect()
    eff = {r["lang"]: r for r in _q("packing_efficiency", spark, sf_dir).collect()}
    from collections import defaultdict

    by_lang = defaultdict(list)
    for b in bins:
        by_lang[b["lang"]].append(b)
    assert set(eff) == set(by_lang)
    for lang, bs in by_lang.items():
        r = eff[lang]
        assert r["n_bins"] == len(bs)
        assert r["n_docs"] == sum(b["n_docs"] for b in bs)
        fills = [b["bin_tokens"] / PACK_BUDGET for b in bs]
        assert r["mean_fill"] == round(sum(fills) / len(fills), 4)
        assert r["overflow_bins"] == sum(1 for f in fills if f > 1.0)
        # NB: a non-last bin need NOT overflow — when its predecessor's
        # boundary-crossing doc spills deep into this bin's token range,
        # this bin can close under budget; only the rollup consistency
        # above is an invariant.


def test_token_budget_selection_fills_half_budget(spark, sf_dir):
    """Bucketed budget fill: selection crosses the budget boundary exactly
    once per source (whole buckets until the boundary bucket, inclusive),
    cross-checked against a pure-Python recompute over the scored docs."""
    rows = {r["source"]: r for r in _q("token_budget_selection", spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.lower(F.col("text")), " ")
    n = F.size(toks)
    qb = F.floor(
        F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6) * 1000
    ).cast("long")
    scored = docs.select("source", qb.alias("qb"), n.cast("long").alias("tok")).collect()
    by_src: dict[str, list] = {}
    for r in scored:
        by_src.setdefault(r["source"], []).append((r["qb"], r["tok"]))
    assert set(rows) == set(by_src)
    for src, docs_src in by_src.items():
        total = sum(t for _, t in docs_src)
        budget = total // 2
        # bucket-cumulative fill in descending quality order
        buckets: dict[int, list] = {}
        for q, t in docs_src:
            buckets.setdefault(q, []).append(t)
        cum = 0
        selected_docs = selected_tokens = 0
        cutoff = None
        for q in sorted(buckets, reverse=True):
            if cum >= budget:
                break
            bt = sum(buckets[q])
            cum += bt
            selected_docs += len(buckets[q])
            selected_tokens += bt
            cutoff = q
        r = rows[src]
        assert (
            r["cutoff_quality_milli"],
            r["n_selected"],
            r["selected_tokens"],
            r["token_budget"],
        ) == (cutoff, selected_docs, selected_tokens, budget), src
        # the fill crossed the boundary (or consumed the whole source)
        assert selected_tokens >= budget or selected_docs == len(docs_src)


def test_quality_quantile_filter_median_semantics(spark, sf_dir):
    """Per-language median gate: strictly-above-median keeps at most half the
    docs, and the median matches a Python interpolated percentile."""
    rows = {r["lang"]: r for r in _q("quality_quantile_filter", spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.lower(F.col("text")), " ")
    q = F.round(F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6)
    scored = docs.select("lang", q.alias("q")).collect()
    by_lang: dict[str, list] = {}
    for r in scored:
        by_lang.setdefault(r["lang"], []).append(r["q"])
    assert set(rows) == set(by_lang)
    for lang, qs in by_lang.items():
        qs.sort()
        k = (len(qs) - 1) * 0.5
        lo, hi = int(k), min(int(k) + 1, len(qs) - 1)
        med = round(qs[lo] + (qs[hi] - qs[lo]) * (k - lo), 6)
        r = rows[lang]
        assert r["n_docs"] == len(qs)
        assert abs(r["median_q"] - med) < 1e-9, lang
        assert r["n_kept"] == sum(1 for x in qs if x > r["median_q"])
        assert r["n_kept"] <= len(qs) / 2


def _anchor_starts(text):
    """Python reference of the content-defined window sampling rule (r7):
    0-based char starts of anchor WORDS — (len·31 + first-char-code) %
    SPAN_ANCHOR_MOD == 0 — plus the first word; only starts whose
    SPAN_LEN-char window fits."""
    from kafka_backup_spark.queries.pipeline import (
        SPAN_ANCHOR_MOD,
        SPAN_ANCHOR_MULT,
        SPAN_LEN,
    )

    starts = []
    pos = 0  # 0-based char position of the current word
    for j, w in enumerate(text.split(" ")):
        first = ord(w[0]) if w else 0
        if (j == 0 or (len(w) * SPAN_ANCHOR_MULT + first) % SPAN_ANCHOR_MOD == 0) and (
            pos <= len(text) - SPAN_LEN
        ):
            starts.append(pos)
        pos += len(w) + 1
    return starts


def test_dup_span_fraction_matches_python_oracle(spark, sf_dir):
    """Independent Python recomputation of the duplicated-span signal over
    the same corpus (docs + planted copies): per-doc window hashes at the
    same content-defined anchors, cross-document collision counts,
    identical fractions.  Planted copies (and their originals) must come
    out fully duplicated."""
    from collections import defaultdict

    from kafka_backup_spark.queries.pipeline import SPAN_LEN

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    corpus = dict(docs)
    for doc_id, text in docs.items():
        if doc_id % 10 == 0:
            corpus[doc_id + 1_000_000] = text

    def spans(text):
        return {text[i : i + SPAN_LEN] for i in _anchor_starts(text)}

    per_doc = {d: spans(t) for d, t in corpus.items() if len(t) >= SPAN_LEN}
    owners = defaultdict(set)
    for d, ss in per_doc.items():
        for s in ss:
            owners[s].add(d)
    rows = {r["doc_id"]: r for r in _q("dup_span_fraction", spark, sf_dir).collect()}
    assert set(rows) == set(per_doc)
    for d, ss in per_doc.items():
        n_dup = sum(1 for s in ss if len(owners[s]) > 1)
        r = rows[d]
        assert r["n_spans"] == len(ss), d
        assert r["n_dup_spans"] == n_dup, d
        assert abs(r["dup_fraction"] - n_dup / len(ss)) < 1e-6, d
        if d >= 1_000_000 and len(ss) > 0:
            assert r["dup_fraction"] == 1.0, d  # planted copy: fully duplicated


def test_dup_span_extents_match_python_oracle(spark, sf_dir):
    """Independent Python recomputation of the merged span extents and the
    excised clean text (VERDICT r6 #4): same content-defined windows,
    cross-doc collision ownership, interval merge, and character excision —
    the clean_hash must equal md5 of the Python-excised text for every
    doc."""
    import hashlib
    from collections import defaultdict

    from kafka_backup_spark.queries.pipeline import SPAN_LEN

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    corpus = dict(docs)
    for doc_id, text in docs.items():
        if doc_id % 10 == 0:
            corpus[doc_id + 1_000_000] = text
    corpus = {d: t for d, t in corpus.items() if len(t) >= SPAN_LEN}

    def win_starts(text):
        return _anchor_starts(text)

    owners = defaultdict(set)
    for d, t in corpus.items():
        for i in win_starts(t):
            owners[t[i : i + SPAN_LEN]].add(d)

    def expected(d, t):
        dup = [i for i in win_starts(t) if len(owners[t[i : i + SPAN_LEN]]) > 1]
        merged = []  # list of [s, e] 0-based inclusive char ranges
        for i in dup:
            s, e = i, i + SPAN_LEN - 1
            if merged and s <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        clean = "".join(
            t[(0 if k == 0 else merged[k - 1][1] + 1) : (merged[k][0] if k < len(merged) else len(t))]
            for k in range(len(merged) + 1)
        )
        # operator reports 1-based inclusive extents
        span_str = ";".join(f"{s + 1}-{e + 1}" for s, e in merged)
        return (
            len(merged),
            sum(e - s + 1 for s, e in merged),
            span_str,
            hashlib.md5(clean.encode()).hexdigest(),
        )

    rows = {r["doc_id"]: r for r in _q("dup_span_extents", spark, sf_dir).collect()}
    assert set(rows) == set(corpus)
    n_with_spans = 0
    for d, t in corpus.items():
        n, chars, span_str, clean_hash = expected(d, t)
        r = rows[d]
        assert (r["n_spans"], r["dup_chars"], r["spans"]) == (n, chars, span_str), d
        assert r["clean_hash"] == clean_hash, d
        n_with_spans += bool(n)
        if d >= 1_000_000:  # planted copy: entire doc is one duplicated span
            # content-defined anchors are irregular: a >SPAN_LEN anchor gap
            # splits the copy into several extents, so assert dense
            # coverage rather than a single contiguous span
            assert r["n_spans"] >= 1 and r["dup_chars"] >= len(t) // 2, d
    assert n_with_spans > 0  # the planted copies guarantee real extents


def test_leakage_safe_split_groups_never_cross(spark, sf_dir):
    """Every content group maps to exactly ONE split (the whole point of a
    dedup-aware split): the per-split group counts must sum to the global
    distinct-content count — a group crossing splits would be counted
    twice.  Planted duplicate twins share content, hence a group, hence a
    split; doc counts reconcile with the corpus."""
    from pyspark.sql import functions as F

    rows = _q("leakage_safe_split", spark, sf_dir).collect()
    by = {r["split"]: r for r in rows}
    assert set(by) <= {"train", "val", "test"} and "train" in by

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 10 == 0)
    n_docs = docs.count() + planted.count()
    n_groups = docs.select(F.md5(F.col("text").cast("binary"))).distinct().count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["n_groups"] for r in rows) == n_groups  # no group crosses
    assert by["train"]["n_docs"] / n_docs > 0.90  # ~98/1/1 buckets


def test_ann_recall_structural_invariants(spark, sf_dir):
    """recall@k bookkeeping: the ground-truth side contributes exactly k
    rows per probe, hits never exceed truths, and the ppm ratio is the
    exact integer division of those counters.  (No recall FLOOR asserted:
    the synthetic embeddings are near-uniform, so exact-vs-quantized
    cosine orderings legitimately disagree on near-ties — measuring that
    is what the operator is for.)"""
    from kafka_backup_spark.queries.pipeline import TOP_K

    r = _q("ann_recall", spark, sf_dir).collect()[0]
    assert r["n_true"] == TOP_K * r["n_probes"]
    assert 0 <= r["n_hit"] <= r["n_true"]
    assert r["recall_ppm"] == r["n_hit"] * 1_000_000 // r["n_true"]


def test_dup_span_detects_misaligned_copies(spark):
    """The r7 regression the content-defined anchors fix: a block copied at
    offsets that differ mod 16 produced ZERO collisions under the original
    fixed-stride sampling (windows never aligned), silently missing
    arbitrary-offset plagiarism.  Anchors depend only on surrounding
    content, so the copies share interior windows regardless of offset."""
    from kafka_backup_spark.queries.pipeline import dup_span_extents_frame

    block = (
        "the quick brown fox jumps over the lazy dog while seventeen green "
        "ships sailed past the harbor wall carrying spice and copper ingots"
    )  # 133 varied chars → interior anchors fire w.h.p. (verified below)
    a = "zzzz qqq " + block + " tail of document one with extra words"
    b = block + " a completely different ending for the second document"
    # offsets 9 vs 0 — misaligned mod 16 (the old stride's blind spot)
    shared = {
        a[i : i + 40] for i in _anchor_starts(a)
    } & {b[i : i + 40] for i in _anchor_starts(b)}
    assert shared, "fixture block must anchor internally; adjust block text"

    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dup_span_extents_frame(df).collect()}
    assert rows[0]["n_spans"] >= 1 and rows[1]["n_spans"] >= 1
    assert rows[0]["dup_chars"] >= 40 and rows[1]["dup_chars"] >= 40
