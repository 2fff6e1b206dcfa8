"""Hot-cell skew bound for the per-cell pair generator (VERDICT r15 #3).

``_cell_pairs_fn`` (textops) generates and scores every a<b member pair of
one probe cell inside a single ``applyInArrow`` group.  A degenerate
k-means cell holding ~90% of the corpus is the guide §2.5 skew hazard for
that stage: one group task sees m members and m(m-1)/2 pairs.  The
docstring claims peak per-task memory stays O(chunk·dim + m·dim) because
pair indices are enumerated per ANCHOR BLOCK, never as a materialized
O(m²) ``triu_indices`` array.  These tests turn that claim from a
docstring argument into a pinned property:

- bit-equal output vs an independent full-triu brute force (same float64
  op sequence per pair, so equality is exact, not approximate);
- measured peak allocations on a hot cell STRICTLY below the size of even
  ONE materialized triu index array (the O(m²) fingerprint), while the
  block path's own buffers stay near O(chunk·dim).
"""

from __future__ import annotations

import tracemalloc

import numpy as np
import pyarrow as pa
import pytest

from kafka_backup_spark.queries.textops import _cell_pairs_fn

DIM = 8
PREC = 4
SCALE = float(10**PREC)


def _mk_cell_table(ids: np.ndarray, V: np.ndarray) -> pa.Table:
    """One cell's group table as applyInArrow would hand it over."""
    return pa.table(
        {
            "cell": pa.array(np.ones(len(ids), dtype=np.int64)),
            "vec_id": pa.array(ids, type=pa.int64()),
            "qe": pa.array(list(V), type=pa.list_(pa.int64())),
        }
    )


def _brute_pairs(ids: np.ndarray, V: np.ndarray, threshold: float):
    """Independent reference: the materialized-triu formulation the shipped
    code explicitly avoids, scored with the IDENTICAL per-pair float64 op
    sequence (elementwise product, sum(axis=1), one IEEE sqrt/div,
    half-away rounding) so results must be bit-equal, not merely close."""
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    Vf = V[order].astype(np.float64)
    m = len(ids)
    ii, jj = np.triu_indices(m, k=1)
    A, B = Vf[ii], Vf[jj]
    s = (A * B).sum(axis=1) / (
        np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
    )
    sim = np.copysign(np.floor(np.abs(s) * SCALE + 0.5) / SCALE, s)
    msk = sim >= threshold
    return ids[ii[msk]], ids[jj[msk]], sim[msk]


def _synth_corpus(n: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n).astype(np.int64)  # unsorted, as the group arrives
    V = rng.integers(-1000, 1000, size=(n, DIM)).astype(np.int64)
    # plant exact near-dups so some pairs survive a high threshold
    V[n // 3] = V[0]
    V[2 * n // 3] = V[1] * 2  # same direction, cosine 1.0
    return ids, V


@pytest.mark.parametrize("threshold", [0.985, 0.5])
def test_cell_pairs_bit_equal_vs_brute_force(threshold):
    ids, V = _synth_corpus(600, seed=7)
    fn = _cell_pairs_fn(PREC, threshold, dim=DIM, chunk=1 << 10)
    got = fn(_mk_cell_table(ids, V))
    ga = got.column("vec_a").to_numpy(zero_copy_only=False)
    gb = got.column("vec_b").to_numpy(zero_copy_only=False)
    gs = got.column("cosine_sim").to_numpy(zero_copy_only=False)
    ba, bb, bs = _brute_pairs(ids, V, threshold)
    assert len(ga) == len(ba) > 0
    # identical enumeration order (sorted ids, anchor-major) → compare 1:1
    np.testing.assert_array_equal(ga, ba)
    np.testing.assert_array_equal(gb, bb)
    # bit-equal sims: same float64 op sequence on the same rows
    assert gs.tobytes() == bs.tobytes()


def test_hot_cell_memory_stays_block_bounded():
    """One cell holding ~90% of a corpus (m = 4000 here → 8.0M pairs) must
    be scored in anchor blocks: peak traced allocations stay far below the
    16-byte-per-pair materialized triu index (128 MB here) — we assert
    under ONE int64 triu array (64 MB), and in practice the block path
    peaks near O(chunk·dim) a couple of MB."""
    m = 4000
    ids, V = _synth_corpus(m, seed=11)
    chunk = 1 << 12
    fn = _cell_pairs_fn(PREC, 0.9999, dim=DIM, chunk=chunk)  # few survivors
    table = _mk_cell_table(ids, V)

    tracemalloc.start()
    tracemalloc.reset_peak()
    out = fn(table)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    n_pairs = m * (m - 1) // 2
    one_triu_array_bytes = n_pairs * 8  # ii alone; the pair (ii, jj) doubles it
    assert peak < one_triu_array_bytes, (
        f"peak {peak / 1e6:.1f} MB ≥ one materialized triu array "
        f"{one_triu_array_bytes / 1e6:.1f} MB — block enumeration regressed"
    )
    # sanity floor: the stage still did the full O(m²) pair work
    assert out.num_rows >= 1  # planted dups survive 0.9999
    ba, bb, bs = _brute_pairs(ids, V, 0.9999)
    assert out.num_rows == len(ba)
    got = out.column("cosine_sim").to_numpy(zero_copy_only=False)
    assert got.tobytes() == bs.tobytes()


def test_skewed_cell_distribution_exactness():
    """90/10 split across two cells: the hot cell (90% of vectors) and a
    small cell produce, together, exactly the union of their per-cell brute
    forces — the distribution skew changes task sizing, never results."""
    n = 1000
    ids, V = _synth_corpus(n, seed=23)
    hot = slice(0, int(n * 0.9))
    cold = slice(int(n * 0.9), n)
    fn = _cell_pairs_fn(PREC, 0.5, dim=DIM, chunk=1 << 9)
    rows = []
    for sl in (hot, cold):
        t = fn(_mk_cell_table(ids[sl], V[sl]))
        rows += list(
            zip(
                t.column("vec_a").to_numpy(zero_copy_only=False),
                t.column("vec_b").to_numpy(zero_copy_only=False),
                t.column("cosine_sim").to_numpy(zero_copy_only=False),
            )
        )
    expect = []
    for sl in (hot, cold):
        ba, bb, bs = _brute_pairs(ids[sl], V[sl], 0.5)
        expect += list(zip(ba, bb, bs))
    assert sorted(rows) == sorted(expect)
