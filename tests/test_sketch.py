"""HyperLogLog sketch correctness: exact rank kernel, merge invariance,
estimate accuracy at several cardinalities, and the Dataset path."""

import math

import numpy as np
import pyarrow as pa
import pytest

from flink_fingerprint_ray.stages import sketch as sk

BOUND = 3.0 * 1.04 / math.sqrt(sk.HLL_M)   # 3-sigma relative error, p=12


def test_clz_rank_exact_bit_positions():
    width = 64 - sk.HLL_P
    w = np.array([1 << 63, 1 << 62, 1 << (64 - width), 0], dtype=np.uint64)
    # leftmost set bit at offset 0, 1, width-1; all-zero suffix -> width+1
    assert sk._clz_rank(w, width).tolist() == [1, 2, width, width + 1]


def test_fold_merge_equals_single_pass():
    rng = np.random.RandomState(7)
    h = rng.randint(0, 2**63, size=20_000).astype(np.uint64) * np.uint64(2) + \
        rng.randint(0, 2, size=20_000).astype(np.uint64)
    one = sk.hll_fold(h)
    merged = np.maximum(sk.hll_fold(h[:9_000]), sk.hll_fold(h[9_000:]))
    assert np.array_equal(one, merged)
    # idempotent under re-fold of the same values
    assert np.array_equal(one, sk.hll_fold(h, one.copy()))


@pytest.mark.parametrize("n", [50, 500, 20_000, 300_000])
def test_estimate_within_three_sigma(n):
    rng = np.random.RandomState(n)
    # uniform 64-bit "hashes" with known distinct count (duplicates folded
    # to the same registers by construction)
    h = rng.randint(0, 2**63, size=n).astype(np.uint64) * np.uint64(2)
    h = np.unique(h)
    est = sk.hll_estimate(sk.hll_fold(h))
    assert abs(est - len(h)) <= BOUND * len(h)


def test_heavy_hitters_exact_on_planted_skew(ray_session):
    import pandas as pd
    import ray.data

    rng = np.random.RandomState(11)
    # 3 planted heavy keys (5% each) over a long uniform tail
    vals = np.concatenate([
        np.repeat([1001, 1002, 1003], 600),
        rng.randint(0, 5_000, size=10_200),
    ]).astype(np.int64)
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals)})).repartition(16)
    got = sk.heavy_hitters(ds, "k", phi=0.04)
    exp = (pd.Series(vals).value_counts().rename_axis("k")
           .reset_index(name="n_rows"))
    exp = exp[exp["n_rows"] >= 0.04 * len(vals)]
    exp = exp.sort_values(["n_rows", "k"], ascending=[False, True]) \
             .reset_index(drop=True).astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)
    # planted keys must be exactly the hitters at phi=4%
    assert set(got["k"]) == {1001, 1002, 1003}


def test_heavy_hitters_empty_when_uniform(ray_session):
    import ray.data

    vals = np.arange(20_000, dtype=np.int64) % 4_000   # all freq = 5
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals)})).repartition(8)
    got = sk.heavy_hitters(ds, "k", phi=0.01)
    assert len(got) == 0 and list(got.columns) == ["k", "n_rows"]


def test_tfidf_top_term_planted_corpus(ray_session):
    import pandas as pd
    import ray.data

    from flink_fingerprint_ray.stages import textops as tx
    from flink_fingerprint_ray.stages.shuffle import grouped_map

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["Apple apple banana", "banana cherry",
                          "cherry cherry cherry date"]),
    })
    ds = ray.data.from_arrow(docs).repartition(3)
    counts = ds.map_batches(tx.tfidf_doc_term_counts, batch_format="pyarrow")
    scored = grouped_map(counts, ["term"], tx.tfidf_attach_idf,
                         fn_kwargs={"n_docs": 3})
    got = grouped_map(scored, ["doc_id"], tx.tfidf_top_term_sweep) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc0: apple tf=2, df=1 -> 2*ln(3); doc1: banana==cherry score tie
    # -> banana by term asc; doc2: cherry 3*ln(1.5) > date ln(3)
    assert got["top_term"].tolist() == ["apple", "banana", "cherry"]
    import numpy as _np
    exp_scores = [2 * _np.log(3.0), _np.log(3.0 / 2.0), 3 * _np.log(3.0 / 2.0)]
    assert got["score_cents"].tolist() == \
        [int(_np.floor(s * 100 + 0.5)) for s in exp_scores]


def test_dataset_hll_vs_exact(ray_session):
    import ray.data

    texts = [f"document number {i} payload" for i in range(4_000)]
    texts += texts[:500]                          # 500 exact dups
    tbl = pa.table({"text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl).repartition(8)
    exact = sk.exact_distinct(ds, "text")
    assert exact == 4_000
    est = sk.hll_distinct(ds, "text")
    assert abs(est - exact) <= BOUND * exact


def test_hist_quantile_within_one_bin():
    rng = np.random.RandomState(3)
    vals = rng.exponential(50.0, size=50_000)
    lo, hi = float(vals.min()), float(vals.max())
    c = sk.hist_fold(vals, lo, hi)
    # merge invariance
    m = sk.hist_fold(vals[:20_000], lo, hi) + sk.hist_fold(vals[20_000:], lo, hi)
    assert np.array_equal(c, m)
    w = (hi - lo) / sk.HIST_BINS
    s = np.sort(vals)
    for q in (0.5, 0.9, 0.99):
        exact = s[max(int(np.ceil(q * len(s))), 1) - 1]
        assert abs(sk.hist_quantile(c, lo, hi, q) - exact) <= 2 * w


def test_bloom_join_empty_build_side(ray_session):
    """No build-side keys -> all-zero filter -> every probe row drops
    before the exchange and the join returns an empty, well-typed frame."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from flink_fingerprint_ray.pipelines.queries import (
        _BLOOM_BITS, _bloom_hashes)

    keys = np.arange(100, dtype=np.int64)
    bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)   # empty build side
    pos = _bloom_hashes(keys)
    member = ((bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
    assert not member.any()


def test_cms_never_undercounts_and_merge_associative():
    """CMS point queries >= exact for every key, and summing two folds
    equals one fold over the concatenation (mergeability)."""
    from flink_fingerprint_ray.stages import sketch as sk

    rng = np.random.default_rng(7)
    a = rng.integers(0, 500, size=4000)
    b = rng.integers(0, 500, size=3000)
    both = sk.cms_fold(np.concatenate([a, b]))
    merged = sk.cms_fold(a) + sk.cms_fold(b)
    assert (both == merged).all()
    keys, exact = np.unique(np.concatenate([a, b]), return_counts=True)
    est = sk.cms_estimate(both, keys)
    assert (est >= exact).all()
    # total L1 overcount bounded by d * n (each row's total mass is n)
    assert est.sum() - exact.sum() <= 7000


def test_cms_exact_when_sparse():
    """Far fewer keys than counters and 4 independent rows: the min-row
    estimate is exact with overwhelming margin on a fixed seed."""
    from flink_fingerprint_ray.stages import sketch as sk

    keys = np.arange(50, dtype=np.int64)
    t = sk.cms_fold(np.repeat(keys, 3))
    assert (sk.cms_estimate(t, keys) == 3).all()


def test_doc_word_chunks_matches_naive():
    """Chunker equals the naive per-doc loop: k-word groups in order,
    trailing partial dropped, single-space split semantics."""
    import pyarrow as pa

    from flink_fingerprint_ray.stages.textops import doc_word_chunks

    texts = ["a b c d e f g h i j k",          # 11 words -> 2 chunks
             "one two three four five",         # exactly one
             "short text",                      # dropped entirely
             "x " * 9 + "x"]                    # 10 words -> 2 chunks
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    got = doc_word_chunks(batch).to_pandas()
    want = []
    for i, t in enumerate(texts):
        w = t.split(" ")
        for c in range(len(w) // 5):
            want.append((i, " ".join(w[5 * c:5 * c + 5])))
    assert list(map(tuple, got.to_numpy())) == want
