"""Property-based tests (SURVEY.md §5.4): row order and epoch boundaries
must never change semantics; kernel invariants hold for arbitrary input.
Pure-Python/numpy properties only — the Ray e2e order-invariance test
lives in test_streaming_e2e.py."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_fingerprint_ray.functions import fingerprint as fp
from flink_fingerprint_ray.stages.windows import (
    compute_stats,
    dup_cluster_counts,
    sessionize_sorted,
    sliding_window_starts,
    tumbling_window_start,
)

ts_lists = st.lists(st.integers(0, 10**12), min_size=1, max_size=60)


@given(ts_lists, st.integers(1, 10**6))
def test_tumbling_contains_ts(ts, size):
    ts = np.asarray(ts, dtype=np.int64)
    ws = tumbling_window_start(ts, size)
    assert ((ws <= ts) & (ts < ws + size)).all()
    assert (ws % size == 0).all()


@given(ts_lists, st.integers(1, 50), st.integers(1, 4))
def test_sliding_every_window_contains_row(ts, slide, mult):
    ts = np.asarray(ts, dtype=np.int64)
    size = slide * mult
    take, starts = sliding_window_starts(ts, size, slide)
    t = ts[take]
    assert ((starts <= t) & (t < starts + size)).all()
    assert (starts % slide == 0).all()
    # exactly size/slide windows per row
    assert len(take) == len(ts) * mult


@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=50), st.integers(1, 10**6))
def test_sessionize_gap_property(ts, gap):
    ts = np.sort(np.asarray(ts, dtype=np.int64))
    sid = sessionize_sorted(ts, gap)
    d = np.diff(ts)
    # session id increments exactly where the gap is exceeded
    assert (np.diff(sid) == (d > gap)).all()


@given(st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=40))
def test_compute_stats_order_invariant(vals):
    a = np.asarray(vals, dtype=np.float64)
    rng = np.random.RandomState(0)
    perm = rng.permutation(len(a))
    s1, s2 = compute_stats(a), compute_stats(a[perm])
    assert s1 == s2  # bit-identical thanks to pinned sort-first reduction
    assert s1["min"] <= s1["median"] <= s1["max"]


@given(st.lists(st.integers(0, 5), min_size=1, max_size=30))
def test_dup_counts_row_order_invariant(hash_ids):
    rng = np.random.RandomState(1)
    n = len(hash_ids)
    thash = np.asarray(hash_ids, dtype=np.uint64)
    # docs with equal text hash share identical signatures (as in reality)
    base_sig = rng.randint(0, 2**32, size=(6, fp.MINHASH_K), dtype=np.uint64).astype(np.uint32)
    sig = base_sig[np.asarray(hash_ids)]
    bands = np.stack([fp.minhash_band_keys(sig, 16)[i] for i in range(n)])
    r1 = dup_cluster_counts(thash, bands, sig)
    perm = rng.permutation(n)
    r2 = dup_cluster_counts(thash[perm], bands[perm], sig[perm])
    assert r1 == r2
    exact = r1[0]
    assert exact == n - len(np.unique(thash))


@settings(deadline=None, max_examples=25)
@given(st.lists(st.text(min_size=0, max_size=80), min_size=1, max_size=20))
def test_extraction_roundtrip_any_text(texts):
    html = pa.array([fp.wrap_html(t) for t in texts], pa.binary())
    out = fp.extract_text(html).to_pylist()
    assert out == texts  # byte-identical per-row invariant


@settings(deadline=None, max_examples=25)
@given(st.lists(st.text(alphabet="ab \n", min_size=0, max_size=60), min_size=1, max_size=12))
def test_fingerprints_permutation_equivariant(texts):
    arr = pa.array(texts, pa.large_string())
    sh, mh = fp.simhash_and_minhash(arr)
    perm = np.random.RandomState(3).permutation(len(texts))
    arr_p = pa.array([texts[i] for i in perm], pa.large_string())
    sh_p, mh_p = fp.simhash_and_minhash(arr_p)
    assert np.array_equal(sh[perm], sh_p)
    assert np.array_equal(mh[perm], mh_p)
