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
    dynamic_session_segments,
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


@given(
    st.lists(st.tuples(st.integers(0, 3),            # key id
                       st.integers(0, 10**6),        # ts
                       st.integers(0, 10**4)),       # per-ELEMENT gap
            min_size=1, max_size=60),
)
def test_dynamic_session_segments_matches_sequential_scan(rows):
    """dynamic_session_segments (vectorized per-key cummax) vs the naive
    sequential per-row scan of the Flink gap-extractor semantics: break
    when ts exceeds the running session end max(ts_i + gap_i)."""
    rows.sort()  # key-blocked, ts-sorted (the actor's input contract)
    key = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    gap = np.array([r[2] for r in rows], dtype=np.int64)
    key_change = np.ones(len(rows), dtype=bool)
    key_change[1:] = key[1:] != key[:-1]
    new_seg, running = dynamic_session_segments(ts, gap, key_change)
    # naive scan
    want_seg = np.zeros(len(rows), dtype=bool)
    want_end = np.zeros(len(rows), dtype=np.int64)
    cur_end = None
    for i in range(len(rows)):
        if i == 0 or key_change[i] or ts[i] > cur_end:
            want_seg[i] = True
            cur_end = ts[i] + gap[i]
        else:
            cur_end = max(cur_end, ts[i] + gap[i])
        want_end[i] = cur_end
    assert (new_seg == want_seg).all()
    # running end must agree at every row (its value at a session's last
    # row is the session's window_end)
    assert (running == want_end).all()


@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=50),
       st.integers(1, 10**6))
def test_dynamic_constant_gap_reduces_to_fixed_rule(ts, gap):
    """With a constant gap the dynamic path must reproduce the fixed-gap
    segmentation exactly (break iff diff > gap, end = last + gap)."""
    ts = np.sort(np.asarray(ts, dtype=np.int64))
    kc = np.zeros(len(ts), dtype=bool)
    kc[0] = True
    new_seg, running = dynamic_session_segments(
        ts, np.full(len(ts), gap, dtype=np.int64), kc)
    sid = sessionize_sorted(ts, gap)
    want_seg = np.ones(len(ts), dtype=bool)
    want_seg[1:] = np.diff(sid) > 0
    assert (new_seg == want_seg).all()
    starts = np.flatnonzero(new_seg)
    ends = np.append(starts[1:], len(ts))
    assert (running[ends - 1] == ts[ends - 1] + gap).all()


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


# ---------------------------------------------------------------------------
# Round-2 kernels
# ---------------------------------------------------------------------------

@settings(deadline=None)
@given(st.lists(st.lists(st.integers(0, 30), max_size=12), min_size=1, max_size=10),
       st.lists(st.lists(st.integers(0, 30), max_size=12), min_size=1, max_size=10))
def test_set_jaccard_many_matches_scalar(sides_a, sides_b):
    """Vectorized per-pair set Jaccard == frozenset arithmetic, for any
    ragged pair lists (duplicates inside a side must be deduped)."""
    from flink_fingerprint_ray.stages.dedup import _set_jaccard_many

    n = min(len(sides_a), len(sides_b))
    sides_a, sides_b = sides_a[:n], sides_b[:n]
    ia = np.repeat(np.arange(n), [len(s) for s in sides_a])
    va = np.array([v for s in sides_a for v in s], dtype=np.uint64)
    ib = np.repeat(np.arange(n), [len(s) for s in sides_b])
    vb = np.array([v for s in sides_b for v in s], dtype=np.uint64)
    got = _set_jaccard_many(ia, va, ib, vb, n)
    for p in range(n):
        sa, sb = frozenset(sides_a[p]), frozenset(sides_b[p])
        u = len(sa | sb)
        expect = (len(sa & sb) / u) if u else 1.0
        assert got[p] == expect


@given(st.lists(st.tuples(st.integers(0, 2),            # key
                          st.integers(0, 40),           # bucket step
                          st.booleans()),               # mask flag
                min_size=1, max_size=40),
       st.integers(0, 5))
@settings(deadline=None)
def test_duration_alarms_matches_naive_scan(rows, dur_units):
    """Vectorized streak gate == a direct per-row reference scan."""
    import pandas as pd

    from flink_fingerprint_ray.functions.rules import duration_alarms

    STEP = 10_000
    # build per-key increasing ts from the step deltas
    recs = []
    next_ts = {}
    for k, d, flag in rows:
        # d == 0 produces duplicate timestamps within a key, exercising
        # the reference's zero-delta → row_duration fallback
        t = next_ts.get(k, 0) + d * STEP
        next_ts[k] = t
        recs.append((k, t, 1.0 if flag else 0.0))
    df = pd.DataFrame(recs, columns=["k", "ts", "x"])
    dur_ms = dur_units * 3 * STEP
    rules = [{"id": "r", "logic": "AND", "checks": [
        {"param": "x", "op": ">", "value": 0.5, "duration_s": dur_ms // 1000}]}]
    out = duration_alarms(df, rules, ["k"], "ts", STEP)
    got = sorted(zip(out["k"], out["ts"]))

    # naive reference: reference-style per-key scan (process_odr.py:269-303)
    expect = []
    for k, g in df.sort_values(["k", "ts"], kind="stable").groupby("k"):
        streak, triggered, prev = 0.0, False, None
        for _, row in g.iterrows():
            step = STEP if prev is None else row["ts"] - prev
            if step <= 0:  # duplicate ts: reference coerces to cadence
                step = STEP
            prev = row["ts"]
            if row["x"] <= 0.5:
                streak, triggered = 0.0, False
                continue
            streak += step
            if dur_ms <= 0:
                if not triggered:
                    expect.append((k, int(row["ts"])))
                    triggered = True
            elif not triggered and streak >= dur_ms:
                expect.append((k, int(row["ts"])))
                triggered = True
    assert got == sorted(expect)


@settings(deadline=None)
@given(st.lists(st.floats(-100, 100), min_size=3, max_size=60),
       st.floats(0.05, 1.0))
def test_lowess_constant_and_linear_exact(vals, frac):
    from flink_fingerprint_ray.functions.smooth import lowess_smooth

    n = len(vals)
    const = np.full(n, float(vals[0]))
    assert np.allclose(lowess_smooth(const, frac=frac), const, atol=1e-9)
    # exact linear data: a locally-weighted LINEAR fit reproduces it
    line = 0.75 * np.arange(n) - 3.0
    assert np.allclose(lowess_smooth(line, frac=frac), line, atol=1e-6)


# -- round-3 kernel properties ---------------------------------------------

uint64s = st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=200)


@given(uint64s)
def test_clz_rank_matches_python_reference(vals):
    from flink_fingerprint_ray.stages.sketch import HLL_P, _clz_rank

    w = np.array(vals, dtype=np.uint64)
    width = 64 - HLL_P
    got = _clz_rank(w, width)
    for v, g in zip(vals, got.tolist()):
        # leading zeros of the 64-bit word, capped at the suffix width
        expect = min(64 - v.bit_length() + 1 if v else width + 1, width + 1)
        assert g == expect


@given(uint64s)
def test_hll_fold_merge_associative(vals):
    from flink_fingerprint_ray.stages.sketch import hll_fold

    h = np.array(vals, dtype=np.uint64)
    cut = len(h) // 2
    one = hll_fold(h)
    merged = np.maximum(hll_fold(h[:cut]), hll_fold(h[cut:]))
    assert np.array_equal(one, merged)


@given(st.lists(st.integers(0, 2**62), min_size=1, max_size=300))
def test_bloom_has_no_false_negatives(keys):
    from flink_fingerprint_ray.pipelines.queries import _BLOOM_BITS, _bloom_hashes

    k = np.unique(np.array(keys, dtype=np.int64))
    bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    pos = _bloom_hashes(k).ravel()
    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    probe = _bloom_hashes(k)
    member = ((bits[probe >> 3] >> (probe & 7).astype(np.uint8)) & 1).all(axis=1)
    assert member.all()


@given(st.lists(st.integers(0, 50), min_size=10, max_size=500),
       st.floats(0.01, 0.3))
@settings(deadline=None, max_examples=25)
def test_block_local_candidates_complete(vals, phi):
    """The averaging-argument candidate rule: every globally phi-heavy key
    is locally phi-heavy in at least one block, for ANY block split."""
    import pandas as pd

    v = np.array(vals, dtype=np.int64)
    vc = pd.Series(v).value_counts()
    heavy = set(vc[vc >= phi * len(v)].index)
    cut = len(v) // 2
    cands = set()
    for blk in (v[:cut], v[cut:]):
        if len(blk) == 0:
            continue
        bc = pd.Series(blk).value_counts()
        cands |= set(bc[bc >= phi * len(blk)].index)
    assert heavy <= cands


@given(st.lists(st.tuples(st.integers(0, 2),      # band_no
                          st.integers(0, 5),      # band_key
                          st.integers(0, 30),     # id
                          st.integers(0, 3)),     # eq (full-hash group)
                min_size=1, max_size=80))
@settings(deadline=None, max_examples=60)
def test_bucket_candidates_all_pairs_semantics(rows):
    """The LSH sweep prologue: with eq=None it must emit EXACTLY the set
    of unique intra-bucket id pairs; with an eq column it may collapse
    identical-hash groups but must keep every bucket's id set fully
    connected if all pairs confirm (the clustering-equivalence
    guarantee)."""
    import itertools

    import pandas as pd

    from flink_fingerprint_ray.stages.dedup import _bucket_candidates

    df = pd.DataFrame(rows, columns=["band_no", "band_key", "doc_id", "eqv"]) \
        .drop_duplicates(["band_no", "band_key", "doc_id"])
    t = pa.table({"band_no": pa.array(df["band_no"], pa.int64()),
                  "band_key": pa.array(df["band_key"], pa.uint64()),
                  "doc_id": pa.array(df["doc_id"], pa.int64()),
                  "eqv": pa.array(df["eqv"], pa.uint64())})

    def expected_pairs():
        out = set()
        for _, g in df.groupby(["band_no", "band_key"]):
            for a, b in itertools.combinations(sorted(set(g["doc_id"])), 2):
                out.add((a, b))
        return out

    exp = expected_pairs()
    # eq=None: exact all-pairs
    pre = _bucket_candidates(t, "doc_id")
    got = set()
    if pre is not None:
        ts, anc, cand = pre
        ids = ts["doc_id"].to_numpy()
        got = {tuple(sorted((int(ids[a]), int(ids[c]))))
               for a, c in zip(anc, cand)}
    assert got == exp

    # with eq: returned pairs are a subset of all-pairs whose transitive
    # closure still connects every bucket's id set
    pre2 = _bucket_candidates(t, "doc_id", eq=[t["eqv"].to_numpy()])
    got2 = set()
    if pre2 is not None:
        ts2, anc2, cand2 = pre2
        ids2 = ts2["doc_id"].to_numpy()
        got2 = {tuple(sorted((int(ids2[a]), int(ids2[c]))))
                for a, c in zip(anc2, cand2)}
    assert got2 <= exp
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in got2:
        parent[find(a)] = find(b)
    for _, g in df.groupby(["band_no", "band_key"]):
        members = sorted(set(g["doc_id"]))
        assert len({find(m) for m in members}) == 1 or len(members) == 1


@given(st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
                min_size=0, max_size=60),
       st.integers(26, 40))
@settings(deadline=None, max_examples=60)
def test_label_propagation_matches_union_find(edge_list, n_nodes):
    """The check queries' independent clustering (dense min-label
    propagation) must agree row-exactly with the engine's union-find on
    arbitrary graphs — if these two ever correlate-fail, the pinned
    mismatch counts would lie."""
    import pandas as pd

    from flink_fingerprint_ray.stages.dedup import (
        _ref_label_propagation, edges_to_clusters)

    nodes = np.arange(n_nodes, dtype=np.int64)
    e = np.array([(min(a, b), max(a, b)) for a, b in edge_list if a != b],
                 dtype=np.int64).reshape(-1, 2)
    got = _ref_label_propagation(e, nodes)
    exp = edges_to_clusters(pd.DataFrame({"a": e[:, 0], "b": e[:, 1]}))
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True),
                                  check_dtype=False)


@given(st.lists(st.floats(-1e4, 1e4, allow_nan=False), min_size=2, max_size=400),
       st.sampled_from([0.5, 0.9, 0.99]))
@settings(deadline=None, max_examples=60)
def test_hist_quantile_error_bound(vals, q):
    from flink_fingerprint_ray.stages.sketch import (
        HIST_BINS, hist_fold, hist_quantile)

    v = np.asarray(vals, dtype=np.float64)
    lo, hi = float(v.min()), float(v.max())
    c = hist_fold(v, lo, hi)
    w = (hi - lo) / HIST_BINS or 1.0
    s = np.sort(v)
    exact = s[max(int(np.ceil(q * len(s))), 1) - 1]
    assert abs(hist_quantile(c, lo, hi, q) - exact) <= 2 * w


@given(st.lists(st.tuples(st.integers(0, 8),              # doc_id
                          st.sampled_from("abcdefgh"),    # term
                          st.integers(1, 5)),             # count
                min_size=1, max_size=60))
@settings(deadline=None, max_examples=60)
def test_tfidf_sweeps_match_bruteforce(rows):
    """tfidf_attach_idf + tfidf_top_term_sweep over a whole (doc, term, c)
    table must equal a dict-based reference (df from co-located rows,
    score = c*ln(N/df), per-doc max with term-asc tie-break)."""
    import pandas as pd

    from flink_fingerprint_ray.stages.textops import (
        tfidf_attach_idf, tfidf_top_term_sweep)

    df = pd.DataFrame(rows, columns=["doc_id", "term", "c"]) \
        .groupby(["doc_id", "term"], as_index=False)["c"].sum()
    n_docs = df["doc_id"].nunique()
    t = pa.Table.from_pandas(df, preserve_index=False)
    got = tfidf_top_term_sweep(
        pa.Table.from_pandas(tfidf_attach_idf(t, n_docs), preserve_index=False)
    ).sort_values("doc_id").reset_index(drop=True)

    dfreq = df.groupby("term")["doc_id"].nunique()
    exp_rows = []
    for d, g in df.groupby("doc_id"):
        best = min(
            ((-(r.c * np.log(np.float64(n_docs) / dfreq[r.term])), r.term)
             for r in g.itertuples()),
        )
        exp_rows.append({"doc_id": d, "top_term": best[1],
                         "score_cents": int(np.floor(-best[0] * 100 + 0.5))})
    exp = pd.DataFrame(exp_rows)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# ---------------------------------------------------------------------------
# Round-3b analytics kernels vs naive single-process references
# ---------------------------------------------------------------------------

event_rows = st.lists(
    st.tuples(st.integers(0, 5),                    # user_id
              st.integers(0, 10**7),                # ts_us
              st.sampled_from(["view", "click", "purchase", "error"]),
              st.floats(0, 100, allow_nan=False)),  # value
    min_size=1, max_size=60)


def _events_table(rows):
    import pandas as pd

    df = pd.DataFrame(rows, columns=["user_id", "ts_us", "event_type", "value"])
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    return df


@given(event_rows)
@settings(max_examples=60, deadline=None)
def test_funnel_sweep_matches_naive(rows):
    """Deepest strict-order step equals a per-user linear scan."""
    from flink_fingerprint_ray.pipelines.queries import _funnel_sweep

    df = _events_table(rows)
    got = _funnel_sweep(pa.Table.from_pandas(df[["user_id", "event_type", "ts_us"]]))
    got = dict(zip(got["user_id"], got["funnel_step"]))
    for uid, g in df.groupby("user_id"):
        t1 = g.loc[g.event_type == "view", "ts_us"].min()
        step = 0
        if not np.isnan(t1):
            step = 1
            t2 = g.loc[(g.event_type == "click") & (g.ts_us > t1), "ts_us"].min()
            if not np.isnan(t2):
                step = 2
                t3 = g.loc[(g.event_type == "purchase") & (g.ts_us > t2), "ts_us"].min()
                if not np.isnan(t3):
                    step = 3
        assert got[uid] == step


@given(event_rows)
@settings(max_examples=60, deadline=None)
def test_twa_sweep_matches_naive(rows):
    """Integer num/den pairs equal a per-user ordered scan."""
    from flink_fingerprint_ray.pipelines.queries import _twa_sweep

    df = _events_table(rows)
    got = _twa_sweep(pa.Table.from_pandas(df[["user_id", "ts_us", "value", "event_id"]]))
    got = {r.user_id: (r.twa_num, r.twa_den_us) for r in got.itertuples()}
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        num = den = 0
        ts, vals = g["ts_us"].to_numpy(), g["value"].to_numpy()
        for i in range(len(g) - 1):
            dt = int(ts[i + 1] - ts[i])
            num += int(np.floor(vals[i] * dt + 0.5))
            den += dt
        assert got[uid] == (num, den)


@given(event_rows)
@settings(max_examples=40, deadline=None)
def test_gapfill_sweep_matches_naive(rows):
    """merge_asof forward fill equals a per-user day-by-day scan."""
    from flink_fingerprint_ray.pipelines.queries import _DAY_US, _gapfill_sweep

    df = _events_table(rows)
    d0 = int(df["ts_us"].min() // _DAY_US)
    d1 = int(df["ts_us"].max() // _DAY_US)
    got = _gapfill_sweep(
        pa.Table.from_pandas(df[["user_id", "ts_us", "value", "event_id"]]),
        d0, d1)
    got = {(r.user_id, r.day_ms): r.last_value for r in got.itertuples()}
    want = {}
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        last = None
        by_day = {}
        for r in g.itertuples():
            by_day[r.ts_us // _DAY_US] = r.value
        for d in range(d0, d1 + 1):
            if d in by_day:
                last = by_day[d]
            if last is not None:
                want[(uid, d * 86_400_000)] = last
    assert got == want


@given(st.lists(st.tuples(st.integers(0, 3), st.floats(-50, 50, allow_nan=False)),
                min_size=2, max_size=40))
@settings(max_examples=60, deadline=None)
def test_regr_partials_match_polyfit(rows):
    """Sufficient-statistics slope equals np.polyfit per key (where the
    key has >= 2 distinct x values)."""
    import pandas as pd

    from flink_fingerprint_ray.pipelines.queries import _regr_sweep

    df = pd.DataFrame(rows, columns=["user_id", "y"])
    df["x"] = np.linspace(0.0, 5.0, len(df))
    parts = pd.DataFrame({
        "user_id": df["user_id"], "n": 1, "sx": df["x"], "sy": df["y"],
        "sxx": df["x"] ** 2, "sxy": df["x"] * df["y"],
    }).groupby("user_id", sort=False).sum().reset_index()
    got = _regr_sweep(pa.Table.from_pandas(parts))
    for r in got.itertuples():
        g = df[df.user_id == r.user_id]
        if g["x"].nunique() < 2:
            continue
        slope = np.polyfit(g["x"], g["y"], 1)[0]
        assert abs(r.slope_micros / 1e6 - slope) <= 1e-4 + abs(slope) * 1e-6


@given(st.integers(1, 40), st.integers(1, 8))
@settings(max_examples=80, deadline=None)
def test_ntile_formula_matches_sql_semantics(n, k):
    """First n%k buckets get ceil(n/k) rows, the rest floor(n/k),
    buckets contiguous and 1-based — the SQL NTILE contract."""
    idx0 = np.arange(n)
    q, r = n // k, n % k
    big = (q + 1) * r
    tile = np.where(idx0 < big, idx0 // max(q + 1, 1),
                    r + (idx0 - big) // max(q, 1)) + 1
    sizes = np.bincount(tile)[1:]
    expect = [q + 1] * r + [q] * (min(n, k) - r if q else 0)
    assert list(sizes[sizes > 0]) == [s for s in expect if s > 0]
    assert (np.diff(tile) >= 0).all() and tile[0] == 1


@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 5)),
                min_size=1, max_size=50))
@settings(max_examples=60, deadline=None)
def test_chunk_share_sweep_matches_naive(rows):
    """Partition partials (n_chunks / n_shared) equal a naive scan:
    shared = chunk string present in >= 2 distinct docs."""
    import pandas as pd

    from flink_fingerprint_ray.pipelines.queries import _chunk_share_sweep

    df = pd.DataFrame(rows, columns=["doc_id", "c"])
    df["chunk"] = "c" + df["c"].astype(str)
    got = _chunk_share_sweep(pa.Table.from_pandas(df[["doc_id", "chunk"]]))
    got = {r.doc_id: (r.n_chunks, r.n_shared) for r in got.itertuples()}
    ndocs = df.groupby("chunk")["doc_id"].nunique()
    shared = set(ndocs[ndocs >= 2].index)
    for uid, g in df.groupby("doc_id"):
        n_sh = int(g["chunk"].isin(shared).sum())
        assert got[uid] == (len(g), n_sh)


@given(st.lists(st.tuples(st.integers(0, 5),
                          st.sampled_from(["a", "b", "c"]),
                          st.integers(1, 9)),
                min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_mode_sweep_tie_break_matches_naive(rows):
    """Summed partials + (count desc, type asc) pick equals a naive max."""
    import pandas as pd

    from flink_fingerprint_ray.pipelines.queries import _mode_sweep

    parts = pd.DataFrame(rows, columns=["user_id", "event_type", "n"])
    got = _mode_sweep(pa.Table.from_pandas(parts))
    got = {r.user_id: (r.mode_type, r.n_events) for r in got.itertuples()}
    total = parts.groupby(["user_id", "event_type"])["n"].sum()
    for uid in parts["user_id"].unique():
        g = total[uid]
        best = sorted(g.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[uid] == (best[0], int(best[1]))


@given(st.lists(st.tuples(st.integers(0, 4), st.integers(0, 50)),
                min_size=1, max_size=40),
       st.randoms())
@settings(max_examples=40, deadline=None)
def test_cohort_sweep_row_order_invariant(rows, rnd):
    """Shuffling partition rows never changes the (cohort, offset,
    n_users) partials — required for any Ray block order."""
    import pandas as pd

    from flink_fingerprint_ray.pipelines.queries import _DAY_US, _cohort_sweep

    df = pd.DataFrame(rows, columns=["user_id", "day"])
    df["ts_us"] = df["day"] * _DAY_US + 17
    base = _cohort_sweep(pa.Table.from_pandas(df[["user_id", "ts_us"]]))
    shuf = df.sample(frac=1.0, random_state=rnd.randint(0, 2**31)).reset_index(drop=True)
    other = _cohort_sweep(pa.Table.from_pandas(shuf[["user_id", "ts_us"]]))
    key = ["cohort_day_ms", "offset_days"]
    pd_a = base.sort_values(key).reset_index(drop=True)
    pd_b = other.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(pd_a, pd_b, check_dtype=False)


rolling_rows = st.lists(
    st.tuples(st.integers(0, 3),                    # user_id
              st.integers(0, 8 * 10**9),            # ts_us — spans > 1 hour
              st.floats(0, 100, allow_nan=False)),  # value
    min_size=1, max_size=50)


@given(rolling_rows)
@settings(max_examples=60, deadline=None)
def test_rolling_sweep_matches_naive(rows):
    """RANGE-frame trailing mean equals a per-row O(n^2) frame scan,
    including timestamp peers that sort AFTER the current row (SQL RANGE
    CURRENT ROW includes all ORDER BY peers).  Counts exact; the micros
    value may differ by 1 ulp at the .5 rounding boundary (prefix-sum
    subtraction vs direct sum)."""
    import pandas as pd

    from flink_fingerprint_ray.pipelines.queries import HOUR_US, _rolling_sweep

    df = pd.DataFrame(rows, columns=["user_id", "ts_us", "value"])
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    got = _rolling_sweep(pa.Table.from_pandas(df))
    got = {r.event_id: (r.roll_avg_micros, r.n_in_window) for r in got.itertuples()}
    assert len(got) == len(df)
    for r in df.itertuples():
        frame = df[(df.user_id == r.user_id)
                   & (df.ts_us >= r.ts_us - HOUR_US) & (df.ts_us <= r.ts_us)]
        want = int(np.floor(frame["value"].to_numpy().sum() / len(frame) * 1e6 + 0.5))
        assert got[r.event_id][1] == len(frame)
        assert abs(got[r.event_id][0] - want) <= 1


@given(event_rows)
@settings(max_examples=60, deadline=None)
def test_path_sweep_matches_naive_and_order_invariant(rows):
    """path8 equals the first-8 (ts, event_id)-ordered join per user and
    does not change when input rows are shuffled."""
    import pandas as pd

    from flink_fingerprint_ray.pipelines.queries import PATH_LEN, _path_sweep

    df = _events_table(rows)
    cols = ["user_id", "ts_us", "event_id", "event_type"]
    got = _path_sweep(pa.Table.from_pandas(df[cols]))
    got = dict(zip(got["user_id"], got["path8"]))
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"], kind="stable").head(PATH_LEN)
        assert got[uid] == "->".join(g["event_type"])
    shuf = df.sample(frac=1.0, random_state=7)
    got2 = _path_sweep(pa.Table.from_pandas(shuf[cols]))
    assert dict(zip(got2["user_id"], got2["path8"])) == got


@given(event_rows)
@settings(max_examples=60, deadline=None)
def test_entropy_sweep_matches_naive(rows):
    """Per-user event-type entropy equals a direct Counter computation
    (1-micro tolerance for reduction-order ulp)."""
    import collections
    import math

    import pandas as pd

    from flink_fingerprint_ray.pipelines.queries import _entropy_sweep

    df = _events_table(rows)
    parts = (df.groupby(["user_id", "event_type"], sort=False)
             .size().rename("n").reset_index())
    got = _entropy_sweep(pa.Table.from_pandas(parts))
    got = dict(zip(got["user_id"], got["entropy_micros"]))
    for uid, g in df.groupby("user_id"):
        cnt = collections.Counter(g["event_type"])
        tot = sum(cnt.values())
        ent = sum(-(c / tot) * math.log2(c / tot) for c in cnt.values())
        assert abs(got[uid] - int(np.floor(ent * 1e6 + 0.5))) <= 1


@given(st.lists(st.integers(0, 15), min_size=1, max_size=30),
       st.lists(st.integers(0, 15), min_size=0, max_size=20))
@settings(max_examples=80, deadline=None)
def test_semi_anti_sweeps_partition_customers(cust_keys, order_keys):
    """Semi + anti join sweeps exactly partition the customer side: every
    customer lands in one of the two outputs, keyed by orders membership."""
    import pandas as pd

    from flink_fingerprint_ray.pipelines.queries import (
        _anti_join_sweep,
        _semi_join_sweep,
    )

    cust_keys = list(dict.fromkeys(cust_keys))  # distinct custkeys
    cust = pd.DataFrame({
        "custkey": np.asarray(cust_keys, np.int64),
        "c_mktsegment": [f"SEG{k % 3}" for k in cust_keys],
        "acctbal_cents": np.asarray([k * 101 - 50 for k in cust_keys], np.int64),
        "side": np.zeros(len(cust_keys), np.int64),
    })
    orders = pd.DataFrame({
        "custkey": np.asarray(sorted(set(order_keys)), np.int64),
        "c_mktsegment": "",
        "acctbal_cents": np.int64(0),
        "side": np.int64(1),
    })
    t = pa.Table.from_pandas(pd.concat([cust, orders], ignore_index=True))
    semi = _semi_join_sweep(t).set_index("c_mktsegment")
    anti = _anti_join_sweep(t).set_index("c_mktsegment")
    oset = set(order_keys)
    for seg, g in cust.groupby("c_mktsegment"):
        inside = g[g["custkey"].isin(oset)]
        s_n = int(semi["n_customers"].get(seg, 0))
        a_n = int(anti["n_customers"].get(seg, 0))
        assert s_n == len(inside) and s_n + a_n == len(g)
        assert int(semi["acctbal_cents"].get(seg, 0)) == inside["acctbal_cents"].sum()


@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                min_size=1, max_size=80))
@settings(max_examples=80, deadline=None)
def test_robust_sweep_matches_naive(rows):
    """Median/MAD/winsorized-sum from value-count partials equal a direct
    multiset computation under the quantile_disc rule (ceil(q*n) rank)."""
    import math

    import pandas as pd

    from flink_fingerprint_ray.pipelines.queries import _robust_sweep

    df = pd.DataFrame(rows, columns=["lang", "n_chars"])
    df["lang"] = df["lang"].map(lambda i: f"L{i}")
    parts = (df.groupby(["lang", "n_chars"], sort=False)
             .size().rename("n").reset_index())
    got = _robust_sweep(pa.Table.from_pandas(parts)).set_index("lang")
    for lang, g in df.groupby("lang"):
        x = np.sort(g["n_chars"].to_numpy())
        n = len(x)

        def disc(arr, q):
            return int(np.sort(arr)[max(math.ceil(q * len(arr)), 1) - 1])

        med, lo, hi = disc(x, 0.5), disc(x, 0.05), disc(x, 0.95)
        row = got.loc[lang]
        assert (row["median_chars"], row["p05_chars"], row["p95_chars"]) == (med, lo, hi)
        assert row["mad_chars"] == disc(np.abs(x - med), 0.5)
        assert row["winsorized_sum"] == int(np.clip(x, lo, hi).sum())
        assert row["n_docs"] == n


# ---------------------------------------------------------------------------
# Media codec properties (round 4): PNG is lossless for ARBITRARY pixel
# content and shapes; mu-law decode->encode->decode is a fixpoint; ADPCM
# streams decode to the emitted length for arbitrary sizes.
# ---------------------------------------------------------------------------

img_shapes = st.tuples(st.integers(1, 24), st.integers(1, 24),
                       st.sampled_from([1, 3, 4]))


@given(img_shapes, st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_png_lossless_arbitrary_images(shape, seed):
    from flink_fingerprint_ray.functions.png import decode_png, encode_png

    h, w, ch = shape
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w) if ch == 1 else (h, w, ch)).astype(np.uint8)
    dec = decode_png(encode_png(img))
    assert dec.shape == img.shape and np.array_equal(dec, img)


@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=400))
@settings(max_examples=40, deadline=None)
def test_ulaw_fixpoint_and_sign(pcm):
    from flink_fingerprint_ray.functions.audio_codecs import (
        ulaw_decode,
        ulaw_encode,
    )

    x = np.asarray(pcm, dtype=np.int16)
    once = ulaw_decode(ulaw_encode(x))
    twice = ulaw_decode(ulaw_encode(once))
    assert np.array_equal(once, twice)  # decode∘encode is a projection
    nz = x[np.abs(x.astype(np.int32)) > 64]
    if len(nz):
        rec = ulaw_decode(ulaw_encode(nz))
        assert (np.sign(rec.astype(np.int32))
                == np.sign(nz.astype(np.int32))).all()


@given(st.integers(1, 4000), st.integers(0, 2**31 - 1),
       st.sampled_from([65, 129, 1017]))
@settings(max_examples=30, deadline=None)
def test_adpcm_roundtrip_length_any_size(n, seed, spb):
    from flink_fingerprint_ray.functions.audio_codecs import (
        ima_adpcm_decode,
        ima_adpcm_encode,
    )

    rng = np.random.RandomState(seed)
    pcm = np.clip(np.cumsum(rng.randint(-300, 300, n)), -32768, 32767) \
        .astype(np.int16)
    dec = ima_adpcm_decode(ima_adpcm_encode(pcm, spb), spb)
    # emitted length: blocks emit 1 + nibbles; an even tail block carries
    # one zero pad nibble that decodes to one extra (deterministic) sample
    assert len(dec) in (n, n + 1)
    assert dec[0] == pcm[0]  # block-0 predictor is the first sample


@given(st.tuples(st.integers(1, 24), st.integers(1, 24)),
       st.integers(2, 256), st.booleans(), st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_gif_lossless_arbitrary_palette_images(shape, ncol, interlace, seed):
    from flink_fingerprint_ray.functions.gif import decode_gif, encode_gif

    rng = np.random.RandomState(seed)
    idx = rng.randint(0, ncol, shape).astype(np.uint8)
    pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
    dec = decode_gif(encode_gif(idx, pal, interlace=interlace))
    assert dec.shape == shape + (3,) and np.array_equal(dec, pal[idx])


@given(st.integers(1, 9), st.integers(0, 2**31 - 1))
@settings(max_examples=20, deadline=None)
def test_gif_animation_frame_count_and_content(n_frames, seed):
    from flink_fingerprint_ray.functions.gif import (
        decode_gif_frames,
        encode_gif_animation,
        gif_n_frames,
    )

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    frames = [rng.randint(0, 16, (11, 13)).astype(np.uint8)
              for _ in range(n_frames)]
    data = encode_gif_animation(frames, pal)
    assert gif_n_frames(data) == n_frames
    dec = decode_gif_frames(data)
    assert all(np.array_equal(d, pal[f]) for f, d in zip(frames, dec))


# --- URL canonicalization vs an independent urllib-based reference -------

def _canon_reference(url: str) -> tuple[str, str]:
    """Independent single-URL reference built on stdlib urllib.parse:
    same normalization rules as functions/url.py, different machinery."""
    from urllib.parse import urlsplit

    sp = urlsplit(url)
    scheme = sp.scheme.lower()
    host = (sp.hostname or "").lower()
    port = ""
    if sp.port is not None and not (
            (scheme == "http" and sp.port == 80)
            or (scheme == "https" and sp.port == 443)):
        port = f":{sp.port}"
    # RFC 3986 §5.2.4 remove_dot_segments
    out: list[str] = []
    path = sp.path or "/"
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    if path.endswith(("/.", "/..")) or path.endswith("/"):
        if out and out[-1] != "":
            out.append("")
    npath = "/".join(out)
    if not npath.startswith("/"):
        npath = "/" + npath
    params = [p for p in (sp.query or "").split("&")
              if p and not p.startswith("utm_")
              and p.split("=")[0] not in ("fbclid", "gclid", "ref")]
    q = "&".join(sorted(params))
    canon = scheme + "://" + host + port + npath + (("?" + q) if q else "")
    surt_host = host[4:] if host.startswith("www.") else host
    surt = ",".join(reversed(surt_host.split("."))) + ")" + npath \
        + (("?" + q) if q else "")
    return canon, surt


_seg = st.text(alphabet="abcz09-_", min_size=1, max_size=5)
_urls = st.builds(
    lambda scheme, host_parts, www, port, segs, dots, params, frag: (
        scheme + "://" + ("WWW." if www else "") + ".".join(host_parts)
        + port
        + "".join(
            "/" + (d if d else s)
            for s, d in zip(segs, dots + [""] * (len(segs) - len(dots))))
        + (("?" + "&".join(params)) if params else "")
        + (("#f" + frag) if frag else "")),
    st.sampled_from(["http", "HTTP", "https", "HTTPS", "hTtPs"]),
    st.lists(_seg, min_size=2, max_size=3),
    st.booleans(),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.lists(_seg, min_size=0, max_size=4),
    st.lists(st.sampled_from(["", ".", ".."]), min_size=0, max_size=2),
    st.lists(st.sampled_from(
        ["a=1", "b=2", "id=9", "utm_source=x", "fbclid=z", "ref=h", "z="]),
        min_size=0, max_size=4, unique=True),
    st.sampled_from(["", "1", "rag"]),
)


@given(st.lists(_urls, min_size=1, max_size=25))
@settings(max_examples=60, deadline=None)
def test_url_canonicalize_matches_urllib_reference(urls):
    from flink_fingerprint_ray.functions.url import canonicalize_batch

    out = canonicalize_batch(pa.table({"url": pa.array(urls)})).to_pylist()
    for row, url in zip(out, urls):
        canon, surt = _canon_reference(url)
        assert row["canon_url"] == canon, url
        assert row["surt_key"] == surt, url


# --- general HTML extraction vs an independent html.parser reference ------

def _extract_reference(docs: list[str]) -> list[str]:
    """Independent reference extractor on stdlib html.parser (event-based
    tokenizer vs the engine's regex grammar)."""
    import re
    from html.parser import HTMLParser

    BLOCK = {"p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
             "h1", "h2", "nav", "footer", "header", "blockquote", "pre"}
    SKIP = {"script", "style", "noscript", "template", "head", "title"}

    class Ref(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self.skip_depth = 0

        def handle_starttag(self, tag, attrs):
            if tag in SKIP:
                self.skip_depth += 1
            elif tag in BLOCK:
                self.parts.append("\n")

        def handle_endtag(self, tag):
            if tag in SKIP:
                self.skip_depth = max(0, self.skip_depth - 1)
            elif tag in BLOCK:
                self.parts.append("\n")

        def handle_data(self, data):
            if not self.skip_depth:
                self.parts.append(data)

    out = []
    for d in docs:
        p = Ref()
        p.feed(d)
        p.close()
        s = "".join(p.parts)
        s = s.replace("\xa0", " ")  # engine maps &nbsp; to plain space
        s = re.sub(r"[\t\r\f\v]", " ", s)
        s = re.sub(r" {2,}", " ", s)
        s = re.sub(r" ?\n ?", "\n", s)
        s = re.sub(r"\n+", "\n", s)
        out.append(s.strip(" \n"))
    return out


_words = st.text(alphabet="abcz XYZ09.,!", min_size=0, max_size=12)
_entity = st.sampled_from(["&amp;", "&lt;", "&gt;", "&quot;", "&copy;",
                           "&nbsp;", "&#65;", "&#x42;", "&hellip;"])
_textnode = st.builds(lambda a, e, b: a + e + b, _words, _entity, _words) | _words
_attr = st.sampled_from(["", ' class="x"', ' data-q="a>b"', " id='7'",
                         ' href="https://h/p"'])


def _el(children):
    inline = st.builds(lambda t, a, c: f"<{t}{a}>{c}</{t}>",
                       st.sampled_from(["span", "b", "i", "a", "em"]),
                       _attr, children)
    block = st.builds(lambda t, a, c: f"<{t}{a}>{c}</{t}>",
                      st.sampled_from(["p", "div", "li", "td", "h1", "nav"]),
                      _attr, children)
    comment = st.builds(lambda c: f"<!-- {c} <p>fake</p> -->", _words)
    script = st.builds(lambda c: f"<script>if(a<b&&c>d){{x=\"{c}\";}}</script>",
                       _words)
    return inline | block | comment | script


_html_doc = st.recursive(
    _textnode,
    lambda kids: st.builds(lambda parts: "".join(parts),
                           st.lists(_el(kids) | _textnode, max_size=4)),
    max_leaves=12,
)


@given(st.lists(_html_doc, min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_html_extract_general_matches_htmlparser_reference(docs):
    from flink_fingerprint_ray.functions.html import extract_text_general

    got = extract_text_general(pa.array(docs, pa.string())).to_pylist()
    want = _extract_reference(docs)
    assert got == want, docs


@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=200),
       st.integers(1, 5), st.integers(1, 4))
@settings(max_examples=80, deadline=None)
def test_cumulate_slices_match_bruteforce(ts_list, step_k, n_slices):
    """Every row lands in exactly the CUMULATE slices whose end lies
    strictly after it, within its max-span window — checked row by row
    against the definition."""
    from flink_fingerprint_ray.stages.windows import cumulate_window_slices

    step = step_k * 100
    mx = step * n_slices
    ts = np.asarray(ts_list, dtype=np.int64)
    take, starts, ends = cumulate_window_slices(ts, step, mx)
    got = set(zip(take.tolist(), starts.tolist(), ends.tolist()))
    want = set()
    for i, t in enumerate(ts_list):
        s = (t // mx) * mx
        for k in range(1, n_slices + 1):
            if s + k * step > t:
                want.add((i, s, s + k * step))
    assert got == want
    # one emission per (row, slice): no duplicates
    assert len(take) == len(want)


@given(
    st.lists(  # per key: a sequence of (dup, doc) window values
        st.tuples(st.integers(0, 3), st.integers(1, 6)),
        min_size=1, max_size=24),
    st.lists(st.tuples(
        st.sampled_from(["", "doc_count"]),
        st.sampled_from(["==", "!=", ">", ">=", "<", "<="]),
        st.integers(0, 4)), min_size=1, max_size=4),
    st.lists(st.integers(1, 6), min_size=1, max_size=5),
    st.integers(2, 3),
)
@settings(max_examples=120, deadline=None)
def test_cep_epoch_split_matches_global_bruteforce(seq, preds, cuts, n_keys):
    """The alert actor's CEP scan, fed the same per-key window stream in
    ARBITRARY epoch slices, must emit exactly the brute-force global
    matches — the cross-epoch tail state cannot lose or duplicate a
    match."""
    import pandas as pd

    from flink_fingerprint_ray.state.store import _CEP_OPS, AlertStateActor

    pattern = tuple(f"{c}{op}{v}" for c, op, v in preds)
    R = len(pattern)
    # build the global closed-window stream: n_keys interleaved hosts,
    # each seeing the same seq (keys are independent streams)
    rows = []
    for ki in range(n_keys):
        for wi, (dup, doc) in enumerate(seq):
            rows.append({
                "key_lang": "en", "key_host": f"h{ki}",
                "window_kind": "tumbling",
                "window_start": wi * 100, "window_end": wi * 100 + 100,
                "dup_cluster_count": dup, "doc_count": doc,
                "exact_dup_count": 0, "near_dup_count": 0,
            })
    df = pd.DataFrame(rows).sort_values(
        ["key_host", "window_start"], kind="stable").reset_index(drop=True)

    # brute force per key over the global stream
    want = set()
    for ki in range(n_keys):
        for end in range(R - 1, len(seq)):
            vals = seq[end - R + 1:end + 1]
            okm = all(
                _CEP_OPS[op]((v[1] if c == "doc_count" else v[0]), cv)
                for (c, op, cv), v in zip(preds, vals))
            if okm:
                want.add((f"h{ki}", (end - R + 1) * 100, end * 100))

    # engine: feed in arbitrary epoch slices (cuts normalized to bounds)
    actor = AlertStateActor.__ray_metadata__.modified_class(0, pattern)
    bounds = sorted({min(c * len(seq) // 6, len(seq)) for c in cuts})
    bounds = [0] + [b for b in bounds if 0 < b < len(seq)] + [len(seq)]
    got = set()
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        # an epoch closes windows [lo, hi) for EVERY key
        chunk = df[(df["window_start"] >= lo * 100)
                   & (df["window_start"] < hi * 100)]
        _, out = actor.feed(pa.Table.from_pandas(chunk, preserve_index=False))
        for r in out.to_pylist():
            got.add((r["key_host"], r["match_start"], r["window_start"]))
    assert got == want


@given(st.lists(st.tuples(st.sampled_from(["en", "de", "fr"]),
                          st.text(alphabet="abcxyz.", min_size=1, max_size=10),
                          st.sampled_from(["tumbling", "sliding", "session",
                                           "cumulate"])),
                min_size=1, max_size=40),
       st.integers(2, 9))
@settings(max_examples=60, deadline=None)
def test_rescale_key_hash_agrees_with_alert_split(rows, n_parts):
    """Savepoint rescaling re-owns alert/CEP state keys by hashing the
    stored key's lang\\x1fhost prefix — that MUST equal the partition
    split_alert_rows assigns the same key's rows, or a rescaled resume
    would consult the wrong actor's state."""
    import pandas as pd

    from flink_fingerprint_ray.state.store import _ALERT_SEP, split_alert_rows

    block = pa.table({
        "key_lang": pa.array([r[0] for r in rows]),
        "key_host": pa.array([r[1] for r in rows]),
        "window_kind": pa.array([r[2] for r in rows]),
        "window_start": pa.array([0] * len(rows), pa.int64()),
        "window_end": pa.array([1] * len(rows), pa.int64()),
        "dup_cluster_count": pa.array([0] * len(rows), pa.int64()),
    })
    parts = split_alert_rows._function(block, n_parts)
    route = {}
    for p, t in enumerate(parts):
        if t is None:
            continue
        for r in t.to_pylist():
            route[(r["key_lang"], r["key_host"])] = p
    # the rescale-side rule: hash of the stored key's lang\x1fhost prefix
    for (lang, host, kind) in rows:
        key = lang + _ALERT_SEP + host + _ALERT_SEP + kind
        prefix = np.array([key.rsplit(_ALERT_SEP, 1)[0]], dtype=object)
        # % np.uint64(n), as both product paths do — a bare python-int
        # modulus silently promotes uint64 hashes to float64 and corrupts
        # the low bits (this test exists to catch exactly that class of
        # drift between the two ownership computations)
        p = int(pd.util.hash_array(prefix, categorize=False)[0]
                % np.uint64(n_parts))
        assert p == route[(lang, host)]


@given(st.lists(st.integers(0, 300), min_size=1, max_size=120))
@settings(deadline=None)
def test_next_fit_shard_matches_naive(weights):
    """The searchsorted bin-by-bin packing kernel (pipelines/queries.py
    _next_fit_shard) must agree with a doc-at-a-time next-fit loop for
    arbitrary weights — incl. oversized docs (> PACK_CTX alone in a
    bin), exact fills (close at fill == C), and zero-weight docs."""
    from flink_fingerprint_ray.pipelines.queries import (
        PACK_CTX,
        _next_fit_shard,
    )

    w = np.asarray(weights, np.int64)
    bin_id, off = _next_fit_shard(w)
    fill, b, exp_bin, exp_off = 0, 0, [], []
    for x in w.tolist():
        if fill and fill + x > PACK_CTX:  # lazy close: only a nonempty
            b += 1                        # bin closes
            fill = 0
        exp_bin.append(b)
        exp_off.append(fill)
        fill += x
    assert bin_id.tolist() == exp_bin
    assert off.tolist() == exp_off
    # invariants: bins nondecreasing; a bin's real content fits unless
    # it contains an oversized doc (which admits only zero-weight peers)
    assert (np.diff(bin_id) >= 0).all()
    for bb in np.unique(bin_id):
        m = bin_id == bb
        assert w[m].sum() <= PACK_CTX or w[m].max() > PACK_CTX


@given(st.lists(st.integers(0, 500), min_size=1, max_size=200),
       st.integers(1, 16))
@settings(deadline=None)
def test_pack_carry_algebra_matches_global_cumsum(weights, span):
    """The distributed prefix-sum algebra of pack_contexts: per-range
    totals -> driver exclusive scan -> per-range local exclusive cumsum
    + carry must reproduce the global exclusive cumsum for ANY range
    span (the output is span-independent — the knob only repartitions)."""
    w = np.asarray(weights, np.int64)
    ids = np.arange(len(w))
    rng = ids // span
    # driver side: range totals in range order, exclusive scan
    uniq = np.unique(rng)
    totals = np.array([w[rng == r].sum() for r in uniq], np.int64)
    offs = np.zeros(len(uniq), np.int64)
    np.cumsum(totals[:-1], out=offs[1:])
    # partition side: local exclusive cumsum + carry (rng nondecreasing)
    cum = np.cumsum(w) - w
    starts = np.flatnonzero(np.diff(rng, prepend=rng[0] - 1))
    base = np.repeat(cum[starts], np.diff(np.append(starts, len(rng))))
    start_tok = offs[np.searchsorted(uniq, rng)] + (cum - base)
    assert start_tok.tolist() == (np.cumsum(w) - w).tolist()


@given(
    st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 3, 4]),
    st.booleans(), st.booleans(), st.booleans(),
    st.sampled_from([0, 3, 8]), st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_webp_roundtrip_property(h, w, ch, pred, sg, lz, cache, seed):
    """VP8L losslessness holds for ARBITRARY small images across the
    whole encoder flag lattice (transform combos x cache x LZ77)."""
    from flink_fingerprint_ray.functions.webp import decode_webp, encode_webp

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, ch), dtype=np.uint8) if ch > 1 else \
        rng.randint(0, 256, (h, w), dtype=np.uint8)
    dec = decode_webp(encode_webp(
        img, predictor=pred, subtract_green=sg, lz77=lz, cache_bits=cache))
    img3 = img if img.ndim == 3 else np.stack([img] * 3, axis=-1)
    want = img3 if img3.shape[-1] == 4 else np.concatenate(
        [img3, np.full(img3.shape[:2] + (1,), 255, np.uint8)], axis=-1)
    assert np.array_equal(dec, want)


@given(st.integers(1, 200), st.integers(1, 10), st.integers(1, 10),
       st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_webp_palette_roundtrip_property(ncol, h, w, seed):
    from flink_fingerprint_ray.functions.webp import decode_webp, encode_webp

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncol, 3), dtype=np.uint8)
    img = pal[rng.randint(0, ncol, (h, w))]
    dec = decode_webp(encode_webp(img, palette="always"))
    assert np.array_equal(dec[..., :3], img)
