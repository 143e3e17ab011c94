"""Driver-contract query registry: every implemented operator/pipeline from
SURVEY.md §2 as a ``name -> callable(sf_dir)`` plus (where SQL-expressible)
a DuckDB oracle with IDENTICAL column names, so the driver's row-count /
schema / value-hash comparison is meaningful.

Float policy (SURVEY.md §7.4.1): any column whose value involves a
non-trivial float reduction is emitted as a micros/cents-scaled int64 via
``floor(x*scale + 0.5)`` — computed with the same formula on both sides,
which sidesteps round-half-even (numpy) vs round-half-away (DuckDB) drift
and absorbs reduction-order ulp noise.  Raw parquet doubles (min/max,
untouched values) pass through exactly.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..fixtures import BASE_TS_MS, pages_from_documents
from ..functions import fingerprint as fp
from ..functions.exprs import DerivedColumnStage
from ..stages import dedup as dd
from ..stages import semantic as sm
from ..stages import similarity as sim
from ..stages.shuffle import arrow_refs, grouped_map
from ..stages.textops import LangIdStage
from ..stages.windows import sliding_window_starts, tumbling_window_start

MIN_60S = 60_000
SLIDE_5M = 300_000
SESSION_GAP_MS = 1_800_000


def _combine_partials(t: pa.Table, keys: list[str], sums: list[str],
                      mins: list[str] = (), maxs: list[str] = ()) -> pd.DataFrame:
    """Final combine of per-block partial aggregates — vectorized pandas
    groupby over one hash partition (all rows of a key are co-located by
    ``grouped_map``).  Replaces ``groupby().aggregate()``, whose
    sort-based shuffle adds whole extra Dataset executions for the
    (already tiny) combiner input."""
    df = t.to_pandas()
    agg = {c: "sum" for c in sums}
    agg.update({c: "min" for c in mins})
    agg.update({c: "max" for c in maxs})
    return df.groupby(list(keys), sort=False).agg(agg).reset_index()


def _read(sf_dir: str, name: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _cents(x: np.ndarray | float) -> np.ndarray:
    return np.floor(np.asarray(x, dtype=np.float64) * 100.0 + 0.5).astype(np.int64)


def _micros(x: np.ndarray | float) -> np.ndarray:
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# Event-time windows over `events` (streaming semantics, SURVEY §2.9)
# ---------------------------------------------------------------------------

def q_tumbling_stats(sf_dir: str):
    """A1 analog: keyed tumbling 1-min windows with decomposable aggs done
    as a PARTIAL pre-aggregate inside map_batches, then a small groupby —
    the shuffle moves one row per (key, window) per block, not per event."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        tms = batch["ts"].cast(pa.int64()).to_numpy() // 1000  # us -> ms
        ws = tumbling_window_start(tms, MIN_60S)
        df = pd.DataFrame({"event_type": batch["event_type"].to_pandas(),
                           "window_start": ws, "value": batch["value"].to_numpy()})
        g = df.groupby(["event_type", "window_start"], sort=False)["value"]
        out = g.agg(n_events="size", sum_value="sum", min_value="min", max_value="max").reset_index()
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow")
    final = grouped_map(
        parts, ["event_type", "window_start"], _combine_partials,
        fn_kwargs={"keys": ["event_type", "window_start"],
                   "sums": ["n_events", "sum_value"],
                   "mins": ["min_value"], "maxs": ["max_value"]},
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": batch["window_start"].cast(pa.int64()),
            "n_events": batch["n_events"].cast(pa.int64()),
            "sum_value_cents": pa.array(_cents(batch["sum_value"].to_numpy()), pa.int64()),
            "min_value": batch["min_value"],
            "max_value": batch["max_value"],
        })

    return final.map_batches(finish, batch_format="pyarrow")


SQL_TUMBLING_STATS = """
SELECT event_type,
       (epoch_ms(ts) // 60000) * 60000 AS window_start,
       COUNT(*) AS n_events,
       CAST(floor(SUM(value) * 100 + 0.5) AS BIGINT) AS sum_value_cents,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY 1, 2
"""


def q_sliding_counts(sf_dir: str):
    """Sliding windows (10 min size, 5 min slide): row explode in
    map_batches, then count per (key, window)."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def explode(batch: pa.Table) -> pd.DataFrame:
        tms = batch["ts"].cast(pa.int64()).to_numpy() // 1000  # us -> ms
        take, starts = sliding_window_starts(tms, 2 * SLIDE_5M, SLIDE_5M)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas().to_numpy()[take],
            "window_start": starts,
        })
        return df.groupby(["event_type", "window_start"], sort=False).size().rename("n_events").reset_index()

    parts = ds.map_batches(explode, batch_format="pyarrow")
    return grouped_map(
        parts, ["event_type", "window_start"], _combine_partials,
        fn_kwargs={"keys": ["event_type", "window_start"], "sums": ["n_events"]},
    )


SQL_SLIDING_COUNTS = """
SELECT event_type,
       (epoch_ms(ts) // 300000) * 300000 - off AS window_start,
       COUNT(*) AS n_events
FROM events CROSS JOIN (SELECT unnest([0, 300000]) AS off) o
GROUP BY 1, 2
"""


def _session_sweep(t: pa.Table) -> pd.DataFrame:
    """Vectorized session assignment across ALL users in one partition:
    sort by (user, ts, event_id), break on user change OR gap > threshold,
    then one groupby over global session ids (the T2/A6 session-state
    pattern, batch form — no per-key UDF dispatch)."""
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"], kind="stable")
    uid = df["user_id"].to_numpy()
    tms = df["ts"].astype("datetime64[ms]").astype("int64").to_numpy()
    brk = np.ones(len(df), dtype=bool)
    brk[1:] = (uid[1:] != uid[:-1]) | (tms[1:] - tms[:-1] > SESSION_GAP_MS)
    sid = np.cumsum(brk)
    g = pd.DataFrame({"user_id": uid, "tms": tms, "sid": sid}).groupby("sid", sort=False)
    return pd.DataFrame({
        "user_id": g["user_id"].first(),
        "session_start": g["tms"].min().astype(np.int64),
        "session_end": g["tms"].max().astype(np.int64),
        "n_events": g.size().astype(np.int64),
    }).reset_index(drop=True)


def q_session_windows(sf_dir: str):
    """Session windows per user (30-min gap): hash-partition by user, one
    vectorized sorted sweep per partition."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_id"])
    return grouped_map(ds, ["user_id"], _session_sweep)


SQL_SESSION_WINDOWS = """
WITH s AS (
  SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events
), o AS (
  SELECT user_id, tms,
         CASE WHEN tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) > 1800000
              THEN 1 ELSE 0 END AS brk,
         event_id
  FROM s
), g AS (
  SELECT user_id, tms,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY tms, event_id ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, MIN(tms) AS session_start, MAX(tms) AS session_end, COUNT(*) AS n_events
FROM g GROUP BY user_id, sid
"""


def q_resample_5min(sf_dir: str):
    """A3 analog: global 5-min resample buckets (pre-aggregated per block)."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        tms = batch["ts"].cast(pa.int64()).to_numpy() // 1000  # us -> ms
        b = (tms // SLIDE_5M) * SLIDE_5M
        df = pd.DataFrame({"bucket": b, "value": batch["value"].to_numpy()})
        return df.groupby("bucket")["value"].agg(n_events="size", sum_value="sum").reset_index()

    parts = ds.map_batches(partial, batch_format="pyarrow")
    final = grouped_map(
        parts, ["bucket"], _combine_partials,
        fn_kwargs={"keys": ["bucket"], "sums": ["n_events", "sum_value"]},
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": batch["bucket"].cast(pa.int64()),
            "n_events": batch["n_events"].cast(pa.int64()),
            "sum_value_cents": pa.array(_cents(batch["sum_value"].to_numpy()), pa.int64()),
        })

    return final.map_batches(finish, batch_format="pyarrow")


SQL_RESAMPLE_5MIN = """
SELECT (epoch_ms(ts) // 300000) * 300000 AS bucket,
       COUNT(*) AS n_events,
       CAST(floor(SUM(value) * 100 + 0.5) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1
"""


RISING_THRESHOLD = 150.0


def _rising_sweep(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"], kind="stable")
    uid = df["user_id"].to_numpy()
    cond = df["value"].to_numpy() > RISING_THRESHOLD
    prev = np.concatenate(([False], cond[:-1]))
    new_user = np.ones(len(df), dtype=bool)
    new_user[1:] = uid[1:] != uid[:-1]
    prev[new_user] = False
    rising = (cond & ~prev).astype(np.int64)
    out = pd.DataFrame({"user_id": uid, "n_rising": rising})
    return out.groupby("user_id", sort=False)["n_rising"].sum().reset_index()


def q_rising_edges(sf_dir: str):
    """T3 analog: per-user rising-edge count of (value > threshold) —
    False→True transitions in (ts, event_id) order, vectorized across all
    users of a hash partition in one sorted sweep."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_id", "value"])
    return grouped_map(ds, ["user_id"], _rising_sweep)


SQL_RISING_EDGES = """
WITH s AS (
  SELECT user_id,
         (value > 150.0) AS c,
         COALESCE(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 150.0, FALSE) AS pc
  FROM events
)
SELECT user_id, CAST(SUM(CASE WHEN c AND NOT pc THEN 1 ELSE 0 END) AS BIGINT) AS n_rising
FROM s GROUP BY user_id
"""


STREAK_THRESHOLD = 100.0


def _streak_sweep(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"], kind="stable")
    uid = df["user_id"].to_numpy()
    tms = df["ts"].astype("datetime64[ms]").astype("int64").to_numpy()
    cond = df["value"].to_numpy() > STREAK_THRESHOLD
    new_user = np.ones(len(df), dtype=bool)
    new_user[1:] = uid[1:] != uid[:-1]
    # island id advances on every below-threshold row AND user change, so
    # a streak never spans users
    isl = np.cumsum(~cond | new_user)
    base = pd.DataFrame({"user_id": pd.unique(uid)})
    if cond.any():
        spans = (
            pd.DataFrame({"user_id": uid[cond], "tms": tms[cond], "isl": isl[cond]})
            .groupby("isl", sort=False)
            .agg(user_id=("user_id", "first"), lo=("tms", "min"), hi=("tms", "max"))
        )
        spans["dur"] = spans["hi"] - spans["lo"]
        best = spans.groupby("user_id", sort=False)["dur"].max().reset_index()
        base = base.merge(best, on="user_id", how="left")
        base["max_streak_ms"] = base["dur"].fillna(0).astype(np.int64)
        base = base[["user_id", "max_streak_ms"]]
    else:
        base["max_streak_ms"] = np.int64(0)
    return base


def q_streak_duration(sf_dir: str):
    """A6 analog: per-user longest streak (ms, actual Δt) of value > 100,
    vectorized across users via island ids in one sorted sweep."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_id", "value"])
    return grouped_map(ds, ["user_id"], _streak_sweep)


SQL_STREAK_DURATION = """
WITH s AS (
  SELECT user_id, epoch_ms(ts) AS tms, (value > 100.0) AS c,
         SUM(CASE WHEN value > 100.0 THEN 0 ELSE 1 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS isl
  FROM events
), d AS (
  SELECT user_id, isl, MAX(tms) - MIN(tms) AS dur FROM s WHERE c GROUP BY 1, 2
)
SELECT u.user_id, CAST(COALESCE(MAX(d.dur), 0) AS BIGINT) AS max_streak_ms
FROM (SELECT DISTINCT user_id FROM events) u LEFT JOIN d USING (user_id)
GROUP BY 1
"""


HAMPEL_DELTA = 25.0


def q_hampel_outliers(sf_dir: str):
    """M6 analog: per-key rolling median (window 7, centered) outlier count
    — |value − rolling_median| > Δ."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "event_id", "value"])

    def outliers(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        v = g["value"].reset_index(drop=True)
        med = v.rolling(7, center=True, min_periods=1).median()
        n = int((np.abs(v - med) > HAMPEL_DELTA).sum())
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]], "n_outliers": [n]})

    return ds.groupby("event_type").map_groups(outliers, batch_format="pandas")


SQL_HAMPEL_OUTLIERS = """
WITH m AS (
  SELECT event_type, value,
         median(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS med
  FROM events
)
SELECT event_type, CAST(SUM(CASE WHEN abs(value - med) > 25.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM m GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Fingerprint domain over derived pages (BASELINE.json input shape)
# ---------------------------------------------------------------------------

def _pages_ds(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.from_arrow(pages_from_documents(sf_dir))


def q_fp_extract_parity(sf_dir: str):
    """THE per-row invariant: byte-identical extracted text per url,
    SQL-verified via md5 — extraction runs on the html BINARY column."""
    ds = _pages_ds(sf_dir)

    def extract(batch: pa.Table) -> pa.Table:
        text = fp.extract_text(batch["html"])
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in text.to_pylist()]
        return pa.table({
            "url": batch["url"],
            "n_chars": pc.utf8_length(text).cast(pa.int64()),
            "text_md5": pa.array(md5s, pa.string()),
        })

    return ds.map_batches(extract, batch_format="pyarrow")


SQL_FP_EXTRACT_PARITY = """
SELECT 'https://h' || CAST(doc_id % 20 AS VARCHAR) || '.example.com/d' || CAST(doc_id AS VARCHAR) AS url,
       length(text) AS n_chars,
       md5(text) AS text_md5
FROM documents
"""


def q_fp_tumbling_windows(sf_dir: str):
    """Flagship SQL-checkable slice of the streaming job: html→text
    extraction + (lang, host) keyed tumbling 1-min windows with the
    reference's stats shape (compute_stats analog on text length)."""
    ds = _pages_ds(sf_dir)

    def transform(batch: pa.Table) -> pa.Table:
        text = fp.extract_text(batch["html"])
        tms = batch["warc_ts"].cast(pa.int64()).to_numpy()
        return pa.table({
            "key_lang": batch["lang"],
            "key_host": fp.host_of(batch["url"]).cast(pa.string()),
            "window_start": pa.array(tumbling_window_start(tms, MIN_60S), pa.int64()),
            "text_len": pc.utf8_length(text).cast(pa.int64()),
        })

    def finalize(t: pa.Table) -> pd.DataFrame:
        # vectorized across every (key, window) group of the partition —
        # median is non-decomposable, so all rows of a group are here
        df = t.to_pandas()
        g = df.groupby(["key_lang", "key_host", "window_start"], sort=False)["text_len"]
        out = g.agg(
            doc_count="size", min_len="min", max_len="max",
            median_len="median", sum_len="sum",
        ).reset_index()
        out["doc_count"] = out["doc_count"].astype(np.int64)
        # Float policy (module docstring): medians of ints are halves, so
        # 2*median is exact — emit it as int64 instead of a raw float that
        # canonicalizes differently from DuckDB's median(BIGINT)->DOUBLE.
        out["median_len_x2"] = np.floor(out.pop("median_len") * 2.0 + 0.5).astype(np.int64)
        out["sum_len"] = out["sum_len"].astype(np.int64)
        return out

    fps = ds.map_batches(transform, batch_format="pyarrow")
    return grouped_map(fps, ["key_lang", "key_host", "window_start"], finalize)


SQL_FP_TUMBLING_WINDOWS = """
WITH pages AS (
  SELECT lang AS key_lang,
         'h' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS key_host,
         1700000000000 + doc_id * 1000 AS tms,
         length(text) AS text_len
  FROM documents
)
SELECT key_lang, key_host, (tms // 60000) * 60000 AS window_start,
       COUNT(*) AS doc_count,
       MIN(text_len) AS min_len,
       MAX(text_len) AS max_len,
       CAST(FLOOR(2 * median(text_len) + 0.5) AS BIGINT) AS median_len_x2,
       CAST(SUM(text_len) AS BIGINT) AS sum_len
FROM pages GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Dedup suite over `documents`
# ---------------------------------------------------------------------------

def q_exact_dedup(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dd.exact_dedup(ds, "doc_id")


SQL_EXACT_DEDUP = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups FROM documents GROUP BY text
"""


def _canonical_sweep(t: pa.Table) -> pd.DataFrame:
    """Per text_hash group: the (source, doc_id)-minimal row + group size,
    one lexsort over the partition (no per-group dispatch)."""
    df = t.to_pandas().sort_values(["text_hash", "source", "doc_id"],
                                   kind="stable").reset_index(drop=True)
    h = df["text_hash"].to_numpy()
    starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
    sizes = np.diff(np.r_[starts, len(h)])
    keep = df.iloc[starts]
    return pd.DataFrame({"doc_id": keep["doc_id"].to_numpy(),
                         "source": keep["source"].to_numpy(),
                         "n_dups": sizes.astype(np.int64)})


def q_canonical_docs(sf_dir: str):
    """Canonical-copy selection: exact dedup that keeps the PREFERRED
    copy of each duplicate group (priority = source order, doc_id
    tie-break) instead of blindly the min id — the curation step that
    chooses which of N mirrored copies enters the training set.  Scale
    shape is exact_dedup's: only (hash, id, source) rows shuffle, the
    text never leaves its block."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    narrow = ds.map_batches(
        lambda b: dd.add_text_hash(b).select(["text_hash", "doc_id", "source"]),
        batch_format="pyarrow")
    return grouped_map(narrow, ["text_hash"], _canonical_sweep)


SQL_CANONICAL_DOCS = """
SELECT doc_id, source, n_dups FROM (
  SELECT doc_id, source,
         COUNT(*) OVER (PARTITION BY text) AS n_dups,
         row_number() OVER (PARTITION BY text ORDER BY source, doc_id) AS rn
  FROM documents) WHERE rn = 1
"""


def q_approx_distinct(sf_dir: str):
    """HyperLogLog approximate distinct-text count cross-checked inline
    against the exact distributed count (stages/sketch.py).

    The sketch itself is not SQL-expressible, so the row carries the
    EXACT count (oracle: COUNT(DISTINCT text)) plus a pinned
    ``within_bound`` flag asserting the HLL estimate landed inside the
    p=12 3-sigma error band (±4.9%) — the same pin pattern as the
    dist-CC mismatch checks."""
    import math

    from ..stages import sketch as sk

    ds = _read(sf_dir, "documents", ["text"])
    exact = sk.exact_distinct(ds, "text")
    est = sk.hll_distinct(_read(sf_dir, "documents", ["text"]), "text")
    bound = 3.0 * 1.04 / math.sqrt(sk.HLL_M)
    within = 1 if abs(est - exact) <= bound * max(exact, 1) else 0
    return pd.DataFrame({"exact_distinct": np.array([exact], dtype=np.int64),
                         "within_bound": np.array([within], dtype=np.int64)})


SQL_APPROX_DISTINCT = """
SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct,
       CAST(1 AS BIGINT) AS within_bound
FROM documents
"""


def q_heavy_hitters(sf_dir: str):
    """Exact distributed phi-heavy hitters over events.user_id
    (stages/sketch.py two-pass local-candidates algorithm — the hot-key
    detector behind the streaming window-salting decision)."""
    from ..stages import sketch as sk

    ds = _read(sf_dir, "events", ["user_id"])
    return sk.heavy_hitters(ds, "user_id", phi=0.008)


SQL_HEAVY_HITTERS = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events
GROUP BY user_id
HAVING COUNT(*) >= 0.008 * (SELECT COUNT(*) FROM events)
ORDER BY n_rows DESC, user_id
"""


def q_inverted_index(sf_dir: str):
    """Posting-list (inverted index) build: term → document frequency +
    sorted posting list, one term-partitioned sweep over the same token
    rows as TF-IDF.  Postings are emitted as a comma-joined string (the
    on-disk index row format; also keeps the oracle compare scalar).  At
    scale each term partition writes its own index shard."""
    from ..stages import textops as tx

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    counts = ds.map_batches(tx.tfidf_doc_term_counts, batch_format="pyarrow")

    def _postings(t: pa.Table) -> pd.DataFrame:
        pdf = t.to_pandas().sort_values(["term", "doc_id"])
        g = pdf.groupby("term", sort=False)["doc_id"]
        out = g.agg(df="size",
                    postings=lambda s: ",".join(map(str, s))).reset_index()
        out["df"] = out["df"].astype(np.int64)
        return out[["term", "df", "postings"]]

    return grouped_map(counts, ["term"], _postings)


SQL_INVERTED_INDEX = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM toks GROUP BY term ORDER BY term
"""


def q_tfidf_top_term(sf_dir: str):
    """TF-IDF keyword extraction: each document's top-scoring term
    (score = tf * ln(N/df), ties by term asc) — the fully distributed
    shape: token counts shuffle by term (df attaches inside the term
    partition, no vocabulary broadcast — open web vocabularies outgrow a
    driver-side map), scored rows shuffle by doc for the per-doc argmax.
    Cents rounding bounds ln() libm ulp skew, as in derived_expr."""
    from ..stages import textops as tx

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    counts = ds.map_batches(tx.tfidf_doc_term_counts, batch_format="pyarrow")
    scored = grouped_map(counts, ["term"], tx.tfidf_attach_idf,
                         fn_kwargs={"n_docs": n_docs})
    return grouped_map(scored, ["doc_id"], tx.tfidf_top_term_sweep)


SQL_TFIDF_TOP_TERM = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS c FROM toks GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS d FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.term,
             tf.c * ln(CAST(n.n AS DOUBLE) / df.d) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n),
r AS (SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rn
      FROM s)
SELECT doc_id, term AS top_term,
       CAST(floor(score * 100 + 0.5) AS BIGINT) AS score_cents
FROM r WHERE rn = 1
ORDER BY doc_id
"""


def q_minhash_lsh_clusters(sf_dir: str):
    """Near-dup clusters via MinHash-LSH (no SQL oracle — sketch-based)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    edges = dd.minhash_lsh_edges(ds, "doc_id", threshold=0.8)
    return dd.cluster_table(edges)


def q_minhash_lsh_clusters_dist(sf_dir: str):
    """DISTRIBUTED connected-components path (hash-partitioned min-label
    propagation — the 10^12-doc route where the edge list no longer fits
    the driver) cross-checked inline against the driver union-find on the
    SAME edges.  Returns the count of disagreeing member rows; the SQL
    oracle pins the expected value (0) since the invariant itself is not
    SQL-expressible.  The actual cluster table is `minhash_lsh_clusters`."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    edges = dd.minhash_lsh_edges(ds, "doc_id", threshold=0.8)
    return dd.distributed_vs_driver_mismatch(edges)


def q_minhash_lsh_clusters_check(sf_dir: str):
    """Distributed minhash-LSH pipeline vs a single-process recompute that
    shares only the base hash kernels (per-band bucket all-pairs +
    independent label propagation, `dedup.minhash_reference_clusters`).
    Returns the row-exact mismatch count; the oracle pins 0 — the same
    driver-visible-invariant pattern as semantic_dedup_check."""
    import pyarrow.parquet as pq

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    eng = dd.cluster_table(dd.minhash_lsh_edges(ds, "doc_id", threshold=0.8))
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    ref = dd.minhash_reference_clusters(
        tbl["doc_id"].to_numpy().astype(np.int64), tbl["text"], threshold=0.8)
    return dd.clusters_mismatch(eng, ref)


def q_simhash_clusters_check(sf_dir: str):
    """Banded simhash pipeline vs single-process brute-force ALL-pairs
    hamming (verifies the pigeonhole banding missed no pair) + independent
    label propagation; oracle pins 0 mismatches."""
    import pyarrow.parquet as pq

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    eng = dd.cluster_table(dd.simhash_edges(ds, "doc_id", max_hamming=3))
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    ref = dd.simhash_reference_clusters(
        tbl["doc_id"].to_numpy().astype(np.int64), tbl["text"], max_hamming=3)
    return dd.clusters_mismatch(eng, ref)


def q_simhash_clusters(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    edges = dd.simhash_edges(ds, "doc_id", max_hamming=3)
    return dd.cluster_table(edges)


def q_simhash_clusters_dist(sf_dir: str):
    """Distributed CC vs driver union-find cross-check on the simhash
    edge list (see q_minhash_lsh_clusters_dist); oracle pins 0 mismatches.
    The actual cluster table is `simhash_clusters`."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    edges = dd.simhash_edges(ds, "doc_id", max_hamming=3)
    return dd.distributed_vs_driver_mismatch(edges)


def q_ngram_jaccard_clusters(sf_dir: str):
    """EXACT token-trigram-set Jaccard clusters (threshold 0.7).

    Candidates come from MinHash-LSH at 32 bands × 2 rows (miss
    probability per true pair at J=0.7 is (1-0.49)^32 < 5e-10), the
    confirm recomputes exact set Jaccard — so the result is held to the
    exact all-pairs SQL oracle below (verified row-identical at sf0.001
    and sf0.01)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    edges = dd.ngram_jaccard_edges(ds, "doc_id", threshold=0.7, n_bands=32)
    return dd.cluster_table(edges)


SQL_NGRAM_JACCARD = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (  -- distinct token trigrams per doc (mirrors _shingle_hashes w=3)
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT g1.doc_id AS a, g2.doc_id AS b, COUNT(*) AS i
  FROM grams g1 JOIN grams g2 ON g1.g = g2.g AND g1.doc_id < g2.doc_id
  GROUP BY 1, 2
),
edges0 AS (  -- integer form of i/(sa+sb-i) >= 0.7: exact at the boundary
  SELECT a, b
  FROM inter
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE i * 10 >= 7 * (sa.sz + sb.sz - i)
),
-- docs with < 3 tokens have the empty gram set; the engine's set
-- Jaccard defines empty-vs-empty as 1.0, so they all pair up
empties AS (SELECT doc_id FROM toks WHERE len(t) < 3),
edges AS (
  SELECT a, b FROM edges0
  UNION ALL
  SELECT e1.doc_id, e2.doc_id FROM empties e1 JOIN empties e2
  ON e1.doc_id < e2.doc_id
),
und AS (SELECT a AS x, b AS y FROM edges UNION SELECT b, a FROM edges),
reach(x, y) AS (  -- transitive closure; (x,x) arrives via any 2-cycle
  SELECT x, y FROM und
  UNION
  SELECT r.x, u.y FROM reach r JOIN und u ON r.y = u.x
)
SELECT CAST(x AS BIGINT) AS member_id,
       CAST(MIN(y) AS BIGINT) AS cluster_id,
       CAST(COUNT(DISTINCT y) AS BIGINT) AS cluster_size
FROM reach GROUP BY x
ORDER BY cluster_id, member_id
"""


# ---------------------------------------------------------------------------
# Text analysis over `documents`
# ---------------------------------------------------------------------------

def q_token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        from ..functions.textstats import bpe_ish_token_count, whitespace_token_count

        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens_ws": whitespace_token_count(batch["text"]).cast(pa.int64()),
            "n_tokens_bpe": bpe_ish_token_count(batch["text"]).cast(pa.int64()),
        })

    return ds.map_batches(counts, batch_format="pyarrow")


SQL_TOKEN_COUNTS = r"""
SELECT doc_id,
       CAST(COALESCE(array_length(regexp_extract_all(text, '\S+')), 0) AS BIGINT) AS n_tokens_ws,
       CAST(COALESCE(array_length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')), 0) AS BIGINT) AS n_tokens_bpe
FROM documents
"""


def q_quality_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        t = batch["text"].combine_chunks().cast(pa.large_string())
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars": pc.utf8_length(t).cast(pa.int64()),
            "n_punct": pc.count_substring_regex(t, r"[\.,;:!\?]").cast(pa.int64()),
            "n_digit": pc.count_substring_regex(t, r"[0-9]").cast(pa.int64()),
            "n_upper": pc.count_substring_regex(t, r"[A-Z]").cast(pa.int64()),
        })

    return ds.map_batches(counts, batch_format="pyarrow")


SQL_QUALITY_COUNTS = r"""
SELECT doc_id,
       length(text) AS n_chars,
       CAST(COALESCE(array_length(regexp_extract_all(text, '[\.,;:!\?]')), 0) AS BIGINT) AS n_punct,
       CAST(COALESCE(array_length(regexp_extract_all(text, '[0-9]')), 0) AS BIGINT) AS n_digit,
       CAST(COALESCE(array_length(regexp_extract_all(text, '[A-Z]')), 0) AS BIGINT) AS n_upper
FROM documents
"""


N_BENCH_DOCS = 10  # docs 0..9 stand in for the held-out benchmark set


def q_contamination_check(sf_dir: str):
    """Decontamination: flag documents sharing ≥1 token TRIGRAM with a
    held-out benchmark set (docs 0..9 stand in for it) — the test-set
    overlap filter every LLM training pipeline needs.

    Scale shape: the benchmark gram set is small (even real eval suites
    are ~10^6 grams) → sorted hash array broadcast ONCE via ray.put; the
    corpus streams through map_batches with one searchsorted per batch.
    Gram hashes come from the shared shingle kernel, so membership
    matches the SQL oracle's exact string trigrams (64-bit collisions:
    p < 1e-10 at fixture scale, verified at both SFs)."""
    import pyarrow.parquet as pq

    from ..functions.textstats import ngram_set_hashes

    bench_t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    bench_t = bench_t.filter(pc.less(bench_t["doc_id"], N_BENCH_DOCS))
    bh, _ = ngram_set_hashes(bench_t["text"], n=3)
    bench_ref = ray.put(np.unique(bh))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def flag(batch: pa.Table) -> pd.DataFrame:
        bench = ray.get(bench_ref)
        hashes, counts = ngram_set_hashes(batch["text"], n=3)
        doc_ids = batch["doc_id"].to_numpy()
        gram_doc = np.repeat(np.arange(len(doc_ids)), counts)
        pos = np.searchsorted(bench, hashes)
        pos_c = np.minimum(pos, len(bench) - 1) if len(bench) else pos
        hit = len(bench) > 0 and (bench[pos_c] == hashes)
        hit = hit & (doc_ids[gram_doc] >= N_BENCH_DOCS)
        # distinct shared grams per doc: dedupe (doc, gram) among hits
        hd, hg = gram_doc[hit], hashes[hit]
        if len(hd):
            o = np.lexsort((hg, hd))
            hd, hg = hd[o], hg[o]
            keep = np.ones(len(hd), dtype=bool)
            keep[1:] = (hd[1:] != hd[:-1]) | (hg[1:] != hg[:-1])
            n_shared = np.bincount(hd[keep], minlength=len(doc_ids))
        else:
            n_shared = np.zeros(len(doc_ids), dtype=np.int64)
        mask = n_shared > 0
        return pd.DataFrame({
            "doc_id": doc_ids[mask].astype(np.int64),
            "n_shared_grams": n_shared[mask].astype(np.int64),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


SQL_CONTAMINATION_CHECK = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tk
  FROM documents WHERE text <> ''
),
tri AS (
  SELECT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 2)) AS i) g
),
bench AS (SELECT DISTINCT gram FROM tri WHERE doc_id < 10)
SELECT d.doc_id, COUNT(DISTINCT d.gram) AS n_shared_grams
FROM tri d JOIN bench b USING (gram)
WHERE d.doc_id >= 10
GROUP BY 1
"""


def q_repetition_ratio(sf_dir: str):
    """Gopher-style within-doc repetition filter: fraction of duplicate
    token trigrams per document (high ratio ⇒ boilerplate / spam)."""
    from ..functions.textstats import ngram_set_hashes

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def ratio(batch: pa.Table) -> pd.DataFrame:
        hashes, counts = ngram_set_hashes(batch["text"], n=3)
        doc_ids = batch["doc_id"].to_numpy()
        gram_doc = np.repeat(np.arange(len(doc_ids)), counts)
        if len(hashes):
            o = np.lexsort((hashes, gram_doc))
            gd, gh = gram_doc[o], hashes[o]
            first = np.ones(len(gd), dtype=bool)
            first[1:] = (gd[1:] != gd[:-1]) | (gh[1:] != gh[:-1])
            n_distinct = np.bincount(gd[first], minlength=len(doc_ids))
        else:
            n_distinct = np.zeros(len(doc_ids), dtype=np.int64)
        mask = counts > 0
        n_grams = counts[mask].astype(np.int64)
        n_dist = n_distinct[mask].astype(np.int64)
        return pd.DataFrame({
            "doc_id": doc_ids[mask].astype(np.int64),
            "n_grams": n_grams,
            "n_distinct": n_dist,
            "rep_micros": _micros(1.0 - n_dist / n_grams),
        })

    return ds.map_batches(ratio, batch_format="pyarrow")


SQL_REPETITION_RATIO = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tk
  FROM documents WHERE text <> ''
),
tri AS (
  SELECT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 2)) AS i) g
)
SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT gram) AS n_distinct,
       CAST(floor((1.0 - COUNT(DISTINCT gram) * 1.0 / COUNT(*)) * 1000000 + 0.5) AS BIGINT) AS rep_micros
FROM tri GROUP BY 1
"""


def q_clean_corpus(sf_dir: str):
    """The canonical LLM data-curation chain as ONE streaming pipeline:
    quality gate (min length) → decontamination (drop docs sharing a
    trigram with the benchmark set) → exact dedup (keep min doc_id per
    text).  One read, one pass for the row-local stages, one 16-byte
    (hash, id) shuffle for the dedup — document text never enters the
    exchange (the 100 TB shape)."""
    import pyarrow.parquet as pq

    from ..functions.textstats import ngram_set_hashes

    bench_t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    bench_t = bench_t.filter(pc.less(bench_t["doc_id"], N_BENCH_DOCS))
    bh, _ = ngram_set_hashes(bench_t["text"], n=3)
    bench_ref = ray.put(np.unique(bh))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stage(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        t = batch["text"].combine_chunks().cast(pa.large_string())
        doc_ids = batch["doc_id"].to_numpy()
        quality = (pc.utf8_length(t).to_numpy() >= 50) & (doc_ids >= N_BENCH_DOCS)
        hashes, counts = ngram_set_hashes(batch["text"], n=3)
        gram_doc = np.repeat(np.arange(len(doc_ids)), counts)
        if len(bench) and len(hashes):
            pos = np.minimum(np.searchsorted(bench, hashes), len(bench) - 1)
            hits = bench[pos] == hashes
            contaminated = np.zeros(len(doc_ids), dtype=bool)
            contaminated[np.unique(gram_doc[hits])] = True
        else:
            contaminated = np.zeros(len(doc_ids), dtype=bool)
        keep = quality & ~contaminated
        return pa.table({
            "doc_id": pa.array(doc_ids[keep].astype(np.int64), pa.int64()),
            "text_hash": pa.array(fp.text_hash64(t.filter(pa.array(keep))), pa.uint64()),
        })

    surv = ds.map_batches(stage, batch_format="pyarrow")

    def keep_min(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        g = df.groupby("text_hash", sort=False)["doc_id"]
        out = g.agg(doc_id="min", n_dups="size").reset_index(drop=True)
        return pd.DataFrame({"doc_id": out["doc_id"].astype(np.int64),
                             "n_dups": out["n_dups"].astype(np.int64)})

    return grouped_map(surv, ["text_hash"], keep_min)


SQL_CLEAN_CORPUS = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tk
  FROM documents WHERE text <> ''
),
tri AS (
  SELECT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 2)) AS i) g
),
bench AS (SELECT DISTINCT gram FROM tri WHERE doc_id < 10),
contam AS (SELECT DISTINCT d.doc_id FROM tri d JOIN bench b USING (gram) WHERE d.doc_id >= 10),
clean AS (
  SELECT o.doc_id, o.text FROM documents o
  LEFT JOIN contam c USING (doc_id)
  WHERE length(o.text) >= 50 AND o.doc_id >= 10 AND c.doc_id IS NULL
)
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups FROM clean GROUP BY text
"""


def q_media_image_features(sf_dir: str):
    """Multimodal (rows-only): REAL netpbm image decode through the
    actor-pool stage — deterministic seeded P6 payloads (the driver's
    testdata ships no media table), decoded from genuine encoded bytes,
    features extracted, binary dropped before any shuffle."""
    from ..stages.media import ImageDecodeStage, make_real_media

    ds = ray.data.from_arrow(make_real_media(256, kind="image", seed=9))
    out = ds.map_batches(
        ImageDecodeStage, fn_constructor_kwargs={"decoder": "netpbm"},
        concurrency=2, batch_size=32, batch_format="pyarrow",
    )
    return out.drop_columns(["thumb"])


def q_media_jpeg_features(sf_dir: str):
    """Multimodal COMPRESSED-codec path (rows-only): genuine baseline
    JPEG payloads (4:4:4, 4:2:0 and grayscale mixes) decoded by the pure
    numpy/python T.81 decoder through the actor-pool stage — the codec a
    real corpus ships, no PIL/opencv in this container.  Binary dropped
    before any shuffle; the distributed-vs-single-process invariant is
    ``media_jpeg_features_check``."""
    from ..stages.media import ImageDecodeStage, make_jpeg_media

    ds = ray.data.from_arrow(make_jpeg_media(192, seed=5))
    out = ds.map_batches(
        ImageDecodeStage, fn_constructor_kwargs={"decoder": "jpeg"},
        concurrency=2, batch_size=32, batch_format="pyarrow",
    )
    return out.drop_columns(["thumb"])


def q_media_jpeg_features_check(sf_dir: str):
    """Driver-visible invariant for the compressed-codec multimodal path:
    the actor-pool JPEG decode over the seeded payload table must equal a
    single-process decode+resize of the same bytes feature-for-feature
    (micros-rounded), and the decode must be faithful: mean |err| vs the
    pre-encode pixels below the q90 JPEG loss budget.  Oracle pins
    mismatch_rows=0, fidelity_ok=1."""
    from ..functions.jpeg import decode_jpeg
    from ..stages.media import ImageDecodeStage, make_jpeg_media

    eng = q_media_jpeg_features(sf_dir).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    tbl = make_jpeg_media(192, seed=5)
    stage = ImageDecodeStage(decoder="jpeg")       # same kernel, no Ray
    ref = stage(tbl).drop_columns(["thumb"]).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    for df in (eng, ref):
        for c in ("pixel_mean", "pixel_std"):
            df[c] = _micros(df[c].to_numpy())
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns.tolist()].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())
    # decode fidelity on a fresh non-subsampled sample: q90 444 loss
    # budget is a few gray levels
    h, w = 40, 56
    gx = np.linspace(0, 255, w)[None, :]
    gy = np.linspace(0, 255, h)[:, None]
    img = np.stack([np.broadcast_to(gx, (h, w)), np.broadcast_to(gy, (h, w)),
                    np.clip(127.5 + 60 * np.sin(gx / 5) * np.cos(gy / 7), 0, 255)],
                   axis=2).astype(np.uint8)
    from ..functions.jpeg import encode_jpeg

    err = float(np.abs(decode_jpeg(encode_jpeg(img, quality=90)).astype(float)
                       - img.astype(float)).mean())
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64"),
                         "fidelity_ok": pd.array([int(err < 4.0)],
                                                 dtype="int64")})


def q_media_png_features(sf_dir: str):
    """Multimodal LOSSLESS compressed-codec path (rows-only): genuine
    baseline PNG payloads (grayscale / RGB / RGBA mixes, all five
    scanline filters) decoded by the pure numpy/stdlib-zlib RFC 2083
    decoder through the actor-pool stage via the ``library`` dispatch
    slot (signature-sniffed, the production shape).  Binary dropped
    before any shuffle; the distributed-vs-single-process + losslessness
    invariant is ``media_png_features_check``."""
    from ..stages.media import ImageDecodeStage, make_png_media

    ds = ray.data.from_arrow(make_png_media(192, seed=7))
    out = ds.map_batches(
        ImageDecodeStage, fn_constructor_kwargs={"decoder": "library"},
        concurrency=2, batch_size=32, batch_format="pyarrow",
    )
    return out.drop_columns(["thumb"])


def q_media_png_features_check(sf_dir: str):
    """Driver-visible invariant for the lossless compressed-codec path:
    the actor-pool PNG decode over the seeded payload table must equal a
    single-process decode+resize of the same bytes feature-for-feature
    (micros-rounded), and — PNG being lossless — every decoded payload
    must equal its pre-encode pixels EXACTLY (no loss budget).  Oracle
    pins mismatch_rows=0, lossless_ok=1."""
    from ..functions.png import decode_png, encode_png
    from ..stages.media import ImageDecodeStage, make_png_media

    eng = q_media_png_features(sf_dir).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    tbl = make_png_media(192, seed=7)
    stage = ImageDecodeStage(decoder="library")    # same kernel, no Ray
    ref = stage(tbl).drop_columns(["thumb"]).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    for df in (eng, ref):
        for c in ("pixel_mean", "pixel_std"):
            df[c] = _micros(df[c].to_numpy())
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns.tolist()].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())
    # losslessness on a fresh sample covering gray/RGB/RGBA and every
    # filter type: decode(encode(img)) must be BYTE-EXACT
    rng = np.random.RandomState(11)
    lossless = 1
    for shape in ((23, 37), (23, 37, 3), (23, 37, 4)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        if not np.array_equal(decode_png(encode_png(img)), img):
            lossless = 0
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64"),
                         "lossless_ok": pd.array([lossless], dtype="int64")})


def q_media_webp_features(sf_dir: str):
    """Multimodal LOSSLESS compressed-codec path (rows-only): genuine
    WebP-lossless (VP8L) payloads — predictor + subtract-green residuals,
    fixed-delta color transform, palette with bundled 1/2/4-bit indices,
    color cache + LZ77 + canonical Huffman, all pure numpy from the
    public spec — decoded by the actor-pool stage via the ``library``
    dispatch slot (RIFF/WEBP signature-sniffed).  Binary dropped before
    any shuffle; the distributed-vs-single-process + losslessness
    invariant is ``media_webp_features_check``."""
    from ..stages.media import ImageDecodeStage, make_webp_media

    ds = ray.data.from_arrow(make_webp_media(192, seed=23))
    out = ds.map_batches(
        ImageDecodeStage, fn_constructor_kwargs={"decoder": "library"},
        concurrency=2, batch_size=32, batch_format="pyarrow",
    )
    return out.drop_columns(["thumb"])


def q_media_webp_features_check(sf_dir: str):
    """Driver-visible invariant for the WebP-lossless path: (1) the
    actor-pool decode equals a single-process decode of the same bytes
    (micros-rounded), (2) LOSSLESSNESS — decode(encode(img)) is
    bit-exact across every transform combination (predictor,
    subtract-green, color transform, palette bundling widths, cache
    on/off, LZ77 on/off), and (3) compression budget — the gradient
    fixture compresses below 0.6x raw RGB.  Oracle pins
    mismatch_rows=0, lossless_ok=1, budget_ok=1."""
    from ..functions.webp import decode_webp, encode_webp
    from ..stages.media import ImageDecodeStage, make_webp_media

    eng = q_media_webp_features(sf_dir).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    tbl = make_webp_media(192, seed=23)
    stage = ImageDecodeStage(decoder="library")    # same kernel, no Ray
    ref = stage(tbl).drop_columns(["thumb"]).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    for df in (eng, ref):
        for c in ("pixel_mean", "pixel_std"):
            df[c] = _micros(df[c].to_numpy())
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns.tolist()].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())
    rng = np.random.RandomState(29)
    img = rng.randint(0, 256, (23, 37, 4)).astype(np.uint8)
    lossless = 1
    for kw in ({}, {"predictor": False}, {"subtract_green": False},
               {"color_transform": True}, {"cache_bits": 0}, {"lz77": False},
               {"predictor": False, "subtract_green": False}):
        if not np.array_equal(decode_webp(encode_webp(img, **kw))[..., :4], img):
            lossless = 0
    for ncol in (2, 4, 13, 200):               # every bundling width
        pimg = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)[
            rng.randint(0, ncol, (19, 27))]
        dec = decode_webp(encode_webp(pimg, palette="always"))
        if not np.array_equal(dec[..., :3], pimg):
            lossless = 0
    gx = np.linspace(0, 255, 64)[None, :]
    gy = np.linspace(0, 255, 48)[:, None]
    grad = np.stack([np.broadcast_to(gx, (48, 64)),
                     np.broadcast_to(gy, (48, 64)),
                     np.broadcast_to((gx + gy) / 2, (48, 64))],
                    axis=2).astype(np.uint8)
    budget = int(len(encode_webp(grad)) < 0.6 * grad.nbytes)
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64"),
                         "lossless_ok": pd.array([lossless], dtype="int64"),
                         "budget_ok": pd.array([budget], dtype="int64")})


def q_media_audio_codecs(sf_dir: str):
    """Multimodal COMPRESSED-audio path (rows-only): genuine G.711 mu-law
    and IMA ADPCM WAV payloads decoded by the pure-numpy from-spec codecs
    through the actor-pool stage via the ``library`` dispatch slot.
    Binary dropped before any shuffle; the distributed-vs-single-process
    + fidelity invariant is ``media_audio_codecs_check``."""
    from ..stages.media import AudioFeatureStage, make_compressed_audio_media

    ds = ray.data.from_arrow(make_compressed_audio_media(192, seed=9))
    return ds.map_batches(
        AudioFeatureStage, fn_constructor_kwargs={"decoder": "library"},
        concurrency=2, batch_size=32, batch_format="pyarrow",
    )


def q_media_audio_codecs_check(sf_dir: str):
    """Driver-visible invariant for the compressed-audio path: the
    actor-pool decode over the seeded payload table must equal a
    single-process decode of the same bytes feature-for-feature
    (micros-rounded), and both codecs must be faithful: mean |err| vs the
    pre-encode float signal under the mu-law (2:1) and ADPCM (4:1)
    quantization budgets.  Oracle pins mismatch_rows=0, fidelity_ok=1."""
    from ..functions.audio_codecs import (
        decode_wav_compressed,
        encode_wav_adpcm,
        encode_wav_ulaw,
    )
    from ..stages.media import AudioFeatureStage, make_compressed_audio_media

    eng = q_media_audio_codecs(sf_dir).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    tbl = make_compressed_audio_media(192, seed=9)
    stage = AudioFeatureStage(decoder="library")   # same kernel, no Ray
    ref = stage(tbl).to_pandas().sort_values("media_id").reset_index(drop=True)
    for df in (eng, ref):
        for c in ("energy", "duration_s"):
            df[c] = _micros(df[c].to_numpy())
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns.tolist()].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())
    # codec fidelity on a fresh sine mix: quantization budgets per codec
    sr = 16000
    t = np.arange(sr) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.25 * np.sin(2 * np.pi * 1200 * t)
    e_ulaw = float(np.abs(decode_wav_compressed(encode_wav_ulaw(x, sr))
                          - x.astype(np.float32)).mean())
    e_adpcm = float(np.abs(decode_wav_compressed(encode_wav_adpcm(x, sr))
                           - x.astype(np.float32)).mean())
    fidelity = int(e_ulaw < 0.01 and e_adpcm < 0.02)
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64"),
                         "fidelity_ok": pd.array([fidelity], dtype="int64")})


def q_media_flac(sf_dir: str):
    """Multimodal LOSSLESS-audio path (rows-only): genuine FLAC payloads
    (pure-numpy RFC 9639 codec: FIXED + quantized-LPC predictors,
    partitioned Rice, mono + left-side stereo, CRC-8/16 + MD5 verified)
    decoded by the actor-pool stage via the ``library`` dispatch slot.
    The distributed-vs-single-process + losslessness/budget invariant is
    ``media_flac_check``."""
    from ..stages.media import AudioFeatureStage, make_flac_media

    ds = ray.data.from_arrow(make_flac_media(144, seed=13))
    return ds.map_batches(
        AudioFeatureStage, fn_constructor_kwargs={"decoder": "library"},
        concurrency=2, batch_size=32, batch_format="pyarrow",
    )


def q_media_flac_check(sf_dir: str):
    """Driver-visible invariant for the FLAC path: (1) the actor-pool
    decode equals a single-process decode of the same bytes
    (micros-rounded), (2) LOSSLESSNESS — decode(encode(pcm)) is
    bit-exact for every predictor and stereo mode, (3) compression
    budget — the sine-mix fixture compresses below 0.85x raw PCM, and
    (4) a flipped byte is caught by the frame CRC.  Oracle pins
    mismatch_rows=0, lossless_ok=1, budget_ok=1."""
    from ..functions.flac import decode_flac, encode_flac
    from ..stages.media import AudioFeatureStage, make_flac_media

    eng = q_media_flac(sf_dir).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    tbl = make_flac_media(144, seed=13)
    stage = AudioFeatureStage(decoder="library")   # same kernel, no Ray
    ref = stage(tbl).to_pandas().sort_values("media_id").reset_index(drop=True)
    for df in (eng, ref):
        for c in ("energy", "duration_s"):
            df[c] = _micros(df[c].to_numpy())
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns.tolist()].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())

    rng = np.random.RandomState(5)
    sr = 16000
    t = np.arange(sr) / sr
    x = np.clip((0.5 * np.sin(2 * np.pi * 440 * t)
                 + 0.25 * np.sin(2 * np.pi * 1200 * t)
                 + rng.normal(0, 0.002, len(t))) * 32767,
                -32768, 32767).astype(np.int16)
    st = np.stack([x, (x * 0.7).astype(np.int16)], axis=1)
    lossless = True
    sizes = []
    for pred in ("fixed", "lpc"):
        enc = encode_flac(x, sr, predictor=pred)
        sizes.append(len(enc) / x.nbytes)
        lossless &= bool(np.array_equal(decode_flac(enc)[0], x.astype(np.int32)))
        for mode in ("independent", "left_side", "right_side", "mid_side"):
            enc2 = encode_flac(st, sr, stereo_mode=mode, predictor=pred)
            lossless &= bool(np.array_equal(decode_flac(enc2)[0],
                                            st.astype(np.int32)))
    budget = int(max(sizes) < 0.85)
    # integrity: a flipped payload byte must be caught, not decoded
    bad = bytearray(encode_flac(x, sr))
    bad[len(bad) // 2] ^= 0xFF
    try:
        decode_flac(bytes(bad))
        caught = False
    except ValueError:
        caught = True
    return pd.DataFrame({
        "mismatch_rows": pd.array([mism], dtype="int64"),
        "lossless_ok": pd.array([int(lossless and caught)], dtype="int64"),
        "budget_ok": pd.array([budget], dtype="int64"),
    })


def q_media_mp2(sf_dir: str):
    """Multimodal PERCEPTUAL-audio path (rows-only): genuine MPEG-1
    Audio Layer II payloads (pure-numpy ISO 11172-3 subset codec:
    32-band polyphase filterbank, Table 3-B.2a allocation, grouped
    3/5/9-level triplet codes, 2^(-i/3) scalefactors) decoded by the
    actor-pool stage via the ``library`` dispatch slot.  The
    distributed-vs-single-process + SNR/compression budget invariant is
    ``media_mp2_check``."""
    from ..stages.media import AudioFeatureStage, make_mp2_media

    ds = ray.data.from_arrow(make_mp2_media(96, seed=29))
    return ds.map_batches(
        AudioFeatureStage, fn_constructor_kwargs={"decoder": "library"},
        concurrency=2, batch_size=32, batch_format="pyarrow",
    )


def q_media_mp2_check(sf_dir: str):
    """Driver-visible invariant for the Layer II path: (1) the
    actor-pool decode equals a single-process decode of the same bytes
    (micros-rounded), (2) RATE — every payload is exactly 192 kbps
    (0.25x of 16-bit PCM at 48 kHz), (3) FIDELITY — decode(encode(x))
    reaches >= 25 dB SNR on a tonal mix (the quantizer bound at this
    operating point; the unquantized filterbank floor is pinned ~50 dB
    in tests), and (4) a stream with a corrupted sync word is refused.
    Oracle pins mismatch_rows=0, rate_ok=1, snr_ok=1."""
    from ..functions.mp2 import FRAME_SAMPLES, SAMPLE_RATE, decode_mp2, encode_mp2
    from ..stages.media import AudioFeatureStage, make_mp2_media

    eng = q_media_mp2(sf_dir).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    tbl = make_mp2_media(96, seed=29)
    stage = AudioFeatureStage(decoder="library")   # same kernel, no Ray
    ref = stage(tbl).to_pandas().sort_values("media_id").reset_index(drop=True)
    for df in (eng, ref):
        for c in ("energy", "duration_s"):
            df[c] = _micros(df[c].to_numpy())
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns.tolist()].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())

    # rate: coded bytes == 576 * n_frames (192 kbps / 48 kHz exactly)
    rate_ok = 1
    for p in tbl["payload"].to_pylist():
        if len(p) % 576:
            rate_ok = 0

    rng = np.random.RandomState(11)
    sr = SAMPLE_RATE
    t = np.arange(sr) / sr
    x = np.clip(0.5 * np.sin(2 * np.pi * 440 * t)
                + 0.25 * np.sin(2 * np.pi * 1870 * t)
                + rng.normal(0, 0.01, len(t)), -0.99, 0.99)
    y, _ = decode_mp2(encode_mp2(x))
    err = x - y[:len(x)]
    snr_ok = int(10 * np.log10((x @ x) / (err @ err)) >= 25.0)
    assert FRAME_SAMPLES == 1152
    bad = bytearray(encode_mp2(x))
    bad[0] = 0x00                                  # break the sync word
    try:
        decode_mp2(bytes(bad))
        caught = False
    except ValueError:
        caught = True
    return pd.DataFrame({
        "mismatch_rows": pd.array([mism], dtype="int64"),
        "rate_ok": pd.array([rate_ok], dtype="int64"),
        "snr_ok": pd.array([int(snr_ok and caught)], dtype="int64"),
    })


def q_media_mp3(sf_dir: str):
    """Multimodal PERCEPTUAL-audio path for the web's dominant codec
    (rows-only): genuine MPEG-1 Audio Layer III ("MP3") payloads
    (pure-numpy ISO 11172-3 subset codec: bit-reservoir main-data
    syntax, Huffman-coded big_values/count1/rzero spectrum with linbits
    escapes, scalefactors+SCFSI, alias-reduction butterflies, hybrid
    36-point IMDCT + 32-band polyphase) decoded by the actor-pool stage
    via the ``library`` dispatch slot.  The distributed-vs-single-
    process + rate/SNR budget invariant is ``media_mp3_check``."""
    from ..stages.media import AudioFeatureStage, make_mp3_media

    ds = ray.data.from_arrow(make_mp3_media(96, seed=31))
    return ds.map_batches(
        AudioFeatureStage, fn_constructor_kwargs={"decoder": "library"},
        concurrency=2, batch_size=32, batch_format="pyarrow",
    )


def q_media_mp3_check(sf_dir: str):
    """Driver-visible invariant for the Layer III path: (1) the
    actor-pool decode equals a single-process decode of the same bytes
    (micros-rounded), (2) RATE — every payload is whole 320 kbps frames
    (960-byte multiples, 5/12 of 16-bit PCM at 48 kHz), (3) FIDELITY —
    decode(encode(x)) reaches >= 30 dB SNR on a tonal mix BOTH with and
    without on-the-wire scalefactors (the SCFSI/requant path), and (4)
    a stream with a corrupted sync word is refused.  Oracle pins
    mismatch_rows=0, rate_ok=1, snr_ok=1."""
    from ..functions.mp3 import FRAME_BYTES, SAMPLE_RATE, decode_mp3, encode_mp3
    from ..stages.media import AudioFeatureStage, make_mp3_media

    eng = q_media_mp3(sf_dir).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    tbl = make_mp3_media(96, seed=31)
    stage = AudioFeatureStage(decoder="library")   # same kernel, no Ray
    ref = stage(tbl).to_pandas().sort_values("media_id").reset_index(drop=True)
    for df in (eng, ref):
        for c in ("energy", "duration_s"):
            df[c] = _micros(df[c].to_numpy())
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns.tolist()].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())

    rate_ok = 1
    for p in tbl["payload"].to_pylist():
        if len(p) % FRAME_BYTES:
            rate_ok = 0

    rng = np.random.RandomState(13)
    sr = SAMPLE_RATE
    t = np.arange(sr // 2) / sr
    x = np.clip(0.5 * np.sin(2 * np.pi * 440 * t)
                + 0.25 * np.sin(2 * np.pi * 1870 * t)
                + rng.normal(0, 0.01, len(t)), -0.99, 0.99)
    snr_ok = 1
    for scf in (0, 2):
        y, _ = decode_mp3(encode_mp3(x, uniform_scf=scf))
        err = x - y[:len(x)]
        if 10 * np.log10((x @ x) / (err @ err)) < 30.0:
            snr_ok = 0
    bad = bytearray(encode_mp3(x))
    bad[0] = 0x00                                  # break the sync word
    try:
        decode_mp3(bytes(bad))
        caught = False
    except ValueError:
        caught = True
    return pd.DataFrame({
        "mismatch_rows": pd.array([mism], dtype="int64"),
        "rate_ok": pd.array([rate_ok], dtype="int64"),
        "snr_ok": pd.array([int(snr_ok and caught)], dtype="int64"),
    })


def q_media_video_frames(sf_dir: str):
    """Multimodal REAL-video path (rows-only): genuine MJPEG-AVI payloads
    frame-sampled (every 4th frame) by the actor-pool stage via the
    ``library`` dispatch slot — container seek + single-frame JPEG decode,
    so only sampled frames are decoded.  Flat-map-shaped output (one row
    per sampled frame); the distributed-vs-single-process + frame-count
    invariant is ``media_video_frames_check``."""
    from ..stages.media import VideoFrameSampleStage, make_mjpeg_media

    ds = ray.data.from_arrow(make_mjpeg_media(64, seed=13))
    return ds.map_batches(
        VideoFrameSampleStage, fn_constructor_kwargs={"decoder": "library", "every": 4},
        concurrency=2, batch_size=16, batch_format="pyarrow",
    )


def q_media_video_frames_check(sf_dir: str):
    """Driver-visible invariant for the video path: the actor-pool frame
    sample over the seeded AVI table must equal a single-process run
    row-for-row (micros-rounded means), the emitted row count must equal
    the exact sum of ceil(n_frames/4) from the CONTAINER index, and the
    green channel of a decoded frame must identify its frame number
    (proving the seek decoded the RIGHT frame).  Oracle pins
    mismatch_rows=0, frame_count_ok=1, seek_ok=1."""
    from ..functions.mjpeg import decode_avi_frame
    from ..stages.media import VideoFrameSampleStage, make_mjpeg_media

    eng = q_media_video_frames(sf_dir).to_pandas() \
        .sort_values(["media_id", "frame_no"]).reset_index(drop=True)
    tbl = make_mjpeg_media(64, seed=13)
    stage = VideoFrameSampleStage(decoder="library", every=4)  # no Ray
    ref = stage(tbl).to_pandas() \
        .sort_values(["media_id", "frame_no"]).reset_index(drop=True)
    for df in (eng, ref):
        df["frame_mean"] = _micros(df["frame_mean"].to_numpy())
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns.tolist()].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())
    counts = tbl["n_frames"].to_numpy()
    expect_rows = int(sum((int(c) + 3) // 4 for c in counts))
    frame_count_ok = int(len(eng) == expect_rows)
    # seek correctness: frame 8 of payload 0 carries green ≈ 8*12
    p0 = tbl["payload"][0].as_py()
    img = decode_avi_frame(p0, 8)
    seek_ok = int(abs(float(img[:, :, 1].mean()) - 96.0) < 10.0)
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64"),
                         "frame_count_ok": pd.array([frame_count_ok], dtype="int64"),
                         "seek_ok": pd.array([seek_ok], dtype="int64")})


def q_media_mpeg1_frames(sf_dir: str):
    """Multimodal INTER-FRAME-video path (rows-only): genuine MPEG-1
    video payloads (pure-numpy ISO 11172-2 subset codec: I+P GOPs,
    full-pel motion compensation, skipped macroblocks, the spec's VLC
    tables and oddification dequant) frame-sampled (every 4th frame) by
    the actor-pool stage via the ``library`` dispatch slot.  Frame count
    is a picture-start-code scan (no entropy decode); each sampled frame
    is a GOP seek that decodes only from the nearest preceding I
    picture.  The distributed-vs-single-process + frame-count + seek +
    inter-gain invariant is ``media_mpeg1_frames_check``."""
    from ..stages.media import VideoFrameSampleStage, make_mpeg1_media

    ds = ray.data.from_arrow(make_mpeg1_media(48, seed=17))
    return ds.map_batches(
        VideoFrameSampleStage, fn_constructor_kwargs={"decoder": "library", "every": 4},
        concurrency=2, batch_size=12, batch_format="pyarrow",
    )


def q_media_mpeg1_frames_check(sf_dir: str):
    """Driver-visible invariant for the inter-frame video path: (1) the
    actor-pool frame sample over the seeded MPEG-1 table equals a
    single-process run row-for-row (micros-rounded means), (2) the
    emitted row count equals the exact sum of ceil(n_frames/4) from the
    CONTAINER start-code scan, (3) a GOP seek decodes the RIGHT frame —
    frame 8's flat green stamp reads ≈ 96 — and bit-exactly matches the
    same frame from a full sequential decode, and (4) INTER GAIN: the
    I+P stream of a translating clip is meaningfully smaller than its
    all-intra encoding (the property that makes this a video codec).
    Oracle pins mismatch_rows=0, frame_count_ok=1, seek_ok=1,
    inter_ok=1."""
    from ..functions.mpeg1 import (
        decode_mpeg1,
        decode_mpeg1_frame,
        encode_mpeg1,
        mpeg1_n_frames,
    )
    from ..stages.media import VideoFrameSampleStage, make_mpeg1_media

    eng = q_media_mpeg1_frames(sf_dir).to_pandas() \
        .sort_values(["media_id", "frame_no"]).reset_index(drop=True)
    tbl = make_mpeg1_media(48, seed=17)
    stage = VideoFrameSampleStage(decoder="library", every=4)  # no Ray
    ref = stage(tbl).to_pandas() \
        .sort_values(["media_id", "frame_no"]).reset_index(drop=True)
    for df in (eng, ref):
        df["frame_mean"] = _micros(df["frame_mean"].to_numpy())
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns.tolist()].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())
    payloads = tbl["payload"].to_pylist()
    counts = [mpeg1_n_frames(p) for p in payloads]   # container scan
    expect_rows = int(sum((c + 3) // 4 for c in counts))
    frame_count_ok = int(
        len(eng) == expect_rows
        and counts == [int(c) for c in tbl["n_frames"].to_numpy()])
    # seek correctness on the first payload with > 8 frames: green stamp
    # identifies the frame AND the seek equals the sequential decode
    pi = next(i for i, c in enumerate(counts) if c > 8)
    img = decode_mpeg1_frame(payloads[pi], 8)
    full = decode_mpeg1(payloads[pi])
    seek_ok = int(abs(float(img[:, :, 1].mean()) - 96.0) < 10.0
                  and np.array_equal(img, full[8]))
    # inter gain: motion-compensated P pictures beat all-intra coding
    gx = np.broadcast_to(np.linspace(0, 255, 48)[None, :], (32, 48))
    gy = np.broadcast_to(np.linspace(0, 255, 32)[:, None], (32, 48))
    frames = []
    for f in range(12):
        tex = np.clip(127.5 + 70 * np.sin((gx + 3.0 * f) / 6.0)
                      * np.cos(gy / 5.0), 0, 255)
        frames.append(np.stack(
            [np.minimum(0.5 * gx + 0.5 * tex, 255),
             np.full((32, 48), min(f * 12.0, 255.0)), tex],
            axis=2).astype(np.uint8))
    inter_ok = int(len(encode_mpeg1(frames, gop_size=6))
                   < 0.8 * len(encode_mpeg1(frames, gop_size=1)))
    return pd.DataFrame({
        "mismatch_rows": pd.array([mism], dtype="int64"),
        "frame_count_ok": pd.array([frame_count_ok], dtype="int64"),
        "seek_ok": pd.array([seek_ok], dtype="int64"),
        "inter_ok": pd.array([inter_ok], dtype="int64"),
    })


def q_media_gif_features(sf_dir: str):
    """Multimodal LOSSLESS palette-codec path (rows-only): genuine GIF89a
    payloads (plain / interlaced / transparent mixes, variable-width LZW)
    decoded by the pure-python from-spec codec through the actor-pool
    stage via the ``library`` dispatch slot (signature-sniffed, the
    production shape).  Binary dropped before any shuffle; the
    distributed-vs-single-process + losslessness invariant is
    ``media_gif_features_check``."""
    from ..stages.media import ImageDecodeStage, make_gif_media

    ds = ray.data.from_arrow(make_gif_media(192, seed=17))
    out = ds.map_batches(
        ImageDecodeStage, fn_constructor_kwargs={"decoder": "library"},
        concurrency=2, batch_size=32, batch_format="pyarrow",
    )
    return out.drop_columns(["thumb"])


def q_media_gif_features_check(sf_dir: str):
    """Driver-visible invariant for the GIF path: the actor-pool decode
    over the seeded payload table must equal a single-process decode of
    the same bytes feature-for-feature (micros-rounded), and — GIF being
    lossless palette content — decode(encode(idx, pal)) must equal
    pal[idx] EXACTLY across plain / interlaced / transparent and
    table-full LZW content.  Oracle pins mismatch_rows=0, lossless_ok=1."""
    from ..functions.gif import decode_gif, encode_gif
    from ..stages.media import ImageDecodeStage, make_gif_media

    eng = q_media_gif_features(sf_dir).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    tbl = make_gif_media(192, seed=17)
    stage = ImageDecodeStage(decoder="library")    # same kernel, no Ray
    ref = stage(tbl).drop_columns(["thumb"]).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    for df in (eng, ref):
        for c in ("pixel_mean", "pixel_std"):
            df[c] = _micros(df[c].to_numpy())
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns.tolist()].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())
    # losslessness on a fresh sample: plain, interlaced, and a
    # high-entropy 256-color image that fills the 12-bit LZW table
    rng = np.random.RandomState(19)
    lossless = 1
    for ncol, shape, inter in ((16, (23, 37), False), (16, (23, 37), True),
                               (256, (150, 200), False)):
        idx = rng.randint(0, ncol, shape).astype(np.uint8)
        pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
        if not np.array_equal(decode_gif(encode_gif(idx, pal, interlace=inter)),
                              pal[idx]):
            lossless = 0
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64"),
                         "lossless_ok": pd.array([lossless], dtype="int64")})


def q_media_gif_anim_frames(sf_dir: str):
    """Multimodal animated-GIF video path (rows-only): genuine multi-frame
    GIF89a payloads frame-sampled (every 4th frame) by the actor-pool
    stage via the ``library`` dispatch slot — frame count read from the
    container WITHOUT entropy decode, sampled frames composited per the
    disposal spec.  Flat-map-shaped output (one row per sampled frame);
    the distributed-vs-single-process + frame-count invariant is
    ``media_gif_anim_frames_check``."""
    from ..stages.media import VideoFrameSampleStage, make_gif_anim_media

    ds = ray.data.from_arrow(make_gif_anim_media(64, seed=23))
    return ds.map_batches(
        VideoFrameSampleStage, fn_constructor_kwargs={"decoder": "library", "every": 4},
        concurrency=2, batch_size=16, batch_format="pyarrow",
    )


def q_media_gif_anim_frames_check(sf_dir: str):
    """Driver-visible invariant for the animated-GIF path: the actor-pool
    frame sample over the seeded table must equal a single-process run
    row-for-row (micros-rounded means), the emitted row count must equal
    the exact sum of ceil(n_frames/4) from the CONTAINER index, and the
    green channel of a decoded frame must identify its frame number
    (frame f is painted with palette green 12·f, proving the seek
    composited the RIGHT frame).  Oracle pins mismatch_rows=0,
    frame_count_ok=1, seek_ok=1."""
    from ..functions.gif import decode_gif_frame, gif_n_frames
    from ..stages.media import VideoFrameSampleStage, make_gif_anim_media

    eng = q_media_gif_anim_frames(sf_dir).to_pandas() \
        .sort_values(["media_id", "frame_no"]).reset_index(drop=True)
    tbl = make_gif_anim_media(64, seed=23)
    stage = VideoFrameSampleStage(decoder="library", every=4)  # no Ray
    ref = stage(tbl).to_pandas() \
        .sort_values(["media_id", "frame_no"]).reset_index(drop=True)
    for df in (eng, ref):
        df["frame_mean"] = _micros(df["frame_mean"].to_numpy())
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns.tolist()].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())
    counts = [gif_n_frames(p.as_py()) for p in tbl["payload"]]
    expect_rows = int(sum((int(c) + 3) // 4 for c in counts))
    frame_count_ok = int(len(eng) == expect_rows
                         and counts == tbl["n_frames"].to_pylist())
    # seek correctness: frame 8 of payload 0 is painted green ≈ 12*8
    p0 = tbl["payload"][0].as_py()
    img = decode_gif_frame(p0, 8)
    seek_ok = int(abs(float(img[:, :, 1].mean()) - 96.0) < 10.0)
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64"),
                         "frame_count_ok": pd.array([frame_count_ok], dtype="int64"),
                         "seek_ok": pd.array([seek_ok], dtype="int64")})


def _warc_fixture_dir(sf_dir: str) -> str:
    """Build-once cache of a sharded WARC.gz corpus derived 1:1 from the
    documents table (the fixture-generator step): each doc becomes a
    spec-shaped response record (HTTP envelope, per-record gzip member,
    every 5th record chunked-transfer-coded) with
    url = https://{source}.example.com/doc/{doc_id} — so a SQL oracle
    over `documents` pins the WARC reader end-to-end."""
    import pyarrow.parquet as pq

    from ..functions.fingerprint import wrap_html
    from ..sources.warc import write_warc

    src_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_path)
    tag = (f"{os.path.basename(os.path.normpath(sf_dir)) or 'sf'}"
           f"-{st.st_size}-{int(st.st_mtime)}")
    root = os.path.join("/tmp", "ffr_warc", tag)
    done = os.path.join(root, "_DONE")
    if not os.path.exists(done):
        os.makedirs(root, exist_ok=True)
        tbl = pq.read_table(src_path, columns=["doc_id", "text", "source"])
        ids = tbl["doc_id"].to_numpy()
        texts = tbl["text"].to_pylist()
        srcs = tbl["source"].to_pylist()
        n_shards = 8
        shards: list[list[dict]] = [[] for _ in range(n_shards)]
        for i in range(len(ids)):
            did = int(ids[i])
            shards[did % n_shards].append({
                "url": f"https://{srcs[i]}.example.com/doc/{did}",
                "ts_ms": BASE_TS_MS + did * 1000,
                "html": wrap_html(texts[i]),
            })
        for s, recs in enumerate(shards):
            write_warc(recs, os.path.join(root, f"shard-{s:03d}.warc.gz"),
                       gzip_members=True, chunked_every=5)
        with open(done, "w") as f:
            f.write(str(len(ids)))
    return root


def q_warc_ingest(sf_dir: str):
    """S1 ingest analog over the archive format crawls actually ship:
    read a sharded WARC.gz corpus (one task per file — the format's
    natural ~1 GB blocks), de-gzip members + Content-Length framing +
    HTTP de-chunking inside ``map_batches``, extract text with the
    shared Arrow kernel, and aggregate per crawl source.  The corpus is
    derived 1:1 from the documents table, so the SQL oracle pins the
    whole reader: every record recovered, byte-exact bodies (char sums
    match), no dup/dropped frames.  Reference: Kafka consumption
    ``src/flink_job/kafka_config.py:24-31`` → bounded-archive mapping
    (SURVEY.md §2.1 S1)."""
    import glob as _glob

    from ..functions.fingerprint import extract_text
    from ..sources.warc import read_warc
    from ..stages.shuffle import grouped_map

    root = _warc_fixture_dir(sf_dir)
    ds = read_warc(sorted(_glob.glob(os.path.join(root, "*.warc.gz"))))

    def partial(batch: pa.Table) -> pd.DataFrame:
        txt = extract_text(batch["html"])
        src = pc.struct_field(
            pc.extract_regex(batch["url"], r"https://(?P<s>[^.]+)\."), "s")
        ok = pc.equal(batch["http_status"], pa.scalar(200, pa.int32()))
        t = pa.table({"source": src, "n_chars": pc.utf8_length(txt),
                      "ok": ok})
        df = t.to_pandas()
        return df[df["ok"]].groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))

    parts = ds.map_batches(partial, batch_format="pyarrow")
    final = grouped_map(parts, ["source"], _combine_partials,
                        fn_kwargs={"keys": ["source"],
                                   "sums": ["n_docs", "total_chars"]})
    df = final.to_pandas()
    df["n_docs"] = df["n_docs"].astype(np.int64)
    df["total_chars"] = df["total_chars"].astype(np.int64)
    return df.sort_values("source").reset_index(drop=True)


SQL_WARC_INGEST = """
SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
FROM documents GROUP BY source ORDER BY source
"""


def _wet_fixture_dir(sf_dir: str) -> str:
    """Build-once cache of a sharded WET.gz corpus (WARC conversion
    records — extracted plain text, the form LLM pipelines consume)
    derived 1:1 from the documents table, lang carried in the URL path
    so the reader side recovers it without a join."""
    import pyarrow.parquet as pq

    from ..sources.warc import write_wet

    src_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_path)
    tag = (f"{os.path.basename(os.path.normpath(sf_dir)) or 'sf'}"
           f"-{st.st_size}-{int(st.st_mtime)}")
    root = os.path.join("/tmp", "ffr_wet", tag)
    done = os.path.join(root, "_DONE")
    if not os.path.exists(done):
        os.makedirs(root, exist_ok=True)
        tbl = pq.read_table(src_path, columns=["doc_id", "text", "lang", "source"])
        ids = tbl["doc_id"].to_numpy()
        texts = tbl["text"].to_pylist()
        langs = tbl["lang"].to_pylist()
        srcs = tbl["source"].to_pylist()
        n_shards = 8
        shards: list[list[dict]] = [[] for _ in range(n_shards)]
        for i in range(len(ids)):
            did = int(ids[i])
            shards[did % n_shards].append({
                "url": f"https://{srcs[i]}.example.com/{langs[i]}/doc/{did}",
                "ts_ms": BASE_TS_MS + did * 1000,
                "text": texts[i],
            })
        for s, recs in enumerate(shards):
            write_wet(recs, os.path.join(root, f"shard-{s:03d}.warc.wet.gz"))
        with open(done, "w") as f:
            f.write(str(len(ids)))
    return root


def q_wet_ingest(sf_dir: str):
    """S1 ingest analog over WET files (WARC *conversion* records — the
    extracted-plain-text form LLM corpus pipelines actually consume from
    crawls): same streaming reader as ``warc_ingest`` but no HTTP
    envelope, text decoded straight from record bodies, aggregated per
    language.  The corpus is derived 1:1 from the documents table, so
    the SQL oracle pins byte-exact text recovery."""
    import glob as _glob

    from ..sources.warc import read_wet
    from ..stages.shuffle import grouped_map

    root = _wet_fixture_dir(sf_dir)
    ds = read_wet(sorted(_glob.glob(os.path.join(root, "*.warc.wet.gz"))))

    def partial(batch: pa.Table) -> pd.DataFrame:
        lang = pc.struct_field(
            pc.extract_regex(batch["url"], r"\.com/(?P<g>[^/]+)/doc/"), "g")
        t = pa.table({"lang": lang,
                      "n_chars": pc.utf8_length(batch["text"])})
        return t.to_pandas().groupby("lang", as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))

    parts = ds.map_batches(partial, batch_format="pyarrow")
    final = grouped_map(parts, ["lang"], _combine_partials,
                        fn_kwargs={"keys": ["lang"],
                                   "sums": ["n_docs", "total_chars"]})
    df = final.to_pandas()
    df["n_docs"] = df["n_docs"].astype(np.int64)
    df["total_chars"] = df["total_chars"].astype(np.int64)
    return df.sort_values("lang").reset_index(drop=True)


SQL_WET_INGEST = """
SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q_warc_cdx_lookup(sf_dir: str):
    """Random access into the crawl, the cc-index pattern: build the
    capture index over the WARC shards (header-only parse, one task per
    archive), select ~1/7 of the records by doc id, then fetch ONLY
    those byte ranges (seek + bounded read per record inside
    ``map_batches`` — archives live on shared storage, so any worker can
    range-read any shard) and aggregate the recovered text per source.
    The SQL oracle over `documents` pins that the index addressed, the
    range reads recovered, and the parse decoded exactly the selected
    subset — without ever scanning the unselected 6/7 of the corpus."""
    import glob as _glob

    from ..functions.fingerprint import extract_text
    from ..sources.warc import fetch_warc_records, index_warc_files
    from ..stages.shuffle import grouped_map

    root = _warc_fixture_dir(sf_dir)
    idx = index_warc_files(sorted(_glob.glob(os.path.join(root, "*.warc.gz"))))

    def pick(batch: pa.Table) -> pa.Table:
        did = pc.struct_field(
            pc.extract_regex(batch["url"], r"/doc/(?P<d>\d+)$"), "d") \
            .cast(pa.int64())
        mod7 = pc.subtract(did, pc.multiply(pc.divide(did, 7), 7))
        return batch.filter(pc.equal(mod7, pa.scalar(0, pa.int64())))

    def fetch_and_agg(batch: pa.Table) -> pd.DataFrame:
        rows = fetch_warc_records(batch)
        txt = extract_text(rows["html"])
        src = pc.struct_field(
            pc.extract_regex(rows["url"], r"https://(?P<s>[^.]+)\."), "s")
        t = pa.table({"source": src, "n_chars": pc.utf8_length(txt)})
        return t.to_pandas().groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))

    parts = idx.map_batches(pick, batch_format="pyarrow") \
        .map_batches(fetch_and_agg, batch_format="pyarrow")
    final = grouped_map(parts, ["source"], _combine_partials,
                        fn_kwargs={"keys": ["source"],
                                   "sums": ["n_docs", "total_chars"]})
    df = final.to_pandas()
    df["n_docs"] = df["n_docs"].astype(np.int64)
    df["total_chars"] = df["total_chars"].astype(np.int64)
    return df.sort_values("source").reset_index(drop=True)


SQL_WARC_CDX_LOOKUP = """
SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
FROM documents WHERE doc_id % 7 = 0
GROUP BY source ORDER BY source
"""


def _lang_model_path(sf_dir: str) -> str:
    """Train-once cache of the REAL model artifact (the fixture-generator
    step): deterministic training on the labeled fixture corpus
    (``fixtures.make_labeled_corpus`` — the documents table's own lang
    column is independent noise by construction, so the trainable corpus
    is a fixture concern, like the reference's pre-trained LLM),
    quantized and saved as .npz for the scorer actors to load."""
    from ..fixtures import make_labeled_corpus
    from ..functions.model import save_lang_model, train_lang_model

    root = os.path.join("/tmp", "ffr_models")
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "langid_fixture_v1.npz")
    if not os.path.exists(path):
        corpus = make_labeled_corpus()
        model = train_lang_model(corpus["text"], corpus["label"].to_pylist())
        tmp = os.path.join(root, f"langid_fixture_v1.tmp-{os.getpid()}.npz")
        save_lang_model(tmp, model)
        os.replace(tmp, path)  # atomic: concurrent trainers converge
    return path


def q_model_lang_score(sf_dir: str):
    """T6 with a real model artifact (reference ``llm_job.py:254-332``
    analog): the trained quantized softmax language model rides an
    actor-pool ``map_batches`` stage — artifact np.load once per actor
    in ``__init__``, exact integer scoring per batch.  Rows-only (the
    trained weights are not SQL-expressible); the distributed-vs-single
    process invariant is ``model_lang_score_check``."""
    from ..stages.textops import ModelScorerStage

    path = _lang_model_path(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(ModelScorerStage, fn_constructor_kwargs={"model_path": path},
                         concurrency=(1, 4), batch_size=256,
                         batch_format="pyarrow")
    return out.select_columns(["doc_id", "model_lang", "model_score",
                               "model_margin"])


def q_model_lang_score_check(sf_dir: str):
    """Driver-visible invariant for the model scorer: the actor-pool run
    must equal a single-process scoring sweep of the same artifact
    row-exactly (exact integer scores make this zero-tolerance), and the
    artifact must be a genuinely LEARNED model (held-out accuracy on the
    labeled fixture corpus well above chance).  Oracle pins
    mismatch_rows=0 and accuracy_floor=1."""
    import pyarrow.parquet as pq

    from ..fixtures import make_labeled_corpus
    from ..functions.model import load_lang_model, score_texts

    eng = q_model_lang_score(sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    model = load_lang_model(_lang_model_path(sf_dir))
    pred, best, margin = score_texts(tbl["text"], model)
    classes = np.asarray(model["classes"], dtype=object)
    ref = pd.DataFrame({
        "doc_id": tbl["doc_id"].to_numpy(),
        "model_lang": classes[pred],
        "model_score": best,
        "model_margin": margin,
    }).sort_values("doc_id").reset_index(drop=True)
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns.tolist()].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())
    held = make_labeled_corpus(seed=78)  # disjoint from the training seed
    hp, _, _ = score_texts(held["text"], model)
    acc = float((classes[hp] ==
                 np.asarray(held["label"], dtype=object)).mean())
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64"),
                         "accuracy_floor": pd.array([int(acc >= 0.9)],
                                                    dtype="int64")})


def q_lang_id(sf_dir: str):
    """Language-ID heuristic (actor-pool stage).  The marker-count vote
    is exact integer arithmetic, so it has a full SQL oracle: per-language
    scores as non-overlapping substring counts (replace-based in DuckDB,
    count_substring in Arrow — identical greedy-left semantics), argmax
    with first-wins tie-break over the fixed language order, 'und' when
    all scores are zero."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(LangIdStage, concurrency=2, batch_format="pyarrow")
    return out.select_columns(["doc_id", "lang_pred"])


SQL_LANG_ID = r"""
WITH s AS (SELECT doc_id, lower(text) AS t FROM documents),
sc AS (
  SELECT doc_id,
     (length(t) - length(replace(t, ' the ', ''))) // 5
   + (length(t) - length(replace(t, ' and ', ''))) // 5
   + (length(t) - length(replace(t, ' of ', '')))  // 4
   + (length(t) - length(replace(t, 'ing ', '')))  // 4
   + (length(t) - length(replace(t, ' to ', '')))  // 4 AS en,
     (length(t) - length(replace(t, ' der ', ''))) // 5
   + (length(t) - length(replace(t, ' und ', ''))) // 5
   + (length(t) - length(replace(t, ' die ', ''))) // 5
   + (length(t) - length(replace(t, ' ist ', ''))) // 5
   + (length(t) - length(replace(t, 'sch', '')))   // 3 AS de,
     (length(t) - length(replace(t, ' le ', '')))  // 4
   + (length(t) - length(replace(t, ' la ', '')))  // 4
   + (length(t) - length(replace(t, ' les ', ''))) // 5
   + (length(t) - length(replace(t, ' est ', ''))) // 5
   + (length(t) - length(replace(t, ' de ', '')))  // 4 AS fr,
     (length(t) - length(replace(t, ' el ', '')))  // 4
   + (length(t) - length(replace(t, ' la ', '')))  // 4
   + (length(t) - length(replace(t, ' que ', ''))) // 5
   + (length(t) - length(replace(t, ' los ', ''))) // 5
   + (length(t) - length(replace(t, 'ción', '')))  // 4 AS es,
     (length(t) - length(replace(t, ' il ', '')))  // 4
   + (length(t) - length(replace(t, ' che ', ''))) // 5
   + (length(t) - length(replace(t, ' di ', '')))  // 4
   + (length(t) - length(replace(t, ' per ', ''))) // 5
   + (length(t) - length(replace(t, 'zione', ''))) // 5 AS it
  FROM s)
SELECT doc_id,
  CASE WHEN greatest(en, de, fr, es, it) = 0 THEN 'und'
       WHEN en >= de AND en >= fr AND en >= es AND en >= it THEN 'en'
       WHEN de >= fr AND de >= es AND de >= it THEN 'de'
       WHEN fr >= es AND fr >= it THEN 'fr'
       WHEN es >= it THEN 'es'
       ELSE 'it' END AS lang_pred
FROM sc
"""


def q_text_features(sf_dir: str):
    """Quality/text-feature stage with a full SQL oracle: counts as
    BIGINT, every ratio and the composite quality score as
    floor(x*1e6+0.5) micros over raw doubles — the engine and DuckDB
    evaluate the identical IEEE expression tree.  The non-SQL sketch
    columns (rolling fingerprint, simhash) stay on TextFeatureStage and
    are pytest-covered."""
    from ..functions.textstats import (
        bpe_ish_token_count,
        quality_features,
        whitespace_token_count,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def micros(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        f = quality_features(t)
        cols = {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(f["n_chars"], pa.int64()),
            "n_tokens_ws": whitespace_token_count(t).cast(pa.int64()),
            "n_tokens_bpe": bpe_ish_token_count(t).cast(pa.int64()),
        }
        for name in ("mean_token_len", "punct_ratio", "stopword_ratio",
                     "upper_ratio", "digit_ratio", "quality_score"):
            cols[name + "_micros"] = pa.array(
                np.floor(f[name] * 1e6 + 0.5).astype(np.int64), pa.int64()
            )
        return pa.table(cols)

    return ds.map_batches(micros, batch_format="pyarrow")


_SQL_STOPWORD_ALT = ",".join(
    f"'{w}'" for w in (
        "the a an and or of to in is are was be on for with as at by it "
        "this that from not have has had but they you we he she i"
    ).split()
)

SQL_TEXT_FEATURES = r"""
WITH f AS (
  SELECT doc_id,
    CAST(length(text) AS DOUBLE) AS n_chars,
    CAST(COALESCE(array_length(regexp_extract_all(text, '\S+')), 0) AS DOUBLE) AS n_tokens,
    CAST(COALESCE(array_length(regexp_extract_all(text, '[\.,;:!\?"''\(\)\[\]]')), 0) AS DOUBLE) AS n_punct,
    CAST(COALESCE(array_length(regexp_extract_all(text, '[A-Z]')), 0) AS DOUBLE) AS n_upper,
    CAST(COALESCE(array_length(regexp_extract_all(text, '[0-9]')), 0) AS DOUBLE) AS n_digit,
    CAST(COALESCE(array_length(regexp_extract_all(text, '\s')), 0) AS DOUBLE) AS n_ws,
    CAST(COALESCE(length(list_filter(string_split_regex(lower(text), '\s+'),
         x -> x IN (__STOP__))), 0) AS DOUBLE) AS n_stop,
    CAST(COALESCE(array_length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')), 0) AS BIGINT) AS n_tokens_bpe
  FROM documents),
r AS (
  SELECT doc_id,
    CAST(n_chars AS BIGINT) AS n_chars,
    CAST(n_tokens AS BIGINT) AS n_tokens_ws,
    n_tokens_bpe,
    (n_chars - n_ws) / greatest(n_tokens, 1.0) AS mean_token_len,
    n_punct / greatest(n_chars, 1.0) AS punct_ratio,
    n_stop / greatest(n_tokens, 1.0) AS stopword_ratio,
    n_upper / greatest(n_chars, 1.0) AS upper_ratio,
    n_digit / greatest(n_chars, 1.0) AS digit_ratio,
    least(greatest(n_tokens / 20.0, 0.0), 1.0) AS length_score
  FROM f)
SELECT doc_id, n_chars, n_tokens_ws, n_tokens_bpe,
  CAST(floor(mean_token_len * 1000000 + 0.5) AS BIGINT) AS mean_token_len_micros,
  CAST(floor(punct_ratio * 1000000 + 0.5) AS BIGINT) AS punct_ratio_micros,
  CAST(floor(stopword_ratio * 1000000 + 0.5) AS BIGINT) AS stopword_ratio_micros,
  CAST(floor(upper_ratio * 1000000 + 0.5) AS BIGINT) AS upper_ratio_micros,
  CAST(floor(digit_ratio * 1000000 + 0.5) AS BIGINT) AS digit_ratio_micros,
  CAST(floor(least(greatest(
        0.4 * length_score
      + 0.3 * least(greatest(stopword_ratio * 5.0, 0.0), 1.0)
      + 0.3 * (1.0 - least(greatest(punct_ratio * 5.0 + digit_ratio * 2.0, 0.0), 1.0)),
      0.0), 1.0) * 1000000 + 0.5) AS BIGINT) AS quality_score_micros
FROM r
""".replace("__STOP__", _SQL_STOPWORD_ALT)


# ---------------------------------------------------------------------------
# Embedding similarity over `embeddings`
# ---------------------------------------------------------------------------

def q_embedding_near_pairs(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return dd.embedding_cosine_pairs(ds, threshold=0.4)


def q_embedding_near_pairs_lsh(sf_dir: str):
    """Scale path: random-hyperplane LSH banding, no full-matrix
    broadcast.  At this fixture's loose 0.4 threshold we widen to 32
    bands × 2 bits (miss prob per true pair < 1e-7), so the output is
    checked against the SAME exact SQL oracle as the brute-force query;
    recall vs brute force is additionally asserted in tests.  Real
    near-dup deployments (threshold ≥ 0.9) use the default 8 × 8-bit
    banding, whose buckets stay small at scale."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return dd.embedding_cosine_pairs_lsh(ds, threshold=0.4, n_bands=32)


SQL_EMBEDDING_NEAR_PAIRS = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(floor(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5) AS BIGINT) AS cos_sim_micros
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE CAST(floor(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5) AS BIGINT) >= 400000
"""

def q_semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023) over the embeddings table: spherical
    k-means semantic clusters, then keep an item iff no LOWER-id member
    of its cluster reaches the cosine threshold.  The fixture's planted
    near-pairs sit at >= 0.4, so the query runs at that threshold to be
    non-vacuous (real deployments use ~0.95).  Rows-only for the driver
    (iterative k-means is not SQL-expressible); the companion
    `semantic_dedup_check` pins the distributed run to a single-process
    reference recompute, and known-duplicate behavior is pytest-covered
    (tests/test_dedup_similarity.py)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return sm.semantic_dedup_table(ds, threshold=0.4, k=16, iters=8)


def q_semantic_dedup_check(sf_dir: str):
    """Inline invariant (same contract as the dist-CC checks): the
    block-parallel EM + hash-exchanged intra-cluster confirm must equal
    a no-blocking single-process recompute row-for-row across all four
    output columns.  Expected mismatch_rows = 0."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return sm.semantic_dedup_mismatch(ds, threshold=0.4, k=16, iters=8)


N_ANN_QUERIES = 8
ANN_K = 5


def _query_vectors(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    df = t.to_pandas()
    df = df[df["vec_id"] < N_ANN_QUERIES].sort_values("vec_id")
    return np.stack(df["embedding"].to_numpy()), df["vec_id"].to_numpy()


def q_ann_topk(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q, qids = _query_vectors(sf_dir)
    return sim.brute_force_topk(ds, q, qids, k=ANN_K)


SQL_ANN_TOPK = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
s AS (
  SELECT q.query_id, e.vec_id,
         CAST(floor(list_cosine_similarity(q.qv, e.v) * 1000000 + 0.5) AS BIGINT) AS cos_sim_micros
  FROM q CROSS JOIN e WHERE e.vec_id != q.query_id
), r AS (
  SELECT query_id, vec_id, cos_sim_micros,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim_micros DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, cos_sim_micros FROM r WHERE rank <= 5
"""


def q_ann_topk_ivf(sf_dir: str):
    """IVF approximate ANN (rows-only; recall vs brute force is asserted
    in tests and reported by bench.py).  The fixture's embeddings are
    near-uniform on the sphere (no cluster structure), so true neighbors
    smear across coarse cells and a large probe fraction (6 of 8 cells)
    is needed for recall ≥ 0.9; real embedding corpora cluster, allowing
    n_cells ~ sqrt(n) with n_probe a small fraction."""
    import pyarrow.parquet as pq

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
    sample = np.stack(t["embedding"].to_pandas().head(2000).to_numpy())
    cents = sim.train_centroids(sample, n_cells=8, seed=0)
    q, qids = _query_vectors(sf_dir)
    return sim.ivf_topk(ds, q, qids, cents, k=ANN_K, n_probe=6)


def q_ann_topk_ivf_check(sf_dir: str):
    """Driver-visible IVF quality invariant: recall@k of the IVF run vs
    the (oracle-green) brute-force ground truth on the same queries,
    floored to an in-bound flag the oracle pins (recall >= 0.8 at the
    query's probe settings; bench.py reports the raw recall each run)."""
    ivf = q_ann_topk_ivf(sf_dir)
    exact = q_ann_topk(sf_dir)
    if not isinstance(ivf, pd.DataFrame):
        ivf = ivf.to_pandas()
    if not isinstance(exact, pd.DataFrame):
        exact = exact.to_pandas()
    rec = sim.ivf_recall(exact, ivf)
    return pd.DataFrame({
        "recall_at_least_080": pd.array([1 if rec >= 0.8 else 0], dtype="int64")})


def q_ann_topk_pq(sf_dir: str):
    """Product-quantization ANN (rows-only; recall pinned by the paired
    check query): vectors compress to 8 uint8 codes (64 floats -> 8
    bytes, the form a 100-TB embedding corpus persists), blocks are
    scanned by ADC table lookups instead of a full matmul, and only a
    per-query shortlist gets exact similarities (rerank=32)."""
    import pyarrow.parquet as pq

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
    sample = np.stack(t["embedding"].to_pandas().head(2000).to_numpy())
    books = sim.train_pq(sample, m_sub=8, n_codes=64, seed=0)
    q, qids = _query_vectors(sf_dir)
    return sim.pq_topk(ds, q, qids, books, k=ANN_K, rerank=32)


def q_ann_topk_pq_check(sf_dir: str):
    """Driver-visible PQ quality invariant (same pattern as the IVF
    check): recall@k of the ADC+rerank run vs the oracle-green brute
    force, pinned at >= 0.8."""
    pq_res = q_ann_topk_pq(sf_dir)
    exact = q_ann_topk(sf_dir)
    if not isinstance(pq_res, pd.DataFrame):
        pq_res = pq_res.to_pandas()
    if not isinstance(exact, pd.DataFrame):
        exact = exact.to_pandas()
    rec = sim.ivf_recall(exact, pq_res)
    return pd.DataFrame({
        "recall_at_least_080": pd.array([1 if rec >= 0.8 else 0], dtype="int64")})


def q_ann_topk_ivfpq(sf_dir: str):
    """IVF-PQ ANN (rows-only; recall pinned by the paired check): the
    FAISS-canonical composition — coarse cells bound how much of the
    corpus each query touches, PQ codes bound the bytes per touched
    vector (64 floats -> 8 uint8), exact rerank only on the ADC
    shortlist.  Probe/rerank settings chosen for recall >= 0.8 on the
    fixture's unclustered sphere (see q_ann_topk_ivf's note)."""
    import pyarrow.parquet as pq

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
    sample = np.stack(t["embedding"].to_pandas().head(2000).to_numpy())
    cents = sim.train_centroids(sample, n_cells=8, seed=0)
    books = sim.train_pq(sample, m_sub=8, n_codes=64, seed=0)
    q, qids = _query_vectors(sf_dir)
    return sim.ivfpq_topk(ds, q, qids, cents, books, k=ANN_K,
                          n_probe=6, rerank=48)


def q_ann_topk_ivfpq_check(sf_dir: str):
    """Driver-visible IVF-PQ quality invariant (same pattern as the IVF
    and PQ checks): recall@k vs the oracle-green brute force >= 0.8."""
    res = q_ann_topk_ivfpq(sf_dir)
    exact = q_ann_topk(sf_dir)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    if not isinstance(exact, pd.DataFrame):
        exact = exact.to_pandas()
    rec = sim.ivf_recall(exact, res)
    return pd.DataFrame({
        "recall_at_least_080": pd.array([1 if rec >= 0.8 else 0], dtype="int64")})


# ---------------------------------------------------------------------------
# Relational operator coverage (TPC-H-ish tables)
# ---------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    """A1/M8 relational analog (TPC-H Q1 shape): vectorized derived
    columns + partial per-block aggregation + small final groupby."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        ep = batch["l_extendedprice"].to_numpy()
        disc = batch["l_discount"].to_numpy()
        tax = batch["l_tax"].to_numpy()
        df = pd.DataFrame({
            "l_returnflag": batch["l_returnflag"].to_pandas(),
            "l_linestatus": batch["l_linestatus"].to_pandas(),
            "qty": batch["l_quantity"].to_numpy(),
            "base": ep,
            "disc_price": ep * (1.0 - disc),
            "charge": ep * (1.0 - disc) * (1.0 + tax),
        })
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False)
        out = g.agg(sum_qty=("qty", "sum"), sum_base=("base", "sum"),
                    sum_disc=("disc_price", "sum"), sum_charge=("charge", "sum"),
                    count_order=("qty", "size")).reset_index()
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow")
    final = grouped_map(
        parts, ["l_returnflag", "l_linestatus"], _combine_partials,
        fn_kwargs={"keys": ["l_returnflag", "l_linestatus"],
                   "sums": ["sum_qty", "sum_base", "sum_disc", "sum_charge", "count_order"]},
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": pa.array(batch["sum_qty"].to_numpy().astype(np.int64), pa.int64()),
            "sum_base_cents": pa.array(_cents(batch["sum_base"].to_numpy()), pa.int64()),
            "sum_disc_cents": pa.array(_cents(batch["sum_disc"].to_numpy()), pa.int64()),
            "sum_charge_cents": pa.array(_cents(batch["sum_charge"].to_numpy()), pa.int64()),
            "count_order": batch["count_order"].cast(pa.int64()),
        })

    return final.map_batches(finish, batch_format="pyarrow")


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       CAST(floor(SUM(l_extendedprice) * 100 + 0.5) AS BIGINT) AS sum_base_cents,
       CAST(floor(SUM(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5) AS BIGINT) AS sum_disc_cents,
       CAST(floor(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) * 100 + 0.5) AS BIGINT) AS sum_charge_cents,
       COUNT(*) AS count_order
FROM lineitem GROUP BY 1, 2
"""


def _segment_lookup_ref(sf_dir: str):
    """Broadcast (sorted c_custkey, c_mktsegment) ARRAYS — probed with one
    ``np.searchsorted`` per batch (the repo's packed-key idiom, cf.
    ``q_regional_volume``) instead of a per-row Python-object dict
    ``Series.map``: ~5x cheaper and no per-row object churn."""
    import pyarrow.parquet as pq

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    keys = cust["c_custkey"].to_numpy().astype(np.int64)
    order = np.argsort(keys, kind="stable")
    vals = cust["c_mktsegment"].to_numpy(zero_copy_only=False)[order]
    return ray.put((keys[order], vals))


def _probe_segment(lookup, custkey: np.ndarray) -> np.ndarray:
    """orders.o_custkey is a guaranteed FK into customer, so the
    searchsorted position is always an exact hit."""
    keys, vals = lookup
    pos = np.minimum(np.searchsorted(keys, custkey), len(keys) - 1)
    return vals[pos]


def q_segment_orders(sf_dir: str):
    """J2 analog: broadcast hash join — the small customer side is shipped
    once via ray.put and probed inside map_batches (no shuffle join)."""
    lookup_ref = _segment_lookup_ref(sf_dir)
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def probe(batch: pa.Table) -> pd.DataFrame:
        seg = _probe_segment(ray.get(lookup_ref),
                             batch["o_custkey"].to_numpy().astype(np.int64))
        df = pd.DataFrame({"c_mktsegment": seg, "total": batch["o_totalprice"].to_numpy()})
        g = df.groupby("c_mktsegment", sort=False)["total"]
        return g.agg(n_orders="size", sum_total="sum").reset_index()

    parts = ds.map_batches(probe, batch_format="pyarrow")
    final = grouped_map(
        parts, ["c_mktsegment"], _combine_partials,
        fn_kwargs={"keys": ["c_mktsegment"], "sums": ["n_orders", "sum_total"]},
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": batch["c_mktsegment"],
            "n_orders": batch["n_orders"].cast(pa.int64()),
            "sum_total_cents": pa.array(_cents(batch["sum_total"].to_numpy()), pa.int64()),
        })

    return final.map_batches(finish, batch_format="pyarrow")


SQL_SEGMENT_ORDERS = """
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(floor(SUM(o.o_totalprice) * 100 + 0.5) AS BIGINT) AS sum_total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


def q_mapped_lookup(sf_dir: str):
    """S10 analog: metadata mapping loaded from a FILE by the generic
    mapping-table loader (``sources/mapping.py``, the Excel-sheet
    ingestion analog of process_odr.py:699-711), broadcast once via
    ray.put and probed inside map_batches."""
    from ..sources.mapping import load_mapping_table

    lut = load_mapping_table(os.path.join(sf_dir, "nation.parquet"),
                             "n_nationkey", "n_name")
    # packed-key searchsorted probe (the repo's broadcast-lookup idiom,
    # cf. _probe_segment): sorted int keys + parallel value array beat a
    # per-row dict probe that materializes Python objects
    keys = np.array(sorted(lut), dtype=np.int64)
    vals = np.array([lut[k] for k in keys], dtype=object)
    lut_ref = ray.put((keys, vals))
    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def probe(batch: pa.Table) -> pd.DataFrame:
        ks, vs = ray.get(lut_ref)
        nk = batch["c_nationkey"].to_numpy().astype(np.int64)
        pos = np.minimum(np.searchsorted(ks, nk), len(ks) - 1)
        name = pd.Series(vs[pos])
        return (name.value_counts().rename("n_customers")
                .rename_axis("nation_name").reset_index())

    parts = ds.map_batches(probe, batch_format="pyarrow")
    final = grouped_map(parts, ["nation_name"], _combine_partials,
                        fn_kwargs={"keys": ["nation_name"], "sums": ["n_customers"]})

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "nation_name": batch["nation_name"],
            "n_customers": batch["n_customers"].cast(pa.int64()),
        })

    return final.map_batches(finish, batch_format="pyarrow")


SQL_MAPPED_LOOKUP = """
SELECT n.n_name AS nation_name, COUNT(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""


def q_top_orders(sf_dir: str):
    """O3 analog: global sort + limit (top-k by totalprice)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "total_cents": pa.array(_cents(batch["o_totalprice"].to_numpy()), pa.int64()),
        })

    return top.map_batches(finish, batch_format="pyarrow")


SQL_TOP_ORDERS = """
SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_filter_revenue(sf_dir: str):
    """TPC-H Q6 shape: predicate pushdown + single global aggregate."""
    ds = _read(sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        sd = batch["l_shipdate"].cast(pa.int64()).to_numpy() // 1000  # us -> ms
        lo = int(pd.Timestamp("1995-01-01").value // 1_000_000)
        hi = int(pd.Timestamp("1996-01-01").value // 1_000_000)
        disc = batch["l_discount"].to_numpy()
        qty = batch["l_quantity"].to_numpy()
        ep = batch["l_extendedprice"].to_numpy()
        m = (sd >= lo) & (sd < hi) & (disc >= 0.05) & (disc <= 0.07) & (qty < 24)
        return pd.DataFrame({"revenue": [float((ep[m] * disc[m]).sum())], "n_rows": [int(m.sum())]})

    # one partial row per block — the global combine is a trivial
    # driver-side sum of the (tiny) combiner outputs
    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "revenue_cents": _cents(pdf["revenue"].sum()).reshape(1),
        "n_rows": [int(pdf["n_rows"].sum())],
    })


SQL_FILTER_REVENUE = """
SELECT CAST(floor(COALESCE(SUM(l_extendedprice * l_discount), 0) * 100 + 0.5) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def _uet_sweep(t: pa.Table) -> pd.DataFrame:
    g = t.to_pandas().groupby("user_id", sort=False)["event_type"]
    return pd.DataFrame({
        "n_types": g.nunique().astype(np.int64),
        "n_events": g.size().astype(np.int64),
    }).reset_index()


def q_user_event_types(sf_dir: str):
    """A5 analog: per-user distinct-type + event counts in one partition
    sweep (hash-partition by user; all of a user's rows co-located)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return grouped_map(ds, ["user_id"], _uet_sweep)


SQL_USER_EVENT_TYPES = """
SELECT user_id, COUNT(DISTINCT event_type) AS n_types, COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


DERIVED_FORMULAS = {
    "mag": "sqrt(abs(value))",
    "logv": "log(abs(value) + 1.0)",
}


def q_derived_expr(sf_dir: str):
    """M8 analog: user formula strings compiled to pyarrow.compute kernels
    (actor pool compiles once per actor), then aggregated."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    derived = ds.map_batches(
        DerivedColumnStage, fn_constructor_kwargs={"formulas": DERIVED_FORMULAS},
        concurrency=2, batch_format="pyarrow",
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "mag": batch["mag"].to_numpy(),
            "logv": batch["logv"].to_numpy(),
        })
        g = df.groupby("event_type", sort=False)
        return g.agg(sum_mag=("mag", "sum"), sum_logv=("logv", "sum")).reset_index()

    parts = derived.map_batches(partial, batch_format="pyarrow")
    final = grouped_map(
        parts, ["event_type"], _combine_partials,
        fn_kwargs={"keys": ["event_type"], "sums": ["sum_mag", "sum_logv"]},
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "sum_mag_cents": pa.array(_cents(batch["sum_mag"].to_numpy()), pa.int64()),
            "sum_logv_cents": pa.array(_cents(batch["sum_logv"].to_numpy()), pa.int64()),
        })

    return final.map_batches(finish, batch_format="pyarrow")


SQL_DERIVED_EXPR = """
SELECT event_type,
       CAST(floor(SUM(sqrt(abs(value))) * 100 + 0.5) AS BIGINT) AS sum_mag_cents,
       CAST(floor(SUM(ln(abs(value) + 1.0)) * 100 + 0.5) AS BIGINT) AS sum_logv_cents
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Rule DSL / pivot / value_counts / interval join / observation text (§2.10,
# A2, A4, J1-batch, M9/M10, §2.8-json)
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
MIN_10 = 600_000
ERR_SESSION_GAP = 1_800_000

RULES = [
    {"id": "r_and", "logic": "AND", "checks": [
        {"param": "error", "op": ">", "value": 10.0},
        {"param": "click", "op": "<=", "value": 12.0},
    ]},
    {"id": "r_or", "logic": "OR", "checks": [
        {"param": "view", "op": "between", "value": [5.0, 15.0]},
        {"param": "error", "op": "abs_gt", "value": 18.0},
    ]},
    {"id": "r_if", "logic": "IF",
     "if": [{"param": "click", "op": ">", "value": 10.0}],
     "then": [{"param": "error", "op": ">", "value": 8.0}],
     "else": [{"param": "view", "op": "<", "value": 6.0}]},
]


def _wide_means(t: pa.Table) -> pd.DataFrame:
    """A4 analog: long → wide pivot (implicit mean on duplicate cells,
    like the reference's pivot_table, process_odr.py:934-936) per
    (user, 5-min bucket)."""
    df = t.to_pandas()
    tms = df["ts"].astype("datetime64[ms]").astype("int64")
    df["bucket"] = (tms // SLIDE_5M) * SLIDE_5M
    w = df.pivot_table(index=["user_id", "bucket"], columns="event_type",
                       values="value", aggfunc="mean")
    return w.reindex(columns=EVENT_TYPES).reset_index()


def _pivot_sweep(t: pa.Table) -> pd.DataFrame:
    """Null-free wide cells: absent (user, bucket, event_type) cells emit
    avg=0 with n=0 instead of NULL, so pandas / Arrow / DuckDB null
    canonicalization can never diverge in the driver's value hash."""
    df = t.to_pandas()
    tms = df["ts"].astype("datetime64[ms]").astype("int64")
    df["bucket"] = (tms // SLIDE_5M) * SLIDE_5M
    w = df.pivot_table(index=["user_id", "bucket"], columns="event_type",
                       values="value", aggfunc=["mean", "size"])
    out = w.index.to_frame(index=False)
    for c in EVENT_TYPES:
        if ("mean", c) in w.columns:
            v = w[("mean", c)].to_numpy(dtype=np.float64)
            n = w[("size", c)].to_numpy(dtype=np.float64)
        else:
            v = np.full(len(w), np.nan)
            n = np.full(len(w), np.nan)
        miss = np.isnan(v)
        out[f"avg_{c}_cents"] = np.where(
            miss, 0, np.floor(v * 100.0 + 0.5)).astype(np.int64)
        out[f"n_{c}"] = np.where(np.isnan(n), 0, n).astype(np.int64)
    return out


def _hampel_repair_sweep(t: pa.Table) -> pd.DataFrame:
    """M6 repair variant: replace |value − rolling_median(7, centered)| >
    Δ outliers WITH the rolling median (helpers.py:104-122), then sum the
    repaired series per key."""
    df = t.to_pandas().sort_values(["event_type", "ts", "event_id"], kind="stable")
    g = df.groupby("event_type", sort=False)["value"]
    med = g.transform(lambda s: s.rolling(7, center=True, min_periods=1).median())
    v = df["value"].to_numpy()
    m = med.to_numpy()
    repaired = np.where(np.abs(v - m) > HAMPEL_DELTA, m, v)
    # per-row cents BEFORE summing: integer sums are order-independent,
    # so engine and SQL oracle agree exactly
    out = pd.DataFrame({"event_type": df["event_type"].to_numpy(), "rc": _cents(repaired)})
    gg = out.groupby("event_type", sort=False)["rc"]
    res = gg.agg(sum_repaired_cents="sum", n_rows="size").reset_index()
    res["sum_repaired_cents"] = res["sum_repaired_cents"].astype(np.int64)
    res["n_rows"] = res["n_rows"].astype(np.int64)
    return res[["event_type", "sum_repaired_cents", "n_rows"]]


def q_hampel_repair(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "event_id", "event_type", "value"])
    return grouped_map(ds, ["event_type"], _hampel_repair_sweep)


SQL_HAMPEL_REPAIR = """
WITH m AS (
  SELECT event_type, value,
         median(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS med
  FROM events
)
SELECT event_type,
       CAST(SUM(CAST(floor((CASE WHEN abs(value - med) > 25.0 THEN med ELSE value END) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_repaired_cents,
       COUNT(*) AS n_rows
FROM m GROUP BY 1
"""


def q_pivot_wide(sf_dir: str):
    """A4 analog: distributed long→wide pivot, one vectorized pivot_table
    per user hash partition."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])
    return grouped_map(ds, ["user_id"], _pivot_sweep)


SQL_PIVOT_WIDE = """
SELECT user_id, (epoch_ms(ts) // 300000) * 300000 AS bucket,
       COALESCE(CAST(floor(AVG(value) FILTER (event_type = 'click') * 100 + 0.5) AS BIGINT), 0) AS avg_click_cents,
       COUNT(*) FILTER (event_type = 'click') AS n_click,
       COALESCE(CAST(floor(AVG(value) FILTER (event_type = 'error') * 100 + 0.5) AS BIGINT), 0) AS avg_error_cents,
       COUNT(*) FILTER (event_type = 'error') AS n_error,
       COALESCE(CAST(floor(AVG(value) FILTER (event_type = 'purchase') * 100 + 0.5) AS BIGINT), 0) AS avg_purchase_cents,
       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
       COALESCE(CAST(floor(AVG(value) FILTER (event_type = 'signup') * 100 + 0.5) AS BIGINT), 0) AS avg_signup_cents,
       COUNT(*) FILTER (event_type = 'signup') AS n_signup,
       COALESCE(CAST(floor(AVG(value) FILTER (event_type = 'view') * 100 + 0.5) AS BIGINT), 0) AS avg_view_cents,
       COUNT(*) FILTER (event_type = 'view') AS n_view
FROM events GROUP BY 1, 2
"""


def _rules_sweep(t: pa.Table) -> pd.DataFrame:
    from ..functions.rules import evaluate_rules

    w = _wide_means(t)
    trig = evaluate_rules(w, RULES)
    parts = []
    for rid in trig.columns:
        hit = w.loc[trig[rid].to_numpy(), ["user_id", "bucket"]].copy()
        hit["rule_id"] = rid
        parts.append(hit)
    return pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
        {"user_id": pd.Series([], dtype="int64"),
         "bucket": pd.Series([], dtype="int64"),
         "rule_id": pd.Series([], dtype="object")})


def q_rule_alarms(sf_dir: str):
    """§2.10 rule DSL: declarative AND/OR/IF rules with the reference's
    operator set evaluated as vectorized masks over the per-(user, bucket)
    wide frame; emits one row per (user, bucket, rule) trigger."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])
    return grouped_map(ds, ["user_id"], _rules_sweep)


SQL_RULE_ALARMS = """
WITH w AS (
  SELECT user_id, (epoch_ms(ts) // 300000) * 300000 AS bucket,
         AVG(value) FILTER (event_type = 'click') AS click,
         AVG(value) FILTER (event_type = 'error') AS error,
         AVG(value) FILTER (event_type = 'view') AS view
  FROM events GROUP BY 1, 2
)
SELECT user_id, bucket, 'r_and' AS rule_id FROM w
WHERE COALESCE(error > 10.0, FALSE) AND COALESCE(click <= 12.0, FALSE)
UNION ALL
SELECT user_id, bucket, 'r_or' FROM w
WHERE COALESCE(view BETWEEN 5.0 AND 15.0, FALSE) OR COALESCE(abs(error) > 18.0, FALSE)
UNION ALL
SELECT user_id, bucket, 'r_if' FROM w
WHERE CASE WHEN COALESCE(click > 10.0, FALSE)
           THEN COALESCE(error > 8.0, FALSE)
           ELSE COALESCE(view < 6.0, FALSE) END
"""


RULES_DURATION = [
    # "error > 8 held for 600 s" — the reference's per-check duration_s
    # gate (process_odr.py:269-303; durations in kiln_rules.json)
    {"id": "rd_err600", "logic": "AND", "checks": [
        {"param": "error", "op": ">", "value": 8.0, "duration_s": 600}]},
    {"id": "rd_viewclick", "logic": "AND", "checks": [
        {"param": "view", "op": ">", "value": 5.0, "duration_s": 900},
        {"param": "click", "op": ">", "value": 3.0}]},
    {"id": "rd_purchase0", "logic": "OR", "checks": [
        {"param": "purchase", "op": ">", "value": 15.0, "duration_s": 0}]},
    # value-as-column threshold (helpers.py:397-400): error above click
    {"id": "rd_err_gt_click", "logic": "AND", "checks": [
        {"param": "error", "op": ">", "value": "click", "duration_s": 600}]},
]


def _rules_duration_sweep(t: pa.Table) -> pd.DataFrame:
    from ..functions.rules import duration_alarms

    return duration_alarms(_wide_means(t), RULES_DURATION,
                           ["user_id"], "bucket", SLIDE_5M)


def q_rule_alarms_duration(sf_dir: str):
    """§2.10 + duration composition: "condition held for duration_s"
    end-to-end — instantaneous rule masks gated by the reference's
    per-streak duration scan, one alarm per streak at the crossing row
    (process_odr.py:269-303)."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])
    return grouped_map(ds, ["user_id"], _rules_duration_sweep)


SQL_RULE_ALARMS_DURATION = """
WITH w AS (
  SELECT user_id, (epoch_ms(ts) // 300000) * 300000 AS bucket,
         AVG(value) FILTER (event_type = 'click') AS click,
         AVG(value) FILTER (event_type = 'error') AS error,
         AVG(value) FILTER (event_type = 'view') AS v_view,
         AVG(value) FILTER (event_type = 'purchase') AS purchase
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT *, COALESCE(bucket - lag(bucket) OVER (PARTITION BY user_id ORDER BY bucket), 300000) AS step
  FROM w
),
m AS (
  SELECT user_id, bucket, step,
         COALESCE(error > 8.0, FALSE) AS m1,
         (COALESCE(v_view > 5.0, FALSE) AND COALESCE(click > 3.0, FALSE)) AS m2,
         COALESCE(purchase > 15.0, FALSE) AS m3,
         COALESCE(error > click, FALSE) AS m4
  FROM seq
),
g AS (
  SELECT *,
         SUM(CASE WHEN m1 THEN 0 ELSE 1 END) OVER win AS g1,
         SUM(CASE WHEN m2 THEN 0 ELSE 1 END) OVER win AS g2,
         SUM(CASE WHEN m3 THEN 0 ELSE 1 END) OVER win AS g3,
         SUM(CASE WHEN m4 THEN 0 ELSE 1 END) OVER win AS g4
  FROM m WINDOW win AS (PARTITION BY user_id ORDER BY bucket)
),
s1 AS (SELECT user_id, bucket, g1, SUM(step) OVER (PARTITION BY user_id, g1 ORDER BY bucket) AS streak FROM g WHERE m1),
s2 AS (SELECT user_id, bucket, g2, SUM(step) OVER (PARTITION BY user_id, g2 ORDER BY bucket) AS streak FROM g WHERE m2),
s3 AS (SELECT user_id, bucket, g3 FROM g WHERE m3),
s4 AS (SELECT user_id, bucket, g4, SUM(step) OVER (PARTITION BY user_id, g4 ORDER BY bucket) AS streak FROM g WHERE m4)
SELECT user_id, MIN(bucket) AS bucket, 'rd_err600' AS rule_id FROM s1 WHERE streak >= 600000 GROUP BY user_id, g1
UNION ALL
SELECT user_id, MIN(bucket) AS bucket, 'rd_viewclick' AS rule_id FROM s2 WHERE streak >= 900000 GROUP BY user_id, g2
UNION ALL
SELECT user_id, MIN(bucket) AS bucket, 'rd_purchase0' AS rule_id FROM s3 GROUP BY user_id, g3
UNION ALL
SELECT user_id, MIN(bucket) AS bucket, 'rd_err_gt_click' AS rule_id FROM s4 WHERE streak >= 600000 GROUP BY user_id, g4
"""


def q_rule_report(sf_dir: str):
    """Config-driven rule-engine END-TO-END (reference
    ``process_odr.py:495-1197``): 46-rule fixture corpus + per-deployment
    overrides + param→(description, unit) mapping sheet, composed as
    pivot → steady-running filter → duration-gated alarms → decorated
    observation report, one orchestration call.  The SQL oracle is
    GENERATED from the same rule dicts (``rules_to_sql``), so both sides
    evaluate the identical config."""
    from .rule_report import make_rule_corpus, run_rule_report

    rules, overrides, mapping = make_rule_corpus()
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])
    return run_rule_report(ds, rules, overrides=overrides, mapping=mapping,
                           running=_RULE_REPORT_RUNNING)


# steady-running analog (reference RUNNING_FLAG): evaluate rules only on
# buckets whose click rate sits inside the operating band
_RULE_REPORT_RUNNING = {"param": "click", "op": "between", "value": [0.0, 250.0]}


def _sql_rule_report() -> str:
    from .rule_report import make_rule_corpus, rules_to_sql

    rules, overrides, mapping = make_rule_corpus()
    return rules_to_sql(rules, overrides=overrides, mapping=mapping,
                        running=_RULE_REPORT_RUNNING)


SQL_RULE_REPORT = _sql_rule_report()


def _lowess_sweep(t: pa.Table) -> pd.DataFrame:
    from ..functions.smooth import lowess_smooth

    df = t.to_pandas()
    tms = df["ts"].astype("datetime64[ms]").astype("int64")
    df["bucket"] = (tms // SLIDE_5M) * SLIDE_5M
    g = (df.groupby(["event_type", "bucket"], sort=True)["value"]
           .mean().reset_index())
    parts = []
    for et, sub in g.groupby("event_type", sort=False):
        y = sub["value"].to_numpy(dtype=np.float64)
        frac = min(1.0, max(0.01, 7 / max(len(y), 1)))
        sm = lowess_smooth(y, frac=frac, it=3)
        parts.append(pd.DataFrame({
            "event_type": et,
            "bucket": sub["bucket"].to_numpy(),
            "mean_cents": _cents(y),
            "smooth_cents": _cents(sm),
        }))
    return pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
        {"event_type": pd.Series([], dtype="object"),
         "bucket": pd.Series([], dtype="int64"),
         "mean_cents": pd.Series([], dtype="int64"),
         "smooth_cents": pd.Series([], dtype="int64")})


def q_lowess_smooth(sf_dir: str):
    """M7 analog (dead code in the reference — call commented out at
    process_odr.py:943): robust LOWESS over each event type's 5-min mean
    series.  Rows-only (iterative robust regression is not
    SQL-expressible); kernel behavior is pinned by tests."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    return grouped_map(ds, ["event_type"], _lowess_sweep)


def q_lowess_smooth_check(sf_dir: str):
    """Driver-visible invariant for the iterative LOWESS (not
    SQL-expressible): the hash-partitioned grouped_map run must equal a
    single-process sweep over the whole table row-exactly (the kernel
    itself is pinned by property tests; this pins the distributed
    composition).  Oracle pins 0 mismatches."""
    import pyarrow.parquet as pq

    eng = q_lowess_smooth(sf_dir).to_pandas()
    tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                        columns=["ts", "event_type", "value"])
    ref = _lowess_sweep(tbl)
    sc = ["event_type", "bucket"]
    eng = eng.sort_values(sc, kind="mergesort").reset_index(drop=True)
    ref = ref.sort_values(sc, kind="mergesort").reset_index(drop=True)
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64")})


def q_media_image_features_check(sf_dir: str):
    """Driver-visible invariant for the multimodal path: the actor-pool
    netpbm decode over the seeded payload table must equal a
    single-process decode+resize of the same bytes feature-for-feature
    (micros-rounded).  Oracle pins 0 mismatches."""
    from ..stages.media import ImageDecodeStage, make_real_media

    eng = q_media_image_features(sf_dir).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    stage = ImageDecodeStage(decoder="netpbm")     # same kernel, no Ray
    ref = stage(make_real_media(256, kind="image", seed=9)) \
        .drop_columns(["thumb"]).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    for df in (eng, ref):
        for c in ("pixel_mean", "pixel_std"):
            df[c] = _micros(df[c].to_numpy())
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[ref.columns.tolist()].to_numpy() != ref.to_numpy())
                   .any(axis=1).sum())
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64")})


def q_value_counts(sf_dir: str):
    """A2 analog: value_counts + percentage, sorted desc
    (helpers.py:737-753)."""
    ds = _read(sf_dir, "events", ["event_type"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        return (pd.Series(batch["event_type"].to_pandas())
                .value_counts().rename("n_events").rename_axis("event_type").reset_index())

    parts = ds.map_batches(partial, batch_format="pyarrow")
    final = grouped_map(parts, ["event_type"], _combine_partials,
                        fn_kwargs={"keys": ["event_type"], "sums": ["n_events"]})
    # the combined table is tiny (one row per distinct type): fold the
    # total into this single pass instead of a separate ds.count()
    # execution of the whole input
    df = final.to_pandas()
    n = df["n_events"].to_numpy().astype(np.int64)
    out = pd.DataFrame({
        "event_type": df["event_type"],
        "n_events": n,
        "pct_micros": _micros(n / n.sum()),
    })
    return out.sort_values(["n_events", "event_type"], ascending=[False, True],
                           kind="stable").reset_index(drop=True)


SQL_VALUE_COUNTS = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(floor(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM events) * 1000000 + 0.5) AS BIGINT) AS pct_micros
FROM events GROUP BY 1 ORDER BY n_events DESC, event_type
"""


def _interval_join_sweep(t: pa.Table) -> pd.DataFrame:
    """J1 batch analog: per-user error SESSIONS [first, last+gap) as the
    build side, clicks as the probe side, interval predicate
    window_start <= ts < window_end (save_fingerprints.py:148) counted via
    composite-key binary search — vectorized across all users of the
    partition."""
    df = t.to_pandas()
    tms = df["ts"].astype("datetime64[ms]").astype("int64").to_numpy()
    uid = df["user_id"].to_numpy()
    et = df["event_type"].to_numpy()
    is_err = et == "error"
    e_u, e_t = uid[is_err], tms[is_err]
    o = np.lexsort((e_t, e_u))
    e_u, e_t = e_u[o], e_t[o]
    brk = np.ones(len(e_u), dtype=bool)
    brk[1:] = (e_u[1:] != e_u[:-1]) | (e_t[1:] - e_t[:-1] > ERR_SESSION_GAP)
    sid = np.cumsum(brk)
    g = pd.DataFrame({"user_id": e_u, "tms": e_t, "sid": sid}).groupby("sid", sort=False)
    sess = pd.DataFrame({
        "user_id": g["user_id"].first(),
        "window_start": g["tms"].min().astype(np.int64),
        "window_end": (g["tms"].max() + ERR_SESSION_GAP).astype(np.int64),
    }).reset_index(drop=True)
    # composite key (user << 44 | tms) makes the per-user interval count
    # two global binary searches.  The packing is only injective while
    # uid < 2^19 and ts < 2^44 (~year 2527) — assert rather than silently
    # overflow into wrong counts on data that violates it.
    SHIFT = np.int64(1) << np.int64(44)
    if len(uid):
        assert uid.max() < (1 << 19) and tms.max() < (1 << 44), \
            "packed interval-join key overflow: uid >= 2^19 or ts >= 2^44"
    is_clk = et == "click"
    ck = np.sort(uid[is_clk].astype(np.int64) * SHIFT + tms[is_clk])
    lo = np.searchsorted(ck, sess["user_id"].to_numpy() * SHIFT + sess["window_start"].to_numpy())
    hi = np.searchsorted(ck, sess["user_id"].to_numpy() * SHIFT + sess["window_end"].to_numpy())
    sess["n_clicks"] = (hi - lo).astype(np.int64)
    return sess


def q_interval_join(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])
    return grouped_map(ds, ["user_id"], _interval_join_sweep)


SQL_INTERVAL_JOIN = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS tms, event_id FROM events WHERE event_type = 'error'),
o AS (SELECT user_id, tms,
             CASE WHEN tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) > 1800000
                  THEN 1 ELSE 0 END AS brk, event_id FROM e),
g AS (SELECT user_id, tms,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY tms, event_id ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
s AS (SELECT user_id, MIN(tms) AS window_start, MAX(tms) + 1800000 AS window_end
      FROM g GROUP BY user_id, sid),
c AS (SELECT user_id, epoch_ms(ts) AS tms FROM events WHERE event_type = 'click')
SELECT s.user_id, s.window_start, s.window_end, CAST(COUNT(c.tms) AS BIGINT) AS n_clicks
FROM s LEFT JOIN c ON c.user_id = s.user_id AND c.tms >= s.window_start AND c.tms < s.window_end
GROUP BY 1, 2, 3
"""


def _asof_join_sweep(t: pa.Table) -> pd.DataFrame:
    """As-of join — the temporal operator Ray Data lacks natively (cf.
    pandas ``merge_asof`` / Flink temporal table join, and the
    reference's latest-state lookups in save_fingerprints.py:148): for
    each *purchase* event, the LATEST *click* of the same user with
    click.ts <= purchase.ts (last-touch attribution).

    Both sides arrive co-partitioned by user_id; the whole partition is
    ONE lexsort + ONE searchsorted over the same packed (user << 44 | ts)
    composite key the interval join uses — vectorized across every user
    in the partition, no per-key loop.  Ties on click ts break to the
    larger event_id (sorted as the secondary key, so ``side="right"``
    lands on it)."""
    df = t.to_pandas()
    tms = df["ts"].astype("datetime64[ms]").astype("int64").to_numpy()
    uid = df["user_id"].to_numpy().astype(np.int64)
    et = df["event_type"].to_numpy()
    eid = df["event_id"].to_numpy().astype(np.int64)
    SHIFT = np.int64(1) << np.int64(44)
    if len(uid):
        assert uid.max() < (1 << 19) and tms.max() < (1 << 44), \
            "packed asof-join key overflow: uid >= 2^19 or ts >= 2^44"
    is_c = et == "click"
    c_u, c_t, c_id = uid[is_c], tms[is_c], eid[is_c]
    o = np.lexsort((c_id, c_t, c_u))
    c_u, c_t, c_id = c_u[o], c_t[o], c_id[o]
    ck = c_u * SHIFT + c_t
    is_p = et == "purchase"
    p_u, p_t, p_id = uid[is_p], tms[is_p], eid[is_p]
    pos = np.searchsorted(ck, p_u * SHIFT + p_t, side="right") - 1
    safe = np.maximum(pos, 0)
    # a hit must stay inside the same user's run of clicks
    valid = (pos >= 0) & (c_u[safe] == p_u) if len(ck) else np.zeros(len(p_u), bool)
    pv = safe[valid]
    return pd.DataFrame({
        "purchase_id": p_id[valid],
        "user_id": p_u[valid],
        "purchase_tms": p_t[valid],
        "click_id": c_id[pv],
        "click_tms": c_t[pv],
        "lag_ms": p_t[valid] - c_t[pv],
    })


def q_asof_join(sf_dir: str):
    """Last-touch attribution via as-of join: purchases matched to the
    latest same-user click at or before them.  groupby(user_id) is the
    single hash exchange; each partition then resolves all its users with
    two vectorized array passes (scale note: key = user_id, so hot users
    stay single-partition — same skew budget as the session operator)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return grouped_map(ds, ["user_id"], _asof_join_sweep)


SQL_ASOF_JOIN = """
WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS tms FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, epoch_ms(ts) AS tms FROM events WHERE event_type = 'click'),
j AS (
  SELECT p.event_id AS purchase_id, p.user_id, p.tms AS purchase_tms,
         c.event_id AS click_id, c.tms AS click_tms,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.tms DESC, c.event_id DESC) AS rn
  FROM p JOIN c ON c.user_id = p.user_id AND c.tms <= p.tms
)
SELECT purchase_id, user_id, purchase_tms, click_id, click_tms,
       purchase_tms - click_tms AS lag_ms
FROM j WHERE rn = 1
"""


def q_obs_text(sf_dir: str):
    """M10/M9 analog: observation text rendering + IST (+05:30) display
    shift applied at the sink projection (internal time stays UTC)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    def render(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ist = df["ts"].astype("datetime64[ms]") + pd.Timedelta(hours=5, minutes=30)
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "event_id": df["event_id"],
            "obs_text": ("user " + df["user_id"].astype(str) + ": " + df["event_type"]
                         + " value_cents " + pd.Series(cents).astype(str)
                         + " at " + ist.dt.strftime("%Y-%m-%d %H:%M:%S")),
        })

    return ds.map_batches(render, batch_format="pyarrow")


SQL_OBS_TEXT = """
SELECT event_id,
       'user ' || CAST(user_id AS VARCHAR) || ': ' || event_type
       || ' value_cents ' || CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR)
       || ' at ' || strftime(ts + INTERVAL 330 MINUTE, '%Y-%m-%d %H:%M:%S') AS obs_text
FROM events
"""


def q_json_extract(sf_dir: str):
    """§2.8 json family: extract props->k (vectorized regex, compiled by
    pandas' str engine) and aggregate per event_type."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        k = df["props"].str.extract(r'"k": (\d+)')[0].astype("float64")
        out = pd.DataFrame({"event_type": df["event_type"], "k": k})
        g = out.groupby("event_type", sort=False)["k"]
        return g.agg(sum_k="sum", n_with_k="count").reset_index()

    parts = ds.map_batches(partial, batch_format="pyarrow")
    final = grouped_map(parts, ["event_type"], _combine_partials,
                        fn_kwargs={"keys": ["event_type"], "sums": ["sum_k", "n_with_k"]})

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "sum_k": pa.array(batch["sum_k"].to_numpy().astype(np.int64), pa.int64()),
            "n_with_k": pa.array(batch["n_with_k"].to_numpy().astype(np.int64), pa.int64()),
        })

    return final.map_batches(finish, batch_format="pyarrow")


SQL_JSON_EXTRACT = r"""
SELECT event_type,
       CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(regexp_extract(props, '"k": (\d+)', 1)) AS n_with_k
FROM events GROUP BY 1
"""


HOUR_MS = 3_600_000


def _throttle_sweep(t: pa.Table) -> pd.DataFrame:
    """T5 analog (per-key rate limiting, llm_job.py:58-70): emit only the
    FIRST event per (user, 1-hour bucket) — deterministic tie-break by
    (ts, event_id), vectorized across all keys of the partition."""
    df = t.to_pandas()
    tms = df["ts"].astype("datetime64[ms]").astype("int64").to_numpy()
    df["bucket"] = (tms // HOUR_MS) * HOUR_MS
    df = df.sort_values(["user_id", "bucket", "ts", "event_id"], kind="stable")
    first = ~df.duplicated(["user_id", "bucket"])
    out = df.loc[first, ["user_id", "bucket", "event_id"]].copy()
    out["event_id"] = out["event_id"].astype(np.int64)
    return out


def q_throttle_first(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_id"])
    return grouped_map(ds, ["user_id"], _throttle_sweep)


SQL_THROTTLE_FIRST = """
WITH r AS (
  SELECT user_id, (epoch_ms(ts) // 3600000) * 3600000 AS bucket, event_id,
         row_number() OVER (PARTITION BY user_id, (epoch_ms(ts) // 3600000)
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, bucket, event_id FROM r WHERE rn = 1
"""


def q_deterministic_sample(sf_dir: str):
    """O5 analog, made deterministic: systematic 1-in-16 sample by id —
    reproducible under any parallelism (seeded-RNG draws are not)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def pick(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.equal(pc.bit_wise_and(batch["event_id"], 15), 3)
        out = batch.filter(keep)
        return pa.table({
            "event_id": out["event_id"],
            "event_type": out["event_type"],
            "value_cents": pa.array(_cents(out["value"].to_numpy()), pa.int64()),
        })

    return ds.map_batches(pick, batch_format="pyarrow")


SQL_DETERMINISTIC_SAMPLE = """
SELECT event_id, event_type,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
FROM events WHERE (event_id & 15) = 3
"""


# ---------------------------------------------------------------------------
# Curation-time sampling / quantiles / per-group ranking over `documents`
# (domain-rebalancing + corpus-statistics ops an LLM data pipeline needs)
# ---------------------------------------------------------------------------

STRATA_QUOTA = 50
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2_147_483_648


def _sample_key(ids: np.ndarray) -> np.ndarray:
    """Two LCG rounds over the id: a deterministic pseudo-random sample
    key computable identically in SQL (pure int64 arithmetic, no hash
    builtin needed; intermediates stay < 2^62 for ids < 8.3e9)."""
    h = (ids.astype(np.int64) * _LCG_A + _LCG_C) % _LCG_M
    return (h * _LCG_A + _LCG_C) % _LCG_M


def _rank_partition(t: pa.Table, by: list[str], asc: list[bool],
                    quota: int, out_cols: list[str]) -> pd.DataFrame:
    """Per-lang rank+cut inside one hash partition (all rows of a lang
    co-located; input already cut to <= quota per lang per block)."""
    df = t.to_pandas()
    df = df.sort_values(["lang"] + by, ascending=[True] + asc, kind="stable")
    rn = df.groupby("lang", sort=False).cumcount().to_numpy() + 1
    df["rn"] = rn.astype(np.int64)
    return df.loc[df["rn"] <= quota, out_cols].reset_index(drop=True)


def _partial_per_lang_topk(batch: pa.Table, by: list[str], asc: list[bool],
                           quota: int, cols: list[str]) -> pd.DataFrame:
    """Block-local candidate cut: each block forwards at most `quota`
    rows per lang, so the exchange carries O(quota x n_langs) rows per
    block instead of the whole table (partial top-k, the same shape as
    q_top_orders but per stratum)."""
    df = pa.Table.from_arrays([batch[c] for c in cols], names=cols).to_pandas()
    df = df.sort_values(["lang"] + by, ascending=[True] + asc, kind="stable")
    keep = df.groupby("lang", sort=False).cumcount().to_numpy() < quota
    return df.loc[keep].reset_index(drop=True)


def q_stratified_sample(sf_dir: str):
    """Stratified (per-language) deterministic sampling — the domain
    rebalancing step of a curation pipeline: keep STRATA_QUOTA docs per
    lang, chosen by a seedless LCG sample key over doc_id so any
    parallelism (and the SQL oracle) selects the identical docs.
    Scale: block-local per-stratum top-k cut, then one small exchange."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        sk = _sample_key(batch["doc_id"].to_numpy())
        df = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                           "lang": batch["lang"].to_pandas(), "sk": sk})
        df = df.sort_values(["lang", "sk", "doc_id"], kind="stable")
        keep = df.groupby("lang", sort=False).cumcount().to_numpy() < STRATA_QUOTA
        return df.loc[keep].reset_index(drop=True)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(parts, ["lang"], _rank_partition,
                       fn_kwargs={"by": ["sk", "doc_id"], "asc": [True, True],
                                  "quota": STRATA_QUOTA,
                                  "out_cols": ["doc_id", "lang", "rn"]})


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, rn FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (((doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M})
                     * {_LCG_A} + {_LCG_C}) % {_LCG_M}, doc_id) AS rn
  FROM documents)
WHERE rn <= {STRATA_QUOTA}
"""


TOP_DOCS_K = 3


def q_top_docs_per_lang(sf_dir: str):
    """Window-function shape (row_number over a partition): top-K longest
    docs per language, rank included.  Same partial-top-k exchange as
    the stratified sample — blocks forward K candidates per lang."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    parts = ds.map_batches(
        _partial_per_lang_topk, batch_format="pyarrow",
        fn_kwargs={"by": ["n_chars", "doc_id"], "asc": [False, True],
                   "quota": TOP_DOCS_K, "cols": ["doc_id", "lang", "n_chars"]})
    return grouped_map(parts, ["lang"], _rank_partition,
                       fn_kwargs={"by": ["n_chars", "doc_id"],
                                  "asc": [False, True], "quota": TOP_DOCS_K,
                                  "out_cols": ["doc_id", "lang", "n_chars", "rn"]})


SQL_TOP_DOCS_PER_LANG = f"""
SELECT doc_id, lang, n_chars, rn FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents)
WHERE rn <= {TOP_DOCS_K}
"""


_QUANTILES = (0.5, 0.9, 0.99)


def _quantiles_sweep(t: pa.Table) -> pd.DataFrame:
    """Exact per-lang quantiles from (lang, n_chars, n) count partials:
    sort by value, cumulative counts, pick sorted[ceil(q*n)-1] — the
    DuckDB quantile_disc rule (verified empirically for n=1..11)."""
    df = t.to_pandas().groupby(["lang", "n_chars"], sort=False)["n"].sum().reset_index()
    df = df.sort_values(["lang", "n_chars"], kind="stable")
    out = []
    for lang, g in df.groupby("lang", sort=False):
        vals = g["n_chars"].to_numpy()
        cnt = g["n"].to_numpy()
        cum = np.cumsum(cnt)  # rows = distinct values per lang: tiny
        n = int(cum[-1])
        row = {"lang": lang, "n_docs": n}
        for q in _QUANTILES:
            target = max(int(np.ceil(q * n)), 1)  # 1-based rank
            row[f"p{int(q * 100)}_chars"] = int(vals[np.searchsorted(cum, target, "left")])
        out.append(row)
    return pd.DataFrame(out)


def q_group_quantiles(sf_dir: str):
    """Exact distributed quantiles (corpus length statistics): per-block
    (lang, n_chars) value-count partials — the only thing shuffled —
    then per-lang cumulative-count quantile pick.  Exact at any scale
    while the value domain stays bounded (doc lengths); no full sort."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"lang": batch["lang"].to_pandas(),
                           "n_chars": batch["n_chars"].to_numpy()})
        return df.groupby(["lang", "n_chars"], sort=False).size().rename("n").reset_index()

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(parts, ["lang"], _quantiles_sweep)


SQL_GROUP_QUANTILES = """
SELECT lang, COUNT(*) AS n_docs,
       quantile_disc(n_chars, 0.5) AS p50_chars,
       quantile_disc(n_chars, 0.9) AS p90_chars,
       quantile_disc(n_chars, 0.99) AS p99_chars
FROM documents GROUP BY lang
"""


def _quantiles_cont_sweep(t: pa.Table) -> pd.DataFrame:
    """Interpolated (percentile_cont / type-7) per-lang quantiles from the
    same value-count partials: h = (n-1)q, linear blend of the floor(h)
    and floor(h)+1 order statistics — the DuckDB quantile_cont rule."""
    df = t.to_pandas().groupby(["lang", "n_chars"], sort=False)["n"].sum().reset_index()
    df = df.sort_values(["lang", "n_chars"], kind="stable")
    out = []
    for lang, g in df.groupby("lang", sort=False):
        vals = g["n_chars"].to_numpy().astype(np.float64)
        cum = np.cumsum(g["n"].to_numpy())
        n = int(cum[-1])
        row = {"lang": lang, "n_docs": n}
        for q in _QUANTILES:
            h = (n - 1) * q
            k = int(np.floor(h))
            v_k = vals[np.searchsorted(cum, k + 1, "left")]
            v_k1 = vals[np.searchsorted(cum, min(k + 2, n), "left")]
            row[f"p{int(q * 100)}_chars_micros"] = int(
                _micros(v_k + (h - k) * (v_k1 - v_k)))
        out.append(row)
    return pd.DataFrame(out)


def q_group_quantiles_cont(sf_dir: str):
    """percentile_cont companion to `group_quantiles`: identical
    value-count exchange, interpolated finish (micros-scaled — the blend
    is float on both sides)."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"lang": batch["lang"].to_pandas(),
                           "n_chars": batch["n_chars"].to_numpy()})
        return df.groupby(["lang", "n_chars"], sort=False).size().rename("n").reset_index()

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(parts, ["lang"], _quantiles_cont_sweep)


SQL_GROUP_QUANTILES_CONT = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(floor(quantile_cont(n_chars, 0.5) * 1000000 + 0.5) AS BIGINT)
         AS p50_chars_micros,
       CAST(floor(quantile_cont(n_chars, 0.9) * 1000000 + 0.5) AS BIGINT)
         AS p90_chars_micros,
       CAST(floor(quantile_cont(n_chars, 0.99) * 1000000 + 0.5) AS BIGINT)
         AS p99_chars_micros
FROM documents GROUP BY lang
"""


def q_approx_quantiles(sf_dir: str):
    """Mergeable-histogram quantile sketch (stages/sketch.py) with the
    inline-exact-cross-check pattern of approx_distinct: bounds come
    from parquet row-group STATISTICS (no scan), per-block 64 KB
    histogram partials sum-merge, and the row carries the EXACT
    distributed quantile (value-count partials, DuckDB quantile_disc
    rule — SQL-checked) plus a pinned flag asserting the sketch landed
    within its one-bin-width guarantee (2 widths allowing edge
    assignment jitter)."""
    import os as _os

    from ..stages import sketch as sk

    qs = (0.5, 0.9, 0.99)
    path = _os.path.join(sf_dir, "events.parquet")
    lo, hi = sk.parquet_column_bounds(path, "value")
    approx = sk.hist_distinct_quantiles(
        _read(sf_dir, "events", ["value"]), "value", lo, hi, qs)
    exact = sk.exact_value_quantiles(
        _read(sf_dir, "events", ["value"]), "value", 100.0, qs)
    w = (hi - lo) / sk.HIST_BINS
    rows = []
    for q in qs:
        ok = abs(approx[q] - exact[q] / 100.0) <= 2.0 * w
        rows.append({"q_pct": int(q * 100),
                     "exact_value_cents": exact[q],
                     "within_bound": 1 if ok else 0})
    return pd.DataFrame(rows).astype(np.int64)


SQL_APPROX_QUANTILES = """
SELECT * FROM (VALUES
  (50, (SELECT CAST(floor(quantile_disc(value, 0.5) * 100 + 0.5) AS BIGINT)
        FROM events), CAST(1 AS BIGINT)),
  (90, (SELECT CAST(floor(quantile_disc(value, 0.9) * 100 + 0.5) AS BIGINT)
        FROM events), CAST(1 AS BIGINT)),
  (99, (SELECT CAST(floor(quantile_disc(value, 0.99) * 100 + 0.5) AS BIGINT)
        FROM events), CAST(1 AS BIGINT))
) AS t(q_pct, exact_value_cents, within_bound)
ORDER BY q_pct
"""


def _anti_join_sweep(t: pa.Table) -> pd.DataFrame:
    """One hash partition of the tagged union: drop customer rows whose
    custkey also appears on the orders side, partial-agg the survivors."""
    df = t.to_pandas()
    ordered = pd.Index(df.loc[df["side"] == 1, "custkey"].unique())
    cust = df[df["side"] == 0]
    keep = cust[~cust["custkey"].isin(ordered)]
    if keep.empty:
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype="object"),
                             "n_customers": pd.Series([], dtype="int64"),
                             "acctbal_cents": pd.Series([], dtype="int64")})
    g = keep.groupby("c_mktsegment", sort=False)["acctbal_cents"]
    return g.agg(n_customers="size", acctbal_cents="sum").reset_index() \
            [["c_mktsegment", "n_customers", "acctbal_cents"]]


_BLOOM_BITS = 1 << 20          # 128 KB filter; k=4 hashes


def _bloom_hashes(keys: np.ndarray) -> np.ndarray:
    """(n, 4) bit positions via two splitmix-style mixes + double hashing."""
    x = keys.astype(np.uint64)
    h1 = (x * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    h2 = (x * np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
    i = np.arange(4, dtype=np.uint64)
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(_BLOOM_BITS)).astype(np.int64)


def q_bloom_join_revenue(sf_dir: str):
    """Bloom-pruned shuffle join — the 100-TB join-reduction technique:
    revenue per URGENT order.  A 128 KB bloom filter over the filtered
    orders keys is built from per-block partials (OR-merged, associative)
    and broadcast once via ``ray.put``; the big lineitem side drops
    non-member rows BEFORE the exchange, so only ~1/5 of it shuffles.
    The co-partitioned join then removes bloom false positives exactly,
    so the result is held to a plain SQL join oracle.  Cents are rounded
    per row before summation (summation-order policy)."""
    import pyarrow.compute as pc

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def _bloom_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["o_orderpriority"], "1-URGENT"))
        bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
        if batch.num_rows:
            pos = _bloom_hashes(batch["o_orderkey"].to_numpy()).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    bloom = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for part in orders.map_batches(_bloom_partial, batch_format="pyarrow") \
                      .iter_batches(batch_format="pyarrow"):
        for buf in part["bits"].to_pylist():
            bloom |= np.frombuffer(buf, dtype=np.uint8)
    bloom_ref = ray.put(bloom)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    def _prefilter(batch: pa.Table) -> pa.Table:
        b = ray.get(bloom_ref)
        keys = batch["l_orderkey"].to_numpy().astype(np.int64)
        pos = _bloom_hashes(keys)
        member = ((b[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
        keys = keys[member]
        px = batch["l_extendedprice"].to_numpy()[member]
        disc = batch["l_discount"].to_numpy()[member]
        return pa.table({
            "orderkey": pa.array(keys, pa.int64()),
            "rev_cents": pa.array(_cents(px * (1.0 - disc)), pa.int64()),
            "side": pa.array(np.zeros(len(keys), np.int64), pa.int64()),
        })

    def _okeys(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["o_orderpriority"], "1-URGENT"))
        keys = batch["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table({
            "orderkey": pa.array(keys, pa.int64()),
            "rev_cents": pa.array(np.zeros(len(keys), np.int64), pa.int64()),
            "side": pa.array(np.ones(len(keys), np.int64), pa.int64()),
        })

    def _join_sweep(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        true_keys = df.loc[df["side"] == 1, "orderkey"].unique()
        rows = df[(df["side"] == 0) & df["orderkey"].isin(true_keys)]
        g = rows.groupby("orderkey", sort=False)["rev_cents"].agg(["sum", "size"])
        return pd.DataFrame({"o_orderkey": g.index.to_numpy(),
                             "revenue_cents": g["sum"].to_numpy().astype(np.int64),
                             "n_items": g["size"].to_numpy().astype(np.int64)})

    tagged = li.map_batches(_prefilter, batch_format="pyarrow").union(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
        .map_batches(_okeys, batch_format="pyarrow"))
    return grouped_map(tagged, ["orderkey"], _join_sweep)


SQL_BLOOM_JOIN_REVENUE = """
SELECT l_orderkey AS o_orderkey,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_orderkey
ORDER BY o_orderkey
"""


def q_customers_without_orders(sf_dir: str):
    """Anti join (NOT EXISTS shape): customers with no OPEN order
    (the fixture gives every customer SOME order, so the anti-join is
    held to the open-status subset to be non-vacuous), rolled up per
    market segment.  Scale shape: both sides tagged and hash-
    co-partitioned on custkey (orders side deduped per block first, so
    the exchange carries distinct keys, not order rows); no broadcast of
    the potentially-huge orders key set."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def cust_tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": batch["c_custkey"].cast(pa.int64()),
            "c_mktsegment": batch["c_mktsegment"].cast(pa.string()),
            "acctbal_cents": pa.array(_cents(batch["c_acctbal"].to_numpy()), pa.int64()),
            "side": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
        })

    def orders_tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch["o_orderstatus"], "O"))
        keys = np.unique(batch["o_custkey"].to_numpy().astype(np.int64))
        n = len(keys)
        return pa.table({
            "custkey": pa.array(keys, pa.int64()),
            "c_mktsegment": pa.array([""] * n, pa.string()),
            "acctbal_cents": pa.array(np.zeros(n, np.int64), pa.int64()),
            "side": pa.array(np.ones(n, np.int64), pa.int64()),
        })

    tagged = cust.map_batches(cust_tag, batch_format="pyarrow").union(
        orders.map_batches(orders_tag, batch_format="pyarrow"))
    parts = grouped_map(tagged, ["custkey"], _anti_join_sweep)
    # survivors' partials: <= n_partitions x n_segments rows — small final
    pdf = parts.to_pandas()
    if pdf.empty:
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype="object"),
                             "n_customers": pd.Series([], dtype="int64"),
                             "acctbal_cents": pd.Series([], dtype="int64")})
    return (pdf.groupby("c_mktsegment", sort=False)
            .agg(n_customers=("n_customers", "sum"),
                 acctbal_cents=("acctbal_cents", "sum")).reset_index())


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS acctbal_cents
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
GROUP BY c_mktsegment
"""


def q_rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP shape: order revenue by (segment, priority), by
    (segment), and grand total, with 'ALL' standing in for the rolled-up
    level (no NULL cells to canonicalize).  The broadcast-join + partial
    aggregate run once; the two coarser levels re-aggregate the tiny
    (segment, priority) final on the driver — no second scan."""
    lookup_ref = _segment_lookup_ref(sf_dir)
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderpriority"])

    def probe(batch: pa.Table) -> pd.DataFrame:
        seg = _probe_segment(ray.get(lookup_ref),
                             batch["o_custkey"].to_numpy().astype(np.int64))
        df = pd.DataFrame({"c_mktsegment": seg,
                           "o_orderpriority": batch["o_orderpriority"].to_pandas(),
                           "cents": _cents(batch["o_totalprice"].to_numpy())})
        g = df.groupby(["c_mktsegment", "o_orderpriority"], sort=False)["cents"]
        return g.agg(n_orders="size", revenue_cents="sum").reset_index()

    parts = ds.map_batches(probe, batch_format="pyarrow")
    fine = grouped_map(parts, ["c_mktsegment", "o_orderpriority"], _combine_partials,
                       fn_kwargs={"keys": ["c_mktsegment", "o_orderpriority"],
                                  "sums": ["n_orders", "revenue_cents"]}).to_pandas()
    mid = (fine.groupby("c_mktsegment", sort=False)
           .agg(n_orders=("n_orders", "sum"), revenue_cents=("revenue_cents", "sum"))
           .reset_index().assign(o_orderpriority="ALL"))
    top = pd.DataFrame({"c_mktsegment": ["ALL"], "o_orderpriority": ["ALL"],
                        "n_orders": [int(fine["n_orders"].sum())],
                        "revenue_cents": [int(fine["revenue_cents"].sum())]})
    cols = ["c_mktsegment", "o_orderpriority", "n_orders", "revenue_cents"]
    return pd.concat([fine[cols], mid[cols], top[cols]], ignore_index=True)


SQL_ROLLUP_REVENUE = """
SELECT COALESCE(c.c_mktsegment, 'ALL') AS c_mktsegment,
       COALESCE(o.o_orderpriority, 'ALL') AS o_orderpriority,
       COUNT(*) AS n_orders,
       SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY ROLLUP(c.c_mktsegment, o.o_orderpriority)
"""


def q_cube_revenue(sf_dir: str):
    """GROUP BY CUBE shape: all FOUR grouping sets over (segment,
    priority) — same single broadcast-join partial pass as the rollup;
    the three coarser sets re-aggregate the tiny fine grid on the
    driver, so the cube costs one scan regardless of dimension count."""
    roll = q_rollup_revenue(sf_dir)
    fine = roll[(roll["c_mktsegment"] != "ALL")
                & (roll["o_orderpriority"] != "ALL")]
    by_pri = (fine.groupby("o_orderpriority", sort=False)
              .agg(n_orders=("n_orders", "sum"),
                   revenue_cents=("revenue_cents", "sum"))
              .reset_index().assign(c_mktsegment="ALL"))
    cols = ["c_mktsegment", "o_orderpriority", "n_orders", "revenue_cents"]
    return pd.concat([roll[cols], by_pri[cols]], ignore_index=True)


SQL_CUBE_REVENUE = """
SELECT COALESCE(c.c_mktsegment, 'ALL') AS c_mktsegment,
       COALESCE(o.o_orderpriority, 'ALL') AS o_orderpriority,
       COUNT(*) AS n_orders,
       SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY CUBE(c.c_mktsegment, o.o_orderpriority)
"""


def _running_sweep(t: pa.Table) -> pd.DataFrame:
    """Segmented cumulative sum over one hash partition: sort by
    (custkey, date, orderkey), global int cumsum, subtract each key
    group's starting offset — no per-group dispatch."""
    df = t.to_pandas().sort_values(["o_custkey", "date_ms", "o_orderkey"],
                                   kind="stable").reset_index(drop=True)
    cents = df["cents"].to_numpy()
    cs = np.cumsum(cents)
    key = df["o_custkey"].to_numpy()
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    seg_base = np.repeat(np.r_[0, cs[starts[1:] - 1]], np.diff(np.r_[starts, len(cs)]))
    df["cum_cents"] = (cs - seg_base).astype(np.int64)
    return df[["o_orderkey", "o_custkey", "cum_cents"]]


def q_running_revenue(sf_dir: str):
    """Running-total window function (SUM OVER PARTITION BY ... ORDER BY):
    per-customer cumulative order revenue in order-date order.  Cents are
    rounded per row BEFORE summing so the cumulative value is independent
    of float summation order.  One hash exchange on custkey; the cumsum
    is a vectorized segmented scan per partition."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
            "o_custkey": batch["o_custkey"].cast(pa.int64()),
            "date_ms": pa.array(batch["o_orderdate"].cast(pa.int64()).to_numpy() // 1000, pa.int64()),
            "cents": pa.array(_cents(batch["o_totalprice"].to_numpy()), pa.int64()),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return grouped_map(prepped, ["o_custkey"], _running_sweep)


SQL_RUNNING_REVENUE = """
SELECT o_orderkey, o_custkey,
       SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
FROM orders
"""


def _gap_sweep(t: pa.Table) -> pd.DataFrame:
    """lag() per key over one hash partition: sort by (user, ts, id),
    shifted diff, first row of each key gets the NULL analog (-1)."""
    df = t.to_pandas().sort_values(["user_id", "ts_us", "event_id"],
                                   kind="stable").reset_index(drop=True)
    ts = df["ts_us"].to_numpy()
    uid = df["user_id"].to_numpy()
    gap = np.empty(len(ts), dtype=np.int64)
    gap[0] = -1
    gap[1:] = ts[1:] - ts[:-1]
    gap[np.r_[True, uid[1:] != uid[:-1]]] = -1
    df["gap_us"] = gap
    return df[["event_id", "user_id", "gap_us"]]


def q_event_gaps(sf_dir: str):
    """lag() window function: per-user time since the previous event
    (-1 for each user's first event, standing in for SQL NULL so the
    value-hash compare is well-defined).  One hash exchange on user_id,
    then a vectorized shifted diff per partition."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    return grouped_map(ds.map_batches(prep, batch_format="pyarrow"),
                       ["user_id"], _gap_sweep)


SQL_EVENT_GAPS = """
SELECT event_id, user_id,
       COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us
FROM events
"""


def _type_flags(sf_dir: str):
    """Shared §2.7 set-op plumbing: per-block (user_id, has_click,
    has_error) bool partials (the only exchange), or-reduced per user in
    one hash partition sweep."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        err = pc.equal(batch["event_type"], "error").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "c": pc.equal(batch["event_type"], "click").to_numpy(zero_copy_only=False),
            "e": err,
            "he": err & (batch["value"].to_numpy() > 90.0),
        })
        return df.groupby("user_id", sort=False).agg(
            c=("c", "max"), e=("e", "max"), he=("he", "max")).reset_index()

    def sweep(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas().groupby("user_id", sort=False).agg(
            c=("c", "max"), e=("e", "max"), he=("he", "max")).reset_index()
        return df

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(parts, ["user_id"], sweep).to_pandas()


def q_users_intersect(sf_dir: str):
    """§2.7 INTERSECT shape: users with BOTH click and error events."""
    df = _type_flags(sf_dir)
    out = df[df["c"] & df["e"]][["user_id"]].sort_values("user_id")
    return out.reset_index(drop=True).astype(np.int64)


SQL_USERS_INTERSECT = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
ORDER BY user_id
"""


def q_users_except(sf_dir: str):
    """§2.7 EXCEPT shape: clicking users with NO high-value (>90) error
    (the unqualified except is vacuous on this fixture — every user has
    every event type)."""
    df = _type_flags(sf_dir)
    out = df[df["c"] & ~df["he"]][["user_id"]].sort_values("user_id")
    return out.reset_index(drop=True).astype(np.int64)


SQL_USERS_EXCEPT = """
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 90
ORDER BY user_id
"""


def q_union_activity(sf_dir: str):
    """§2.7 union-with-schema-coercion (llm_job.py:113-117 analog): two
    differently-shaped sources normalized to one activity schema with
    ds.union, then aggregated per day."""
    ev = _read(sf_dir, "events", ["ts", "value"])
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def ev_norm(batch: pa.Table) -> pa.Table:
        day = (batch["ts"].cast(pa.int64()).to_numpy() // 1000 // 86_400_000) * 86_400_000
        return pa.table({
            "day": pa.array(day, pa.int64()),
            "kind": pa.array(["event"] * batch.num_rows, pa.string()),
            "amount_cents": pa.array(_cents(batch["value"].to_numpy()), pa.int64()),
        })

    def ord_norm(batch: pa.Table) -> pa.Table:
        day = (batch["o_orderdate"].cast(pa.int64()).to_numpy() // 1000 // 86_400_000) * 86_400_000
        return pa.table({
            "day": pa.array(day, pa.int64()),
            "kind": pa.array(["order"] * batch.num_rows, pa.string()),
            "amount_cents": pa.array(_cents(batch["o_totalprice"].to_numpy()), pa.int64()),
        })

    u = ev.map_batches(ev_norm, batch_format="pyarrow").union(
        orders.map_batches(ord_norm, batch_format="pyarrow")
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        g = df.groupby(["day", "kind"], sort=False)["amount_cents"]
        return g.agg(n_rows="size", sum_cents="sum").reset_index()

    parts = u.map_batches(partial, batch_format="pyarrow")
    final = grouped_map(parts, ["day", "kind"], _combine_partials,
                        fn_kwargs={"keys": ["day", "kind"], "sums": ["n_rows", "sum_cents"]})

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": batch["day"].cast(pa.int64()),
            "kind": batch["kind"],
            "n_rows": batch["n_rows"].cast(pa.int64()),
            "sum_cents": batch["sum_cents"].cast(pa.int64()),
        })

    return final.map_batches(finish, batch_format="pyarrow")


SQL_UNION_ACTIVITY = """
WITH u AS (
  SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day, 'event' AS kind,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS amount_cents
  FROM events
  UNION ALL
  SELECT (epoch_ms(o_orderdate) // 86400000) * 86400000 AS day, 'order' AS kind,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS amount_cents
  FROM orders
)
SELECT day, kind, COUNT(*) AS n_rows, CAST(SUM(amount_cents) AS BIGINT) AS sum_cents
FROM u GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Behavioral analytics over `events`: funnel / cohort / mode / time-weighted
# (the product-analytics operator family a web-events pipeline needs; all
# hash-exchange on user_id once, then vectorized per-partition sweeps)
# ---------------------------------------------------------------------------

_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros
_DAY_US = 86_400_000_000


def _funnel_sweep(t: pa.Table) -> pd.DataFrame:
    """Strictly-ordered 3-step funnel per user (view -> click -> purchase):
    deepest step whose first qualifying event happens strictly AFTER the
    previous step's first qualifying event.  Vectorized: three filtered
    groupby-mins, each gated on the prior step's time."""
    df = t.to_pandas()
    t1 = df[df["event_type"] == "view"].groupby("user_id")["ts_us"].min()
    # gate frames join on a renamed key column — an empty gate side would
    # otherwise leave a `user_id`-named INDEX beside the column and break
    # the next groupby (caught by test_funnel_sweep_matches_naive)
    c = df[df["event_type"] == "click"].merge(
        t1.rename("t1").rename_axis("uid").reset_index(),
        left_on="user_id", right_on="uid")
    t2 = c[c["ts_us"] > c["t1"]].groupby("user_id")["ts_us"].min()
    p = df[df["event_type"] == "purchase"].merge(
        t2.rename("t2").rename_axis("uid").reset_index(),
        left_on="user_id", right_on="uid")
    t3 = p[p["ts_us"] > p["t2"]].groupby("user_id")["ts_us"].min()
    users = np.sort(df["user_id"].unique())
    idx = pd.Index(users)
    step = np.zeros(len(users), dtype=np.int64)
    step[idx.isin(t1.index)] = 1
    step[idx.isin(t2.index)] = 2
    step[idx.isin(t3.index)] = 3
    return pd.DataFrame({"user_id": users, "funnel_step": step})


def q_funnel_steps(sf_dir: str):
    """Ordered-funnel (MATCH_RECOGNIZE-lite) per user: the deepest
    view -> click -> purchase step reached in strict event-time order.
    One hash exchange on user_id; the sweep is three vectorized
    filtered-min passes (no per-row scan)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_type": batch["event_type"],
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    return grouped_map(ds.map_batches(prep, batch_format="pyarrow"),
                       ["user_id"], _funnel_sweep)


SQL_FUNNEL_STEPS = """
WITH t1 AS (SELECT user_id, min(epoch_us(ts)) AS tt FROM events
            WHERE event_type = 'view' GROUP BY user_id),
t2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS tt FROM events e
       JOIN t1 ON e.user_id = t1.user_id AND epoch_us(e.ts) > t1.tt
       WHERE e.event_type = 'click' GROUP BY e.user_id),
t3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS tt FROM events e
       JOIN t2 ON e.user_id = t2.user_id AND epoch_us(e.ts) > t2.tt
       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT u.user_id,
       CAST(CASE WHEN t3.user_id IS NOT NULL THEN 3
                 WHEN t2.user_id IS NOT NULL THEN 2
                 WHEN t1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_step
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN t1 ON u.user_id = t1.user_id
LEFT JOIN t2 ON u.user_id = t2.user_id
LEFT JOIN t3 ON u.user_id = t3.user_id
ORDER BY u.user_id
"""


def _cohort_sweep(t: pa.Table) -> pd.DataFrame:
    """Per-user cohort day (first-event day) and distinct active-day
    offsets, pre-counted per (cohort, offset) inside the partition —
    legal because every user's rows are co-located, so cross-partition
    counts add without double-counting a user."""
    df = t.to_pandas()
    day = df["ts_us"].to_numpy() // _DAY_US
    df = pd.DataFrame({"user_id": df["user_id"].to_numpy(), "day": day})
    cohort = df.groupby("user_id")["day"].transform("min")
    act = pd.DataFrame({
        "user_id": df["user_id"],
        "cohort_day_ms": cohort * 86_400_000,
        "offset_days": df["day"] - cohort,
    }).drop_duplicates()
    out = (act.groupby(["cohort_day_ms", "offset_days"], sort=False)
           .size().rename("n_users").reset_index())
    return out


def q_cohort_retention(sf_dir: str):
    """Cohort-retention matrix: users bucketed by first-event day, distinct
    active users per (cohort day, day offset).  One exchange on user_id
    (cohort assignment needs each user's full history); the per-(cohort,
    offset) partials then sum exactly because a user lives in one
    partition.  Final combine is over <= days x offsets rows — tiny."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    parts = grouped_map(ds.map_batches(prep, batch_format="pyarrow"),
                        ["user_id"], _cohort_sweep)
    pdf = parts.to_pandas()
    return (pdf.groupby(["cohort_day_ms", "offset_days"], sort=False)["n_users"]
            .sum().reset_index().sort_values(["cohort_day_ms", "offset_days"])
            .reset_index(drop=True))


SQL_COHORT_RETENTION = """
WITH f AS (SELECT user_id, min(epoch_us(ts) // 86400000000) AS cd
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT e.user_id, f.cd,
             (epoch_us(e.ts) // 86400000000) - f.cd AS offset_days
      FROM events e JOIN f ON e.user_id = f.user_id)
SELECT cd * 86400000 AS cohort_day_ms, offset_days,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM a GROUP BY 1, 2 ORDER BY 1, 2
"""


def _mode_sweep(t: pa.Table) -> pd.DataFrame:
    """Sum block-partial counts per (user, type), then pick each user's
    modal type with a deterministic (count desc, type asc) tie-break."""
    df = (t.to_pandas().groupby(["user_id", "event_type"], sort=False)["n"]
          .sum().reset_index())
    df = df.sort_values(["user_id", "n", "event_type"],
                        ascending=[True, False, True], kind="stable")
    top = df.drop_duplicates("user_id", keep="first")
    return pd.DataFrame({"user_id": top["user_id"].to_numpy(),
                         "mode_type": top["event_type"].to_numpy(),
                         "n_events": top["n"].to_numpy().astype(np.int64)})


def q_mode_event_type(sf_dir: str):
    """Per-key mode (most frequent event type, lexicographic tie-break).
    Block-local (user, type) count partials shrink the exchange to the
    distinct-pair cardinality before the hash shuffle on user_id."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return (df.groupby(["user_id", "event_type"], sort=False)
                .size().rename("n").reset_index())

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(parts, ["user_id"], _mode_sweep)


SQL_MODE_EVENT_TYPE = """
WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn
      FROM c)
SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n_events
FROM r WHERE rn = 1 ORDER BY user_id
"""


def _twa_sweep(t: pa.Table) -> pd.DataFrame:
    """Time-weighted-average partials per user: sort by (ts, id), weight
    each value by the gap to the NEXT event (last event carries no
    weight).  The numerator is rounded per row to an exact int before
    summation (summation-order policy), so both sides sum integers."""
    df = t.to_pandas().sort_values(["user_id", "ts_us", "event_id"],
                                   kind="stable").reset_index(drop=True)
    uid = df["user_id"].to_numpy()
    ts = df["ts_us"].to_numpy()
    val = df["value"].to_numpy()
    nxt_same = np.r_[uid[1:] == uid[:-1], False]
    dt = np.zeros(len(ts), dtype=np.int64)
    dt[:-1] = ts[1:] - ts[:-1]
    dt[~nxt_same] = 0
    num = np.floor(val * dt + 0.5).astype(np.int64)
    g = pd.DataFrame({"user_id": uid, "twa_num": num, "twa_den_us": dt})
    out = g.groupby("user_id", sort=False).agg(
        twa_num=("twa_num", "sum"), twa_den_us=("twa_den_us", "sum")).reset_index()
    return out


def q_time_weighted_avg(sf_dir: str):
    """Time-weighted average per user (each value held until the next
    event).  Emitted as exact integer numerator/denominator pairs, so the
    hash compare is bit-exact regardless of reduction order."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
            "value": batch["value"],
        })

    return grouped_map(ds.map_batches(prep, batch_format="pyarrow"),
                       ["user_id"], _twa_sweep)


SQL_TIME_WEIGHTED_AVG = """
WITH s AS (SELECT user_id, value, epoch_us(ts) AS tsu,
                  lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS nxt
           FROM events)
SELECT user_id,
       CAST(SUM(CASE WHEN nxt IS NULL THEN 0
                     ELSE CAST(floor(value * (nxt - tsu) + 0.5) AS BIGINT)
                END) AS BIGINT) AS twa_num,
       CAST(SUM(CASE WHEN nxt IS NULL THEN 0 ELSE nxt - tsu END)
            AS BIGINT) AS twa_den_us
FROM s GROUP BY user_id ORDER BY user_id
"""


def _regr_sweep(t: pa.Table) -> pd.DataFrame:
    """Combine per-block regression partials (n, Sx, Sy, Sxx, Sxy) and
    finish slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) per user."""
    df = t.to_pandas().groupby("user_id", sort=False).agg(
        n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
        sxx=("sxx", "sum"), sxy=("sxy", "sum")).reset_index()
    n = df["n"].to_numpy().astype(np.float64)
    sx, sy = df["sx"].to_numpy(), df["sy"].to_numpy()
    sxx, sxy = df["sxx"].to_numpy(), df["sxy"].to_numpy()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                         "n_events": df["n"].to_numpy().astype(np.int64),
                         "slope_micros": _micros(slope)})


def q_regr_value_trend(sf_dir: str):
    """Per-key least-squares trend (value vs hours since 2024-01-01):
    classic sufficient-statistics regression — per-block partial sums are
    the only exchanged state (5 doubles per user per block), combined in
    one user_id hash partition.  Slope magnitudes stay O(1) because x is
    centered on the corpus epoch, keeping the micros rounding stable."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        x = (batch["ts"].cast(pa.int64()).to_numpy() - _EPOCH_2024_US) / 3.6e9
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "n": np.ones(batch.num_rows, dtype=np.int64),
            "sx": x,
            "sy": batch["value"].to_numpy(),
            "sxx": x * x,
            "sxy": x * batch["value"].to_numpy(),
        })
        return df.groupby("user_id", sort=False).sum().reset_index()

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(parts, ["user_id"], _regr_sweep)


SQL_REGR_VALUE_TREND = """
WITH s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                  SUM(x) AS sx, SUM(value) AS sy,
                  SUM(x * x) AS sxx, SUM(x * value) AS sxy
           FROM (SELECT user_id, value,
                        (epoch_us(ts) - 1704067200000000) / 3600000000.0 AS x
                 FROM events)
           GROUP BY user_id)
SELECT user_id, n AS n_events,
       CAST(floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000 + 0.5)
            AS BIGINT) AS slope_micros
FROM s ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Multi-way star joins (TPC-H Q3/Q5 family) + per-group NTILE
# ---------------------------------------------------------------------------


def _collect_lookup(ds: "ray.data.Dataset", key: str, val: str | None
                    ) -> tuple[np.ndarray, np.ndarray | None]:
    """Materialize a DIM table's (key[, value]) columns as sorted numpy
    arrays for broadcast via ``ray.put`` — legal only for dimension-sized
    sides (customer/supplier/nation/region); fact-fact joins go through
    the tagged-union co-partitioned path instead."""
    cols = [key] if val is None else [key, val]
    refs = arrow_refs(ds.select_columns(cols))
    t = pa.concat_tables([ray.get(r) for r in refs], promote_options="default")
    k = t[key].to_numpy().astype(np.int64)
    order = np.argsort(k, kind="stable")
    v = None if val is None else t[val].to_numpy()[order]
    return k[order], v


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape (shipping priority): BUILDING-segment customers,
    orders placed before / lineitems shipped after the cut date, top 10
    open orders by outstanding revenue.  Plan: the customer dim filter
    broadcasts a sorted custkey array (ray.put once); orders prune on it
    map-side; the big orders-lineitem join is tagged-union co-partitioned
    on orderkey (no fact broadcast); per-partition partial top-10s merge
    on the driver (<= 10 x P rows)."""
    import pyarrow.compute as pc

    CUT_US = 883_612_800_000_000  # 1998-01-01 in epoch micros

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def _building_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["c_mktsegment"], "BUILDING"))

    ck, _ = _collect_lookup(
        cust.map_batches(_building_only, batch_format="pyarrow"), "c_custkey", None)
    ck_ref = ray.put(ck)

    def orders_tag(batch: pa.Table) -> pa.Table:
        keys = ray.get(ck_ref)
        date_us = batch["o_orderdate"].cast(pa.int64()).to_numpy()
        custk = batch["o_custkey"].to_numpy().astype(np.int64)
        if len(keys) == 0:
            keep = np.zeros(len(custk), dtype=bool)
        else:
            pos = np.searchsorted(keys, custk)
            pos[pos >= len(keys)] = 0
            keep = (date_us < CUT_US) & (keys[pos] == custk)
        n = int(keep.sum())
        return pa.table({
            "orderkey": pa.array(batch["o_orderkey"].to_numpy()[keep], pa.int64()),
            "orderdate_ms": pa.array(date_us[keep] // 1000, pa.int64()),
            "rev_cents": pa.array(np.zeros(n, np.int64), pa.int64()),
            "side": pa.array(np.ones(n, np.int64), pa.int64()),
        })

    def li_tag(batch: pa.Table) -> pa.Table:
        keep = batch["l_shipdate"].cast(pa.int64()).to_numpy() > CUT_US
        px = batch["l_extendedprice"].to_numpy()[keep]
        disc = batch["l_discount"].to_numpy()[keep]
        n = int(keep.sum())
        return pa.table({
            "orderkey": pa.array(batch["l_orderkey"].to_numpy()[keep], pa.int64()),
            "orderdate_ms": pa.array(np.zeros(n, np.int64), pa.int64()),
            "rev_cents": pa.array(_cents(px * (1.0 - disc)), pa.int64()),
            "side": pa.array(np.zeros(n, np.int64), pa.int64()),
        })

    def _q3_sweep(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        o = df[df["side"] == 1].drop_duplicates("orderkey")
        li = df[df["side"] == 0].merge(o[["orderkey", "orderdate_ms"]],
                                       on="orderkey", suffixes=("", "_o"))
        g = (li.groupby(["orderkey", "orderdate_ms_o"], sort=False)["rev_cents"]
             .sum().reset_index())
        g = g.sort_values(["rev_cents", "orderkey"],
                          ascending=[False, True], kind="stable").head(10)
        return pd.DataFrame({"o_orderkey": g["orderkey"].to_numpy(),
                             "orderdate_ms": g["orderdate_ms_o"].to_numpy(),
                             "revenue_cents": g["rev_cents"].to_numpy().astype(np.int64)})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    tagged = li.map_batches(li_tag, batch_format="pyarrow").union(
        orders.map_batches(orders_tag, batch_format="pyarrow"))
    parts = grouped_map(tagged, ["orderkey"], _q3_sweep).to_pandas()
    out = parts.sort_values(["revenue_cents", "o_orderkey"],
                            ascending=[False, True], kind="stable").head(10)
    return out.reset_index(drop=True)


SQL_SHIPPING_PRIORITY = """
SELECT o_orderkey, epoch_ms(o_orderdate) AS orderdate_ms,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 2
ORDER BY revenue_cents DESC, o_orderkey
LIMIT 10
"""


def q_regional_volume(sf_dir: str):
    """TPC-H Q5 shape (local-supplier volume): revenue per (region,
    nation) where the customer and the supplier share a nation.  The
    three dimension sides (nation->region, customer->nation,
    supplier->nation) broadcast once as sorted-key arrays; the
    orders-lineitem fact-fact join is tagged-union co-partitioned on
    orderkey, with per-partition (nation, revenue) partials so only a
    nations-sized table leaves each partition."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nk = nation.sort_values("n_nationkey")
    nat_keys = nk["n_nationkey"].to_numpy().astype(np.int64)
    nat_region = nk.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    nat_region = nat_region.sort_values("n_nationkey")

    sk, sv = _collect_lookup(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
                             "s_suppkey", "s_nationkey")
    ck, cv = _collect_lookup(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
                             "c_custkey", "c_nationkey")
    sup_ref = ray.put((sk, sv.astype(np.int64)))
    cust_ref = ray.put((ck, cv.astype(np.int64)))

    def orders_tag(batch: pa.Table) -> pa.Table:
        keys, nats = ray.get(cust_ref)
        custk = batch["o_custkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, custk)
        pos[pos >= len(keys)] = 0
        ok = keys[pos] == custk
        return pa.table({
            "orderkey": pa.array(batch["o_orderkey"].to_numpy()[ok], pa.int64()),
            "nationkey": pa.array(nats[pos[ok]], pa.int64()),
            "rev_cents": pa.array(np.zeros(int(ok.sum()), np.int64), pa.int64()),
            "side": pa.array(np.ones(int(ok.sum()), np.int64), pa.int64()),
        })

    def li_tag(batch: pa.Table) -> pa.Table:
        keys, nats = ray.get(sup_ref)
        suppk = batch["l_suppkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, suppk)
        pos[pos >= len(keys)] = 0
        ok = keys[pos] == suppk
        px = batch["l_extendedprice"].to_numpy()[ok]
        disc = batch["l_discount"].to_numpy()[ok]
        return pa.table({
            "orderkey": pa.array(batch["l_orderkey"].to_numpy()[ok], pa.int64()),
            "nationkey": pa.array(nats[pos[ok]], pa.int64()),
            "rev_cents": pa.array(_cents(px * (1.0 - disc)), pa.int64()),
            "side": pa.array(np.zeros(int(ok.sum()), np.int64), pa.int64()),
        })

    def _q5_sweep(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        o = df[df["side"] == 1].drop_duplicates("orderkey")
        li = df[df["side"] == 0].merge(
            o[["orderkey", "nationkey"]], on="orderkey", suffixes=("", "_c"))
        li = li[li["nationkey"] == li["nationkey_c"]]
        g = li.groupby("nationkey", sort=False)["rev_cents"].agg(["sum", "size"])
        return pd.DataFrame({"nationkey": g.index.to_numpy(),
                             "rev": g["sum"].to_numpy().astype(np.int64),
                             "n": g["size"].to_numpy().astype(np.int64)})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey",
                                    "l_extendedprice", "l_discount"])
    tagged = li.map_batches(li_tag, batch_format="pyarrow").union(
        orders.map_batches(orders_tag, batch_format="pyarrow"))
    parts = grouped_map(tagged, ["orderkey"], _q5_sweep).to_pandas()
    agg = parts.groupby("nationkey", sort=False).agg(
        revenue_cents=("rev", "sum"), n_items=("n", "sum")).reset_index()
    pos = np.searchsorted(nat_keys, agg["nationkey"].to_numpy())
    out = pd.DataFrame({
        "r_name": nat_region["r_name"].to_numpy()[pos],
        "n_name": nat_region["n_name"].to_numpy()[pos],
        "revenue_cents": agg["revenue_cents"].to_numpy().astype(np.int64),
        "n_items": agg["n_items"].to_numpy().astype(np.int64),
    })
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


SQL_REGIONAL_VOLUME = """
SELECT r_name, n_name,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _ntile_sweep(t: pa.Table, k: int) -> pd.DataFrame:
    """SQL NTILE(k) per group: first n%k buckets get ceil(n/k) rows,
    the rest floor(n/k) — computed vectorized across all groups in the
    partition from each row's in-group rank."""
    df = t.to_pandas().sort_values(
        ["c_mktsegment", "acctbal_cents", "c_custkey"],
        ascending=[True, False, True], kind="stable").reset_index(drop=True)
    g = df.groupby("c_mktsegment", sort=False)
    idx0 = g.cumcount().to_numpy()
    n = g["c_custkey"].transform("size").to_numpy()
    q, r = n // k, n % k
    big = (q + 1) * r
    tile = np.where(idx0 < big, idx0 // np.maximum(q + 1, 1),
                    r + (idx0 - big) // np.maximum(q, 1)) + 1
    return pd.DataFrame({"c_custkey": df["c_custkey"].to_numpy(),
                         "c_mktsegment": df["c_mktsegment"].to_numpy(),
                         "tile": tile.astype(np.int64)})


def q_ntile_acctbal(sf_dir: str):
    """Per-group NTILE(4): customers quartiled by account balance within
    their market segment (exact SQL NTILE bucket-size semantics,
    deterministic (balance desc, custkey) tie-break).  One hash exchange
    on the group key; ranking is a per-partition vectorized sort —
    partition count scales with group cardinality, and a single group is
    assumed to fit a worker (the same contract as grouped_map)."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch["c_custkey"].cast(pa.int64()),
            "c_mktsegment": batch["c_mktsegment"],
            "acctbal_cents": pa.array(_cents(batch["c_acctbal"].to_numpy()), pa.int64()),
        })

    return grouped_map(ds.map_batches(prep, batch_format="pyarrow"),
                       ["c_mktsegment"], _ntile_sweep, fn_kwargs={"k": 4})


SQL_NTILE_ACCTBAL = """
SELECT c_custkey, c_mktsegment,
       CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                           ORDER BY CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) DESC,
                                    c_custkey) AS BIGINT) AS tile
FROM customer ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# C4-style cross-document span dedup + count-min frequency sketch
# ---------------------------------------------------------------------------


def _chunk_share_sweep(t: pa.Table) -> pd.DataFrame:
    """Per chunk-partition sweep: every occurrence of a chunk is
    co-located, so distinct-doc counts per chunk are exact here; emit
    per-doc partials (chunk positions seen / positions whose chunk is
    shared by >= 2 docs) — only doc-count-sized rows leave."""
    df = t.to_pandas()
    nd = df.groupby("chunk", sort=False)["doc_id"].nunique()
    shared = nd.index[nd >= 2]
    df["sh"] = df["chunk"].isin(shared).astype(np.int64)
    out = df.groupby("doc_id", sort=False).agg(
        n_chunks=("chunk", "size"), n_shared=("sh", "sum")).reset_index()
    return out


def q_chunk_dedup_stats(sf_dir: str):
    """C4-style span-level dedup scan: each document's 5-word chunks,
    flagged when the identical chunk appears in >= 2 distinct documents
    (the unit you would cut to kill boilerplate/mirrored spans).  Fully
    shuffle-based — chunk rows hash-exchange on the chunk string (exact
    distinct-doc counts, no shared-set broadcast, no false-positive
    structure), then doc-id partials combine in a second small exchange.
    At 100 TB the chunk key would be a 16-byte hash instead of the
    string; the string key keeps the small-scale oracle collision-free."""
    from ..stages import textops as tx

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    chunks = ds.map_batches(tx.doc_word_chunks, batch_format="pyarrow")
    parts = grouped_map(chunks, ["chunk"], _chunk_share_sweep)
    final = grouped_map(parts, ["doc_id"], _combine_partials,
                        fn_kwargs={"keys": ["doc_id"],
                                   "sums": ["n_chunks", "n_shared"]})

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_chunks": batch["n_chunks"].cast(pa.int64()),
            "n_shared": batch["n_shared"].cast(pa.int64()),
        })

    return final.map_batches(finish, batch_format="pyarrow")


SQL_CHUNK_DEDUP_STATS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
c AS (SELECT doc_id, array_to_string(s[(5*i+1):(5*i+5)], ' ') AS chunk
      FROM w, LATERAL (SELECT unnest(generate_series(0, CAST(len(s) // 5 AS INT) - 1)) AS i) g(i)),
sh AS (SELECT chunk FROM c GROUP BY chunk HAVING COUNT(DISTINCT doc_id) >= 2)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN chunk IN (SELECT chunk FROM sh) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_shared
FROM c GROUP BY doc_id ORDER BY doc_id
"""


def q_countmin_check(sf_dir: str):
    """Count-min sketch (stages/sketch.py) over events.user_id,
    cross-checked inline against the exact per-user counts (the same
    driver-visible pin pattern as approx_distinct):

    - ``est_never_undercounts`` — CMS point queries are >= exact for
      every key (a theorem for sum-merged CMS; checked over all keys);
    - ``violations_within_delta`` — keys whose overcount exceeds the
      (e/w)*N Markov bound number at most ceil(2*delta*n_keys) with
      delta = e^-d (deterministic on the seeded fixture; the 2x margin
      absorbs the per-key variance of the expected-count bound).

    The exact n_users/n_events columns are SQL-green; the flags are
    pinned constants the sketch must reproduce."""
    import math

    from ..stages import sketch as sk

    ds = _read(sf_dir, "events", ["user_id"])
    table = sk.cms_counts(ds, "user_id")

    def _exact_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"user_id": batch["user_id"].to_numpy()})
        return df.groupby("user_id", sort=False).size().rename("n").reset_index()

    exact = (_read(sf_dir, "events", ["user_id"])
             .map_batches(_exact_partial, batch_format="pyarrow").to_pandas()
             .groupby("user_id", sort=False)["n"].sum())
    keys = exact.index.to_numpy().astype(np.int64)
    est = sk.cms_estimate(table, keys)
    excess = est - exact.to_numpy()
    n_events = int(exact.sum())
    bound = math.e / sk.CMS_W * n_events
    delta = math.exp(-sk.CMS_D)
    budget = math.ceil(2.0 * delta * len(keys))
    return pd.DataFrame({
        "n_users": np.array([len(keys)], dtype=np.int64),
        "n_events": np.array([n_events], dtype=np.int64),
        "est_never_undercounts": np.array([int((excess >= 0).all())], dtype=np.int64),
        "violations_within_delta": np.array(
            [int((excess > bound).sum() <= budget)], dtype=np.int64),
    })


SQL_COUNTMIN_CHECK = """
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(1 AS BIGINT) AS est_never_undercounts,
       CAST(1 AS BIGINT) AS violations_within_delta
FROM events
"""


# ---------------------------------------------------------------------------
# Temperature source-mixing + forward-fill gap resample
# ---------------------------------------------------------------------------

MIX_ALPHA = 0.5


def q_temperature_mix(sf_dir: str):
    """Temperature-based language rebalancing (the multinomial
    alpha-sampling used to flatten source/language skew in LLM training
    mixes): per-lang keep rate r_l = (min_n / n_l)^(1-alpha) so the
    rarest language keeps everything and head languages downsample
    toward the temperature-flattened distribution.  Selection reuses the
    seedless LCG key, so any parallelism (and SQL) keeps identical docs.
    The per-lang counts are a block-partial + tiny driver combine; the
    5-entry threshold map rides the task closure."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def count_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"lang": batch["lang"].to_pandas()})
        return df.groupby("lang", sort=False).size().rename("n").reset_index()

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .to_pandas().groupby("lang", sort=False)["n"].sum())
    mn = float(counts.min())
    thresh = {lang: int(np.floor((mn / n) ** (1.0 - MIX_ALPHA) * _LCG_M))
              for lang, n in counts.items()}

    def pick(batch: pa.Table) -> pa.Table:
        sk = _sample_key(batch["doc_id"].to_numpy())
        th = pd.Series(thresh).reindex(batch["lang"].to_pandas()).to_numpy()
        keep = sk < th
        return pa.table({
            "doc_id": pa.array(batch["doc_id"].to_numpy()[keep], pa.int64()),
            "lang": batch["lang"].filter(pa.array(keep)),
        })

    return _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        pick, batch_format="pyarrow")


SQL_TEMPERATURE_MIX = f"""
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
m AS (SELECT MIN(n) AS mn FROM c),
r AS (SELECT lang,
             CAST(floor(pow(CAST(mn AS DOUBLE) / n, 0.5) * {_LCG_M})
                  AS BIGINT) AS thresh
      FROM c, m)
SELECT d.doc_id, d.lang
FROM documents d JOIN r ON d.lang = r.lang
WHERE (((d.doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M})
       * {_LCG_A} + {_LCG_C}) % {_LCG_M} < r.thresh
ORDER BY d.doc_id
"""


def _gapfill_sweep(t: pa.Table, d0: int, d1: int) -> pd.DataFrame:
    """Per user-partition forward fill: last event per (user, day)
    (ts/event_id tie-break), merge_asof onto the shared day grid."""
    df = t.to_pandas().sort_values(["user_id", "ts_us", "event_id"],
                                   kind="stable").reset_index(drop=True)
    df["day"] = df["ts_us"].to_numpy() // _DAY_US
    last = df.drop_duplicates(["user_id", "day"], keep="last")
    users = np.sort(df["user_id"].unique())
    days = np.arange(d0, d1 + 1, dtype=np.int64)
    grid = pd.DataFrame({
        "user_id": np.repeat(users, len(days)),
        "day": np.tile(days, len(users)),
    }).sort_values(["day", "user_id"], kind="stable")
    filled = pd.merge_asof(
        grid, last[["user_id", "day", "value"]].sort_values(["day", "user_id"],
                                                            kind="stable"),
        on="day", by="user_id", direction="backward")
    filled = filled.dropna(subset=["value"])
    return pd.DataFrame({
        "user_id": filled["user_id"].to_numpy(),
        "day_ms": filled["day"].to_numpy() * 86_400_000,
        "last_value": filled["value"].to_numpy(),
    })


def q_gap_fill_daily(sf_dir: str):
    """Forward-fill resample (gap fill): each user's latest value carried
    onto a daily grid spanning the corpus (rows before a user's first
    event are dropped, matching the SQL IGNORE NULLS window).  The grid
    bounds come from exact integer min/max partials; the fill itself is
    one user_id exchange + a vectorized per-partition merge_asof.  Values
    pass through untouched from parquet, so the compare is bit-exact."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
            "value": batch["value"],
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow")

    def bounds_partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts_us"].to_numpy()
        return pa.table({"lo": pa.array([int(ts.min())], pa.int64()),
                         "hi": pa.array([int(ts.max())], pa.int64())})

    b = prepped.map_batches(bounds_partial, batch_format="pyarrow").to_pandas()
    d0 = int(b["lo"].min() // _DAY_US)
    d1 = int(b["hi"].max() // _DAY_US)
    return grouped_map(prepped, ["user_id"], _gapfill_sweep,
                       fn_kwargs={"d0": d0, "d1": d1})


SQL_GAP_FILL_DAILY = """
WITH b AS (SELECT CAST(min(epoch_us(ts)) // 86400000000 AS BIGINT) AS d0,
                  CAST(max(epoch_us(ts)) // 86400000000 AS BIGINT) AS d1 FROM events),
e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d, value,
             row_number() OVER (PARTITION BY user_id, epoch_us(ts) // 86400000000
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events),
lpd AS (SELECT user_id, d, value FROM e WHERE rn = 1),
grid AS (SELECT u.user_id, gs.d AS day
         FROM (SELECT DISTINCT user_id FROM events) u, b,
              LATERAL (SELECT unnest(generate_series(b.d0, b.d1)) AS d) gs),
j AS (SELECT g.user_id, g.day, l.value
      FROM grid g LEFT JOIN lpd l ON g.user_id = l.user_id AND g.day = l.d),
f AS (SELECT user_id, day,
             last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS last_value
      FROM j)
SELECT user_id, day * 86400000 AS day_ms, last_value
FROM f WHERE last_value IS NOT NULL
"""


def _transition_sweep(t: pa.Table) -> pd.DataFrame:
    """Per user-partition Markov pair counts: sort by (user, ts, id),
    shift, drop the cross-user seam, count (prev, next) pairs — at most
    |types|^2 rows leave each partition."""
    df = t.to_pandas().sort_values(["user_id", "ts_us", "event_id"],
                                   kind="stable").reset_index(drop=True)
    uid = df["user_id"].to_numpy()
    et = df["event_type"].to_numpy()
    same = uid[1:] == uid[:-1]
    pairs = pd.DataFrame({"prev_type": et[:-1][same], "next_type": et[1:][same]})
    return (pairs.groupby(["prev_type", "next_type"], sort=False)
            .size().rename("n").reset_index())


def q_event_transitions(sf_dir: str):
    """Event-sequence transition matrix (first-order Markov counts of
    consecutive event types per user) — the session-path analytics shape.
    One user_id exchange, vectorized shifted-pair sweep, |types|^2-row
    partials, tiny driver combine."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
            "event_type": batch["event_type"],
        })

    parts = grouped_map(ds.map_batches(prep, batch_format="pyarrow"),
                        ["user_id"], _transition_sweep).to_pandas()
    out = (parts.groupby(["prev_type", "next_type"], sort=False)["n"].sum()
           .reset_index().sort_values(["prev_type", "next_type"])
           .reset_index(drop=True))
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_EVENT_TRANSITIONS = """
WITH s AS (SELECT user_id, event_type,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS nxt
           FROM events)
SELECT event_type AS prev_type, nxt AS next_type, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_zscore_chars(sf_dir: str):
    """Per-language z-score normalization of document length — the
    feature-standardization op of an ML data pipeline.  Pass 1: (n, sum,
    sumsq) partials per lang (tiny driver combine); pass 2: stateless
    per-doc scoring against the 5-entry moment map.  stddev is the
    sample (n-1) estimator to match SQL stddev_samp; micros rounding
    absorbs the partial-vs-Welford summation ulp."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def moments(batch: pa.Table) -> pd.DataFrame:
        x = batch["n_chars"].to_numpy().astype(np.float64)
        df = pd.DataFrame({"lang": batch["lang"].to_pandas(), "n": 1,
                           "s1": x, "s2": x * x})
        return df.groupby("lang", sort=False).sum().reset_index()

    m = (ds.map_batches(moments, batch_format="pyarrow").to_pandas()
         .groupby("lang", sort=False).sum(numeric_only=True))
    mean = m["s1"] / m["n"]
    sd = np.sqrt((m["s2"] - m["s1"] ** 2 / m["n"]) / (m["n"] - 1))
    # vectorized Arrow index_in against the tiny lang vocabulary instead
    # of a per-row pandas dict probe (broadcast-lookup idiom)
    langs = pa.array(mean.index.tolist())
    mean_a, sd_a = mean.to_numpy(), sd.to_numpy()

    def score(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch["lang"], value_set=langs).to_numpy(
            zero_copy_only=False).astype(np.int64)
        mu = mean_a[idx]
        s = sd_a[idx]
        z = (batch["n_chars"].to_numpy().astype(np.float64) - mu) / s
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "lang": batch["lang"],
            "z_micros": pa.array(_micros(z), pa.int64()),
        })

    return _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        score, batch_format="pyarrow")


SQL_ZSCORE_CHARS = """
WITH s AS (SELECT lang, avg(n_chars) AS m, stddev_samp(n_chars) AS sd
           FROM documents GROUP BY lang)
SELECT doc_id, d.lang,
       CAST(floor((n_chars - m) / sd * 1000000 + 0.5) AS BIGINT) AS z_micros
FROM documents d JOIN s ON d.lang = s.lang
ORDER BY doc_id
"""


def q_label_centroid_norms(sf_dir: str):
    """Per-label embedding-centroid norm (cluster-tightness telemetry for
    an embedding corpus: 1.0 = all vectors identical, -> 0 = isotropic).
    Per-block partials are (label, count, 64-float sum vector) — the
    classic vector sufficient statistic, constant-size per label per
    block regardless of corpus size; the driver combine touches only
    labels x dims floats."""
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy().astype(np.int64)
        vecs = np.asarray(batch["embedding"].combine_chunks().flatten()
                          .to_numpy(zero_copy_only=False), dtype=np.float64)
        dim = vecs.size // max(len(lab), 1)
        vecs = vecs.reshape(len(lab), dim) if len(lab) else vecs.reshape(0, 0)
        labels = np.unique(lab)
        sums = np.zeros((len(labels), dim), dtype=np.float64)
        cnts = np.zeros(len(labels), dtype=np.int64)
        for j, l in enumerate(labels):      # <= n_labels rows, vectorized inner
            m = lab == l
            sums[j] = vecs[m].sum(axis=0)
            cnts[j] = int(m.sum())
        return pa.table({
            "label": pa.array(labels, pa.int64()),
            "n": pa.array(cnts, pa.int64()),
            "s": pa.array(list(sums), pa.list_(pa.float64())),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for label, g in parts.groupby("label", sort=True):
        n = int(g["n"].sum())
        s = np.sum(np.stack(g["s"].to_numpy()), axis=0)
        norm = float(np.sqrt(np.sum((s / n) ** 2)))
        out.append({"label": int(label), "n_vecs": n,
                    "centroid_norm_micros": int(_micros(norm))})
    return pd.DataFrame(out)


SQL_LABEL_CENTROID_NORMS = """
WITH comp AS (SELECT label, unnest(embedding) AS v,
                     unnest(range(len(embedding))) AS i
              FROM embeddings),
c AS (SELECT label, i, avg(CAST(v AS DOUBLE)) AS m, COUNT(*) AS n
      FROM comp GROUP BY 1, 2)
SELECT CAST(label AS BIGINT) AS label, CAST(MIN(n) AS BIGINT) AS n_vecs,
       CAST(floor(sqrt(sum(m * m)) * 1000000 + 0.5) AS BIGINT)
         AS centroid_norm_micros
FROM c GROUP BY label ORDER BY label
"""


def q_weighted_sample(sf_dir: str):
    """Importance sampling by document length (keep probability
    n_chars / max_chars — the 'value-weighted' cousin of the temperature
    mix): deterministic LCG key threshold, so any parallelism and the
    SQL oracle keep identical docs.  The only shared state is the exact
    integer corpus max from block partials."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def max_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"m": pa.array([int(batch["n_chars"].to_numpy().max())],
                                       pa.int64())})

    mx = int(ds.map_batches(max_partial, batch_format="pyarrow")
             .to_pandas()["m"].max())

    def pick(batch: pa.Table) -> pa.Table:
        sk = _sample_key(batch["doc_id"].to_numpy())
        nc = batch["n_chars"].to_numpy().astype(np.int64)
        # integer cross-multiply: sk * mx < nc * M  (exact, no float)
        keep = sk * mx < nc * _LCG_M
        return pa.table({
            "doc_id": pa.array(batch["doc_id"].to_numpy()[keep], pa.int64()),
            "n_chars": pa.array(nc[keep], pa.int64()),
        })

    return _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        pick, batch_format="pyarrow")


SQL_WEIGHTED_SAMPLE = f"""
WITH m AS (SELECT MAX(n_chars) AS mx FROM documents)
SELECT doc_id, n_chars
FROM documents, m
WHERE ((((doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M})
        * {_LCG_A} + {_LCG_C}) % {_LCG_M}) * mx < n_chars * {_LCG_M}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Round-3c additions: rolling/range window frames, ordered string paths,
# distribution entropy, semi join, lag deltas, PII-style redaction, and
# distinct-user telemetry — behavioral-analytics + curation surface beyond
# the reference's operator list (SURVEY.md §2 extension family).
# ---------------------------------------------------------------------------

HOUR_US = 3_600_000_000


def _rolling_sweep(t: pa.Table) -> pd.DataFrame:
    """Trailing RANGE-frame mean over one hash partition: sort by
    (user, ts, id), then per-user two-pointer searchsorted bounds over a
    prefix-sum — O(n log n) per partition, no per-row SQL-style window
    re-scan.  Frame semantics mirror SQL RANGE BETWEEN 1 HOUR PRECEDING
    AND CURRENT ROW: timestamp peers of the current row are all inside
    the frame regardless of physical order."""
    df = t.to_pandas().sort_values(["user_id", "ts_us", "event_id"],
                                   kind="stable").reset_index(drop=True)
    uid = df["user_id"].to_numpy()
    ts = df["ts_us"].to_numpy()
    val = df["value"].to_numpy()
    n = len(df)
    starts = np.r_[0, np.flatnonzero(uid[1:] != uid[:-1]) + 1, n]
    avg = np.empty(n, np.float64)
    cnt = np.empty(n, np.int64)
    for i in range(len(starts) - 1):
        lo, hi = starts[i], starts[i + 1]
        seg = ts[lo:hi]
        cs = np.zeros(hi - lo + 1, np.float64)
        np.cumsum(val[lo:hi], out=cs[1:])
        left = np.searchsorted(seg, seg - HOUR_US, "left")
        right = np.searchsorted(seg, seg, "right")
        c = right - left
        avg[lo:hi] = (cs[right] - cs[left]) / c
        cnt[lo:hi] = c
    return pd.DataFrame({
        "event_id": df["event_id"].to_numpy(),
        "user_id": uid,
        "roll_avg_micros": np.floor(avg * 1e6 + 0.5).astype(np.int64),
        "n_in_window": cnt,
    })


def q_rolling_hourly_avg(sf_dir: str):
    """Time-RANGE window frame (vs running_revenue's ROWS frame): per
    user, trailing 1-hour mean purchase value at every purchase event.
    One hash exchange on user_id; the sweep is a vectorized two-pointer
    over per-user prefix sums."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["event_type"], "purchase"))
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
            "value": batch["value"].cast(pa.float64()),
        })

    return grouped_map(ds.map_batches(prep, batch_format="pyarrow"),
                       ["user_id"], _rolling_sweep)


SQL_ROLLING_HOURLY_AVG = """
SELECT event_id, user_id,
       CAST(floor(AVG(value) OVER w * 1e6 + 0.5) AS BIGINT) AS roll_avg_micros,
       COUNT(*) OVER w AS n_in_window
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


PATH_LEN = 8


def _path_sweep(t: pa.Table) -> pd.DataFrame:
    """Ordered string_agg per key over one hash partition: sort, keep
    each user's first PATH_LEN events, join the types.  The string join
    is per-GROUP (bounded at PATH_LEN terms), not per-row."""
    df = t.to_pandas().sort_values(["user_id", "ts_us", "event_id"],
                                   kind="stable").reset_index(drop=True)
    rn = df.groupby("user_id", sort=False).cumcount()
    head = df[rn < PATH_LEN]
    agg = head.groupby("user_id", sort=False)["event_type"].agg("->".join)
    return agg.rename("path8").reset_index()


def q_event_paths(sf_dir: str):
    """Ordered collect/string_agg (clickstream path analysis): each
    user's first 8 event types as one '->' path.  Deterministic order by
    (ts, event_id); one exchange on user_id."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
            "event_type": batch["event_type"].cast(pa.string()),
        })

    return grouped_map(ds.map_batches(prep, batch_format="pyarrow"),
                       ["user_id"], _path_sweep)


SQL_EVENT_PATHS = """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events)
SELECT user_id, string_agg(event_type, '->' ORDER BY rn) AS path8
FROM ranked WHERE rn <= 8 GROUP BY user_id
"""


def _entropy_sweep(t: pa.Table) -> pd.DataFrame:
    df = (t.to_pandas().groupby(["user_id", "event_type"], sort=False)["n"]
          .sum().reset_index())
    tot = df.groupby("user_id", sort=False)["n"].transform("sum").to_numpy()
    p = df["n"].to_numpy(np.float64) / tot
    df["term"] = -p * np.log2(p)
    ent = df.groupby("user_id", sort=False)["term"].sum()
    return pd.DataFrame({
        "user_id": ent.index.to_numpy(),
        "entropy_micros": np.floor(ent.to_numpy() * 1e6 + 0.5).astype(np.int64),
    })


def q_user_entropy(sf_dir: str):
    """Shannon entropy of each user's event-type distribution (a
    behavioral diversity score; same math as a token-distribution
    quality gate on documents).  Per-block partial (user, type) counts
    are the only exchange; the per-user p·log2 p reduction is
    vectorized in the partition sweep."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "event_type": batch["event_type"].to_pandas(),
        })
        return (df.groupby(["user_id", "event_type"], sort=False)
                .size().rename("n").reset_index())

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(parts, ["user_id"], _entropy_sweep)


SQL_USER_ENTROPY = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
t AS (SELECT user_id, SUM(n) AS tot FROM c GROUP BY 1)
SELECT c.user_id,
       CAST(floor(SUM(-(n * 1.0 / tot) * LOG2(n * 1.0 / tot)) * 1e6 + 0.5)
            AS BIGINT) AS entropy_micros
FROM c JOIN t USING (user_id)
GROUP BY c.user_id
"""


def _semi_join_sweep(t: pa.Table) -> pd.DataFrame:
    """Semi-join complement of _anti_join_sweep: keep customer rows whose
    custkey DOES appear on the orders side, partial-agg the survivors."""
    df = t.to_pandas()
    ordered = pd.Index(df.loc[df["side"] == 1, "custkey"].unique())
    cust = df[df["side"] == 0]
    keep = cust[cust["custkey"].isin(ordered)]
    if keep.empty:
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype="object"),
                             "n_customers": pd.Series([], dtype="int64"),
                             "acctbal_cents": pd.Series([], dtype="int64")})
    g = keep.groupby("c_mktsegment", sort=False)["acctbal_cents"]
    return g.agg(n_customers="size", acctbal_cents="sum").reset_index() \
            [["c_mktsegment", "n_customers", "acctbal_cents"]]


def q_customers_with_orders(sf_dir: str):
    """Semi join (EXISTS shape), the complement of
    customers_without_orders: customers with at least one OPEN order,
    rolled up per market segment.  Same scale shape — both sides tagged
    and hash-co-partitioned on custkey with the orders side deduped per
    block, no broadcast of the orders key set."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def cust_tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": batch["c_custkey"].cast(pa.int64()),
            "c_mktsegment": batch["c_mktsegment"].cast(pa.string()),
            "acctbal_cents": pa.array(_cents(batch["c_acctbal"].to_numpy()), pa.int64()),
            "side": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
        })

    def orders_tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["o_orderstatus"], "O"))
        keys = np.unique(batch["o_custkey"].to_numpy().astype(np.int64))
        n = len(keys)
        return pa.table({
            "custkey": pa.array(keys, pa.int64()),
            "c_mktsegment": pa.array([""] * n, pa.string()),
            "acctbal_cents": pa.array(np.zeros(n, np.int64), pa.int64()),
            "side": pa.array(np.ones(n, np.int64), pa.int64()),
        })

    tagged = cust.map_batches(cust_tag, batch_format="pyarrow").union(
        orders.map_batches(orders_tag, batch_format="pyarrow"))
    parts = grouped_map(tagged, ["custkey"], _semi_join_sweep)
    pdf = parts.to_pandas()
    if pdf.empty:
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype="object"),
                             "n_customers": pd.Series([], dtype="int64"),
                             "acctbal_cents": pd.Series([], dtype="int64")})
    return (pdf.groupby("c_mktsegment", sort=False)
            .agg(n_customers=("n_customers", "sum"),
                 acctbal_cents=("acctbal_cents", "sum")).reset_index())


SQL_CUSTOMERS_WITH_ORDERS = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS acctbal_cents
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
GROUP BY c_mktsegment
"""


def q_daily_revenue_change(sf_dir: str):
    """lag()-based day-over-day deltas: per order priority, each day's
    revenue vs the previous PRESENT day (COALESCE 0 on the first).  The
    scan emits per-block (priority, day) partials; the final is bounded
    by days x priorities, so the shift runs on the tiny driver-side
    table (same small-final policy as rollup_revenue)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        day_ms = (batch["o_orderdate"].cast(pa.int64()).to_numpy()
                  // 1000 // 86_400_000) * 86_400_000
        df = pd.DataFrame({
            "o_orderpriority": batch["o_orderpriority"].to_pandas(),
            "day_ms": day_ms,
            "rev_cents": _cents(batch["o_totalprice"].to_numpy()),
        })
        return (df.groupby(["o_orderpriority", "day_ms"], sort=False)["rev_cents"]
                .sum().reset_index())

    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (pdf.groupby(["o_orderpriority", "day_ms"], sort=False)["rev_cents"]
           .sum().reset_index()
           .sort_values(["o_orderpriority", "day_ms"], kind="stable")
           .reset_index(drop=True))
    prev = (agg.groupby("o_orderpriority", sort=False)["rev_cents"]
            .shift(1).fillna(0).astype(np.int64))
    agg["prev_cents"] = prev
    agg["delta_cents"] = agg["rev_cents"] - prev
    return agg


SQL_DAILY_REVENUE_CHANGE = """
WITH d AS (
  SELECT o_orderpriority,
         (epoch_ms(o_orderdate) // 86400000) * 86400000 AS day_ms,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_cents
  FROM orders GROUP BY 1, 2)
SELECT o_orderpriority, day_ms, rev_cents,
       COALESCE(LAG(rev_cents) OVER (PARTITION BY o_orderpriority ORDER BY day_ms),
                0) AS prev_cents,
       rev_cents - COALESCE(LAG(rev_cents) OVER (PARTITION BY o_orderpriority
                                                 ORDER BY day_ms), 0) AS delta_cents
FROM d
"""


# PII-masking analog: the synthetic corpus carries no emails/phones, so the
# sensitive-term pattern is configured to terms the fixture does contain —
# the operator (count + redact + per-source audit stats) is the deliverable,
# the pattern is a config knob exactly as in a real redaction pass.
REDACT_PATTERN = r"\b(customer|spark|value)\b"


def q_pattern_redact(sf_dir: str):
    """Regex redaction audit (PII-masking shape): per source, how many
    docs matched the sensitive pattern, total matches, and how many
    characters redaction removes (replacement '***').  Vectorized
    polars regex kernels per block; only the 20-row per-source partial
    leaves each task."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        pl = fp._polars()
        text = pl.from_arrow(batch["text"])
        m = text.str.count_matches(REDACT_PATTERN).to_numpy().astype(np.int64)
        red = text.str.replace_all(REDACT_PATTERN, "***")
        diff = (text.str.len_chars().to_numpy().astype(np.int64)
                - red.str.len_chars().to_numpy().astype(np.int64))
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "matched": (m > 0).astype(np.int64),
            "m": m,
            "d": diff,
        })
        return (df.groupby("source", sort=False)
                .agg(n_docs=("m", "size"), docs_matched=("matched", "sum"),
                     total_matches=("m", "sum"), redacted_chars=("d", "sum"))
                .reset_index())

    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (pdf.groupby("source", sort=False)
            .agg(n_docs=("n_docs", "sum"), docs_matched=("docs_matched", "sum"),
                 total_matches=("total_matches", "sum"),
                 redacted_chars=("redacted_chars", "sum"))
            .reset_index())


SQL_PATTERN_REDACT = r"""
SELECT source, COUNT(*) AS n_docs,
       SUM(CASE WHEN regexp_matches(text, '\b(customer|spark|value)\b')
                THEN 1 ELSE 0 END) AS docs_matched,
       SUM(len(regexp_extract_all(text, '\b(customer|spark|value)\b'))) AS total_matches,
       SUM(length(text) - length(regexp_replace(text, '\b(customer|spark|value)\b',
                                                '***', 'g'))) AS redacted_chars
FROM documents GROUP BY source
"""


def q_hourly_active_users(sf_dir: str):
    """COUNT(DISTINCT) per time bucket (the classic active-users
    telemetry): per hour, distinct users and total events.  Per-block
    partials dedupe (hour, user) before the exchange, so shuffle volume
    is bounded by hours x active users, not event rows."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        hour_ms = (batch["ts"].cast(pa.int64()).to_numpy()
                   // 1000 // 3_600_000) * 3_600_000
        df = pd.DataFrame({"hour_ms": hour_ms,
                           "user_id": batch["user_id"].to_numpy()})
        return (df.groupby(["hour_ms", "user_id"], sort=False)
                .size().rename("n").reset_index())

    def sweep(t: pa.Table) -> pd.DataFrame:
        df = (t.to_pandas().groupby(["hour_ms", "user_id"], sort=False)["n"]
              .sum().reset_index())
        return (df.groupby("hour_ms", sort=False)
                .agg(n_users=("user_id", "size"), n_events=("n", "sum"))
                .reset_index())

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(parts, ["hour_ms"], sweep)


SQL_HOURLY_ACTIVE_USERS = """
SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hour_ms,
       COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY 1
"""


# --- deterministic train/valid/test split (hash-bucketed, stratified audit) --

SPLIT_TRAIN_PCT, SPLIT_VALID_PCT = 90, 95


def q_train_split_counts(sf_dir: str):
    """Deterministic 90/5/5 train/valid/test assignment by md5(doc_id)
    bucket — the standard reproducible split for training corpora (no
    RNG state, stable under re-runs and re-partitioning) — audited as
    per-(split, lang) doc and char counts.  The md5 is per-row Python
    (no vectorized md5 kernel exists) but runs inside map_batches across
    blocks; everything after is a tiny partial."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_pylist()
        bucket = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
             for i in ids), np.int64, len(ids))
        split = np.where(bucket < SPLIT_TRAIN_PCT, "train",
                         np.where(bucket < SPLIT_VALID_PCT, "valid", "test"))
        df = pd.DataFrame({
            "split": split,
            "lang": batch["lang"].to_pandas(),
            "n_chars": batch["n_chars"].to_numpy(),
        })
        return (df.groupby(["split", "lang"], sort=False)
                .agg(n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))
                .reset_index())

    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (pdf.groupby(["split", "lang"], sort=False)
            .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
            .reset_index())


SQL_TRAIN_SPLIT_COUNTS = """
WITH b AS (
  SELECT lang, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % 100 AS bucket
  FROM documents)
SELECT CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'valid' ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
FROM b GROUP BY 1, 2
"""


# --- CCNet-style unigram LM quality score -----------------------------------

LM_TOP_V = 24  # fixture vocab is 31 distinct words -> 7 fall in the OOV bucket


def _unigram_model_ref(ds):
    """Pass 1 of the CCNet-style scorer: corpus-wide top-V unigram LM.
    Per-block word-count partials are the only exchange — bounded by
    blocks x vocab, skew-proof for hot words.  Returns a ray.put handle
    on (vocab Index, per-word ln-p micros, OOV micros); shared by
    ``unigram_logprob`` and ``ccnet_lang_buckets``."""
    def count_partial(batch: pa.Table) -> pd.DataFrame:
        pl = fp._polars()
        s = pl.Series(batch["text"].combine_chunks().cast(pa.large_string()))
        words = s.str.extract_all(r"\S+").explode()
        vc = words.value_counts()
        return pd.DataFrame({"word": vc[vc.columns[0]].to_pandas(),
                             "n": vc["count"].to_numpy().astype(np.int64)})

    def count_sweep(t: pa.Table) -> pd.DataFrame:
        return (t.to_pandas().groupby("word", sort=False)["n"]
                .sum().reset_index())

    counts = grouped_map(ds.map_batches(count_partial, batch_format="pyarrow"),
                         ["word"], count_sweep).to_pandas()
    total = int(counts["n"].sum())
    counts = counts.sort_values(["n", "word"], ascending=[False, True],
                                kind="stable").reset_index(drop=True)
    top = counts.head(LM_TOP_V)
    oov_mass = total - int(top["n"].sum())
    oov_micros = (np.int64(np.floor(np.log(oov_mass / total) * 1e6 + 0.5))
                  if oov_mass > 0 else np.int64(-50_000_000))
    vocab_index = pd.Index(top["word"])
    vocab_micros = np.floor(
        np.log(top["n"].to_numpy(np.float64) / total) * 1e6 + 0.5).astype(np.int64)
    return ray.put((vocab_index, vocab_micros, oov_micros))


def q_unigram_logprob(sf_dir: str):
    """CCNet-style language-model quality score: pass 1 builds a top-V
    unigram model over the corpus (see ``_unigram_model_ref``); pass 2
    broadcasts the tiny (top-V + OOV floor) log-prob table via ray.put
    and scores every doc as the exact integer sum of per-token
    micros-rounded ln p(w) (rounded per token BEFORE summing, so the
    value is order-exact).  Emitting (sum, n_tokens) instead of the mean
    keeps the column integer-exact."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    model = _unigram_model_ref(ds)

    def score(batch: pa.Table) -> pa.Table:
        pl = fp._polars()
        vidx, vmic, oov = ray.get(model)
        s = pl.Series(batch["text"].combine_chunks().cast(pa.large_string()))
        lists = s.str.extract_all(r"\S+")
        lens = lists.list.len().to_numpy().astype(np.int64)
        flat = lists.explode().drop_nulls().to_pandas()
        idx = vidx.get_indexer(flat)
        lp = np.where(idx >= 0, vmic[np.clip(idx, 0, None)], oov)
        sums = np.zeros(len(lens), np.int64)
        nz = lens > 0
        if nz.any():
            offsets = np.zeros(int(nz.sum()), np.int64)
            np.cumsum(lens[nz][:-1], out=offsets[1:])
            sums[nz] = np.add.reduceat(lp, offsets)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "logprob_sum_micros": pa.array(sums, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


SQL_UNIGRAM_LOGPROB = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w FROM documents),
cnt AS (SELECT w, COUNT(*) AS n FROM tok GROUP BY w),
tot AS (SELECT SUM(n) AS total FROM cnt),
top AS (SELECT w, n FROM cnt ORDER BY n DESC, w LIMIT 24),
oov AS (
  SELECT CASE WHEN total - (SELECT SUM(n) FROM top) > 0
              THEN CAST(floor(ln((total - (SELECT SUM(n) FROM top)) * 1.0 / total)
                              * 1e6 + 0.5) AS BIGINT)
              ELSE -50000000 END AS oov_micros,
         total
  FROM tot),
lp AS (
  SELECT t.doc_id,
         COALESCE(CAST(floor(ln(p.n * 1.0 / o.total) * 1e6 + 0.5) AS BIGINT),
                  o.oov_micros) AS micros
  FROM tok t CROSS JOIN oov o LEFT JOIN top p ON t.w = p.w)
SELECT d.doc_id,
       CAST(COALESCE(array_length(regexp_extract_all(d.text, '\S+')), 0) AS BIGINT)
           AS n_tokens,
       COALESCE(s.micros_sum, 0) AS logprob_sum_micros
FROM documents d
LEFT JOIN (SELECT doc_id, SUM(micros) AS micros_sum FROM lp GROUP BY doc_id) s
  ON d.doc_id = s.doc_id
"""


def q_above_segment_avg(sf_dir: str):
    """Correlated-aggregate filter (customers above their own segment's
    mean balance).  Two passes: per-block (segment, sum, n) partials
    reduce to a 5-row table, which rides back into the second scan as a
    plain closure capture (broadcast-join shape; the ray.put indirection
    is overkill at 5 rows).  The comparison is integer multiply-compare
    (cents * n > sum_cents) — no division, so engine and SQL agree even
    for negative balances (DuckDB // truncates where Python floors)."""
    cols = ["c_custkey", "c_mktsegment", "c_acctbal"]

    def p1(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "c_mktsegment": batch["c_mktsegment"].to_pandas(),
            "cents": _cents(batch["c_acctbal"].to_numpy()),
        })
        return (df.groupby("c_mktsegment", sort=False)["cents"]
                .agg(sum_cents="sum", n="size").reset_index())

    seg = (_read(sf_dir, "customer", cols)
           .map_batches(p1, batch_format="pyarrow").to_pandas()
           .groupby("c_mktsegment", sort=False)
           .agg(sum_cents=("sum_cents", "sum"), n=("n", "sum"))
           .sort_index())
    seg_keys = np.asarray(seg.index)
    seg_sc = seg["sum_cents"].to_numpy(np.int64)
    seg_n = seg["n"].to_numpy(np.int64)

    def p2(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "c_mktsegment": batch["c_mktsegment"].to_pandas(),
            "cents": _cents(batch["c_acctbal"].to_numpy()),
        })
        pos = np.searchsorted(seg_keys, df["c_mktsegment"].to_numpy())
        sc = seg_sc[pos]
        n = seg_n[pos]
        df["above"] = (df["cents"].to_numpy() * n > sc).astype(np.int64)
        return (df.groupby("c_mktsegment", sort=False)["above"]
                .agg(n_above="sum", n_total="size").reset_index())

    pdf = (_read(sf_dir, "customer", cols)
           .map_batches(p2, batch_format="pyarrow").to_pandas())
    return (pdf.groupby("c_mktsegment", sort=False)
            .agg(n_above=("n_above", "sum"), n_total=("n_total", "sum"))
            .reset_index())


SQL_ABOVE_SEGMENT_AVG = """
WITH c AS (SELECT c_mktsegment,
                  CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
           FROM customer),
s AS (SELECT c_mktsegment, SUM(cents) AS sc, COUNT(*) AS n
      FROM c GROUP BY 1)
SELECT c.c_mktsegment,
       CAST(SUM(CASE WHEN c.cents * s.n > s.sc THEN 1 ELSE 0 END) AS BIGINT)
           AS n_above,
       COUNT(*) AS n_total
FROM c JOIN s USING (c_mktsegment)
GROUP BY c.c_mktsegment
"""


def q_revenue_share(sf_dir: str):
    """Percent-of-total (SQL ratio_to_report shape): each order
    priority's share of total revenue in exact integer micros
    (cents * 1e6 // total via arbitrary-precision Python ints, matching
    DuckDB's HUGEINT arithmetic — both operands positive, so truncation
    and floor agree)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "o_orderpriority": batch["o_orderpriority"].to_pandas(),
            "rev_cents": _cents(batch["o_totalprice"].to_numpy()),
        })
        return (df.groupby("o_orderpriority", sort=False)["rev_cents"]
                .sum().reset_index())

    pdf = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
           .groupby("o_orderpriority", sort=False)["rev_cents"].sum())
    total = int(pdf.sum())
    return pd.DataFrame({
        "o_orderpriority": pdf.index.to_numpy(),
        "rev_cents": pdf.to_numpy(np.int64),
        "share_micros": np.asarray(
            [int(c) * 1_000_000 // total for c in pdf.to_numpy()], np.int64),
    })


SQL_REVENUE_SHARE = """
WITH d AS (
  SELECT o_orderpriority,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_cents
  FROM orders GROUP BY 1)
SELECT o_orderpriority, CAST(rev_cents AS BIGINT) AS rev_cents,
       CAST(rev_cents * 1000000 // (SELECT SUM(rev_cents) FROM d) AS BIGINT)
           AS share_micros
FROM d
"""


def _cooccur_sweep(t: pa.Table) -> pd.DataFrame:
    """Per (user, hour) bucket: all unordered event-type pairs present,
    via a self-merge on the bucket key (bounded: <= 5 distinct types per
    bucket -> <= 10 pairs)."""
    df = t.to_pandas().drop_duplicates(["user_id", "hour_ms", "event_type"])
    m = df.merge(df, on=["user_id", "hour_ms"])
    m = m[m["event_type_x"] < m["event_type_y"]]
    return (m.groupby(["event_type_x", "event_type_y"], sort=False)
            .size().rename("n_buckets").reset_index()
            .rename(columns={"event_type_x": "et_a", "event_type_y": "et_b"}))


def q_event_cooccurrence(sf_dir: str):
    """Market-basket co-occurrence: for every unordered pair of event
    types, in how many (user, hour) buckets both occur.  Per-block
    distinct (bucket, type) rows are the only exchange; pair explosion
    happens inside the bucket-co-partitioned sweep and returns <= 10
    rows per partition."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        hour_ms = (batch["ts"].cast(pa.int64()).to_numpy()
                   // 1000 // 3_600_000) * 3_600_000
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "hour_ms": hour_ms,
            "event_type": batch["event_type"].to_pandas(),
        })
        return df.drop_duplicates()

    parts = ds.map_batches(partial, batch_format="pyarrow")
    pdf = grouped_map(parts, ["user_id", "hour_ms"], _cooccur_sweep).to_pandas()
    return (pdf.groupby(["et_a", "et_b"], sort=False)["n_buckets"]
            .sum().reset_index())


SQL_EVENT_COOCCURRENCE = """
WITH b AS (
  SELECT DISTINCT user_id, (epoch_ms(ts) // 3600000) * 3600000 AS hour_ms,
         event_type
  FROM events)
SELECT a.event_type AS et_a, c.event_type AS et_b, COUNT(*) AS n_buckets
FROM b a JOIN b c
  ON a.user_id = c.user_id AND a.hour_ms = c.hour_ms
 AND a.event_type < c.event_type
GROUP BY 1, 2
"""


def q_bucketed_join_revenue(sf_dir: str):
    """SMB-style persistent bucketing (sources/bucketed.py): customer
    and orders are each written ONCE into hash-bucketed layouts keyed on
    custkey, then joined with ZERO runtime exchange — one task per
    bucket pair, Arrow-native hash join inside.  At scale the write is
    the ingest-time shuffle you pay once; every later join on the same
    key is exchange-free.  Output: per-segment open-order revenue."""
    import shutil
    import tempfile

    from ..sources.bucketed import bucketed_join, write_bucketed

    tmp = tempfile.mkdtemp(prefix="ffr_bucketed_")
    try:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_totalprice"])

        def cust_prep(batch: pa.Table) -> pa.Table:
            return pa.table({
                "custkey": batch["c_custkey"].cast(pa.int64()),
                "c_mktsegment": batch["c_mktsegment"].cast(pa.string()),
            })

        def orders_prep(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.equal(batch["o_orderstatus"], "O"))
            return pa.table({
                "custkey": batch["o_custkey"].cast(pa.int64()),
                "rev_cents": pa.array(_cents(batch["o_totalprice"].to_numpy()),
                                      pa.int64()),
            })

        ca, oa = os.path.join(tmp, "customer"), os.path.join(tmp, "orders")
        write_bucketed(cust.map_batches(cust_prep, batch_format="pyarrow"),
                       ca, ["custkey"], n_buckets=16)
        write_bucketed(orders.map_batches(orders_prep, batch_format="pyarrow"),
                       oa, ["custkey"], n_buckets=16)
        joined = bucketed_join(ca, oa)

        def partial(batch: pa.Table) -> pd.DataFrame:
            df = pd.DataFrame({
                "c_mktsegment": batch["c_mktsegment"].to_pandas(),
                "rev_cents": batch["rev_cents"].to_numpy(),
            })
            return (df.groupby("c_mktsegment", sort=False)["rev_cents"]
                    .agg(n_orders="size", rev_cents="sum").reset_index())

        pdf = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
        return (pdf.groupby("c_mktsegment", sort=False)
                .agg(n_orders=("n_orders", "sum"), rev_cents=("rev_cents", "sum"))
                .reset_index())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SQL_BUCKETED_JOIN_REVENUE = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_cents
FROM customer JOIN orders ON c_custkey = o_custkey
WHERE o_orderstatus = 'O'
GROUP BY c_mktsegment
"""


PRUNE_SHARD_MS = 64 * 86_400_000           # 64-day range shards
PRUNE_LO_MS, PRUNE_HI_MS = 820_454_400_000, 836_179_200_000  # [1996-01-01, 1996-07-01)


def q_pruned_date_scan(sf_dir: str):
    """Prune-at-the-read (generalized O4 watermark-bounds trick,
    sources/pruned.py): orders are range-sharded on order-date into
    64-day parquet files once, then a half-year revenue query plans by
    footer min/max stats and opens only the ~3-of-40 overlapping files;
    the exact residual filter still runs per batch.  The pruning ratio
    itself is asserted in tests/test_sinks.py."""
    import shutil
    import tempfile

    from ..sources.pruned import read_pruned, write_sharded

    tmp = tempfile.mkdtemp(prefix="ffr_pruned_")
    try:
        ds = _read(sf_dir, "orders",
                   ["o_orderdate", "o_orderpriority", "o_totalprice"])

        def prep(batch: pa.Table) -> pa.Table:
            ts_ms = batch["o_orderdate"].cast(pa.int64()).to_numpy() // 1000
            return pa.table({
                "part_key": pa.array(ts_ms // PRUNE_SHARD_MS, pa.int64()),
                "ts_ms": pa.array(ts_ms, pa.int64()),
                "o_orderpriority": batch["o_orderpriority"].cast(pa.string()),
                "rev_cents": pa.array(_cents(batch["o_totalprice"].to_numpy()),
                                      pa.int64()),
            })

        write_sharded(ds.map_batches(prep, batch_format="pyarrow"), tmp, "part_key")
        pruned, _, _ = read_pruned(tmp, "ts_ms", PRUNE_LO_MS, PRUNE_HI_MS,
                                   columns=["o_orderpriority", "rev_cents"])

        def partial(batch: pa.Table) -> pd.DataFrame:
            df = pd.DataFrame({
                "o_orderpriority": batch["o_orderpriority"].to_pandas(),
                "rev_cents": batch["rev_cents"].to_numpy(),
            })
            return (df.groupby("o_orderpriority", sort=False)["rev_cents"]
                    .agg(n_orders="size", rev_cents="sum").reset_index())

        pdf = pruned.map_batches(partial, batch_format="pyarrow").to_pandas()
        return (pdf.groupby("o_orderpriority", sort=False)
                .agg(n_orders=("n_orders", "sum"), rev_cents=("rev_cents", "sum"))
                .reset_index())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SQL_PRUNED_DATE_SCAN = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_cents
FROM orders
WHERE epoch_ms(o_orderdate) >= 820454400000
  AND epoch_ms(o_orderdate) <  836179200000
GROUP BY o_orderpriority
"""


def _robust_sweep(t: pa.Table) -> pd.DataFrame:
    """Median / MAD / winsorized sum per lang from ONE value-count
    distribution (the same (lang, value, n) partials as group_quantiles):
    because the sweep holds each lang's full multiset as counts, the
    second-order statistic (median of |x - median|) needs no second scan
    — just a re-sort of the tiny distinct-value list by deviation."""
    df = t.to_pandas().groupby(["lang", "n_chars"], sort=False)["n"].sum().reset_index()
    df = df.sort_values(["lang", "n_chars"], kind="stable")
    out = []
    for lang, g in df.groupby("lang", sort=False):
        vals = g["n_chars"].to_numpy().astype(np.int64)
        cnt = g["n"].to_numpy().astype(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])

        def disc(q):
            return int(vals[np.searchsorted(cum, max(int(np.ceil(q * n)), 1), "left")])

        med, lo, hi = disc(0.5), disc(0.05), disc(0.95)
        dev = np.abs(vals - med)
        order = np.argsort(dev, kind="stable")
        dcum = np.cumsum(cnt[order])
        mad = int(dev[order][np.searchsorted(dcum, max(int(np.ceil(0.5 * n)), 1), "left")])
        wsum = int((cnt * np.clip(vals, lo, hi)).sum())
        out.append({"lang": lang, "n_docs": n, "median_chars": med,
                    "mad_chars": mad, "p05_chars": lo, "p95_chars": hi,
                    "winsorized_sum": wsum})
    return pd.DataFrame(out)


def q_robust_length_stats(sf_dir: str):
    """Robust per-language corpus statistics (outlier-resistant quality
    gates): exact median, median-absolute-deviation, and p05/p95
    winsorized length sum — all from the single (lang, n_chars)
    value-count exchange; the distribution-as-counts representation
    makes even the two-level MAD exact without a second corpus pass."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"lang": batch["lang"].to_pandas(),
                           "n_chars": batch["n_chars"].to_numpy()})
        return (df.groupby(["lang", "n_chars"], sort=False)
                .size().rename("n").reset_index())

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(parts, ["lang"], _robust_sweep)


SQL_ROBUST_LENGTH_STATS = """
WITH m AS (
  SELECT lang, quantile_disc(n_chars, 0.5) AS med,
         quantile_disc(n_chars, 0.05) AS lo,
         quantile_disc(n_chars, 0.95) AS hi
  FROM documents GROUP BY lang)
SELECT d.lang, COUNT(*) AS n_docs,
       CAST(m.med AS BIGINT) AS median_chars,
       CAST(quantile_disc(abs(d.n_chars - m.med), 0.5) AS BIGINT) AS mad_chars,
       CAST(m.lo AS BIGINT) AS p05_chars, CAST(m.hi AS BIGINT) AS p95_chars,
       CAST(SUM(LEAST(GREATEST(d.n_chars, m.lo), m.hi)) AS BIGINT) AS winsorized_sum
FROM documents d JOIN m USING (lang)
GROUP BY d.lang, m.med, m.lo, m.hi
"""


def _edge_join_sweep(t: pa.Table) -> pd.DataFrame:
    """One orderkey partition of the tagged union: map each lineitem row
    to its order's customer, emit distinct (cust, supp) pairs."""
    df = t.to_pandas()
    orders = df[df["side"] == 0]
    items = df[df["side"] == 1]
    idx = pd.Index(orders["orderkey"].to_numpy())
    pos = idx.get_indexer(items["orderkey"].to_numpy())
    hit = pos >= 0
    cust = orders["other"].to_numpy()[np.clip(pos, 0, None)][hit]
    supp = items["other"].to_numpy()[hit]
    e = pd.DataFrame({"src": cust * 2, "dst": supp * 2 + 1}).drop_duplicates()
    return e.astype(np.int64)


def _pagerank_edges(sf_dir: str) -> "ray.data.Dataset":
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])

    def o_tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "orderkey": batch["o_orderkey"].cast(pa.int64()),
            "other": batch["o_custkey"].cast(pa.int64()),
            "side": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
        })

    def l_tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "orderkey": batch["l_orderkey"].cast(pa.int64()),
            "other": batch["l_suppkey"].cast(pa.int64()),
            "side": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
        })

    tagged = orders.map_batches(o_tag, batch_format="pyarrow").union(
        items.map_batches(l_tag, batch_format="pyarrow"))
    return grouped_map(tagged, ["orderkey"], _edge_join_sweep)


def q_supplier_pagerank(sf_dir: str):
    """Iterative distributed PageRank (stages/graph.py) over the
    customer–supplier purchase graph (distinct (cust, supp) pairs via a
    co-partitioned orderkey join; node ids disjoint by parity).  Fixed
    15 iterations, damping 0.85; rows-only — the paired check query
    pins distributed-vs-single-process agreement."""
    from ..stages.graph import distributed_pagerank

    return distributed_pagerank(_pagerank_edges(sf_dir))


def q_supplier_pagerank_check(sf_dir: str):
    """Driver-visible invariant: the distributed power iteration agrees
    with a single-process numpy recompute of identical semantics on
    every node to within 2 micros (float summation order is the only
    degree of freedom).  The oracle pins mismatch_rows = 0."""
    from ..stages.graph import reference_pagerank

    dist = q_supplier_pagerank(sf_dir)
    edges = _pagerank_edges(sf_dir).to_pandas()
    ref = reference_pagerank(edges)
    m = dist.merge(ref, on="node", how="outer", suffixes=("_d", "_r"))
    bad = (m["rank_micros_d"].isna() | m["rank_micros_r"].isna()
           | ((m["rank_micros_d"] - m["rank_micros_r"]).abs() > 2))
    return pd.DataFrame({"mismatch_rows": pd.array([int(bad.sum())], dtype="int64")})


TOP_BIGRAMS_K = 20


def q_top_bigrams(sf_dir: str):
    """Corpus bigram statistics (the n=2 slice of an n-gram LM count
    table): top-20 within-doc adjacent token pairs.  Per-block: one
    polars tokenize, vectorized rust string concat of shifted neighbors,
    local value_counts — so the exchange carries (bigram, n) partials
    bounded by vocab², never token streams; ties broken by bigram asc."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        pl = fp._polars()
        s = pl.Series(batch["text"].combine_chunks().cast(pa.large_string()))
        lists = s.str.extract_all(r"\S+")
        lens = lists.list.len().to_numpy().astype(np.int64)
        flat = lists.explode().drop_nulls()
        doc = np.repeat(np.arange(len(lens)), lens)
        if len(doc) < 2:
            return pd.DataFrame({"bigram": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        adj = doc[1:] == doc[:-1]
        left = flat.slice(0, len(flat) - 1).filter(pl.Series(adj))
        right = flat.slice(1, len(flat) - 1).filter(pl.Series(adj))
        vc = (left + " " + right).rename("bigram").value_counts()
        return pd.DataFrame({"bigram": vc["bigram"].to_pandas(),
                             "n": vc["count"].to_numpy().astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def sweep(t: pa.Table) -> pd.DataFrame:
        return t.to_pandas().groupby("bigram", sort=False)["n"].sum().reset_index()

    pdf = grouped_map(parts, ["bigram"], sweep).to_pandas()
    pdf = (pdf.groupby("bigram", sort=False)["n"].sum().reset_index()
           .sort_values(["n", "bigram"], ascending=[False, True], kind="stable")
           .head(TOP_BIGRAMS_K).reset_index(drop=True))
    return pdf


SQL_TOP_BIGRAMS = r"""
WITH l AS (SELECT regexp_extract_all(text, '\S+') AS toks FROM documents),
i AS (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS pos FROM l)
SELECT toks[pos] || ' ' || toks[pos + 1] AS bigram, COUNT(*) AS n
FROM i GROUP BY 1
ORDER BY n DESC, bigram
LIMIT 20
"""


# ---------------------------------------------------------------------------
# URL canonicalization + SURT keys (webtext curation; the flagship keys
# windows by url-host — BASELINE.json north_star)
# ---------------------------------------------------------------------------

def _synth_urls(batch: pa.Table) -> pa.Table:
    """Deterministic messy-URL synthesis from (doc_id, source) — testdata
    ships no URL column, so both the engine query and the SQL oracle
    construct the SAME raw URLs (mixed-case scheme/host, default and
    non-default ports, dot-segments, tracking params, unordered query
    strings, fragments); each side then canonicalizes INDEPENDENTLY."""
    ids = batch["doc_id"].to_numpy()
    src = batch["source"].to_pandas().astype(str).reset_index(drop=True)
    m = {k: pd.Series(ids % k) for k in (2, 3, 4, 5, 6, 7, 9, 11, 13)}

    def _sel(cond, a, b):
        return pd.Series(np.where(cond, a, b)).astype(str)

    scheme = _sel(m[3] == 0, "HTTP", "htTPs")
    host = _sel(m[2] == 0, "WWW." + src + ".Example.COM",
                src + ".Example.ORG")
    port = _sel(m[5] == 0, ":8080",
                _sel((m[3] == 0) & (m[4] == 0), ":80",
                     _sel((m[3] != 0) & (m[4] == 1), ":443", "")))
    path = _sel(m[13] == 0, "",
                _sel(m[6] == 0, "/a/x/../b/page",
                     _sel(m[6] == 3, "/a/./b/page",
                          "/p" + m[7].astype(str) + "/item"
                          + m[11].astype(str) + ".html")))
    ids_s = pd.Series(ids).astype(str)
    query = _sel(m[4] == 0, "",
                 _sel(m[4] == 1, "?b=2&utm_source=feed&a=1",
                      _sel(m[4] == 2, "?id=" + ids_s + "&a=3&fbclid=zz",
                           "?z=1&ref=home&y=" + m[9].astype(str))))
    frag = _sel(m[2] == 0, "#Sec" + m[5].astype(str), "")
    url = scheme + "://" + host + port + path + query + frag
    return pa.table({"doc_id": batch["doc_id"],
                     "url": pa.array(url, type=pa.string())})


def q_url_canonicalize(sf_dir: str):
    """RFC 3986 URL canonicalization + SURT dedup keys over a synthesized
    messy-URL column: the engine PARSES each raw URL string and normalizes
    it with vectorized polars expressions (functions/url.py); the DuckDB
    oracle re-derives the canonical form from the synthesis parts with its
    own lowercase/sort/filter logic — two independent implementations of
    the same normalization rules."""
    from ..functions.url import canonicalize_batch

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    urls = ds.map_batches(_synth_urls, batch_format="pyarrow")
    return urls.map_batches(canonicalize_batch, batch_format="pyarrow")


SQL_URL_CANONICALIZE = """
WITH p AS (
  SELECT doc_id,
         doc_id % 2 AS m2, doc_id % 3 AS m3, doc_id % 4 AS m4,
         doc_id % 5 AS m5, doc_id % 6 AS m6, doc_id % 7 AS m7,
         doc_id % 9 AS m9, doc_id % 11 AS m11, doc_id % 13 AS m13,
         source
  FROM documents),
parts AS (
  SELECT doc_id, m2, m3, m4, m5, m6, m13,
         CASE WHEN m3 = 0 THEN 'HTTP' ELSE 'htTPs' END AS scheme_raw,
         CASE WHEN m2 = 0 THEN 'WWW.' || source || '.Example.COM'
              ELSE source || '.Example.ORG' END AS host_raw,
         CASE WHEN m5 = 0 THEN ':8080'
              WHEN m3 = 0 AND m4 = 0 THEN ':80'
              WHEN m3 != 0 AND m4 = 1 THEN ':443'
              ELSE '' END AS port_raw,
         CASE WHEN m13 = 0 THEN ''
              WHEN m6 = 0 THEN '/a/x/../b/page'
              WHEN m6 = 3 THEN '/a/./b/page'
              ELSE '/p' || m7 || '/item' || m11 || '.html' END AS path_raw,
         CASE WHEN m4 = 0 THEN ''
              WHEN m4 = 1 THEN '?b=2&utm_source=feed&a=1'
              WHEN m4 = 2 THEN '?id=' || doc_id || '&a=3&fbclid=zz'
              ELSE '?z=1&ref=home&y=' || m9 END AS query_raw,
         CASE WHEN m2 = 0 THEN '#Sec' || m5 ELSE '' END AS frag_raw
  FROM p),
canon AS (
  SELECT doc_id,
         scheme_raw || '://' || host_raw || port_raw || path_raw
           || query_raw || frag_raw AS url,
         lower(CASE WHEN m3 = 0 THEN 'http' ELSE 'https' END) AS cscheme,
         lower(host_raw) AS chost,
         CASE WHEN m5 = 0 THEN ':8080' ELSE '' END AS cport,
         CASE WHEN path_raw = '' THEN '/'
              ELSE regexp_replace(regexp_replace(path_raw,
                     '/[^/]+/\\.\\./', '/', 'g'), '/\\./', '/', 'g')
         END AS cpath,
         coalesce(array_to_string(list_sort(list_filter(
             string_split(ltrim(query_raw, '?'), '&'),
             x -> x != '' AND NOT starts_with(x, 'utm_')
                  AND string_split(x, '=')[1] NOT IN ('fbclid','gclid','ref')
         )), '&'), '') AS cquery
  FROM parts)
SELECT doc_id, url,
       cscheme || '://' || chost || cport || cpath
         || CASE WHEN cquery = '' THEN '' ELSE '?' || cquery END AS canon_url,
       array_to_string(list_reverse(string_split(
           regexp_replace(chost, '^www\\.', ''), '.')), ',')
         || ')' || cpath
         || CASE WHEN cquery = '' THEN '' ELSE '?' || cquery END AS surt_key
FROM canon
"""


# ---------------------------------------------------------------------------
# Exact-substring span dedup (Lee et al. 2022 "Deduplicating Training Data
# Makes Language Models Better" — overlapping k-gram variant)
# ---------------------------------------------------------------------------

def q_exact_substring_dedup(sf_dir: str, k: int = 5):
    """ExactSubstr at token granularity: every overlapping k-token gram
    occurring >= 2 times in the corpus marks its positions duplicate;
    per-doc output is the merged-span coverage (total_tokens, dup_tokens,
    dup_spans).  Distributed shape: one narrow (doc_id, pos, 2x64-bit key)
    row per gram exchanges — never the text — then a doc-keyed tagged
    union resolves coverage.  The SQL oracle groups the literal k-gram
    strings (exact; the engine's 128-bit keys are its collision-free
    stand-in)."""
    from ..stages.textops import (doc_kgram_rows, kgram_dup_positions,
                                  kgram_span_sweep)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    grams = ds.map_batches(doc_kgram_rows, fn_kwargs={"k": k},
                           batch_format="pyarrow")
    dup_pos = grouped_map(grams, ["ka", "kb"], kgram_dup_positions)

    def totals(batch: pa.Table) -> pa.Table:
        n_tok = pc.count_substring_regex(
            pc.utf8_lower(batch["text"].cast(pa.large_string())), "[a-z0-9]+")
        return pa.table({"doc_id": batch["doc_id"],
                         "pos": n_tok.cast(pa.int64()),
                         "tag": pa.array(np.zeros(batch.num_rows, np.int64))})

    tot = ds.map_batches(totals, batch_format="pyarrow")

    def tag_dup(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "tag", pa.array(np.ones(batch.num_rows, np.int64)))

    tagged = tot.union(dup_pos.map_batches(tag_dup, batch_format="pyarrow"))
    return grouped_map(tagged, ["doc_id"], kgram_span_sweep,
                       fn_kwargs={"k": k})


SQL_EXACT_SUBSTRING_DEDUP = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
  FROM documents),
tot AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS total_tokens FROM toks),
kg AS (
  SELECT doc_id, i AS pos, array_to_string(ts[i:i+4], ' ') AS gram
  FROM toks, unnest(generate_series(1, len(ts) - 4)) AS t(i)),
dup AS (SELECT gram FROM kg GROUP BY gram HAVING COUNT(*) >= 2),
hit AS (SELECT k.doc_id, k.pos FROM kg k JOIN dup USING (gram)),
cov AS (SELECT DISTINCT doc_id, p
        FROM hit, unnest(generate_series(pos, pos + 4)) AS c(p)),
runs AS (
  SELECT doc_id,
         CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                   OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 1
              THEN 1 ELSE 0 END AS is_start
  FROM cov)
SELECT t.doc_id, t.total_tokens,
       CAST(coalesce(a.n, 0) AS BIGINT) AS dup_tokens,
       CAST(coalesce(s.n, 0) AS BIGINT) AS dup_spans
FROM tot t
LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM cov GROUP BY 1) a USING (doc_id)
LEFT JOIN (SELECT doc_id, SUM(is_start) AS n FROM runs GROUP BY 1) s USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 / MOSS)
# ---------------------------------------------------------------------------

def q_winnow_fingerprints(sf_dir: str, k: int = 4, w: int = 4):
    """Per-doc winnowing fingerprint stats (rows-only — the hash-order
    min selection is not SQL-expressible; ``winnow_fingerprints_check``
    is the paired driver-visible invariant).  Selection runs locally in
    map_batches; only (doc_id, pos, fp) rows reach the doc-keyed combine,
    so the exchange is ~2/(w+1) of the gram count."""
    from ..stages.textops import winnow_rows

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    fps = ds.map_batches(winnow_rows, fn_kwargs={"k": k, "w": w},
                         batch_format="pyarrow")

    def partial(batch: pa.Table) -> pd.DataFrame:
        # (doc_id, fp)-level partials: a doc's rows may split across
        # batches, so distinct-fp counting must wait for the doc
        # partition — summing per-batch nunique would overcount
        df = batch.to_pandas()
        g = df.groupby(["doc_id", "fp"], sort=False)
        return g.size().rename("n").reset_index()

    def per_doc(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        g = df.groupby(["doc_id", "fp"], sort=False)["n"].sum().reset_index()
        d = g.groupby("doc_id", sort=False)["n"]
        return d.agg(n_fps="sum", n_distinct_fps="size").reset_index()

    parts = fps.map_batches(partial, batch_format="pyarrow")
    return grouped_map(parts, ["doc_id"], per_doc)


def q_winnow_fingerprints_check(sf_dir: str, k: int = 4, w: int = 4):
    """Vectorized sliding-window winnowing vs the paper-pseudocode loop
    reference (shares only the per-token hash kernel); oracle pins
    mismatch_rows=0 over the full (doc_id, pos, fp) fingerprint sets."""
    import pyarrow.parquet as pq

    from ..stages.textops import winnow_reference, winnow_rows

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    eng = ds.map_batches(winnow_rows, fn_kwargs={"k": k, "w": w},
                         batch_format="pyarrow").to_pandas() \
        .sort_values(["doc_id", "pos"]).reset_index(drop=True)
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    ref = winnow_reference(tbl["doc_id"].to_numpy(), tbl["text"], k=k, w=w) \
        .sort_values(["doc_id", "pos"]).reset_index(drop=True)
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng.to_numpy() != ref.to_numpy()).any(axis=1).sum())
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64")})


# ---------------------------------------------------------------------------
# General HTML text extraction (boilerplate-aware tag stripping)
# ---------------------------------------------------------------------------

def _synth_html(batch: pa.Table) -> pa.Table:
    """Deterministic messy-HTML synthesis from (doc_id, text): the four
    shared page templates (functions/html.py MESSY_TEMPLATES) cycling on
    doc_id — head with hostile script content, comments holding fake
    tags, quoted '>' attributes, named + numeric character references,
    nav/list/table/noscript/template boilerplate.  The SQL oracle
    constructs the EXPECTED extraction of the same templates; the engine
    must recover it by actually parsing."""
    from ..functions.html import MESSY_TEMPLATES

    ids = batch["doc_id"].to_numpy()
    text = batch["text"].to_pandas().astype(str).reset_index(drop=True)
    m4 = ids % 4
    v = [pre + text + suf for pre, suf in MESSY_TEMPLATES]
    html = pd.Series(np.select([m4 == 0, m4 == 1, m4 == 2], v[:3], v[3]))
    return pa.table({"doc_id": batch["doc_id"],
                     "html": pa.array(html.to_numpy(), type=pa.binary())})


def q_html_extract_text(sf_dir: str):
    """General HTML extraction over synthesized messy pages: comments /
    script / style / noscript / template removal (hostile bodies), block
    tags to newlines, quote-aware attribute grammar, named + numeric
    entity decode, whitespace normalization, plus the link-density
    boilerplate signal.  The oracle pins the exact expected text per
    template — the extractor must PARSE its way there."""
    from ..functions.html import extract_text_general, link_density

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pages = ds.map_batches(_synth_html, batch_format="pyarrow")

    def extract(batch: pa.Table) -> pa.Table:
        xt = extract_text_general(batch["html"])
        ld = link_density(batch["html"]).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch["doc_id"],
            "xtext": xt,
            "ld_micros": pa.array(
                np.floor(ld * 1e6 + 0.5).astype(np.int64), pa.int64()),
        })

    return pages.map_batches(extract, batch_format="pyarrow")


SQL_HTML_EXTRACT_TEXT = """
WITH exp AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'Home About' || chr(10) || text || chr(10)
                       || 'Copyright © 2024 — Example Corp'
           WHEN 1 THEN 'Menu One Menu Two' || chr(10) || text || chr(10)
                       || 'Contact: info@example.com'
           WHEN 2 THEN 'alpha' || chr(10) || 'beta & gamma' || chr(10)
                       || text || chr(10) || 'cell1' || chr(10) || '2 < 3'
           ELSE 'Header "Quoted"' || chr(10) || text || chr(10) || 'fin…'
         END AS xtext
  FROM documents)
SELECT doc_id, xtext,
       CASE WHEN doc_id % 4 = 0
            THEN CAST(floor((9.0 / length(xtext)) * 1000000 + 0.5) AS BIGINT)
            ELSE 0 END AS ld_micros
FROM exp
"""


# ---------------------------------------------------------------------------
# URL blocklist filtering (curation: domain-suffix + path-prefix rules)
# ---------------------------------------------------------------------------

_URL_BLOCK_HOSTS = ("src2.example.org", "src3.example.com")
_URL_BLOCK_PATHS = ("/p3/",)


def q_url_blocklist_filter(sf_dir: str):
    """Crawl-curation URL filter: canonicalize, then match the host
    against a blocklist with DOMAIN-SUFFIX semantics (entry blocks itself
    and every subdomain) and the path against prefix rules.  The
    blocklist is ray.put ONCE and read inside every map_batches task —
    a broadcast lookup, never a shuffle join.  Matching is the
    reversed-host sorted-array searchsorted probe (HostSuffixMatcher:
    O(rows log rules) per batch, built once per actor), so a real
    100k-entry blocklist costs the same per batch as the fixture's two
    rules — proven by test_blocklist_matchers large-list parity/time."""
    from ..functions.url import canonicalize_batch

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    urls = ds.map_batches(_synth_urls, batch_format="pyarrow")
    canon = urls.map_batches(canonicalize_batch, batch_format="pyarrow")
    rules_ref = ray.put({"hosts": _URL_BLOCK_HOSTS,
                         "paths": _URL_BLOCK_PATHS})

    class BlocklistFilter:
        def __init__(self) -> None:
            from ..functions.url import HostSuffixMatcher, PathPrefixMatcher

            rules = ray.get(rules_ref)  # once per actor
            self.host_m = HostSuffixMatcher(rules["hosts"])
            self.path_m = PathPrefixMatcher(rules["paths"])

        def __call__(self, batch: pa.Table) -> pa.Table:
            host = pc.struct_field(pc.extract_regex(
                batch["canon_url"], r"^[a-z]+://(?P<h>[^/:?#]+)"), "h")
            path = pc.struct_field(pc.extract_regex(
                batch["canon_url"], r"^[a-z]+://[^/]+(?P<p>/[^?#]*)"), "p")
            host_bad = self.host_m.matches(host)
            path_bad = self.path_m.matches(path)
            reason = np.where(host_bad, "host",
                              np.where(path_bad, "path", ""))
            return pa.table({
                "doc_id": batch["doc_id"],
                "blocked": pa.array((host_bad | path_bad).astype(np.int64)),
                "reason": pa.array(reason.astype(object), pa.string()),
            })

    return canon.map_batches(BlocklistFilter, concurrency=2,
                             batch_format="pyarrow")


SQL_URL_BLOCKLIST_FILTER = """
WITH p AS (
  SELECT doc_id, doc_id % 2 AS m2, doc_id % 3 AS m3, doc_id % 5 AS m5,
         doc_id % 6 AS m6, doc_id % 7 AS m7, doc_id % 13 AS m13, source
  FROM documents),
canon AS (
  SELECT doc_id,
         lower(CASE WHEN m2 = 0 THEN 'www.' || source || '.example.com'
                    ELSE source || '.example.org' END) AS chost,
         CASE WHEN m13 = 0 THEN '/'
              WHEN m6 IN (0, 3) THEN '/a/b/page'
              ELSE '/p' || m7 || '/item' || (doc_id % 11) || '.html'
         END AS cpath
  FROM p),
v AS (
  SELECT doc_id,
         (chost IN ('src2.example.org', 'src3.example.com')
          OR chost LIKE '%.src2.example.org'
          OR chost LIKE '%.src3.example.com') AS host_bad,
         (cpath LIKE '/p3/%') AS path_bad
  FROM canon)
SELECT doc_id,
       CAST(host_bad OR path_bad AS BIGINT) AS blocked,
       CASE WHEN host_bad THEN 'host'
            WHEN path_bad THEN 'path' ELSE '' END AS reason
FROM v
"""


def _warc_messy_fixture_dir(sf_dir: str) -> str:
    """Build-once cache of a WARC.gz corpus whose payloads are the four
    MESSY page templates — the crawl-archive end of the general-extractor
    path (``_warc_fixture_dir`` ships the strict invertible pages)."""
    import pyarrow.parquet as pq

    from ..functions.html import wrap_html_messy
    from ..sources.warc import write_warc

    src_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_path)
    tag = (f"{os.path.basename(os.path.normpath(sf_dir)) or 'sf'}"
           f"-{st.st_size}-{int(st.st_mtime)}")
    root = os.path.join("/tmp", "ffr_warc_messy", tag)
    done = os.path.join(root, "_DONE")
    if not os.path.exists(done):
        os.makedirs(root, exist_ok=True)
        tbl = pq.read_table(src_path, columns=["doc_id", "text", "source"])
        ids = tbl["doc_id"].to_numpy()
        texts = tbl["text"].to_pylist()
        srcs = tbl["source"].to_pylist()
        n_shards = 8
        shards: list[list[dict]] = [[] for _ in range(n_shards)]
        for i in range(len(ids)):
            did = int(ids[i])
            shards[did % n_shards].append({
                "url": f"https://{srcs[i]}.example.com/doc/{did}",
                "ts_ms": BASE_TS_MS + did * 1000,
                "html": wrap_html_messy(texts[i], did),
            })
        for s, recs in enumerate(shards):
            write_warc(recs, os.path.join(root, f"shard-{s:03d}.warc.gz"),
                       gzip_members=True, chunked_every=5)
        with open(done, "w") as f:
            f.write(str(len(ids)))
    return root


def q_warc_extract_general(sf_dir: str):
    """The full crawl-to-text path end-to-end: WARC.gz archive bytes →
    record/HTTP framing → general HTML extraction (hostile markup) →
    (doc_id, xtext).  The SQL oracle constructs the byte-exact expected
    text per template straight from `documents`, pinning reader AND
    parser in one hash."""
    import glob as _glob

    from ..functions.html import extract_text_general
    from ..sources.warc import read_warc

    root = _warc_messy_fixture_dir(sf_dir)
    ds = read_warc(sorted(_glob.glob(os.path.join(root, "*.warc.gz"))))

    def extract(batch: pa.Table) -> pa.Table:
        doc_id = pc.struct_field(
            pc.extract_regex(batch["url"], r"/doc/(?P<d>[0-9]+)$"), "d") \
            .cast(pa.int64())
        return pa.table({"doc_id": doc_id,
                         "xtext": extract_text_general(batch["html"])})

    return ds.map_batches(extract, batch_format="pyarrow")


SQL_WARC_EXTRACT_GENERAL = """
SELECT doc_id,
       CASE doc_id % 4
         WHEN 0 THEN 'Home About' || chr(10) || text || chr(10)
                     || 'Copyright © 2024 — Example Corp'
         WHEN 1 THEN 'Menu One Menu Two' || chr(10) || text || chr(10)
                     || 'Contact: info@example.com'
         WHEN 2 THEN 'alpha' || chr(10) || 'beta & gamma' || chr(10)
                     || text || chr(10) || 'cell1' || chr(10) || '2 < 3'
         ELSE 'Header "Quoted"' || chr(10) || text || chr(10) || 'fin…'
       END AS xtext
FROM documents
"""


# ---------------------------------------------------------------------------
# Outlink graph extraction (href parsing -> host-level edge list)
# ---------------------------------------------------------------------------

def q_outlink_graph(sf_dir: str):
    """Host-level outlink graph from markup: each doc's page carries
    1 + doc_id % 3 anchors to deterministic foreign hosts; the engine
    parses ``href`` attributes out of the (quoted, attribute-noisy)
    anchor tags with vectorized polars extract_all, resolves target
    hosts, and aggregates (src_host, dst_host, n_links) — the edge list
    a crawl-graph PageRank consumes.  The SQL oracle re-derives the
    same edges from the doc_id arithmetic, pinning the parse."""
    from ..functions.fingerprint import _polars

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def build_and_parse(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        src = batch["source"].to_pandas().astype(str).reset_index(drop=True)
        # synthesize the page fragment: 1 + doc_id%3 anchors, each with
        # noise attributes so the href needs a real parse
        parts = []
        for j in range(3):
            dst = pd.Series((ids * 7 + j) % 25).astype(str)
            a = ('<a class="x" data-v="y>z" href="https://src' + dst
                 + '.example.org/p' + pd.Series(ids % 9).astype(str)
                 + '">t</a> ')
            parts.append(pd.Series(np.where(ids % 3 >= j, a, "")).astype(str))
        html = "<div>" + parts[0] + parts[1] + parts[2] + "</div>"

        pl = _polars()
        df = pl.DataFrame({"src_host": pl.Series((src + ".example.com").to_numpy()),
                           "h": pl.Series(html.to_numpy())})
        edges = (
            df.with_columns(
                pl.col("h").str.extract_all(r'href="[^"]*"').alias("href"))
            .drop("h").explode("href").drop_nulls("href")
            .with_columns(pl.col("href")
                          .str.extract(r'href="https?://([^/"]+)', 1)
                          .alias("dst_host"))
            .drop_nulls("dst_host")
            .group_by(["src_host", "dst_host"]).len(name="n_links")
        )
        return pa.table({
            "src_host": pa.array(edges["src_host"].to_list(), pa.string()),
            "dst_host": pa.array(edges["dst_host"].to_list(), pa.string()),
            "n_links": pa.array(edges["n_links"].to_numpy(), pa.int64()),
        })

    parts = ds.map_batches(build_and_parse, batch_format="pyarrow")
    return grouped_map(parts, ["src_host", "dst_host"], _combine_partials,
                       fn_kwargs={"keys": ["src_host", "dst_host"],
                                  "sums": ["n_links"]})


SQL_OUTLINK_GRAPH = """
WITH links AS (
  SELECT source || '.example.com' AS src_host,
         'src' || CAST((doc_id * 7 + j) % 25 AS VARCHAR)
           || '.example.org' AS dst_host
  FROM documents, unnest(generate_series(0, doc_id % 3)) AS t(j))
SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links
FROM links GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309) crawl filter
# ---------------------------------------------------------------------------

def q_robots_filter(sf_dir: str):
    """REP crawl gate end-to-end: per-host robots.txt bodies (agent
    groups, comments, allow-overrides, empty-disallow) are PARSED by the
    vectorized RFC 9309 parser, the rule table broadcasts once via
    ray.put (robots is the classic small side), and the URL stream is
    admitted by longest-match with Allow winning ties.  The SQL oracle
    re-derives the verdicts from the synthesis arithmetic — the parser +
    matcher must reproduce them exactly."""
    import pyarrow.parquet as pq

    from ..functions.robots import parse_robots, robots_allowed
    from ..functions.url import canonicalize_batch

    srcs = sorted(set(pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                                    columns=["source"])["source"].to_pylist()))
    hosts, bodies = [], []
    for s in srcs:
        n = int(s[3:])
        body = ("# robots for {h}\n"
                "User-agent: evilbot\nDisallow: /\n\n"
                "User-agent: *\n"
                f"Disallow: /p{n % 7}/   # hot section\n"
                f"Allow: /p{n % 7}/item{(n * 3) % 11}.html\n"
                "Disallow: /a/x/\n"
                "Disallow:\n")
        for h in (f"www.{s}.example.com", f"{s}.example.org"):
            hosts.append(h)
            bodies.append(body.format(h=h))
    rules_ref = ray.put(parse_robots(hosts, bodies))

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    urls = ds.map_batches(_synth_urls, batch_format="pyarrow")
    canon = urls.map_batches(canonicalize_batch, batch_format="pyarrow")

    class RobotsGate:
        def __init__(self) -> None:
            self.rules = ray.get(rules_ref)  # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            host = pc.struct_field(pc.extract_regex(
                batch["canon_url"], r"^[a-z]+://(?P<h>[^/:?#]+)"), "h")
            path = pc.struct_field(pc.extract_regex(
                batch["canon_url"], r"^[a-z]+://[^/]+(?P<p>/[^?#]*)"), "p")
            ok = robots_allowed(self.rules, host, path)
            return pa.table({
                "doc_id": batch["doc_id"],
                "robots_blocked": pa.array((~ok).astype(np.int64)),
            })

    return canon.map_batches(RobotsGate, concurrency=2,
                             batch_format="pyarrow")


SQL_ROBOTS_FILTER = """
WITH p AS (
  SELECT doc_id, doc_id % 6 AS m6, doc_id % 7 AS m7, doc_id % 11 AS m11,
         doc_id % 13 AS m13,
         CAST(substr(source, 4) AS INT) AS n
  FROM documents),
canon AS (
  SELECT doc_id, n,
         CASE WHEN m13 = 0 THEN '/'
              WHEN m6 IN (0, 3) THEN '/a/b/page'
              ELSE '/p' || m7 || '/item' || m11 || '.html' END AS cpath
  FROM p)
SELECT doc_id,
       CAST(CASE WHEN cpath LIKE '/p' || (n % 7) || '/%'
                  AND cpath != '/p' || (n % 7) || '/item'
                               || ((n * 3) % 11) || '.html'
                 THEN 1 ELSE 0 END AS BIGINT) AS robots_blocked
FROM canon
"""


# ---------------------------------------------------------------------------
# Charset detection + transcode (crawl payload ingest)
# ---------------------------------------------------------------------------

def q_charset_decode(sf_dir: str):
    """Mixed-encoding payload ingest: a third of the corpus arrives as
    Latin-1 bytes (accented suffix — invalid UTF-8), a third as
    multibyte UTF-8, a third pure ASCII.  The engine must detect
    validity with the vectorized RFC 3629 mask and transcode the
    fallback rows by byte surgery (functions/charset.py); the oracle
    pins charset verdicts and the decoded text exactly."""
    from ..functions.charset import decode_with_fallback

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def synth_and_decode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        m3 = ids % 3
        raw = [
            (t + " café résumé").encode("latin-1") if m == 0
            else (t + " naïve €").encode("utf-8") if m == 1
            else t.encode("ascii")
            for t, m in zip(texts, m3)
        ]
        charset, out = decode_with_fallback(pa.array(raw, pa.binary()))
        return pa.table({"doc_id": batch["doc_id"],
                         "charset": charset, "text_out": out})

    return ds.map_batches(synth_and_decode, batch_format="pyarrow")


SQL_CHARSET_DECODE = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'latin-1' ELSE 'utf-8' END AS charset,
       text || CASE doc_id % 3 WHEN 0 THEN ' café résumé'
                               WHEN 1 THEN ' naïve €'
                               ELSE '' END AS text_out
FROM documents
"""


# ---------------------------------------------------------------------------
# Crawl curation chain: archive bytes -> curated corpus in one pipeline
# ---------------------------------------------------------------------------

def q_crawl_curation_chain(sf_dir: str, min_chars: int = 120):
    """The curation flagship composed from the crawl end: WARC.gz record
    framing → general HTML extraction (hostile markup) → host blocklist
    → quality length gate → exact dedup (min-id keep, 128-bit text-hash
    exchange — extracted text never shuffles).  The SQL oracle rebuilds
    the whole chain from `documents`, pinning every stage's composition
    in one value hash."""
    import glob as _glob

    from ..functions.html import extract_text_general
    from ..sources.warc import read_warc

    root = _warc_messy_fixture_dir(sf_dir)
    ds = read_warc(sorted(_glob.glob(os.path.join(root, "*.warc.gz"))))

    def extract_gate_hash(batch: pa.Table) -> pa.Table:
        doc_id = pc.struct_field(
            pc.extract_regex(batch["url"], r"/doc/(?P<d>[0-9]+)$"), "d") \
            .cast(pa.int64())
        host = pc.struct_field(pc.extract_regex(
            batch["url"], r"^https?://(?P<h>[^/]+)"), "h")
        xt = extract_text_general(batch["html"])
        keep = pc.greater_equal(pc.utf8_length(xt), min_chars).to_numpy(
            zero_copy_only=False)
        hostnp = np.asarray(host.to_pandas(), dtype=object)
        for h in _URL_BLOCK_HOSTS:
            keep &= ~((hostnp == h)
                      | pc.ends_with(host, pattern="." + h)
                      .to_numpy(zero_copy_only=False))
        txt = pd.Series(xt.to_pandas()[keep]).reset_index(drop=True)
        h1 = pd.util.hash_pandas_object(txt, index=False).to_numpy()
        h2 = pd.util.hash_pandas_object(txt, index=False,
                                        hash_key="fedcba9876543210").to_numpy()
        return pa.table({
            "doc_id": pa.array(doc_id.to_numpy(zero_copy_only=False)[keep],
                               pa.int64()),
            "h1": pa.array(h1.view(np.int64), pa.int64()),
            "h2": pa.array(h2.view(np.int64), pa.int64()),
        })

    rows = ds.map_batches(extract_gate_hash, batch_format="pyarrow")

    def keep_first(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        g = df.groupby(["h1", "h2"], sort=False)["doc_id"]
        out = g.agg(doc_id="min", n_dups="size").reset_index(drop=True)
        return out.astype({"doc_id": "int64", "n_dups": "int64"})

    return grouped_map(rows, ["h1", "h2"], keep_first)


SQL_CRAWL_CURATION_CHAIN = """
WITH x AS (
  SELECT doc_id, source,
         CASE doc_id % 4
           WHEN 0 THEN 'Home About' || chr(10) || text || chr(10)
                       || 'Copyright © 2024 — Example Corp'
           WHEN 1 THEN 'Menu One Menu Two' || chr(10) || text || chr(10)
                       || 'Contact: info@example.com'
           WHEN 2 THEN 'alpha' || chr(10) || 'beta & gamma' || chr(10)
                       || text || chr(10) || 'cell1' || chr(10) || '2 < 3'
           ELSE 'Header "Quoted"' || chr(10) || text || chr(10) || 'fin…'
         END AS xtext
  FROM documents),
clean AS (
  SELECT doc_id, xtext FROM x
  WHERE length(xtext) >= 120
    AND source || '.example.com' NOT IN ('src2.example.org',
                                         'src3.example.com'))
SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups
FROM clean GROUP BY xtext
"""


# ---------------------------------------------------------------------------
# Flink-SQL window/CEP parity extensions (round 4d): CUMULATE TVF, windowed
# Top-N, MATCH_RECOGNIZE-style consecutive pattern, upsert-stream aggregate,
# and PageRank over the crawl outlink host graph.
# ---------------------------------------------------------------------------

CUMULATE_STEP_MS = 300_000       # 5-min emit step
CUMULATE_MAX_MS = 1_200_000      # 20-min max span (4 cumulative slices)


def q_cumulate_windows(sf_dir: str):
    """Flink CUMULATE window TVF analog (public Flink SQL semantics: a
    tumbling max-span window that emits a growing prefix every step): an
    event at ts belongs to every (window_start, window_end) pair with
    window_start = floor(ts/max)*max and window_end = window_start + k*step
    for each step boundary AFTER the event.  The explode is vectorized
    (repeat by per-row slice count); partials pre-aggregate per
    (event_type, start, end) inside map_batches so the exchange carries
    one row per key per block, never per event."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    n_slices = CUMULATE_MAX_MS // CUMULATE_STEP_MS

    def explode(batch: pa.Table) -> pd.DataFrame:
        tms = batch["ts"].cast(pa.int64()).to_numpy() // 1000
        start = (tms // CUMULATE_MAX_MS) * CUMULATE_MAX_MS
        # first emitting slice index for each row: the step boundary
        # strictly after ts
        k0 = (tms - start) // CUMULATE_STEP_MS + 1
        reps = (n_slices - k0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(tms)), reps)
        # k values: k0[i] .. n_slices for each row i, flattened
        offs = np.arange(len(idx)) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        k = k0[idx] + offs
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas().to_numpy()[idx],
            "window_start": start[idx],
            "window_end": start[idx] + k * CUMULATE_STEP_MS,
            "value": batch["value"].to_numpy()[idx],
        })
        g = df.groupby(["event_type", "window_start", "window_end"], sort=False)["value"]
        return g.agg(n_events="size", sum_value="sum").reset_index()

    parts = ds.map_batches(explode, batch_format="pyarrow")
    final = grouped_map(
        parts, ["event_type", "window_start", "window_end"], _combine_partials,
        fn_kwargs={"keys": ["event_type", "window_start", "window_end"],
                   "sums": ["n_events", "sum_value"]},
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": batch["window_start"].cast(pa.int64()),
            "window_end": batch["window_end"].cast(pa.int64()),
            "n_events": batch["n_events"].cast(pa.int64()),
            "sum_value_cents": pa.array(_cents(batch["sum_value"].to_numpy()), pa.int64()),
        })

    return final.map_batches(finish, batch_format="pyarrow")


SQL_CUMULATE_WINDOWS = """
SELECT event_type,
       (epoch_ms(ts) // 1200000) * 1200000 AS window_start,
       (epoch_ms(ts) // 1200000) * 1200000 + k * 300000 AS window_end,
       COUNT(*) AS n_events,
       CAST(floor(SUM(value) * 100 + 0.5) AS BIGINT) AS sum_value_cents
FROM events CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS k) s
WHERE epoch_ms(ts) < (epoch_ms(ts) // 1200000) * 1200000 + k * 300000
GROUP BY 1, 2, 3
"""


WINDOW_TOPN_MS = 600_000   # 10-min tumbling windows
WINDOW_TOPN_K = 3


def q_window_topn_hosts(sf_dir: str):
    """Flink windowed Top-N analog over the pages stream: per tumbling
    10-min event-time window, the top-3 hosts by doc count with dense
    row-number ranks (ties broken by host asc, matching the SQL
    ROW_NUMBER() ORDER BY doc_count DESC, key_host).  Partial counts per
    (window, host) inside map_batches; ONE exchange on window_start —
    each window's candidate set lands whole in one partition, where the
    combine + rank is a vectorized sort + cumcount."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        tms = BASE_TS_MS + ids.astype(np.int64) * 1000
        df = pd.DataFrame({
            "window_start": (tms // WINDOW_TOPN_MS) * WINDOW_TOPN_MS,
            "key_host": "h" + pd.Series(ids % 20).astype(str) + ".example.com",
        })
        return (df.groupby(["window_start", "key_host"], sort=False)
                .size().rename("doc_count").reset_index())

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def topn(t: pa.Table) -> pd.DataFrame:
        df = (t.to_pandas()
              .groupby(["window_start", "key_host"], sort=False)["doc_count"]
              .sum().reset_index()
              .sort_values(["window_start", "doc_count", "key_host"],
                           ascending=[True, False, True], kind="stable"))
        df["rnk"] = df.groupby("window_start", sort=False).cumcount() + 1
        out = df[df["rnk"] <= WINDOW_TOPN_K].reset_index(drop=True)
        return out.astype({"window_start": "int64", "doc_count": "int64",
                           "rnk": "int64"})

    return grouped_map(parts, ["window_start"], topn)


SQL_WINDOW_TOPN_HOSTS = """
WITH pages AS (
  SELECT ((1700000000000 + doc_id * 1000) // 600000) * 600000 AS window_start,
         'h' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS key_host
  FROM documents),
c AS (SELECT window_start, key_host, COUNT(*) AS doc_count
      FROM pages GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY window_start
                                   ORDER BY doc_count DESC, key_host) AS rnk
      FROM c)
SELECT window_start, key_host, doc_count, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
"""


def _cep_sweep(t: pa.Table) -> pd.DataFrame:
    """Vectorized MATCH_RECOGNIZE over one user-hash partition: find every
    strictly-consecutive ``view+ click purchase`` match in each user's
    (ts, event_id)-ordered stream.  Run lengths come from the
    maximum.accumulate barrier trick (no Python row loop); user
    boundaries cap the run so patterns never cross users."""
    df = t.to_pandas().sort_values(["user_id", "ts_us", "event_id"],
                                   kind="stable").reset_index(drop=True)
    n = len(df)
    if n < 3:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "start_ts_us": pd.Series([], dtype="int64"),
                             "n_views": pd.Series([], dtype="int64"),
                             "purchase_ts_us": pd.Series([], dtype="int64")})
    user = df["user_id"].to_numpy()
    ts = df["ts_us"].to_numpy()
    et = df["event_type"].to_numpy()
    idx = np.arange(n)
    new_user = np.concatenate(([True], user[1:] != user[:-1]))
    # longest view-run ending at j (within user): distance to the last
    # non-view row, capped at the user-segment start
    last_nonview = np.maximum.accumulate(np.where(et != "view", idx, -1))
    user_start = np.maximum.accumulate(np.where(new_user, idx, 0))
    run = np.minimum(idx - last_nonview, idx - user_start + 1)
    run = np.where(et == "view", run, 0)
    # match anchor: purchase at j, click at j-1, view-run >= 1 at j-2,
    # all three rows in the same user segment
    j = idx[2:][(et[2:] == "purchase") & (et[1:-1] == "click")
                & (run[:-2] >= 1) & (user[2:] == user[:-2])]
    n_views = run[j - 2]
    start = j - 2 - (n_views - 1)
    return pd.DataFrame({
        "user_id": user[j].astype(np.int64),
        "start_ts_us": ts[start].astype(np.int64),
        "n_views": n_views.astype(np.int64),
        "purchase_ts_us": ts[j].astype(np.int64),
    })


def q_cep_pattern_matches(sf_dir: str):
    """CEP pattern matching (Flink MATCH_RECOGNIZE analog, public SQL-2016
    row-pattern semantics with greedy ``A+ B C``): per user, every
    maximal run of consecutive 'view' events followed immediately by
    'click' then 'purchase'.  One hash exchange on user_id co-locates
    each user's stream; the per-partition sweep is fully vectorized."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
            "event_type": batch["event_type"],
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    return grouped_map(ds.map_batches(prep, batch_format="pyarrow"),
                       ["user_id"], _cep_sweep)


SQL_CEP_PATTERN_MATCHES = """
WITH s AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
nv AS (
  SELECT user_id, rn, tus,
         max(CASE WHEN event_type <> 'view' THEN rn ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY rn) AS last_nonview
  FROM s)
SELECT p.user_id,
       b.tus AS start_ts_us,
       CAST((p.rn - 2) - w.last_nonview AS BIGINT) AS n_views,
       p.tus AS purchase_ts_us
FROM s p
JOIN s c ON c.user_id = p.user_id AND c.rn = p.rn - 1
JOIN nv w ON w.user_id = p.user_id AND w.rn = p.rn - 2
JOIN s b ON b.user_id = p.user_id AND b.rn = w.last_nonview + 1
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
  AND (p.rn - 2) - w.last_nonview >= 1
"""


def _upsert_sweep(t: pa.Table) -> pd.DataFrame:
    """Latest row per (user_id, event_type) upsert key — all rows of a
    user are co-located, so per-partition latest IS the global latest —
    then a local partial aggregate per event_type."""
    df = (t.to_pandas()
          .sort_values(["user_id", "event_type", "ts_us", "event_id"],
                       ascending=[True, True, False, False], kind="stable")
          .drop_duplicates(["user_id", "event_type"], keep="first"))
    g = df.groupby("event_type", sort=False)["value"]
    return g.agg(n_keys="size", sum_latest="sum").reset_index()


def q_upsert_aggregate(sf_dir: str):
    """Flink upsert/changelog-stream aggregation analog (public Flink
    retract-stream semantics: the aggregate reflects only each key's
    LATEST row): events form an upsert stream keyed by (user_id,
    event_type) with (ts, event_id) as the version; aggregate the
    materialized latest values per event_type.  One exchange on user_id;
    the retraction logic collapses to a per-partition keep-latest because
    every version of a key lands in the same partition."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "event_type", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
            "event_type": batch["event_type"],
            "ts_us": batch["ts"].cast(pa.int64()),
            "value": batch["value"],
        })

    parts = grouped_map(ds.map_batches(prep, batch_format="pyarrow"),
                        ["user_id"], _upsert_sweep)
    final = grouped_map(parts, ["event_type"], _combine_partials,
                        fn_kwargs={"keys": ["event_type"],
                                   "sums": ["n_keys", "sum_latest"]})

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "n_keys": batch["n_keys"].cast(pa.int64()),
            "sum_latest_cents": pa.array(
                _cents(batch["sum_latest"].to_numpy()), pa.int64()),
        })

    return final.map_batches(finish, batch_format="pyarrow")


SQL_UPSERT_AGGREGATE = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT event_type, COUNT(*) AS n_keys,
       CAST(floor(SUM(value) * 100 + 0.5) AS BIGINT) AS sum_latest_cents
FROM r WHERE rn = 1 GROUP BY event_type
"""


def _host_edges(sf_dir: str):
    """Int-keyed edge Dataset + (node, host) dictionary Dataset from the
    outlink host graph (q_outlink_graph's parse).  Node id is the 64-bit
    text hash of the host — the hash-as-id idiom of web-graph systems —
    so edges stream straight into the resident-partition PageRank with
    no driver-side id assignment; the dictionary (one row per DISTINCT
    host, the same cardinality as the rank output itself) is the only
    small side."""
    edges = q_outlink_graph(sf_dir)

    def to_ids(batch: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            s = fp.text_hash64(batch["src_host"]).view(np.int64)
            d = fp.text_hash64(batch["dst_host"]).view(np.int64)
        return pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(d, pa.int64())})

    def to_dict(batch: pa.Table) -> pd.DataFrame:
        hosts = pd.concat([batch["src_host"].to_pandas(),
                           batch["dst_host"].to_pandas()]).drop_duplicates()
        with np.errstate(over="ignore"):
            node = fp.text_hash64(pa.array(hosts, pa.string())).view(np.int64)
        return pd.DataFrame({"node": node, "host": hosts.to_numpy()})

    ids = edges.map_batches(to_ids, batch_format="pyarrow")
    hostmap = grouped_map(edges.map_batches(to_dict, batch_format="pyarrow"),
                          ["node"], _hostmap_dedup)
    return ids, hostmap


def _hostmap_dedup(t: pa.Table) -> pd.DataFrame:
    return t.to_pandas().drop_duplicates("node").reset_index(drop=True)


def q_host_pagerank(sf_dir: str):
    """Crawl-graph PageRank: the outlink host graph (parsed from anchor
    markup, q_outlink_graph) ranked by the resident-partition power
    iteration of stages/graph.py (edges hash-partitioned once, only
    locally-summed contribution rows cross the exchange per iteration).
    Rows-only — float iteration; the paired check pins distributed vs
    single-process agreement."""
    from ..stages.graph import distributed_pagerank

    ids, hostmap = _host_edges(sf_dir)
    ranks = distributed_pagerank(ids)
    hm = hostmap.to_pandas()
    out = ranks.merge(hm, on="node", how="left")
    return (out[["host", "rank_micros"]]
            .sort_values("host", kind="stable").reset_index(drop=True))


def q_host_pagerank_check(sf_dir: str):
    """Driver-visible invariant: the distributed crawl-graph PageRank
    agrees with the single-process numpy recompute on every host to
    within 2 micros (float summation order is the only degree of
    freedom).  The oracle pins mismatch_rows = 0."""
    from ..stages.graph import distributed_pagerank, reference_pagerank

    ids, _ = _host_edges(sf_dir)
    dist = distributed_pagerank(ids)
    ref = reference_pagerank(ids.to_pandas())
    m = dist.merge(ref, on="node", how="outer", suffixes=("_d", "_r"))
    bad = (m["rank_micros_d"].isna() | m["rank_micros_r"].isna()
           | ((m["rank_micros_d"] - m["rank_micros_r"]).abs() > 2))
    return pd.DataFrame({"mismatch_rows": pd.array([int(bad.sum())], dtype="int64")})


def q_host_hits(sf_dir: str):
    """HITS hubs & authorities (Kleinberg 1999, public method) over the
    DIRECTED crawl host graph — the link-analysis complement to
    `host_pagerank` (which symmetrizes).  Hub = links to good
    authorities; authority = linked from good hubs; 20 normalized
    iterations.  Scale shape: BOTH edge orientations hash-partitioned
    once and kept resident; each half-step is one local task per
    partition + one exchange of locally-summed (node, partial) rows;
    the L2 norm is a scalar tree-reduce (one float per partition).
    Iterative float scores → rows-only; `host_hits_check` pins the
    distributed result against the single-process recompute."""
    from ..stages.graph import distributed_hits

    ids, hostmap = _host_edges(sf_dir)
    scores = distributed_hits(ids)
    hm = hostmap.to_pandas()
    out = scores.merge(hm, on="node", how="left")
    return (out[["host", "hub_micros", "auth_micros"]]
            .sort_values("host", kind="stable").reset_index(drop=True))


def q_host_hits_check(sf_dir: str):
    """Driver-visible invariant: distributed HITS agrees with the
    single-process numpy recompute on every host to within 5 micros
    (float summation order inside the per-partition norm partials is
    the only degree of freedom).  The oracle pins mismatch_rows = 0."""
    from ..stages.graph import distributed_hits, reference_hits

    ids, _ = _host_edges(sf_dir)
    dist = distributed_hits(ids)
    ref = reference_hits(ids.to_pandas())
    m = dist.merge(ref, on="node", how="outer", suffixes=("_d", "_r"))
    bad = (m["hub_micros_d"].isna() | m["hub_micros_r"].isna()
           | ((m["hub_micros_d"] - m["hub_micros_r"]).abs() > 5)
           | ((m["auth_micros_d"] - m["auth_micros_r"]).abs() > 5))
    return pd.DataFrame({"mismatch_rows": pd.array([int(bad.sum())], dtype="int64")})


HOST_QUOTA_K = 10


def q_host_quota_cap(sf_dir: str):
    """Per-domain quota cap (the FineWeb/CC curation primitive that
    bounds any one site's share of the corpus): keep each host's first
    K=10 pages by event time, drop the rest.  ONE exchange on key_host
    co-locates a host's pages; the per-partition sweep is a vectorized
    sort + cumcount — the distributed ROW_NUMBER() <= K idiom."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        return pd.DataFrame({
            "key_host": "h" + pd.Series(ids % 20).astype(str) + ".example.com",
            "tms": BASE_TS_MS + ids.astype(np.int64) * 1000,
            "doc_id": ids.astype(np.int64),
        })

    def cap(t: pa.Table) -> pd.DataFrame:
        df = (t.to_pandas()
              .sort_values(["key_host", "tms", "doc_id"], kind="stable")
              .reset_index(drop=True))
        df["rn"] = df.groupby("key_host", sort=False).cumcount() + 1
        out = df[df["rn"] <= HOST_QUOTA_K][["key_host", "doc_id", "rn"]]
        return out.astype({"doc_id": "int64", "rn": "int64"}).reset_index(drop=True)

    parts = ds.map_batches(prep, batch_format="pyarrow")
    return grouped_map(parts, ["key_host"], cap)


SQL_HOST_QUOTA_CAP = """
WITH pages AS (
  SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS key_host,
         1700000000000 + doc_id * 1000 AS tms, doc_id
  FROM documents),
r AS (SELECT key_host, doc_id,
             row_number() OVER (PARTITION BY key_host
                                ORDER BY tms, doc_id) AS rn
      FROM pages)
SELECT key_host, doc_id, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 10
"""


def q_bigram_logprob(sf_dir: str):
    """Bigram language-model quality score (the KenLM-perplexity-filter
    shape of CCNet at n=2): tokens map to a 25-class alphabet (top-24
    corpus unigrams + one OOV class, same vocab rule as
    ``unigram_logprob``); the class-bigram transition table with add-one
    smoothing is trained corpus-wide and scores every adjacent pair.
    Scale shape: pass 1 exchanges bounded word-count partials, pass 2
    exchanges 25x25-bounded pair-count partials, pass 3 broadcasts the
    625-entry micros log-prob matrix via ray.put and streams the corpus;
    per-pair micros round BEFORE the doc sum keeps the value int-exact
    regardless of summation order."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    # ---- pass 1: top-V vocab (same exchange as unigram_logprob) ----
    def count_partial(batch: pa.Table) -> pd.DataFrame:
        pl = fp._polars()
        s = pl.Series(batch["text"].combine_chunks().cast(pa.large_string()))
        vc = s.str.extract_all(r"\S+").explode().value_counts()
        return pd.DataFrame({"word": vc[vc.columns[0]].to_pandas(),
                             "n": vc["count"].to_numpy().astype(np.int64)})

    def count_sweep(t: pa.Table) -> pd.DataFrame:
        return t.to_pandas().groupby("word", sort=False)["n"].sum().reset_index()

    counts = grouped_map(ds.map_batches(count_partial, batch_format="pyarrow"),
                         ["word"], count_sweep).to_pandas()
    top = (counts.sort_values(["n", "word"], ascending=[False, True],
                              kind="stable").head(LM_TOP_V))
    vocab_index = pd.Index(top["word"])
    n_classes = LM_TOP_V + 1            # class LM_TOP_V == OOV
    vocab_ref = ray.put(vocab_index)

    def _classes(batch: pa.Table):
        """(per-doc token counts, flattened class ids) for one block."""
        pl = fp._polars()
        vidx = ray.get(vocab_ref)
        s = pl.Series(batch["text"].combine_chunks().cast(pa.large_string()))
        lists = s.str.extract_all(r"\S+")
        lens = lists.list.len().to_numpy().astype(np.int64)
        flat = lists.explode().drop_nulls().to_pandas()
        cls = vidx.get_indexer(flat)
        cls = np.where(cls >= 0, cls, LM_TOP_V)
        return lens, cls

    # ---- pass 2: class-bigram transition counts (25x25-bounded) ----
    def pair_partial(batch: pa.Table) -> pd.DataFrame:
        lens, cls = _classes(batch)
        if len(cls) < 2:
            return pd.DataFrame({"pair": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        doc = np.repeat(np.arange(len(lens)), lens)
        adj = doc[1:] == doc[:-1]
        pair = cls[:-1][adj] * n_classes + cls[1:][adj]
        u, c = np.unique(pair, return_counts=True)
        return pd.DataFrame({"pair": u.astype(np.int64),
                             "n": c.astype(np.int64)})

    pair_pdf = (ds.map_batches(pair_partial, batch_format="pyarrow")
                .to_pandas().groupby("pair", sort=False)["n"].sum())
    c2 = np.zeros(n_classes * n_classes, np.int64)
    c2[pair_pdf.index.to_numpy()] = pair_pdf.to_numpy()
    c2 = c2.reshape(n_classes, n_classes)
    ctx = c2.sum(axis=1)                 # context counts = rows
    # add-one smoothing over the class alphabet
    lp = np.log((c2 + 1.0) / (ctx[:, None] + n_classes))
    lp_micros = np.floor(lp * 1e6 + 0.5).astype(np.int64)
    mat_ref = ray.put(lp_micros)

    # ---- pass 3: score every doc ----
    def score(batch: pa.Table) -> pa.Table:
        lens, cls = _classes(batch)
        mat = ray.get(mat_ref)
        sums = np.zeros(len(lens), np.int64)
        npairs = np.maximum(lens - 1, 0)
        if len(cls) >= 2:
            doc = np.repeat(np.arange(len(lens)), lens)
            adj = doc[1:] == doc[:-1]
            pm = mat[cls[:-1][adj], cls[1:][adj]]
            nz = npairs > 0
            if nz.any():
                offsets = np.zeros(int(nz.sum()), np.int64)
                np.cumsum(npairs[nz][:-1], out=offsets[1:])
                sums[nz] = np.add.reduceat(pm, offsets)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_pairs": pa.array(npairs, pa.int64()),
            "logprob_sum_micros": pa.array(sums, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def q_dsir_weights(sf_dir: str):
    """DSIR-style importance weight (Data Selection via Importance
    Resampling, Xie et al. 2023 — public method): per doc,
    log p_target(x) − log p_raw(x) under two class-bigram LMs over a
    SHARED feature space (the same corpus-wide 25-class alphabet as
    ``bigram_logprob``).  The target LM trains on one source's docs
    ('src1', the stand-in for a high-quality seed corpus); the raw LM
    trains corpus-wide.  Scale shape: ONE pair-count exchange carries
    BOTH counts as (pair, n_all, n_tgt) partials; the 625-entry
    DIFFERENCE matrix — each side's log-prob independently floored to
    micros, so every per-pair value is int-exact — broadcasts via
    ray.put and the corpus streams through the score pass.  Positive
    weight ⇒ the doc looks more target-like (DSIR resamples with
    probability ∝ exp(weight))."""
    TARGET = "src1"
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    # ---- pass 1: shared top-V vocab (identical rule to bigram_logprob)
    def count_partial(batch: pa.Table) -> pd.DataFrame:
        pl = fp._polars()
        s = pl.Series(batch["text"].combine_chunks().cast(pa.large_string()))
        vc = s.str.extract_all(r"\S+").explode().value_counts()
        return pd.DataFrame({"word": vc[vc.columns[0]].to_pandas(),
                             "n": vc["count"].to_numpy().astype(np.int64)})

    def count_sweep(t: pa.Table) -> pd.DataFrame:
        return t.to_pandas().groupby("word", sort=False)["n"].sum().reset_index()

    counts = grouped_map(ds.map_batches(count_partial, batch_format="pyarrow"),
                         ["word"], count_sweep).to_pandas()
    top = (counts.sort_values(["n", "word"], ascending=[False, True],
                              kind="stable").head(LM_TOP_V))
    vocab_index = pd.Index(top["word"])
    n_classes = LM_TOP_V + 1
    vocab_ref = ray.put(vocab_index)

    def _classes(batch: pa.Table):
        pl = fp._polars()
        vidx = ray.get(vocab_ref)
        s = pl.Series(batch["text"].combine_chunks().cast(pa.large_string()))
        lists = s.str.extract_all(r"\S+")
        lens = lists.list.len().to_numpy().astype(np.int64)
        flat = lists.explode().drop_nulls().to_pandas()
        cls = vidx.get_indexer(flat)
        cls = np.where(cls >= 0, cls, LM_TOP_V)
        return lens, cls

    # ---- pass 2: ONE exchange with both LMs' pair counts ----
    def pair_partial(batch: pa.Table) -> pd.DataFrame:
        lens, cls = _classes(batch)
        empty = pd.DataFrame({"pair": pd.Series([], dtype="int64"),
                              "n_all": pd.Series([], dtype="int64"),
                              "n_tgt": pd.Series([], dtype="int64")})
        if len(cls) < 2:
            return empty
        doc = np.repeat(np.arange(len(lens)), lens)
        adj = doc[1:] == doc[:-1]
        if not adj.any():
            return empty
        pair = cls[:-1][adj] * n_classes + cls[1:][adj]
        is_tgt = (np.asarray(batch["source"], dtype=object) == TARGET)
        tgt_pair = is_tgt[doc[:-1][adj]]
        u, inv = np.unique(pair, return_inverse=True)
        return pd.DataFrame({
            "pair": u.astype(np.int64),
            "n_all": np.bincount(inv).astype(np.int64),
            "n_tgt": np.bincount(inv, weights=tgt_pair).astype(np.int64),
        })

    pair_pdf = (ds.map_batches(pair_partial, batch_format="pyarrow")
                .to_pandas().groupby("pair", sort=False)[["n_all", "n_tgt"]].sum())

    def _lp_micros(flat_counts: np.ndarray) -> np.ndarray:
        c2 = flat_counts.reshape(n_classes, n_classes)
        ctx = c2.sum(axis=1)
        lp = np.log((c2 + 1.0) / (ctx[:, None] + n_classes))
        return np.floor(lp * 1e6 + 0.5).astype(np.int64)

    flat_all = np.zeros(n_classes * n_classes, np.int64)
    flat_tgt = np.zeros(n_classes * n_classes, np.int64)
    flat_all[pair_pdf.index.to_numpy()] = pair_pdf["n_all"].to_numpy()
    flat_tgt[pair_pdf.index.to_numpy()] = pair_pdf["n_tgt"].to_numpy()
    diff_ref = ray.put(_lp_micros(flat_tgt) - _lp_micros(flat_all))

    # ---- pass 3: per-doc weight ----
    def score(batch: pa.Table) -> pa.Table:
        lens, cls = _classes(batch)
        mat = ray.get(diff_ref)
        sums = np.zeros(len(lens), np.int64)
        npairs = np.maximum(lens - 1, 0)
        if len(cls) >= 2:
            doc = np.repeat(np.arange(len(lens)), lens)
            adj = doc[1:] == doc[:-1]
            pm = mat[cls[:-1][adj], cls[1:][adj]]
            nz = npairs > 0
            if nz.any():
                offsets = np.zeros(int(nz.sum()), np.int64)
                np.cumsum(npairs[nz][:-1], out=offsets[1:])
                sums[nz] = np.add.reduceat(pm, offsets)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_pairs": pa.array(npairs, pa.int64()),
            "dsir_sum_micros": pa.array(sums, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


SQL_DSIR_WEIGHTS = r"""
WITH cnt AS (
  SELECT w, COUNT(*) AS n
  FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents)
  GROUP BY w),
top AS (SELECT w, row_number() OVER (ORDER BY n DESC, w) - 1 AS cls
        FROM cnt ORDER BY n DESC, w LIMIT 24),
l AS (SELECT doc_id, source, regexp_extract_all(text, '\S+') AS toks
      FROM documents),
prs AS (
  SELECT doc_id, source, toks[pos] AS w1, toks[pos + 1] AS w2
  FROM (SELECT doc_id, source, toks,
               unnest(generate_series(1, len(toks) - 1)) AS pos FROM l)),
pc AS (
  SELECT doc_id, source,
         COALESCE(t1.cls, 24) AS c1, COALESCE(t2.cls, 24) AS c2
  FROM prs LEFT JOIN top t1 ON prs.w1 = t1.w
           LEFT JOIN top t2 ON prs.w2 = t2.w),
ca AS (SELECT c1, c2, COUNT(*) AS n FROM pc GROUP BY c1, c2),
xa AS (SELECT c1, SUM(n) AS n_ctx FROM ca GROUP BY c1),
ct AS (SELECT c1, c2, COUNT(*) AS n FROM pc WHERE source = 'src1'
       GROUP BY c1, c2),
xt AS (SELECT c1, SUM(n) AS n_ctx FROM ct GROUP BY c1),
lp AS (
  SELECT pc.doc_id,
         CAST(floor(ln((COALESCE(t.n, 0) + 1.0)
                       / (COALESCE(xt.n_ctx, 0) + 25.0)) * 1e6 + 0.5) AS BIGINT)
         - CAST(floor(ln((COALESCE(a.n, 0) + 1.0)
                         / (xa.n_ctx + 25.0)) * 1e6 + 0.5) AS BIGINT) AS micros
  FROM pc JOIN xa ON pc.c1 = xa.c1
          LEFT JOIN ca a ON pc.c1 = a.c1 AND pc.c2 = a.c2
          LEFT JOIN xt ON pc.c1 = xt.c1
          LEFT JOIN ct t ON pc.c1 = t.c1 AND pc.c2 = t.c2)
SELECT d.doc_id,
       CAST(greatest(COALESCE(array_length(regexp_extract_all(d.text, '\S+')), 0)
                     - 1, 0) AS BIGINT) AS n_pairs,
       COALESCE(s.micros_sum, 0) AS dsir_sum_micros
FROM documents d
LEFT JOIN (SELECT doc_id, SUM(micros) AS micros_sum FROM lp GROUP BY doc_id) s
  ON d.doc_id = s.doc_id
"""


SQL_BIGRAM_LOGPROB = r"""
WITH cnt AS (
  SELECT w, COUNT(*) AS n
  FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents)
  GROUP BY w),
top AS (SELECT w, row_number() OVER (ORDER BY n DESC, w) - 1 AS cls
        FROM cnt ORDER BY n DESC, w LIMIT 24),
l AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
prs AS (
  SELECT doc_id, toks[pos] AS w1, toks[pos + 1] AS w2
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 1)) AS pos FROM l)),
pc AS (
  SELECT doc_id,
         COALESCE(t1.cls, 24) AS c1, COALESCE(t2.cls, 24) AS c2
  FROM prs LEFT JOIN top t1 ON prs.w1 = t1.w
           LEFT JOIN top t2 ON prs.w2 = t2.w),
c2tab AS (SELECT c1, c2, COUNT(*) AS n FROM pc GROUP BY c1, c2),
ctx AS (SELECT c1, SUM(n) AS n_ctx FROM c2tab GROUP BY c1),
lp AS (
  SELECT pc.doc_id,
         CAST(floor(ln((COALESCE(t.n, 0) + 1.0) / (x.n_ctx + 25.0))
                    * 1e6 + 0.5) AS BIGINT) AS micros
  FROM pc JOIN ctx x ON pc.c1 = x.c1
          LEFT JOIN c2tab t ON pc.c1 = t.c1 AND pc.c2 = t.c2)
SELECT d.doc_id,
       CAST(greatest(COALESCE(array_length(regexp_extract_all(d.text, '\S+')), 0)
                     - 1, 0) AS BIGINT) AS n_pairs,
       COALESCE(s.micros_sum, 0) AS logprob_sum_micros
FROM documents d
LEFT JOIN (SELECT doc_id, SUM(micros) AS micros_sum FROM lp GROUP BY doc_id) s
  ON d.doc_id = s.doc_id
"""


def q_anchor_text_index(sf_dir: str):
    """Anchor-text aggregation per link target (the classic web-ranking
    signal: what OTHER pages call a host): the same noisy-markup anchors
    as ``outlink_graph`` but now the INNER TEXT is parsed too, and the
    exchange aggregates per dst_host — n_links, distinct anchor strings,
    and the lexicographically-first anchor.  Distinct-anchor partials
    stay exact because the combine keys on (dst_host, anchor) before the
    per-host rollup."""
    from ..functions.fingerprint import _polars

    ds = _read(sf_dir, "documents", ["doc_id"])

    def build_and_parse(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        parts = []
        for j in range(3):
            dst = pd.Series((ids * 7 + j) % 25).astype(str)
            txt = pd.Series((ids + j) % 13).astype(str)
            a = ('<a class="x" data-v="y>z" href="https://src' + dst
                 + '.example.org/p">anchor ' + txt + '</a> ')
            parts.append(pd.Series(np.where(ids % 3 >= j, a, "")).astype(str))
        html = "<div>" + parts[0] + parts[1] + parts[2] + "</div>"

        pl = _polars()
        df = pl.DataFrame({"h": pl.Series(html.to_numpy())})
        pairs = (
            # quote-aware attribute grammar (the markup carries '>' inside
            # quoted attribute values, so [^>]* cannot span the tag)
            df.with_columns(pl.col("h")
                            .str.extract_all(r'<a\b(?:[^>"]|"[^"]*")*>[^<]*</a>')
                            .alias("tag"))
            .drop("h").explode("tag").drop_nulls("tag")
            .with_columns(
                pl.col("tag").str.extract(r'href="https?://([^/"]+)', 1)
                .alias("dst_host"),
                # [^<>]* pins the capture to the run after the tag's FINAL
                # '>' (earlier '>'s sit inside quoted attribute values)
                pl.col("tag").str.extract(r'>([^<>]*)</a>', 1).alias("anchor"))
            .drop_nulls(["dst_host", "anchor"])
            .group_by(["dst_host", "anchor"]).len(name="n_links")
        )
        return pd.DataFrame({
            "dst_host": pairs["dst_host"].to_list(),
            "anchor": pairs["anchor"].to_list(),
            "n_links": pairs["n_links"].to_numpy().astype(np.int64),
        })

    parts = ds.map_batches(build_and_parse, batch_format="pyarrow")

    def rollup(t: pa.Table) -> pd.DataFrame:
        df = (t.to_pandas()
              .groupby(["dst_host", "anchor"], sort=False)["n_links"]
              .sum().reset_index())
        g = df.groupby("dst_host", sort=False)
        out = g.agg(n_links=("n_links", "sum"),
                    n_anchors=("anchor", "size"),
                    first_anchor=("anchor", "min")).reset_index()
        return out.astype({"n_links": "int64", "n_anchors": "int64"})

    return grouped_map(parts, ["dst_host"], rollup)


SQL_ANCHOR_TEXT_INDEX = """
WITH links AS (
  SELECT 'src' || CAST((doc_id * 7 + j) % 25 AS VARCHAR)
           || '.example.org' AS dst_host,
         'anchor ' || CAST((doc_id + j) % 13 AS VARCHAR) AS anchor
  FROM documents, unnest(generate_series(0, doc_id % 3)) AS t(j))
SELECT dst_host,
       CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(COUNT(DISTINCT anchor) AS BIGINT) AS n_anchors,
       MIN(anchor) AS first_anchor
FROM links GROUP BY dst_host
"""


# ---------------------------------------------------------------------------
# Training-data packing + CCNet perplexity buckets + Flink window dedup
# (round 4e)
# ---------------------------------------------------------------------------

PACK_CTX = 128      # tokens per packed training context
PACK_SPAN = 128     # doc_ids per prefix-sum carry range


def q_pack_contexts(sf_dir: str):
    """GPT-style concat-and-chunk sequence packing — the standard
    training-data layout at scale (docs concatenated in doc_id order
    with one EOS token each, the stream cut into fixed PACK_CTX-token
    contexts).  Per doc: its token count, stream offset, and the first /
    last context it lands in.

    Scale shape: a DISTRIBUTED PREFIX SUM (scan-with-carry).  Pass 1
    tokenizes once and keeps only 24-byte (doc_id, n_tokens) rows; the
    per-range weight totals (one int per PACK_SPAN docs) come to the
    driver for the tiny exclusive scan; the carry offsets ship back as
    plain fn_kwargs arrays and each range partition resolves its docs
    with one local cumsum.  Nothing wide ever moves — the exchange is
    the narrow token-count rows, never text.  (At petascale PACK_SPAN
    grows with the corpus, or the range totals get a second scan level —
    the carry stays one int per range either way.)"""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_partial(batch: pa.Table) -> pa.Table:
        pl = fp._polars()
        s = pl.Series(batch["text"].combine_chunks().cast(pa.large_string()))
        ntok = s.str.extract_all(r"\S+").list.len().to_numpy().astype(np.int64)
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "rng": pa.array(ids // PACK_SPAN, pa.int64()),
            "n_tokens": pa.array(ntok, pa.int64()),
        })

    # tokenize ONCE: the narrow (doc_id, rng, n_tokens) rows are consumed
    # twice (range totals, then the per-range resolve), so materialize
    # them — 24 bytes/doc, not text
    toks = ds.map_batches(tok_partial, batch_format="pyarrow").materialize()

    def range_partial(batch: pa.Table) -> pd.DataFrame:
        rng = batch["rng"].to_numpy()
        w = batch["n_tokens"].to_numpy() + 1  # +1 EOS per doc
        u, inv = np.unique(rng, return_inverse=True)
        return pd.DataFrame({"rng": u.astype(np.int64),
                             "w": np.bincount(inv, weights=w).astype(np.int64)})

    totals = (toks.map_batches(range_partial, batch_format="pyarrow")
              .to_pandas().groupby("rng", sort=True)["w"].sum())
    rngs = totals.index.to_numpy(np.int64)
    offs = np.zeros(len(rngs), np.int64)
    np.cumsum(totals.to_numpy(np.int64)[:-1], out=offs[1:])  # exclusive scan

    def pack_sweep(t: pa.Table, rngs: np.ndarray, offs: np.ndarray) -> pd.DataFrame:
        df = t.to_pandas().sort_values("doc_id", kind="stable")
        w = df["n_tokens"].to_numpy() + 1
        rng = df["rng"].to_numpy()
        cum = np.cumsum(w) - w  # local exclusive prefix (rng nondecreasing)
        starts = np.flatnonzero(np.diff(rng, prepend=rng[0] - 1))
        base = np.repeat(cum[starts], np.diff(np.append(starts, len(rng))))
        start = offs[np.searchsorted(rngs, rng)] + (cum - base)
        ntok = df["n_tokens"].to_numpy()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_tokens": ntok,
            "start_tok": start,
            "first_ctx": start // PACK_CTX,
            "last_ctx": (start + ntok) // PACK_CTX,  # end-1 = start+ntok
        })

    return grouped_map(toks, ["rng"], pack_sweep,
                       fn_kwargs={"rngs": rngs, "offs": offs})


SQL_PACK_CONTEXTS = rf"""
WITH t AS (
  SELECT doc_id,
         CAST(COALESCE(array_length(regexp_extract_all(text, '\S+')), 0)
              AS BIGINT) AS n_tokens
  FROM documents),
s AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens + 1) OVER (
                ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_tok
  FROM t)
SELECT doc_id, n_tokens, start_tok,
       CAST(start_tok // {PACK_CTX} AS BIGINT) AS first_ctx,
       CAST((start_tok + n_tokens) // {PACK_CTX} AS BIGINT) AS last_ctx
FROM s
"""


def q_ccnet_lang_buckets(sf_dir: str):
    """CCNet head/middle/tail buckets (Wenzek et al. 2020, public
    method): per language, docs ranked by per-token unigram-LM log-prob
    (higher = more fluent = 'head') and cut into NTILE(3) terciles.
    Per-token mean is the int-exact floor division sum_micros // n_tokens
    (rounded-per-token sum, so the ordering key is order-independent);
    empty docs are excluded.  Scale shape: the LM build is the bounded
    word-count exchange of ``_unigram_model_ref``; the rank pass moves
    only 24-byte (doc_id, lang, avg) rows through one groupby(lang) —
    per-language partitions, the same skew budget as stratified_sample.
    (At petascale the exact per-lang sort becomes a distributed
    quantile-sketch cut — the two tercile boundaries per language — with
    identical bucket semantics away from ties.)"""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    model = _unigram_model_ref(ds)

    def score(batch: pa.Table) -> pd.DataFrame:
        pl = fp._polars()
        vidx, vmic, oov = ray.get(model)
        s = pl.Series(batch["text"].combine_chunks().cast(pa.large_string()))
        lists = s.str.extract_all(r"\S+")
        lens = lists.list.len().to_numpy().astype(np.int64)
        flat = lists.explode().drop_nulls().to_pandas()
        idx = vidx.get_indexer(flat)
        lp = np.where(idx >= 0, vmic[np.clip(idx, 0, None)], oov)
        sums = np.zeros(len(lens), np.int64)
        nz = lens > 0
        if nz.any():
            offsets = np.zeros(int(nz.sum()), np.int64)
            np.cumsum(lens[nz][:-1], out=offsets[1:])
            sums[nz] = np.add.reduceat(lp, offsets)
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy()[nz],
            "lang": batch["lang"].to_pandas().to_numpy()[nz],
            "avg_lp_micros": sums[nz] // lens[nz],  # int floor division
        })

    def bucket_sweep(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas().sort_values(
            ["lang", "avg_lp_micros", "doc_id"],
            ascending=[True, False, True], kind="stable")
        r = df.groupby("lang", sort=False).cumcount().to_numpy(np.int64)
        n = df.groupby("lang", sort=False)["lang"].transform("size") \
              .to_numpy(np.int64)
        # NTILE(3): first (n % 3) tiles get one extra row
        q, rem = n // 3, n % 3
        cut = rem * (q + 1)
        tile = np.where(r < cut, r // np.maximum(q + 1, 1),
                        rem + (r - cut) // np.maximum(q, 1))
        df["bucket"] = np.array(["head", "middle", "tail"], object)[tile]
        return df.reset_index(drop=True)

    parts = ds.map_batches(score, batch_format="pyarrow")
    return grouped_map(parts, ["lang"], bucket_sweep)


SQL_CCNET_LANG_BUCKETS = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w FROM documents),
cnt AS (SELECT w, COUNT(*) AS n FROM tok GROUP BY w),
tot AS (SELECT SUM(n) AS total FROM cnt),
top AS (SELECT w, n FROM cnt ORDER BY n DESC, w LIMIT 24),
oov AS (
  SELECT CASE WHEN total - (SELECT SUM(n) FROM top) > 0
              THEN CAST(floor(ln((total - (SELECT SUM(n) FROM top)) * 1.0 / total)
                              * 1e6 + 0.5) AS BIGINT)
              ELSE -50000000 END AS oov_micros,
         total
  FROM tot),
lp AS (
  SELECT t.doc_id,
         COALESCE(CAST(floor(ln(p.n * 1.0 / o.total) * 1e6 + 0.5) AS BIGINT),
                  o.oov_micros) AS micros
  FROM tok t CROSS JOIN oov o LEFT JOIN top p ON t.w = p.w),
a AS (
  SELECT d.doc_id, d.lang,
         CAST(floor(CAST(s.micros_sum AS DOUBLE) / s.n_tok) AS BIGINT)
           AS avg_lp_micros
  FROM documents d
  JOIN (SELECT doc_id, SUM(micros) AS micros_sum, COUNT(*) AS n_tok
        FROM lp GROUP BY doc_id) s ON d.doc_id = s.doc_id)
SELECT doc_id, lang, avg_lp_micros,
       CASE ntile(3) OVER (PARTITION BY lang
                           ORDER BY avg_lp_micros DESC, doc_id)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM a
"""


def q_window_dedup_first(sf_dir: str):
    """Flink SQL 'Window Deduplication' (window TVF + ROW_NUMBER = 1):
    the FIRST event per (user, 1-minute tumbling window) by event time,
    ties broken on event_id.  Completes the window-TVF family alongside
    window aggregate / window Top-N / interval join.  Scale shape:
    block-local min per key (combiner — each block forwards at most one
    row per (user, window) it saw), then one groupby(user_id) sweep;
    the exchange carries survivors only, never the raw stream."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        tms = batch["ts"].cast(pa.int64()).to_numpy() // 1000  # us -> ms
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "window_start": tms // 60_000 * 60_000,
            "first_tms": tms,
            "event_id": batch["event_id"].to_numpy(),
            "event_type": batch["event_type"].to_pandas(),
        })
        df = df.sort_values(["user_id", "window_start", "first_tms", "event_id"],
                            kind="stable")
        keep = ~df.duplicated(["user_id", "window_start"])
        return df.loc[keep].reset_index(drop=True)

    def sweep(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas().sort_values(
            ["user_id", "window_start", "first_tms", "event_id"], kind="stable")
        keep = ~df.duplicated(["user_id", "window_start"])
        return df.loc[keep].reset_index(drop=True)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(parts, ["user_id"], sweep)


SQL_WINDOW_DEDUP_FIRST = """
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS tms FROM events),
w AS (
  SELECT user_id, (tms // 60000) * 60000 AS window_start, tms AS first_tms,
         event_id, event_type,
         row_number() OVER (PARTITION BY user_id, tms // 60000
                            ORDER BY tms, event_id) AS rn
  FROM e)
SELECT user_id, window_start, first_tms, event_id, event_type
FROM w WHERE rn = 1
"""


SHUFFLE_RANGES = 32


def q_epoch_shuffle_order(sf_dir: str):
    """Deterministic global training shuffle: every doc's position in a
    reproducible pseudo-random epoch order (rank of the seedless LCG
    sample key over doc_id, ties on doc_id) — the 'shuffle the corpus
    each epoch' step of a training pipeline, made parallelism-invariant
    where a seeded random_shuffle is not.  Scale shape: DISTRIBUTED
    RANKING by key-range scan-with-carry (the sibling of
    pack_contexts's prefix sum, with weight 1): the LCG key is uniform
    on [0, 2^31) so fixed key ranges are balanced; per-range counts →
    tiny driver exclusive scan → each range partition sorts locally and
    adds its carry.  Only 24-byte (doc_id, key) rows move — this is
    what ds.sort does under the hood, expressed so the rank itself is
    the output."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    span = _LCG_M // SHUFFLE_RANGES

    def key_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        sk = _sample_key(ids)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "sk": pa.array(sk, pa.int64()),
            "rng": pa.array(sk // span, pa.int64()),
        })

    keyed = ds.map_batches(key_partial, batch_format="pyarrow").materialize()

    def count_partial(batch: pa.Table) -> pd.DataFrame:
        rng = batch["rng"].to_numpy()
        u, c = np.unique(rng, return_counts=True)
        return pd.DataFrame({"rng": u.astype(np.int64),
                             "n": c.astype(np.int64)})

    totals = (keyed.map_batches(count_partial, batch_format="pyarrow")
              .to_pandas().groupby("rng", sort=True)["n"].sum())
    rngs = totals.index.to_numpy(np.int64)
    offs = np.zeros(len(rngs), np.int64)
    np.cumsum(totals.to_numpy(np.int64)[:-1], out=offs[1:])

    def rank_sweep(t: pa.Table, rngs: np.ndarray, offs: np.ndarray) -> pd.DataFrame:
        df = t.to_pandas().sort_values(["rng", "sk", "doc_id"], kind="stable")
        rng = df["rng"].to_numpy()
        local = np.arange(len(df), dtype=np.int64)
        starts = np.flatnonzero(np.diff(rng, prepend=rng[0] - 1))
        base = np.repeat(local[starts], np.diff(np.append(starts, len(rng))))
        pos = offs[np.searchsorted(rngs, rng)] + (local - base)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "shuffle_pos": pos})

    return grouped_map(keyed, ["rng"], rank_sweep,
                       fn_kwargs={"rngs": rngs, "offs": offs})


SQL_EPOCH_SHUFFLE_ORDER = f"""
SELECT doc_id,
       row_number() OVER (
         ORDER BY (((doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M})
                   * {_LCG_A} + {_LCG_C}) % {_LCG_M}, doc_id) - 1
         AS shuffle_pos
FROM documents
"""


GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 30, 10_000
GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "be", "that", "have")


def q_gopher_rules(sf_dir: str):
    """Gopher quality-rule bundle (Rae et al. 2021 §A1.1, public
    method): per-doc pass/fail flags for the document-level heuristics —
    word count in [30, 10k] (min scaled to the fixture's 10-99-word
    docs), mean word length in [3, 10], symbol-to-word ratio ('#' or
    '...') ≤ 0.1, ≥ 80% of words contain an alphabetic character, and
    ≥ 2 distinct stopwords present.  Every ratio test is the
    cross-multiplied INTEGER comparison (3·n_words > n_nonspace etc.),
    so flags are int-exact; every rule input count is also emitted so
    the oracle pins the arithmetic even where a flag is constant on the
    fixture.  Scale shape: single stateless map_batches pass, polars
    regex kernels + one reduceat per doc; stopword membership via an
    8-bit presence mask OR-reduced per doc.  Embarrassingly parallel —
    no exchange at all."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    stop_index = pd.Index(list(GOPHER_STOPWORDS))

    def feats(batch: pa.Table) -> pa.Table:
        pl = fp._polars()
        s = pl.Series(batch["text"].combine_chunks().cast(pa.large_string()))
        lists = s.str.extract_all(r"\S+")
        n_words = lists.list.len().to_numpy().astype(np.int64)
        n_ns = s.str.count_matches(r"\S").to_numpy().astype(np.int64)
        n_sym = s.str.count_matches(r"#|\.\.\.").to_numpy().astype(np.int64)
        flat = lists.explode().drop_nulls()
        alpha = flat.str.contains("[A-Za-z]").to_numpy().astype(np.int64)
        stop_idx = stop_index.get_indexer(flat.to_pandas())
        bits = np.where(stop_idx >= 0,
                        np.left_shift(1, np.clip(stop_idx, 0, None)),
                        0).astype(np.int64)
        n_alpha = np.zeros(len(n_words), np.int64)
        mask = np.zeros(len(n_words), np.int64)
        nz = n_words > 0
        if nz.any():
            offsets = np.zeros(int(nz.sum()), np.int64)
            np.cumsum(n_words[nz][:-1], out=offsets[1:])
            n_alpha[nz] = np.add.reduceat(alpha, offsets)
            mask[nz] = np.bitwise_or.reduceat(bits, offsets)
        n_stop = ((mask[:, None] >> np.arange(8)) & 1).sum(axis=1)
        f_words = ((n_words < GOPHER_MIN_WORDS)
                   | (n_words > GOPHER_MAX_WORDS)).astype(np.int64)
        f_mean = ((3 * n_words > n_ns) | (n_ns > 10 * n_words)).astype(np.int64)
        f_sym = (10 * n_sym > n_words).astype(np.int64)
        f_alpha = (10 * n_alpha < 8 * n_words).astype(np.int64)
        f_stop = (n_stop < 2).astype(np.int64)
        keep = 1 - np.maximum.reduce([f_words, f_mean, f_sym, f_alpha, f_stop])
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_nonspace": pa.array(n_ns, pa.int64()),
            "n_symbols": pa.array(n_sym, pa.int64()),
            "n_alpha_words": pa.array(n_alpha, pa.int64()),
            "n_stop_distinct": pa.array(n_stop.astype(np.int64), pa.int64()),
            "flag_words": pa.array(f_words, pa.int64()),
            "flag_mean_len": pa.array(f_mean, pa.int64()),
            "flag_symbol": pa.array(f_sym, pa.int64()),
            "flag_alpha": pa.array(f_alpha, pa.int64()),
            "flag_stop": pa.array(f_stop, pa.int64()),
            "keep": pa.array(keep, pa.int64()),
        })

    return ds.map_batches(feats, batch_format="pyarrow")


SQL_GOPHER_RULES = rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks,
         CAST(COALESCE(array_length(regexp_extract_all(text, '\S+')), 0)
              AS BIGINT) AS n_words,
         CAST(COALESCE(array_length(regexp_extract_all(text, '\S')), 0)
              AS BIGINT) AS n_nonspace,
         CAST(COALESCE(array_length(regexp_extract_all(text, '#|\.\.\.')), 0)
              AS BIGINT) AS n_symbols
  FROM documents),
f AS (
  SELECT doc_id, n_words, n_nonspace, n_symbols,
         CAST(COALESCE(array_length(
               list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))), 0)
              AS BIGINT) AS n_alpha_words,
         CAST(COALESCE(array_length(
               list_intersect(list_distinct(toks),
                 ['the', 'a', 'and', 'of', 'to', 'be', 'that', 'have'])), 0)
              AS BIGINT) AS n_stop_distinct
  FROM t),
g AS (
  SELECT *,
         CAST(n_words < {GOPHER_MIN_WORDS}
              OR n_words > {GOPHER_MAX_WORDS} AS BIGINT) AS flag_words,
         CAST(3 * n_words > n_nonspace
              OR n_nonspace > 10 * n_words AS BIGINT) AS flag_mean_len,
         CAST(10 * n_symbols > n_words AS BIGINT) AS flag_symbol,
         CAST(10 * n_alpha_words < 8 * n_words AS BIGINT) AS flag_alpha,
         CAST(n_stop_distinct < 2 AS BIGINT) AS flag_stop
  FROM f)
SELECT doc_id, n_words, n_nonspace, n_symbols, n_alpha_words,
       n_stop_distinct, flag_words, flag_mean_len, flag_symbol, flag_alpha,
       flag_stop,
       CAST(flag_words = 0 AND flag_mean_len = 0 AND flag_symbol = 0
            AND flag_alpha = 0 AND flag_stop = 0 AS BIGINT) AS keep
FROM g
"""


PACK_SHARDS = 8


def _next_fit_shard(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Next-fit packing of one shard's doc weights (already in doc_id
    order) into PACK_CTX-token bins: a doc that would overflow a
    NONEMPTY open bin closes it; a doc longer than PACK_CTX joins the
    (empty) open bin and every later doc sees that bin overflow, so it
    ends up alone with real-weight docs either side (lazy close — the
    property test pins the zero-weight and oversized edges against the
    doc-at-a-time loop).  Returns (bin_id, offset_in_bin) per doc.  The
    loop advances BIN-by-bin (searchsorted on the prefix sum —
    O(bins log n) scalar steps), not doc-by-doc; everything between is
    vectorized."""
    n = len(w)
    cum = np.cumsum(w)
    starts = [0]
    while True:
        s = starts[-1]
        base = cum[s - 1] if s else 0
        j = int(np.searchsorted(cum, base + PACK_CTX, side="right"))
        if j >= n:
            break
        if (cum[j - 1] if j else 0) == base:
            # overflow doc whose open bin has zero fill: it joins this
            # bin (which every later doc then sees as overflowing)
            j += 1
            if j >= n:
                break
        starts.append(j)
    starts_a = np.asarray(starts, np.int64)
    bin_id = np.searchsorted(starts_a, np.arange(n), side="right") - 1
    bin_base = np.where(starts_a > 0, cum[starts_a - 1], 0)[bin_id]
    offset = (cum - w) - bin_base
    return bin_id.astype(np.int64), offset.astype(np.int64)


def q_pack_greedy(sf_dir: str):
    """Boundary-respecting greedy packing (the SFT-style layout — docs
    never split across contexts, unlike ``pack_contexts``): within each
    of PACK_SHARDS independent streams (shard = doc_id % PACK_SHARDS),
    docs in doc_id order fill PACK_CTX-token bins next-fit.  Output per
    doc: (shard, bin, offset-in-bin, n_tokens).  Scale shape: shards
    pack independently — the fan-out knob — each resolved by one
    groupby(shard) partition sweep over 24-byte (doc_id, n_tokens) rows
    (text never enters the exchange); within a shard the greedy order
    is inherently sequential, which is WHY the shard axis exists.
    Iterative per-shard packing is not SQL-expressible; the driver gets
    the rows-only check plus ``pack_greedy_check``'s pinned zero."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_partial(batch: pa.Table) -> pa.Table:
        pl = fp._polars()
        s = pl.Series(batch["text"].combine_chunks().cast(pa.large_string()))
        ntok = s.str.extract_all(r"\S+").list.len().to_numpy().astype(np.int64)
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "shard": pa.array(ids % PACK_SHARDS, pa.int64()),
            "n_tokens": pa.array(ntok, pa.int64()),
        })

    def pack_sweep(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas().sort_values(["shard", "doc_id"], kind="stable")
        out = []
        for shard, g in df.groupby("shard", sort=False):
            bin_id, off = _next_fit_shard(g["n_tokens"].to_numpy())
            out.append(pd.DataFrame({
                "doc_id": g["doc_id"].to_numpy(),
                "shard": np.full(len(g), shard, np.int64),
                "bin_id": bin_id, "offset_tok": off,
                "n_tokens": g["n_tokens"].to_numpy(),
            }))
        return pd.concat(out, ignore_index=True)

    toks = ds.map_batches(tok_partial, batch_format="pyarrow")
    return grouped_map(toks, ["shard"], pack_sweep)


def _pack_greedy_reference(ids: np.ndarray, ntok: np.ndarray) -> pd.DataFrame:
    """Naive doc-at-a-time next-fit reference (independent of the
    searchsorted kernel): one python loop, one open bin per shard."""
    order = np.argsort(ids, kind="stable")
    fill: dict[int, int] = {}
    nbin: dict[int, int] = {}
    rows = []
    for i in order:
        d, w = int(ids[i]), int(ntok[i])
        s = d % PACK_SHARDS
        if s not in fill:
            fill[s], nbin[s] = 0, 0
        if fill[s] and fill[s] + w > PACK_CTX:  # lazy close: only a
            nbin[s] += 1                        # nonempty bin closes
            fill[s] = 0
        rows.append((d, s, nbin[s], fill[s], w))
        fill[s] += w
    return pd.DataFrame(rows, columns=["doc_id", "shard", "bin_id",
                                       "offset_tok", "n_tokens"])


def q_pack_greedy_check(sf_dir: str):
    """Driver-visible invariant: the distributed per-shard next-fit
    packing agrees row-exactly with the doc-at-a-time loop reference
    (shares no kernel with the engine path).  Oracle pins
    mismatch_rows = 0."""
    import pyarrow.parquet as pq

    eng = q_pack_greedy(sf_dir).to_pandas() \
        .sort_values(["doc_id"]).reset_index(drop=True)
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    pl = fp._polars()
    ntok = (pl.Series(tbl["text"].combine_chunks().cast(pa.large_string()))
            .str.extract_all(r"\S+").list.len().to_numpy().astype(np.int64))
    ref = _pack_greedy_reference(tbl["doc_id"].to_numpy(), ntok) \
        .sort_values(["doc_id"]).reset_index(drop=True)
    cols = ["doc_id", "shard", "bin_id", "offset_tok", "n_tokens"]
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng[cols].to_numpy() != ref[cols].to_numpy())
                   .any(axis=1).sum())
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64")})


# ---------------------------------------------------------------------------
# Round-4f: tumbling window join, Sorted-Neighborhood dedup, standalone
# distributed connected components
# ---------------------------------------------------------------------------

HOUR_MS = 3_600_000


def _window_join_combine(t: pa.Table) -> pd.DataFrame:
    """Final combine for the window join: sum the per-block partials,
    keep only (user, window) buckets where BOTH sides are present (inner
    window join), and emit the pair count — the size of the cross
    product the Flink window join would stream for that bucket."""
    df = t.to_pandas()
    g = (df.groupby(["user_id", "window_start"], sort=False)
         [["n_clicks", "n_purchases"]].sum().reset_index())
    g = g[(g["n_clicks"] > 0) & (g["n_purchases"] > 0)].reset_index(drop=True)
    g["n_pairs"] = (g["n_clicks"] * g["n_purchases"]).astype(np.int64)
    return g


def q_window_join(sf_dir: str):
    """Flink tumbling WINDOW JOIN (two streams equi-keyed and bucketed
    into the SAME 1-hour tumbling window; cf. Flink's `L JOIN R ON
    L.key = R.key AND L.window_start = R.window_start`): clicks vs
    purchases per (user_id, window).  Per-block partial counts inside
    map_batches mean the single hash exchange moves one narrow row per
    (key, window) per block; the join's cross product is COUNTED, never
    materialized — its size is the product of the side counts, which is
    the scale-safe way to surface a window join's output volume."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        tms = batch["ts"].cast(pa.int64()).to_numpy()[keep] // 1000
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy()[keep],
            "window_start": tumbling_window_start(tms, HOUR_MS),
            "n_clicks": (et[keep] == "click").astype(np.int64),
            "n_purchases": (et[keep] == "purchase").astype(np.int64),
        })
        return (df.groupby(["user_id", "window_start"], sort=False)
                .sum().reset_index())

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(parts, ["user_id", "window_start"], _window_join_combine)


SQL_WINDOW_JOIN = """
WITH w AS (
  SELECT user_id, (epoch_ms(ts) // 3600000) * 3600000 AS window_start, event_type
  FROM events WHERE event_type IN ('click', 'purchase')),
g AS (
  SELECT user_id, window_start,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nc,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
  FROM w GROUP BY 1, 2)
SELECT user_id, window_start,
       CAST(nc AS BIGINT) AS n_clicks, CAST(np AS BIGINT) AS n_purchases,
       CAST(nc * np AS BIGINT) AS n_pairs
FROM g WHERE nc > 0 AND np > 0
"""


SNM_PREFIX_SORT = 16   # chars of the SNM sort key
SNM_PREFIX_CMP = 32    # chars entering the Levenshtein confirm
SNM_WINDOW = 2         # neighbors ahead compared in sorted order
SNM_MAX_DIST = 6


def _snm_scan(t: pa.Table) -> pd.DataFrame:
    """One hash partition (all rows of its langs): Sorted Neighborhood
    scan — sort by (lang, 16-char prefix, doc_id), compare each doc to
    its next SNM_WINDOW neighbors (never crossing a lang boundary), and
    emit EVERY neighbor pair with its 32-char-prefix Levenshtein
    distance plus the dedup verdict (distance <= SNM_MAX_DIST) — so the
    oracle hash pins every DP output, not just the verdicts that pass.
    Vectorized: ONE lexsort, shifted-array neighbor masks, and the
    pair-axis-vectorized `levenshtein_batch` kernel."""
    df = t.to_pandas()
    pref = df["text"].str.slice(0, SNM_PREFIX_CMP).to_numpy()
    key = df["text"].str.slice(0, SNM_PREFIX_SORT).to_numpy()
    lang = df["lang"].to_numpy()
    ids = df["doc_id"].to_numpy().astype(np.int64)
    o = np.lexsort((ids, key, lang))
    ids, key, pref, lang = ids[o], key[o], pref[o], lang[o]
    out = []
    for k in range(1, SNM_WINDOW + 1):
        if len(ids) <= k:
            break
        same = lang[:-k] == lang[k:]
        a, b = ids[:-k][same], ids[k:][same]
        dist = dd.levenshtein_batch(pref[:-k][same], pref[k:][same],
                                    max_chars=SNM_PREFIX_CMP)
        out.append(pd.DataFrame({
            "lang": lang[:-k][same],
            "doc_a": np.minimum(a, b),
            "doc_b": np.maximum(a, b),
            "lev_dist": dist,
            "is_dup": (dist <= SNM_MAX_DIST).astype(np.int64),
        }))
    if not out:
        return pd.DataFrame({"lang": pd.array([], dtype=str),
                             "doc_a": pd.array([], dtype="int64"),
                             "doc_b": pd.array([], dtype="int64"),
                             "lev_dist": pd.array([], dtype="int64"),
                             "is_dup": pd.array([], dtype="int64")})
    return pd.concat(out, ignore_index=True)


def q_snm_dedup_pairs(sf_dir: str):
    """Sorted Neighborhood Method near-dup pass (Hernández & Stolfo,
    SIGMOD '95 — public algorithm): block on lang, sort each block by a
    16-char text prefix, slide a w=2 window over the sorted order, and
    CONFIRM neighbors by exact Levenshtein distance over the 32-char
    prefix.  One hash exchange (lang); the quadratic all-pairs space is
    never touched — each doc is compared to at most w sorted neighbors.
    At corpus scale the blocking key would be (lang, key-range bucket)
    so blocks parallelize past lang cardinality; the scan itself is
    order-local, so finer blocks only add w boundary comparisons each.
    Distance contract: code-point Levenshtein over the char-sliced
    prefix; DuckDB's `levenshtein` is byte-level, which coincides on
    this ASCII corpus (verified: the corpus has 0 multibyte rows)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return grouped_map(ds, ["lang"], _snm_scan)


SQL_SNM_DEDUP_PAIRS = """
WITH d AS (
  SELECT lang, doc_id, substr(text, 1, 16) AS k16, substr(text, 1, 32) AS k32
  FROM documents),
n AS (
  SELECT lang, doc_id, k32,
         lead(doc_id, 1) OVER w AS id1, lead(k32, 1) OVER w AS p1,
         lead(doc_id, 2) OVER w AS id2, lead(k32, 2) OVER w AS p2
  FROM d WINDOW w AS (PARTITION BY lang ORDER BY k16, doc_id)),
pairs AS (
  SELECT lang, doc_id AS a, id1 AS b, levenshtein(k32, p1) AS lev_dist
  FROM n WHERE id1 IS NOT NULL
  UNION ALL
  SELECT lang, doc_id, id2, levenshtein(k32, p2) FROM n WHERE id2 IS NOT NULL)
SELECT lang, LEAST(a, b) AS doc_a, GREATEST(a, b) AS doc_b,
       CAST(lev_dist AS BIGINT) AS lev_dist,
       CAST(CASE WHEN lev_dist <= 6 THEN 1 ELSE 0 END AS BIGINT) AS is_dup
FROM pairs
"""


def q_graph_components(sf_dir: str):
    """Standalone distributed connected components as a first-class
    query (the same hash-partitioned min-label propagation the dedup
    cluster builders use, `stages/dedup.py distributed_components`).
    Nodes are the residues doc_id % 128; edges are the stride-16 ring
    a -- (a+16) % 128, so each residue class mod 16 forms an 8-cycle:
    diameter 4 forces ~4 full propagation rounds, pinning the ITERATION
    loop (not just single-hop propagation) against the SQL oracle's
    recursive-CTE transitive closure."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def edges(batch: pa.Table) -> pd.DataFrame:
        a = (batch["doc_id"].to_numpy() % 128).astype(np.int64)
        b = (a + 16) % 128
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    e = ds.map_batches(edges, batch_format="pyarrow")
    # distinct-ify the edge list in one hash exchange so the iterative
    # loop sees each edge once, not once per source block
    e = grouped_map(e, ["a", "b"],
                    lambda t: t.to_pandas().drop_duplicates(["a", "b"]))
    return dd.distributed_components(e)


SQL_GRAPH_COMPONENTS = """
WITH RECURSIVE e AS (
  SELECT DISTINCT (doc_id % 128) AS a, ((doc_id % 128) + 16) % 128 AS b
  FROM documents),
sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
reach(n, m) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT s.a, r.m FROM sym s JOIN reach r ON r.n = s.b),
lab AS (SELECT n AS member_id, MIN(m) AS cluster_id FROM reach GROUP BY n),
sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id)
SELECT l.member_id, l.cluster_id, CAST(s.cluster_size AS BIGINT) AS cluster_size
FROM lab l JOIN sz s USING (cluster_id) WHERE s.cluster_size >= 2
"""


TDJ_BASE_MS = 788_918_400_000      # epoch_ms(DATE '1995-01-01')
TDJ_DAY_MS = 86_400_000
TDJ_SEGS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


def q_temporal_dim_join(sf_dir: str):
    """Flink temporal table join (`JOIN dim FOR SYSTEM_TIME AS OF
    fact.rowtime`): facts = orders, versioned dim = a deterministic
    per-customer segment CHANGELOG (three yearly versions, the market
    segment rotating one slot per version, valid_from staggered by
    c_custkey % 30 days).  Each order joins the version in effect at its
    order date; pre-first-version orders drop (inner temporal join).

    Shape: the changelog is the classic broadcast small side — built
    driver-side from the customer table, sorted ONCE by the packed
    (custkey << 44 | valid_from) key, shipped via ray.put; every fact
    batch resolves its version with ONE searchsorted probe, so the join
    has NO shuffle at all.  Scale contract: the dim must fit the worker
    heap (at 100M-row dims switch to the co-partitioned `asof_join`
    shape — same semantics, one hash exchange)."""
    import pyarrow.parquet as pq

    segs = np.array(TDJ_SEGS)
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    si = np.searchsorted(segs, cust["c_mktsegment"].to_numpy(zero_copy_only=False))
    d_ck = np.tile(ck, 3)
    d_v = np.repeat(np.arange(3, dtype=np.int64), len(ck))
    d_vf = TDJ_BASE_MS + (d_ck % 30) * TDJ_DAY_MS + d_v * 365 * TDJ_DAY_MS
    d_si = (np.tile(si, 3) + d_v) % 5
    SHIFT = np.int64(1) << np.int64(44)
    assert d_ck.max() < (1 << 19) and d_vf.max() < (1 << 44), \
        "packed temporal-join key overflow"
    o = np.argsort(d_ck * SHIFT + d_vf, kind="stable")
    dim_ref = ray.put({"key": (d_ck * SHIFT + d_vf)[o], "ck": d_ck[o],
                       "si": d_si[o], "v": d_v[o]})

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def probe(batch: pa.Table) -> pd.DataFrame:
        dim = ray.get(dim_ref)
        okey = batch["o_orderkey"].to_numpy()
        ock = batch["o_custkey"].to_numpy().astype(np.int64)
        oms = batch["o_orderdate"].cast(pa.int64()).to_numpy() // 1000
        pos = np.searchsorted(dim["key"], ock * SHIFT + oms, side="right") - 1
        safe = np.maximum(pos, 0)
        valid = (pos >= 0) & (dim["ck"][safe] == ock)
        pv = safe[valid]
        return pd.DataFrame({
            "o_orderkey": okey[valid],
            "o_custkey": ock[valid],
            "seg_at_order": segs[dim["si"][pv]],
            "dim_version": dim["v"][pv],
        })

    return ds.map_batches(probe, batch_format="pyarrow")


SQL_TEMPORAL_DIM_JOIN = """
WITH v AS (
  SELECT c_custkey,
         CAST(t.v AS BIGINT) AS dim_version,
         epoch_ms(DATE '1995-01-01')
           + ((c_custkey % 30) + t.v * 365) * 86400000 AS valid_from_ms,
         (['AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'])
           [1 + (CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1
                 WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3 ELSE 4 END
                 + t.v) % 5] AS seg
  FROM customer, unnest(generate_series(0, 2)) AS t(v)),
j AS (
  SELECT o.o_orderkey, o.o_custkey, v.seg, v.dim_version,
         ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
                            ORDER BY v.valid_from_ms DESC) AS rn
  FROM orders o JOIN v ON v.c_custkey = o.o_custkey
                      AND v.valid_from_ms <= epoch_ms(o.o_orderdate))
SELECT o_orderkey, o_custkey, seg AS seg_at_order, dim_version
FROM j WHERE rn = 1
"""


OVER_RANGE_MS = 600_000  # 10-min trailing RANGE frame


def _over_range_sweep(t: pa.Table) -> pd.DataFrame:
    """One hash partition (all rows of its users): per-ROW event-time
    OVER window — for every event, the count of same-user events in the
    trailing [ts - 10 min, ts] RANGE frame (peers at the same ts
    included, per SQL RANGE semantics).  Vectorized: the packed
    (user << 44 | ts) composite key makes every frame two global binary
    searches — no per-row or per-user loop."""
    df = t.to_pandas()
    tms = df["ts"].astype("datetime64[ms]").astype("int64").to_numpy()
    uid = df["user_id"].to_numpy().astype(np.int64)
    eid = df["event_id"].to_numpy().astype(np.int64)
    SHIFT = np.int64(1) << np.int64(44)
    if len(uid):
        assert uid.max() < (1 << 19) and tms.max() < (1 << 44), \
            "packed OVER-window key overflow: uid >= 2^19 or ts >= 2^44"
    key = uid * SHIFT + tms
    ks = np.sort(key)
    lo = np.searchsorted(ks, uid * SHIFT + (tms - OVER_RANGE_MS), side="left")
    hi = np.searchsorted(ks, key, side="right")
    return pd.DataFrame({"event_id": eid, "user_id": uid, "tms": tms,
                         "n_range": (hi - lo).astype(np.int64)})


def q_over_range_count(sf_dir: str):
    """Flink per-row OVER aggregation with an event-time RANGE frame
    (`COUNT(*) OVER (PARTITION BY key ORDER BY rowtime RANGE BETWEEN
    INTERVAL '10' MINUTE PRECEDING AND CURRENT ROW)`) — the per-ROW
    sibling of the per-WINDOW aggregates (tumbling_stats et al.): every
    input row gets its own trailing-frame result.  One hash exchange on
    user_id; each partition answers all its rows with one sort + two
    searchsorted passes."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return grouped_map(ds, ["user_id"], _over_range_sweep)


SQL_OVER_RANGE_COUNT = """
SELECT event_id, user_id, epoch_ms(ts) AS tms,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
            RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_range
FROM events
"""


def _jsonl_fixture_dir(sf_dir: str) -> str:
    """Build-once cache of the documents table as sharded JSONL — the
    log-bus ingest format (one JSON object per line, 4 shards)."""
    import json as _json

    import pyarrow.parquet as pq

    src_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_path)
    tag = (f"{os.path.basename(os.path.normpath(sf_dir)) or 'sf'}"
           f"-{st.st_size}-{int(st.st_mtime)}")
    root = os.path.join("/tmp", "ffr_jsonl", tag)
    done = os.path.join(root, "_DONE")
    if not os.path.exists(done):
        os.makedirs(root, exist_ok=True)
        tbl = pq.read_table(src_path, columns=["doc_id", "text", "source", "lang"])
        rows = tbl.to_pylist()
        shards: list[list[str]] = [[] for _ in range(4)]
        for r in rows:
            shards[int(r["doc_id"]) % 4].append(
                _json.dumps(r, ensure_ascii=False, sort_keys=True))
        for s, lines in enumerate(shards):
            with open(os.path.join(root, f"part-{s:02d}.jsonl"), "w") as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))
        with open(done, "w") as f:
            f.write(str(len(rows)))
    return root


def q_jsonl_ingest(sf_dir: str):
    """S1/S7 sibling on the READ side: sharded JSONL (the log-bus wire
    format) ingested with `ray.data.read_json`, then per-(source, lang)
    doc counts and round-tripped text lengths.  The SQL oracle computes
    the same aggregates straight from the parquet table, so the hash
    pins the JSON encode → read_json decode round trip (doc counts,
    ids, and every text's length must survive it)."""
    import glob as _glob

    root = _jsonl_fixture_dir(sf_dir)
    ds = ray.data.read_json(sorted(_glob.glob(os.path.join(root, "*.jsonl"))))

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "lang": batch["lang"].to_pandas(),
            "n_docs": np.ones(batch.num_rows, dtype=np.int64),
            "sum_chars": pc.utf8_length(batch["text"]).cast(pa.int64()).to_numpy(),
            "max_doc_id": batch["doc_id"].to_numpy().astype(np.int64),
        })
        return (df.groupby(["source", "lang"], sort=False)
                .agg({"n_docs": "sum", "sum_chars": "sum", "max_doc_id": "max"})
                .reset_index())

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(parts, ["source", "lang"], _combine_partials,
                       fn_kwargs={"keys": ["source", "lang"],
                                  "sums": ["n_docs", "sum_chars"],
                                  "maxs": ["max_doc_id"]})


SQL_JSONL_INGEST = """
SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM documents GROUP BY 1, 2
"""


def _host_rank_sweep(t: pa.Table) -> pd.DataFrame:
    """One hash partition (all rows of its hosts): per-host priority
    rank — sort by (host, doc_id), then rank = position within the
    host's contiguous run (ONE sort + run-boundary arithmetic,
    vectorized across every host in the partition)."""
    df = t.to_pandas().sort_values(["host", "doc_id"], kind="stable")
    host = df["host"].to_numpy()
    local = np.arange(len(df), dtype=np.int64)
    if len(df):
        starts = np.flatnonzero(
            np.concatenate(([True], host[1:] != host[:-1])))
        base = np.repeat(local[starts],
                         np.diff(np.append(starts, len(df))))
    else:
        base = local
    return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                         "host": host,
                         "host_rank": local - base})


def _frontier_pos_sweep(t: pa.Table, ranks: np.ndarray,
                        offs: np.ndarray) -> pd.DataFrame:
    """One round partition: global frontier position = the round's
    exclusive-scan offset + local index under (host, doc_id) order."""
    df = t.to_pandas().sort_values(["host_rank", "host", "doc_id"],
                                   kind="stable")
    hr = df["host_rank"].to_numpy()
    local = np.arange(len(df), dtype=np.int64)
    if len(df):
        starts = np.flatnonzero(np.diff(hr, prepend=hr[0] - 1))
        base = np.repeat(local[starts],
                         np.diff(np.append(starts, len(df))))
    else:
        base = local
    pos = offs[np.searchsorted(ranks, hr)] + (local - base)
    return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                         "host": df["host"].to_numpy(),
                         "host_rank": hr,
                         "frontier_pos": pos})


def q_host_frontier_order(sf_dir: str):
    """Polite crawl-frontier scheduling (Mercator-style per-host queues
    with round-robin host interleave — public crawler design): every URL
    gets its global fetch position where hosts take turns and each host
    serves its URLs in priority (doc_id) order — round k holds every
    host's k-th URL.  Two narrow exchanges: (1) per-host ranking
    (groupby host, one local sort per partition), (2) DISTRIBUTED
    RANKING over rounds — per-round counts, a tiny driver exclusive
    scan, then per-round local sort + carry (the scan-with-carry idiom
    of `epoch_shuffle_order`; round populations are monotone
    non-increasing, so round partitions stay balanced)."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def hostify(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy().astype(np.int64),
            "host": batch["source"].to_pandas().astype(str) + ".example.com",
        })

    ranked = grouped_map(ds.map_batches(hostify, batch_format="pyarrow"),
                         ["host"], _host_rank_sweep).materialize()

    def count_partial(batch: pa.Table) -> pd.DataFrame:
        u, c = np.unique(batch["host_rank"].to_numpy(), return_counts=True)
        return pd.DataFrame({"host_rank": u.astype(np.int64),
                             "n": c.astype(np.int64)})

    totals = (ranked.map_batches(count_partial, batch_format="pyarrow")
              .to_pandas().groupby("host_rank", sort=True)["n"].sum())
    ranks = totals.index.to_numpy(np.int64)
    offs = np.zeros(len(ranks), np.int64)
    np.cumsum(totals.to_numpy(np.int64)[:-1], out=offs[1:])

    return grouped_map(ranked, ["host_rank"], _frontier_pos_sweep,
                       fn_kwargs={"ranks": ranks, "offs": offs})


SQL_HOST_FRONTIER_ORDER = """
WITH r AS (
  SELECT doc_id, source || '.example.com' AS host,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
           AS host_rank
  FROM documents)
SELECT doc_id, host, CAST(host_rank AS BIGINT) AS host_rank,
       CAST(row_number() OVER (ORDER BY host_rank, host, doc_id) - 1
            AS BIGINT) AS frontier_pos
FROM r
"""


# ---------------------------------------------------------------------------
# Sitemap (sitemaps.org) frontier seeding
# ---------------------------------------------------------------------------

def q_sitemap_frontier(sf_dir: str):
    """Sitemap-protocol frontier seeding end-to-end: per-host fetched
    sitemap files — a ``<sitemapindex>`` plus two ``<urlset>`` children
    (one plain with a default namespace, one GZIPPED with a prefixed
    namespace, both legal per the protocol) — are parsed by the
    stdlib-only sitemaps.org parser (``functions/sitemap.py``) in an
    embarrassingly-parallel ``map_batches`` stage (per-file parse, no
    state, no shuffle) and exploded into frontier URL rows with
    normalized ``lastmod`` epoch-ms, ``changefreq`` and micro-scaled
    ``priority`` recrawl hints.  Exercises W3C date-only AND full
    datetime lastmods, entity-escaped query strings, and absent
    optional fields (sentinels ``'none'`` / ``-1``).  The SQL oracle
    re-derives every row from the synthesis arithmetic — the XML
    parser, gzip sniff and datetime normalization must reproduce them
    exactly.  (Reference analog: the per-source metadata ingest around
    ``src/data_input/process_odr.py``.)"""
    from datetime import date, timedelta

    import pyarrow.parquet as pq

    from ..functions.sitemap import (
        build_sitemapindex,
        build_urlset,
        parse_sitemap,
    )

    srcs = sorted(set(pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                                    columns=["source"])["source"].to_pylist()))
    base = date(2024, 1, 1)
    hosts, payloads = [], []
    for s in srcs:
        n = int(s[3:])
        host = f"www.{s}.example.com"
        hosts.append(host)
        payloads.append(build_sitemapindex(
            [f"https://{host}/sitemap-0.xml", f"https://{host}/sitemap-1.xml.gz"],
            ["2024-02-01", None]))
        for j in (0, 1):
            urls = []
            for k in range(n % 5 + 3):
                d = base + timedelta(days=n * 7 + j * 3 + k)
                lastmod = (d.isoformat() if k % 2 == 0
                           else d.isoformat() + "T12:30:00Z")
                urls.append({
                    "loc": (f"https://{host}/s{j}/page{k}.html"
                            + ("?a=1&b=2" if k % 4 == 1 else "")),
                    "lastmod": lastmod,
                    "changefreq": (None if k % 3 == 0 else
                                   ("daily", "weekly", "monthly",
                                    "yearly")[(n + k) % 4]),
                    "priority": None if k % 3 == 0 else ((k % 9) + 1) / 10,
                })
            hosts.append(host)
            payloads.append(build_urlset(urls, gzip_out=(j == 1),
                                         ns_prefix=(j == 1)))

    ds = ray.data.from_arrow(pa.table({
        "host": pa.array(hosts), "payload": pa.array(payloads, pa.binary())}))

    class SitemapParse:
        """Stateless per-file parse; index files contribute no URL rows
        (their children are fetched separately, as a crawler would)."""

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_host, out_url, out_lm, out_cf, out_pr = [], [], [], [], []
            for host, payload in zip(batch["host"].to_pylist(),
                                     batch["payload"].to_pylist()):
                parsed = parse_sitemap(payload)
                if parsed["kind"] != "urlset":
                    continue
                for e in parsed["entries"]:
                    out_host.append(host)
                    out_url.append(e["loc"])
                    out_lm.append(-1 if e["lastmod_ms"] is None
                                  else e["lastmod_ms"])
                    out_cf.append(e["changefreq"] or "none")
                    out_pr.append(-1 if e["priority"] is None
                                  else int(round(e["priority"] * 1_000_000)))
            return pa.table({
                "host": pa.array(out_host, pa.string()),
                "url": pa.array(out_url, pa.string()),
                "lastmod_ms": pa.array(out_lm, pa.int64()),
                "changefreq": pa.array(out_cf, pa.string()),
                "priority_micros": pa.array(out_pr, pa.int64()),
            })

    return ds.map_batches(SitemapParse, concurrency=2,
                          batch_format="pyarrow")


SQL_SITEMAP_FRONTIER = """
WITH s AS (
  SELECT DISTINCT source, CAST(substr(source, 4) AS INT) AS n
  FROM documents),
u AS (
  SELECT s.source, s.n, j.range AS j, k.range AS k
  FROM s, range(2) j, range(8) k
  WHERE k.range < s.n % 5 + 3)
SELECT 'www.' || source || '.example.com' AS host,
       'https://www.' || source || '.example.com/s' || j || '/page' || k
         || '.html' || CASE WHEN k % 4 = 1 THEN '?a=1&b=2' ELSE '' END AS url,
       epoch_ms(CAST(DATE '2024-01-01'
                     + CAST(n * 7 + j * 3 + k AS INT) * INTERVAL 1 DAY
                     AS TIMESTAMP))
         + CASE WHEN k % 2 = 0 THEN 0 ELSE 45000000 END AS lastmod_ms,
       CASE WHEN k % 3 = 0 THEN 'none'
            ELSE CASE (n + k) % 4 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
                                  WHEN 2 THEN 'monthly' ELSE 'yearly' END
       END AS changefreq,
       CAST(CASE WHEN k % 3 = 0 THEN -1
                 ELSE ((k % 9) + 1) * 100000 END AS BIGINT) AS priority_micros
FROM u
"""


BM25_TERMS = ("window", "join", "hash", "stream")


def q_bm25_scores(sf_dir: str):
    """Okapi BM25 scoring (Robertson & Spärck Jones lineage, public
    method; k1 = 1.2, b = 0.75) of a fixed query-term set over the
    corpus — the IR ranking staple beside `tfidf_top_term`.  INT-EXACT:
    with k1 = 6/5 and b = 3/4 the whole tf-normalization is the
    rational  22·tf·L / (10·tf·L + 3·L + 9·dl·N)  (L = corpus token
    count, dl = doc length, N = docs), so
    bm25_micros = idf_micros·22·tf·L // (10·tf·L + 3·L + 9·dl·N)
    is one integer division both sides; only idf (a handful of scalars,
    one ln per term) goes through the floor-micros float policy.

    Scale shape: ONE tokenize pass emits (doc, term, tf, dl) rows for
    tf > 0 PLUS a per-block (n_docs, sum_dl) summary row — corpus text
    never crosses the exchange, and the materialized narrow rows feed
    both the tiny df/L/N reduction and the final stateless scoring map.
    Int64 headroom: idf_micros·22·tf·L < 2^63 up to ~10^10 corpus
    tokens per partition-scope; beyond that, scale scores per-shard."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    terms = np.array(BM25_TERMS)

    def tf_partial(batch: pa.Table) -> pd.DataFrame:
        pl = fp._polars()
        s = (pl.Series(batch["text"].combine_chunks().cast(pa.large_string()))
             .str.to_lowercase())
        lists = s.str.extract_all(r"\S+")
        dl = lists.list.len().to_numpy().astype(np.int64)
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        out = [pd.DataFrame({"doc_id": [-1], "term": [""],
                             "tf": [len(ids)], "dl": [int(dl.sum())]})]
        for term in BM25_TERMS:
            tf = lists.list.count_matches(term).to_numpy().astype(np.int64)
            hit = tf > 0
            out.append(pd.DataFrame({"doc_id": ids[hit], "term": term,
                                     "tf": tf[hit], "dl": dl[hit]}))
        return pd.concat(out, ignore_index=True)

    keyed = ds.map_batches(tf_partial, batch_format="pyarrow").materialize()

    def stat_partial(batch: pa.Table) -> pd.DataFrame:
        # per-block: one row per term (its df partial) + the '' summary
        df = batch.to_pandas()
        g = df.groupby("term", sort=False).agg(
            df_n=("doc_id", "size"), tf_s=("tf", "sum"), dl_s=("dl", "sum"))
        return g.reset_index()

    stats = (keyed.map_batches(stat_partial, batch_format="pyarrow")
             .to_pandas().groupby("term", sort=True).sum())
    n_docs = int(stats.loc["", "tf_s"]) if "" in stats.index else 0
    L = int(stats.loc["", "dl_s"]) if "" in stats.index else 0
    df_arr = (stats["df_n"].reindex(terms, fill_value=0)
              .to_numpy(np.int64))
    idf_micros = np.floor(np.log((n_docs - df_arr + 0.5) / (df_arr + 0.5) + 1.0)
                          * 1e6 + 0.5).astype(np.int64)
    order = np.argsort(terms)

    def score(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["doc_id"] >= 0]
        ti = order[np.searchsorted(terms[order], df["term"].to_numpy())]
        tf = df["tf"].to_numpy(np.int64)
        dl = df["dl"].to_numpy(np.int64)
        num = idf_micros[ti] * 22 * tf * L
        den = 10 * tf * L + 3 * L + 9 * dl * n_docs
        return pd.DataFrame({"term": df["term"].to_numpy(),
                             "doc_id": df["doc_id"].to_numpy(np.int64),
                             "tf": tf, "bm25_micros": num // den})

    return keyed.map_batches(score, batch_format="pyarrow")


SQL_BM25_SCORES = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
  FROM documents),
d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
      FROM tok WHERE w <> '' GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
l AS (SELECT CAST(SUM(dl) AS BIGINT) AS big_l FROM d),
tf AS (SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM tok WHERE w IN ('window', 'join', 'hash', 'stream')
       GROUP BY 1, 2),
idf AS (SELECT term,
               CAST(floor(ln((n.n_docs - f.df + 0.5) / (f.df + 0.5) + 1)
                          * 1000000 + 0.5) AS BIGINT) AS idf_micros
        FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1) f, n)
SELECT tf.term, tf.doc_id, tf.tf,
       CAST((idf.idf_micros * 22 * tf.tf * l.big_l)
            // (10 * tf.tf * l.big_l + 3 * l.big_l + 9 * d.dl * n.n_docs)
            AS BIGINT) AS bm25_micros
FROM tf
JOIN idf USING (term) JOIN d USING (doc_id), n, l
"""


def q_grouping_sets_revenue(sf_dir: str):
    """GROUP BY GROUPING SETS shape (the third member of the Flink SQL
    multi-set family beside `rollup_revenue` / `cube_revenue`): the two
    1-D sets ((segment), (priority)) plus the GROUPING() id column that
    tells rows from different sets apart.  Same one-scan plan as the
    rollup — broadcast segment lookup + per-block partials on the fine
    (segment, priority) grid, one tiny exchange, then each requested set
    re-aggregates the ~25-cell grid on the driver.  At 100 TB the scan
    and the partial pass dominate; adding sets costs nothing."""
    lookup_ref = _segment_lookup_ref(sf_dir)
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderpriority"])

    def probe(batch: pa.Table) -> pd.DataFrame:
        seg = _probe_segment(ray.get(lookup_ref),
                             batch["o_custkey"].to_numpy().astype(np.int64))
        df = pd.DataFrame({"c_mktsegment": seg,
                           "o_orderpriority": batch["o_orderpriority"].to_pandas(),
                           "cents": _cents(batch["o_totalprice"].to_numpy())})
        g = df.groupby(["c_mktsegment", "o_orderpriority"], sort=False)["cents"]
        return g.agg(n_orders="size", revenue_cents="sum").reset_index()

    parts = ds.map_batches(probe, batch_format="pyarrow")
    fine = grouped_map(parts, ["c_mktsegment", "o_orderpriority"], _combine_partials,
                       fn_kwargs={"keys": ["c_mktsegment", "o_orderpriority"],
                                  "sums": ["n_orders", "revenue_cents"]}).to_pandas()
    # GROUPING(seg, pri): MSB = first argument; bit set = column rolled up
    by_seg = (fine.groupby("c_mktsegment", sort=False)
              .agg(n_orders=("n_orders", "sum"),
                   revenue_cents=("revenue_cents", "sum"))
              .reset_index().assign(o_orderpriority="ALL", gid=np.int64(1)))
    by_pri = (fine.groupby("o_orderpriority", sort=False)
              .agg(n_orders=("n_orders", "sum"),
                   revenue_cents=("revenue_cents", "sum"))
              .reset_index().assign(c_mktsegment="ALL", gid=np.int64(2)))
    cols = ["c_mktsegment", "o_orderpriority", "gid", "n_orders", "revenue_cents"]
    return pd.concat([by_seg[cols], by_pri[cols]], ignore_index=True)


SQL_GROUPING_SETS_REVENUE = """
SELECT COALESCE(c.c_mktsegment, 'ALL') AS c_mktsegment,
       COALESCE(o.o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(GROUPING(c.c_mktsegment, o.o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY GROUPING SETS ((c.c_mktsegment), (o.o_orderpriority))
"""


def _rank_sweep(t: pa.Table) -> pd.DataFrame:
    """Per-partition rank sweep: all suppliers of a nation are
    co-located, so dense_rank / percent_rank are exact here — pandas
    C-level rank kernels, no per-group dispatch."""
    df = t.to_pandas()
    g = df.groupby("s_nationkey", sort=False)["bal_cents"]
    df["drank"] = g.rank(method="dense").astype(np.int64)
    min_rank = g.rank(method="min").to_numpy()
    n = g.transform("size").to_numpy()
    pr = np.where(n > 1, (min_rank - 1.0) / np.maximum(n - 1.0, 1.0), 0.0)
    df["prank_micros"] = _micros(pr)
    return df[["s_nationkey", "s_suppkey", "bal_cents", "drank", "prank_micros"]]


def q_dense_rank_balance(sf_dir: str):
    """dense_rank + percent_rank window functions (the OVER-clause rank
    family beside `ntile_acctbal` / `top_docs_per_lang`): per-nation
    supplier ranking by account balance.  ONE exchange on the partition
    key co-locates each nation; ranks are per-partition pandas rank
    kernels.  percent_rank = (rank-1)/(n-1) floor-scaled to micros the
    same way on both sides (n = 1 groups pin 0, per SQL semantics)."""
    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "s_nationkey": batch["s_nationkey"].to_numpy().astype(np.int64),
            "s_suppkey": batch["s_suppkey"].to_numpy().astype(np.int64),
            "bal_cents": _cents(batch["s_acctbal"].to_numpy()),
        })

    parts = ds.map_batches(prep, batch_format="pyarrow")
    return grouped_map(parts, ["s_nationkey"], _rank_sweep)


SQL_DENSE_RANK_BALANCE = """
WITH s AS (SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, s_suppkey,
                  CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
           FROM supplier)
SELECT s_nationkey, s_suppkey, bal_cents,
       CAST(dense_rank() OVER (PARTITION BY s_nationkey ORDER BY bal_cents)
            AS BIGINT) AS drank,
       CAST(floor(percent_rank() OVER (PARTITION BY s_nationkey ORDER BY bal_cents)
                  * 1000000 + 0.5) AS BIGINT) AS prank_micros
FROM s
"""


def q_host_boilerplate_rate(sf_dir: str):
    """Per-host boilerplate share (the FineWeb/CC site-level quality
    signal): fraction of a host's 5-word chunks that also appear in >= 2
    distinct documents corpus-wide — high shares mark template/mirror
    farms worth down-weighting at the frontier.  Reuses the span-dedup
    exchange (`chunk_dedup_stats`): chunk rows hash-exchange once, per-doc
    partials map to the doc's host, and a host-sized second exchange
    combines.  The ratio is integer ppm (n_shared·10^6 // n_chunks) so
    both sides divide identically."""
    from ..stages import textops as tx

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    chunks = ds.map_batches(tx.doc_word_chunks, batch_format="pyarrow")
    partials = grouped_map(chunks, ["chunk"], _chunk_share_sweep)
    # combine the per-(doc, chunk-partition) partials to ONE row per doc
    # before host mapping — n_docs must count distinct docs, not partials
    per_doc = grouped_map(partials, ["doc_id"], _combine_partials,
                          fn_kwargs={"keys": ["doc_id"],
                                     "sums": ["n_chunks", "n_shared"]})

    def to_host(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ids = df["doc_id"].to_numpy().astype(np.int64)
        df["key_host"] = "h" + pd.Series(ids % 20).astype(str) + ".example.com"
        df["n_docs"] = np.int64(1)
        return df[["key_host", "n_docs", "n_chunks", "n_shared"]]

    hosts = per_doc.map_batches(to_host, batch_format="pyarrow")
    final = grouped_map(hosts, ["key_host"], _combine_partials,
                        fn_kwargs={"keys": ["key_host"],
                                   "sums": ["n_docs", "n_chunks", "n_shared"]})

    def finish(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        nc = df["n_chunks"].to_numpy(np.int64)
        ns = df["n_shared"].to_numpy(np.int64)
        df["shared_ppm"] = np.where(nc > 0, ns * 1_000_000 // np.maximum(nc, 1), 0)
        return df.astype({"n_docs": "int64", "n_chunks": "int64",
                          "n_shared": "int64", "shared_ppm": "int64"})

    return final.map_batches(finish, batch_format="pyarrow")


SQL_HOST_BOILERPLATE_RATE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
c AS (SELECT doc_id, array_to_string(s[(5*i+1):(5*i+5)], ' ') AS chunk
      FROM w, LATERAL (SELECT unnest(generate_series(0, CAST(len(s) // 5 AS INT) - 1)) AS i) g(i)),
sh AS (SELECT chunk FROM c GROUP BY chunk HAVING COUNT(DISTINCT doc_id) >= 2),
per_doc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
                   CAST(SUM(CASE WHEN chunk IN (SELECT chunk FROM sh)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
            FROM c GROUP BY doc_id)
SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS key_host,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
       CAST(SUM(n_shared) AS BIGINT) AS n_shared,
       CAST(CASE WHEN SUM(n_chunks) > 0
            THEN SUM(n_shared) * 1000000 // SUM(n_chunks) ELSE 0 END
            AS BIGINT) AS shared_ppm
FROM per_doc GROUP BY 1
"""


def _dynamic_session_sweep(t: pa.Table) -> pd.DataFrame:
    """Per-partition dynamic-gap sessionize: key-blocked sort, then the
    shared per-element-gap kernel (stages/windows.py) — one vectorized
    cummax per key, no per-group dispatch."""
    from ..stages.windows import dynamic_session_segments

    df = (t.to_pandas()
          .sort_values(["user_id", "tms", "event_id"], kind="stable")
          .reset_index(drop=True))
    uid = df["user_id"].to_numpy(np.int64)
    tms = df["tms"].to_numpy(np.int64)
    gap = df["gap"].to_numpy(np.int64)
    kc = np.ones(len(df), dtype=bool)
    kc[1:] = uid[1:] != uid[:-1]
    new_seg, running = dynamic_session_segments(tms, gap, kc)
    starts = np.flatnonzero(new_seg)
    ends = np.append(starts[1:], len(df))
    return pd.DataFrame({
        "user_id": uid[starts],
        "session_start": tms[starts],
        "session_end": running[ends - 1],
        "n_events": (ends - starts).astype(np.int64),
    })


def q_session_windows_dynamic(sf_dir: str):
    """Dynamic per-ELEMENT session gap (Flink's
    SessionWindowTimeGapExtractor, the batch twin of the streaming
    `session_gap_by_lang` path): an 'error' event holds its session open
    for 60 min, any other event for 30 min — session end is the running
    max(ts + gap(element)), so a single error stretches the window past
    later short-gap events.  ONE exchange on user_id; the per-partition
    sweep is the shared vectorized kernel.  session_end includes the gap
    (unlike `session_windows`, which reports last-event time)."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_id", "event_type"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        et = np.asarray(batch["event_type"], dtype=object)
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "event_id": batch["event_id"].to_numpy(),
            "tms": batch["ts"].cast(pa.int64()).to_numpy() // 1000,  # us -> ms
            "gap": np.where(et == "error", 3_600_000, 1_800_000).astype(np.int64),
        })

    parts = ds.map_batches(prep, batch_format="pyarrow")
    return grouped_map(parts, ["user_id"], _dynamic_session_sweep)


SQL_SESSION_WINDOWS_DYNAMIC = """
WITH s AS (
  SELECT user_id, event_id, epoch_ms(ts) AS tms,
         CASE WHEN event_type = 'error' THEN 3600000 ELSE 1800000 END AS gap
  FROM events
), r AS (
  SELECT user_id, event_id, tms,
         MAX(tms + gap) OVER (PARTITION BY user_id ORDER BY tms, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_end
  FROM s
), o AS (
  SELECT user_id, event_id, tms, run_end,
         CASE WHEN tms > lag(run_end) OVER (PARTITION BY user_id
                                            ORDER BY tms, event_id)
              THEN 1 ELSE 0 END AS brk
  FROM r
), g AS (
  SELECT user_id, tms, run_end,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY tms, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, MIN(tms) AS session_start, MAX(run_end) AS session_end,
       COUNT(*) AS n_events
FROM g GROUP BY user_id, sid
"""


def _keep_last_sweep(t: pa.Table) -> pd.DataFrame:
    """Per-partition keep-last: stable sort by (key, ts, id) then take
    each key's final row — one vectorized drop_duplicates, no dispatch."""
    df = (t.to_pandas()
          .sort_values(["user_id", "tms", "event_id"], kind="stable")
          .drop_duplicates("user_id", keep="last"))
    return df[["user_id", "event_id", "event_type", "tms"]].reset_index(drop=True)


def q_dedup_keep_last(sf_dir: str):
    """Flink streaming-dedup keep-LAST mode (ROW_NUMBER ... ORDER BY ts
    DESC = 1; `window_dedup_first` covers keep-first): per user, the
    latest event wins.  ONE exchange on the dedup key; the sweep is a
    stable sort + drop_duplicates(keep='last') per partition.  This is
    the upsert-source compaction primitive — at 100 TB only the winning
    row per key survives the exchange's partition."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "event_id": batch["event_id"].to_numpy(),
            "event_type": batch["event_type"].to_pandas(),
            "tms": batch["ts"].cast(pa.int64()).to_numpy() // 1000,  # us -> ms
        })

    parts = ds.map_batches(prep, batch_format="pyarrow")
    return grouped_map(parts, ["user_id"], _keep_last_sweep)


SQL_DEDUP_KEEP_LAST = """
SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


def _recip_pair_sweep(t: pa.Table) -> pd.DataFrame:
    """Per canonical-pair partition: both directions of a pair are
    co-located, so the global distinct AND reciprocity are decided
    locally — emit one (src, rec) row per distinct directed edge."""
    df = t.to_pandas().drop_duplicates().reset_index(drop=True)
    g = df.groupby(["lo", "hi"], sort=False)["dir"].transform("nunique")
    df["rec"] = (g >= 2).astype(np.int64)
    src = np.where(df["dir"].to_numpy() == 0,
                   df["lo"].to_numpy(), df["hi"].to_numpy())
    return pd.DataFrame({"src": src.astype(np.int64),
                         "rec": df["rec"].to_numpy(np.int64),
                         "n": np.int64(1)})


def q_link_reciprocity(sf_dir: str):
    """Directed-graph link reciprocity (the web-graph health metric
    beside PageRank/HITS/components): per node, the share of its
    out-links that are reciprocated.  Edges are the deterministic
    doc_id-derived directed graph (same family as `graph_components`'
    ring edges, so the SQL oracle re-derives them exactly).  Scale
    shape: ONE exchange on the canonical (lo, hi) pair key co-locates
    both directions — mutuality is decided partition-locally — then a
    node-sized second exchange counts; only 24-byte int rows move."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def edges(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        src = ids % 40
        dst = (ids * 7 + 3) % 40
        keep = src != dst
        src, dst = src[keep], dst[keep]
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        return (pd.DataFrame({"lo": lo, "hi": hi,
                              "dir": (src > dst).astype(np.int64)})
                .drop_duplicates())  # distinct directed edges per block

    per_edge = grouped_map(ds.map_batches(edges, batch_format="pyarrow"),
                           ["lo", "hi"], _recip_pair_sweep)
    final = grouped_map(per_edge, ["src"], _combine_partials,
                        fn_kwargs={"keys": ["src"], "sums": ["n", "rec"]})

    def finish(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        n = df["n"].to_numpy(np.int64)
        r = df["rec"].to_numpy(np.int64)
        return pd.DataFrame({"src": df["src"].to_numpy(np.int64),
                             "out_deg": n, "n_recip": r,
                             "recip_ppm": r * 1_000_000 // np.maximum(n, 1)})

    return final.map_batches(finish, batch_format="pyarrow")


SQL_LINK_RECIPROCITY = """
WITH e AS (SELECT DISTINCT doc_id % 40 AS src, (doc_id * 7 + 3) % 40 AS dst
           FROM documents WHERE doc_id % 40 <> (doc_id * 7 + 3) % 40)
SELECT CAST(e.src AS BIGINT) AS src,
       COUNT(*) AS out_deg,
       CAST(SUM(CASE WHEN x.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_recip,
       CAST(SUM(CASE WHEN x.src IS NOT NULL THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS recip_ppm
FROM e LEFT JOIN e x ON x.src = e.dst AND x.dst = e.src
GROUP BY e.src
"""


def _novelty_tri_sweep(t: pa.Table) -> pd.DataFrame:
    """Per trigram-partition: all (tri, doc) rows of a trigram are
    co-located, so the corpus-wide first carrier is exact here; emit
    per-doc partials (trigrams seen / trigrams first-seen-here)."""
    df = t.to_pandas()
    df["novel"] = (df.groupby("tri", sort=False)["doc_id"]
                   .transform("min") == df["doc_id"]).astype(np.int64)
    return (df.groupby("doc_id", sort=False)
            .agg(n_tri=("tri", "size"), n_novel=("novel", "sum"))
            .reset_index())


def q_ngram_novelty(sf_dir: str):
    """Per-document n-gram novelty (the training-data freshness signal:
    how much of a doc's content is first seen HERE, by doc_id order —
    low-novelty docs are rehashes worth down-weighting): for each doc,
    its count of distinct word trigrams and how many of them have
    corpus-wide MIN(doc_id) equal to this doc.  One tokenize pass emits
    distinct (tri, doc_id) rows (polars shift-over-doc, no Python row
    loop); one exchange on the trigram string decides first-carriers
    partition-locally; a doc-sized second exchange combines."""
    from ..functions.fingerprint import _polars

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tris(batch: pa.Table) -> pd.DataFrame:
        pl = _polars()
        df = pl.DataFrame({
            "doc_id": pl.Series(batch["doc_id"].to_numpy()),
            "w": pl.Series(batch["text"].combine_chunks()
                           .cast(pa.large_string())).str.split(" "),
        }).explode("w")
        out = (df.with_columns(
                   w1=pl.col("w").shift(-1).over("doc_id"),
                   w2=pl.col("w").shift(-2).over("doc_id"))
               .drop_nulls()
               .with_columns(tri=pl.col("w") + " " + pl.col("w1")
                             + " " + pl.col("w2"))
               .select("doc_id", "tri")
               .unique())
        return out.to_pandas()

    rows = ds.map_batches(tris, batch_format="pyarrow")
    parts = grouped_map(rows, ["tri"], _novelty_tri_sweep)
    final = grouped_map(parts, ["doc_id"], _combine_partials,
                        fn_kwargs={"keys": ["doc_id"],
                                   "sums": ["n_tri", "n_novel"]})

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_tri": batch["n_tri"].cast(pa.int64()),
            "n_novel": batch["n_novel"].cast(pa.int64()),
        })

    return final.map_batches(finish, batch_format="pyarrow")


SQL_NGRAM_NOVELTY = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
t AS (SELECT DISTINCT doc_id, array_to_string(s[(i+1):(i+3)], ' ') AS tri
      FROM w, LATERAL (SELECT unnest(generate_series(0, CAST(len(s) AS INT) - 3)) AS i) g(i)),
m AS (SELECT tri, MIN(doc_id) AS first_doc FROM t GROUP BY tri)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri,
       CAST(SUM(CASE WHEN m.first_doc = t.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel
FROM t JOIN m USING (tri) GROUP BY t.doc_id
"""


def _rows_frame_sweep(t: pa.Table) -> pd.DataFrame:
    """Per-partition ROWS-frame sweep: sort once, one global cumsum,
    per-row frame bounds clipped to the key segment — no per-group
    dispatch (the `_running_sweep` idiom with a bounded frame)."""
    df = (t.to_pandas()
          .sort_values(["user_id", "tms", "event_id"], kind="stable")
          .reset_index(drop=True))
    uid = df["user_id"].to_numpy(np.int64)
    cents = df["cents"].to_numpy(np.int64)
    n = len(df)
    cs = np.cumsum(cents)
    pos = np.arange(n, dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
    seg_start = np.repeat(starts, np.diff(np.r_[starts, n]))
    lo = np.maximum(pos - 2, seg_start)
    frame_n = pos - lo + 1
    frame_sum = cs - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
    df["frame_n"] = frame_n
    df["ma_cents"] = frame_sum // frame_n  # floor div, same as SQL //
    return df[["user_id", "event_id", "tms", "frame_n", "ma_cents"]]


def q_rows_moving_avg(sf_dir: str):
    """OVER aggregation with a ROWS frame (the bounded-frame sibling of
    `over_range_count`'s event-time RANGE frame — together they cover
    Flink's two OVER-window frame kinds): per user, the moving average
    of the last 3 events' values (2 PRECEDING + CURRENT, ordered by
    (ts, event_id)).  ONE exchange on user_id; the sweep is one global
    cumsum with per-row frame bounds clipped to the key segment.
    Int-exact: per-row floor-cents first, then integer floor division
    by the frame count on both sides."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_id", "value"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "event_id": batch["event_id"].to_numpy(),
            "tms": batch["ts"].cast(pa.int64()).to_numpy() // 1000,  # us -> ms
            "cents": _cents(batch["value"].to_numpy()),
        })

    parts = ds.map_batches(prep, batch_format="pyarrow")
    return grouped_map(parts, ["user_id"], _rows_frame_sweep)


SQL_ROWS_MOVING_AVG = """
WITH s AS (SELECT user_id, event_id, epoch_ms(ts) AS tms,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events)
SELECT user_id, event_id, tms,
       COUNT(*) OVER w AS frame_n,
       CAST(SUM(cents) OVER w // COUNT(*) OVER w AS BIGINT) AS ma_cents
FROM s WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# Distributed BPE vocabulary training + apply (stages/bpe.py)
# ---------------------------------------------------------------------------

BPE_MAX_WORDS = 10_000  # frequency cutoff: bounds the driver-side merge loop
BPE_N_MERGES = 48


def _bpe_word_counts_df(sf_dir: str) -> pd.DataFrame:
    from ..stages.bpe import top_words, word_count_partial, word_count_sweep

    ds = _read(sf_dir, "documents", ["text"])
    counts = grouped_map(
        ds.map_batches(word_count_partial, batch_format="pyarrow"),
        ["word"], word_count_sweep).to_pandas()
    return top_words(counts, BPE_MAX_WORDS)


def q_bpe_word_counts(sf_dir: str):
    """BPE pass 1 as its own triple-green query: top-``BPE_MAX_WORDS``
    (count DESC, word ASC) corpus word counts.  Per-block partials are
    the combiner, so the only exchange carries (word, n) rows bounded by
    blocks x vocab — the document text never leaves the reading task."""
    return _bpe_word_counts_df(sf_dir)


SQL_BPE_WORD_COUNTS = r"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS word FROM documents),
cnt AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY word)
SELECT word, n FROM cnt ORDER BY n DESC, word LIMIT 10000
"""


def q_bpe_train_merges(sf_dir: str, n_merges: int = BPE_N_MERGES):
    """Distributed BPE vocabulary trainer (Sennrich et al. 2016): the
    corpus collapses FIRST to the compact (word, count) table — one
    combiner-backed exchange, see ``bpe_word_counts`` — and the merge
    loop then runs on the driver over O(vocab) rows, the same
    sample-then-fit shape as the IVF/PQ codebook queries.  rows-only (an
    iterative weighted-argmax loop is not SQL-expressible);
    ``bpe_train_merges_check`` pins engine == paper-pseudocode reference."""
    from ..stages.bpe import train_merges_from_counts

    top = _bpe_word_counts_df(sf_dir)
    return train_merges_from_counts(
        top["word"].to_numpy(), top["n"].to_numpy(), n_merges)


def q_bpe_train_merges_check(sf_dir: str, n_merges: int = BPE_N_MERGES):
    """Incremental-delta trainer (engine) vs the recount-every-iteration
    Sennrich Fig.-1 reference fed by a direct (no Ray) parquet read +
    ``str.split`` tokenization; oracle pins mismatch_rows=0."""
    import pyarrow.parquet as pq

    from ..stages.bpe import reference_train_merges, top_words

    eng = q_bpe_train_merges(sf_dir, n_merges).reset_index(drop=True)
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["text"])
    wc: dict = {}
    for t in tbl["text"].to_pylist():
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    cdf = top_words(
        pd.DataFrame({"word": list(wc), "n": list(wc.values())})
        .astype({"n": "int64"}), BPE_MAX_WORDS)
    ref = reference_train_merges(
        cdf["word"].to_numpy(), cdf["n"].to_numpy(), n_merges) \
        .reset_index(drop=True)
    if len(eng) != len(ref):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng.to_numpy() != ref.to_numpy()).any(axis=1).sum())
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64")})


def q_bpe_token_counts(sf_dir: str):
    """Apply the learned merges back over the corpus: per-doc BPE token
    counts.  The merge-rank table (a few hundred string pairs) ships
    once via ``ray.put``; the actor-pool stage (``BpeTokenCounter``)
    segments only each batch's UNIQUE words — memoized across batches in
    the actor — and maps per-word counts to rows vectorized.  rows-only;
    ``bpe_token_counts_check`` is the paired invariant."""
    from ..stages.bpe import BpeTokenCounter

    merges = q_bpe_train_merges(sf_dir)
    ranks = {(lf, rt): i for i, (lf, rt)
             in enumerate(zip(merges["left"], merges["right"]))}
    ranks_ref = ray.put(ranks)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # pool sized to ~half the session so the upstream read tasks always
    # keep a CPU (concurrency == all CPUs deadlocks a small test session)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return ds.map_batches(
        BpeTokenCounter, fn_constructor_kwargs={"ranks_ref": ranks_ref},
        concurrency=max(2, min(8, cpus // 2)), batch_format="pyarrow")


def q_bpe_token_counts_check(sf_dir: str):
    """Greedy lowest-rank apply (engine) vs replay-in-training-order
    apply (the classic BPE equivalence; ``segment_in_order`` shares no
    loop with ``segment_greedy``) over a direct parquet read;
    mismatch_rows=0."""
    import pyarrow.parquet as pq

    from ..stages.bpe import segment_in_order

    eng = q_bpe_token_counts(sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    mdf = q_bpe_train_merges(sf_dir)
    merges = list(zip(mdf["left"], mdf["right"]))
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    cache: dict = {}
    ids, nw, nt = [], [], []
    for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        ws = t.split()
        s = 0
        for w in ws:
            n = cache.get(w)
            if n is None:
                n = len(segment_in_order(w, merges))
                cache[w] = n
            s += n
        ids.append(d)
        nw.append(len(ws))
        nt.append(s)
    ref = pd.DataFrame({
        "doc_id": pd.array(ids, dtype="int64"),
        "n_words": pd.array(nw, dtype="int64"),
        "n_bpe_tokens": pd.array(nt, dtype="int64"),
    }).sort_values("doc_id").reset_index(drop=True)
    if len(eng) != len(ref) or list(eng.columns) != list(ref.columns):
        mism = max(len(eng), len(ref))
    else:
        mism = int((eng.to_numpy() != ref.to_numpy()).any(axis=1).sum())
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64")})


QUERIES = {
    "tumbling_stats": q_tumbling_stats,
    "sliding_counts": q_sliding_counts,
    "session_windows": q_session_windows,
    "resample_5min": q_resample_5min,
    "rising_edges": q_rising_edges,
    "streak_duration": q_streak_duration,
    "hampel_outliers": q_hampel_outliers,
    "fp_extract_parity": q_fp_extract_parity,
    "fp_tumbling_windows": q_fp_tumbling_windows,
    "exact_dedup": q_exact_dedup,
    "approx_distinct": q_approx_distinct,
    "heavy_hitters": q_heavy_hitters,
    "tfidf_top_term": q_tfidf_top_term,
    "inverted_index": q_inverted_index,
    "minhash_lsh_clusters": q_minhash_lsh_clusters,
    "minhash_lsh_clusters_dist": q_minhash_lsh_clusters_dist,
    "minhash_lsh_clusters_check": q_minhash_lsh_clusters_check,
    "simhash_clusters_check": q_simhash_clusters_check,
    "simhash_clusters": q_simhash_clusters,
    "ngram_jaccard_clusters": q_ngram_jaccard_clusters,
    "token_counts": q_token_counts,
    "quality_counts": q_quality_counts,
    "contamination_check": q_contamination_check,
    "repetition_ratio": q_repetition_ratio,
    "clean_corpus": q_clean_corpus,
    "lang_id": q_lang_id,
    "text_features": q_text_features,
    "embedding_near_pairs": q_embedding_near_pairs,
    "embedding_near_pairs_lsh": q_embedding_near_pairs_lsh,
    "semantic_dedup": q_semantic_dedup,
    "semantic_dedup_check": q_semantic_dedup_check,
    "ann_topk": q_ann_topk,
    "ann_topk_ivf": q_ann_topk_ivf,
    "ann_topk_ivf_check": q_ann_topk_ivf_check,
    "pricing_summary": q_pricing_summary,
    "segment_orders": q_segment_orders,
    "mapped_lookup": q_mapped_lookup,
    "top_orders": q_top_orders,
    "filter_revenue": q_filter_revenue,
    "user_event_types": q_user_event_types,
    "derived_expr": q_derived_expr,
    "pivot_wide": q_pivot_wide,
    "rule_alarms": q_rule_alarms,
    "rule_alarms_duration": q_rule_alarms_duration,
    "rule_report": q_rule_report,
    "model_lang_score": q_model_lang_score,
    "model_lang_score_check": q_model_lang_score_check,
    "lowess_smooth": q_lowess_smooth,
    "lowess_smooth_check": q_lowess_smooth_check,
    "media_image_features_check": q_media_image_features_check,
    "media_image_features": q_media_image_features,
    "media_jpeg_features": q_media_jpeg_features,
    "media_jpeg_features_check": q_media_jpeg_features_check,
    "media_png_features": q_media_png_features,
    "media_png_features_check": q_media_png_features_check,
    "media_webp_features": q_media_webp_features,
    "media_webp_features_check": q_media_webp_features_check,
    "media_audio_codecs": q_media_audio_codecs,
    "media_audio_codecs_check": q_media_audio_codecs_check,
    "media_flac": q_media_flac,
    "media_flac_check": q_media_flac_check,
    "media_mp2": q_media_mp2,
    "media_mp2_check": q_media_mp2_check,
    "media_mp3": q_media_mp3,
    "media_mp3_check": q_media_mp3_check,
    "media_video_frames": q_media_video_frames,
    "media_video_frames_check": q_media_video_frames_check,
    "media_mpeg1_frames": q_media_mpeg1_frames,
    "media_mpeg1_frames_check": q_media_mpeg1_frames_check,
    "media_gif_features": q_media_gif_features,
    "media_gif_features_check": q_media_gif_features_check,
    "media_gif_anim_frames": q_media_gif_anim_frames,
    "media_gif_anim_frames_check": q_media_gif_anim_frames_check,
    "warc_ingest": q_warc_ingest,
    "wet_ingest": q_wet_ingest,
    "warc_cdx_lookup": q_warc_cdx_lookup,
    "simhash_clusters_dist": q_simhash_clusters_dist,
    "value_counts": q_value_counts,
    "interval_join": q_interval_join,
    "asof_join": q_asof_join,
    "window_join": q_window_join,
    "snm_dedup_pairs": q_snm_dedup_pairs,
    "graph_components": q_graph_components,
    "temporal_dim_join": q_temporal_dim_join,
    "over_range_count": q_over_range_count,
    "jsonl_ingest": q_jsonl_ingest,
    "host_frontier_order": q_host_frontier_order,
    "sitemap_frontier": q_sitemap_frontier,
    "bm25_scores": q_bm25_scores,
    "grouping_sets_revenue": q_grouping_sets_revenue,
    "dense_rank_balance": q_dense_rank_balance,
    "host_boilerplate_rate": q_host_boilerplate_rate,
    "dedup_keep_last": q_dedup_keep_last,
    "session_windows_dynamic": q_session_windows_dynamic,
    "link_reciprocity": q_link_reciprocity,
    "ngram_novelty": q_ngram_novelty,
    "rows_moving_avg": q_rows_moving_avg,
    "obs_text": q_obs_text,
    "json_extract": q_json_extract,
    "hampel_repair": q_hampel_repair,
    "throttle_first": q_throttle_first,
    "deterministic_sample": q_deterministic_sample,
    "canonical_docs": q_canonical_docs,
    "stratified_sample": q_stratified_sample,
    "top_docs_per_lang": q_top_docs_per_lang,
    "group_quantiles": q_group_quantiles,
    "approx_quantiles": q_approx_quantiles,
    "customers_without_orders": q_customers_without_orders,
    "bloom_join_revenue": q_bloom_join_revenue,
    "rollup_revenue": q_rollup_revenue,
    "running_revenue": q_running_revenue,
    "event_gaps": q_event_gaps,
    "union_activity": q_union_activity,
    "users_intersect": q_users_intersect,
    "users_except": q_users_except,
    "funnel_steps": q_funnel_steps,
    "cohort_retention": q_cohort_retention,
    "mode_event_type": q_mode_event_type,
    "time_weighted_avg": q_time_weighted_avg,
    "regr_value_trend": q_regr_value_trend,
    "shipping_priority": q_shipping_priority,
    "regional_volume": q_regional_volume,
    "ntile_acctbal": q_ntile_acctbal,
    "chunk_dedup_stats": q_chunk_dedup_stats,
    "countmin_check": q_countmin_check,
    "temperature_mix": q_temperature_mix,
    "gap_fill_daily": q_gap_fill_daily,
    "group_quantiles_cont": q_group_quantiles_cont,
    "event_transitions": q_event_transitions,
    "zscore_chars": q_zscore_chars,
    "label_centroid_norms": q_label_centroid_norms,
    "weighted_sample": q_weighted_sample,
    "rolling_hourly_avg": q_rolling_hourly_avg,
    "event_paths": q_event_paths,
    "user_entropy": q_user_entropy,
    "customers_with_orders": q_customers_with_orders,
    "daily_revenue_change": q_daily_revenue_change,
    "pattern_redact": q_pattern_redact,
    "hourly_active_users": q_hourly_active_users,
    "train_split_counts": q_train_split_counts,
    "unigram_logprob": q_unigram_logprob,
    "above_segment_avg": q_above_segment_avg,
    "revenue_share": q_revenue_share,
    "event_cooccurrence": q_event_cooccurrence,
    "bucketed_join_revenue": q_bucketed_join_revenue,
    "pruned_date_scan": q_pruned_date_scan,
    "ann_topk_pq": q_ann_topk_pq,
    "ann_topk_pq_check": q_ann_topk_pq_check,
    "ann_topk_ivfpq": q_ann_topk_ivfpq,
    "ann_topk_ivfpq_check": q_ann_topk_ivfpq_check,
    "robust_length_stats": q_robust_length_stats,
    "supplier_pagerank": q_supplier_pagerank,
    "supplier_pagerank_check": q_supplier_pagerank_check,
    "top_bigrams": q_top_bigrams,
    "url_canonicalize": q_url_canonicalize,
    "exact_substring_dedup": q_exact_substring_dedup,
    "bpe_word_counts": q_bpe_word_counts,
    "bpe_train_merges": q_bpe_train_merges,
    "bpe_train_merges_check": q_bpe_train_merges_check,
    "bpe_token_counts": q_bpe_token_counts,
    "bpe_token_counts_check": q_bpe_token_counts_check,
    "winnow_fingerprints": q_winnow_fingerprints,
    "winnow_fingerprints_check": q_winnow_fingerprints_check,
    "html_extract_text": q_html_extract_text,
    "url_blocklist_filter": q_url_blocklist_filter,
    "warc_extract_general": q_warc_extract_general,
    "outlink_graph": q_outlink_graph,
    "robots_filter": q_robots_filter,
    "charset_decode": q_charset_decode,
    "crawl_curation_chain": q_crawl_curation_chain,
    "cube_revenue": q_cube_revenue,
    "cumulate_windows": q_cumulate_windows,
    "window_topn_hosts": q_window_topn_hosts,
    "cep_pattern_matches": q_cep_pattern_matches,
    "upsert_aggregate": q_upsert_aggregate,
    "host_pagerank": q_host_pagerank,
    "host_pagerank_check": q_host_pagerank_check,
    "host_quota_cap": q_host_quota_cap,
    "bigram_logprob": q_bigram_logprob,
    "dsir_weights": q_dsir_weights,
    "anchor_text_index": q_anchor_text_index,
    "pack_contexts": q_pack_contexts,
    "ccnet_lang_buckets": q_ccnet_lang_buckets,
    "window_dedup_first": q_window_dedup_first,
    "pack_greedy": q_pack_greedy,
    "pack_greedy_check": q_pack_greedy_check,
    "gopher_rules": q_gopher_rules,
    "epoch_shuffle_order": q_epoch_shuffle_order,
    "host_hits": q_host_hits,
    "host_hits_check": q_host_hits_check,
}

ORACLE_SQL = {
    "tumbling_stats": SQL_TUMBLING_STATS,
    "sliding_counts": SQL_SLIDING_COUNTS,
    "session_windows": SQL_SESSION_WINDOWS,
    "resample_5min": SQL_RESAMPLE_5MIN,
    "rising_edges": SQL_RISING_EDGES,
    "streak_duration": SQL_STREAK_DURATION,
    "hampel_outliers": SQL_HAMPEL_OUTLIERS,
    "fp_extract_parity": SQL_FP_EXTRACT_PARITY,
    "fp_tumbling_windows": SQL_FP_TUMBLING_WINDOWS,
    "exact_dedup": SQL_EXACT_DEDUP,
    "token_counts": SQL_TOKEN_COUNTS,
    "quality_counts": SQL_QUALITY_COUNTS,
    "lang_id": SQL_LANG_ID,
    "text_features": SQL_TEXT_FEATURES,
    # the HLL sketch is not SQL-expressible; the row carries the exact
    # distinct count (SQL-checked) plus a pinned in-error-band flag for
    # the estimate, per the inline-invariant pattern below
    "approx_distinct": SQL_APPROX_DISTINCT,
    "heavy_hitters": SQL_HEAVY_HITTERS,
    "tfidf_top_term": SQL_TFIDF_TOP_TERM,
    "inverted_index": SQL_INVERTED_INDEX,
    # the dist-CC queries return an inline invariant (distributed label
    # propagation ≡ driver union-find on identical edges, as a mismatch
    # row count); the invariant is not SQL-expressible, so the oracle
    # pins its expected value
    "minhash_lsh_clusters_dist": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
    "simhash_clusters_dist": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
    # full-pipeline single-process recomputes (bucket all-pairs / brute
    # hamming + independent label propagation) — oracle pins 0
    "minhash_lsh_clusters_check": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
    "simhash_clusters_check": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
    # LSH-candidate + EXACT trigram-Jaccard confirm at 32x2 banding: miss
    # probability < 5e-10 per true pair, so held to the exact all-pairs
    # SQL (recursive-CTE connected components; small-scale oracle only —
    # the engine path stays banded/co-partitioned)
    "ngram_jaccard_clusters": SQL_NGRAM_JACCARD,
    "contamination_check": SQL_CONTAMINATION_CHECK,
    "repetition_ratio": SQL_REPETITION_RATIO,
    "clean_corpus": SQL_CLEAN_CORPUS,
    "embedding_near_pairs": SQL_EMBEDDING_NEAR_PAIRS,
    # the LSH path is candidate-pruned but exact-confirmed; at the query's
    # 32×2-bit banding its miss probability is <1e-7 per true pair, so it
    # is held to the same exact oracle (verified at sf0.001 and sf0.01)
    "embedding_near_pairs_lsh": SQL_EMBEDDING_NEAR_PAIRS,
    # SemDeDup's k-means is iterative (not SQL-expressible); the check
    # query returns the engine-vs-reference mismatch count and the
    # oracle pins its expected value, as with the dist-CC checks above
    "semantic_dedup_check": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
    "ann_topk": SQL_ANN_TOPK,
    # IVF is approximate by design; the check query pins its recall-vs-
    # brute-force invariant (bench.py reports the raw recall number)
    "ann_topk_ivf_check": "SELECT CAST(1 AS BIGINT) AS recall_at_least_080",
    # distributed-vs-single-process pins for the remaining non-SQL ops
    "lowess_smooth_check": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
    "model_lang_score_check": ("SELECT CAST(0 AS BIGINT) AS mismatch_rows, "
                               "CAST(1 AS BIGINT) AS accuracy_floor"),
    "media_image_features_check": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
    "media_jpeg_features_check": ("SELECT CAST(0 AS BIGINT) AS mismatch_rows, "
                                  "CAST(1 AS BIGINT) AS fidelity_ok"),
    "media_png_features_check": ("SELECT CAST(0 AS BIGINT) AS mismatch_rows, "
                                 "CAST(1 AS BIGINT) AS lossless_ok"),
    "media_webp_features_check": ("SELECT CAST(0 AS BIGINT) AS mismatch_rows, "
                                  "CAST(1 AS BIGINT) AS lossless_ok, "
                                  "CAST(1 AS BIGINT) AS budget_ok"),
    "media_audio_codecs_check": ("SELECT CAST(0 AS BIGINT) AS mismatch_rows, "
                                 "CAST(1 AS BIGINT) AS fidelity_ok"),
    "media_flac_check": ("SELECT CAST(0 AS BIGINT) AS mismatch_rows, "
                         "CAST(1 AS BIGINT) AS lossless_ok, "
                         "CAST(1 AS BIGINT) AS budget_ok"),
    "media_mp2_check": ("SELECT CAST(0 AS BIGINT) AS mismatch_rows, "
                        "CAST(1 AS BIGINT) AS rate_ok, "
                        "CAST(1 AS BIGINT) AS snr_ok"),
    "media_mp3_check": ("SELECT CAST(0 AS BIGINT) AS mismatch_rows, "
                        "CAST(1 AS BIGINT) AS rate_ok, "
                        "CAST(1 AS BIGINT) AS snr_ok"),
    "media_video_frames_check": ("SELECT CAST(0 AS BIGINT) AS mismatch_rows, "
                                 "CAST(1 AS BIGINT) AS frame_count_ok, "
                                 "CAST(1 AS BIGINT) AS seek_ok"),
    "media_mpeg1_frames_check": ("SELECT CAST(0 AS BIGINT) AS mismatch_rows, "
                                 "CAST(1 AS BIGINT) AS frame_count_ok, "
                                 "CAST(1 AS BIGINT) AS seek_ok, "
                                 "CAST(1 AS BIGINT) AS inter_ok"),
    "media_gif_features_check": ("SELECT CAST(0 AS BIGINT) AS mismatch_rows, "
                                 "CAST(1 AS BIGINT) AS lossless_ok"),
    "media_gif_anim_frames_check": ("SELECT CAST(0 AS BIGINT) AS mismatch_rows, "
                                    "CAST(1 AS BIGINT) AS frame_count_ok, "
                                    "CAST(1 AS BIGINT) AS seek_ok"),
    "warc_ingest": SQL_WARC_INGEST,
    "wet_ingest": SQL_WET_INGEST,
    "warc_cdx_lookup": SQL_WARC_CDX_LOOKUP,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "segment_orders": SQL_SEGMENT_ORDERS,
    "top_orders": SQL_TOP_ORDERS,
    "filter_revenue": SQL_FILTER_REVENUE,
    "user_event_types": SQL_USER_EVENT_TYPES,
    "derived_expr": SQL_DERIVED_EXPR,
    "pivot_wide": SQL_PIVOT_WIDE,
    "rule_alarms": SQL_RULE_ALARMS,
    "rule_alarms_duration": SQL_RULE_ALARMS_DURATION,
    "rule_report": SQL_RULE_REPORT,
    "mapped_lookup": SQL_MAPPED_LOOKUP,
    "value_counts": SQL_VALUE_COUNTS,
    "interval_join": SQL_INTERVAL_JOIN,
    "asof_join": SQL_ASOF_JOIN,
    "window_join": SQL_WINDOW_JOIN,
    "snm_dedup_pairs": SQL_SNM_DEDUP_PAIRS,
    "graph_components": SQL_GRAPH_COMPONENTS,
    "temporal_dim_join": SQL_TEMPORAL_DIM_JOIN,
    "over_range_count": SQL_OVER_RANGE_COUNT,
    "jsonl_ingest": SQL_JSONL_INGEST,
    "host_frontier_order": SQL_HOST_FRONTIER_ORDER,
    "sitemap_frontier": SQL_SITEMAP_FRONTIER,
    "bm25_scores": SQL_BM25_SCORES,
    "grouping_sets_revenue": SQL_GROUPING_SETS_REVENUE,
    "dense_rank_balance": SQL_DENSE_RANK_BALANCE,
    "host_boilerplate_rate": SQL_HOST_BOILERPLATE_RATE,
    "dedup_keep_last": SQL_DEDUP_KEEP_LAST,
    "session_windows_dynamic": SQL_SESSION_WINDOWS_DYNAMIC,
    "link_reciprocity": SQL_LINK_RECIPROCITY,
    "ngram_novelty": SQL_NGRAM_NOVELTY,
    "rows_moving_avg": SQL_ROWS_MOVING_AVG,
    "obs_text": SQL_OBS_TEXT,
    "json_extract": SQL_JSON_EXTRACT,
    "hampel_repair": SQL_HAMPEL_REPAIR,
    "throttle_first": SQL_THROTTLE_FIRST,
    "deterministic_sample": SQL_DETERMINISTIC_SAMPLE,
    "canonical_docs": SQL_CANONICAL_DOCS,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "top_docs_per_lang": SQL_TOP_DOCS_PER_LANG,
    "group_quantiles": SQL_GROUP_QUANTILES,
    "approx_quantiles": SQL_APPROX_QUANTILES,
    "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
    "bloom_join_revenue": SQL_BLOOM_JOIN_REVENUE,
    "rollup_revenue": SQL_ROLLUP_REVENUE,
    "running_revenue": SQL_RUNNING_REVENUE,
    "event_gaps": SQL_EVENT_GAPS,
    "union_activity": SQL_UNION_ACTIVITY,
    "users_intersect": SQL_USERS_INTERSECT,
    "users_except": SQL_USERS_EXCEPT,
    "funnel_steps": SQL_FUNNEL_STEPS,
    "cohort_retention": SQL_COHORT_RETENTION,
    "mode_event_type": SQL_MODE_EVENT_TYPE,
    "time_weighted_avg": SQL_TIME_WEIGHTED_AVG,
    "regr_value_trend": SQL_REGR_VALUE_TREND,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "regional_volume": SQL_REGIONAL_VOLUME,
    "ntile_acctbal": SQL_NTILE_ACCTBAL,
    "chunk_dedup_stats": SQL_CHUNK_DEDUP_STATS,
    "countmin_check": SQL_COUNTMIN_CHECK,
    "temperature_mix": SQL_TEMPERATURE_MIX,
    "gap_fill_daily": SQL_GAP_FILL_DAILY,
    "group_quantiles_cont": SQL_GROUP_QUANTILES_CONT,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "zscore_chars": SQL_ZSCORE_CHARS,
    "label_centroid_norms": SQL_LABEL_CENTROID_NORMS,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "rolling_hourly_avg": SQL_ROLLING_HOURLY_AVG,
    "event_paths": SQL_EVENT_PATHS,
    "user_entropy": SQL_USER_ENTROPY,
    "customers_with_orders": SQL_CUSTOMERS_WITH_ORDERS,
    "daily_revenue_change": SQL_DAILY_REVENUE_CHANGE,
    "pattern_redact": SQL_PATTERN_REDACT,
    "hourly_active_users": SQL_HOURLY_ACTIVE_USERS,
    "train_split_counts": SQL_TRAIN_SPLIT_COUNTS,
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "above_segment_avg": SQL_ABOVE_SEGMENT_AVG,
    "revenue_share": SQL_REVENUE_SHARE,
    "event_cooccurrence": SQL_EVENT_COOCCURRENCE,
    "bucketed_join_revenue": SQL_BUCKETED_JOIN_REVENUE,
    "pruned_date_scan": SQL_PRUNED_DATE_SCAN,
    # PQ is approximate by design; the check query pins its recall-vs-
    # brute-force invariant exactly as ann_topk_ivf_check does
    "ann_topk_pq_check": "SELECT CAST(1 AS BIGINT) AS recall_at_least_080",
    "ann_topk_ivfpq_check": "SELECT CAST(1 AS BIGINT) AS recall_at_least_080",
    "robust_length_stats": SQL_ROBUST_LENGTH_STATS,
    # PageRank is iterative (not SQL-expressible); the check query pins
    # distributed-vs-single-process agreement like the dist-CC checks
    "supplier_pagerank_check": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
    "top_bigrams": SQL_TOP_BIGRAMS,
    "url_canonicalize": SQL_URL_CANONICALIZE,
    "exact_substring_dedup": SQL_EXACT_SUBSTRING_DEDUP,
    # winnowing min-selection follows the engine's hash order (not
    # SQL-expressible); the check pins vectorized-vs-loop-reference parity
    "bpe_word_counts": SQL_BPE_WORD_COUNTS,
    "bpe_train_merges_check": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
    "bpe_token_counts_check": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
    "winnow_fingerprints_check": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
    "html_extract_text": SQL_HTML_EXTRACT_TEXT,
    "url_blocklist_filter": SQL_URL_BLOCKLIST_FILTER,
    "warc_extract_general": SQL_WARC_EXTRACT_GENERAL,
    "outlink_graph": SQL_OUTLINK_GRAPH,
    "robots_filter": SQL_ROBOTS_FILTER,
    "charset_decode": SQL_CHARSET_DECODE,
    "crawl_curation_chain": SQL_CRAWL_CURATION_CHAIN,
    "cube_revenue": SQL_CUBE_REVENUE,
    "cumulate_windows": SQL_CUMULATE_WINDOWS,
    "window_topn_hosts": SQL_WINDOW_TOPN_HOSTS,
    "cep_pattern_matches": SQL_CEP_PATTERN_MATCHES,
    "upsert_aggregate": SQL_UPSERT_AGGREGATE,
    # host_pagerank is rows-only (float power iteration); the paired
    # check pins distributed-vs-reference agreement
    "host_pagerank_check": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
    "host_quota_cap": SQL_HOST_QUOTA_CAP,
    "bigram_logprob": SQL_BIGRAM_LOGPROB,
    "dsir_weights": SQL_DSIR_WEIGHTS,
    "anchor_text_index": SQL_ANCHOR_TEXT_INDEX,
    "pack_contexts": SQL_PACK_CONTEXTS,
    "ccnet_lang_buckets": SQL_CCNET_LANG_BUCKETS,
    "window_dedup_first": SQL_WINDOW_DEDUP_FIRST,
    "pack_greedy_check": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
    "gopher_rules": SQL_GOPHER_RULES,
    "epoch_shuffle_order": SQL_EPOCH_SHUFFLE_ORDER,
    "host_hits_check": "SELECT CAST(0 AS BIGINT) AS mismatch_rows",
}
