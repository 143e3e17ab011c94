"""Distributed cardinality sketch (HyperLogLog) for web-scale corpora.

New target functionality beside the dedup suite (SURVEY.md §2.7): a
COUNT(DISTINCT) over 10^12 rows without shuffling the values — every
block folds into a 2^p-register sketch (p=12 → 4 KB), and partials merge
by elementwise max, which is associative + commutative so any merge tree
works.  At 100 TB the per-block partial stays 4 KB regardless of block
size; the final merge is O(blocks × 4 KB) of byte arrays on the driver
(a tree-reduce `groupby` handles the last hop if the block count ever
outgrows the driver — the partial row already carries a constant
``part`` key for that).

Algorithm: Flajolet–Fusy–Gandouet–Meunier 2007 (public), with the
original small-range linear-counting correction; no large-range
correction is needed for 64-bit hashes.  The hash is the repo's stable
``text_hash64`` (pandas hash_array with a pinned key), so the estimate
is deterministic across runs and partitionings.

The reference has no sketch ops (its exact dedup is pandas
``drop_duplicates``, src/data_input/process_odr.py:1152-1164); this is
the approximate path a 100-TB corpus needs for cheap cardinality
telemetry (e.g. sizing the dedup shuffle before running it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions import fingerprint as fp

HLL_P = 12                      # 4096 registers, ~1.04/sqrt(m) = 1.6% std error
HLL_M = 1 << HLL_P

_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                      axis=1).sum(axis=1).astype(np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (byte-LUT; this numpy build
    predates np.bitwise_count)."""
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def _clz_rank(w: np.ndarray, width: int) -> np.ndarray:
    """rho(w) = 1 + leading-zero count within a ``width``-bit suffix word
    stored left-aligned in uint64 (0 → width + 1), vectorized via bit-smear
    + popcount (exact — no float log2 rounding)."""
    s = w.copy()
    for k in (1, 2, 4, 8, 16, 32):
        s |= s >> np.uint64(k)
    return np.minimum(np.int64(65) - _popcount64(s), np.int64(width + 1))


def hll_fold(h: np.ndarray, registers: np.ndarray | None = None) -> np.ndarray:
    """Fold uint64 hashes into a register array (uint8[HLL_M]), in place
    if one is passed.  Top p bits pick the register; rho of the remaining
    64-p bits is the value."""
    if registers is None:
        registers = np.zeros(HLL_M, dtype=np.uint8)
    if len(h) == 0:
        return registers
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rho = _clz_rank(h << np.uint64(HLL_P), 64 - HLL_P).astype(np.uint8)
    # sort-based per-register max: this numpy's ufunc.at is slow (memory/
    # sandbox-perf-quirks), a sort + reduceat over 1-D contiguous data is not
    order = np.argsort(idx, kind="stable")
    si, sr = idx[order], rho[order]
    starts = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
    per = np.maximum.reduceat(sr, starts)
    regs_idx = si[starts]
    registers[regs_idx] = np.maximum(registers[regs_idx], per)
    return registers


def hll_estimate(registers: np.ndarray) -> float:
    """Cardinality estimate from a merged register array (FFGM'07 with the
    small-range linear-counting correction)."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -registers.astype(np.float64)).sum()
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds: "ray.data.Dataset", col: str) -> float:
    """Approximate COUNT(DISTINCT col) over a Dataset: per-block 4 KB
    partial sketches, driver max-merge, one estimate."""
    def _partial(batch: pa.Table) -> pa.Table:
        regs = hll_fold(fp.text_hash64(batch[col]))
        return pa.table({"part": pa.array([0], pa.int32()),
                         "regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(HLL_M, dtype=np.uint8)
    for part in ds.map_batches(_partial, batch_format="pyarrow") \
                  .iter_batches(batch_format="pyarrow"):
        for buf in part["regs"].to_pylist():
            merged = np.maximum(merged, np.frombuffer(buf, dtype=np.uint8))
    return hll_estimate(merged)


def heavy_hitters(ds: "ray.data.Dataset", col: str, phi: float,
                  total: int | None = None) -> "pd.DataFrame":
    """EXACT distributed phi-heavy hitters (freq >= phi*N) in two streaming
    passes with no all-to-all shuffle.

    Pass 1 keeps each block's LOCAL phi-heavy items: by the averaging
    argument a globally phi-heavy item is phi-heavy in at least one
    block, so the union (<= 1/phi items per block) is a complete
    candidate set.  Pass 2 broadcasts the sorted candidate array once
    (``ray.put``) and each block emits one fixed-length partial count
    vector (searchsorted + bincount); the driver sums the tiny vectors
    and applies the global threshold.  This is the hot-key detector that
    feeds the window-salting decision in the streaming pipeline; a
    Count-Min sketch gives the same two-pass shape with bounded memory
    if 1/phi x blocks ever outgrows the driver.
    """
    import pandas as pd

    if total is None:
        total = ds.count()

    def _local_heavy(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table({col: pa.array(vals[cnts >= phi * len(v)], pa.int64())})

    cand_parts = ds.map_batches(_local_heavy, batch_format="pyarrow") \
                   .take_all()
    cands = np.unique(np.array([r[col] for r in cand_parts], dtype=np.int64))
    if cands.size == 0:
        return pd.DataFrame({col: np.empty(0, np.int64),
                             "n_rows": np.empty(0, np.int64)})
    cand_ref = ray.put(cands)

    def _count(batch: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        v = batch[col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(c, v)
        ok = (idx < len(c)) & (c[np.minimum(idx, len(c) - 1)] == v)
        counts = np.bincount(idx[ok], minlength=len(c))
        return pa.table({"slot": pa.array(np.arange(len(c)), pa.int64()),
                         "cnt": pa.array(counts, pa.int64())})

    totals = np.zeros(len(cands), dtype=np.int64)
    for part in ds.map_batches(_count, batch_format="pyarrow") \
                  .iter_batches(batch_format="pyarrow"):
        np.add.at(totals, part["slot"].to_numpy(), part["cnt"].to_numpy())
    keep = totals >= phi * total
    out = pd.DataFrame({col: cands[keep], "n_rows": totals[keep]})
    return out.sort_values(["n_rows", col], ascending=[False, True]) \
              .reset_index(drop=True)


def exact_distinct(ds: "ray.data.Dataset", col: str) -> int:
    """Exact distributed COUNT(DISTINCT col): 8-byte hash rows shuffle
    (never the values), groupby(hash) → row count.  The hash is
    reinterpreted as int64 — uint64 values above 2^63 trip Ray's Arrow
    sort/aggregate into a pickled-object fallback block format."""
    def _h(batch: pa.Table) -> pa.Table:
        h = np.unique(fp.text_hash64(batch[col])).view(np.int64)
        return pa.table({"h": pa.array(h, pa.int64())})

    return ds.map_batches(_h, batch_format="pyarrow").groupby("h").count().count()


# ---------------------------------------------------------------------------
# Mergeable-histogram quantile sketch
# ---------------------------------------------------------------------------

HIST_BINS = 8192


def parquet_column_bounds(path: str, col: str) -> tuple[float, float]:
    """(min, max) from parquet row-group statistics — no data scan."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    lo, hi = np.inf, -np.inf
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            c = md.row_group(rg).column(ci)
            if c.path_in_schema == col and c.statistics is not None:
                lo = min(lo, c.statistics.min)
                hi = max(hi, c.statistics.max)
    if not np.isfinite(lo):
        raise ValueError(f"no statistics for column {col!r} in {path}")
    return float(lo), float(hi)


def hist_fold(vals: np.ndarray, lo: float, hi: float,
              counts: np.ndarray | None = None) -> np.ndarray:
    """Fold values into a fixed-bin histogram (int64[HIST_BINS]); merge
    partials by addition — associative, any merge tree works."""
    if counts is None:
        counts = np.zeros(HIST_BINS, dtype=np.int64)
    if len(vals) == 0:
        return counts
    w = (hi - lo) / HIST_BINS or 1.0
    idx = np.clip(((vals - lo) / w).astype(np.int64), 0, HIST_BINS - 1)
    counts += np.bincount(idx, minlength=HIST_BINS)
    return counts


def hist_quantile(counts: np.ndarray, lo: float, hi: float, q: float) -> float:
    """Upper edge of the first bin whose cumulative count reaches
    ceil(q*n) — within one bin width of the exact quantile_disc value
    (the crossing bin IS the bin containing it)."""
    n = int(counts.sum())
    target = max(int(np.ceil(q * n)), 1)
    b = int(np.searchsorted(np.cumsum(counts), target, "left"))
    w = (hi - lo) / HIST_BINS or 1.0
    return lo + (b + 1) * w


def hist_distinct_quantiles(ds: "ray.data.Dataset", col: str,
                            lo: float, hi: float,
                            qs: tuple[float, ...]) -> dict[float, float]:
    """Approximate quantiles over a Dataset: per-block 64 KB histogram
    partials, driver sum-merge, one cumulative pick per q."""
    def _partial(batch: pa.Table) -> pa.Table:
        c = hist_fold(batch[col].to_numpy(zero_copy_only=False)
                      .astype(np.float64), lo, hi)
        return pa.table({"counts": pa.array([c.tobytes()], pa.binary())})

    merged = np.zeros(HIST_BINS, dtype=np.int64)
    for part in ds.map_batches(_partial, batch_format="pyarrow") \
                  .iter_batches(batch_format="pyarrow"):
        for buf in part["counts"].to_pylist():
            merged += np.frombuffer(buf, dtype=np.int64)
    return {q: hist_quantile(merged, lo, hi, q) for q in qs}


def exact_value_quantiles(ds: "ray.data.Dataset", col: str, scale: float,
                          qs: tuple[float, ...]) -> dict[float, int]:
    """EXACT distributed quantiles for a bounded-domain numeric column:
    per-block (scaled-int value, count) partials are the only exchange
    (domain-bounded, like group_quantiles), driver cumulative pick by the
    DuckDB quantile_disc rule.  Returns scaled-int values."""
    def _partial(batch: pa.Table) -> pa.Table:
        v = np.floor(batch[col].to_numpy(zero_copy_only=False)
                     .astype(np.float64) * scale + 0.5).astype(np.int64)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts, pa.int64())})

    import pandas as pd

    parts = []
    for part in ds.map_batches(_partial, batch_format="pyarrow") \
                  .iter_batches(batch_format="pyarrow"):
        parts.append(part.to_pandas())
    df = pd.concat(parts).groupby("v", sort=True)["n"].sum().reset_index()
    vals = df["v"].to_numpy()
    cum = np.cumsum(df["n"].to_numpy())
    n = int(cum[-1])
    out = {}
    for q in qs:
        target = max(int(np.ceil(q * n)), 1)
        out[q] = int(vals[np.searchsorted(cum, target, "left")])
    return out


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — mergeable frequency
# estimates for hot-key telemetry without shuffling the keys.  d x w int64
# counters (4 x 4096 = 128 KB) per block partial; partials merge by
# elementwise SUM (associative), estimates are min over the d rows and
# never undercount.
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 4096

_CMS_SALTS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5],
                      dtype=np.uint64)


def _cms_pos(keys: np.ndarray) -> np.ndarray:
    """(d, n) counter positions via d salted splitmix-style mixes."""
    x = keys.astype(np.uint64)[None, :] ^ _CMS_SALTS[:, None]
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x % np.uint64(CMS_W)).astype(np.int64)


def cms_fold(keys: np.ndarray, table: np.ndarray | None = None) -> np.ndarray:
    """Fold integer keys into a (d, w) count-min table (one count per
    occurrence) — vectorized bincount per hash row."""
    if table is None:
        table = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if len(keys):
        pos = _cms_pos(np.asarray(keys))
        for j in range(CMS_D):
            table[j] += np.bincount(pos[j], minlength=CMS_W)
    return table


def cms_estimate(table: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point-query estimates: min over the d counter rows per key."""
    pos = _cms_pos(np.asarray(keys))
    return np.min(np.stack([table[j, pos[j]] for j in range(CMS_D)]), axis=0)


def cms_counts(ds: "ray.data.Dataset", col: str) -> np.ndarray:
    """Distributed CMS build: per-block (d, w) partials, sum-merged on
    the driver (O(blocks x 128 KB); a tree-reduce groupby is the escape
    hatch if the block count outgrows the driver, as with the HLL)."""
    def _partial(batch: pa.Table) -> pa.Table:
        t = cms_fold(batch[col].to_numpy().astype(np.int64))
        return pa.table({"cms": pa.array([t.tobytes()], pa.binary())})

    table = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for part in ds.map_batches(_partial, batch_format="pyarrow") \
                  .iter_batches(batch_format="pyarrow"):
        for buf in part["cms"].to_pylist():
            table += np.frombuffer(buf, dtype=np.int64).reshape(CMS_D, CMS_W)
    return table
