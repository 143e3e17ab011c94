"""Stats-pruned parquet range reads: write a table range-sharded on a
sort/cluster column, then serve range queries by reading ONLY the shard
files whose parquet footer min/max overlap the predicate — whole files
are skipped without opening their data pages (the generic form of the
epoch source's watermark-bounds trick, `epochs.py:52-73`).

At the 100-TB design point the footer scan is the entire planning cost:
a range query over a 1% slice of a date-sharded fact table reads ~1% of
the files.  The residual (exact) filter still runs per batch — footer
stats only prune, they never decide membership.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..stages.shuffle import grouped_map
from .retry import with_retries


@ray.remote
def _write_parts(t: pa.Table, part_col: str, root: str) -> list[tuple[int, str, int]]:
    """Write one file per distinct part value found in this partition
    (grouped_map co-locates every row of a part value into exactly one
    partition, so each file is written whole by one task)."""
    import numpy as np

    vals = t[part_col].to_numpy()
    order = np.argsort(vals, kind="stable")
    sv = vals[order]
    out = []
    for v in np.unique(sv):
        lo = np.searchsorted(sv, v, "left")
        hi = np.searchsorted(sv, v, "right")
        sub = t.take(pa.array(order[lo:hi]))
        path = os.path.join(root, f"part={int(v):08d}.parquet")
        pq.write_table(sub, path)
        out.append((int(v), path, sub.num_rows))
    return out


def _part_noop(t: pa.Table) -> pa.Table:
    return t


def write_sharded(ds: "ray.data.Dataset", root: str, part_col: str) -> list[tuple]:
    """Range-shard ``ds`` into one parquet file per distinct ``part_col``
    value (the caller computes the part key, e.g. ``ts_ms // RANGE``).
    Parallel: one hash exchange + one write task per partition; returns
    the (part, path, rows) manifest."""
    os.makedirs(root, exist_ok=True)
    refs = grouped_map(ds, [part_col], _part_noop, return_refs=True)
    manifests = ray.get([_write_parts.remote(r, part_col, root) for r in refs])
    return sorted(m for ms in manifests for m in ms)


def _stat_to_int(v) -> int:
    if hasattr(v, "timestamp"):
        import datetime

        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return int(v.timestamp() * 1000)
    return int(v)


def plan_pruned(root: str, column: str, lo: int, hi: int) -> tuple[list[str], int]:
    """File list whose footer [min, max] for ``column`` overlaps
    [lo, hi); files with missing stats are conservatively kept.
    Returns (kept_files, total_files)."""
    files = sorted(glob.glob(os.path.join(root, "*.parquet")))
    kept = []
    for f in files:
        md = with_retries(lambda f=f: pq.read_metadata(f))
        idx = md.schema.to_arrow_schema().get_field_index(column)
        fmin = fmax = None
        known = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                known = False
                break
            mn, mx = _stat_to_int(st.min), _stat_to_int(st.max)
            fmin = mn if fmin is None else min(fmin, mn)
            fmax = mx if fmax is None else max(fmax, mx)
        if not known or (fmax >= lo and fmin < hi):
            kept.append(f)
    return kept, len(files)


def read_pruned(root: str, column: str, lo: int, hi: int,
                columns: list[str] | None = None
                ) -> tuple["ray.data.Dataset", int, int]:
    """Range read over a sharded layout: plan by footer stats, read only
    surviving files, and apply the EXACT residual filter per batch.
    Returns (dataset, files_read, files_total)."""
    kept, total = plan_pruned(root, column, lo, hi)
    if not kept:
        return ray.data.from_items([]), 0, total
    read_cols = columns
    if columns is not None and column not in columns:
        read_cols = [*columns, column]
    ds = ray.data.read_parquet(kept, columns=read_cols)

    def residual(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = batch[column]
        keep = pc.and_(pc.greater_equal(c, lo), pc.less(c, hi))
        batch = batch.filter(keep)
        if columns is not None and column not in columns:
            batch = batch.select(columns)
        return batch

    return ds.map_batches(residual, batch_format="pyarrow"), len(kept), total
