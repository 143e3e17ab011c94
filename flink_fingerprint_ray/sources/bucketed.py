"""Persistent hash-bucketed table layout (Spark/Hive bucketing, SMB-join
style): write a dataset co-partitioned by a key ONCE, then join any two
tables bucketed on the same key with ZERO runtime exchange — each join
task reads exactly one bucket directory from each side.

At the 100-TB design point this is the difference between re-shuffling a
fact table for every join and paying the shuffle once at ingest: the
bucket id is a pure function of the key (same stable hash as
``stages/shuffle.grouped_map``), so any pipeline stage that already
hash-partitions by the key can reuse the files' co-location.  Layout::

    root/
      _BUCKETS            # "<n_buckets>\t<key_col,key_col,...>" spec file
      bucket=0000/part-00000.parquet   # one shard per input partition task
      bucket=0001/...

Resumable/writable at scale: each bucket directory may hold many shard
files; writers append new shard indices, a failed run re-writes only its
own shards.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..stages.shuffle import _row_hash, grouped_map


@ray.remote
def _write_bucket(table: pa.Table, path: str) -> int:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path)
    return table.num_rows


def _bucket_of(table: pa.Table, key_cols: list[str], n_buckets: int):
    import numpy as np

    return (_row_hash(table, key_cols) % np.uint64(n_buckets)).astype(np.int64)


def write_bucketed(ds: "ray.data.Dataset", root: str, key_cols: list[str],
                   n_buckets: int = 16) -> int:
    """Hash-partition ``ds`` by ``key_cols`` into ``n_buckets`` persistent
    bucket directories (one write task per bucket — parallel, nothing
    gathers on the driver).  Returns total rows written."""
    refs = grouped_map(ds, key_cols, _tag_noop, n_partitions=n_buckets,
                       return_indexed_refs=True)
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "_BUCKETS"), "w") as f:
        f.write(f"{n_buckets}\t{','.join(key_cols)}\n")
    writes = []
    for part, ref in refs:
        path = os.path.join(root, f"bucket={part:04d}", "part-00000.parquet")
        writes.append(_write_bucket.remote(ref, path))
    return sum(ray.get(writes))


def _tag_noop(t: pa.Table) -> pa.Table:
    return t


def read_spec(root: str) -> tuple[int, list[str]]:
    with open(os.path.join(root, "_BUCKETS")) as f:
        n, keys = f.read().strip().split("\t")
    return int(n), keys.split(",")


def _bucket_files(root: str, part: int) -> list[str]:
    d = os.path.join(root, f"bucket={part:04d}")
    if not os.path.isdir(d):
        return []
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.endswith(".parquet"))


@ray.remote
def _join_bucket(files_a: list[str], files_b: list[str], keys: list[str],
                 columns_a: list[str] | None, columns_b: list[str] | None,
                 join_type: str) -> pa.Table | None:
    if not files_a or not files_b:
        return None
    ta = pa.concat_tables([pq.read_table(f, columns=columns_a) for f in files_a])
    tb = pa.concat_tables([pq.read_table(f, columns=columns_b) for f in files_b])
    # Arrow's native hash join — vectorized, no Python rows
    return ta.join(tb, keys=keys, join_type=join_type)


def bucketed_join(root_a: str, root_b: str,
                  columns_a: list[str] | None = None,
                  columns_b: list[str] | None = None,
                  join_type: str = "inner") -> "ray.data.Dataset":
    """Shuffle-free equi-join of two tables bucketed on the SAME key spec:
    one task per bucket, each reading only its own pair of bucket
    directories.  Refuses mismatched layouts (different key or bucket
    count would silently drop matches)."""
    n_a, keys_a = read_spec(root_a)
    n_b, keys_b = read_spec(root_b)
    if (n_a, keys_a) != (n_b, keys_b):
        raise ValueError(
            f"bucket layouts differ: {root_a}=({n_a},{keys_a}) "
            f"{root_b}=({n_b},{keys_b}) — rebucket one side first")
    out = [
        _join_bucket.remote(_bucket_files(root_a, p), _bucket_files(root_b, p),
                            keys_a, columns_a, columns_b, join_type)
        for p in range(n_a)
    ]
    # size-probe tasks keep the joined tables off the driver
    sizes = ray.get([_probe_rows.remote(r) for r in out])
    done = [r for r, s in zip(out, sizes) if s]
    if not done:
        return ray.data.from_items([])
    return ray.data.from_arrow_refs(done)


@ray.remote
def _probe_rows(t: pa.Table | None) -> int:
    return 0 if t is None else t.num_rows
