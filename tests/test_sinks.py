"""S7/S8: CSV / JSON / partitioned-parquet sink coverage — query results
round-trip through ds.write_csv / write_json / write_parquet (the
reference's pandas to_csv / JSONL writers, helpers.py:706-755)."""

import glob
import os
import tempfile

import pandas as pd
import pytest


def test_csv_json_parquet_sinks(ray_session):
    import ray.data

    from flink_fingerprint_ray.pipelines.queries import q_tumbling_stats

    ds = q_tumbling_stats("/root/testdata/sf0.001")
    with tempfile.TemporaryDirectory() as tmp:
        csv_dir, json_dir, pq_dir = (os.path.join(tmp, d) for d in ("csv", "json", "pq"))
        ds.write_csv(csv_dir)
        ds.write_json(json_dir)
        ds.write_parquet(pq_dir)
        base = ds.to_pandas().sort_values(["event_type", "window_start"]).reset_index(drop=True)
        assert len(base) > 0
        back_csv = pd.concat([pd.read_csv(f) for f in glob.glob(csv_dir + "/*")])
        back_pq = ray.data.read_parquet(pq_dir).to_pandas()
        back_json = pd.concat([pd.read_json(f, lines=True) for f in glob.glob(json_dir + "/*")])
        for back in (back_csv, back_pq, back_json):
            b = back[base.columns.tolist()].sort_values(["event_type", "window_start"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(b, base, check_dtype=False)


def test_manifest_refuses_resume_on_token_hash_mismatch(tmp_path):
    """Persisted minhash/simhash state embeds polars' seeded token hash;
    a manifest written by an incompatible hash build must refuse resume
    rather than silently corrupting dup-cluster counts."""
    import json

    from flink_fingerprint_ray.pipelines.sink import CheckpointManifest

    out = str(tmp_path)
    m = CheckpointManifest(out)
    m.commit(0, 1000, {}, {}, {})
    assert "token_hash_fp" in m.state

    # same build → loads fine
    m2 = CheckpointManifest(out)
    assert m2.cursor == 0

    # tamper: simulate a polars upgrade changing the hash
    with open(m.path) as f:
        state = json.load(f)
    state["token_hash_fp"] = "0" * 40
    with open(m.path, "w") as f:
        json.dump(state, f)
    with pytest.raises(RuntimeError, match="incompatible token-hash"):
        CheckpointManifest(out)


class TestBucketedLayout:
    """sources/bucketed.py: persistent SMB-style hash bucketing."""

    def _write_pair(self, tmp_path, n_buckets=8):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from flink_fingerprint_ray.sources.bucketed import write_bucketed

        rng = np.random.RandomState(5)
        left = pa.table({
            "custkey": pa.array(rng.randint(0, 200, 500), pa.int64()),
            "seg": pa.array([f"S{i % 3}" for i in range(500)]),
        })
        right = pa.table({
            "custkey": pa.array(rng.randint(0, 250, 800), pa.int64()),
            "val": pa.array(rng.randint(0, 10**6, 800), pa.int64()),
        })
        la, ra = str(tmp_path / "left"), str(tmp_path / "right")
        nl = write_bucketed(ray.data.from_arrow(left), la, ["custkey"], n_buckets)
        nr = write_bucketed(ray.data.from_arrow(right), ra, ["custkey"], n_buckets)
        assert (nl, nr) == (500, 800)
        return left, right, la, ra

    def test_roundtrip_preserves_rows_and_colocates_keys(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow.parquet as pq

        from flink_fingerprint_ray.sources.bucketed import _bucket_files, read_spec

        left, _, la, _ = self._write_pair(tmp_path)
        n, keys = read_spec(la)
        assert (n, keys) == (8, ["custkey"])
        seen = []
        owner = {}
        for p in range(n):
            for f in _bucket_files(la, p):
                t = pq.read_table(f)
                seen.append(t.to_pandas())
                for k in t["custkey"].to_pylist():
                    assert owner.setdefault(k, p) == p  # key owned by ONE bucket
        got = pd.concat(seen).sort_values(["custkey", "seg"]).reset_index(drop=True)
        want = left.to_pandas().sort_values(["custkey", "seg"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_bucketed_join_matches_pandas_merge(self, ray_session, tmp_path):
        import pandas as pd

        from flink_fingerprint_ray.sources.bucketed import bucketed_join

        left, right, la, ra = self._write_pair(tmp_path)
        got = (bucketed_join(la, ra).to_pandas()
               .sort_values(["custkey", "seg", "val"]).reset_index(drop=True))
        want = (left.to_pandas().merge(right.to_pandas(), on="custkey")
                .sort_values(["custkey", "seg", "val"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)

    def test_mismatched_layouts_refused(self, ray_session, tmp_path):
        import pyarrow as pa
        import pytest
        import ray.data

        from flink_fingerprint_ray.sources.bucketed import bucketed_join, write_bucketed

        t = pa.table({"custkey": pa.array([1, 2, 3], pa.int64())})
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        write_bucketed(ray.data.from_arrow(t), a, ["custkey"], 8)
        write_bucketed(ray.data.from_arrow(t), b, ["custkey"], 4)
        with pytest.raises(ValueError, match="bucket layouts differ"):
            bucketed_join(a, b)


class TestPrunedRead:
    """sources/pruned.py: footer-stats file pruning for range reads."""

    def test_plan_skips_out_of_range_files_and_read_is_exact(self, ray_session, tmp_path):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from flink_fingerprint_ray.sources.pruned import read_pruned, write_sharded

        rng = np.random.RandomState(11)
        ts = rng.randint(0, 40, 2000).astype(np.int64) * 100 + rng.randint(0, 100, 2000)
        t = pa.table({
            "part_key": pa.array(ts // 400, pa.int64()),
            "ts_ms": pa.array(ts, pa.int64()),
            "v": pa.array(rng.randint(0, 10**6, 2000), pa.int64()),
        })
        root = str(tmp_path / "shards")
        manifest = write_sharded(ray.data.from_arrow(t), root, "part_key")
        assert len(manifest) == 10  # 4000/400 part values
        lo, hi = 850, 1250  # straddles shard boundaries mid-file
        ds, n_read, n_total = read_pruned(root, "ts_ms", lo, hi, columns=["ts_ms", "v"])
        assert n_total == 10 and 1 <= n_read <= 3  # pruning actually happened
        got = ds.to_pandas().sort_values(["ts_ms", "v"]).reset_index(drop=True)
        df = t.to_pandas()
        want = (df[(df.ts_ms >= lo) & (df.ts_ms < hi)][["ts_ms", "v"]]
                .sort_values(["ts_ms", "v"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)

    def test_empty_range_reads_nothing(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from flink_fingerprint_ray.sources.pruned import read_pruned, write_sharded

        t = pa.table({
            "part_key": pa.array([0, 0, 1, 1], pa.int64()),
            "ts_ms": pa.array([10, 20, 410, 420], pa.int64()),
        })
        root = str(tmp_path / "s2")
        write_sharded(ray.data.from_arrow(t), root, "part_key")
        ds, n_read, n_total = read_pruned(root, "ts_ms", 10_000, 20_000)
        assert (n_read, n_total) == (0, 2) and ds.count() == 0


def test_sorted_run_membership_spills_and_answers():
    """The band-registry tier must keep answering exact membership across
    spills and run merges while bounding the in-memory array."""
    import numpy as np

    from flink_fingerprint_ray.state.store import SortedRunMembership

    m = SortedRunMembership(mem_cap=1000, max_runs=2,
                            spill_prefix="ffr_test_member_")
    rng = np.random.default_rng(7)
    all_keys = np.unique(
        rng.integers(1, 1 << 40, size=13_000, dtype=np.uint64))[:12_000]
    rng.shuffle(all_keys)
    for i in range(0, len(all_keys), 900):  # forces many spills + merges
        m.add(all_keys[i:i + 900])
    assert len(m._mem) <= 1000
    assert len(m._runs) <= 3  # merge keeps the run count bounded
    assert len(m) == len(np.unique(all_keys))
    probe = np.concatenate([all_keys[::7], all_keys[::7] + np.uint64(1 << 41)])
    got = m.contains(probe)
    assert got[:len(all_keys[::7])].all()
    assert not got[len(all_keys[::7]):].any()
    vals = m.values()
    assert np.array_equal(vals, np.unique(all_keys))
