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
