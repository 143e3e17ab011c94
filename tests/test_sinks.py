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
