"""Config-driven rule-engine orchestration (reference
``process_odr.py:495-1197`` analog): rules JSON + overrides + mapping
file + events parquet → observation report + persisted alert state."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flink_fingerprint_ray.pipelines.rule_report import (
    make_rule_corpus,
    rule_report_from_files,
    run_rule_report,
)

SF = "/root/testdata/sf0.001"


def test_corpus_shape():
    rules, overrides, mapping = make_rule_corpus()
    assert len(rules) == 46
    ops = {c["op"] for r in rules
           for b in ("checks", "if", "then", "else")
           for c in (r.get(b) or [])}
    assert {">", ">=", "<", "<=", "between", "outside",
            "abs_gt", "deviation"} <= ops
    assert any(r.get("logic") == "IF" for r in rules)
    assert all(o["rule_id"] in {r["id"] for r in rules} for o in overrides)


def test_overrides_change_report(ray_session):
    import ray.data

    rules, overrides, mapping = make_rule_corpus()
    ds = ray.data.read_parquet(os.path.join(SF, "events.parquet"),
                               columns=["ts", "user_id", "event_type", "value"])
    base = run_rule_report(ds, rules, mapping=mapping).to_pandas()
    patched = run_rule_report(ds, rules, overrides=overrides,
                              mapping=mapping).to_pandas()
    # the r00 threshold override (20 -> 45) must strictly shrink that
    # rule's alarms; untouched rules are identical
    assert len(patched[patched.rule_id == "r00_click_0"]) < \
        len(base[base.rule_id == "r00_click_0"])
    for rid in ("r01_click_1", "r05_error_1"):
        pd.testing.assert_frame_equal(
            base[base.rule_id == rid].reset_index(drop=True),
            patched[patched.rule_id == rid].reset_index(drop=True))


def test_report_decoration(ray_session):
    import ray.data

    rules, overrides, mapping = make_rule_corpus()
    ds = ray.data.read_parquet(os.path.join(SF, "events.parquet"),
                               columns=["ts", "user_id", "event_type", "value"])
    rep = run_rule_report(ds, rules, overrides=overrides,
                          mapping=mapping).to_pandas()
    assert len(rep) > 0
    row = rep[rep.rule_id == "r04_error_0"].iloc[0]
    assert row["param"] == "error"
    assert "error rate" in row["final_observation"]
    assert "e/s" in row["final_observation"]
    assert f"for user {row['user_id']}" in row["final_observation"]
    # never-firing rules stay silent
    assert not (rep.rule_id.str.contains("missing")
                | rep.rule_id.str.contains("impossible")).any()


def test_from_files_end_to_end_with_state(ray_session, tmp_path):
    """Two consecutive runs over the same window: the second run must
    suppress every rule the first run left active (the reference's
    load_alert_state / save_alert_state round trip)."""
    rules, overrides, mapping = make_rule_corpus()
    rules_p = tmp_path / "rules.json"
    over_p = tmp_path / "overrides.json"
    map_p = tmp_path / "mapping.parquet"
    state_p = tmp_path / "alert_state.json"
    out_dir = tmp_path / "report"
    rules_p.write_text(json.dumps(rules))
    over_p.write_text(json.dumps(overrides))
    pq.write_table(pa.table({
        "param": list(mapping),
        "description": [mapping[p][0] for p in mapping],
        "unit": [mapping[p][1] for p in mapping],
    }), map_p)

    first = rule_report_from_files(
        os.path.join(SF, "events.parquet"), str(rules_p),
        overrides_path=str(over_p), mapping_path=str(map_p),
        state_path=str(state_p), out_dir=str(out_dir))
    assert len(first) > 0
    assert os.path.exists(state_p)
    state = json.loads(state_p.read_text())
    assert state and all(v is True for v in state.values())
    # report files written
    csv = pd.read_csv(out_dir / "observations.csv")
    assert len(csv) == len(first)
    assert os.path.exists(out_dir / "rule_counts.csv")

    second = rule_report_from_files(
        os.path.join(SF, "events.parquet"), str(rules_p),
        overrides_path=str(over_p), mapping_path=str(map_p),
        state_path=str(state_p))
    # every (key, rule) pair active at the end of run 1 is suppressed
    sup = {tuple(k.split("|")) for k in state}
    got = set(zip(second["user_id"].astype(str), second["rule_id"]))
    assert not (got & sup)
    # suppression only removes rows, never adds
    k1 = set(zip(first["user_id"].astype(str), first["rule_id"],
                 first["bucket"]))
    k2 = set(zip(second["user_id"].astype(str), second["rule_id"],
                 second["bucket"]))
    assert k2 <= k1 and len(k2) < len(k1)


def test_duration_gate_needs_streak(ray_session):
    """A duration rule must NOT fire on an isolated true bucket: engine
    vs a hand-built two-user frame."""
    import ray.data

    rules = [{"id": "need600", "logic": "AND",
              "checks": [{"param": "error", "op": ">", "value": 5.0,
                          "duration_s": 600}]}]
    ts = pd.to_datetime([0, 300_000, 600_000, 0, 600_000], unit="ms")
    t = pa.table({
        "ts": pa.array(ts),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["error"] * 5),
        "value": pa.array([9.0, 9.0, 1.0, 9.0, 9.0], pa.float64()),
    })
    ds = ray.data.from_arrow(t)
    rep = run_rule_report(ds, rules).to_pandas()
    # user 1: buckets 0+300k true -> streak 300k+300k = 600k fires at
    # bucket 300000; user 2: true at 0 and 600k -> streak 300k then
    # 300k+600k(step)=900k fires at 600000
    got = set(zip(rep.user_id, rep.bucket))
    assert got == {(1, 300_000), (2, 600_000)}
