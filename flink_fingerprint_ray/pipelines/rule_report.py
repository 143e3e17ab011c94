"""Config-driven rule-engine entry point — the reference's end-to-end ODR
orchestration (``src/data_input/process_odr.py:495-1197``) as ONE composed
Ray pipeline over the events table:

    rules JSON + overrides JSON + mapping file + events parquet
        → long→wide pivot per (key, bucket)            (A4 analog)
        → steady-running filter                        (RUNNING_FLAG)
        → duration-gated rule alarms                   (§2.10 + streaks)
        → previous-run alert-state suppression         (load_alert_state)
        → observation text with param desc/unit + IST  (M9/M10)
        → report + persisted active-rule state         (save_alert_state)

Every stage is the already-tested piece (``functions/rules.py``,
``duration_alarms``, ``sources/mapping.py``); this module is the single
entry a reference user would call instead of ``publish_process_odr``.

Scale shape: the corpus is hash-partitioned by key via ``grouped_map``
(all rows of a key in exactly one partition — per-key pivots, streak
scans and state are legal inside the vectorized sweep); rules/overrides/
mapping are config-sized and ship once inside the UDF closure (a single
``ray.put`` under ``grouped_map``), never per batch.  Nothing about the
composition materializes the corpus on the driver — only the alarm rows
(report-sized) come back.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.rules import (
    _mask,
    apply_overrides,
    duration_alarms,
    evaluate_rule,
    rule_duration_ms,
)
from ..stages.shuffle import grouped_map

BUCKET_MS = 300_000  # nominal cadence (reference row_duration analog)

REPORT_COLUMNS = ["user_id", "bucket", "rule_id", "rule_name", "param",
                  "value_cents", "final_observation"]


def rule_primary_param(rule: dict) -> str:
    """The reporting param of a rule — its first check (for IF rules the
    first ``then`` check, else the first ``if`` check), like the
    reference's per-alarm ``param`` column (process_odr.py observation
    rows carry the triggering check's tag)."""
    for branch in ("checks", "then", "if"):
        lst = rule.get(branch) or []
        if lst:
            return lst[0]["param"]
    raise ValueError(f"rule {rule.get('id')} has no checks")


# ---------------------------------------------------------------------------
# fixture corpus: 46 rules + overrides + mapping, deterministically built
# over the events table's five event types (the sandbox stand-in for the
# reference's kiln_rules.json 46-rule corpus + Excel mapping sheet)
# ---------------------------------------------------------------------------

_PARAMS = ["click", "error", "purchase", "signup", "view"]


def make_rule_corpus() -> tuple[list[dict], list[dict], dict[str, tuple[str, str]]]:
    """Deterministic 46-rule corpus exercising the full DSL surface:
    every op (> >= < <= between outside abs_gt deviation, const and
    column thresholds), AND/OR/IF logic, durations 0/600/900 s.  Returns
    ``(rules, overrides, mapping)`` where mapping is
    ``param -> (description, unit)``."""
    rules: list[dict] = []
    ops = [">", ">=", "<", "<="]
    # 20 single-check threshold rules over (param, op) pairs
    k = 0
    for p_i, param in enumerate(_PARAMS):
        for o_i, op in enumerate(ops):
            thr = 20.0 + 11.0 * k
            dur = (0, 600, 900)[k % 3]
            rules.append({"id": f"r{k:02d}_{param}_{o_i}", "name": f"{param} {op} {thr:g}",
                          "logic": "AND",
                          "checks": [{"param": param, "op": op, "value": thr,
                                      "duration_s": dur}]})
            k += 1
    # 10 two-check AND / OR rules
    for j in range(10):
        a, b = _PARAMS[j % 5], _PARAMS[(j + 2) % 5]
        logic = "AND" if j % 2 == 0 else "OR"
        rules.append({"id": f"r{k:02d}_{logic.lower()}", "name": f"{a}/{b} {logic}",
                      "logic": logic,
                      "checks": [{"param": a, "op": ">", "value": 30.0 + 7.0 * j,
                                  "duration_s": 600 if j % 3 == 0 else 0},
                                 {"param": b, "op": "<=", "value": 200.0 - 9.0 * j}]})
        k += 1
    # 6 range rules: between / outside
    for j in range(6):
        p = _PARAMS[j % 5]
        op = "between" if j % 2 == 0 else "outside"
        lo, hi = 40.0 + 10.0 * j, 150.0 + 15.0 * j
        rules.append({"id": f"r{k:02d}_{op}", "name": f"{p} {op}",
                      "logic": "AND",
                      "checks": [{"param": p, "op": op, "value": [lo, hi],
                                  "duration_s": 600 if j == 4 else 0}]})
        k += 1
    # 4 abs_gt / deviation rules (constant and column base)
    rules.append({"id": f"r{k:02d}_absgt", "name": "error abs", "logic": "AND",
                  "checks": [{"param": "error", "op": "abs_gt", "value": 120.0,
                              "duration_s": 0}]}); k += 1
    rules.append({"id": f"r{k:02d}_dev_const", "name": "view deviation", "logic": "AND",
                  "checks": [{"param": "view", "op": "deviation", "value": 90.0,
                              "base": 100.0, "duration_s": 0}]}); k += 1
    rules.append({"id": f"r{k:02d}_dev_col", "name": "error off click", "logic": "AND",
                  "checks": [{"param": "error", "op": "deviation", "value": 50.0,
                              "base": "click", "duration_s": 0}]}); k += 1
    rules.append({"id": f"r{k:02d}_col_thr", "name": "error above click", "logic": "AND",
                  "checks": [{"param": "error", "op": ">", "value": "click",
                              "duration_s": 600}]}); k += 1
    # 4 IF rules
    for j in range(4):
        c, t, e = _PARAMS[j], _PARAMS[(j + 1) % 5], _PARAMS[(j + 3) % 5]
        rule = {"id": f"r{k:02d}_if", "name": f"if {c} then {t}", "logic": "IF",
                "if": [{"param": c, "op": ">", "value": 60.0 + 20.0 * j}],
                "then": [{"param": t, "op": ">", "value": 25.0 + 5.0 * j,
                          "duration_s": 600 if j == 1 else 0}]}
        if j % 2 == 0:
            rule["else"] = [{"param": e, "op": "<", "value": 15.0 + 5.0 * j}]
        rules.append(rule); k += 1
    # 2 never-firing rules (missing param / impossible threshold) — the
    # reference corpus carries rules whose tags a deployment lacks
    rules.append({"id": f"r{k:02d}_missing", "name": "absent param", "logic": "AND",
                  "checks": [{"param": "pressure", "op": ">", "value": 1.0,
                              "duration_s": 0}]}); k += 1
    rules.append({"id": f"r{k:02d}_impossible", "name": "impossible", "logic": "AND",
                  "checks": [{"param": "click", "op": ">", "value": 1e9,
                              "duration_s": 0}]}); k += 1
    assert len(rules) == 46, len(rules)
    overrides = [
        # per-deployment threshold patches (process_odr.py:78-139 analog)
        {"rule_id": "r00_click_0", "param": "click", "op": ">", "value": 45.0},
        {"rule_id": "r20_and", "param": "click", "op": ">", "value": 55.0},
        {"rule_id": "r30_between", "param": "click", "op": "between",
         "value": [50.0, 180.0]},
        {"rule_id": "r39_col_thr", "param": "error", "op": ">",
         "value": "view"},  # re-point the column threshold
    ]
    mapping = {
        "click": ("click rate", "c/s"),
        "error": ("error rate", "e/s"),
        "purchase": ("purchase volume", "USD"),
        "signup": ("signup count", "n"),
        "view": ("view rate", "v/s"),
    }
    return rules, overrides, mapping


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(np.nan_to_num(np.asarray(x, dtype=np.float64)) * 100.0
                    + 0.5).astype(np.int64)


def _wide(df: pd.DataFrame, key_col: str, ts_col: str, event_col: str,
          value_col: str, params: list[str], bucket_ms: int) -> pd.DataFrame:
    tms = df[ts_col].astype("datetime64[ms]").astype("int64")
    df = df.assign(bucket=(tms // bucket_ms) * bucket_ms)
    w = df.pivot_table(index=[key_col, "bucket"], columns=event_col,
                       values=value_col, aggfunc="mean")
    return w.reindex(columns=params).reset_index()


def _make_sweep(rules: list[dict], mapping: dict, key_col: str, ts_col: str,
                event_col: str, value_col: str, params: list[str],
                bucket_ms: int, running: dict | None,
                suppressed: frozenset, emit_state: bool):
    """Per-partition vectorized sweep (closure state = config only)."""
    meta = {r["id"]: (r.get("name", r["id"]), rule_primary_param(r))
            for r in rules}

    def sweep(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        w = _wide(df, key_col, ts_col, event_col, value_col, params, bucket_ms)
        if running is not None:
            w = w[_mask(w, running)].reset_index(drop=True)
        alarms = duration_alarms(w, rules, [key_col], "bucket", bucket_ms)
        if suppressed and len(alarms):
            sup = (alarms[key_col].astype(str) + "|" + alarms["rule_id"]) \
                .isin(suppressed)
            alarms = alarms[~sup.to_numpy()].reset_index(drop=True)
        # decorate: rule meta + actual value at the alarm row + obs text
        names = alarms["rule_id"].map(lambda r: meta[r][0])
        prms = alarms["rule_id"].map(lambda r: meta[r][1])
        wi = w.set_index([key_col, "bucket"])
        vals = np.full(len(alarms), np.nan)
        for p in pd.unique(prms) if len(alarms) else []:
            m = (prms == p).to_numpy()
            if p in wi.columns:
                vals[m] = wi[p].reindex(
                    list(zip(alarms.loc[m, key_col], alarms.loc[m, "bucket"]))
                ).to_numpy()
        cents = _cents(vals)
        desc = prms.map(lambda p: mapping.get(p, (p, ""))[0]) if len(alarms) \
            else pd.Series([], dtype="object")
        unit = prms.map(lambda p: mapping.get(p, (p, ""))[1]) if len(alarms) \
            else pd.Series([], dtype="object")
        ist = pd.to_datetime(alarms["bucket"].to_numpy() + 19_800_000,
                             unit="ms").strftime("%Y-%m-%d %H:%M:%S")
        obs = (names.to_numpy(dtype=object) + ": " + desc.to_numpy(dtype=object)
               + " observed " + cents.astype(str).astype(object)
               + " " + unit.to_numpy(dtype=object)
               + " for user " + alarms[key_col].astype(str).to_numpy(dtype=object)
               + " at " + np.asarray(ist, dtype=object)) if len(alarms) \
            else np.empty(0, dtype=object)
        out = pd.DataFrame({
            key_col: alarms[key_col].to_numpy(),
            "bucket": alarms["bucket"].astype("int64").to_numpy(),
            "rule_id": alarms["rule_id"].to_numpy(),
            "rule_name": names.to_numpy(dtype=object),
            "param": prms.to_numpy(dtype=object),
            "value_cents": cents,
            "final_observation": obs,
        })
        if emit_state and len(w):
            # rule-active-at-last-row per key (reference rule_active_now):
            # rows marked bucket=-1 carry the state back to the driver
            last = w.groupby(key_col, sort=False).tail(1).reset_index(drop=True)
            srows = []
            for r in rules:
                m = evaluate_rule(last, r)
                for ki in last.loc[m, key_col].tolist():
                    srows.append((ki, -1, r["id"], "", "", 0, "__state__"))
            if srows:
                out = pd.concat([out, pd.DataFrame(
                    srows, columns=out.columns.tolist())], ignore_index=True)
        return out

    return sweep


def run_rule_report(
    ds,
    rules: list[dict],
    *,
    overrides: list[dict] | None = None,
    mapping: dict[str, tuple[str, str]] | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    value_col: str = "value",
    params: list[str] = tuple(_PARAMS),
    bucket_ms: int = BUCKET_MS,
    running: dict | None = None,
    prev_active: dict[str, bool] | None = None,
    emit_state: bool = False,
):
    """The composed rule run over an events Dataset: pivot → running
    filter → overridden duration rules → prev-state suppression →
    decorated observation report.  Returns a Dataset with
    ``REPORT_COLUMNS`` (plus ``bucket=-1`` state rows iff
    ``emit_state``)."""
    effective = apply_overrides(rules, overrides or [])
    suppressed = frozenset(k for k, v in (prev_active or {}).items() if v)
    sweep = _make_sweep(effective, mapping or {}, key_col, ts_col, event_col,
                        value_col, list(params), bucket_ms, running,
                        suppressed, emit_state)
    return grouped_map(ds, [key_col], sweep)


def rule_report_from_files(
    events_path: str,
    rules_path: str,
    *,
    overrides_path: str | None = None,
    mapping_path: str | None = None,
    state_path: str | None = None,
    out_dir: str | None = None,
    **kwargs,
):
    """File-driven orchestration, ``publish_process_odr`` shape: load the
    rules JSON (+ overrides JSON, + mapping parquet/CSV with columns
    ``param, description, unit``), suppress rules active at the END of
    the previous run (``state_path`` JSON, the load_alert_state /
    save_alert_state analog), run the report, persist the new state and
    optionally write the report as CSV + JSONL.  Returns the report as a
    pandas DataFrame (alarm rows only; report-sized by construction)."""
    import ray.data

    with open(rules_path, encoding="utf-8-sig") as f:
        rules = json.load(f)
    overrides = None
    if overrides_path:
        with open(overrides_path, encoding="utf-8-sig") as f:
            overrides = json.load(f)
    mapping = None
    if mapping_path:
        from ..sources.mapping import load_mapping_table

        desc = load_mapping_table(mapping_path, "param", "description")
        unit = load_mapping_table(mapping_path, "param", "unit")
        mapping = {p: (d, unit.get(p, "")) for p, d in desc.items()}
    prev: dict[str, bool] = {}
    if state_path and os.path.exists(state_path):
        with open(state_path) as f:
            prev = json.load(f)
    key_col = kwargs.get("key_col", "user_id")
    cols = [kwargs.get(k, d) for k, d in
            (("ts_col", "ts"), ("key_col", "user_id"),
             ("event_col", "event_type"), ("value_col", "value"))]
    ds = ray.data.read_parquet(events_path, columns=cols)
    out = run_rule_report(ds, rules, overrides=overrides, mapping=mapping,
                          prev_active=prev, emit_state=state_path is not None,
                          **kwargs).to_pandas()
    if state_path is not None:
        state_rows = out[out["final_observation"] == "__state__"]
        new_state = {f"{k}|{r}": True for k, r in
                     zip(state_rows[key_col], state_rows["rule_id"])}
        with open(state_path, "w") as f:
            json.dump(new_state, f, sort_keys=True)
        out = out[out["final_observation"] != "__state__"] \
            .reset_index(drop=True)
    out = out.sort_values([key_col, "bucket", "rule_id"],
                          kind="mergesort").reset_index(drop=True)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        out.to_csv(os.path.join(out_dir, "observations.csv"), index=False)
        out.to_json(os.path.join(out_dir, "observations.jsonl"),
                    orient="records", lines=True)
        # failure-mode counts (save_observations_to_files analog)
        out.groupby("rule_name", sort=True).size().rename("n").reset_index() \
            .to_csv(os.path.join(out_dir, "rule_counts.csv"), index=False)
    return out


# ---------------------------------------------------------------------------
# SQL oracle generation — the DuckDB mirror of the SAME config, built
# mechanically from the rule dicts so engine and oracle can never drift
# on which rules exist
# ---------------------------------------------------------------------------

def _sql_q(col: str) -> str:
    return '"' + col + '"'


def _check_sql(check: dict, params: list[str]) -> str:
    p, op, v = check["param"], check["op"], check.get("value")
    if p not in params:
        return "FALSE"
    x = _sql_q(p)
    if isinstance(v, str) and op not in ("between", "outside"):
        if v not in params:
            return "FALSE"
        v = _sql_q(v)
    if op in (">", ">=", "<", "<=", "==", "!="):
        sql_op = {"==": "=", "!=": "<>"}.get(op, op)
        return f"COALESCE({x} {sql_op} {v}, FALSE)"
    if op == "abs_gt":
        return f"COALESCE(abs({x}) > {v}, FALSE)"
    if op == "between":
        return f"COALESCE({x} BETWEEN {v[0]} AND {v[1]}, FALSE)"
    if op == "outside":
        return f"COALESCE({x} < {v[0]} OR {x} > {v[1]}, FALSE)"
    if op == "deviation":
        b = check.get("base", 0.0)
        if isinstance(b, str):
            if b not in params:
                return "FALSE"
            b = _sql_q(b)
        return f"COALESCE(abs({x} - {b}) > {v}, FALSE)"
    raise ValueError(f"unknown op: {op}")


def _branch_sql(checks: list[dict], logic: str, params: list[str]) -> str:
    if not checks:
        return "FALSE"
    joiner = " OR " if logic == "OR" else " AND "
    return "(" + joiner.join(_check_sql(c, params) for c in checks) + ")"


def _rule_sql(rule: dict, params: list[str]) -> str:
    logic = rule.get("logic", "AND").upper()
    if logic == "IF":
        cond = _branch_sql(rule["if"], "AND", params)
        then_m = _branch_sql(rule["then"], "AND", params)
        else_m = _branch_sql(rule.get("else") or [], "AND", params)
        return f"(CASE WHEN {cond} THEN {then_m} ELSE {else_m} END)"
    return _branch_sql(rule["checks"], logic, params)


def rules_to_sql(
    rules: list[dict],
    *,
    overrides: list[dict] | None = None,
    mapping: dict[str, tuple[str, str]] | None = None,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    value_col: str = "value",
    params: list[str] = tuple(_PARAMS),
    bucket_ms: int = BUCKET_MS,
    running: dict | None = None,
) -> str:
    """ANSI-SQL (DuckDB) equivalent of ``run_rule_report`` for the same
    config: wide pivot CTE → per-rule mask columns → per-rule streak
    scans → decorated report rows.  Columns match ``REPORT_COLUMNS``."""
    effective = apply_overrides(rules, overrides or [])
    params = list(params)
    mapping = mapping or {}
    piv = ",\n         ".join(
        f"AVG({value_col}) FILTER ({event_col} = '{p}') AS {_sql_q(p)}"
        for p in params)
    run_where = ""
    if running is not None:
        run_where = f"\n  WHERE {_check_sql(running, params)}"
    mask_cols = ",\n         ".join(
        f"{_rule_sql(r, params)} AS m{i}" for i, r in enumerate(effective))
    grp_cols = ",\n         ".join(
        f"SUM(CASE WHEN m{i} THEN 0 ELSE 1 END) OVER win AS g{i}"
        for i in range(len(effective)))
    branches = []
    for i, r in enumerate(effective):
        dur = rule_duration_ms(r)
        name = r.get("name", r["id"]).replace("'", "''")
        p = rule_primary_param(r)
        d, u = mapping.get(p, (p, ""))
        d, u = d.replace("'", "''"), u.replace("'", "''")
        val = (f"COALESCE({_sql_q(p)}, 0.0)" if p in params else "0.0")
        streak = (f", SUM(step) OVER (PARTITION BY {key_col}, g{i} "
                  f"ORDER BY bucket) AS streak" if dur > 0 else "")
        having = f"WHERE streak >= {dur}" if dur > 0 else ""
        branches.append(f"""
SELECT {key_col}, bucket, '{r["id"]}' AS rule_id, '{name}' AS rule_name,
       '{p}' AS param, value_cents,
       '{name}: {d} observed ' || CAST(value_cents AS VARCHAR) || ' {u} for user '
         || CAST({key_col} AS VARCHAR) || ' at '
         || strftime(epoch_ms(bucket + 19800000), '%Y-%m-%d %H:%M:%S')
         AS final_observation
FROM (
  SELECT {key_col}, MIN(bucket) AS bucket,
         arg_min(CAST(FLOOR(pv * 100 + 0.5) AS BIGINT), bucket) AS value_cents
  FROM (SELECT {key_col}, bucket, g{i}, {val} AS pv{streak} FROM g WHERE m{i})
  {having}
  GROUP BY {key_col}, g{i}
)""")
    union = "\nUNION ALL".join(branches)
    return f"""
WITH w0 AS (
  SELECT {key_col}, (epoch_ms({ts_col}) // {bucket_ms}) * {bucket_ms} AS bucket,
         {piv}
  FROM {table} GROUP BY 1, 2
),
w AS (
  SELECT * FROM w0{run_where}
),
seq AS (
  SELECT *, COALESCE(bucket - lag(bucket) OVER
            (PARTITION BY {key_col} ORDER BY bucket), {bucket_ms}) AS step
  FROM w
),
m AS (
  SELECT {key_col}, bucket, step,
         {",".join(_sql_q(p) for p in params)},
         {mask_cols}
  FROM seq
),
g AS (
  SELECT *,
         {grp_cols}
  FROM m WINDOW win AS (PARTITION BY {key_col} ORDER BY bucket)
){union}
"""
