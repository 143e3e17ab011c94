"""Declarative rule DSL: the engine analog of the reference's JSON rule
corpus and its vectorized mask evaluator.

Reference semantics being re-created (SURVEY.md §2.10):
- rules are config data, not code: ``{id, name, logic: AND|OR|IF,
  checks: [...], if/then/else}`` (``src/data_input/files/cement/
  kiln_rules.json``, 46 rules);
- each check is ``{param, op, value}`` evaluated as a vectorized boolean
  mask over a WIDE frame (one column per param), ops from the reference's
  ops_map (``src/data_input/helpers.py:47-60``): ``> >= < <= == !=
  between abs_gt outside deviation``;
- missing params / NaN cells never trigger (the reference skips rules
  whose columns are absent, ``process_odr.py:244-254`` — here the
  per-row analog: NaN compares False);
- AND/OR combine check masks (``helpers.py:409-477``); IF selects the
  ``then`` branch mask where the ``if`` mask holds, else the ``else``
  branch (``kiln_rules.json`` IF rules);
- thresholds may NAME A COLUMN: a string ``value`` resolves to that
  column row-wise for any comparison op (``helpers.py:397-400``), like
  ``deviation``'s column ``base``;
- duration-based streak triggering (``process_odr.py:269-303``):
  ``duration_alarms`` composes the instantaneous mask layer with the
  reference's per-rule streak gate — one alarm per continuous streak,
  fired at the first row where the accumulated time-delta streak reaches
  ``max(duration_s)`` over the rule's checks (duration 0 → first row of
  the streak), step = delta to the previous present row (first row uses
  the nominal cadence, ``row_duration``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _mask(df: pd.DataFrame, check: dict) -> np.ndarray:
    """One check -> boolean mask; NaN/missing never triggers."""
    param = check["param"]
    if param not in df.columns:
        return np.zeros(len(df), dtype=bool)
    x = df[param].to_numpy(dtype=np.float64)
    ok = ~np.isnan(x)
    op = check["op"]
    v = check.get("value")
    # value-as-column-name (helpers.py:397-400): a string threshold
    # resolves to that column, row-wise; NaN threshold never triggers
    if isinstance(v, str) and op not in ("between", "outside"):
        if v not in df.columns:
            return np.zeros(len(df), dtype=bool)
        v = df[v].to_numpy(dtype=np.float64)
        ok = ok & ~np.isnan(v)
    with np.errstate(invalid="ignore"):
        if op == ">":
            m = x > v
        elif op == ">=":
            m = x >= v
        elif op == "<":
            m = x < v
        elif op == "<=":
            m = x <= v
        elif op == "==":
            m = x == v
        elif op == "!=":
            m = x != v
        elif op == "abs_gt":
            m = np.abs(x) > v
        elif op == "between":  # inclusive, like the reference
            lo, hi = v
            m = (x >= lo) & (x <= hi)
        elif op == "outside":
            lo, hi = v
            m = (x < lo) | (x > hi)
        elif op == "deviation":  # |x - base| > value; base may be a column
            base = check.get("base", 0.0)
            if isinstance(base, str):
                if base not in df.columns:
                    return np.zeros(len(df), dtype=bool)
                b = df[base].to_numpy(dtype=np.float64)
                ok = ok & ~np.isnan(b)
            else:
                b = base
            m = np.abs(x - b) > v
        else:
            raise ValueError(f"unknown op: {op}")
    return ok & np.nan_to_num(m, nan=False).astype(bool)


def evaluate_rule(df: pd.DataFrame, rule: dict) -> np.ndarray:
    """Wide frame -> boolean trigger mask for one rule."""
    logic = rule.get("logic", "AND").upper()
    if logic == "IF":
        cond = _combine(df, rule["if"], "AND")
        then_m = _combine(df, rule["then"], "AND")
        else_m = _combine(df, rule.get("else", []), "AND") if rule.get("else") else np.zeros(len(df), dtype=bool)
        return np.where(cond, then_m, else_m)
    return _combine(df, rule["checks"], logic)


def _combine(df: pd.DataFrame, checks: list[dict], logic: str) -> np.ndarray:
    if not checks:
        return np.zeros(len(df), dtype=bool)
    masks = [_mask(df, c) for c in checks]
    out = masks[0]
    for m in masks[1:]:
        out = (out | m) if logic == "OR" else (out & m)
    return out


def evaluate_rules(df: pd.DataFrame, rules: list[dict]) -> pd.DataFrame:
    """Wide frame -> one boolean column per rule id."""
    return pd.DataFrame({r["id"]: evaluate_rule(df, r) for r in rules}, index=df.index)


def rule_duration_ms(rule: dict) -> int:
    """max(duration_s) over every check of the rule (all branches), like
    the reference's ``duration_needed`` (``process_odr.py:269``)."""
    checks = list(rule.get("checks", []))
    for branch in ("if", "then", "else"):
        checks += rule.get(branch, []) or []
    return 1000 * max((int(c.get("duration_s", 0)) for c in checks), default=0)


def duration_alarms(
    df: pd.DataFrame,
    rules: list[dict],
    key_cols: list[str],
    ts_col: str,
    row_duration_ms: int,
) -> pd.DataFrame:
    """Duration-gated rule alarms over a wide keyed time series — the
    end-to-end composition the reference runs per batch
    (``process_odr.py:269-303``): "error > 10 for 120 s" as ONE operator.

    One alarm per (key, rule, continuous true-streak), emitted at the
    first row where the accumulated step sum reaches the rule's duration
    (``rule_duration_ms``); the step of a row is the time delta to the
    previous present row of the same key (first row: ``row_duration_ms``,
    the reference's nominal cadence fallback).  Fully vectorized: one
    global sort + per-rule cumulative scans, no per-row Python loop.

    Returns columns ``key_cols + [ts_col, "rule_id"]``.
    """
    df = df.sort_values(key_cols + [ts_col], kind="stable").reset_index(drop=True)
    n = len(df)
    if n == 0:
        return pd.DataFrame({**{k: pd.Series([], dtype="int64") for k in key_cols},
                             ts_col: pd.Series([], dtype="int64"),
                             "rule_id": pd.Series([], dtype="object")})
    ts = df[ts_col].to_numpy(dtype=np.int64)
    newkey = np.zeros(n, dtype=bool)
    newkey[0] = True
    for k in key_cols:
        kv = df[k].to_numpy()
        newkey[1:] |= kv[1:] != kv[:-1]
    step = np.empty(n, dtype=np.int64)
    step[0] = row_duration_ms
    step[1:] = ts[1:] - ts[:-1]
    step[newkey] = row_duration_ms
    # duplicate/unsorted timestamps within a key: the reference coerces
    # zero/NaN deltas to the nominal cadence (process_odr.py step
    # handling), so a repeated timestamp still accrues row_duration_ms
    step[step <= 0] = row_duration_ms

    parts = []
    for rule in rules:
        m = evaluate_rule(df, rule)
        dur_ms = rule_duration_ms(rule)
        # streak groups: a reset (false row or key boundary) opens a new
        # group; the trues that follow share it
        grp = np.cumsum((~m) | newkey)
        streak = pd.Series(np.where(m, step, 0)).groupby(grp).cumsum().to_numpy()
        cross = m & (streak >= dur_ms)
        # first crossing per group (cross is monotone along a streak)
        prev_cross_same = np.zeros(n, dtype=bool)
        prev_cross_same[1:] = cross[:-1] & (grp[1:] == grp[:-1])
        trigger = cross & ~prev_cross_same
        if trigger.any():
            hit = df.loc[trigger, key_cols + [ts_col]].copy()
            hit["rule_id"] = rule["id"]
            parts.append(hit)
    if not parts:
        return pd.DataFrame({**{k: pd.Series([], dtype="int64") for k in key_cols},
                             ts_col: pd.Series([], dtype="int64"),
                             "rule_id": pd.Series([], dtype="object")})
    return pd.concat(parts, ignore_index=True)


def apply_overrides(rules: list[dict], overrides: list[dict]) -> list[dict]:
    """Per-deployment rule patching keyed by (rule_id, param, op) — the
    reference's equipment-specific threshold/duration overlay
    (``process_odr.py:78-139``).  Each override:
    ``{rule_id, param, op, value}`` replaces the matching check's value
    (and may carry new ``op``/``base``).  Returns NEW rule dicts; input
    is not mutated."""
    import copy

    by_key = {(o["rule_id"], o["param"], o["op"]): o for o in overrides}
    out = copy.deepcopy(rules)
    for rule in out:
        checks = list(rule.get("checks", []))
        for branch in ("if", "then", "else"):
            checks += rule.get(branch, []) or []
        for c in checks:
            o = by_key.get((rule["id"], c["param"], c["op"]))
            if o is not None:
                c["value"] = o["value"]
                if "new_op" in o:
                    c["op"] = o["new_op"]
                if "base" in o:
                    c["base"] = o["base"]
    return out
