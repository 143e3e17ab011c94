"""File-driven metadata mapping (S10 analog).

The reference loads an Excel mapping sheet per deployment and builds a
generic-tag → machine-tag lookup, skipping blank cells and stripping
whitespace (``src/data_input/process_odr.py:699-711``); the lookup then
selects/renames the incoming wide columns.  Here the mapping is a small
CSV or Parquet table loaded ONCE on the driver and broadcast with
``ray.put`` — every task reads the same plasma object, nothing is
re-shipped per batch (SURVEY.md J2/S10).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq


def _clean(v):
    """Reference cell hygiene: None/NaN → skip; strings stripped; blank
    strings → skip (process_odr.py:704-711)."""
    if v is None:
        return None
    if isinstance(v, float) and v != v:  # NaN
        return None
    if isinstance(v, str):
        v = v.strip()
        if not v:
            return None
    return v


def load_mapping_table(path: str, key_col: str, value_col: str) -> dict:
    """Load a two-column lookup from a CSV or Parquet mapping file.

    Rows whose key or value is null/blank are skipped; string cells are
    stripped.  Later rows win on duplicate keys (like rebuilding a dict
    row-by-row in the reference's loop).
    """
    if path.endswith(".csv"):
        t = pacsv.read_csv(path)
    else:
        t = pq.read_table(path, columns=[key_col, value_col])
    out: dict = {}
    for k, v in zip(t[key_col].to_pylist(), t[value_col].to_pylist()):
        k, v = _clean(k), _clean(v)
        if k is None or v is None:
            continue
        out[k] = v
    return out


def apply_column_mapping(table: pa.Table, mapping: dict[str, str],
                         keep: list[str] | None = None) -> pa.Table:
    """Select + rename columns by a generic→actual mapping — the tag-sheet
    use in the reference: the pipeline speaks generic names, each
    deployment's sheet maps them onto that machine's column names.

    ``mapping`` maps generic name → column present in ``table``; generic
    names whose column is absent are skipped (the reference skips rules
    over unmapped tags).  ``keep`` columns pass through unchanged.
    """
    cols, names = [], []
    for c in keep or []:
        cols.append(table[c])
        names.append(c)
    for generic, actual in mapping.items():
        if actual in table.column_names:
            cols.append(table[actual])
            names.append(generic)
    return pa.table(dict(zip(names, cols)))
