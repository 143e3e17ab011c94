"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself before importing this module;
nothing here (or in ``flink_fingerprint_ray``) calls ``ray.init()`` /
``ray.shutdown()``.

- ``entry()``: flagship streaming fingerprint pipeline over pages derived
  from ``/root/testdata/sf0.001/documents.parquet`` — epoched source,
  watermarks, tumbling+sliding+session windows, near-dup counts, stateful
  update join, epoch-fenced sink — returns the committed fingerprints.
- ``queries()``: one entry per implemented operator/pipeline from
  SURVEY.md §2 (see ``flink_fingerprint_ray/pipelines/queries.py``).
- ``oracle_sql()``: DuckDB-equivalent SQL with IDENTICAL column names for
  every SQL-expressible query; sketch/state-machine ops are rows-only.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import pandas as pd

    from flink_fingerprint_ray import fixtures
    from flink_fingerprint_ray.pipelines.streaming import (
        PipelineConfig,
        StreamingFingerprintPipeline,
    )

    sf_dir = "/root/testdata/sf0.001"
    tmp = tempfile.mkdtemp(prefix="ffr_entry_")
    try:
        pages = fixtures.pages_from_documents(sf_dir)
        updates = fixtures.make_page_updates(pages, seed=43)
        fixtures.write_epochs(pages, tmp, n_epochs=4, prefix="pages")
        fixtures.write_epochs(updates, tmp, n_epochs=4, prefix="updates")
        cfg = PipelineConfig(
            sliding=(120_000, 60_000), session_gap_ms=120_000, n_state_partitions=4
        )
        pipe = StreamingFingerprintPipeline(
            os.path.join(tmp, "pages"),
            os.path.join(tmp, "out"),
            updates_root=os.path.join(tmp, "updates"),
            cfg=cfg,
        )
        pipe.run()
        out: pd.DataFrame = pipe.result_dataset().to_pandas()
        pipe.shutdown()
        return out.sort_values(
            ["window_kind", "key_lang", "key_host", "window_start"]
        ).reset_index(drop=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from flink_fingerprint_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from flink_fingerprint_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
