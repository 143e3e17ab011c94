"""S6 (fault-tolerant read) and S10 (file-driven metadata mapping).

The reference's REST reader retries transient transport errors with
backoff (``src/data_input/api.py:18-154``); its metadata sheet loads a
tag mapping per deployment, skipping blank cells
(``src/data_input/process_odr.py:699-711``).
"""

import os

import pandas as pd
import pyarrow as pa
import pytest

from flink_fingerprint_ray.sources.retry import with_retries


class _Flaky:
    def __init__(self, fail_times: int, exc=OSError):
        self.fail_times = fail_times
        self.exc = exc
        self.calls = 0

    def __call__(self):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise self.exc("transient blip")
        return "ok"


def test_with_retries_recovers_from_transient_errors():
    f = _Flaky(2)
    assert with_retries(f, retries=3, backoff_s=0) == "ok"
    assert f.calls == 3


def test_with_retries_exhausts_and_raises():
    f = _Flaky(10)
    with pytest.raises(OSError):
        with_retries(f, retries=2, backoff_s=0)
    assert f.calls == 3


def test_with_retries_does_not_catch_application_errors():
    f = _Flaky(1, exc=ValueError)
    with pytest.raises(ValueError):
        with_retries(f, retries=3, backoff_s=0)
    assert f.calls == 1  # no retry on non-transient


@pytest.mark.parametrize("exc", [FileNotFoundError, PermissionError,
                                 NotADirectoryError, IsADirectoryError])
def test_with_retries_does_not_retry_permanent_config_errors(exc):
    """Missing/unreadable paths are permanent config errors, not transport
    blips — they must propagate immediately despite subclassing OSError."""
    f = _Flaky(1, exc=exc)
    with pytest.raises(exc):
        with_retries(f, retries=3, backoff_s=0)
    assert f.calls == 1


def test_epoch_commits_despite_transient_read_faults(
        ray_session, tmp_path, monkeypatch):
    """Inject transient IO failures into the per-file parquet stats reads
    (EpochSource discovery) AND the join build-side file reads — the
    pipeline must still commit every epoch with oracle-exact rows."""
    import pyarrow.parquet as pq

    from flink_fingerprint_ray import fixtures
    from flink_fingerprint_ray.oracle import oracle_fingerprints
    from flink_fingerprint_ray.pipelines.streaming import (
        PipelineConfig,
        StreamingFingerprintPipeline,
    )

    root = str(tmp_path)
    pages = fixtures.make_pages(n_docs=400, seed=21)
    updates = fixtures.make_page_updates(pages, seed=22)
    fixtures.write_epochs(pages, root, n_epochs=2, prefix="pages")
    fixtures.write_epochs(updates, root, n_epochs=2, prefix="updates")

    # every third metadata read fails once (driver-side discovery path)
    real_read_metadata = pq.read_metadata
    state = {"calls": 0, "failed": 0}

    def flaky_read_metadata(path, *a, **kw):
        state["calls"] += 1
        if state["calls"] % 3 == 1 and state["failed"] < 4:
            state["failed"] += 1
            raise OSError("injected transient stat failure")
        return real_read_metadata(path, *a, **kw)

    monkeypatch.setattr(pq, "read_metadata", flaky_read_metadata)
    cfg = PipelineConfig(sliding=(120_000, 60_000), session_gap_ms=30_000,
                         n_state_partitions=2)
    pipe = StreamingFingerprintPipeline(
        os.path.join(root, "pages"), os.path.join(root, "out"),
        updates_root=os.path.join(root, "updates"), cfg=cfg,
    )
    res = pipe.run()
    eng = pipe.result_dataset().to_pandas()
    pipe.shutdown()
    assert state["failed"] >= 1          # faults actually fired
    assert res["epochs_run"] == 2        # and every epoch still committed
    ora = oracle_fingerprints(pages, 2, updates=updates,
                              sliding=(120_000, 60_000), session_gap_ms=30_000)
    sc = ["window_kind", "key_lang", "key_host", "window_start"]
    pd.testing.assert_frame_equal(
        eng.sort_values(sc, kind="stable").reset_index(drop=True)[ora.columns.tolist()],
        ora.sort_values(sc, kind="stable").reset_index(drop=True),
        check_dtype=False,
    )


def test_mapping_loader_csv_and_parquet(tmp_path):
    from flink_fingerprint_ray.sources.mapping import load_mapping_table

    df = pd.DataFrame({
        "generic": ["temp", "  pressure ", "", None, "rpm", "temp"],
        "machine": ["T_01", "P_99", "X", "Y", None, " T_02 "],
    })
    csv_path = str(tmp_path / "map.csv")
    df.to_csv(csv_path, index=False)
    pq_path = str(tmp_path / "map.parquet")
    pa.Table.from_pandas(df).to_pandas().to_parquet(pq_path)

    for path in (csv_path, pq_path):
        m = load_mapping_table(path, "generic", "machine")
        # blanks/None skipped, strings stripped, later rows win
        assert m == {"temp": "T_02", "pressure": "P_99"}


def test_apply_column_mapping():
    from flink_fingerprint_ray.sources.mapping import apply_column_mapping

    t = pa.table({"ts": [1, 2], "T_01": [9.0, 8.0], "P_99": [1.0, 2.0]})
    out = apply_column_mapping(
        t, {"temp": "T_01", "pressure": "P_99", "rpm": "R_404"}, keep=["ts"])
    assert out.column_names == ["ts", "temp", "pressure"]  # unmapped skipped
    assert out["temp"].to_pylist() == [9.0, 8.0]
