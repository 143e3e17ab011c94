"""CLI driver tests (flink_fingerprint_ray/cli.py — the ray-job-submit
entry point): end-to-end `run` over a seeded corpus with oracle parity,
resume no-op on re-invocation, `compact` maintenance, and `query`
execution + parquet write.  Uses the shared session fixture (the CLI's
ray.init guard must no-op under an existing session)."""
from __future__ import annotations

import json

import pandas as pd
import pyarrow.parquet as pq
import pytest

from flink_fingerprint_ray import fixtures
from flink_fingerprint_ray.cli import main
from flink_fingerprint_ray.oracle import oracle_fingerprints


@pytest.fixture(scope="module")
def cli_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_corpus")
    pages = fixtures.make_pages(n_docs=600, seed=21)
    updates = fixtures.make_page_updates(pages, seed=22)
    fixtures.write_epochs(pages, str(root), n_epochs=3, prefix="pages")
    fixtures.write_epochs(updates, str(root), n_epochs=3, prefix="updates")
    return root, pages, updates


def test_cli_run_matches_oracle_and_resumes(ray_session, cli_corpus, tmp_path,
                                            capsys):
    root, pages, updates = cli_corpus
    out = tmp_path / "out"
    argv = ["run", "--pages-root", str(root / "pages"),
            "--updates-root", str(root / "updates"),
            "--out", str(out), "--sliding", "120000,60000",
            "--session-gap-ms", "30000", "--n-state-partitions", "2"]
    assert main(argv) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert isinstance(res, dict) and res   # one JSON metrics line

    from flink_fingerprint_ray.pipelines.streaming import (
        PipelineConfig,
        StreamingFingerprintPipeline,
    )

    def committed_df():
        pipe = StreamingFingerprintPipeline(
            str(root / "pages"), str(out), updates_root=str(root / "updates"),
            cfg=PipelineConfig(sliding=(120_000, 60_000),
                               session_gap_ms=30_000, n_state_partitions=2))
        try:
            return pipe.result_dataset().to_pandas()
        finally:
            pipe.shutdown()

    eng = committed_df()
    ora = oracle_fingerprints(pages, 3, updates=updates,
                              sliding=(120_000, 60_000), session_gap_ms=30_000)
    sc = ["window_kind", "key_lang", "key_host", "window_start"]
    pd.testing.assert_frame_equal(
        eng.sort_values(sc).reset_index(drop=True)[ora.columns.tolist()],
        ora.sort_values(sc).reset_index(drop=True), check_dtype=False)

    # re-invocation resumes past the committed cursor: output unchanged
    assert main(argv) == 0
    capsys.readouterr()
    assert len(committed_df()) == len(eng)

    # compact the committed fences, then output is still intact
    assert main(["compact", "--out", str(out)]) == 0
    comp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert comp["epochs"] == [0, 1]
    assert len(committed_df()) == len(eng)


def test_cli_query_runs_and_writes_parquet(ray_session, tmp_path, capsys):
    sf = "/root/testdata/sf0.001"
    assert main(["query", "value_counts", "--sf", sf]) == 0
    out_txt = capsys.readouterr().out
    tail = json.loads(out_txt.strip().splitlines()[-1])
    assert tail["query"] == "value_counts" and tail["rows"] > 0

    dest = tmp_path / "vc.parquet"
    assert main(["query", "value_counts", "--sf", sf, "--out", str(dest)]) == 0
    capsys.readouterr()
    assert pq.read_table(str(dest)).num_rows == tail["rows"]

    assert main(["query", "no_such_query", "--sf", sf]) == 2


def test_cli_rejects_bad_config(ray_session, tmp_path):
    with pytest.raises(ValueError, match="session_gap_expr"):
        main(["run", "--pages-root", str(tmp_path), "--out",
              str(tmp_path / "o"), "--session-gap-expr", "ts_ms"])
