"""End-to-end engine-vs-oracle parity, resume, replay idempotency and
arrival-order invariance for the streaming fingerprint pipeline."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from flink_fingerprint_ray import fixtures
from flink_fingerprint_ray.oracle import oracle_fingerprints
from flink_fingerprint_ray.pipelines.streaming import (
    PipelineConfig,
    StreamingFingerprintPipeline,
)

SORT_COLS = ["window_kind", "key_lang", "key_host", "window_start"]
N_EPOCHS = 4


def _norm(df: pd.DataFrame, cols) -> pd.DataFrame:
    return df.sort_values(SORT_COLS, kind="stable").reset_index(drop=True)[list(cols)]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    pages = fixtures.make_pages(n_docs=700, seed=11)
    updates = fixtures.make_page_updates(pages, seed=12)
    fixtures.write_epochs(pages, root, n_epochs=N_EPOCHS, prefix="pages")
    fixtures.write_epochs(updates, root, n_epochs=N_EPOCHS, prefix="updates")
    return root, pages, updates


CFG = dict(sliding=(120_000, 60_000), session_gap_ms=30_000, n_state_partitions=3)


@pytest.fixture(scope="module")
def oracle_df(corpus):
    _, pages, updates = corpus
    return oracle_fingerprints(
        pages, N_EPOCHS, updates=updates,
        sliding=CFG["sliding"], session_gap_ms=CFG["session_gap_ms"],
    )


def _run(root: str, out_name: str, max_epochs=None, cfg_extra=None) -> StreamingFingerprintPipeline:
    cfg = PipelineConfig(**{**CFG, **(cfg_extra or {})})
    pipe = StreamingFingerprintPipeline(
        os.path.join(root, "pages"), os.path.join(root, out_name),
        updates_root=os.path.join(root, "updates"), cfg=cfg,
    )
    pipe.run(max_epochs=max_epochs)
    return pipe


def test_engine_matches_oracle(ray_session, corpus, oracle_df):
    root, _, _ = corpus
    pipe = _run(root, "out_e2e")
    eng = pipe.result_dataset().to_pandas()
    pipe.shutdown()
    assert len(eng) == len(oracle_df) > 0
    pd.testing.assert_frame_equal(
        _norm(eng, oracle_df.columns), _norm(oracle_df, oracle_df.columns),
        check_dtype=False,
    )
    # all three window kinds actually occur
    assert set(eng["window_kind"]) == {"tumbling", "sliding", "session"}
    # join produced hits
    assert eng["update_count"].sum() > 0


def test_late_rows_dropped_and_counted(ray_session, corpus):
    root, pages, _ = corpus
    pipe = _run(root, "out_late")
    m = pipe.manifest.state["epochs"]
    pipe.shutdown()
    late = sum(e["metrics"].get("late_dropped", 0) for e in m.values())
    empty = sum(e["metrics"].get("empty_dropped", 0) for e in m.values())
    assert late > 0      # fixture injects ~1% beyond-watermark rows
    assert empty > 0     # fixture injects ~2% empty docs
    rows_in = sum(e["metrics"]["rows_in"] for e in m.values())
    assert rows_in == pages.num_rows


def test_resume_after_kill(ray_session, corpus, oracle_df):
    root, _, _ = corpus
    p1 = _run(root, "out_resume", max_epochs=2)
    p1.shutdown()  # actors die; only manifest + snapshots survive
    p2 = _run(root, "out_resume")  # fresh pipeline restores from manifest
    assert p2.manifest.cursor == N_EPOCHS - 1
    eng = p2.result_dataset().to_pandas()
    p2.shutdown()
    pd.testing.assert_frame_equal(
        _norm(eng, oracle_df.columns), _norm(oracle_df, oracle_df.columns),
        check_dtype=False,
    )


def test_replay_committed_epoch_idempotent(ray_session, corpus):
    root, _, _ = corpus
    out = "out_replay"
    p1 = _run(root, out)
    p1.shutdown()

    def read_out():
        files = sorted(glob.glob(os.path.join(root, out, "epoch=*", "*.parquet")))
        import pyarrow.parquet as pq
        return pd.concat([pq.read_table(f).to_pandas() for f in files])

    before = _norm(read_out(), read_out().columns)
    # crash-rewind: cursor back one epoch, rerun → same committed rows
    mpath = os.path.join(root, out, "manifest.json")
    st = json.load(open(mpath))
    st["cursor"] = N_EPOCHS - 2
    st["watermark_ms"] = st["epochs"][str(N_EPOCHS - 2)]["watermark_ms"]
    json.dump(st, open(mpath, "w"))
    p2 = _run(root, out)
    p2.shutdown()
    after = _norm(read_out(), before.columns)
    pd.testing.assert_frame_equal(before, after, check_dtype=False)


def test_manifest_commit_mode_parity_resume_replay(ray_session, corpus, oracle_df):
    """S3-style commit protocol (VERDICT r4 item 4): data files land at
    immutable attempt-prefixed paths — never renamed, never overwritten —
    and the single manifest-pointer write IS the commit (Iceberg/Delta
    style).  Output must match the oracle, survive kill+resume, stay
    idempotent under crash-replay (rewound cursor → the replay writes a
    FRESH attempt; the orphan stays on disk but is invisible to the
    manifest reader), and refuse a resume under the other mode."""
    root, _, _ = corpus
    out = "out_mf"
    p1 = _run(root, out, max_epochs=2, cfg_extra={"commit_mode": "manifest"})
    p1.shutdown()
    p2 = _run(root, out, cfg_extra={"commit_mode": "manifest"})
    eng = p2.result_dataset().to_pandas()
    p2.shutdown()
    pd.testing.assert_frame_equal(
        _norm(eng, oracle_df.columns), _norm(oracle_df, oracle_df.columns),
        check_dtype=False,
    )
    # no rename-mode fence dirs exist — data lives under attempt prefixes
    assert not glob.glob(os.path.join(root, out, "epoch=*"))
    assert glob.glob(os.path.join(root, out, "data", "epoch=*", "attempt-000"))

    # crash-replay: cursor rewound one epoch, rerun → same observable rows
    mpath = os.path.join(root, out, "manifest.json")
    st = json.load(open(mpath))
    st["cursor"] = N_EPOCHS - 2
    st["watermark_ms"] = st["epochs"][str(N_EPOCHS - 2)]["watermark_ms"]
    json.dump(st, open(mpath, "w"))
    p3 = _run(root, out, cfg_extra={"commit_mode": "manifest"})
    eng3 = p3.result_dataset().to_pandas()
    p3.shutdown()
    pd.testing.assert_frame_equal(
        _norm(eng3, oracle_df.columns), _norm(oracle_df, oracle_df.columns),
        check_dtype=False,
    )
    # the replayed epoch now has TWO attempts: the orphaned original and
    # the committed replay — and the reader saw exactly one of them
    last = os.path.join(root, out, "data", f"epoch={N_EPOCHS - 1:05d}")
    assert len([d for d in os.listdir(last) if d.startswith("attempt-")]) == 2

    # a resume under the other commit protocol must refuse loudly
    with pytest.raises(RuntimeError, match="commit_mode"):
        _run(root, out)


def test_compact_epochs_resume_and_reader_unchanged(ray_session, corpus, oracle_df):
    """Maintenance compaction (VERDICT r4 item 8): committed epoch fences
    strictly before the cursor merge into ONE compacted fence; the
    manifest chain (entries, metrics, state snapshots, cursor) stays
    intact, so a resume continues normally and every reader sees the
    same rows.  A later compaction folds the earlier one in."""
    from flink_fingerprint_ray.pipelines.maintenance import compact_epochs

    root, _, _ = corpus
    out = os.path.join(root, "out_compact")
    p1 = _run(root, "out_compact", max_epochs=3)
    alerts_before = p1.alerts_df()
    p1.shutdown()

    res = compact_epochs(out)
    assert res["epochs"] == [0, 1] and res["rows"] > 0
    assert not os.path.exists(os.path.join(out, "epoch=00000"))
    assert not os.path.exists(os.path.join(out, "epoch=00001"))
    assert os.path.isdir(res["dir"])

    # resume finishes epoch 3 from the untouched state snapshots
    p2 = _run(root, "out_compact")
    eng = p2.result_dataset().to_pandas()
    p2.shutdown()
    pd.testing.assert_frame_equal(
        _norm(eng, oracle_df.columns), _norm(oracle_df, oracle_df.columns),
        check_dtype=False,
    )

    # second compaction folds the first (one record, union coverage)
    res2 = compact_epochs(out)
    assert res2["epochs"] == [0, 1, 2]
    p3 = _run(root, "out_compact")  # no new epochs: pure reader
    eng3 = p3.result_dataset().to_pandas()
    alerts_after = p3.alerts_df()
    p3.shutdown()
    pd.testing.assert_frame_equal(
        _norm(eng3, oracle_df.columns), _norm(oracle_df, oracle_df.columns),
        check_dtype=False,
    )
    ac = ["key_lang", "key_host", "window_kind", "window_start"]
    pd.testing.assert_frame_equal(
        alerts_after.sort_values(ac).reset_index(drop=True),
        alerts_before.sort_values(ac).reset_index(drop=True),
        check_dtype=False,
    )


def test_arrival_order_invariance_within_epoch(ray_session, tmp_path, oracle_df, corpus):
    """Shuffling arrival order WITHIN each epoch must not change output
    (no hidden dependence on block/row order)."""
    root, pages, updates = corpus
    rng = np.random.RandomState(0)
    bounds = np.linspace(0, pages.num_rows, N_EPOCHS + 1).astype(int)
    parts = []
    for k in range(N_EPOCHS):
        idx = np.arange(bounds[k], bounds[k + 1])
        rng.shuffle(idx)
        parts.append(pages.take(pa.array(idx)))
    shuffled = pa.concat_tables(parts)
    root2 = str(tmp_path)
    fixtures.write_epochs(shuffled, root2, n_epochs=N_EPOCHS, prefix="pages")
    fixtures.write_epochs(updates, root2, n_epochs=N_EPOCHS, prefix="updates")
    pipe = _run(root2, "out_shuf", cfg_extra={"read_blocks": 5})
    eng = pipe.result_dataset().to_pandas()
    pipe.shutdown()
    pd.testing.assert_frame_equal(
        _norm(eng, oracle_df.columns), _norm(oracle_df, oracle_df.columns),
        check_dtype=False,
    )


def test_extreme_host_skew_parity(ray_session, tmp_path):
    """Hot-host skew (2 hosts, Zipf → one host ~70% of docs): the
    window-salted partitioning must keep output row-exact vs the oracle."""
    from flink_fingerprint_ray import fixtures
    from flink_fingerprint_ray.oracle import oracle_fingerprints
    from flink_fingerprint_ray.pipelines.streaming import (
        PipelineConfig,
        StreamingFingerprintPipeline,
    )

    pages = fixtures.make_pages(n_docs=1200, seed=7, n_hosts=2)
    fixtures.write_epochs(pages, str(tmp_path), n_epochs=4, prefix="pages")
    cfg = PipelineConfig(sliding=(120_000, 60_000), session_gap_ms=30_000,
                         n_state_partitions=4)
    pipe = StreamingFingerprintPipeline(
        str(tmp_path / "pages"), str(tmp_path / "out"), cfg=cfg)
    pipe.run()
    eng = pipe.result_dataset().to_pandas()
    ora = oracle_fingerprints(pages, 4, sliding=(120_000, 60_000),
                              session_gap_ms=30_000)
    sc = ["window_kind", "key_lang", "key_host", "window_start"]
    import pandas as pd
    pd.testing.assert_frame_equal(
        eng.sort_values(sc).reset_index(drop=True)[ora.columns.tolist()],
        ora.sort_values(sc).reset_index(drop=True), check_dtype=False)
    pipe.shutdown()


@pytest.mark.parametrize("kill_at", [2, 3])
def test_resume_across_delta_and_compaction(ray_session, corpus, oracle_df, kill_at):
    """Delta checkpoints with compact_every=2: resuming right after a
    compaction epoch AND mid-delta must both reproduce the oracle."""
    root, _, _ = corpus
    out = f"out_compact_{kill_at}"
    p1 = _run(root, out, max_epochs=kill_at,
              cfg_extra={"snapshot_compact_every": 2})
    p1.shutdown()
    p2 = _run(root, out, cfg_extra={"snapshot_compact_every": 2})
    eng = p2.result_dataset().to_pandas()
    pd.testing.assert_frame_equal(
        _norm(eng, oracle_df.columns), _norm(oracle_df, oracle_df.columns),
        check_dtype=False)
    p2.shutdown()


def test_all_late_and_empty_epochs(ray_session, tmp_path):
    """Robustness: an epoch whose rows are ALL late (dropped at ingest)
    and a final empty-output epoch must still commit fences and keep the
    manifest cursor advancing."""
    import pyarrow as pa

    pages = fixtures.make_pages(n_docs=300, seed=21)
    # epoch 1's rows moved far before epoch 0's → all late once wm advances
    ts = pages["warc_ts"].cast(pa.int64()).to_numpy().copy()
    ts[100:200] = ts[:100].min() - 10_000_000
    shuffled = pages.set_column(
        pages.schema.get_field_index("warc_ts"), "warc_ts",
        pa.array(ts, pa.timestamp("ms")))
    fixtures.write_epochs(shuffled, str(tmp_path), n_epochs=3, prefix="pages")
    cfg = PipelineConfig(session_gap_ms=30_000, n_state_partitions=2)
    pipe = StreamingFingerprintPipeline(
        str(tmp_path / "pages"), str(tmp_path / "out"), cfg=cfg)
    res = pipe.run()
    assert res["epochs_run"] == 3
    assert res["late_dropped"] >= 100          # the shifted rows dropped
    assert pipe.manifest.cursor == 2
    out = pipe.result_dataset().to_pandas()
    assert len(out) > 0
    pipe.shutdown()


def test_dynamic_session_gap_parity_and_resume_guard(ray_session, corpus):
    """Flink SessionWindowTimeGapExtractor analog: per-lang session gaps
    must match the oracle row-exactly (boundaries AND window_end =
    max(ts + gap)), survive kill+resume, and a resume under a DIFFERENT
    gap map must be refused by the manifest channel guard."""
    root, pages, updates = corpus
    gaps = {"en": 45_000, "zh": 15_000}
    cfg_extra = {"session_gap_by_lang": gaps}
    p1 = _run(root, "out_dyngap", max_epochs=2, cfg_extra=cfg_extra)
    p1.shutdown()
    p2 = _run(root, "out_dyngap", cfg_extra=cfg_extra)
    eng = p2.result_dataset().to_pandas()
    ora = oracle_fingerprints(
        pages, N_EPOCHS, updates=updates, sliding=CFG["sliding"],
        session_gap_ms=CFG["session_gap_ms"], session_gap_by_lang=gaps)
    pd.testing.assert_frame_equal(
        _norm(eng, ora.columns), _norm(ora, ora.columns), check_dtype=False)
    # dynamic gaps must actually change the session layout vs fixed-gap
    fixed = oracle_fingerprints(
        pages, N_EPOCHS, updates=updates, sliding=CFG["sliding"],
        session_gap_ms=CFG["session_gap_ms"])
    sess = ora[ora["window_kind"] == "session"]
    assert not sess.reset_index(drop=True).equals(
        fixed[fixed["window_kind"] == "session"].reset_index(drop=True))
    p2.shutdown()
    # a different map on resume = different window identity -> refused
    with pytest.raises(RuntimeError, match="side-channel"):
        _run(root, "out_dyngap",
             cfg_extra={"session_gap_by_lang": {"en": 60_000}})


def test_session_gap_expr_parity_and_resume_guard(ray_session, corpus):
    """Fully general gap extractor (VERDICT r4 item 9 — Flink's
    SessionWindowTimeGapExtractor sees the WHOLE element): a compiled
    formula over the narrow-row columns yields a PER-ROW gap.  Parity vs
    the oracle's independent sequential mirror, kill+resume, and refusal
    of a resume under a different formula."""
    root, pages, updates = corpus
    expr = "20000 + text_len * 100"   # varies per ROW, not just per lang
    cfg_extra = {"session_gap_expr": expr}
    p1 = _run(root, "out_gapexpr", max_epochs=2, cfg_extra=cfg_extra)
    p1.shutdown()
    p2 = _run(root, "out_gapexpr", cfg_extra=cfg_extra)
    eng = p2.result_dataset().to_pandas()
    ora = oracle_fingerprints(
        pages, N_EPOCHS, updates=updates, sliding=CFG["sliding"],
        session_gap_ms=CFG["session_gap_ms"], session_gap_expr=expr)
    pd.testing.assert_frame_equal(
        _norm(eng, ora.columns), _norm(ora, ora.columns), check_dtype=False)
    # the per-row gaps must actually change the session layout
    fixed = oracle_fingerprints(
        pages, N_EPOCHS, updates=updates, sliding=CFG["sliding"],
        session_gap_ms=CFG["session_gap_ms"])
    sess = ora[ora["window_kind"] == "session"]
    assert not sess.reset_index(drop=True).equals(
        fixed[fixed["window_kind"] == "session"].reset_index(drop=True))
    p2.shutdown()
    # a different formula on resume = different window identity -> refused
    with pytest.raises(RuntimeError, match="side-channel"):
        _run(root, "out_gapexpr",
             cfg_extra={"session_gap_expr": "30000 + text_len * 50"})
    # config-time validation: non-whitelisted expression / combos refuse
    with pytest.raises(ValueError):
        PipelineConfig(session_gap_ms=1000,
                       session_gap_expr="__import__('os')")
    with pytest.raises(ValueError, match="mutually exclusive"):
        PipelineConfig(session_gap_ms=1000, session_gap_expr="1000",
                       session_gap_by_lang={"en": 500})


def _late_corpus(tmp_path, n_docs=900, n_epochs=4):
    """Pages with injected lateness: 40 rows one epoch late (within a
    span/3 allowance) and 40 rows ~three epochs late (beyond it)."""
    pages = fixtures.make_pages(n_docs=n_docs, seed=5)
    ts = pages["warc_ts"].cast(pa.int64()).to_numpy().copy()
    n = len(ts)
    span = int(ts.max() - ts.min())
    ts[n // 2: n // 2 + 40] = ts[n // 4: n // 4 + 40]
    ts[3 * n // 4: 3 * n // 4 + 40] = ts[:40] + 500
    pages = pages.set_column(pages.schema.get_field_index("warc_ts"),
                             "warc_ts", pa.array(ts, pa.timestamp("ms")))
    updates = fixtures.make_page_updates(pages)
    fixtures.write_epochs(pages, str(tmp_path), n_epochs=n_epochs, prefix="pages")
    fixtures.write_epochs(updates, str(tmp_path), n_epochs=n_epochs, prefix="updates")
    return pages, updates, span


@pytest.mark.parametrize("tight", [False, True])
def test_allowed_lateness_refires_match_oracle(ray_session, tmp_path, tight):
    """Flink allowedLateness analog: late-but-admissible rows re-fire
    their already-closed windows as updated FULL aggregates on the refire
    channel (refire_seq), row-exact vs the oracle — through kill+resume.
    tight=True shrinks the allowance so retention eviction kicks in and
    beyond-allowance rows are dropped (refire_dropped)."""
    pages, updates, span = _late_corpus(tmp_path)
    allowed = span // 3 if tight else 100_000_000
    cfg = PipelineConfig(sliding=(120_000, 60_000), session_gap_ms=30_000,
                         n_state_partitions=3, allowed_lateness_ms=int(allowed))
    args = (str(tmp_path / "pages"), str(tmp_path / "out"))
    p1 = StreamingFingerprintPipeline(
        *args, updates_root=str(tmp_path / "updates"), cfg=cfg)
    p1.run(max_epochs=2)
    p1.shutdown()
    p2 = StreamingFingerprintPipeline(
        *args, updates_root=str(tmp_path / "updates"), cfg=cfg)
    res = p2.run()
    eng = p2.result_dataset().to_pandas()
    ref = p2.refire_df()
    ora, ora_ref = oracle_fingerprints(
        pages, 4, updates=updates, sliding=(120_000, 60_000),
        session_gap_ms=30_000, allowed_lateness_ms=int(allowed),
        return_refires=True)
    pd.testing.assert_frame_equal(
        _norm(eng, ora.columns), _norm(ora, ora.columns), check_dtype=False)
    sc2 = SORT_COLS + ["window_end", "refire_seq"]
    assert len(ref) == len(ora_ref) > 0
    pd.testing.assert_frame_equal(
        ref.sort_values(sc2).reset_index(drop=True)[ora_ref.columns.tolist()],
        ora_ref.sort_values(sc2).reset_index(drop=True), check_dtype=False)
    dropped = sum(m.get("refire_dropped", 0) for m in res["per_epoch"])
    if tight:
        assert dropped > 0       # beyond-allowance rows dropped
    else:
        assert dropped == 0
    p2.shutdown()
    # a different allowance on resume = different admission -> refused
    with pytest.raises(RuntimeError, match="side-channel"):
        p3 = StreamingFingerprintPipeline(
            *args, updates_root=str(tmp_path / "updates"),
            cfg=PipelineConfig(sliding=(120_000, 60_000), session_gap_ms=30_000,
                               n_state_partitions=3,
                               allowed_lateness_ms=int(allowed) + 1))
        p3.run()


def test_allowed_lateness_with_cumulate_parity(ray_session, tmp_path):
    """Refires are generic over window identity (kind, start, END): with
    CUMULATE on, a late row re-fires EVERY already-fired slice of its
    max-span window — both streams must match the oracle row-exactly."""
    pages, updates, span = _late_corpus(tmp_path)
    cfg = PipelineConfig(cumulate=(60_000, 180_000), n_state_partitions=3,
                         allowed_lateness_ms=100_000_000)
    pipe = StreamingFingerprintPipeline(
        str(tmp_path / "pages"), str(tmp_path / "out"),
        updates_root=str(tmp_path / "updates"), cfg=cfg)
    pipe.run()
    eng = pipe.result_dataset().to_pandas()
    ref = pipe.refire_df()
    ora, ora_ref = oracle_fingerprints(
        pages, 4, updates=updates, cumulate=(60_000, 180_000),
        allowed_lateness_ms=100_000_000, return_refires=True)
    pd.testing.assert_frame_equal(
        _norm(eng, ora.columns), _norm(ora, ora.columns), check_dtype=False)
    sc2 = SORT_COLS + ["window_end", "refire_seq"]
    assert len(ref) == len(ora_ref) > 0
    # a late row must refire MULTIPLE slices of its cumulate span
    assert (ora_ref["window_kind"] == "cumulate").any()
    pd.testing.assert_frame_equal(
        ref.sort_values(sc2).reset_index(drop=True)[ora_ref.columns.tolist()],
        ora_ref.sort_values(sc2).reset_index(drop=True), check_dtype=False)
    pipe.shutdown()


def test_allowed_lateness_composes_with_side_channels(ray_session, tmp_path):
    """Late-admissible rows exist ONLY for window refires: with curation,
    near-dup and the late-DLQ all on, each side channel must still match
    its own oracle (late rows never enter curation/near-dup; the DLQ
    keeps only beyond-allowance rows), while main + refire streams match
    theirs."""
    from flink_fingerprint_ray.functions.textstats import ngram_set_hashes
    from flink_fingerprint_ray.oracle import (
        oracle_clean_stream,
        oracle_late_rows,
        oracle_neardup_stream,
    )
    from flink_fingerprint_ray.pipelines.streaming import N_BANDS

    pages, updates, span = _late_corpus(tmp_path)
    MIN_CHARS = 120
    ALLOWED = span // 3  # some late rows admitted, some beyond -> DLQ
    bench, _ = ngram_set_hashes(pages["text"].slice(10, 5))
    cfg = PipelineConfig(sliding=(120_000, 60_000),
                         n_state_partitions=3,
                         allowed_lateness_ms=int(ALLOWED),
                         curation_min_chars=MIN_CHARS, curation_bench=bench,
                         neardup=True, late_side_output=True)
    pipe = StreamingFingerprintPipeline(
        str(tmp_path / "pages"), str(tmp_path / "out"),
        updates_root=str(tmp_path / "updates"), cfg=cfg)
    pipe.run()
    ora, ora_ref = oracle_fingerprints(
        pages, 4, updates=updates, sliding=(120_000, 60_000),
        allowed_lateness_ms=int(ALLOWED), return_refires=True)
    eng = pipe.result_dataset().to_pandas()
    pd.testing.assert_frame_equal(
        _norm(eng, ora.columns), _norm(ora, ora.columns), check_dtype=False)
    ref = pipe.refire_df()
    sc2 = SORT_COLS + ["window_end", "refire_seq"]
    assert len(ref) == len(ora_ref) > 0
    pd.testing.assert_frame_equal(
        ref.sort_values(sc2).reset_index(drop=True)[ora_ref.columns.tolist()],
        ora_ref.sort_values(sc2).reset_index(drop=True), check_dtype=False)
    ora_clean = oracle_clean_stream(pages, 4, MIN_CHARS, bench)
    ora_nd = oracle_neardup_stream(pages, 4, n_bands=N_BANDS)
    ora_late = oracle_late_rows(pages, 4, allowed_lateness_ms=int(ALLOWED))
    assert len(ora_late) > 0           # beyond-allowance rows exist
    for df, o, cols in (
        (pipe.clean_df(), ora_clean, ["url", "ts_ms", "text_hash"]),
        (pipe.neardup_df(), ora_nd, ["url", "ts_ms"]),
        (pipe.late_df(), ora_late, ["url", "ts_ms"]),
    ):
        pd.testing.assert_frame_equal(
            df[cols].sort_values(cols, kind="stable").reset_index(drop=True),
            o[cols].sort_values(cols, kind="stable").reset_index(drop=True),
            check_dtype=False)
    pipe.shutdown()


def test_session_allowed_lateness_bridge_merge(ray_session, tmp_path):
    """Flink session windows MERGE on late elements (VERDICT r4 item 2):
    a late-admitted row that bridges TWO already-fired sessions of its key
    re-fires ONE merged session on the refire channel (refire_seq=1, full
    merged aggregate) — engine row-exact vs oracle, through kill+resume."""
    B = fixtures.BASE_TS_MS
    pages = fixtures.make_pages(n_docs=300, seed=9, late_frac=0.0,
                                ooo_frac=0.0, empty_frac=0.0)
    ts = pages["warc_ts"].cast(pa.int64()).to_numpy().copy()
    url = np.asarray(pages["url"], dtype=object).copy()
    lang = np.asarray(pages["lang"], dtype=object).copy()
    # bridge key: cluster A (0,5,10 s) + cluster B (40,45,50 s), gap 20 s
    # -> two sessions [0,30) and [40,70); the late row at 25 s (epoch 2)
    # is within the gap of BOTH -> one merged session [0,70)
    bridge = [0, 1, 2, 3, 4, 5, 200]
    for j, off in zip(bridge, [0, 5_000, 10_000, 40_000, 45_000, 50_000, 25_000]):
        ts[j] = B + off
        url[j] = f"https://hbridge.example.com/px{j}"
        lang[j] = "en"
    ts[6:100] = B + 55_000 + np.arange(94) * 50          # epoch 0 bg
    ts[100:200] = B + 95_000 + np.arange(100) * 50       # epoch 1 bg -> wm closes A+B
    ts[201:300] = B + 100_000 + np.arange(99) * 10       # epoch 2 bg (wm ~flat)
    pages = (pages
             .set_column(pages.schema.get_field_index("warc_ts"), "warc_ts",
                         pa.array(ts, pa.timestamp("ms")))
             .set_column(pages.schema.get_field_index("url"), "url",
                         pa.array(url, pa.string()))
             .set_column(pages.schema.get_field_index("lang"), "lang",
                         pa.array(lang, pa.string())))
    fixtures.write_epochs(pages, str(tmp_path), n_epochs=3, prefix="pages")
    GAP, ALLOWED = 20_000, 70_000
    cfg = PipelineConfig(session_gap_ms=GAP, allowed_lateness_ms=ALLOWED,
                         n_state_partitions=3)
    ora, ora_ref = oracle_fingerprints(
        pages, 3, session_gap_ms=GAP, allowed_lateness_ms=ALLOWED,
        return_refires=True)
    # the oracle itself must contain the engineered bridge refire
    sref = ora_ref[ora_ref["window_kind"] == "session"]
    hit = sref[(sref["key_host"] == "hbridge.example.com")
               & (sref["window_start"] == B)
               & (sref["window_end"] == B + 70_000)]
    assert len(hit) == 1 and int(hit["doc_count"].iloc[0]) == 7 \
        and int(hit["refire_seq"].iloc[0]) == 1
    # ...and main output carries the two ORIGINAL first-fired sessions
    smain = ora[(ora["window_kind"] == "session")
                & (ora["key_host"] == "hbridge.example.com")]
    assert {(int(s), int(e)) for s, e in
            zip(smain["window_start"], smain["window_end"])} \
        >= {(B, B + 30_000), (B + 40_000, B + 70_000)}

    args = (str(tmp_path / "pages"), str(tmp_path / "out"))
    p1 = StreamingFingerprintPipeline(*args, cfg=cfg)
    p1.run(max_epochs=2)
    p1.shutdown()                      # kill between first fire and refire
    p2 = StreamingFingerprintPipeline(*args, cfg=cfg)
    p2.run()
    eng = p2.result_dataset().to_pandas()
    ref = p2.refire_df()
    p2.shutdown()
    pd.testing.assert_frame_equal(
        _norm(eng, ora.columns), _norm(ora, ora.columns), check_dtype=False)
    sc2 = SORT_COLS + ["window_end", "refire_seq"]
    assert len(ref) == len(ora_ref) > 0
    pd.testing.assert_frame_equal(
        ref.sort_values(sc2).reset_index(drop=True)[ora_ref.columns.tolist()],
        ora_ref.sort_values(sc2).reset_index(drop=True), check_dtype=False)


def test_session_lateness_refuses_dynamic_gaps():
    """The session lateness sweep re-segments with a constant gap —
    combining it with per-element dynamic gaps must refuse at config
    time (both engine and oracle).  Supersedes the r4f composition where
    sessions simply never admitted late rows: sessions now MERGE on late
    elements, so the silent-composition escape hatch is gone."""
    with pytest.raises(ValueError, match="session_gap_by_lang"):
        PipelineConfig(session_gap_ms=10_000,
                       session_gap_by_lang={"en": 5_000},
                       allowed_lateness_ms=1_000)
    with pytest.raises(ValueError, match="session_gap_by_lang"):
        oracle_fingerprints(fixtures.make_pages(n_docs=10), 1,
                            session_gap_ms=10_000,
                            session_gap_by_lang={"en": 5_000},
                            allowed_lateness_ms=1_000)


def test_allowed_lateness_composes_with_engine_channels(ray_session, tmp_path):
    """ADVICE r4 item 2: with allowed lateness ON, the alert/CEP/Top-N
    channels consume the on-time close stream — which now includes
    admitted-late rows that joined a still-open window's FIRST fire, but
    never refires.  Each channel must match its oracle computed over the
    first-fire fingerprint rows (refires excluded)."""
    from flink_fingerprint_ray.oracle import (
        oracle_alerts,
        oracle_cep_matches,
        oracle_window_topn,
    )

    pages, updates, span = _late_corpus(tmp_path)
    ALLOWED = span // 3
    pattern = (">0", "==0")
    cfg = PipelineConfig(sliding=(120_000, 60_000), n_state_partitions=3,
                         allowed_lateness_ms=int(ALLOWED),
                         window_topn=3, cep_pattern=pattern)
    pipe = StreamingFingerprintPipeline(
        str(tmp_path / "pages"), str(tmp_path / "out"),
        updates_root=str(tmp_path / "updates"), cfg=cfg)
    pipe.run()
    ora, ora_ref = oracle_fingerprints(
        pages, 4, updates=updates, sliding=(120_000, 60_000),
        allowed_lateness_ms=int(ALLOWED), return_refires=True)
    m = pipe.manifest.state["epochs"]
    admitted = sum(e["metrics"].get("late_admitted", 0) for e in m.values())
    assert len(ora_ref) > 0 and admitted > 0  # composition is non-vacuous
    eng = pipe.result_dataset().to_pandas()
    pd.testing.assert_frame_equal(
        _norm(eng, ora.columns), _norm(ora, ora.columns), check_dtype=False)

    want_alerts = oracle_alerts(ora)
    want_cep = oracle_cep_matches(ora, pattern)
    want_topn = oracle_window_topn(ora, 3)
    assert len(want_alerts) > 0 and len(want_cep) > 0 and len(want_topn) > 0

    ac = ["key_lang", "key_host", "window_kind", "window_start"]
    got_alerts = pipe.alerts_df()
    pd.testing.assert_frame_equal(
        got_alerts.sort_values(ac).reset_index(drop=True)[want_alerts.columns.tolist()],
        want_alerts.sort_values(ac).reset_index(drop=True), check_dtype=False)

    cc = ac + ["window_end"]
    got_cep = pipe.cep_df()
    pd.testing.assert_frame_equal(
        got_cep.sort_values(cc, kind="stable").reset_index(drop=True)[want_cep.columns.tolist()],
        want_cep.sort_values(cc, kind="stable").reset_index(drop=True),
        check_dtype=False)

    tc = ["window_start", "rank"]
    got_topn = pipe.topn_df()
    pd.testing.assert_frame_equal(
        got_topn.sort_values(tc, kind="stable").reset_index(drop=True)[want_topn.columns.tolist()],
        want_topn.sort_values(tc, kind="stable").reset_index(drop=True),
        check_dtype=False)
    pipe.shutdown()


def test_rising_edge_alerts_match_oracle(ray_session, corpus, oracle_df):
    """T3 analog: incremental rising-edge alert state across epochs —
    engine alert rows must equal the oracle's global (key, window) scan,
    including after kill + resume (alert state snapshots in the manifest)."""
    from flink_fingerprint_ray.oracle import oracle_alerts

    root, _, _ = corpus
    want = oracle_alerts(oracle_df)
    assert len(want) > 0
    ac = ["key_lang", "key_host", "window_kind", "window_start"]

    p1 = _run(root, "out_alerts")
    got = p1.alerts_df()
    pd.testing.assert_frame_equal(
        got.sort_values(ac).reset_index(drop=True),
        want.sort_values(ac).reset_index(drop=True), check_dtype=False)
    p1.shutdown()

    # kill after 2 epochs, resume: committed alerts must be identical
    p2 = _run(root, "out_alerts_resume", max_epochs=2)
    p2.shutdown()
    p3 = _run(root, "out_alerts_resume")
    got2 = p3.alerts_df()
    pd.testing.assert_frame_equal(
        got2.sort_values(ac).reset_index(drop=True),
        want.sort_values(ac).reset_index(drop=True), check_dtype=False)
    p3.shutdown()


def test_session_max_cap_matches_oracle_and_bounds_state(ray_session, corpus):
    """session_max_ms force-closes long-running sessions (state-bounding
    cap for hot keys that never idle): engine output must still match the
    oracle exactly, and capped sessions must actually occur."""
    root, pages, updates = corpus
    cap = 90_000  # < the stream's hottest-host activity span
    pipe = _run(root, "out_cap", cfg_extra={"session_max_ms": cap})
    eng = pipe.result_dataset().to_pandas()
    pipe.shutdown()
    ora = oracle_fingerprints(
        pages, N_EPOCHS, updates=updates,
        sliding=CFG["sliding"], session_gap_ms=CFG["session_gap_ms"],
        session_max_ms=cap,
    )
    assert len(eng) == len(ora) > 0
    pd.testing.assert_frame_equal(
        _norm(eng, ora.columns), _norm(ora, ora.columns), check_dtype=False)
    # the cap actually split sessions: more session windows than uncapped
    ora_uncapped = oracle_fingerprints(
        pages, N_EPOCHS, updates=updates,
        sliding=CFG["sliding"], session_gap_ms=CFG["session_gap_ms"])
    n_cap = (ora["window_kind"] == "session").sum()
    n_free = (ora_uncapped["window_kind"] == "session").sum()
    assert n_cap > n_free


def test_resume_after_kill_with_session_cap(ray_session, corpus):
    """Kill + resume with session_max_ms active: force-closed sessions
    already committed must not re-emit, still-open capped state must
    restore and continue — output identical to the one-shot oracle."""
    root, pages, updates = corpus
    cap = 90_000
    extra = {"session_max_ms": cap}
    p1 = _run(root, "out_cap_resume", max_epochs=2, cfg_extra=extra)
    p1.shutdown()
    p2 = _run(root, "out_cap_resume", cfg_extra=extra)
    assert p2.manifest.cursor == N_EPOCHS - 1
    eng = p2.result_dataset().to_pandas()
    p2.shutdown()
    ora = oracle_fingerprints(
        pages, N_EPOCHS, updates=updates,
        sliding=CFG["sliding"], session_gap_ms=CFG["session_gap_ms"],
        session_max_ms=cap,
    )
    pd.testing.assert_frame_equal(
        _norm(eng, ora.columns), _norm(ora, ora.columns), check_dtype=False)


def test_streaming_curation_matches_oracle_and_resumes(ray_session, corpus):
    """VERDICT r2 item 5: the LLM-curation chain (quality gate →
    decontamination → cross-epoch exact dedup) runs INSIDE the epoch
    driver — inheriting watermarks, snapshots and the exactly-once fence —
    and a kill/resume run matches the single-process curation oracle."""
    from flink_fingerprint_ray.functions.textstats import ngram_set_hashes
    from flink_fingerprint_ray.oracle import oracle_clean_stream

    root, pages, _ = corpus
    MIN_CHARS = 120
    # held-out benchmark: trigrams of a few fixture docs (their exact and
    # near copies downstream must be decontaminated away)
    bench, _ = ngram_set_hashes(pages["text"].slice(10, 5))
    cur = {"curation_min_chars": MIN_CHARS, "curation_bench": bench}

    ora = oracle_clean_stream(pages, N_EPOCHS, MIN_CHARS, bench)
    ora_nobench = oracle_clean_stream(pages, N_EPOCHS, MIN_CHARS, None)
    # the gates are all non-vacuous on this fixture
    assert 0 < len(ora) < len(ora_nobench) < pages.num_rows

    def _cmp(df: pd.DataFrame):
        cols = ["url", "ts_ms", "text_hash"]
        a = df[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        b = ora[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    pipe = _run(root, "out_curation", cfg_extra=cur)
    eng = pipe.clean_df()
    # the fingerprint/window path is unaffected by the curation side-channel
    n_fps = len(pipe.result_dataset().to_pandas())
    pipe.shutdown()
    assert n_fps > 0
    _cmp(eng)

    # kill after 2 epochs; a fresh pipeline restores the seen-hash state
    # from the committed snapshot and finishes with identical output
    p1 = _run(root, "out_curation_resume", max_epochs=2, cfg_extra=cur)
    p1.shutdown()
    p2 = _run(root, "out_curation_resume", cfg_extra=cur)
    eng2 = p2.clean_df()
    p2.shutdown()
    _cmp(eng2)


def test_streaming_neardup_matches_oracle_and_resumes(ray_session, corpus):
    """Streaming MinHash-LSH near-dup dedup runs INSIDE the epoch driver:
    band state in the NearDupStateActor pool, survivors under the
    exactly-once fence, kill/resume restores the registered-band set from
    the committed snapshot."""
    from flink_fingerprint_ray.oracle import oracle_neardup_stream
    from flink_fingerprint_ray.pipelines.streaming import N_BANDS

    root, pages, _ = corpus
    ora = oracle_neardup_stream(pages, N_EPOCHS, n_bands=N_BANDS)
    # non-vacuous: the fixture plants ~15% exact and ~15% near dup
    # clusters, so the near-dup gate must drop MORE than exact dedup does
    n_candidates = pages.num_rows
    assert 0 < len(ora) < n_candidates * 0.9

    def _cmp(df: pd.DataFrame):
        cols = ["url", "ts_ms"]
        a = df[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        b = ora[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    pipe = _run(root, "out_neardup", cfg_extra={"neardup": True})
    eng = pipe.neardup_df()
    m = pipe.manifest.state["epochs"]
    n_fps = len(pipe.result_dataset().to_pandas())
    pipe.shutdown()
    assert n_fps > 0  # window path undisturbed by the side channel
    _cmp(eng)
    # metrics ride the manifest
    assert sum(e["metrics"]["neardup_kept"] for e in m.values()) == len(ora)
    assert sum(e["metrics"]["neardup_dropped"] for e in m.values()) > 0
    # the registered-band state gauge rides the manifest and is non-zero
    # once survivors registered their bands (epoch keys are str indices)
    gauges = [m[k]["metrics"]["buffered"]["neardup"]
              for k in sorted(m, key=int)]
    assert max(gauges) > 0

    # kill after 2 epochs; resume restores the band state and the full
    # run's committed survivors equal the one-shot oracle
    p1 = _run(root, "out_neardup_resume", max_epochs=2, cfg_extra={"neardup": True})
    p1.shutdown()
    p2 = _run(root, "out_neardup_resume", cfg_extra={"neardup": True})
    eng2 = p2.neardup_df()
    p2.shutdown()
    _cmp(eng2)


def test_resume_refused_on_toggled_side_channel(ray_session, corpus):
    """Resuming a checkpoint under a DIFFERENT side-channel config must
    fail loudly (manifest channel guard, like the token-hash guard):
    a toggled neardup flag would otherwise silently skip or mix side
    outputs across epochs while the window path kept committing."""
    root, _, _ = corpus
    p1 = _run(root, "out_chan_guard", max_epochs=2, cfg_extra={"neardup": True})
    p1.shutdown()
    with pytest.raises(RuntimeError, match="side-channel configuration"):
        _run(root, "out_chan_guard")  # neardup off → refused
    # the matching config still resumes fine
    p2 = _run(root, "out_chan_guard", cfg_extra={"neardup": True})
    assert p2.manifest.cursor == N_EPOCHS - 1
    p2.shutdown()


def test_all_side_channels_compose(ray_session, corpus, oracle_df):
    """Curation + near-dup + late-DLQ all enabled in ONE pipeline run:
    every side output must match ITS OWN single-process oracle
    simultaneously, and the window path must be byte-identical to the
    plain run — composition must not perturb any channel (shared
    page_transform columns, shared metric counter, shared fence).  A
    kill/resume of the combined run restores every state pool."""
    from flink_fingerprint_ray.functions.textstats import ngram_set_hashes
    from flink_fingerprint_ray.oracle import (
        oracle_clean_stream,
        oracle_late_rows,
        oracle_neardup_stream,
    )
    from flink_fingerprint_ray.pipelines.streaming import N_BANDS

    root, pages, _ = corpus
    MIN_CHARS = 120
    bench, _ = ngram_set_hashes(pages["text"].slice(10, 5))
    cfg = {"curation_min_chars": MIN_CHARS, "curation_bench": bench,
           "neardup": True, "late_side_output": True}

    ora_clean = oracle_clean_stream(pages, N_EPOCHS, MIN_CHARS, bench)
    ora_nd = oracle_neardup_stream(pages, N_EPOCHS, n_bands=N_BANDS)
    ora_late = oracle_late_rows(pages, N_EPOCHS)
    assert len(ora_clean) > 0 and len(ora_nd) > 0 and len(ora_late) > 0

    def _check(pipe):
        eng = pipe.result_dataset().to_pandas()
        pd.testing.assert_frame_equal(
            _norm(eng, oracle_df.columns), _norm(oracle_df, oracle_df.columns),
            check_dtype=False)
        for df, ora, cols in (
            (pipe.clean_df(), ora_clean, ["url", "ts_ms", "text_hash"]),
            (pipe.neardup_df(), ora_nd, ["url", "ts_ms"]),
            (pipe.late_df(), ora_late, ["url", "ts_ms"]),
        ):
            pd.testing.assert_frame_equal(
                df[cols].sort_values(cols, kind="stable").reset_index(drop=True),
                ora[cols].sort_values(cols, kind="stable").reset_index(drop=True),
                check_dtype=False)

    pipe = _run(root, "out_combo", cfg_extra=cfg)
    m = pipe.manifest.state["epochs"]
    _check(pipe)
    pipe.shutdown()
    # metric totals agree with each channel's oracle
    assert sum(e["metrics"]["clean_docs"] for e in m.values()) == len(ora_clean)
    assert sum(e["metrics"]["neardup_kept"] for e in m.values()) == len(ora_nd)
    assert sum(e["metrics"]["late_dlq_rows"] for e in m.values()) == len(ora_late)

    # kill/resume the combined run: all three state pools restore
    p1 = _run(root, "out_combo_resume", max_epochs=2, cfg_extra=cfg)
    p1.shutdown()
    p2 = _run(root, "out_combo_resume", cfg_extra=cfg)
    _check(p2)
    p2.shutdown()


def test_streaming_media_features_match_oracle(ray_session, tmp_path):
    """VERDICT r2 item 6: the multimodal column runs under the streaming
    contract — the optional netpbm `media` payload decodes in an
    actor-pool stage inside the epoch driver, features ride the epoch
    fence, and neither the window path nor the curation path is
    disturbed."""
    from flink_fingerprint_ray.functions.textstats import ngram_set_hashes
    from flink_fingerprint_ray.oracle import (
        oracle_clean_stream,
        oracle_media_stream,
    )

    root = str(tmp_path)
    pages = fixtures.make_pages(n_docs=600, seed=33, media_frac=0.15)
    updates = fixtures.make_page_updates(pages, seed=34)
    fixtures.write_epochs(pages, root, n_epochs=3, prefix="pages")
    fixtures.write_epochs(updates, root, n_epochs=3, prefix="updates")
    bench, _ = ngram_set_hashes(pages["text"].slice(3, 4))
    cfg = PipelineConfig(
        sliding=(120_000, 60_000), session_gap_ms=30_000, n_state_partitions=2,
        media_features=True, curation_min_chars=100, curation_bench=bench,
    )
    pipe = StreamingFingerprintPipeline(
        os.path.join(root, "pages"), os.path.join(root, "out"),
        updates_root=os.path.join(root, "updates"), cfg=cfg,
    )
    res = pipe.run()
    med = pipe.media_df()
    clean = pipe.clean_df()
    fps = pipe.result_dataset().to_pandas()
    pipe.shutdown()

    ora_m = oracle_media_stream(pages, 3)
    assert len(ora_m) > 0 and res["media_docs"] == len(ora_m)
    mcols = ["url", "ts_ms", "media_mean", "media_std"]
    pd.testing.assert_frame_equal(
        med[mcols].sort_values(["url", "ts_ms"]).reset_index(drop=True),
        ora_m[mcols].sort_values(["url", "ts_ms"]).reset_index(drop=True),
        check_dtype=False,
    )
    # fingerprint/window path unaffected by BOTH side-channels
    ora_f = oracle_fingerprints(
        pages, 3, updates=updates, sliding=(120_000, 60_000), session_gap_ms=30_000,
    )
    pd.testing.assert_frame_equal(
        _norm(fps, ora_f.columns), _norm(ora_f, ora_f.columns), check_dtype=False,
    )
    # curation stays exact with media enabled
    ora_c = oracle_clean_stream(pages, 3, 100, bench)
    ccols = ["url", "ts_ms", "text_hash"]
    pd.testing.assert_frame_equal(
        clean[ccols].sort_values(ccols).reset_index(drop=True),
        ora_c[ccols].sort_values(ccols).reset_index(drop=True),
        check_dtype=False,
    )


def test_streaming_distinct_url_sketch_exact_registers(ray_session, tmp_path):
    """The per-batch HLL partials max-merged through the counter actor
    must equal a single-process fold over the same kept URLs BIT-EXACTLY
    (max is associative + commutative, so partitioning/delivery order
    cannot change the registers).  Fixture has no late/empty/ooo rows,
    so kept URLs = all URLs."""
    import time

    import ray

    from flink_fingerprint_ray.functions import fingerprint as fp
    from flink_fingerprint_ray.stages.sketch import hll_estimate, hll_fold

    root = str(tmp_path)
    pages = fixtures.make_pages(n_docs=600, seed=33, late_frac=0.0,
                                ooo_frac=0.0, empty_frac=0.0)
    fixtures.write_epochs(pages, root, n_epochs=3, prefix="pages")
    pipe = StreamingFingerprintPipeline(
        os.path.join(root, "pages"), os.path.join(root, "out_hll"),
        cfg=PipelineConfig(**CFG),
    )
    res = pipe.run()
    expect = hll_fold(fp.text_hash64(pages["url"]))
    got = None
    for _ in range(20):    # fire-and-forget merges may still be in flight
        buf = ray.get(pipe.counter.get_regs.remote("distinct_urls"))
        got = np.frombuffer(buf, dtype=np.uint8) if buf is not None else None
        if got is not None and np.array_equal(got, expect):
            break
        time.sleep(0.25)
    pipe.shutdown()
    assert got is not None and np.array_equal(got, expect)
    # run()'s snapshot may predate the last in-flight merge; it must
    # still be a prefix-fold estimate (>= 0) and the COMPLETE registers'
    # estimate lands within the p=12 3-sigma band of the truth
    assert res["distinct_urls_est"] >= 0
    est = int(round(hll_estimate(expect)))
    n_distinct = len(set(pages["url"].to_pylist()))
    assert abs(est - n_distinct) <= 3 * 1.04 / np.sqrt(4096) * n_distinct


def test_late_side_output_matches_oracle_and_resumes(ray_session, corpus, oracle_df):
    """Flink-style side output: with late_side_output on, late rows are
    staged as a per-epoch dead-letter table under the exactly-once fence.
    The DLQ must equal the oracle's late set, the late_dropped metric,
    AND survive kill/resume byte-identically — while the window path
    stays unchanged."""
    from flink_fingerprint_ray.oracle import oracle_late_rows

    root, pages, _ = corpus
    cfg = {"late_side_output": True}
    pipe = _run(root, "out_dlq", cfg_extra=cfg)
    eng = pipe.result_dataset().to_pandas()
    late = pipe.late_df()
    m = pipe.manifest.state["epochs"]
    pipe.shutdown()

    ora = oracle_late_rows(pages, N_EPOCHS)
    assert len(ora) > 0  # fixture injects beyond-watermark rows
    key = ["url", "ts_ms"]
    pd.testing.assert_frame_equal(
        late.sort_values(key).reset_index(drop=True),
        ora.sort_values(key).reset_index(drop=True), check_dtype=False)
    # DLQ row count == the late_dropped metric == per-epoch dlq gauge
    metric_late = sum(e["metrics"].get("late_dropped", 0) for e in m.values())
    dlq_gauge = sum(e["metrics"].get("late_dlq_rows", 0) for e in m.values())
    assert len(late) == metric_late == dlq_gauge
    # the fingerprint path is unaffected by the side output
    pd.testing.assert_frame_equal(
        _norm(eng, oracle_df.columns), _norm(oracle_df, oracle_df.columns),
        check_dtype=False)

    # kill after 2 epochs, resume — DLQ must come out identical
    p1 = _run(root, "out_dlq_resume", max_epochs=2, cfg_extra=cfg)
    p1.shutdown()
    p2 = _run(root, "out_dlq_resume", cfg_extra=cfg)
    late2 = p2.late_df()
    p2.shutdown()
    pd.testing.assert_frame_equal(
        late2.sort_values(key).reset_index(drop=True),
        ora.sort_values(key).reset_index(drop=True), check_dtype=False)


def test_follow_tails_appended_epochs_exactly_once(ray_session, tmp_path):
    """S1 tailing mode (the reference's unbounded Kafka consumption):
    epochs appended while run(follow=True) is live are discovered,
    processed and committed exactly once; an _INPROGRESS epoch stays
    invisible until sealed; output equals the all-at-once oracle."""
    import shutil
    import threading
    import time as _time

    N = 5
    stage = tmp_path / "stage"
    live = tmp_path / "live"
    pages = fixtures.make_pages(n_docs=500, seed=23)
    updates = fixtures.make_page_updates(pages, seed=24)
    fixtures.write_epochs(pages, str(stage), n_epochs=N, prefix="pages")
    fixtures.write_epochs(updates, str(live), n_epochs=N, prefix="updates")
    os.makedirs(live / "pages")
    for k in range(3):  # epochs 0-2 present at start
        shutil.move(str(stage / "pages" / f"epoch={k:05d}"),
                    str(live / "pages" / f"epoch={k:05d}"))

    cfg = PipelineConfig(**CFG)
    pipe = StreamingFingerprintPipeline(
        str(live / "pages"), str(live / "out_follow"),
        updates_root=str(live / "updates"), cfg=cfg)
    stop_file = str(tmp_path / "STOP")
    result: dict = {}

    def _tail():
        result.update(pipe.run(follow=True, poll_interval_s=0.1,
                               idle_timeout_s=30.0, stop_file=stop_file))

    t = threading.Thread(target=_tail)
    t.start()
    try:
        deadline = _time.monotonic() + 60
        while pipe.manifest.cursor < 2 and _time.monotonic() < deadline:
            _time.sleep(0.1)
        assert pipe.manifest.cursor == 2
        # epoch 3 arrives UNSEALED: marker present -> must stay invisible
        d3 = live / "pages" / "epoch=00003"
        shutil.move(str(stage / "pages" / "epoch=00003"), str(d3))
        open(d3 / "_INPROGRESS", "w").close()
        _time.sleep(0.5)  # several polls
        assert pipe.manifest.cursor == 2
        os.unlink(d3 / "_INPROGRESS")  # seal 3, then append 4
        shutil.move(str(stage / "pages" / "epoch=00004"),
                    str(live / "pages" / "epoch=00004"))
        while pipe.manifest.cursor < 4 and _time.monotonic() < deadline:
            _time.sleep(0.1)
        assert pipe.manifest.cursor == 4
        open(stop_file, "w").close()
    finally:
        t.join(timeout=90)
    assert not t.is_alive()
    assert result["epochs_run"] == N
    # exactly once: every epoch index appears exactly once across passes
    idx = [m["epoch"] for m in result["per_epoch"]]
    assert sorted(idx) == list(range(N))
    eng = pipe.result_dataset().to_pandas()
    pipe.shutdown()
    ora = oracle_fingerprints(pages, N, updates=updates,
                              sliding=CFG["sliding"],
                              session_gap_ms=CFG["session_gap_ms"])
    assert len(eng) == len(ora) > 0
    pd.testing.assert_frame_equal(
        _norm(eng, ora.columns), _norm(ora, ora.columns), check_dtype=False)


def test_streaming_media_mixed_codecs_match_oracle(ray_session, tmp_path):
    """Round 4: the media side-channel decodes MIXED real codecs in the
    stream — netpbm P6, baseline JPEG, lossless PNG and GIF89a payloads
    cycle through the same epochs; the actor-pool stage and the oracle
    share the signature-sniffing dispatch, so features match
    float-exactly."""
    from flink_fingerprint_ray.oracle import oracle_media_stream

    root = str(tmp_path)
    pages = fixtures.make_pages(n_docs=600, seed=35, media_frac=0.2,
                                media_codecs="mixed")
    # prove the corpus genuinely mixes all four codecs
    payloads = [p for p in pages["media"].to_pylist() if p is not None]
    sigs = {(b"P6" if p[:2] == b"P6" else
             b"JPG" if p[:2] == b"\xff\xd8" else
             b"PNG" if p[:8] == b"\x89PNG\r\n\x1a\n" else
             b"GIF" if p[:6] in (b"GIF87a", b"GIF89a") else b"?") for p in payloads}
    assert sigs == {b"P6", b"JPG", b"PNG", b"GIF"}
    fixtures.write_epochs(pages, root, n_epochs=3, prefix="pages")
    cfg = PipelineConfig(sliding=None, session_gap_ms=0,
                         n_state_partitions=2, media_features=True)
    pipe = StreamingFingerprintPipeline(
        os.path.join(root, "pages"), os.path.join(root, "out"), cfg=cfg)
    res = pipe.run()
    med = pipe.media_df()
    pipe.shutdown()

    ora = oracle_media_stream(pages, 3)
    assert len(ora) > 0 and res["media_docs"] == len(ora)
    mcols = ["url", "ts_ms", "media_mean", "media_std"]
    pd.testing.assert_frame_equal(
        med[mcols].sort_values(["url", "ts_ms"]).reset_index(drop=True),
        ora[mcols].sort_values(["url", "ts_ms"]).reset_index(drop=True),
        check_dtype=False,
    )


def test_general_extractor_parity_and_resume_guard(ray_session, tmp_path):
    """extractor="general" end-to-end: messy real-world markup pages
    (hostile scripts/comments/entities) flow through the flagship with
    the boilerplate-aware parser; engine == oracle row-exactly; the
    checkpoint refuses a resume under a different extractor; and the
    general extraction genuinely differs from the strict kernel's view
    (boilerplate text enters the stream)."""
    root = str(tmp_path)
    pages = fixtures.make_pages(n_docs=600, seed=23, html_style="messy")
    updates = fixtures.make_page_updates(pages, seed=24)
    fixtures.write_epochs(pages, root, n_epochs=3, prefix="pages")
    fixtures.write_epochs(updates, root, n_epochs=3, prefix="updates")
    cfg = PipelineConfig(sliding=(120_000, 60_000), session_gap_ms=30_000,
                         n_state_partitions=3, extractor="general")
    pipe = StreamingFingerprintPipeline(
        os.path.join(root, "pages"), os.path.join(root, "out_gen"),
        updates_root=os.path.join(root, "updates"), cfg=cfg)
    pipe.run()
    eng = pipe.result_dataset().to_pandas()
    pipe.shutdown()
    ora = oracle_fingerprints(pages, 3, updates=updates,
                              sliding=(120_000, 60_000),
                              session_gap_ms=30_000, extractor="general")
    assert len(eng) == len(ora) > 0
    pd.testing.assert_frame_equal(
        _norm(eng, ora.columns), _norm(ora, ora.columns), check_dtype=False)
    # the strict kernel sees DIFFERENT text on messy pages (the general
    # parser recovers boilerplate lines strict cannot) -> different stats
    ora_strict = oracle_fingerprints(pages, 3, updates=updates,
                                     sliding=(120_000, 60_000),
                                     session_gap_ms=30_000)
    assert not _norm(ora, ora.columns).equals(_norm(ora_strict, ora.columns))
    # resume under a different extractor must refuse loudly
    cfg2 = PipelineConfig(sliding=(120_000, 60_000), session_gap_ms=30_000,
                          n_state_partitions=3, extractor="strict")
    with pytest.raises(RuntimeError, match="side-channel"):
        StreamingFingerprintPipeline(
            os.path.join(root, "pages"), os.path.join(root, "out_gen"),
            updates_root=os.path.join(root, "updates"), cfg=cfg2)


def test_broadcast_blocklist_side_input_parity_and_resume(ray_session, tmp_path):
    """Flink broadcast-state analog: a dynamic host-blocklist epoch
    stream gates ingest with the strictly-before rule (side epoch K's
    rules apply from page epoch K+1).  Engine == oracle row-exactly,
    the rules measurably drop rows, rules replay deterministically
    across kill/resume, and the channel guard refuses a resume without
    the side input."""
    root = str(tmp_path)
    pages = fixtures.make_pages(n_docs=800, seed=31)
    updates = fixtures.make_page_updates(pages, seed=32)
    bl = fixtures.make_blocklist(pages, n_hosts=3, seed=33)
    n_ep = 4
    fixtures.write_epochs(pages, root, n_epochs=n_ep, prefix="pages")
    fixtures.write_epochs(updates, root, n_epochs=n_ep, prefix="updates")
    fixtures.write_epochs(bl, root, n_epochs=n_ep, prefix="blocklist")
    cfg = PipelineConfig(sliding=(120_000, 60_000), session_gap_ms=30_000,
                         n_state_partitions=3)

    def mk(out):
        return StreamingFingerprintPipeline(
            os.path.join(root, "pages"), os.path.join(root, out),
            updates_root=os.path.join(root, "updates"), cfg=cfg,
            blocklist_root=os.path.join(root, "blocklist"))

    pipe = mk("out_bl")
    stats = pipe.run()
    eng = pipe.result_dataset().to_pandas()
    pipe.shutdown()
    n_blocked = sum(m.get("blocklist_dropped", 0) for m in stats["per_epoch"])
    assert n_blocked > 0
    ora = oracle_fingerprints(pages, n_ep, updates=updates,
                              sliding=(120_000, 60_000),
                              session_gap_ms=30_000, blocklist=bl)
    assert len(eng) == len(ora) > 0
    pd.testing.assert_frame_equal(
        _norm(eng, ora.columns), _norm(ora, ora.columns), check_dtype=False)
    # a no-blocklist oracle differs -> the rules really changed the output
    ora_plain = oracle_fingerprints(pages, n_ep, updates=updates,
                                    sliding=(120_000, 60_000),
                                    session_gap_ms=30_000)
    assert not _norm(ora, ora.columns).equals(
        _norm(ora_plain, ora_plain.columns))

    # kill after 2 epochs, resume in a FRESH pipeline: the side-input
    # prefix replays deterministically and output still matches
    pipe1 = mk("out_bl_resume")
    pipe1.run(max_epochs=2)
    pipe1.shutdown()
    pipe2 = mk("out_bl_resume")
    pipe2.run()
    eng2 = pipe2.result_dataset().to_pandas()
    pipe2.shutdown()
    pd.testing.assert_frame_equal(
        _norm(eng2, ora.columns), _norm(ora, ora.columns), check_dtype=False)

    # resume WITHOUT the side input must refuse loudly
    with pytest.raises(RuntimeError, match="side-channel"):
        StreamingFingerprintPipeline(
            os.path.join(root, "pages"), os.path.join(root, "out_bl"),
            updates_root=os.path.join(root, "updates"), cfg=cfg)


def test_cumulate_windows_parity_and_resume(ray_session, corpus):
    """Flink CUMULATE window kind end-to-end: each 4-min max span emits
    growing per-minute prefixes that close at their own step boundary, so
    window identity is (start, END).  Engine output must match the
    oracle row-exactly (including rising-edge alert ordering with the
    window_end tiebreak), survive kill + resume, and the channel guard
    must refuse a resume with the kind toggled off."""
    from flink_fingerprint_ray.oracle import oracle_alerts

    root, pages, updates = corpus
    cum = (60_000, 240_000)
    want = oracle_fingerprints(
        pages, N_EPOCHS, updates=updates,
        sliding=CFG["sliding"], session_gap_ms=CFG["session_gap_ms"],
        cumulate=cum,
    )
    sc = SORT_COLS + ["window_end"]

    def norm(df):
        return (df.sort_values(sc, kind="stable").reset_index(drop=True)
                [want.columns.tolist()])

    p1 = _run(root, "out_cumulate", cfg_extra={"cumulate": cum})
    eng = p1.result_dataset().to_pandas()
    alerts = p1.alerts_df()
    p1.shutdown()
    assert set(eng["window_kind"]) == {"tumbling", "sliding", "session",
                                       "cumulate"}
    cu = eng[eng["window_kind"] == "cumulate"]
    # cumulate slices genuinely share a start — identity needs the end
    assert cu.groupby(["key_lang", "key_host", "window_start"]).size().max() > 1
    pd.testing.assert_frame_equal(norm(eng), norm(want), check_dtype=False)
    want_alerts = oracle_alerts(want)
    ac = ["key_lang", "key_host", "window_kind", "window_start", "window_end"]
    pd.testing.assert_frame_equal(
        alerts.sort_values(ac).reset_index(drop=True),
        want_alerts.sort_values(ac).reset_index(drop=True), check_dtype=False)

    # kill after 2 epochs, resume, finish: output identical
    p2 = _run(root, "out_cumulate_resume", max_epochs=2,
              cfg_extra={"cumulate": cum})
    p2.shutdown()
    p3 = _run(root, "out_cumulate_resume", cfg_extra={"cumulate": cum})
    eng2 = p3.result_dataset().to_pandas()
    p3.shutdown()
    pd.testing.assert_frame_equal(norm(eng2), norm(want), check_dtype=False)

    # toggling the window shape across a resume must be refused loudly
    with pytest.raises(RuntimeError, match="side-channel"):
        _run(root, "out_cumulate_resume")


def test_window_topn_parity_and_resume(ray_session, corpus, oracle_df):
    """Windowed Top-N side output (Flink window Top-N analog): per
    closed tumbling window, the top-3 hosts by total doc_count ride the
    epoch fence as topn.parquet.  The per-epoch union must equal the
    global oracle ranking (a tumbling window closes atomically in one
    epoch), survive kill + resume, and the channel guard must refuse a
    resume with the channel toggled off."""
    from flink_fingerprint_ray.oracle import oracle_window_topn

    root, _, _ = corpus
    want = oracle_window_topn(oracle_df, 3)
    assert len(want) > 0 and (want["rank"] == 3).any()
    sc = ["window_start", "rank"]

    def norm(df):
        return (df.sort_values(sc, kind="stable").reset_index(drop=True)
                [want.columns.tolist()])

    p1 = _run(root, "out_topn", cfg_extra={"window_topn": 3})
    topn = p1.topn_df()
    m = p1.manifest.state["epochs"]
    p1.shutdown()
    # every committed epoch carries the metric; the channel stays exact
    assert sum(m[str(e)]["metrics"]["topn_rows"] for e in range(N_EPOCHS)) == len(topn)
    pd.testing.assert_frame_equal(norm(topn), norm(want), check_dtype=False)

    # kill after 2 epochs, resume, finish: output identical
    p2 = _run(root, "out_topn_resume", max_epochs=2,
              cfg_extra={"window_topn": 3})
    p2.shutdown()
    p3 = _run(root, "out_topn_resume", cfg_extra={"window_topn": 3})
    topn2 = p3.topn_df()
    p3.shutdown()
    pd.testing.assert_frame_equal(norm(topn2), norm(want), check_dtype=False)

    # toggling the channel across a resume must be refused loudly
    with pytest.raises(RuntimeError, match="side-channel"):
        _run(root, "out_topn_resume")


def test_streaming_cep_parity_and_resume(ray_session, corpus, oracle_df):
    """Streaming CEP (MATCH_RECOGNIZE analog): matches over strictly-
    consecutive closed windows of a key must equal the oracle's global
    scan — including matches whose earlier windows closed in EARLIER
    epochs (the cross-epoch tail state) — survive kill + resume, and the
    channel guard must refuse a resume with the pattern toggled."""
    from flink_fingerprint_ray.oracle import oracle_cep_matches

    root, _, _ = corpus
    pattern = (">0", "==0")  # a dup window followed by a clean one
    want = oracle_cep_matches(oracle_df, pattern)
    assert len(want) > 0
    # the pattern spans 2 windows, so match_start differs from the
    # emitting window's start — the tail state is actually exercised
    assert (want["match_start"] < want["window_start"]).all()
    sc = ["key_lang", "key_host", "window_kind", "window_start", "window_end"]

    def norm(df):
        return (df.sort_values(sc, kind="stable").reset_index(drop=True)
                [want.columns.tolist()])

    p1 = _run(root, "out_cep", cfg_extra={"cep_pattern": pattern})
    cep = p1.cep_df()
    m = p1.manifest.state["epochs"]
    p1.shutdown()
    assert sum(m[str(e)]["metrics"]["cep_matches"] for e in range(N_EPOCHS)) == len(cep)
    # matches must be emitted in more than one epoch (cross-epoch state)
    emitting = [e for e in range(N_EPOCHS) if m[str(e)]["metrics"]["cep_matches"]]
    assert len(emitting) >= 2
    pd.testing.assert_frame_equal(norm(cep), norm(want), check_dtype=False)

    # kill after 2 epochs, resume, finish: output identical
    p2 = _run(root, "out_cep_resume", max_epochs=2,
              cfg_extra={"cep_pattern": pattern})
    p2.shutdown()
    p3 = _run(root, "out_cep_resume", cfg_extra={"cep_pattern": pattern})
    cep2 = p3.cep_df()
    p3.shutdown()
    pd.testing.assert_frame_equal(norm(cep2), norm(want), check_dtype=False)

    # a resume under a DIFFERENT pattern must be refused loudly
    with pytest.raises(RuntimeError, match="side-channel"):
        _run(root, "out_cep_resume", cfg_extra={"cep_pattern": (">0", ">0")})

    # column-qualified predicates: two busy windows then a clean one
    pat2 = ("doc_count>=2", "doc_count>=2", "==0")
    want2 = oracle_cep_matches(oracle_df, pat2)
    assert len(want2) > 50  # non-vacuous mixed-column pattern
    p4 = _run(root, "out_cep_cols", cfg_extra={"cep_pattern": pat2})
    cep4 = p4.cep_df()
    p4.shutdown()
    pd.testing.assert_frame_equal(
        cep4.sort_values(sc, kind="stable").reset_index(drop=True)
        [want2.columns.tolist()],
        want2.sort_values(sc, kind="stable").reset_index(drop=True),
        check_dtype=False)


def test_savepoint_rescale_resume(ray_session, corpus, oracle_df):
    """Savepoint rescaling (Flink savepoint-rescale analog): a checkpoint
    written with n_state_partitions=3 resumes under n=5 (and 5 under 2) —
    the committed window/join/alert/CEP/dedup state is re-partitioned by
    the routing hashes at the new count, and every output stream still
    matches the oracle row-exactly."""
    from flink_fingerprint_ray.oracle import (
        oracle_alerts,
        oracle_cep_matches,
        oracle_clean_stream,
    )

    root, pages, _ = corpus
    MIN_CHARS = 120
    pattern = (">0", "==0")
    extra = {"curation_min_chars": MIN_CHARS, "cep_pattern": pattern}
    want_alerts = oracle_alerts(oracle_df)
    want_cep = oracle_cep_matches(oracle_df, pattern)
    want_clean = oracle_clean_stream(pages, N_EPOCHS, MIN_CHARS, None)
    assert len(want_alerts) and len(want_cep) and len(want_clean)

    # 2 epochs at n=3, then resume AND RESCALE to n=5
    p1 = _run(root, "out_rescale", max_epochs=2, cfg_extra=extra)
    p1.shutdown()
    p2 = _run(root, "out_rescale",
              cfg_extra={**extra, "n_state_partitions": 5})
    eng = p2.result_dataset().to_pandas()
    alerts, cep, clean = p2.alerts_df(), p2.cep_df(), p2.clean_df()
    p2.shutdown()
    pd.testing.assert_frame_equal(
        _norm(eng, oracle_df.columns), _norm(oracle_df, oracle_df.columns),
        check_dtype=False)
    ac = ["key_lang", "key_host", "window_kind", "window_start", "window_end"]
    for got, want, cols in (
            (alerts, want_alerts, ac),
            (cep, want_cep, ac),
            (clean, want_clean, ["url", "ts_ms", "text_hash"])):
        pd.testing.assert_frame_equal(
            got.sort_values(cols).reset_index(drop=True)[want.columns.tolist()],
            want.sort_values(cols).reset_index(drop=True), check_dtype=False)

    # and DOWN: 2 epochs at n=5, resume at n=2
    p3 = _run(root, "out_rescale_down", max_epochs=2,
              cfg_extra={**extra, "n_state_partitions": 5})
    p3.shutdown()
    p4 = _run(root, "out_rescale_down",
              cfg_extra={**extra, "n_state_partitions": 2})
    eng_d = p4.result_dataset().to_pandas()
    p4.shutdown()
    pd.testing.assert_frame_equal(
        _norm(eng_d, oracle_df.columns), _norm(oracle_df, oracle_df.columns),
        check_dtype=False)

    # near-dup state spills to per-partition disk runs: rescale refused
    p5 = _run(root, "out_rescale_nd", max_epochs=2,
              cfg_extra={"neardup": True})
    p5.shutdown()
    with pytest.raises(RuntimeError, match="rescale"):
        _run(root, "out_rescale_nd",
             cfg_extra={"neardup": True, "n_state_partitions": 4})


def test_manifest_mode_composes_with_side_channels(ray_session, tmp_path):
    """S3-style commit protocol under the FULL side-channel load:
    allowed lateness (refires), window Top-N, CEP and the late DLQ all
    ride the same manifest-pointer fence — every channel must match its
    oracle through kill+resume AND a crash-replay (rewound cursor), with
    the replayed epoch's channel rows appearing exactly once (the
    orphaned attempt invisible to every accessor)."""
    import glob as _glob
    import json as _json

    from flink_fingerprint_ray.oracle import (
        oracle_cep_matches,
        oracle_late_rows,
        oracle_window_topn,
    )

    pages, updates, span = _late_corpus(tmp_path)
    ALLOWED = span // 3
    pattern = (">0", "==0")
    cfg = PipelineConfig(sliding=(120_000, 60_000), n_state_partitions=3,
                         allowed_lateness_ms=int(ALLOWED),
                         window_topn=3, cep_pattern=pattern,
                         late_side_output=True, commit_mode="manifest")
    args = (str(tmp_path / "pages"), str(tmp_path / "out"))

    p1 = StreamingFingerprintPipeline(
        *args, updates_root=str(tmp_path / "updates"), cfg=cfg)
    p1.run(max_epochs=2)
    p1.shutdown()                      # kill between epochs
    p2 = StreamingFingerprintPipeline(
        *args, updates_root=str(tmp_path / "updates"), cfg=cfg)
    p2.run()
    p2.shutdown()

    ora, ora_ref = oracle_fingerprints(
        pages, 4, updates=updates, sliding=(120_000, 60_000),
        allowed_lateness_ms=int(ALLOWED), return_refires=True)
    want_topn = oracle_window_topn(ora, 3)
    want_cep = oracle_cep_matches(ora, pattern)
    want_late = oracle_late_rows(pages, 4, allowed_lateness_ms=int(ALLOWED))
    assert len(ora_ref) > 0 and len(want_topn) > 0 and len(want_cep) > 0 \
        and len(want_late) > 0      # composition is non-vacuous

    def check_all():
        pipe = StreamingFingerprintPipeline(
            *args, updates_root=str(tmp_path / "updates"), cfg=cfg)
        try:
            eng = pipe.result_dataset().to_pandas()
            pd.testing.assert_frame_equal(
                _norm(eng, ora.columns), _norm(ora, ora.columns),
                check_dtype=False)
            ref = pipe.refire_df()
            sc2 = SORT_COLS + ["window_end", "refire_seq"]
            assert len(ref) == len(ora_ref)
            pd.testing.assert_frame_equal(
                ref.sort_values(sc2).reset_index(drop=True)[
                    ora_ref.columns.tolist()],
                ora_ref.sort_values(sc2).reset_index(drop=True),
                check_dtype=False)
            tc = ["window_start", "rank"]
            got_topn = pipe.topn_df()
            pd.testing.assert_frame_equal(
                got_topn.sort_values(tc, kind="stable").reset_index(drop=True)[
                    want_topn.columns.tolist()],
                want_topn.sort_values(tc, kind="stable").reset_index(drop=True),
                check_dtype=False)
            cc = ["key_lang", "key_host", "window_kind", "window_start",
                  "window_end"]
            got_cep = pipe.cep_df()
            pd.testing.assert_frame_equal(
                got_cep.sort_values(cc, kind="stable").reset_index(drop=True)[
                    want_cep.columns.tolist()],
                want_cep.sort_values(cc, kind="stable").reset_index(drop=True),
                check_dtype=False)
            lc = ["url", "ts_ms"]
            got_late = pipe.late_df()
            pd.testing.assert_frame_equal(
                got_late[lc].sort_values(lc).reset_index(drop=True),
                want_late[lc].sort_values(lc).reset_index(drop=True),
                check_dtype=False)
        finally:
            pipe.shutdown()

    check_all()

    # crash-replay: rewind the manifest cursor one epoch and rerun — the
    # replay writes a fresh attempt; every channel stays exactly-once
    mpath = str(tmp_path / "out" / "manifest.json")
    st = _json.load(open(mpath))
    st["cursor"] = 2
    st["watermark_ms"] = st["epochs"]["2"]["watermark_ms"]
    _json.dump(st, open(mpath, "w"))
    p3 = StreamingFingerprintPipeline(
        *args, updates_root=str(tmp_path / "updates"), cfg=cfg)
    p3.run()
    p3.shutdown()
    last = str(tmp_path / "out" / "data" / "epoch=00003")
    assert len([d for d in os.listdir(last) if d.startswith("attempt-")]) == 2
    assert not _glob.glob(str(tmp_path / "out" / "epoch=*"))  # no rename fences
    check_all()
