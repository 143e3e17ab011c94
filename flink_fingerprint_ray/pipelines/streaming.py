"""The flagship pipeline: windowed content-fingerprinting over an epoched
Parquet stream of web pages, with watermarks, cross-epoch window state,
near-dup cluster counts, a stateful join against a late-arriving
page-update stream, and an exactly-once epoch-fenced sink.

Ray-Data-first dataflow per epoch (SURVEY.md §3.4):

    read_parquet(epoch files)                       # zero-copy Arrow blocks
      → map_batches(page_transform, pyarrow)        # html→text (byte-identical),
                                                    # SimHash/MinHash, key=(lang,host);
                                                    # html/text projected away BEFORE
                                                    # any shuffle (SURVEY §7.4.6)
      → map_batches(explode_windows, pyarrow)       # tumbling + sliding + session rows
      → route_and_split tasks (one per block)       # open rows → state actors,
                                                    # closable rows → returned refs
    closable ∪ matured(actor pool, watermark)
      → groupby(key, window).map_groups(finalize)   # stats + dup-cluster counts
      → probe join-state actors (update counts)
      → staged parquet → snapshot state → commit fence

Event-time contract (mirrored bit-for-bit by ``oracle.py``):
- watermark_e = max(watermark_{e-1}, max(warc_ts in epoch e) − lateness);
- a row is LATE iff warc_ts < watermark_{e-1} (the watermark when its
  epoch starts) — dropped + counted, like Flink post-watermark drops
  (no allowed-lateness configured in the reference, ``job.py:78-82``);
- window [s, e) closes in the first epoch with watermark ≥ e;
- empty-text pages are dropped like ``"null"`` payloads
  (``src/flink_job/job.py:68``).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions import fingerprint as fp
from ..sources.epochs import EpochSource
from ..state.store import StatePool
from ..stages.shuffle import arrow_refs
from ..stages.windows import finalize_many
from .sink import CheckpointManifest, EpochSink

N_BANDS = 16

logger = logging.getLogger(__name__)

# buffered-session-rows level above which an explicitly UNBOUNDED
# (session_max_ms=0) pipeline warns once per doubling — the state that
# never closes is the one that kills a long-running job
SESSION_STATE_WARN_ROWS = 500_000


@dataclass
class PipelineConfig:
    tumbling_size_ms: int = 60_000            # reference: 1-min window (config.py:36)
    sliding: tuple[int, int] | None = None    # (size_ms, slide_ms)
    cumulate: tuple[int, int] | None = None   # (step_ms, max_ms): Flink
                                              # CUMULATE window TVF — emits
                                              # growing [start, start+k*step)
                                              # prefixes of each max-span
                                              # window; max must be a
                                              # multiple of step
    session_gap_ms: int = 0                   # 0 = session windows off
    # dynamic per-element session gap (Flink SessionWindowTimeGapExtractor
    # analog): key_lang -> gap_ms, with session_gap_ms the default for
    # unmapped langs.  The session end becomes max(ts + gap(element)) over
    # the session's elements; for a constant gap this is exactly
    # last_ts + gap, so the fixed path is the map=None special case.
    # Requires session_gap_ms > 0.  Recorded in the checkpoint manifest
    # channel set (window-shape config is output identity).
    session_gap_by_lang: dict | None = None
    # Fully general gap extractor (Flink's extractor sees the WHOLE
    # element): a derived-column formula (functions/exprs.py surface)
    # over the numeric narrow-row columns (ts_ms, text_len, text_hash),
    # evaluated vectorized in the state actor, yielding a PER-ROW gap in
    # ms (floored, clamped to >= 1).  e.g. "20000 + text_len * 100".
    # Requires session_gap_ms > 0 (the AUTO-cap base); mutually
    # exclusive with session_gap_by_lang and with allowed_lateness_ms.
    # Recorded in the manifest channel set (resume under a different
    # formula is refused — window identity would change).
    session_gap_expr: str | None = None
    session_max_ms: int | None = None         # None = AUTO (20 x gap); >0
                                              # force-closes sessions older than
                                              # this vs the watermark (bounds open
                                              # state for hot keys that never
                                              # idle); 0 = explicitly unbounded —
                                              # a documented foot-gun at scale
                                              # (the engine warns loudly when
                                              # unbounded session state grows).
                                              # The oracle resolves None with the
                                              # SAME rule, so parity holds by
                                              # construction.
    lateness_ms: int = 10_000                 # reference: 10 s (config.py:37)
    # Flink allowedLateness analog (FIXED windows: tumbling/sliding/
    # cumulate; sessions never admit late rows).  >0 admits rows up to
    # this much behind the late cutoff: a late row whose window is still
    # open joins it normally (first fire includes it); one whose window
    # already fired RE-FIRES the window as an updated FULL aggregate on
    # the refire side channel (refires-p*.parquet + refire_seq, same
    # exactly-once fence; `refire_dataset()`), exactly once per
    # (window, epoch-with-late-arrivals).  Window content is retained in
    # the state actors until window_end + allowed <= watermark; later
    # arrivals drop (refire_dropped metric).  Refires do NOT feed the
    # alert/CEP/Top-N channels: those consume the on-time close stream,
    # whose first-fire aggregates DO include admitted-late rows that
    # joined a still-open window (channel oracles therefore run over the
    # first-fire rows — pinned by
    # test_allowed_lateness_composes_with_engine_channels).
    allowed_lateness_ms: int = 0
    join_retention_ms: int = 300_000          # reference: 5 min (save_fingerprints.py:85)
    n_state_partitions: int = 8
    n_finalize_partitions: int | None = None  # default max(8, n_state_partitions)
    jaccard_threshold: float = 0.8
    read_blocks: int | None = None            # override_num_blocks on read
    snapshot_compact_every: int = 8           # full-base rewrite cadence (delta checkpoints)
    # sink commit protocol: "rename" (atomic dir rename — shared POSIX
    # filesystem) or "manifest" (immutable attempt-prefixed data files +
    # single manifest-pointer write — S3-style object stores, where
    # rename does not exist).  See pipelines/sink.py EpochSink.
    commit_mode: str = "rename"
    # -- streaming curation path (batch analog: queries.q_clean_corpus) --
    # >0 enables: quality gate (min extracted-text chars) + optional
    # decontamination + cross-epoch exact dedup, all under the same
    # watermark / snapshot / exactly-once-commit contract as the windows
    curation_min_chars: int = 0
    # sorted uint64 benchmark trigram hashes (ngram_set_hashes output) for
    # decontamination; None = gate+dedup only
    curation_bench: object = None
    # decode the optional `media` column (netpbm payloads) in an
    # actor-pool stage and stage per-epoch media features under the same
    # watermark/fence contract (multimodal under streaming, VERDICT r2 #6)
    media_features: bool = False
    # Flink-style side output: late rows, instead of being counted and
    # dropped, are ALSO staged as a per-epoch dead-letter table
    # (url, ts_ms) under the same exactly-once fence — the audit trail a
    # production ingest needs to re-drive late data
    late_side_output: bool = False
    # streaming MinHash-LSH near-dup dedup (batch analog:
    # queries.q_minhash_lsh_clusters): a doc survives iff NONE of its
    # minhash band keys was registered by a survivor of an earlier
    # committed epoch and it is the (ts_ms, url)-minimal carrier of every
    # one of its bands this epoch.  Survivors ride the epoch fence as
    # neardup-p*.parquet; band state lives in the NearDupStateActor pool
    # (delta-snapshotted, close→reduce→register→snapshot→commit ordering)
    neardup: bool = False
    # html -> text extraction kernel: "strict" = the invertible
    # single-block extractor (fp.extract_text, the byte-identical
    # fixture contract), "general" = the boilerplate-aware parser
    # (functions/html.extract_text_general) for real-world markup.
    # Recorded in the checkpoint manifest channel set — a resume under a
    # different extractor would silently change every fingerprint.
    extractor: str = "strict"
    # streaming CEP (Flink MATCH_RECOGNIZE analog, AFTER MATCH SKIP TO
    # NEXT ROW): a sequence of comparison predicates over
    # dup_cluster_count, e.g. ("==0", ">0", ">0"); a match row is staged
    # under the fence at every window whose last len(pattern) strictly-
    # consecutive closed windows of the same (lang, host, kind) satisfy
    # the predicates elementwise.  Cross-epoch partial-match state lives
    # in the alert actor pool (one sorted pass serves both scans;
    # snapshotted + resumable).
    cep_pattern: tuple | None = None
    # Flink window Top-N analog: >0 stages, per CLOSED tumbling window,
    # the top-N hosts by total doc_count (summed over langs) as a
    # per-epoch topn.parquet under the same exactly-once fence.  Needs
    # no cross-epoch state: a tumbling window closes atomically within
    # one epoch (a row for an already-matured window would be behind the
    # late cutoff), so per-epoch ranking IS the global ranking.
    window_topn: int = 0

    def __post_init__(self) -> None:
        if self.session_gap_by_lang and not self.session_gap_ms:
            raise ValueError("session_gap_by_lang needs session_gap_ms > 0 "
                             "(the default gap for unmapped langs)")
        if self.session_gap_by_lang and self.allowed_lateness_ms > 0:
            raise ValueError(
                "allowed_lateness_ms with session_gap_by_lang is not "
                "supported: the session lateness sweep re-segments with a "
                "constant gap (dynamic per-element gaps would need the "
                "running-cummax kernel inside the retention/refire path)")
        if self.session_gap_expr:
            if not self.session_gap_ms:
                raise ValueError("session_gap_expr needs session_gap_ms > 0 "
                                 "(enables sessions and anchors the AUTO cap)")
            if self.session_gap_by_lang:
                raise ValueError("session_gap_expr and session_gap_by_lang "
                                 "are mutually exclusive gap extractors")
            if self.allowed_lateness_ms > 0:
                raise ValueError(
                    "allowed_lateness_ms with session_gap_expr is not "
                    "supported (same constant-gap constraint as "
                    "session_gap_by_lang)")
            from ..functions.exprs import compile_expr

            compile_expr(self.session_gap_expr)  # config-time validation
        if self.session_max_ms is None:
            # AUTO: bound open-session state at 20x the gap — long enough
            # that organic sessions are untouched, finite so a hot key
            # that never idles cannot grow state forever (round-3 finding:
            # unbounded default left monotone buffered_rows_final).
            # Under a dynamic gap, 20x the LARGEST configured gap (the
            # oracle resolves None with the same rule).
            gap_cap = max([self.session_gap_ms,
                           *(self.session_gap_by_lang or {}).values()])
            self.session_max_ms = 20 * gap_cap if self.session_gap_ms else 0
        if self.cumulate is not None:
            step, mx = self.cumulate
            if step <= 0 or mx % step != 0:
                raise ValueError("cumulate=(step_ms, max_ms) needs step > 0 "
                                 "and max a multiple of step")
        if self.cep_pattern is not None:
            from ..state.store import parse_cep_pattern

            parse_cep_pattern(self.cep_pattern)  # config-time validation


FINGERPRINT_COLS = [
    "fingerprint_id", "key_lang", "key_host", "window_kind",
    "window_start", "window_end", "doc_count",
    "exact_dup_count", "near_dup_count", "dup_cluster_count",
    "min_len", "max_len", "median_len", "mean_len", "std_len",
]

FINGERPRINT_SCHEMA = pa.schema(
    [
        ("fingerprint_id", pa.string()),
        ("key_lang", pa.string()),
        ("key_host", pa.string()),
        ("window_kind", pa.string()),
        ("window_start", pa.int64()),
        ("window_end", pa.int64()),
        ("doc_count", pa.int64()),
        ("exact_dup_count", pa.int64()),
        ("near_dup_count", pa.int64()),
        ("dup_cluster_count", pa.int64()),
        ("min_len", pa.float64()),
        ("max_len", pa.float64()),
        ("median_len", pa.float64()),
        ("mean_len", pa.float64()),
        ("std_len", pa.float64()),
    ]
)


def _empty_fingerprints() -> pa.Table:
    return FINGERPRINT_SCHEMA.empty_table()


def window_salt_hash(key_hash: np.ndarray, window_start: np.ndarray) -> np.ndarray:
    """Skew mitigation for hot hosts (SURVEY.md §7.3/§7.4.5): partition by
    hash(key, window) instead of hash(key), so a hot (lang, host)'s
    windows spread across partitions/actors.  GROUP-PRESERVING salting:
    every row of one (key, window) group still lands together, so
    whole-group computations (median, dup clusters) stay exact — unlike
    row-level salting, which cannot be de-salted for those.  Session rows
    (data-dependent boundaries) are the documented exception: they stay
    key-owned until close, then their stamped bounds salt the finalize."""
    with np.errstate(over="ignore"):
        return key_hash ^ (
            window_start.astype(np.int64).view(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
        )


@ray.remote(num_returns=2)
def finalize_partition(
    path: str,
    join_handles: list,
    n_join_partitions: int,
    my_part: int,
    n_parts: int,
    *tables: pa.Table,
):
    """One task per hash partition: select rows with ``key_hash % P ==
    my_part`` from EVERY closable/matured block (zero-copy plasma reads —
    only this partition's 1/P of rows is ever copied), finalize all its
    (key, window) groups in one sorted sweep (``finalize_many``), probe
    the join state for update counts, and write this partition's staged
    parquet part.

    This is a map-side-select shuffle: no intermediate split stage, no
    P×B sealed slice objects — on a multi-node cluster the block fetches
    ARE the all-to-all exchange (SURVEY.md §7.3)."""
    import pyarrow.parquet as pq

    t_start = time.perf_counter()
    tabs = []
    n_scanned = 0
    for t in tables:
        if t is None or t.num_rows == 0:
            continue
        n_scanned += t.num_rows
        h = window_salt_hash(t["key_hash"].to_numpy(), t["window_start"].to_numpy())
        mine = (h % np.uint64(n_parts)).astype(np.int64) == my_part
        if mine.any():
            tabs.append(t.take(pa.array(np.flatnonzero(mine))))
    t_sel = time.perf_counter()
    if not tabs:
        return (0, {}), None
    out = finalize_many(pa.concat_tables(tabs, promote_options="default").combine_chunks())
    t_fin = time.perf_counter()
    if len(out) == 0:
        return (0, {}), None
    fps = pa.Table.from_pandas(out, preserve_index=False).select(
        FINGERPRINT_SCHEMA.names
    ).cast(FINGERPRINT_SCHEMA)
    # probe side of the stream-stream join (J1): co-partitioned by host hash
    part = (fp.text_hash64(fps["key_host"].combine_chunks()) % np.uint64(n_join_partitions)).astype(np.int64)
    outs = []
    for pid in np.unique(part):
        sub = fps.take(pa.array(np.flatnonzero(part == pid)))
        outs.append(join_handles[int(pid)].probe.remote(sub))
    enriched = pa.concat_tables(ray.get(outs))
    t_probe = time.perf_counter()
    pq.write_table(enriched, path)
    # second return: the closed-window rows the rising-edge alert state
    # and the CEP state consume (T3 analog) — tiny projection, one row
    # per window; the int64 count columns are the CEP predicate surface
    # (state/store.py CEP_COLS)
    alert_rows = fps.select(
        ["key_lang", "key_host", "window_kind", "window_start",
         "window_end", "dup_cluster_count", "doc_count",
         "exact_dup_count", "near_dup_count"]
    )
    timings = {
        "sel": round(t_sel - t_start, 4),
        "fin": round(t_fin - t_sel, 4),
        "probe": round(t_probe - t_fin, 4),
        "write": round(time.perf_counter() - t_probe, 4),
        "rows_scanned": n_scanned,
        "rows_mine": sum(t.num_rows for t in tabs),
        "groups": len(out),
    }
    return (enriched.num_rows, timings), alert_rows


@ray.remote
def finalize_refires(path: str, join_handles: list, n_join_partitions: int,
                     sweep_result):
    """Allowed-lateness refire finalize: one task per window actor —
    its ``mature_refires`` sweep already co-located every refired
    window's FULL content (retained + late rows), so this is a straight
    ``finalize_many`` + join probe + staged write of
    refires-p*.parquet (FINGERPRINT_SCHEMA + refire_seq), under the same
    exactly-once fence as the main parts.  Returns (n_rows, n_dropped)."""
    import pyarrow.parquet as pq

    tbl, n_dropped = sweep_result
    if tbl is None or tbl.num_rows == 0:
        return 0, int(n_dropped)
    seq = (tbl.select(["window_kind", "key_lang", "key_host",
                       "window_start", "window_end", "refire_seq"])
           .to_pandas().drop_duplicates(
               ["window_kind", "key_lang", "key_host",
                "window_start", "window_end"]))
    out = finalize_many(tbl.drop_columns(["refire_seq"]).combine_chunks())
    if len(out) == 0:
        return 0, int(n_dropped)
    out = out.merge(seq, on=["window_kind", "key_lang", "key_host",
                             "window_start", "window_end"], how="left")
    fps = pa.Table.from_pandas(out, preserve_index=False).select(
        FINGERPRINT_SCHEMA.names + ["refire_seq"]
    ).cast(pa.schema(list(FINGERPRINT_SCHEMA)
                     + [pa.field("refire_seq", pa.int64())]))
    # probe the join state exactly as the main finalize does — a refire
    # recomputes the window's update counts against the join buffer AS OF
    # the refire epoch (the oracle probes at the same point)
    part = (fp.text_hash64(fps["key_host"].combine_chunks())
            % np.uint64(n_join_partitions)).astype(np.int64)
    outs = []
    for pid in np.unique(part):
        sub = fps.take(pa.array(np.flatnonzero(part == pid)))
        outs.append(join_handles[int(pid)].probe.remote(sub))
    enriched = pa.concat_tables(ray.get(outs))
    pq.write_table(enriched, path)
    return enriched.num_rows, int(n_dropped)


@ray.remote(num_cpus=0)
class MetricCounter:
    def __init__(self) -> None:
        self.c: dict[str, int] = {}
        self.regs: dict[str, "np.ndarray"] = {}

    def add(self, name: str, n: int) -> None:
        self.c[name] = self.c.get(name, 0) + int(n)

    def merge_regs(self, name: str, buf: bytes) -> None:
        """Max-merge an HLL register partial (stages/sketch.py) — the
        distinct-URL telemetry.  Max is associative + commutative, so the
        run-level registers are delivery-order-independent (same
        fire-and-forget contract as ``add``)."""
        import numpy as np

        arr = np.frombuffer(buf, dtype=np.uint8)
        cur = self.regs.get(name)
        self.regs[name] = arr.copy() if cur is None else np.maximum(cur, arr)

    def get_regs(self, name: str) -> bytes | None:
        r = self.regs.get(name)
        return None if r is None else r.tobytes()

    def take_prefix(self, prefix: str) -> dict[str, int]:
        """Return-and-remove counters under a per-epoch prefix (transforms
        of epoch K+1 may already be running when epoch K's metrics are
        collected, so counters are epoch-scoped, not reset globally)."""
        out = {k[len(prefix):]: v for k, v in self.c.items() if k.startswith(prefix)}
        for k in list(self.c):
            if k.startswith(prefix):
                del self.c[k]
        return out

    def take_stale(self, before_epoch: int) -> dict[str, int]:
        """Return-and-remove counters of epochs < ``before_epoch`` whose
        adds were delivered AFTER that epoch's take_prefix (fire-and-forget
        sends have no delivery barrier).  Reclaimed into the collecting
        epoch's metrics: cross-epoch totals stay exact, and no stale keys
        accrete in the dict."""
        import re

        out: dict[str, int] = {}
        for k in list(self.c):
            m = re.match(r"e(\d+):(.*)", k)
            if m and int(m.group(1)) < before_epoch:
                out[m.group(2)] = out.get(m.group(2), 0) + self.c.pop(k)
        return out

    def get_all(self) -> dict[str, int]:
        return dict(self.c)


def page_transform(batch: pa.Table, late_cutoff_ms: int, counter, metric_prefix: str = "",
                   curation_min_chars: int = 0, bench_ref=None,
                   late_side: bool = False, neardup: bool = False,
                   extractor: str = "strict", blocked_ref=None,
                   allowed_lateness_ms: int = 0) -> pa.Table:
    """Stateless per-batch transform: late-drop, extract, fingerprint.

    Emits a NARROW table (html/text projected away) so only ~300-byte rows
    move through the shuffle — at 100 TB the wide binary column must never
    leave this stage (SURVEY.md §7.4.6).
    """
    import pyarrow.compute as pc

    n_in = batch.num_rows
    ts = batch["warc_ts"].cast(pa.int64())
    n_admitted_late = 0
    if allowed_lateness_ms > 0:
        # allowed lateness: rows up to `allowed` behind the cutoff are
        # ADMITTED and flagged (the flag rides the batch as a column so
        # the blocklist/empty filters below keep it row-aligned); only
        # rows beyond the allowance drop (and feed the DLQ side output)
        floor_ms = late_cutoff_ms - allowed_lateness_ms
        keep_late = pc.greater_equal(ts, pa.scalar(floor_ms, pa.int64()))
        late_flag = pc.and_(keep_late,
                            pc.less(ts, pa.scalar(late_cutoff_ms, pa.int64())))
        late_sub = batch.filter(pc.invert(keep_late)) if late_side else None
        batch = batch.append_column("_late", late_flag).filter(keep_late)
        # late_admitted is counted AFTER the blocklist/empty filters below
        # (the _late column stays row-aligned through them) so the metric
        # reports refire-ELIGIBLE admissions, not pre-filter admissions.
    else:
        keep_late = pc.greater_equal(ts, pa.scalar(late_cutoff_ms, pa.int64()))
        late_sub = batch.filter(pc.invert(keep_late)) if late_side else None
        batch = batch.filter(keep_late)
    n_late = n_in - batch.num_rows

    # broadcast-state side input (Flink BroadcastProcessFunction analog):
    # the dynamic host blocklist accumulated from side-input epochs
    # STRICTLY BEFORE this one — read from plasma, applied before the
    # (expensive) extraction; rules are deterministic per epoch, so
    # resume replays the same verdicts.
    n_blocked = 0
    if blocked_ref is not None and batch.num_rows:
        blocked = ray.get(blocked_ref)
        if len(blocked):
            hosts = np.asarray(fp.host_of(batch["url"]), dtype=object)
            bad = np.isin(hosts, blocked)
            n_blocked = int(bad.sum())
            if n_blocked:
                batch = batch.filter(pa.array(~bad))

    if extractor == "general":
        from ..functions.html import extract_text_general

        text = extract_text_general(batch["html"])
    else:
        text = fp.extract_text(batch["html"])
    nonempty = pc.not_equal(text, "")
    n_empty = batch.num_rows - pc.sum(pc.cast(nonempty, pa.int64())).as_py() if batch.num_rows else 0
    batch = batch.filter(nonempty)
    text = text.filter(nonempty)
    if "_late" in batch.column_names and batch.num_rows:
        n_admitted_late = int(pc.sum(
            pc.cast(batch["_late"], pa.int64())).as_py() or 0)
    if counter is not None:
        # fire-and-forget, nonzero counts only: blocking on the ack here
        # makes the raylet oversubscribe map workers (~25% slower epochs).
        # An add delivered after this epoch's take_prefix is reclaimed by
        # the driver's stale-drain at the next epoch's finish, so totals
        # stay exact and no keys accrete in the counter dict.
        if n_late:
            counter.add.remote(metric_prefix + "late_dropped", n_late)
        if n_admitted_late:
            counter.add.remote(metric_prefix + "late_admitted", n_admitted_late)
        if n_blocked:
            counter.add.remote(metric_prefix + "blocklist_dropped", n_blocked)
        if n_empty:
            counter.add.remote(metric_prefix + "empty_dropped", n_empty)
        if batch.num_rows:
            # distinct-URL HLL telemetry: one 4 KB register partial per
            # batch, max-merged in the counter (order-independent), read
            # once at run end — ~0.1 ms/batch, no barrier on the hot path
            from ..stages.sketch import hll_fold

            counter.merge_regs.remote(
                "distinct_urls",
                hll_fold(fp.text_hash64(batch["url"])).tobytes())

    host = fp.host_of(batch["url"])
    lang = batch["lang"].combine_chunks().cast(pa.large_string()) if batch.num_rows else pa.array([], pa.large_string())
    text_len = pc.utf8_length(text).cast(pa.int64())
    th = fp.text_hash64(text)
    sh, mh = fp.simhash_and_minhash(text)
    bands = fp.minhash_band_keys(mh, N_BANDS)
    key = pc.binary_join_element_wise(lang, host, pa.scalar("\x1f", pa.large_string()))
    key_hash = fp.text_hash64(key)

    # sig/bands as single fixed-size-list columns: shuffle/actor/take ops
    # touch ~12 Arrow buffers per block instead of ~90 per-column arrays
    cols: dict[str, pa.Array] = {
        "key_lang": lang,
        "key_host": host,
        "ts_ms": batch["warc_ts"].cast(pa.int64()).combine_chunks() if batch.num_rows else pa.array([], pa.int64()),
        "text_len": text_len,
        "text_hash": pa.array(th, pa.uint64()),
        "simhash": pa.array(sh, pa.uint64()),
        "key_hash": pa.array(key_hash, pa.uint64()),
        "bands": pa.FixedSizeListArray.from_arrays(
            pa.array(bands.ravel(), pa.uint64()), N_BANDS
        ),
        "sig": pa.FixedSizeListArray.from_arrays(
            pa.array(mh.ravel(), pa.uint32()), mh.shape[1] if mh.size else 64
        ),
    }
    if curation_min_chars > 0:
        # streaming curation side-channel: per-doc survival of the quality
        # gate + decontamination, decided row-locally here (the cross-epoch
        # dedup decision lives in the DedupStateActor pool).  url rides
        # along only on the per-doc table — _transform_refs strips these
        # columns before the window explode so the shuffle stays narrow.
        keep = text_len.to_numpy() >= curation_min_chars
        if "_late" in batch.column_names and batch.num_rows:
            # admitted-late rows exist for window refires only — they
            # never enter the curation channel (oracle_clean_stream's
            # late rule is unchanged)
            keep &= ~batch["_late"].to_numpy(zero_copy_only=False)
        bench = ray.get(bench_ref) if bench_ref is not None else None
        if bench is not None and len(bench) and batch.num_rows:
            from ..functions.textstats import ngram_set_hashes

            hashes, counts = ngram_set_hashes(text, n=3)
            if len(hashes):
                gram_doc = np.repeat(np.arange(batch.num_rows), counts)
                pos = np.minimum(np.searchsorted(bench, hashes), len(bench) - 1)
                contaminated = np.zeros(batch.num_rows, dtype=bool)
                contaminated[np.unique(gram_doc[bench[pos] == hashes])] = True
                keep &= ~contaminated
        cols["clean_keep"] = pa.array(keep, pa.bool_())
    if "_late" in batch.column_names:
        cols["refire_late"] = (batch["_late"].combine_chunks()
                               if batch.num_rows else pa.array([], pa.bool_()))
    if curation_min_chars > 0 or late_side or neardup or "media_mean" in batch.column_names:
        cols["url"] = batch["url"].combine_chunks().cast(pa.large_string()) \
            if batch.num_rows else pa.array([], pa.large_string())
    if "media_mean" in batch.column_names:
        # media side-channel features computed upstream (PageMediaStage) —
        # forwarded on the per-doc table only, null where the page had no
        # media payload
        cols["media_mean"] = batch["media_mean"].combine_chunks()
        cols["media_std"] = batch["media_std"].combine_chunks()
    if not late_side:
        return pa.table(cols)
    # Flink-style side output: late rows ride the per-doc table flagged
    # is_late with url/ts_ms real and every other column null/False —
    # the window path filters them before the explode, the DLQ writer
    # keeps only them.  Survivor rows are untouched (is_late=False).
    cols["is_late"] = pa.array(np.zeros(batch.num_rows, dtype=bool), pa.bool_())
    out = pa.table(cols)
    if late_sub is None or late_sub.num_rows == 0:
        return out
    n_l = late_sub.num_rows
    lt: dict[str, pa.Array] = {}
    for name, field in zip(out.column_names, out.schema):
        if name == "is_late":
            lt[name] = pa.array(np.ones(n_l, dtype=bool), pa.bool_())
        elif name == "refire_late":
            # DLQ rows are BEYOND the allowance — not refire candidates
            lt[name] = pa.array(np.zeros(n_l, dtype=bool), pa.bool_())
        elif name == "url":
            lt[name] = late_sub["url"].combine_chunks().cast(pa.large_string())
        elif name == "ts_ms":
            lt[name] = late_sub["warc_ts"].cast(pa.int64()).combine_chunks()
        elif name == "clean_keep":
            lt[name] = pa.array(np.zeros(n_l, dtype=bool), pa.bool_())
        else:
            lt[name] = pa.nulls(n_l, field.type)
    return pa.concat_tables([out, pa.table(lt, schema=out.schema)])


class PageMediaStage:
    """Actor-pool media side-channel of the flagship: decode the optional
    ``media`` payload — netpbm, JPEG or PNG, sniffed by signature
    (``stages.media.decode_any_image``, the dispatch the oracle shares) —
    append per-page pixel features, and DROP the binary before the
    fingerprint transform — large payloads must never reach a shuffle.
    Pages without media get null features."""

    def __init__(self) -> None:
        from ..stages.media import decode_any_image

        self.decode = decode_any_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "media" not in batch.column_names:
            return batch
        col = batch["media"].combine_chunks()
        n = batch.num_rows
        mean = np.zeros(n)
        std = np.zeros(n)
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        for i in np.flatnonzero(valid):
            img = self.decode(col[int(i)].as_py())
            mean[i] = float(img.mean())
            std[i] = float(img.std())
        batch = batch.drop_columns(["media"])
        batch = batch.append_column(
            "media_mean", pa.array(mean, pa.float64(), mask=~valid))
        return batch.append_column(
            "media_std", pa.array(std, pa.float64(), mask=~valid))


def explode_windows(batch: pa.Table, cfg: PipelineConfig,
                    late_cutoff_ms: int = 0) -> pa.Table:
    """Assign window ids: one output row per (input row × overlapping
    window × configured kind); session rows carry sentinel bounds (-1) and
    are bound at close time inside the state actor.

    With allowed lateness on, rows flagged ``refire_late`` by the
    transform get a per-WINDOW-row ``refire`` flag here: late row AND
    window_end <= the late cutoff (i.e. the window already fired — the
    refire path); a late row's still-open windows take the normal path
    (their first fire includes it).  Session rows carry the row's late
    flag itself (Flink session windows MERGE on late elements): the
    state actor's unified sweep decides open-merge / retained-merge /
    refire / drop from the data-dependent segment, not the router."""
    from ..stages.windows import sliding_window_starts, tumbling_window_start

    late_np = None
    if "refire_late" in batch.column_names:
        late_np = batch["refire_late"].to_numpy(zero_copy_only=False)
        batch = batch.drop_columns(["refire_late"])
    ts = batch["ts_ms"].to_numpy()
    parts: list[pa.Table] = []

    def stamp(tbl: pa.Table, kind: str, ws: np.ndarray, we: np.ndarray,
              late_rows: "np.ndarray | None" = None,
              refire_override: "np.ndarray | None" = None) -> pa.Table:
        tbl = tbl.append_column("window_kind", pa.array([kind] * tbl.num_rows, pa.string()))
        tbl = tbl.append_column("window_start", pa.array(ws, pa.int64()))
        tbl = tbl.append_column("window_end", pa.array(we, pa.int64()))
        if late_np is not None:
            if refire_override is not None:
                refire = refire_override
            else:
                refire = (late_rows & (we <= np.int64(late_cutoff_ms))
                          if late_rows is not None
                          else np.zeros(tbl.num_rows, dtype=bool))
            tbl = tbl.append_column("refire", pa.array(refire, pa.bool_()))
        return tbl

    ws = tumbling_window_start(ts, cfg.tumbling_size_ms)
    parts.append(stamp(batch, "tumbling", ws, ws + cfg.tumbling_size_ms, late_np))

    if cfg.sliding is not None:
        size, slide = cfg.sliding
        take, starts = sliding_window_starts(ts, size, slide)
        sl = batch.take(pa.array(take))
        parts.append(stamp(sl, "sliding", starts, starts + size,
                           late_np[take] if late_np is not None else None))

    if cfg.cumulate is not None:
        from ..stages.windows import cumulate_window_slices

        step, mx = cfg.cumulate
        take, starts, ends = cumulate_window_slices(ts, step, mx)
        cu = batch.take(pa.array(take))
        parts.append(stamp(cu, "cumulate", starts, ends,
                           late_np[take] if late_np is not None else None))

    if cfg.session_gap_ms > 0:
        sentinel = np.full(len(ts), -1, dtype=np.int64)
        parts.append(stamp(batch, "session", sentinel, sentinel,
                           refire_override=late_np))

    return pa.concat_tables(parts)


@ray.remote(num_returns=2)
def route_and_split(
    block: pa.Table,
    watermark_ms: int,
    window_handles: list,
    n_partitions: int,
    *snapshot_barrier,
):
    """Per-block three-way split (distributed — no driver funnel):
    session rows → owning state actor; open fixed-window rows → owning
    state actor; closable rows → returned (become the finalize input).

    Returns (closable_table, ack_refs): the task does NOT block on the
    actor adds — it hands their ObjectRefs back so the driver awaits them
    (blocked ray.get inside tasks forces the raylet to oversubscribe
    worker processes).  ``snapshot_barrier``: the previous epoch's window
    snapshot refs; Ray resolves them before this task starts, so the adds
    below cannot race a still-running snapshot."""
    import pyarrow.compute as pc

    if block.num_rows == 0:
        return block, []
    kh = block["key_hash"].to_numpy()
    # sessions: key-owned (one actor must see ALL rows of a key to merge);
    # open fixed windows: window-salted so a hot host's open windows
    # spread across the actor pool
    salted = window_salt_hash(kh, block["window_start"].to_numpy())
    is_sess_np = np.asarray(block["window_kind"]) == "session"
    part = np.where(is_sess_np, kh % np.uint64(n_partitions),
                    salted % np.uint64(n_partitions)).astype(np.int64)
    block = block.append_column("part", pa.array(part, pa.int64()))

    is_session = pc.equal(block["window_kind"], "session")
    sess = block.filter(is_session)
    fixed = block.filter(pc.invert(is_session))
    refire_tbl = None
    sess_late = None
    retain = "refire" in block.column_names  # allowed lateness on
    if retain:
        rmask = fixed["refire"]
        refire_tbl = fixed.filter(rmask).drop_columns(["refire"])
        fixed = fixed.filter(pc.invert(rmask)).drop_columns(["refire"])
        smask = sess["refire"]
        sess_late = sess.filter(smask).drop_columns(["refire"])
        sess = sess.filter(pc.invert(smask)).drop_columns(["refire"])
    closable_mask = pc.less_equal(fixed["window_end"], pa.scalar(watermark_ms, pa.int64()))
    closable = fixed.filter(closable_mask)
    open_rows = fixed.filter(pc.invert(closable_mask))

    sends = [(sess, "add_session"), (open_rows, "add_fixed")]
    if retain:
        # late rows of already-fired windows -> refire sweep; a COPY of
        # the closable rows -> retention, so their window can re-fire.
        # Both use the window-salted partition, co-locating a window's
        # retained content with its late arrivals.  Late SESSION rows go
        # to their key-owning actor (same partition as on-time session
        # rows — merging needs every row of the key in one place).
        sends.append((refire_tbl, "add_refire"))
        sends.append((closable, "add_retained"))
        sends.append((sess_late, "add_session_late"))
    refs = []
    for tbl, method in sends:
        if tbl.num_rows == 0:
            continue
        p = tbl["part"].to_numpy()
        order = np.argsort(p, kind="stable")
        sp = p[order]
        bounds = np.flatnonzero(np.concatenate(([True], sp[1:] != sp[:-1])))
        bounds = np.append(bounds, len(sp))
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            sub = tbl.take(pa.array(order[s:e])).drop_columns(["part"])
            refs.append(getattr(window_handles[int(sp[s])], method).remote(sub))
    return closable.drop_columns(["part"]), refs


@ray.remote
def route_clean(block: pa.Table, n_partitions: int, dedup_handles: list,
                *close_barrier):
    """Curation routing: the per-doc block's surviving candidate rows
    (url, ts_ms, text_hash) go to their owning dedup actor by
    ``text_hash % n``.  ``close_barrier`` carries the PREVIOUS epoch's
    close_epoch refs — Ray resolves them before this task runs, so this
    epoch's adds cannot leak into the previous epoch's survivor sweep.
    Returns the add ack refs (awaited by the driver with the window-route
    acks — no blocking inside the task)."""
    if block.num_rows == 0 or "clean_keep" not in block.column_names:
        return []
    keep = block["clean_keep"].to_numpy(zero_copy_only=False)
    if not keep.any():
        return []
    cand = block.select(["url", "ts_ms", "text_hash"]).take(
        pa.array(np.flatnonzero(keep))
    )
    part = (cand["text_hash"].to_numpy().astype(np.uint64)
            % np.uint64(n_partitions)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    sp = part[order]
    bounds = np.flatnonzero(np.concatenate(([True], sp[1:] != sp[:-1])))
    bounds = np.append(bounds, len(sp))
    refs = []
    for i in range(len(bounds) - 1):
        s, e = bounds[i], bounds[i + 1]
        sub = cand.take(pa.array(order[s:e]))
        refs.append(dedup_handles[int(sp[s])].add_candidates.remote(sub))
    return refs


@ray.remote
def route_neardup(block: pa.Table, n_partitions: int, neardup_handles: list,
                  *close_barrier):
    """Near-dup routing: explode the per-doc block into NUMERIC
    (band, ts_ms, doc_h) rows — one per (doc, distinct band), 24 bytes
    each — and send each to the actor owning its band hash
    (``band % n``).  Doc identity on the exchange is
    ``doc_h = text_hash64(url)·φ + ts`` (the url string would otherwise
    ship ~n_bands times per doc and force object-array sorts downstream;
    measured round 3: the band exchange + AND-reduce was the +45%-wall
    cost center).  The url travels exactly ONCE per doc, on the side
    tables returned as extra outputs — one per reduce partition
    (``doc_h % n``), fetched directly by the owning ``reduce_neardup``
    task to map surviving doc hashes back to (url, ts_ms).

    ``close_barrier`` carries the PREVIOUS epoch's close refs so this
    epoch's adds cannot leak into that sweep.  Invoked with
    ``num_returns=1 + n_partitions``: output 0 is the add-ack ref list
    (awaited with the window-route acks), outputs 1..n are the side
    tables (None where the partition got no docs)."""
    empty: tuple = (None,) * n_partitions
    if block.num_rows == 0 or "bands" not in block.column_names:
        return ([],) + empty
    if "is_late" in block.column_names:
        import pyarrow.compute as pc

        block = block.filter(pc.invert(block["is_late"]))
        if block.num_rows == 0:
            return ([],) + empty
    if "refire_late" in block.column_names:
        # admitted-late rows exist for window refires only — they never
        # enter the near-dup channel (oracle_neardup_stream unchanged)
        import pyarrow.compute as pc

        block = block.filter(pc.invert(block["refire_late"]))
        if block.num_rows == 0:
            return ([],) + empty
    from ..functions import fingerprint as fp

    ts_doc = block["ts_ms"].to_numpy()
    with np.errstate(over="ignore"):
        doc_h_doc = (fp.text_hash64(block["url"]) * np.uint64(0x9E3779B97F4A7C15)
                     + ts_doc.astype(np.uint64))
    bands_col = block["bands"].combine_chunks()
    n_bands = bands_col.type.list_size
    band_mat = bands_col.flatten().to_numpy().astype(np.uint64) \
        .reshape(block.num_rows, n_bands)
    # a doc may repeat a band value (constant-ish signatures); keep ONE row
    # per (doc, band) so the reduce-side all-bands-ok count is exact.
    # Row-wise 2-D sort instead of a flat (band, doc) lexsort — the doc
    # axis is already grouped, so sorting 16-wide rows is 3x cheaper than
    # lexsorting the exploded 16x rows (measured on this numpy build)
    sb = np.sort(band_mat, axis=1)
    keep_mat = np.concatenate(
        [np.ones((block.num_rows, 1), bool), sb[:, 1:] != sb[:, :-1]], axis=1)
    band = sb[keep_mat]
    doc = np.repeat(np.arange(block.num_rows, dtype=np.int64),
                    keep_mat.sum(axis=1))
    cand = pa.table({
        "band": pa.array(band, pa.uint64()),
        "ts_ms": pa.array(ts_doc[doc], pa.int64()),
        "doc_h": pa.array(doc_h_doc[doc], pa.uint64()),
    })
    part = (band % np.uint64(n_partitions)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    sp = part[order]
    bounds = np.flatnonzero(np.concatenate(([True], sp[1:] != sp[:-1])))
    bounds = np.append(bounds, len(sp))
    refs = []
    for i in range(len(bounds) - 1):
        s, e = bounds[i], bounds[i + 1]
        sub = cand.take(pa.array(order[s:e]))
        refs.append(neardup_handles[int(sp[s])].add_candidates.remote(sub))
    # side tables: one (doc_h, ts_ms, url) row per doc, sliced by the
    # reduce partition that owns the doc hash
    side = pa.table({
        "doc_h": pa.array(doc_h_doc, pa.uint64()),
        "ts_ms": pa.array(ts_doc, pa.int64()),
        "url": block["url"].combine_chunks().cast(pa.large_string()),
    })
    dpart = (doc_h_doc % np.uint64(n_partitions)).astype(np.int64)
    sides: list[pa.Table | None] = []
    for p in range(n_partitions):
        m = dpart == p
        sides.append(side.take(pa.array(np.flatnonzero(m))) if m.any() else None)
    return (refs, *sides)


@ray.remote
def reduce_neardup(path: str, neardup_handles: list, n_partitions: int,
                   part: int, n_verdicts: int, *verdicts_and_sides):
    """AND-reduce the per-DOC verdict aggregates for one doc-hash
    partition: a doc — identified by the numeric (ts_ms, doc_h) pair —
    survives iff Σok_bands == Σn_bands over every actor's aggregate
    slice (each of its bands contributed ok exactly when the doc was
    that band's (ts, doc_h)-minimal unseen candidate).  The slices
    arrive PRE-SPLIT by doc hash from every actor's close_epoch (this
    task's column of the actor × reducer ref matrix) at ONE ROW PER DOC
    per actor — an ~n_bands-fold smaller exchange than per-band verdict
    rows; the remaining args are this partition's (doc_h, ts_ms, url)
    side tables from the route tasks, which map surviving hashes back to
    urls.  Writes this slice's survivor part (url, ts_ms) under the
    epoch fence and sends just the survivor (ts_ms, doc_h) keys to every
    actor's register_survivors — each actor registers its retained
    winning bands, so band values never cross back.  Waits the acks, so
    this task's completion certifies register-done (the driver gates the
    band snapshot, and via actor FIFO the next epoch's close sweep, on
    this task's ref).  Returns (n_survivors, n_docs)."""
    import pyarrow.parquet as pq

    verdicts = verdicts_and_sides[:n_verdicts]
    sides = verdicts_and_sides[n_verdicts:]
    tabs = [t for t in verdicts if t is not None and t.num_rows]
    empty = pa.table({"url": pa.array([], pa.large_string()),
                      "ts_ms": pa.array([], pa.int64())})
    if not tabs:
        pq.write_table(empty, path)
        return 0, 0
    t = pa.concat_tables(tabs, promote_options="default").combine_chunks()
    ts = t["ts_ms"].to_numpy()
    doc_h = t["doc_h"].to_numpy().astype(np.uint64)
    okb = t["ok_bands"].to_numpy()
    nb = t["n_bands"].to_numpy()
    order = np.lexsort((doc_h, ts))
    ts_s, doc_s = ts[order], doc_h[order]
    newgrp = np.concatenate(([True], (ts_s[1:] != ts_s[:-1]) | (doc_s[1:] != doc_s[:-1])))
    starts = np.flatnonzero(newgrp)
    surv_grp = (np.add.reduceat(okb[order], starts)
                == np.add.reduceat(nb[order], starts))
    n_docs = len(starts)
    surv_starts = starts[surv_grp]
    # survivors → urls via the side tables, deduped by (ts, doc_h, url)
    # keep-min-url so replay and hash-collision behavior stay deterministic
    stabs = [s for s in sides if s is not None and s.num_rows]
    side = (pa.concat_tables(stabs, promote_options="default").combine_chunks()
            if stabs else None)
    if side is None or not surv_grp.any():
        pq.write_table(empty, path)
        out_urls = np.empty(0, dtype=object)
        out_ts = np.empty(0, dtype=np.int64)
    else:
        s_doc = side["doc_h"].to_numpy().astype(np.uint64)
        s_ts = side["ts_ms"].to_numpy()
        s_url = np.asarray(side["url"], dtype=object)
        # doc_h primary (a hash — runs beyond length 1 are true 64-bit
        # collisions), then ts, then url: dedup keeps the MIN url per
        # (doc_h, ts) so replay and collision behavior are deterministic
        so = np.lexsort((s_url, s_ts, s_doc))
        s_ts, s_doc, s_url = s_ts[so], s_doc[so], s_url[so]
        first = np.concatenate(([True], (s_doc[1:] != s_doc[:-1]) | (s_ts[1:] != s_ts[:-1])))
        s_ts, s_doc, s_url = s_ts[first], s_doc[first], s_url[first]
        want_ts, want_doc = ts_s[surv_starts], doc_s[surv_starts]
        pos = np.searchsorted(s_doc, want_doc, "left")
        pos_c = np.minimum(pos, max(len(s_doc) - 1, 0))
        good = (s_doc[pos_c] == want_doc) & (s_ts[pos_c] == want_ts)
        idx = np.where(good, pos_c, -1)
        for j in np.flatnonzero(~good):  # true 64-bit collisions only
            k = pos[j]
            while k < len(s_doc) and s_doc[k] == want_doc[j] and s_ts[k] != want_ts[j]:
                k += 1
            idx[j] = k if k < len(s_doc) and s_doc[k] == want_doc[j] else -1
        hit = idx >= 0
        out_urls = s_url[idx[hit]]
        out_ts = want_ts[hit]
        pq.write_table(pa.table({
            "url": pa.array(out_urls, pa.large_string()),
            "ts_ms": pa.array(out_ts, pa.int64()),
        }), path)
    ack_refs = []
    if surv_grp.any():
        surv_tab = pa.table({
            "ts_ms": pa.array(ts_s[surv_starts], pa.int64()),
            "doc_h": pa.array(doc_s[surv_starts], pa.uint64()),
        })
        ack_refs = [h.register_survivors.remote(surv_tab)
                    for h in neardup_handles]
    # wait the registration acks HERE so this task's completion itself
    # certifies register-done: the driver gates the band snapshot (and,
    # via actor FIFO, the next epoch's close sweep) on this task's ref
    # instead of a serial driver-side barrier (register → snapshot →
    # commit ordering preserved, off the inter-epoch critical path)
    if ack_refs:
        ray.get(ack_refs)
    return int(surv_grp.sum()), int(n_docs)


@ray.remote
def write_media_part(path: str, block: pa.Table) -> int:
    """Stage one per-doc block's media-feature rows (url, ts_ms,
    media_mean, media_std) under the epoch fence; stateless, so replay is
    a pure overwrite."""
    import pyarrow.parquet as pq

    if block.num_rows == 0 or "media_mean" not in block.column_names:
        return 0
    if "refire_late" in block.column_names:
        import pyarrow.compute as pc

        block = block.filter(pc.invert(block["refire_late"]))
        if block.num_rows == 0:
            return 0
    sub = block.select(["url", "ts_ms", "media_mean", "media_std"]).filter(
        block["media_mean"].combine_chunks().is_valid()
    )
    if sub.num_rows == 0:
        return 0
    pq.write_table(sub, path)
    return sub.num_rows


TOPN_SCHEMA = pa.schema([
    ("window_start", pa.int64()),
    ("window_end", pa.int64()),
    ("rank", pa.int64()),
    ("key_host", pa.string()),
    ("doc_count", pa.int64()),
])


@ray.remote
def write_topn_part(path: str, n: int, part_paths: list) -> int:
    """Windowed Top-N (Flink window Top-N analog): from this epoch's
    staged fingerprint parts, rank hosts per closed TUMBLING window by
    total doc_count (desc, host asc tiebreak) and stage the rank<=n rows
    as topn.parquet under the same idempotent epoch fence.

    Per-epoch ranking is exact globally because a tumbling window closes
    atomically within one epoch: maturity is a pure function of the
    shared watermark, and any later row for a matured window would be
    behind the late cutoff.  Runs after the finalize barrier (the parts
    are complete); reads only the 4 needed columns of the narrow staged
    parts, so the extra I/O is a sliver of what finalize just wrote."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    cols = ["window_kind", "window_start", "window_end", "key_host", "doc_count"]
    tabs = []
    for p in part_paths:
        if not os.path.exists(p):
            continue  # partitions with no rows never write their part
        t = pq.read_table(p, columns=cols)
        t = t.filter(pc.equal(t["window_kind"], "tumbling"))
        if t.num_rows:
            tabs.append(t.drop_columns(["window_kind"]))
    if not tabs:
        pq.write_table(TOPN_SCHEMA.empty_table(), path)
        return 0
    t = pa.concat_tables(tabs, promote_options="default").combine_chunks()
    ws = t["window_start"].to_numpy()
    we = t["window_end"].to_numpy()
    host = np.asarray(t["key_host"], dtype=object)
    dc = t["doc_count"].to_numpy()
    # a host splits across finalize partitions by lang: sum per (window, host)
    order = np.lexsort((host, ws))
    ws, we, host, dc = ws[order], we[order], host[order], dc[order]
    new = np.concatenate(([True], (ws[1:] != ws[:-1]) | (host[1:] != host[:-1])))
    starts = np.flatnonzero(new)
    tot = np.add.reduceat(dc, starts)
    g_ws, g_we, g_host = ws[starts], we[starts], host[starts]
    order2 = np.lexsort((g_host, -tot, g_ws))
    g_ws, g_we, g_host, tot = g_ws[order2], g_we[order2], g_host[order2], tot[order2]
    idx = np.arange(len(g_ws), dtype=np.int64)
    w_first = np.concatenate(([True], g_ws[1:] != g_ws[:-1]))
    rank = idx - np.maximum.accumulate(np.where(w_first, idx, 0)) + 1
    keep = rank <= n
    out = pa.table({
        "window_start": pa.array(g_ws[keep], pa.int64()),
        "window_end": pa.array(g_we[keep], pa.int64()),
        "rank": pa.array(rank[keep], pa.int64()),
        "key_host": pa.array(g_host[keep], pa.string()),
        "doc_count": pa.array(tot[keep], pa.int64()),
    })
    pq.write_table(out, path)
    return out.num_rows


@ray.remote
def write_late_part(path: str, block: pa.Table) -> int:
    """Stage one per-doc block's dead-letter rows (url, ts_ms of rows
    that arrived behind the watermark) under the epoch fence; stateless,
    so replay is a pure overwrite."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if block.num_rows == 0 or "is_late" not in block.column_names:
        return 0
    sub = block.select(["url", "ts_ms"]).filter(block["is_late"].combine_chunks())
    if sub.num_rows == 0:
        return 0
    pq.write_table(sub, path)
    return sub.num_rows


@ray.remote
def write_clean_part(path: str, table: pa.Table | None) -> int:
    """Write one dedup partition's epoch survivors into the staging dir
    (rides the same epoch fence as the fingerprint parts)."""
    import pyarrow.parquet as pq

    if table is None or table.num_rows == 0:
        return 0
    pq.write_table(table, path)
    return table.num_rows


def update_transform(batch: pa.Table, n_partitions: int) -> pa.Table:
    """Page-update stream → narrow build-side rows for the join state."""
    host = fp.host_of(batch["url"])
    part = (fp.text_hash64(host) % np.uint64(n_partitions)).astype(np.int64)
    return pa.table(
        {
            "key_host": host,
            "update_ts_ms": batch["update_ts"].cast(pa.int64()).combine_chunks(),
            "change_kind": batch["change_kind"].combine_chunks().cast(pa.large_string()),
            "part": pa.array(part, pa.int64()),
        }
    )


@ray.remote
def feed_updates(files: list[str], n_partitions: int, join_handles: list,
                 *j_snap_barrier) -> int:
    """Build side of the stream-stream join as ONE raw task per file group:
    read → transform → route slices to the owning join actors.  A raw task
    (not a Dataset) because the per-epoch build side is a small bounded
    read whose only consumer is actor state — Dataset executor startup
    would dominate (the probe side still flows through Ray Data).

    ``j_snap_barrier`` carries the PREVIOUS epoch's join-snapshot refs:
    Ray resolves them before this task runs, so no feed of epoch K+1 can
    reach a join actor before epoch K's post-evict snapshot completed
    (explicit happens-before; the driver no longer blocks on it)."""
    import pyarrow.parquet as pq

    from ..sources.retry import with_retries

    total = 0
    refs = []
    for f in files:
        t = with_retries(lambda f=f: pq.read_table(f, columns=["url", "update_ts", "change_kind"]))
        b = update_transform(t, n_partitions)
        total += b.num_rows
        p = b["part"].to_numpy()
        order = np.argsort(p, kind="stable")
        sp = p[order]
        bounds = np.flatnonzero(np.concatenate(([True], sp[1:] != sp[:-1])))
        bounds = np.append(bounds, len(sp))
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            sub = b.take(pa.array(order[s:e])).drop_columns(["part"])
            refs.append(join_handles[int(sp[s])].add.remote(sub))
    ray.get(refs)
    return total


class StreamingFingerprintPipeline:
    """Epoch driver: source cursor → transform → window state → finalize →
    join → epoch-fenced commit, resumable from the checkpoint manifest."""

    def __init__(
        self,
        pages_root: str,
        out_dir: str,
        updates_root: str | None = None,
        cfg: PipelineConfig | None = None,
        blocklist_root: str | None = None,
    ) -> None:
        self.cfg = cfg or PipelineConfig()
        self.source = EpochSource(pages_root)
        self.updates_source = EpochSource(updates_root, ts_col="update_ts") if updates_root else None
        # broadcast-state side input: an epoch stream of host-blocklist
        # rows; rules from side epochs < K apply to page epoch K (the
        # strictly-before rule keeps verdicts deterministic under resume
        # — the committed cursor replays the same side-input prefix)
        self.blocklist_source = (
            EpochSource(blocklist_root, ts_col="update_ts")
            if blocklist_root else None)
        self._bl_hosts: set = set()
        self._bl_loaded_upto = 0   # side epochs with index < this are in
        self._bl_ref = None
        self._bl_ref_n = -1
        os.makedirs(out_dir, exist_ok=True)
        self.sink = EpochSink(out_dir, commit_mode=self.cfg.commit_mode)
        self.manifest = CheckpointManifest(out_dir)
        self.manifest.ensure_commit_mode(self.cfg.commit_mode)
        # refuse resume under a toggled side-channel config (loud error
        # beats silently mixed per-epoch side outputs)
        self.manifest.ensure_channels({
            "curation": self.cfg.curation_min_chars > 0,
            "neardup": bool(self.cfg.neardup),
            "media": bool(self.cfg.media_features),
            "late_side": bool(self.cfg.late_side_output),
            "extractor": self.cfg.extractor,
            "blocklist": bool(blocklist_root),
            # window-shape config is part of output identity: a resume
            # under a different cumulate spec would change the row set.
            # Key present ONLY when enabled, so checkpoints from builds
            # predating the kind still resume when cumulate stays off.
            **({"cumulate": list(self.cfg.cumulate)} if self.cfg.cumulate else {}),
            # same present-only-when-enabled contract as cumulate: a
            # resume under a different N would mix rankings across epochs
            **({"window_topn": int(self.cfg.window_topn)}
               if self.cfg.window_topn else {}),
            **({"cep": [str(p) for p in self.cfg.cep_pattern]}
               if self.cfg.cep_pattern else {}),
            # dynamic session gap changes session boundaries — a resume
            # under a different map would mix window identities
            **({"session_gaps": {str(k): int(v) for k, v in
                                 sorted(self.cfg.session_gap_by_lang.items())}}
               if self.cfg.session_gap_by_lang else {}),
            # general gap extractor formula is window identity too
            **({"session_gap_expr": str(self.cfg.session_gap_expr)}
               if self.cfg.session_gap_expr else {}),
            # allowed lateness changes row admission AND adds the refire
            # channel — a resume under a different value would mix
            # admission rules across epochs
            **({"allowed_lateness": int(self.cfg.allowed_lateness_ms)}
               if self.cfg.allowed_lateness_ms else {}),
        })
        self.pool = StatePool(
            self.cfg.n_state_partitions, self.cfg.session_gap_ms,
            self.cfg.join_retention_ms, self.cfg.snapshot_compact_every,
            self.cfg.session_max_ms,
            with_dedup=self.cfg.curation_min_chars > 0,
            with_neardup=self.cfg.neardup,
            cep_pattern=self.cfg.cep_pattern,
            session_gap_by_lang=self.cfg.session_gap_by_lang,
            allowed_lateness_ms=self.cfg.allowed_lateness_ms,
            session_gap_expr=self.cfg.session_gap_expr,
        )
        self.counter = MetricCounter.remote()
        # curation: broadcast the benchmark gram set ONCE (ray.put), read
        # from local plasma inside every transform task
        self._bench_ref = None
        if self.cfg.curation_min_chars > 0 and self.cfg.curation_bench is not None:
            bench = np.unique(np.asarray(self.cfg.curation_bench, dtype=np.uint64))
            self._bench_ref = ray.put(bench)
        self._metrics_log: list[dict] = []
        self._session_warn_rows = SESSION_STATE_WARN_ROWS
        self._wm = self.manifest.watermark_ms  # in-memory watermark chain
        if self.manifest.cursor >= 0:  # resume: restore actor state snapshots
            snap = self.manifest.last_snapshot()
            old_n = sum(1 for k in snap
                        if k.startswith("window_") and k[7:].isdigit())
            if old_n and old_n != self.cfg.n_state_partitions:
                # savepoint rescaling: the checkpoint was written at a
                # different parallelism — re-partition the committed
                # state by the routing hashes at the new count
                if self.cfg.neardup:
                    raise RuntimeError(
                        "cannot rescale n_state_partitions with neardup "
                        f"enabled (checkpoint has {old_n} partitions, config "
                        f"wants {self.cfg.n_state_partitions}): the band "
                        "registry spills to per-partition sorted runs on "
                        "disk; resume with the original partition count"
                    )
                if self.cfg.allowed_lateness_ms > 0:
                    raise RuntimeError(
                        "cannot rescale n_state_partitions with allowed "
                        f"lateness enabled (checkpoint has {old_n} "
                        f"partitions, config wants "
                        f"{self.cfg.n_state_partitions}): retained-window "
                        "content and refire counters are not re-salted by "
                        "the rescale path; resume with the original count"
                    )
                self.pool.rescale_restore(snap, self.manifest.watermark_ms, old_n)
            else:
                self.pool.restore(snap, self.manifest.watermark_ms)

    def ready(self) -> None:
        """Wait for the state-actor pool to finish spawning (see
        StatePool.ready) — lets benchmarks time steady-state processing
        rather than actor process startup."""
        self.pool.ready()
        ray.get(self.counter.__ray_ready__.remote())

    def _blocked_ref_for(self, epoch_index: int):
        """Plasma ref of the blocklist-host array effective for page epoch
        ``epoch_index`` (side epochs strictly before it).  Side files are
        read ONCE driver-side (a rules stream is small by construction)
        and the broadcast object is re-put only when the set grew."""
        import pyarrow.parquet as pq

        self.blocklist_source.refresh()
        for ep in self.blocklist_source.epochs(self._bl_loaded_upto):
            if ep.index >= epoch_index:
                break
            for f in ep.files:
                self._bl_hosts.update(
                    pq.read_table(f, columns=["host"])["host"].to_pylist())
            self._bl_loaded_upto = ep.index + 1
        if self._bl_ref is None or len(self._bl_hosts) != self._bl_ref_n:
            self._bl_ref = ray.put(
                np.asarray(sorted(self._bl_hosts), dtype=object))
            self._bl_ref_n = len(self._bl_hosts)
        return self._bl_ref

    # -- transform (Dataset execution; prefetchable) -----------------------
    def _transform_refs(self, epoch, late_cutoff_ms: int) -> list:
        """Pages: read → fingerprint → window explode, executed as a Ray
        Data pipeline; returns the transformed Arrow block refs.  The late
        cutoff is the watermark at epoch START, which is precomputable from
        parquet stats — so this can run one epoch AHEAD of the state/commit
        phase (prefetch)."""
        cfg = self.cfg
        blocks = cfg.read_blocks
        if blocks is None:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            # Block count sized on BOTH rows and on-disk bytes: the row
            # heuristic alone undercounts for fat documents (a 30k-row
            # epoch of ~10 KB pages is ~600 MB — at one block per file
            # only 19 of 32 CPUs ever ran; measured 2.7x instead of 4x on
            # the 8->32 scaling pair).  ~8 MB compressed per block splits
            # on the fixtures' ~4 MB row groups without re-decoding.
            want = max(1, epoch.num_rows // 2000, epoch.total_bytes >> 23)
            blocks = max(len(epoch.files), min(2 * cpus, want))
        # Project at the scan: the fixture table carries the full
        # Common-Crawl shape (url, warc_ts, html, text, lang) but the
        # transform re-extracts text from html — reading `text` too would
        # double scan I/O at the 100-TB design point.
        side_channel = (cfg.curation_min_chars > 0 or cfg.media_features
                        or cfg.late_side_output or cfg.neardup)
        read_cols = ["url", "warc_ts", "html", "lang"]
        if cfg.media_features:
            read_cols.append("media")
        ds = ray.data.read_parquet(
            epoch.files, columns=read_cols, override_num_blocks=blocks,
        )
        if cfg.media_features:
            # actor-pool decode: payloads dropped before any other stage
            ds = ds.map_batches(
                PageMediaStage, concurrency=2, batch_format="pyarrow",
            )
        fn_kwargs = {
            "late_cutoff_ms": late_cutoff_ms,
            "counter": self.counter,
            "metric_prefix": f"e{epoch.index}:",
        }
        if cfg.curation_min_chars > 0:
            fn_kwargs["curation_min_chars"] = cfg.curation_min_chars
            fn_kwargs["bench_ref"] = self._bench_ref
        if cfg.late_side_output:
            fn_kwargs["late_side"] = True
        if cfg.neardup:
            fn_kwargs["neardup"] = True
        if cfg.extractor != "strict":
            fn_kwargs["extractor"] = cfg.extractor
        if self.blocklist_source is not None:
            fn_kwargs["blocked_ref"] = self._blocked_ref_for(epoch.index)
        explode_kwargs = {"cfg": cfg}
        if cfg.allowed_lateness_ms > 0:
            fn_kwargs["allowed_lateness_ms"] = cfg.allowed_lateness_ms
            explode_kwargs["late_cutoff_ms"] = late_cutoff_ms
        ds = ds.map_batches(page_transform, fn_kwargs=fn_kwargs, batch_format="pyarrow")
        if not side_channel:
            # fused single pass (no curation/media side-channel)
            ds = ds.map_batches(explode_windows, fn_kwargs=explode_kwargs, batch_format="pyarrow")
            return arrow_refs(ds), None
        # side channels on: materialize the per-doc narrow rows once; the
        # window explode re-reads them from plasma minus the side-channel
        # columns, and the SAME refs feed the dedup routing / media writes
        # — one corpus pass either way
        doc_refs = arrow_refs(ds)
        side_cols = ["url"]
        if cfg.curation_min_chars > 0:
            side_cols.append("clean_keep")
        if cfg.media_features:
            side_cols += ["media_mean", "media_std"]
        if cfg.late_side_output:
            side_cols.append("is_late")

        def _strip(t: pa.Table) -> pa.Table:
            if "is_late" in t.column_names:
                # DLQ rows exist only on the per-doc side table
                import pyarrow.compute as pc

                t = t.filter(pc.invert(t["is_late"]))
            return t.drop_columns(side_cols)

        win = ray.data.from_arrow_refs(list(doc_refs)).map_batches(
            _strip, batch_format="pyarrow"
        ).map_batches(explode_windows, fn_kwargs=explode_kwargs, batch_format="pyarrow")
        return arrow_refs(win), doc_refs

    # -- single epoch ------------------------------------------------------
    def run_epoch(
        self,
        epoch,
        upd_epoch=None,
        transform_refs: list | None = None,
        prev_pending: dict | None = None,
        defer_commit: bool = False,
    ):
        """Process one epoch.  With ``defer_commit`` (the run() loop), the
        finalize barrier + commit of THIS epoch are deferred into the next
        epoch's call — so epoch K+1's route/transform overlaps epoch K's
        finalize tasks.  Ordering invariants preserved:

        - window-actor adds of K+1 start only after mature(wm_K) and the
          window snapshot of K (both happen in K's call, before return);
        - join-actor feeds of K+1 start only after K's probes
          (``_finish_launch`` blocks on K's finalize barrier first) and
          K's post-evict join snapshot (its refs ride as barrier args on
          the ``feed_updates`` task);
        - commits stay strictly sequential: fence K lands at the END of
          K+1's call (``_finish_commit``), after K+1's launches but
          before K+1's own pending dict can reach its commit.
        """
        t0 = time.perf_counter()
        cfg = self.cfg
        wm_prev = self._wm
        wm_new = max(wm_prev, epoch.max_ts_ms - cfg.lateness_ms)

        # 1) pages: read → fingerprint → window explode (all streaming
        #    tasks), unless already prefetched by run()
        if transform_refs is None:
            transform_refs = self._transform_refs(epoch, wm_prev)
        win_refs, doc_refs = transform_refs

        # 2) per-block routing LAUNCH: open/session rows into state
        #    actors, closable rows back as refs (single pass).  Launched
        #    before the previous epoch's finalize barrier so both proceed
        #    concurrently; window actors were snapshotted in the previous
        #    call, so these adds can't leak into that snapshot.
        closable_refs = []
        ack_list_refs = []
        # the previous epoch's window snapshots ride in as barrier args:
        # Ray resolves them before any route task RUNS, so no add of this
        # epoch can reach an actor before the prior snapshot completed
        # (explicit happens-before, no driver-side blocking)
        snap_barrier = tuple(prev_pending.get("w_snap_refs", ())) if prev_pending else ()
        for ref in win_refs:
            closable, acks = route_and_split.remote(
                ref, wm_new, self.pool.window_actors, cfg.n_state_partitions,
                *snap_barrier,
            )
            closable_refs.append(closable)
            ack_list_refs.append(acks)

        # 2b) curation routing (optional): surviving candidate rows to the
        #     dedup actors, gated on the PREVIOUS epoch's close_epoch refs
        #     (this epoch's adds must not leak into that survivor sweep)
        if doc_refs and cfg.curation_min_chars > 0:
            close_barrier = tuple(prev_pending.get("d_close_refs", ())) if prev_pending else ()
            for ref in doc_refs:
                ack_list_refs.append(route_clean.remote(
                    ref, cfg.n_state_partitions, self.pool.dedup_actors,
                    *close_barrier,
                ))
        # 2c) near-dup routing (optional): per-doc bands to their owning
        #     band actors, gated on the PREVIOUS epoch's close refs.  Each
        #     route task also returns one (doc_h, ts_ms, url) side slice
        #     per reduce partition; the refs flow straight into the
        #     reduce tasks below (plasma-direct, no driver copy).
        nd_side_cols: list[list] = []
        if doc_refs and cfg.neardup:
            nd_P = cfg.n_state_partitions
            nd_side_cols = [[] for _ in range(nd_P)]
            nd_barrier = tuple(prev_pending.get("nd_close_refs", ())) if prev_pending else ()
            for ref in doc_refs:
                outs = route_neardup.options(num_returns=1 + nd_P).remote(
                    ref, nd_P, self.pool.neardup_actors,
                    *nd_barrier,
                )
                ack_list_refs.append(outs[0])
                for p in range(nd_P):
                    nd_side_cols[p].append(outs[1 + p])

        t_route_launch = time.perf_counter()

        # 3) finish the previous epoch, phase 1: its finalize barrier +
        #    the snapshot/evict/alert-feed SUBMISSIONS.  The waits and the
        #    fence commit (`_finish_commit`) are deferred to the END of
        #    this call so they overlap this epoch's route-ack barrier,
        #    close sweeps and finalize launches — the per-epoch serial
        #    floor that saturates the small-cluster scaling side.
        if prev_pending is not None:
            prev_pending = self._finish_launch(prev_pending)
        t_prev_fin = time.perf_counter()

        # 4) feed this epoch's page updates into the join state (build
        #    side) — after the previous epoch's probes (its finalize
        #    barrier above) AND its post-evict join snapshot, carried as
        #    barrier args so no driver-side block is needed
        update_routes: list = []
        if upd_epoch is not None:
            j_snap_barrier = tuple(prev_pending["j_snap_refs"]) if prev_pending else ()
            update_routes = [
                feed_updates.remote(
                    upd_epoch.files, cfg.n_state_partitions, self.pool.join_actors,
                    *j_snap_barrier,
                )
            ]

        # 5) route barrier: every actor-add ack — state must be complete
        #    before the watermark advances (mature)
        acks = [a for lst in ray.get(ack_list_refs) for a in lst]
        if acks:
            ray.wait(acks, num_returns=len(acks))
        t_route = time.perf_counter()

        # 5b) curation epoch close: every candidate add is acked, so the
        #     dedup actors can sweep this epoch's first-seen survivors.
        #     Submitted before the dedup snapshot (same driver → mailbox
        #     order); the write tasks land in the staging dir below.
        d_close_refs: list = []
        if doc_refs and cfg.curation_min_chars > 0:
            d_close_refs = self.pool.close_dedup_refs()

        # 5c) near-dup epoch close: adds acked → per-band verdict sweep;
        #     the reduce tasks (one per doc-hash slice) AND the verdicts
        #     across partitions, stage survivor parts under the fence and
        #     submit the survivors' band registrations.  The seen-band
        #     snapshot is deferred to _finish_epoch, AFTER the register
        #     acks resolve (register → snapshot → commit ordering).
        nd_close_refs: list = []
        nd_reduce_refs: list = []
        staging = self.sink.staging_dir(epoch.index)
        if doc_refs and cfg.neardup:
            nd_P = cfg.n_state_partitions
            nd_close_lists = self.pool.close_neardup_refs(nd_P)
            # one ref per actor is enough as the next epoch's route
            # barrier: all of close_epoch's slices resolve together
            nd_close_refs = [row[0] for row in nd_close_lists]
            nd_reduce_refs = [
                reduce_neardup.remote(
                    os.path.join(staging, f"neardup-p{p:04d}.parquet"),
                    self.pool.neardup_actors, nd_P,
                    p, len(nd_close_lists),
                    *[row[p] for row in nd_close_lists],
                    *nd_side_cols[p],
                )
                for p in range(nd_P)
            ]

        # 6) matured rows from earlier epochs join this epoch's closable
        #    rows — taken as refs straight from the actors (no driver copy)
        fin_refs = list(closable_refs) + self.pool.mature_refs(wm_new)

        # 7) finalize per (key, window) + join probe + staged write: ONE
        #    task per hash partition selects its key range from every
        #    closable/matured block (map-side-select shuffle), sweeps all
        #    its windows, probes the co-partitioned join state, and writes
        #    its own staged parquet part (resumable layout, never one
        #    giant file).  Replaces groupby().map_groups, whose per-group
        #    UDF dispatch dominates when an epoch closes 10^4-10^6 windows.
        # one finalize task per CPU: paired A/B at 4x epoch size showed
        # finer partitioning (2 tasks/CPU) is a wash — each extra task
        # re-scans every block, cancelling its better packing around
        # large atomic (key, window) groups
        P = cfg.n_finalize_partitions or max(
            8, min(64, int(ray.cluster_resources().get("CPU", 8)))
        )
        if update_routes:
            ray.get(update_routes)  # build side complete before any probe
        write_refs, alert_refs, part_paths = [], [], []
        for p in (range(P) if fin_refs else []):
            part_paths.append(os.path.join(staging, f"part-{p:05d}.parquet"))
            cnt, al = finalize_partition.remote(
                part_paths[-1],
                self.pool.join_actors, cfg.n_state_partitions,
                p, P, *fin_refs,
            )
            write_refs.append(cnt)
            alert_refs.append(al)

        # 7b) allowed-lateness refires: the per-actor sweeps run after the
        #     mature calls above (same mailbox), each followed by one
        #     finalize+probe+staged-write task.  Probe ordering matches
        #     the main finalize (update_routes already awaited).
        refire_write_refs: list = []
        if cfg.allowed_lateness_ms > 0:
            for i, sweep in enumerate(self.pool.mature_refire_refs(wm_new)):
                refire_write_refs.append(finalize_refires.remote(
                    os.path.join(staging, f"refires-p{i:04d}.parquet"),
                    self.pool.join_actors, cfg.n_state_partitions, sweep,
                ))

        # 8) window-state snapshot, ASYNC (actors quiesced: adds acked and
        #    mature calls precede the snapshot in each actor's mailbox) —
        #    runs concurrently with the finalize tasks above; the refs are
        #    resolved before the commit fence (snapshot-then-commit,
        #    SURVEY.md §7.4.4) and gate the NEXT epoch's route tasks.
        snap_dir = os.path.join(self.sink.out_dir, "_state", f"epoch={epoch.index:05d}")
        w_snap_refs = self.pool.snapshot_windows_refs(snap_dir)

        # curation: stage survivor parts + snapshot the seen-hash state
        # (close → snapshot mailbox order; both resolved pre-commit)
        clean_write_refs: list = []
        if d_close_refs:
            clean_write_refs = [
                write_clean_part.remote(
                    os.path.join(staging, f"clean-p{i:04d}.parquet"), ref
                )
                for i, ref in enumerate(d_close_refs)
            ]
        # snapshot UNCONDITIONALLY whenever the pool exists (empty list
        # otherwise): last_snapshot() only surfaces the LAST committed
        # epoch's snapshot dict, so an epoch without candidates must still
        # record the cumulative dedup paths or a resume from it would
        # restore an EMPTY seen-hash set (snapshot returns the cumulative
        # path list, so this is cheap)
        d_snap_refs: list = self.pool.snapshot_dedup_refs(snap_dir)
        media_write_refs: list = []
        if doc_refs and cfg.media_features:
            media_write_refs = [
                write_media_part.remote(
                    os.path.join(staging, f"media-b{i:04d}.parquet"), ref
                )
                for i, ref in enumerate(doc_refs)
            ]
        late_write_refs: list = []
        if doc_refs and cfg.late_side_output:
            late_write_refs = [
                write_late_part.remote(
                    os.path.join(staging, f"late-b{i:04d}.parquet"), ref
                )
                for i, ref in enumerate(doc_refs)
            ]

        self._wm = wm_new
        pending = {
            "epoch": epoch,
            "upd_epoch": upd_epoch,
            "write_refs": write_refs,
            "alert_refs": alert_refs,
            "part_paths": part_paths,
            "staging": staging,
            "wm": wm_new,
            "snap_dir": snap_dir,
            "w_snap_refs": w_snap_refs,
            "d_close_refs": d_close_refs,
            "nd_close_refs": nd_close_refs,
            "nd_reduce_refs": nd_reduce_refs,
            "clean_write_refs": clean_write_refs,
            "d_snap_refs": d_snap_refs,
            "media_write_refs": media_write_refs,
            "late_write_refs": late_write_refs,
            "refire_write_refs": refire_write_refs,
            "t0": t0,
            "t_route": t_route,
            "t_route_launch": t_route_launch,
            "t_prev_fin": t_prev_fin,
            "t_launch": time.perf_counter(),
        }
        # previous epoch, phase 2: await its snapshots and commit its
        # fence — AFTER this epoch's launches, so the waits overlapped
        # useful work.  Commits stay strictly sequential (fence K lands
        # here, inside epoch K+1's call, before fence K+1 can land).
        if prev_pending is not None:
            self._finish_commit(prev_pending)
        if defer_commit:
            return pending
        return self._finish_epoch(pending)

    def _finish_epoch(self, pending: dict) -> dict:
        """Full finish for a pending epoch: launch + commit in one call.
        The run() loop instead splits the two phases so epoch K's
        snapshot/evict WAITS and its fence commit overlap epoch K+1's
        route/close/finalize launches (the per-epoch serial floor is the
        reason the 8-CPU scaling side saturates — BASELINE.md)."""
        return self._finish_commit(self._finish_launch(pending))

    def _finish_launch(self, pending: dict) -> dict:
        """Finalize barrier → LAUNCH (alert feed ∥ join evict ∥ snapshots).

        Blocks only on this epoch's finalize tasks (and, under neardup,
        the verdict reduce + band registrations — register → snapshot
        ordering).  Everything submitted here is awaited later in ONE
        combined ``ray.get`` by `_finish_commit`; per-actor mailbox
        ordering (same submitter) guarantees evict-before-join-snapshot
        and feed-before-alert-snapshot.  The NEXT epoch's join feeds take
        this epoch's ``j_snap_refs`` as barrier args, preserving
        feed-after-post-evict-snapshot without a driver-side block."""
        epoch = pending["epoch"]
        t_enter = time.perf_counter()
        fin_results = ray.get(pending["write_refs"])
        pending["n_out"] = int(sum(r[0] for r in fin_results))
        pending["fin_timings"] = [r[1] for r in fin_results if r[1]]
        if pending.get("refire_write_refs"):
            # the refire tasks ALSO probe the join actors — they must
            # complete before this epoch's join evict is submitted below,
            # or the probe would race the eviction (the main finalize
            # probes are already covered by the write_refs barrier).
            # Cache the results; _finish_commit's combined get re-reads
            # the (now local) refs for the metric sums.
            ray.get(pending["refire_write_refs"])
        t_barrier = time.perf_counter()
        # rising-edge alerts (T3 analog): strictly sequential per epoch —
        # fed AFTER the finalize barrier, written into the staging dir so
        # they ride the same idempotent fence, state snapshotted with it
        pending["alert_feed_refs"], pending["cep_feed_refs"] = (
            self.pool.feed_alerts_and_cep(pending["alert_refs"])
            if pending["alert_refs"] else ([], [])
        )
        # windowed Top-N side output: submitted AFTER the finalize barrier
        # (the staged parts this task reads are complete), awaited with
        # everything else in _finish_commit's combined ray.get
        pending["topn_refs"] = []
        if self.cfg.window_topn > 0:
            pending["topn_refs"] = [write_topn_part.remote(
                os.path.join(pending["staging"], "topn.parquet"),
                self.cfg.window_topn, pending["part_paths"],
            )]
        pending["evict_refs"] = self.pool.evict_join_refs(pending["wm"])
        pending["j_snap_refs"] = self.pool.snapshot_join_refs(pending["snap_dir"])
        # the alert snapshot also persists the CEP tail state when a
        # pattern is configured (same actor, same feed-before-snapshot
        # FIFO ordering)
        pending["a_snap_refs"] = self.pool.snapshot_alerts_refs(pending["snap_dir"])
        (pending["buf_w_refs"], pending["buf_j_refs"],
         pending["buf_d_refs"], pending["buf_nd_refs"]) = self.pool.buffered_refs()
        pending["metrics_ref"] = self.counter.take_prefix.remote(f"e{epoch.index}:")
        pending["stale_ref"] = self.counter.take_stale.remote(epoch.index)

        # near-dup band snapshot: SUBMITTED here with the epoch's reduce
        # refs as barrier args — each reduce task waits its register acks
        # internally, so the snapshot executes only after every
        # registration landed (register → snapshot → commit) with NO
        # driver-side barrier; the reduce/register waits thereby overlap
        # the next epoch's launches.  Submitted UNCONDITIONALLY whenever
        # the pool exists (see the dedup snapshot note above): an epoch
        # without doc blocks must still record the cumulative
        # band-snapshot paths, or a resume from it would restore an EMPTY
        # registered-band set and re-admit near-dups.
        pending["nd_snap_refs"] = self.pool.snapshot_neardup_refs(
            pending["snap_dir"], *pending.get("nd_reduce_refs", [])
        )
        pending["t_fin_enter"] = t_enter
        pending["t_fin_barrier"] = t_barrier
        pending["t_fin_launched"] = time.perf_counter()
        return pending

    def _finish_commit(self, pending: dict) -> dict:
        """Await every `_finish_launch` submission in one combined
        ``ray.get`` → write alerts under the fence → publish → manifest
        commit.  In the run() loop this is called AFTER the next epoch's
        launches; commits stay strictly sequential."""
        epoch = pending["epoch"]
        t_enter = pending["t_fin_enter"]
        t_barrier = pending["t_fin_barrier"]
        t_commit_enter = time.perf_counter()
        n_out = pending["n_out"]
        fin_timings = pending["fin_timings"]
        # near-dup reduce results (kept, docs) — by now the reduce tasks
        # have had the whole of the next epoch's launch phase to finish;
        # their completion also certifies the band registrations landed
        nd_kept = nd_docs = 0
        if pending.get("nd_reduce_refs"):
            nd_results = ray.get(pending["nd_reduce_refs"])
            nd_kept = int(sum(r[0] for r in nd_results))
            nd_docs = int(sum(r[1] for r in nd_results))
        alert_feed_refs = pending["alert_feed_refs"]
        cep_feed_refs = pending.get("cep_feed_refs", [])
        evict_refs = pending["evict_refs"]
        j_snap_refs = pending["j_snap_refs"]
        a_snap_refs = pending["a_snap_refs"]
        buf_w_refs, buf_j_refs = pending["buf_w_refs"], pending["buf_j_refs"]
        buf_d_refs, buf_nd_refs = pending["buf_d_refs"], pending["buf_nd_refs"]
        metrics_ref, stale_ref = pending["metrics_ref"], pending["stale_ref"]
        nd_snap_refs = pending["nd_snap_refs"]

        clean_write_refs = pending.get("clean_write_refs", [])
        d_snap_refs = pending.get("d_snap_refs", [])
        media_write_refs = pending.get("media_write_refs", [])
        late_write_refs = pending.get("late_write_refs", [])
        topn_refs = pending.get("topn_refs", [])
        refire_write_refs = pending.get("refire_write_refs", [])
        flat = ray.get(
            list(pending["w_snap_refs"]) + alert_feed_refs + cep_feed_refs
            + evict_refs
            + j_snap_refs + a_snap_refs + buf_w_refs + buf_j_refs
            + buf_d_refs + buf_nd_refs
            + clean_write_refs + d_snap_refs + nd_snap_refs + media_write_refs
            + late_write_refs + topn_refs + refire_write_refs
            + [metrics_ref, stale_ref]
        )
        i = 0
        def _take(n):
            nonlocal i
            out = flat[i:i + n]
            i += n
            return out
        w_snap = {f"window_{k}": p for k, p in enumerate(_take(len(pending["w_snap_refs"])))}
        alert_tabs = _take(len(alert_feed_refs))
        cep_tabs = _take(len(cep_feed_refs))
        evicted = int(sum(_take(len(evict_refs))))
        j_snap = {f"join_{k}": p for k, p in enumerate(_take(len(j_snap_refs)))}
        # alert snapshot dicts carry the CEP tail path too when enabled
        a_snap = {f"alerts_{k}": p for k, p in enumerate(_take(len(a_snap_refs)))}
        buf_w = _take(len(buf_w_refs))
        buf_j = _take(len(buf_j_refs))
        buf_d = _take(len(buf_d_refs))
        buf_nd = _take(len(buf_nd_refs))
        n_clean = int(sum(_take(len(clean_write_refs))))
        d_snap = {f"dedup_{k}": p for k, p in enumerate(_take(len(d_snap_refs)))}
        nd_snap = {f"neardup_{k}": p for k, p in enumerate(_take(len(nd_snap_refs)))}
        n_media = int(sum(_take(len(media_write_refs))))
        n_late_dlq = int(sum(_take(len(late_write_refs))))
        n_topn = int(sum(_take(len(topn_refs))))
        refire_results = _take(len(refire_write_refs))
        n_refire = int(sum(r[0] for r in refire_results))
        n_refire_dropped = int(sum(r[1] for r in refire_results))
        metrics, stale = _take(2)

        n_alerts = 0
        alerts = pa.concat_tables([t for t in alert_tabs if t.num_rows]) \
            if any(t.num_rows for t in alert_tabs) else None
        if alerts is not None:
            import pyarrow.parquet as _pq

            _pq.write_table(alerts, os.path.join(pending["staging"], "alerts.parquet"))
            n_alerts = alerts.num_rows
        n_cep = 0
        cep = pa.concat_tables([t for t in cep_tabs if t.num_rows]) \
            if any(t.num_rows for t in cep_tabs) else None
        if cep is not None:
            import pyarrow.parquet as _pq

            _pq.write_table(cep, os.path.join(pending["staging"], "cep.parquet"))
            n_cep = cep.num_rows
        t_fin = time.perf_counter()
        snapshot = {**w_snap, **j_snap, **a_snap, **d_snap, **nd_snap}
        # reclaim counts of EARLIER epochs delivered after their collection
        for k, v in stale.items():
            metrics[k] = metrics.get(k, 0) + v
        metrics.update(
            {
                "epoch": epoch.index,
                "rows_in": epoch.num_rows,
                "fingerprints": n_out,
                "alerts": n_alerts,
                "clean_docs": n_clean,
                "neardup_kept": nd_kept,
                "neardup_dropped": nd_docs - nd_kept,
                "media_docs": n_media,
                "late_dlq_rows": n_late_dlq,
                "topn_rows": n_topn,
                "cep_matches": n_cep,
                "refire_rows": n_refire,
                "refire_dropped": n_refire_dropped,
                "join_evicted": evicted,
                # S9 lag analog: epochs discovered but not yet committed
                "epochs_behind": max(0, len(self.source) - epoch.index - 1),
                "buffered": {
                    "fixed": sum(x["fixed"] for x in buf_w),
                    "session": sum(x["session"] for x in buf_w),
                    # allowed-lateness retention gauge (0 when off);
                    # bounded by end + allowed <= wm eviction
                    "retained": sum(x.get("retained", 0) for x in buf_w),
                    "join": sum(buf_j),
                    # monotone curation-state gauges: seen exact-dedup
                    # hashes and registered near-dup bands
                    "dedup": sum(buf_d),
                    "neardup": sum(buf_nd),
                },
                "route_sec": round(pending["t_route"] - pending["t0"], 4),
                "finalize_sec": round(t_fin - pending["t_route"], 4),
                "commit_sec": round(time.perf_counter() - t_fin, 4),
                "wall_sec": round(time.perf_counter() - pending["t0"], 4),
                # fine-grained phase diagnostics (driver-side waits)
                "ph_route_launch_sec": round(pending["t_route_launch"] - pending["t0"], 4),
                "ph_prev_finish_sec": round(pending["t_prev_fin"] - pending["t_route_launch"], 4),
                "ph_ack_sec": round(pending["t_route"] - pending["t_prev_fin"], 4),
                "ph_launch_sec": round(pending["t_launch"] - pending["t_route"], 4),
                "ph_fin_barrier_sec": round(t_barrier - t_enter, 4),
                "ph_fin_launch_sec": round(pending["t_fin_launched"] - t_barrier, 4),
                # time the snapshot/evict waits spent overlapped with the
                # NEXT epoch's launches (0 on the non-deferred path)
                "ph_fin_overlap_sec": round(t_commit_enter - pending["t_fin_launched"], 4),
                "ph_fin_combined_sec": round(t_fin - t_commit_enter, 4),
                "fin_tasks": {
                    k: (max(t.get(k, 0) for t in fin_timings) if fin_timings else 0)
                    for k in ("sel", "fin", "probe", "write", "rows_mine", "groups")
                },
            }
        )
        upd_epoch = pending["upd_epoch"]
        # rename mode: publish is the atomic fence promotion.  Manifest
        # mode: publish is a no-op on the data (already at its final
        # immutable attempt path) and the manifest.commit below — which
        # records that path as the fence — IS the atomic commit point.
        fence = self.sink.publish(epoch.index)
        lineage = {
            "input_files": epoch.files,
            "update_files": upd_epoch.files if upd_epoch else [],
            "output_fence": fence,
        }
        self.manifest.commit(epoch.index, pending["wm"], snapshot, metrics, lineage)
        self._metrics_log.append(metrics)
        sess_rows = metrics["buffered"]["session"]
        if (self.cfg.session_gap_ms and not self.cfg.session_max_ms
                and sess_rows >= self._session_warn_rows):
            logger.warning(
                "UNBOUNDED session state: %d buffered session rows and "
                "session_max_ms=0 — open sessions of keys that never idle "
                "grow forever. Set session_max_ms (default AUTO caps at "
                "20x the gap) to bound state.", sess_rows)
            self._session_warn_rows *= 2  # once per doubling, not per epoch
        return metrics

    # -- full run ----------------------------------------------------------
    def run(
        self,
        max_epochs: int | None = None,
        *,
        follow: bool = False,
        poll_interval_s: float = 0.2,
        idle_timeout_s: float = 5.0,
        stop_file: str | None = None,
    ) -> dict:
        """Process epochs after the committed cursor (resume-safe).

        ``follow=False`` (default): one bounded pass over the epochs
        currently on disk.  ``follow=True``: TAIL the source directory —
        the reference's unbounded Kafka consumption — processing sealed
        epochs as they appear (``EpochSource.refresh``), committing each
        exactly once, until ``stop_file`` exists, ``max_epochs`` are
        processed, or the source stays idle for ``idle_timeout_s``
        (sandbox termination; a production tail would run forever).
        Between polls all pending work is committed, so a kill while
        idle loses nothing."""
        if not follow:
            return self._run_once(max_epochs)
        runs: list[dict] = []
        processed = 0
        idle_since = time.monotonic()
        idle_sec = 0.0
        while True:
            if stop_file and os.path.exists(stop_file):
                break
            if max_epochs is not None and processed >= max_epochs:
                break
            self.source.refresh()
            if self.updates_source is not None:
                self.updates_source.refresh()
            avail = self.source.epochs(self.manifest.cursor + 1)
            if max_epochs is not None:
                avail = avail[: max_epochs - processed]
            if avail:
                r = self._run_once(len(avail))
                runs.append(r)
                processed += r["epochs_run"]
                idle_since = time.monotonic()
                continue
            if time.monotonic() - idle_since >= idle_timeout_s:
                break
            idle_sec += poll_interval_s
            time.sleep(poll_interval_s)
        if not runs:
            return {"distinct_urls_est": 0, "epochs_run": 0, "rows_in": 0,
                    "fingerprints": 0, "clean_docs": 0, "media_docs": 0,
                    "late_dropped": 0, "wall_sec": 0.0, "docs_per_sec": 0.0,
                    "follow_idle_sec": round(idle_sec, 3), "per_epoch": []}
        total = dict(runs[-1])  # distinct_urls_est: cumulative HLL, last wins
        for k in ("epochs_run", "rows_in", "fingerprints", "clean_docs",
                  "media_docs", "late_dropped", "wall_sec"):
            total[k] = sum(r[k] for r in runs)
        total["per_epoch"] = [m for r in runs for m in r["per_epoch"]]
        total["wall_sec"] = round(total["wall_sec"], 4)
        total["docs_per_sec"] = round(
            total["rows_in"] / total["wall_sec"], 2) if total["wall_sec"] else 0.0
        total["follow_idle_sec"] = round(idle_sec, 3)
        return total

    def _run_once(self, max_epochs: int | None = None) -> dict:
        """One bounded pass: every epoch currently after the cursor.

        The per-epoch late cutoff is the watermark at epoch START, which
        derives purely from parquet column stats (EpochSource) — so epoch
        K+1's read+transform Dataset execution is PREFETCHED on a helper
        thread while epoch K runs its state/finalize/commit phase.  Resume
        semantics are unchanged: commits stay strictly sequential.
        """
        from concurrent.futures import ThreadPoolExecutor

        start = self.manifest.cursor + 1
        epochs = self.source.epochs(start)
        upd_by_idx = {}
        if self.updates_source:
            upd_by_idx = {e.index: e for e in self.updates_source.epochs(0)}
        if max_epochs is not None:
            epochs = epochs[:max_epochs]
        cutoffs = []  # watermark at each epoch's start
        wm = self.manifest.watermark_ms
        for ep in epochs:
            cutoffs.append(wm)
            wm = max(wm, ep.max_ts_ms - self.cfg.lateness_ms)
        run_t0 = time.perf_counter()
        n_before = len(self._metrics_log)
        pending = None
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(self._transform_refs, epochs[0], cutoffs[0]) if epochs else None
            for i, ep in enumerate(epochs):
                refs = fut.result()
                if i + 1 < len(epochs):
                    fut = pool.submit(self._transform_refs, epochs[i + 1], cutoffs[i + 1])
                pending = self.run_epoch(
                    ep, upd_by_idx.get(ep.index),
                    transform_refs=refs, prev_pending=pending, defer_commit=True,
                )
        if pending is not None:
            final = self._finish_epoch(pending)
            # final drain: fire-and-forget adds delivered AFTER the last
            # epoch's take_prefix/take_stale would otherwise be lost (the
            # mid-run stale-drain only runs at the NEXT epoch's finish) —
            # merge them into the last epoch's in-memory metrics so run()
            # totals stay exact.
            for k, v in ray.get(
                self.counter.take_stale.remote(pending["epoch"].index + 1)
            ).items():
                final[k] = final.get(k, 0) + v
        all_metrics = self._metrics_log[n_before:]
        total_rows = sum(m["rows_in"] for m in all_metrics)
        total_wall = time.perf_counter() - run_t0
        regs = ray.get(self.counter.get_regs.remote("distinct_urls"))
        if regs is not None:
            import numpy as _np

            from ..stages.sketch import hll_estimate
            distinct_urls_est = int(round(
                hll_estimate(_np.frombuffer(regs, dtype=_np.uint8))))
        else:
            distinct_urls_est = 0
        return {
            "distinct_urls_est": distinct_urls_est,
            "epochs_run": len(all_metrics),
            "rows_in": total_rows,
            "fingerprints": sum(m["fingerprints"] for m in all_metrics),
            "clean_docs": sum(m.get("clean_docs", 0) for m in all_metrics),
            "media_docs": sum(m.get("media_docs", 0) for m in all_metrics),
            "late_dropped": sum(m.get("late_dropped", 0) for m in all_metrics),
            "wall_sec": round(total_wall, 4),
            "docs_per_sec": round(total_rows / total_wall, 2) if total_wall else 0.0,
            "per_epoch": all_metrics,
        }

    def _fence_files(self, pattern: str) -> list[str]:
        """Committed output files matching ``pattern``, across epochs —
        resolved through the manifest in BOTH commit modes: compacted
        ranges read from their compaction dir, remaining epochs from
        their recorded fence dir (rename mode: ``epoch=K``; manifest
        mode: the committed attempt dir).  Uncommitted attempts, orphaned
        fences and already-compacted epoch dirs never appear."""
        import glob

        st = self.manifest.state
        comps = st.get("compactions", [])
        covered = {e for c in comps for e in c["epochs"]}
        files: list[str] = []
        for c in comps:
            files.extend(sorted(glob.glob(os.path.join(c["dir"], pattern))))
        for k in sorted(st["epochs"], key=int):
            if int(k) in covered:
                continue
            d = st["epochs"][k]["lineage"]["output_fence"]
            files.extend(sorted(glob.glob(os.path.join(d, pattern))))
        return files

    def result_dataset(self) -> "ray.data.Dataset":
        return ray.data.read_parquet(self._fence_files("part-*.parquet"))

    def refire_df(self) -> pd.DataFrame:
        """Committed allowed-lateness refires (full fingerprint rows +
        refire_seq), all epochs — each row is an UPDATED full aggregate
        of an already-fired window; consumers upsert by (window identity,
        max refire_seq)."""
        import glob

        import pyarrow.parquet as _pq

        files = self._fence_files("refires-p*.parquet")
        if not files:
            return pd.DataFrame()
        return pa.concat_tables(
            [_pq.read_table(f) for f in files], promote_options="default"
        ).to_pandas()

    def media_df(self) -> pd.DataFrame:
        """Committed media features (url, ts_ms, media_mean, media_std)."""
        import glob

        import pyarrow.parquet as _pq

        files = self._fence_files("media-b*.parquet")
        if not files:
            return pd.DataFrame(columns=["url", "ts_ms", "media_mean", "media_std"])
        return pa.concat_tables(
            [_pq.read_table(f) for f in files], promote_options="default"
        ).to_pandas()

    def late_df(self) -> pd.DataFrame:
        """Committed dead-letter rows (url, ts_ms of late-dropped pages),
        all epochs — the side-output audit trail."""
        import glob

        import pyarrow.parquet as _pq

        files = self._fence_files("late-b*.parquet")
        if not files:
            return pd.DataFrame(columns=["url", "ts_ms"])
        return pa.concat_tables(
            [_pq.read_table(f) for f in files], promote_options="default"
        ).to_pandas()

    def clean_df(self) -> pd.DataFrame:
        """Committed curation survivors (url, ts_ms, text_hash), all epochs."""
        import glob

        import pyarrow.parquet as _pq

        files = self._fence_files("clean-p*.parquet")
        if not files:
            return pd.DataFrame(columns=["url", "ts_ms", "text_hash"])
        return pa.concat_tables(
            [_pq.read_table(f) for f in files], promote_options="default"
        ).to_pandas()

    def neardup_df(self) -> pd.DataFrame:
        """Committed near-dup survivors (url, ts_ms), all epochs."""
        import glob

        import pyarrow.parquet as _pq

        files = self._fence_files("neardup-p*.parquet")
        if not files:
            return pd.DataFrame(columns=["url", "ts_ms"])
        return pa.concat_tables(
            [_pq.read_table(f) for f in files], promote_options="default"
        ).to_pandas()

    def topn_df(self) -> pd.DataFrame:
        """Committed windowed Top-N rows (window_start, window_end, rank,
        key_host, doc_count), all epochs — the Flink window Top-N analog."""
        import glob

        import pyarrow.parquet as _pq

        files = self._fence_files("topn.parquet")
        if not files:
            return pd.DataFrame(columns=TOPN_SCHEMA.names)
        return pa.concat_tables(
            [_pq.read_table(f) for f in files], promote_options="default"
        ).to_pandas()

    def cep_df(self) -> pd.DataFrame:
        """Committed CEP match rows (Flink MATCH_RECOGNIZE analog), all
        epochs: one row per window ending a pattern match, with the first
        matched window's start as match_start."""
        import glob

        import pyarrow.parquet as _pq

        files = self._fence_files("cep.parquet")
        if not files:
            return pd.DataFrame(columns=[
                "key_lang", "key_host", "window_kind", "match_start",
                "window_start", "window_end"])
        return pa.concat_tables([_pq.read_table(f) for f in files]).to_pandas()

    def alerts_df(self) -> pd.DataFrame:
        """Committed rising-edge alert rows (T3 analog), all epochs."""
        import glob

        import pyarrow.parquet as _pq

        files = self._fence_files("alerts.parquet")
        if not files:
            return pd.DataFrame(columns=[
                "key_lang", "key_host", "window_kind",
                "window_start", "window_end", "dup_cluster_count"])
        return pa.concat_tables([_pq.read_table(f) for f in files]).to_pandas()

    def shutdown(self) -> None:
        self.pool.shutdown()
        ray.kill(self.counter)
