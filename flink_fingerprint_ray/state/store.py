"""Hash-partitioned window/join state-store actor pool.

This is the "RocksDB-style state store" slot of the north star: Ray Data
has no event-time windows or cross-batch keyed state, so windows that
straddle epoch boundaries, session windows (data-dependent boundaries),
and the stream-stream join build side live in a pool of plain Ray actors,
each owning a fixed hash partition of the key space
(``partition = hash(key) % n``), so a key ALWAYS routes to the same actor
— the Ray analog of Flink keyed state (reference: window buffers at
``src/flink_job/job.py:103-125``, downtime machine
``src/data_input/process_odr.py:1028-1088``, join buffer with time-based
eviction ``src/postprocess/save_fingerprints.py:31-35,66-89``).

Scale design:
- actors hold only the watermark frontier (open windows ≈ lateness +
  window_size worth of rows per key, sessions ≈ gap + lateness), never the
  full stream; eviction is watermark-driven;
- data reaches actors via distributed ``route_block`` tasks (one per Arrow
  block), not a driver funnel;
- per-epoch ``snapshot(epoch, dir)`` writes each actor's buffers as
  Parquet under the checkpoint dir; ``restore`` reloads them — the engine
  snapshots BEFORE committing the sink fence (snapshot-then-commit,
  SURVEY.md §7.4.4).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray


def key_partition(key_hash: np.ndarray, n_partitions: int) -> np.ndarray:
    """Stable partition id from precomputed uint64 key hashes."""
    return (key_hash % np.uint64(n_partitions)).astype(np.int64)


def _concat(tables: list[pa.Table]) -> pa.Table | None:
    tables = [t for t in tables if t is not None and t.num_rows]
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


@ray.remote(num_cpus=0.25)
class WindowStateActor:
    # num_cpus=0.25: state actors are long-lived holders with intermittent
    # work (mature/snapshot).  A larger reservation starves the
    # map/finalize tasks (0.5/actor ate HALF the cluster and could
    # deadlock a small session); 0 would let actor work escape the
    # session's CPU budget entirely (dishonest under the two-level
    # scaling proxy).
    """Owns one key partition's open fixed windows AND open sessions."""

    def __init__(self, partition_id: int, session_gap_ms: int = 0,
                 compact_every: int = 8, session_max_ms: int = 0,
                 session_gap_by_lang: dict | None = None,
                 allowed_lateness_ms: int = 0,
                 session_gap_expr: str | None = None) -> None:
        self.partition_id = partition_id
        self.session_gap_ms = session_gap_ms
        # fully general per-element gap extractor: a derived-column
        # formula over the numeric narrow-row columns, compiled ONCE per
        # actor (functions/exprs.py); yields per-row gaps for
        # dynamic_session_segments.  Mutually exclusive with
        # session_gap_by_lang / allowed lateness (validated in config).
        self._gap_expr_fn = None
        if session_gap_expr:
            from ..functions.exprs import compile_expr

            self._gap_expr_fn = compile_expr(session_gap_expr)
        # dynamic per-element gap (Flink SessionWindowTimeGapExtractor
        # analog): the gap is a function of the element — here its
        # key_lang — with session_gap_ms as the default for unmapped
        # langs.  Resolved at mature time from the buffered rows, so the
        # session buffer schema / snapshots are unchanged.
        self.session_gap_by_lang = dict(session_gap_by_lang or {})
        # allowed lateness (Flink allowedLateness analog, FIXED windows
        # only): closed windows' content is RETAINED until
        # window_end + allowed <= watermark; a late-but-admissible row
        # re-fires its window as an updated full aggregate on the refire
        # side channel.  0 = off (no retention, no extra work).
        self.allowed_lateness_ms = int(allowed_lateness_ms)
        # retained closed-window content + this epoch's late refire rows
        # + per-window firing counters (window identity -> refires so far)
        self._retained: list[pa.Table] = []
        self._refire_new: list[pa.Table] = []
        self._refire_seq: dict[tuple, int] = {}
        # session allowed-lateness state: late-admitted session rows
        # buffered for this epoch's unified sweep, plus that sweep's
        # refire emissions / drop count (collected by mature_refires,
        # which runs right after mature_sessions in the actor mailbox)
        self._slate_new: list[pa.Table] = []
        self._sess_refires: pa.Table | None = None
        self._sess_dropped = 0
        # state-bounding cap: a session whose FIRST event is more than
        # session_max_ms behind the watermark force-closes with the rows
        # seen so far — hot keys that never idle otherwise grow open
        # session state linearly with stream length (BASELINE.md round-1
        # lesson). 0 = off (exact unbounded-session semantics).
        self.session_max_ms = session_max_ms
        self._fixed: list[pa.Table] = []    # rows with window_end > watermark
        self._session: list[pa.Table] = []  # rows of sessions not yet closed
        # delta checkpointing: per-epoch snapshots write only rows ADDED
        # since the last snapshot (O(new rows), not O(open state) — hot
        # hosts keep sessions open for the whole stream, so full-state
        # snapshots would grow linearly); restore reads all deltas and
        # replays mature() to discard rows whose windows already fired.
        self._delta: dict[str, list[pa.Table]] = {
            "fixed": [], "session": [], "retained": [], "refire": []}
        self._snap_paths: dict[str, list[str]] = {
            "fixed": [], "session": [], "retained": [], "refire": []}
        self._snaps_since_compact = 0
        self._compact_every = compact_every

    # -- ingest ------------------------------------------------------------
    def add_fixed(self, table: pa.Table) -> int:
        if table.num_rows:
            self._fixed.append(table)
            self._delta["fixed"].append(table)
        return table.num_rows

    def add_session(self, table: pa.Table) -> int:
        if table.num_rows:
            if self.allowed_lateness_ms > 0:
                # per-row firing counter (0 = never emitted).  Under
                # lateness the session snapshot is a FULL post-mature
                # base every epoch (segment identity is data-dependent
                # and mutates on late merges, so append-only deltas
                # cannot represent it) — no delta bookkeeping here.
                table = table.append_column("_fired", pa.array(
                    np.zeros(table.num_rows, np.int64), pa.int64()))
                self._session.append(table)
            else:
                self._session.append(table)
                self._delta["session"].append(table)
        return table.num_rows

    def add_session_late(self, table: pa.Table) -> int:
        """Late-but-admissible SESSION rows (allowed lateness): swept by
        this epoch's ``_mature_sessions_lateness`` — they merge into open,
        retained (already-fired) or fresh sessions; a merged session whose
        content already fired re-fires on the refire channel."""
        if table.num_rows:
            table = table.append_column("_fired", pa.array(
                np.zeros(table.num_rows, np.int64), pa.int64()))
            self._slate_new.append(table)
        return table.num_rows

    def add_retained(self, table: pa.Table) -> int:
        """Closable rows, copied in at first fire so their window can
        re-fire on late arrivals (allowed-lateness retention).  Delta'd
        under 'retained' — unlike mature-moved rows, these never entered
        the 'fixed' deltas, so restore cannot recover them by replay."""
        if table.num_rows:
            self._retained.append(table)
            self._delta["retained"].append(table)
        return table.num_rows

    def add_refire(self, table: pa.Table) -> int:
        """Late-but-admissible rows whose window already fired; swept by
        ``mature_refires`` this epoch.  Delta'd under 'refire' (after the
        sweep they become retained content; restore unions both names)."""
        if table.num_rows:
            self._refire_new.append(table)
            self._delta["refire"].append(table)
        return table.num_rows

    # -- watermark advance -------------------------------------------------
    def mature_fixed(self, watermark_ms: int) -> pa.Table | None:
        """Return+remove buffered rows whose window_end <= watermark."""
        buf = _concat(self._fixed)
        self._fixed = []
        if buf is None:
            return None
        import pyarrow.compute as pc

        closed_mask = pc.less_equal(buf["window_end"], pa.scalar(watermark_ms, pa.int64()))
        closed = buf.filter(closed_mask)
        still_open = buf.filter(pc.invert(closed_mask))
        if still_open.num_rows:
            self._fixed = [still_open]
        if closed.num_rows and self.allowed_lateness_ms > 0:
            # retention move: closed rows stay for allowed-lateness
            # refires.  NOT delta'd — they persist in the 'fixed' deltas
            # and restore's mature replay re-moves them here.
            self._retained.append(closed)
        return closed if closed.num_rows else None

    def mature_sessions(self, watermark_ms: int) -> pa.Table | None:
        """Close sessions per (key_lang, key_host) whose last event is
        > gap before the watermark; emit their rows stamped with
        window_start/window_end = [first_ts, last_ts + gap).

        A late row can merge two sessions — safe because ALL rows of a key
        live in this single owner actor until the session closes
        (SURVEY.md §7.4.3).
        """
        if self.allowed_lateness_ms > 0:
            return self._mature_sessions_lateness(watermark_ms)
        buf = _concat(self._session)
        self._session = []
        if buf is None:
            return None
        gap = np.int64(self.session_gap_ms)
        lang = np.asarray(buf["key_lang"], dtype=object)
        host = np.asarray(buf["key_host"], dtype=object)
        ts = buf["ts_ms"].to_numpy()
        kh = buf["key_hash"].to_numpy().astype(np.uint64)
        # numeric (key_hash, ts) sort — object-string lexsorts dominated
        # this actor once buffers grew to 10^5+ rows; a uint64 hash
        # collision between two live keys is repaired by the exact sort
        order = np.lexsort((ts, kh))
        lang_s, host_s, ts_s, kh_s = lang[order], host[order], ts[order], kh[order]
        n = len(ts_s)
        key_change = np.ones(n, dtype=bool)
        key_change[1:] = kh_s[1:] != kh_s[:-1]
        str_change = np.ones(n, dtype=bool)
        str_change[1:] = (lang_s[1:] != lang_s[:-1]) | (host_s[1:] != host_s[:-1])
        if (str_change & ~key_change).any():  # true hash collision
            order = np.lexsort((ts, host, lang))
            lang_s, host_s, ts_s = lang[order], host[order], ts[order]
            key_change[1:] = (lang_s[1:] != lang_s[:-1]) | (host_s[1:] != host_s[:-1])
        if self._gap_expr_fn is not None:
            # fully general extractor: evaluate the compiled formula over
            # the buffered rows (vectorized pa.compute), floor + clamp,
            # then segment with the shared running-cummax kernel
            from ..stages.windows import dynamic_session_segments

            arr = self._gap_expr_fn(buf)
            g = np.asarray(arr.to_numpy(zero_copy_only=False)
                           if hasattr(arr, "to_numpy") else arr,
                           dtype=np.float64)
            gaps = np.maximum(np.floor(g).astype(np.int64), 1)
            new_seg, running = dynamic_session_segments(ts_s, gaps[order], key_change)
        elif self.session_gap_by_lang:
            # per-element gap: resolve each row's gap from its key_lang
            # (few distinct langs — map the uniques, broadcast via inverse)
            from ..stages.windows import dynamic_session_segments

            uniq, inv = np.unique(lang_s.astype(str), return_inverse=True)
            gap_u = np.array([self.session_gap_by_lang.get(u, self.session_gap_ms)
                              for u in uniq.tolist()], dtype=np.int64)
            new_seg, running = dynamic_session_segments(ts_s, gap_u[inv], key_change)
        else:
            new_seg = np.ones(n, dtype=bool)
            new_seg[1:] = key_change[1:] | (ts_s[1:] - ts_s[:-1] > gap)
            running = None
        starts = np.flatnonzero(new_seg)
        ends = np.append(starts[1:], n)
        sizes = ends - starts
        seg_first = ts_s[starts]
        seg_last = ts_s[ends - 1]
        # session end: max(ts + gap) over the segment — for a constant gap
        # that is exactly last_ts + gap (the two paths share one contract)
        seg_end = running[ends - 1] if running is not None else seg_last + gap
        closed_seg = seg_end <= np.int64(watermark_ms)
        if self.session_max_ms > 0:
            closed_seg |= seg_first + np.int64(self.session_max_ms) <= np.int64(watermark_ms)
        if not closed_seg.any():
            self._session = [buf]
            return None
        row_closed = np.repeat(closed_seg, sizes)
        closed = buf.take(pa.array(order[row_closed]))
        # stamp session bounds [first_ts, session_end) per row
        ws = np.repeat(seg_first, sizes)[row_closed]
        we = np.repeat(seg_end, sizes)[row_closed]
        i_ws = closed.schema.get_field_index("window_start")
        i_we = closed.schema.get_field_index("window_end")
        closed = closed.set_column(i_ws, "window_start", pa.array(ws, pa.int64()))
        closed = closed.set_column(i_we, "window_end", pa.array(we, pa.int64()))
        kept = buf.take(pa.array(order[~row_closed]))
        if kept.num_rows:
            self._session = [kept]
        return closed

    def _mature_sessions_lateness(self, watermark_ms: int) -> pa.Table | None:
        """Unified session close / retention / refire sweep under allowed
        lateness (Flink: session windows MERGE on late elements).  Constant
        gap only — dynamic per-element gaps are refused at config time.

        The whole session state (open rows, retained fired rows with their
        per-row ``_fired`` counter, and this epoch's late-admitted rows) is
        re-segmented per key every sweep; then per segment:

        - admission (pass 0, Flink ``isWindowLate`` on the MERGED window):
          a late-new row whose segment's retention already expired
          (``seg_end + allowed <= wm``) is dropped and counted; survivors
          re-segment without it;
        - a CLOSED segment (``end <= wm`` or past the ``session_max_ms``
          cap) containing ≥1 never-fired row emits: on the MAIN stream if
          no row fired before (first fire — may include admitted-late
          rows), else on the REFIRE channel with ``refire_seq =
          max(_fired)`` (a late row bridging two fired sessions re-fires
          ONE merged session);
        - eviction: retention expired (``end + allowed <= wm``), or
          cap-forced close of a still-active segment (no retention — a
          late merge across the cap split would re-create the unbounded
          state the cap exists to prevent).

        With ``allowed = 0`` this degenerates exactly to the legacy
        close-and-evict semantics.  The oracle mirrors this spec
        sequentially per key (``oracle_fingerprints``)."""
        W = np.int64(watermark_ms)
        G = np.int64(self.session_gap_ms)
        L = np.int64(self.allowed_lateness_ms)
        C = np.int64(self.session_max_ms)
        n_old = sum(t.num_rows for t in self._session)
        buf = _concat(self._session + self._slate_new)
        self._session = []
        self._slate_new = []
        self._sess_refires = None
        if buf is None:
            return None
        lnew = np.zeros(buf.num_rows, dtype=bool)
        lnew[n_old:] = True

        def segment(buf):
            ts = buf["ts_ms"].to_numpy()
            kh = buf["key_hash"].to_numpy().astype(np.uint64)
            order = np.lexsort((ts, kh))
            n = len(ts)
            key_change = np.ones(n, dtype=bool)
            kh_s = kh[order]
            key_change[1:] = kh_s[1:] != kh_s[:-1]
            lang = np.asarray(buf["key_lang"], dtype=object)
            host = np.asarray(buf["key_host"], dtype=object)
            lang_s, host_s = lang[order], host[order]
            str_change = np.ones(n, dtype=bool)
            str_change[1:] = (lang_s[1:] != lang_s[:-1]) | (host_s[1:] != host_s[:-1])
            if (str_change & ~key_change).any():  # true hash collision
                order = np.lexsort((ts, host, lang))
                lang_s, host_s = lang[order], host[order]
                key_change[1:] = (lang_s[1:] != lang_s[:-1]) | (host_s[1:] != host_s[:-1])
            ts_s = ts[order]
            new_seg = np.ones(n, dtype=bool)
            new_seg[1:] = key_change[1:] | (ts_s[1:] - ts_s[:-1] > G)
            seg_id = np.cumsum(new_seg) - 1
            starts = np.flatnonzero(new_seg)
            ends = np.append(starts[1:], n)
            return order, seg_id, starts, ends, ts_s[starts], ts_s[ends - 1] + G

        order, seg_id, starts, ends, seg_first, seg_end = segment(buf)
        if lnew.any():  # admission pass
            drop = lnew[order] & (seg_end + L <= W)[seg_id]
            if drop.any():
                self._sess_dropped += int(drop.sum())
                keep_idx = order[~drop]
                buf = buf.take(pa.array(keep_idx))
                lnew = lnew[keep_idx]
                if buf.num_rows == 0:
                    return None
                order, seg_id, starts, ends, seg_first, seg_end = segment(buf)

        fired_s = buf["_fired"].to_numpy()[order]
        maxf = np.maximum.reduceat(fired_s, starts)
        has_new = np.minimum.reduceat(fired_s, starts) == 0
        cap_closed = ((seg_first + C <= W) & (seg_end > W)) if C > 0 \
            else np.zeros(len(starts), dtype=bool)
        closed = (seg_end <= W) | cap_closed
        emit = closed & has_new
        emit_main = emit & (maxf == 0)
        emit_ref = emit & (maxf > 0)
        evict = (seg_end + L <= W) | cap_closed
        if not (emit.any() or evict.any()):
            self._session = [buf]
            return None

        sbuf = buf.take(pa.array(order))
        ws_rows = seg_first[seg_id]
        we_rows = seg_end[seg_id]

        def stamped(mask: np.ndarray) -> pa.Table:
            t = sbuf.filter(pa.array(mask))
            i_ws = t.schema.get_field_index("window_start")
            t = t.set_column(i_ws, "window_start", pa.array(ws_rows[mask], pa.int64()))
            i_we = t.schema.get_field_index("window_end")
            return t.set_column(i_we, "window_end", pa.array(we_rows[mask], pa.int64()))

        main = None
        m_main = emit_main[seg_id]
        if m_main.any():
            main = stamped(m_main).drop_columns(["_fired"])
        m_ref = emit_ref[seg_id]
        if m_ref.any():
            ref = stamped(m_ref).drop_columns(["_fired"])
            self._sess_refires = ref.append_column(
                "refire_seq", pa.array(maxf[seg_id][m_ref], pa.int64()))
        new_fired = fired_s.copy()
        m_emit = emit[seg_id]
        new_fired[m_emit] = (maxf[seg_id] + 1)[m_emit]
        m_keep = ~evict[seg_id]
        if m_keep.any():
            kept = sbuf.filter(pa.array(m_keep))
            i_f = kept.schema.get_field_index("_fired")
            kept = kept.set_column(i_f, "_fired",
                                   pa.array(new_fired[m_keep], pa.int64()))
            self._session = [kept]
        return main

    _WIN_ID = ["window_kind", "key_lang", "key_host", "window_start", "window_end"]

    def mature_refires(self, watermark_ms: int):
        """Allowed-lateness sweep (per epoch, after all adds acked):
        evict retained windows past end + allowed, then for every window
        that received admissible late rows this epoch emit its FULL
        updated content stamped with the window's firing counter
        (``refire_seq`` — 1 on the first re-fire; a window that never
        fired on time, because ALL its rows were late, also emits here,
        mirroring Flink's immediate late firing).  Returns
        ``(rows_table | None, n_dropped)`` where n_dropped counts late
        rows whose window was already evicted."""
        import pandas as pd

        allowed = np.int64(self.allowed_lateness_ms)
        wm = np.int64(watermark_ms)
        ret = _concat(self._retained)
        if ret is not None:
            live = ret["window_end"].to_numpy() + allowed > wm
            if not live.all():
                ret = ret.take(pa.array(np.flatnonzero(live)))
            self._retained = [ret] if ret.num_rows else []
            for k in [k for k in self._refire_seq if k[4] + allowed <= wm]:
                del self._refire_seq[k]
        new = _concat(self._refire_new)
        self._refire_new = []
        if new is None:
            return self._merge_sess_refires(None, 0)
        live_new = new["window_end"].to_numpy() + allowed > wm
        n_dropped = int((~live_new).sum())
        if not live_new.all():
            new = new.take(pa.array(np.flatnonzero(live_new)))
        if new.num_rows == 0:
            return self._merge_sess_refires(None, n_dropped)
        # merge the kept late rows into the retained content, then emit
        # the full row set of every refired window
        merged = _concat([t for t in ([ret] if ret is not None and ret.num_rows
                                      else []) + [new]])
        self._retained = [merged]
        new_ids = (new.select(self._WIN_ID).to_pandas()
                   .drop_duplicates().reset_index(drop=True))
        seqs = []
        for t in new_ids.itertuples(index=False):
            k = tuple(t)
            self._refire_seq[k] = self._refire_seq.get(k, 0) + 1
            seqs.append(self._refire_seq[k])
        new_ids["refire_seq"] = np.asarray(seqs, dtype=np.int64)
        mids = merged.select(self._WIN_ID).to_pandas()
        mask = (pd.MultiIndex.from_frame(mids)
                .isin(pd.MultiIndex.from_frame(new_ids[self._WIN_ID])))
        out = merged.take(pa.array(np.flatnonzero(mask)))
        row_seq = (mids[mask].merge(new_ids, on=self._WIN_ID, how="left")
                   ["refire_seq"].to_numpy(np.int64))
        out = out.append_column("refire_seq", pa.array(row_seq, pa.int64()))
        return self._merge_sess_refires(out, n_dropped)

    def _merge_sess_refires(self, out, n_dropped):
        """Fold the session sweep's refire emissions / drop count (stashed
        by ``_mature_sessions_lateness``, which runs just before this call
        in the actor mailbox) into the fixed-window refire return."""
        sr, self._sess_refires = self._sess_refires, None
        sd, self._sess_dropped = self._sess_dropped, 0
        if sr is not None:
            out = sr if out is None else _concat([out, sr])
        return out, int(n_dropped) + sd

    # -- introspection / checkpoint -----------------------------------------
    def buffered_rows(self) -> dict[str, int]:
        return {
            "fixed": sum(t.num_rows for t in self._fixed),
            "session": sum(t.num_rows for t in self._session),
            "retained": sum(t.num_rows for t in self._retained),
        }

    def snapshot(self, snap_dir: str) -> dict[str, list[str]]:
        """Write this epoch's checkpoint.  Normally a DELTA (only rows
        added since the last snapshot); every ``compact_every`` epochs a
        full base is rewritten so restore cost stays bounded."""
        os.makedirs(snap_dir, exist_ok=True)
        self._snaps_since_compact += 1
        compact = self._snaps_since_compact >= self._compact_every
        live = {"fixed": self._fixed, "session": self._session,
                "retained": self._retained, "refire": self._refire_new}
        for name in ("fixed", "session", "retained", "refire"):
            # 'refire' live is empty post-merge, so compaction clears its
            # delta paths (the rows live on in the 'retained' base).
            # 'session' under allowed lateness is ALWAYS a full
            # post-mature base: late merges mutate segment identity and
            # the per-row _fired counters in place, which append-only
            # deltas cannot represent (state stays bounded by the
            # retention horizon + session cap).
            full = compact or (name == "session"
                               and self.allowed_lateness_ms > 0)
            src = live[name] if full else self._delta[name]
            t = _concat(src)
            if full:
                self._snap_paths[name] = []
            if t is not None:
                suffix = "base" if full else "delta"
                p = os.path.join(
                    snap_dir, f"p{self.partition_id:04d}_{name}_{suffix}.parquet"
                )
                pq.write_table(t, p)
                self._snap_paths[name].append(p)
            self._delta[name] = []
        if compact:
            self._snaps_since_compact = 0
        # per-window firing counters: tiny (one row per retained window),
        # rewritten in full every epoch
        if self._refire_seq:
            p = os.path.join(snap_dir, f"p{self.partition_id:04d}_refire_seq.parquet")
            keys = list(self._refire_seq)
            pq.write_table(pa.table({
                "window_kind": pa.array([k[0] for k in keys], pa.string()),
                "key_lang": pa.array([k[1] for k in keys], pa.string()),
                "key_host": pa.array([k[2] for k in keys], pa.string()),
                "window_start": pa.array([int(k[3]) for k in keys], pa.int64()),
                "window_end": pa.array([int(k[4]) for k in keys], pa.int64()),
                "refire_seq": pa.array(list(self._refire_seq.values()), pa.int64()),
            }), p)
            self._snap_paths["refire_seq"] = [p]
        else:
            self._snap_paths["refire_seq"] = []
        return {k: list(v) for k, v in self._snap_paths.items()}

    def restore(self, paths: dict[str, list[str]], watermark_ms: int) -> None:
        """Load all delta/base files, then replay mature() at the
        committed watermark to drop rows whose windows already fired
        (those outputs are in committed fences)."""
        def _load(plist):
            return [pq.read_table(p) for p in plist]

        self._fixed = _load(paths.get("fixed", []))
        self._session = _load(paths.get("session", []))
        # allowed-lateness state: add_retained rows + emitted refire rows
        # both reload as retained content (post-sweep they are identical)
        self._retained = _load(paths.get("retained", [])) \
            + _load(paths.get("refire", []))
        self._refire_new = []
        self._snap_paths = {k: list(paths.get(k, []))
                            for k in ("fixed", "session", "retained",
                                      "refire", "refire_seq")}
        self._delta = {"fixed": [], "session": [], "retained": [], "refire": []}
        self._refire_seq = {}
        for p in paths.get("refire_seq", []):
            t = pq.read_table(p)
            for r in t.to_pylist():
                self._refire_seq[(r["window_kind"], r["key_lang"],
                                  r["key_host"], int(r["window_start"]),
                                  int(r["window_end"]))] = int(r["refire_seq"])
        self._slate_new = []
        self._sess_refires = None
        self._sess_dropped = 0
        self.mature_fixed(watermark_ms)      # discard: already emitted
        # (with allowed lateness the replay re-moves closed rows into
        # retained — exactly once, since mature-moved rows are never
        # delta'd under 'retained')
        if self.allowed_lateness_ms == 0:
            self.mature_sessions(watermark_ms)  # discard: already emitted
        # under allowed lateness the 'session' snapshot is a full
        # POST-mature base (open + retained rows with _fired counters) —
        # authoritative as loaded, no replay needed
        if self.allowed_lateness_ms > 0 and self._retained:
            ret = _concat(self._retained)
            live = (ret["window_end"].to_numpy()
                    + np.int64(self.allowed_lateness_ms)) > np.int64(watermark_ms)
            if not live.all():
                ret = ret.take(pa.array(np.flatnonzero(live)))
            self._retained = [ret] if ret.num_rows else []

    def restore_tables(self, fixed: pa.Table | None, session: pa.Table | None,
                       watermark_ms: int) -> None:
        """Savepoint-rescale restore: receive this partition's re-hashed
        share of the committed state as in-memory tables (no backing
        checkpoint files yet), replay mature() at the committed
        watermark, and keep everything as un-snapshotted DELTA so the
        next snapshot writes this partition's full state."""
        self._fixed = [fixed] if fixed is not None and fixed.num_rows else []
        self._session = [session] if session is not None and session.num_rows else []
        self._snap_paths = {k: [] for k in ("fixed", "session", "retained",
                                            "refire", "refire_seq")}
        self._delta = {"fixed": [], "session": [], "retained": [], "refire": []}
        self._retained = []
        self._refire_new = []
        self._refire_seq = {}
        self.mature_fixed(watermark_ms)
        self.mature_sessions(watermark_ms)
        self._delta = {"fixed": list(self._fixed), "session": list(self._session),
                       "retained": [], "refire": []}


@ray.remote(num_cpus=0.25)
class JoinStateActor:
    """Build side of the stream-stream join: buffers page updates per host
    partition with watermark-driven retention eviction (reference:
    ``save_fingerprints.py:31-35,66-89`` — 5-min buffer per equip_id)."""

    def __init__(self, partition_id: int, retention_ms: int,
                 compact_every: int = 8) -> None:
        self.partition_id = partition_id
        self.retention_ms = retention_ms
        self._buf: list[pa.Table] = []  # columns: key_host, update_ts_ms, change_kind
        self._index = None  # sorted probe index, rebuilt lazily after adds
        self._delta: list[pa.Table] = []
        self._snap_paths: list[str] = []
        self._snaps_since_compact = 0
        self._compact_every = compact_every

    def add(self, table: pa.Table) -> int:
        if table.num_rows:
            self._buf.append(table)
            self._delta.append(table)
            self._index = None
        return table.num_rows

    def _build_index(self):
        """Sorted composite-key probe index with per-kind cumulative counts:
        ALL interval counts of a probe table become two GLOBAL binary
        searches + cumsum diffs (no per-row Python loop — an epoch can
        close 10^5-10^6 windows per partition at scale).

        Composite key = (host_rank << span_bits) + (ts − ts_min): the ts
        offset is bounded by the buffer's time span (≤ retention + epoch
        slack), so span_bits stays ~20 and host_rank keeps 40+ bits —
        unlike packing raw epoch-ms, this cannot overflow for any realistic
        host cardinality (asserted anyway)."""
        if self._index is not None:
            return self._index
        buf = _concat(self._buf)
        if buf is None:
            self._index = ()
            return self._index
        hosts = np.asarray(buf["key_host"], dtype=object)
        ts = buf["update_ts_ms"].to_numpy().astype(np.int64)
        kinds = np.asarray(buf["change_kind"], dtype=object)
        order = np.lexsort((ts, hosts))
        hosts, ts, kinds = hosts[order], ts[order], kinds[order]
        uniq, starts = np.unique(hosts, return_index=True)
        ends = np.append(starts[1:], len(ts))
        ts0 = int(ts.min())
        dt = ts - ts0
        span_max = int(dt.max())
        span_bits = max(span_max, 1).bit_length() + 1
        assert len(uniq) < (1 << (63 - span_bits)), "join index key overflow"
        rank_per_row = np.repeat(np.arange(len(uniq), dtype=np.int64), ends - starts)
        key = (rank_per_row << np.int64(span_bits)) + dt
        cums = {
            k: np.concatenate(([0], np.cumsum(kinds == k)))
            for k in ("modified", "deleted", "redirected")
        }
        self._index = (pd.Index(uniq), key, cums, ts0, span_bits, span_max)
        return self._index

    def probe(self, fps: pa.Table) -> pa.Table:
        """For each fingerprint row, count buffered updates with the same
        key_host and window_start <= update_ts < window_end (the interval
        predicate of ``save_fingerprints.py:148``). Adds
        update_count / update_modified / update_deleted / update_redirected."""
        n = fps.num_rows
        zeros = np.zeros(n, dtype=np.int64)
        counts = {k: zeros.copy() for k in ("update_count", "update_modified", "update_deleted", "update_redirected")}
        idx = self._build_index()
        if idx and n:
            host_index, key, cums, ts0, span_bits, span_max = idx
            f_host = np.asarray(fps["key_host"], dtype=object)
            r = host_index.get_indexer(f_host)  # vectorized C lookup, -1 = absent
            found = np.flatnonzero(r >= 0)
            if len(found):
                rf = r[found].astype(np.int64) << np.int64(span_bits)
                # clip offsets into [0, span_max+1]: out-of-span windows
                # clamp to the host's span boundary (count 0), and the
                # clipped offset always fits under 2^span_bits
                qs = np.clip(fps["window_start"].to_numpy()[found] - ts0, 0, span_max + 1)
                qe = np.clip(fps["window_end"].to_numpy()[found] - ts0, 0, span_max + 1)
                lo = np.searchsorted(key, rf + qs, "left")
                hi = np.searchsorted(key, rf + qe, "left")
                counts["update_count"][found] = hi - lo
                for k in ("modified", "deleted", "redirected"):
                    counts[f"update_{k}"][found] = cums[k][hi] - cums[k][lo]
        out = fps
        for k, v in counts.items():
            out = out.append_column(k, pa.array(v, pa.int64()))
        return out

    def evict(self, watermark_ms: int) -> int:
        """Drop updates older than watermark − retention. Returns evicted count."""
        import pyarrow.compute as pc

        buf = _concat(self._buf)
        self._buf = []
        if buf is None:
            return 0
        cutoff = watermark_ms - self.retention_ms
        keep = buf.filter(pc.greater_equal(buf["update_ts_ms"], pa.scalar(cutoff, pa.int64())))
        evicted = buf.num_rows - keep.num_rows
        if keep.num_rows:
            self._buf = [keep]
        if evicted:
            self._index = None
        return evicted

    def buffered_rows(self) -> int:
        return sum(t.num_rows for t in self._buf)

    def snapshot(self, snap_dir: str) -> dict[str, list[str]]:
        """Delta checkpoint of the build side (see WindowStateActor.snapshot)."""
        os.makedirs(snap_dir, exist_ok=True)
        self._snaps_since_compact += 1
        compact = self._snaps_since_compact >= self._compact_every
        src = self._buf if compact else self._delta
        t = _concat(src)
        if compact:
            self._snap_paths = []
            self._snaps_since_compact = 0
        if t is not None:
            suffix = "base" if compact else "delta"
            p = os.path.join(snap_dir, f"p{self.partition_id:04d}_join_{suffix}.parquet")
            pq.write_table(t, p)
            self._snap_paths.append(p)
        self._delta = []
        return {"join": list(self._snap_paths)}

    def restore(self, paths: dict[str, list[str]], watermark_ms: int) -> None:
        self._buf = [pq.read_table(p) for p in paths.get("join", [])]
        self._snap_paths = list(paths.get("join", []))
        self._delta = []
        self._index = None
        self.evict(watermark_ms)  # drop rows past retention at the cursor

    def restore_table(self, tab: pa.Table | None, watermark_ms: int) -> None:
        """Savepoint-rescale restore (see WindowStateActor.restore_tables):
        in-memory share, evict at the cursor, keep all as delta."""
        self._buf = [tab] if tab is not None and tab.num_rows else []
        self._snap_paths = []
        self._delta = []
        self._index = None
        self.evict(watermark_ms)
        self._delta = list(self._buf)


ALERT_COLS = ["key_lang", "key_host", "window_kind", "window_start",
              "window_end", "dup_cluster_count"]
_ALERT_SEP = "\x1f"


ALERT_SCHEMA = pa.schema([
    ("key_lang", pa.string()), ("key_host", pa.string()),
    ("window_kind", pa.string()), ("window_start", pa.int64()),
    ("window_end", pa.int64()), ("dup_cluster_count", pa.int64()),
])


@ray.remote(num_cpus=0)
class AlertStateActor:
    """Incremental rising-edge alert state (reference:
    ``src/data_input/process_odr.py:1131-1145`` + ``alerts_state.json``,
    ``helpers.py:23-32``): per (key, window_kind) boolean "duplicates
    active" flag; an alert row is emitted ONLY on the False→True
    transition, suppressed while the condition stays active.

    Fed once per epoch with that epoch's closed-window rows; per key,
    windows close in window_start order across epochs (watermark
    monotonicity), and the per-call sort orders them within the epoch —
    so the scan order equals the oracle's global (key, window_start)
    scan.  State is a tiny per-key bool map, snapshotted as JSON
    (num_cpus=0: microseconds of work per epoch).

    With ``cep_pattern`` set the SAME actor also runs the streaming CEP
    scan (``cep_scan``) on the SAME sorted frame and returns the match
    table as ``feed``'s second element — one concat + one sort + one
    actor pool serve both consumers (a separate CEP pool measured
    ~+30-40% headline wall: n extra worker processes plus a duplicate
    full sort of every epoch's closed rows)."""

    def __init__(self, partition_id: int, cep_pattern=None) -> None:
        self.partition_id = partition_id
        self.state: dict[str, bool] = {}
        self.cep_preds = parse_cep_pattern(cep_pattern) if cep_pattern else None
        self.cep_cols = (tuple(sorted({c for c, _, _ in self.cep_preds}))
                         if self.cep_preds else ())
        # key -> list of [window_start, *col values] for the last R-1 windows
        self.cep_state: dict[str, list] = {}

    def feed(self, *tables: pa.Table) -> tuple[pa.Table, pa.Table]:
        """Returns (rising-edge alert rows, CEP match rows) — the second
        table is empty when no pattern is configured."""
        tabs = [t for t in tables if t is not None and t.num_rows]
        if not tabs:
            return ALERT_SCHEMA.empty_table(), CEP_SCHEMA.empty_table()
        df = pa.concat_tables(tabs, promote_options="default").to_pandas()
        # window_end breaks ties for cumulate slices sharing a start;
        # across epochs windows close in end order (watermark
        # monotonicity), and for cumulate (start, end) lexicographic
        # order equals end order, so the scan still matches the oracle's
        # global sort
        df = df.sort_values(["key_lang", "key_host", "window_kind",
                             "window_start", "window_end"],
                            kind="stable").reset_index(drop=True)
        flags = (df["dup_cluster_count"].to_numpy() > 0)
        keys = (df["key_lang"].astype(str) + _ALERT_SEP + df["key_host"].astype(str)
                + _ALERT_SEP + df["window_kind"].astype(str)).to_numpy()
        n = len(df)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        prev_seq = np.concatenate(([False], flags[:-1]))
        # first row of each key takes its stored state as "previous"
        for i in np.flatnonzero(new_key):
            prev_seq[i] = self.state.get(keys[i], False)
        rising = flags & ~prev_seq
        # persist each key's LAST flag
        key_end = np.append(np.flatnonzero(new_key)[1:], n) - 1
        for i in key_end:
            self.state[keys[i]] = bool(flags[i])
        out = df.loc[rising, ALERT_COLS]
        alerts = pa.Table.from_pandas(out, preserve_index=False).cast(ALERT_SCHEMA)
        matches = (cep_scan(self.cep_state, self.cep_preds, self.cep_cols,
                            df, keys)
                   if self.cep_preds else CEP_SCHEMA.empty_table())
        return alerts, matches

    def snapshot(self, snap_dir: str) -> dict[str, str]:
        import json

        os.makedirs(snap_dir, exist_ok=True)
        p = os.path.join(snap_dir, f"p{self.partition_id:04d}_alerts.json")
        with open(p, "w") as f:
            json.dump(self.state, f)
        out = {"alerts": p}
        if self.cep_preds is not None:
            pc = os.path.join(snap_dir, f"p{self.partition_id:04d}_cep.json")
            with open(pc, "w") as f:
                json.dump(self.cep_state, f)
            out["cep"] = pc
        return out

    def restore(self, paths: dict[str, str]) -> None:
        import json

        if "alerts" in paths:
            with open(paths["alerts"]) as f:
                self.state = json.load(f)
        else:
            self.state = {}
        if "cep" in paths:
            with open(paths["cep"]) as f:
                self.cep_state = json.load(f)
        else:
            self.cep_state = {}

    def restore_state(self, state: dict, cep_state: dict | None = None) -> None:
        """Savepoint-rescale restore: this partition's re-hashed share of
        the merged per-key flags and CEP tails (snapshots are full JSON,
        so the next snapshot persists them unchanged)."""
        self.state = dict(state)
        self.cep_state = dict(cep_state or {})


_CEP_OPS = {
    "==": np.equal, "!=": np.not_equal, ">": np.greater,
    ">=": np.greater_equal, "<": np.less, "<=": np.less_equal,
}


# numeric closed-window columns a CEP predicate may reference (these ride
# the finalize→alert feed projection)
CEP_COLS = ("dup_cluster_count", "doc_count", "exact_dup_count",
            "near_dup_count")


def parse_cep_pattern(pattern) -> list[tuple[str, str, int]]:
    """Parse a CEP pattern — a sequence of comparison predicates over
    numeric closed-window columns, e.g. ("==0", "doc_count>=5", ">0") —
    into (column, op, const) triples.  A bare "<op><int>" defaults to
    dup_cluster_count.  Raises ValueError on anything else (config-time
    validation)."""
    import re

    out = []
    for p in pattern:
        m = re.fullmatch(
            r"\s*([a-z_]*)\s*(==|!=|>=|<=|>|<)\s*(-?\d+)\s*", str(p))
        if not m:
            raise ValueError(
                f"cep predicate {p!r} must be [column]<op><int> with op in "
                f"{sorted(_CEP_OPS)}")
        col = m.group(1) or "dup_cluster_count"
        if col not in CEP_COLS:
            raise ValueError(
                f"cep predicate {p!r} references {col!r}; available "
                f"columns: {CEP_COLS}")
        out.append((col, m.group(2), int(m.group(3))))
    if not out:
        raise ValueError("cep_pattern must have at least one predicate")
    return out


CEP_SCHEMA = pa.schema([
    ("key_lang", pa.string()), ("key_host", pa.string()),
    ("window_kind", pa.string()), ("match_start", pa.int64()),
    ("window_start", pa.int64()), ("window_end", pa.int64()),
])


def cep_scan(state: dict, preds: list, cols: tuple,
             df, keys: "np.ndarray") -> pa.Table:
    """Streaming MATCH_RECOGNIZE scan (Flink CEP analog, AFTER MATCH SKIP
    TO NEXT ROW) over one epoch's closed-window rows, ALREADY globally
    sorted by (key_lang, key_host, window_kind, window_start, window_end)
    with ``keys`` the per-row key strings — runs inside
    ``AlertStateActor.feed`` on the same sorted frame the alert scan
    uses.  A match is emitted at every window whose last R strictly-
    consecutive closed windows of its key satisfy the (column, op, const)
    predicates elementwise.  ``state`` (mutated) holds each key's last
    R-1 windows as [window_start, *referenced column values in ``cols``
    order] rows; per key, windows close in (start, end) order across
    epochs (watermark monotonicity), so feeding epoch slices through this
    scan equals the oracle's global scan."""
    R = len(preds)
    vals = {c: df[c].to_numpy().astype(np.int64) for c in cols}
    ws = df["window_start"].to_numpy().astype(np.int64)
    n = len(df)
    gs = np.flatnonzero(np.concatenate(
        ([True], keys[1:] != keys[:-1])))
    ge = np.append(gs[1:], n)
    # per group, prepend the stored tail so the sliding check sees
    # cross-epoch history; tail rows provide lags but never END a
    # match.  aug_pos counts from the group start, so any row with
    # aug_pos >= R-1 has its whole R-window lookback inside its own
    # group — no group-id bookkeeping needed.  (The python loop is
    # O(distinct keys per feed), the same cost class as the alert
    # actor's per-key transitions.)
    width = 1 + len(cols)
    segs_vals: dict[str, list] = {c: [] for c in cols}
    segs_ws, segs_real, segs_orig, segs_pos = [], [], [], []
    for s, e in zip(gs, ge):
        key = keys[s]
        tail = state.get(key, []) if R > 1 else []
        if tail:
            t_arr = np.asarray(tail, dtype=np.int64).reshape(-1, width)
            seg_ws = np.concatenate((t_arr[:, 0], ws[s:e]))
            for ci, c in enumerate(cols):
                segs_vals[c].append(
                    np.concatenate((t_arr[:, 1 + ci], vals[c][s:e])))
            seg_real = np.concatenate(
                (np.zeros(len(tail), dtype=bool),
                 np.ones(e - s, dtype=bool)))
            seg_orig = np.concatenate(
                (np.full(len(tail), -1, dtype=np.int64),
                 np.arange(s, e, dtype=np.int64)))
        else:
            seg_ws = ws[s:e]
            for c in cols:
                segs_vals[c].append(vals[c][s:e])
            seg_real = np.ones(e - s, dtype=bool)
            seg_orig = np.arange(s, e, dtype=np.int64)
        segs_ws.append(seg_ws)
        segs_real.append(seg_real)
        segs_orig.append(seg_orig)
        segs_pos.append(np.arange(len(seg_ws), dtype=np.int64))
        if R > 1:
            # new tail: last R-1 [ws, *cols] rows of (old tail + feed)
            rows = np.column_stack(
                [seg_ws] + [segs_vals[c][-1] for c in cols])
            state[key] = rows[-(R - 1):].tolist()
    aug_vals = {c: np.concatenate(v) for c, v in segs_vals.items()}
    aug_ws = np.concatenate(segs_ws)
    real = np.concatenate(segs_real)
    orig = np.concatenate(segs_orig)
    aug_pos = np.concatenate(segs_pos)
    m = len(aug_ws)
    ok = real & (aug_pos >= R - 1)
    for j, (col, op, c) in enumerate(preds):
        shift = R - 1 - j  # predicate j applies to the row `shift` back
        pj = _CEP_OPS[op](aug_vals[col], c)
        if shift == 0:
            ok &= pj
        else:
            shifted = np.zeros(m, dtype=bool)
            shifted[shift:] = pj[:-shift]
            ok &= shifted
    hits = np.flatnonzero(ok)
    if len(hits) == 0:
        return CEP_SCHEMA.empty_table()
    first = hits - (R - 1)
    out = df.iloc[orig[hits]][
        ["key_lang", "key_host", "window_kind",
         "window_start", "window_end"]].reset_index(drop=True)
    out.insert(3, "match_start", aug_ws[first])
    return pa.Table.from_pandas(out, preserve_index=False).cast(CEP_SCHEMA)


@ray.remote(num_cpus=0)
class DedupStateActor:
    """Cross-epoch exact-dedup state for the STREAMING curation path (the
    batch analog is ``queries.q_clean_corpus``): owns one hash partition
    of the text_hash space; a document survives iff its hash was never
    seen in an earlier committed epoch (first epoch wins) nor earlier
    within its own epoch (min (ts_ms, url) wins — deterministic under any
    route-task arrival order).  State is the sorted uint64 seen-hash
    array; snapshots are per-epoch deltas of newly-seen hashes with
    periodic full-base compaction, exactly like the window/join actors."""

    def __init__(self, partition_id: int, compact_every: int = 8) -> None:
        self.partition_id = partition_id
        self.seen = np.empty(0, dtype=np.uint64)   # sorted
        self._cand: list[pa.Table] = []            # this epoch's candidates
        self._delta: list[np.ndarray] = []         # hashes added since last snapshot
        self._snap_paths: list[str] = []
        self._snaps_since_compact = 0
        self._compact_every = compact_every

    def add_candidates(self, table: pa.Table) -> int:
        if table.num_rows:
            self._cand.append(table)
        return table.num_rows

    def close_epoch(self) -> pa.Table | None:
        """First-seen winners among this epoch's candidates; records their
        hashes.  Crash before the commit fence is safe: actors restart and
        restore from the last COMMITTED snapshot, so a replayed epoch
        recomputes identical survivors."""
        buf = _concat(self._cand)
        self._cand = []
        if buf is None:
            return None
        h = buf["text_hash"].to_numpy().astype(np.uint64)
        ts = buf["ts_ms"].to_numpy()
        url = np.asarray(buf["url"], dtype=object)
        order = np.lexsort((url, ts, h))
        h_s = h[order]
        first = np.ones(len(h_s), dtype=bool)
        first[1:] = h_s[1:] != h_s[:-1]
        win = order[first]
        hw = h[win]
        if len(self.seen):
            pos = np.minimum(np.searchsorted(self.seen, hw), len(self.seen) - 1)
            new_mask = self.seen[pos] != hw
        else:
            new_mask = np.ones(len(hw), dtype=bool)
        win = win[new_mask]
        new_h = hw[new_mask]
        if len(new_h):
            self.seen = np.union1d(self.seen, new_h)
            self._delta.append(new_h)
        if len(win) == 0:
            return None
        # deterministic output order regardless of add arrival order
        out_order = win[np.lexsort((url[win], ts[win]))]
        return buf.take(pa.array(out_order))

    def buffered_rows(self) -> int:
        return int(len(self.seen))

    def snapshot(self, snap_dir: str) -> dict[str, list[str]]:
        os.makedirs(snap_dir, exist_ok=True)
        self._snaps_since_compact += 1
        compact = self._snaps_since_compact >= self._compact_every
        if compact:
            arrs = [self.seen] if len(self.seen) else []
            self._snap_paths = []
            self._snaps_since_compact = 0
        else:
            arrs = self._delta
        h = np.concatenate(arrs) if arrs else None
        if h is not None and len(h):
            suffix = "base" if compact else "delta"
            p = os.path.join(snap_dir, f"p{self.partition_id:04d}_dedup_{suffix}.parquet")
            pq.write_table(pa.table({"h": pa.array(h, pa.uint64())}), p)
            self._snap_paths.append(p)
        self._delta = []
        return {"dedup": list(self._snap_paths)}

    def restore(self, paths: dict[str, list[str]]) -> None:
        arrs = [
            pq.read_table(p)["h"].to_numpy().astype(np.uint64)
            for p in paths.get("dedup", [])
        ]
        self.seen = (
            np.unique(np.concatenate(arrs)) if arrs else np.empty(0, dtype=np.uint64)
        )
        self._snap_paths = list(paths.get("dedup", []))
        self._delta = []

    def restore_hashes(self, h: "np.ndarray") -> None:
        """Savepoint-rescale restore: this partition's re-hashed share of
        the seen set, kept as delta so the next snapshot persists it."""
        self.seen = (np.unique(np.asarray(h, dtype=np.uint64))
                     if len(h) else np.empty(0, dtype=np.uint64))
        self._snap_paths = []
        self._cand = []
        self._delta = [self.seen] if len(self.seen) else []
        self._cand = []


class SortedRunMembership:
    """Bounded-memory membership set for a MONOTONE uint64 key registry
    (registered near-dup bands / seen content hashes): recent keys live in
    one sorted in-memory array; once it exceeds ``mem_cap`` keys it is
    spilled to an on-disk sorted run (raw little-endian uint64, opened as
    ``np.memmap`` — a batched ``searchsorted`` touches O(B·log N) pages,
    never the whole file).  Runs are merged when more than ``max_runs``
    accumulate, so a membership probe scans at most ``max_runs + 1``
    sorted structures.  This bounds actor RSS at ~``mem_cap`` keys however
    large the corpus grows — the 100-TB answer to the round-3 finding
    that the band registry was an unbounded in-memory array (the
    registry is append-only by design: near-dup "seen" state never
    matures or evicts).

    Durability is NOT this class's job: the delta snapshot / restore
    contract of the owning actor persists the keys; spill files are
    working memory and live in a throwaway temp dir.
    """

    def __init__(self, mem_cap: int = 1 << 22, max_runs: int = 6,
                 spill_prefix: str = "ffr_membership_") -> None:
        self._mem = np.empty(0, dtype=np.uint64)  # sorted unique
        self._runs: list[np.memmap] = []
        self._mem_cap = int(mem_cap)
        self._max_runs = int(max_runs)
        self._spill_prefix = spill_prefix
        self._spill_dir: str | None = None
        self._n_spilled = 0

    def __len__(self) -> int:
        return int(len(self._mem) + sum(len(r) for r in self._runs))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership mask for a uint64 key batch."""
        mask = np.zeros(len(keys), dtype=bool)
        for arr in [self._mem] + self._runs:
            if len(arr):
                pos = np.minimum(np.searchsorted(arr, keys), len(arr) - 1)
                mask |= np.asarray(arr[pos]) == keys
        return mask

    def add(self, keys: np.ndarray) -> None:
        """Insert keys (caller need not dedup against the set)."""
        if not len(keys):
            return
        self._mem = np.union1d(self._mem, keys.astype(np.uint64))
        if len(self._mem) > self._mem_cap:
            self._spill()

    def _spill(self) -> None:
        import tempfile

        if self._spill_dir is None:
            self._spill_dir = tempfile.mkdtemp(prefix=self._spill_prefix)
        path = os.path.join(self._spill_dir, f"run{self._n_spilled:06d}.u64")
        self._n_spilled += 1
        self._mem.astype("<u8").tofile(path)
        self._runs.append(np.memmap(path, dtype="<u8", mode="r"))
        self._mem = np.empty(0, dtype=np.uint64)
        if len(self._runs) > self._max_runs:
            # merge all runs into one (sorted inputs; at true scale this
            # would be a streaming k-way merge — the sandbox fits a sort)
            merged = np.unique(np.concatenate([np.asarray(r) for r in self._runs]))
            path = os.path.join(self._spill_dir, f"run{self._n_spilled:06d}.u64")
            self._n_spilled += 1
            merged.astype("<u8").tofile(path)
            old = self._runs
            self._runs = [np.memmap(path, dtype="<u8", mode="r")]
            for r in old:
                fn = r.filename
                del r
                try:
                    os.unlink(fn)
                except OSError:
                    pass

    def values(self) -> np.ndarray:
        """Materialize the full sorted key set (base-compaction snapshots
        only — bounded by the snapshot budget, not the probe path)."""
        arrs = [a for a in [self._mem] + [np.asarray(r) for r in self._runs] if len(a)]
        if not arrs:
            return np.empty(0, dtype=np.uint64)
        return np.unique(np.concatenate(arrs))


@ray.remote(num_cpus=0)
class NearDupStateActor:
    """Cross-epoch NEAR-dup state for the streaming MinHash-LSH path (the
    batch analog is ``queries.q_minhash_lsh_clusters``): owns one hash
    partition of the BAND-KEY space.  Per epoch, candidate (band, doc)
    rows arrive exploded from the per-doc ``bands`` column; ``close_epoch``
    emits a per-row verdict: the row is ``ok`` iff its band was never
    registered by a survivor of an earlier committed epoch AND its doc is
    the (ts_ms, url)-minimal candidate carrying that band this epoch.  A
    doc survives iff ALL its bands are ok (AND-reduced across partitions
    by the ``reduce_neardup`` tasks, which then ``register`` the
    survivors' bands back here).  Semantics are order-independent within
    an epoch (min over the full candidate set, not arrival order), so the
    sweep is deterministic under any route-task interleaving and exact
    under replay.

    Doc identity on the exchange is the NUMERIC pair ``(ts_ms, doc_h)``
    where ``doc_h = text_hash64(url)·φ + ts`` (computed once in
    ``route_neardup``): candidate rows are 24 bytes instead of carrying
    the url string ~n_bands times, and every sort here and in the reduce
    is a numeric lexsort instead of an object-array sort.  The url only
    travels on the one-row-per-doc side table that goes straight to the
    owning reduce task.

    Registered-band state lives in a ``SortedRunMembership`` tier —
    bounded actor RSS with on-disk sorted runs — while snapshots stay
    per-epoch deltas with periodic base compaction, exactly like the
    exact-dedup actor."""

    def __init__(self, partition_id: int, compact_every: int = 8,
                 mem_cap: int = 1 << 22) -> None:
        self.partition_id = partition_id
        self.seen = SortedRunMembership(
            mem_cap=mem_cap, spill_prefix=f"ffr_ndband_p{partition_id:04d}_")
        self._cand: list[pa.Table] = []            # this epoch's (band, ts, doc_h) rows
        self._winners: tuple | None = None         # (band, ts, doc_h) per-band epoch winners
        self._delta: list[np.ndarray] = []         # bands registered since last snapshot
        self._snap_paths: list[str] = []
        self._snaps_since_compact = 0
        self._compact_every = compact_every

    def add_candidates(self, table: pa.Table) -> int:
        if table.num_rows:
            self._cand.append(table)
        return table.num_rows

    def close_epoch(self, n_reducers: int = 1) -> list[pa.Table | None]:
        """Per-DOC verdict AGGREGATES (ts_ms, doc_h, ok_bands, n_bands),
        PRE-SPLIT into ``n_reducers`` doc-hash slices — one row per doc
        per actor instead of one per (band, doc), shrinking the verdict
        exchange ~n_bands-fold.  ``ok_bands`` counts this doc's bands
        here on which it is the (ts, doc_h)-minimal candidate AND the
        band is unregistered; a doc survives iff Σok_bands == Σn_bands
        across all actors (the reduce-side AND).  The per-band winner
        map is RETAINED so ``register_survivors`` can register winning
        bands from just the survivors' (ts, doc_h) keys — the reduce
        never ships band values back.  Candidates cleared.  Crash before
        the commit fence is safe: a replayed epoch recomputes identical
        verdicts from the last COMMITTED seen set."""
        buf = _concat(self._cand)
        self._cand = []
        self._winners = None
        if buf is None:
            return [None] * n_reducers
        band = buf["band"].to_numpy().astype(np.uint64)
        ts = buf["ts_ms"].to_numpy()
        doc_h = buf["doc_h"].to_numpy().astype(np.uint64)
        order = np.lexsort((doc_h, ts, band))
        b_s = band[order]
        newgrp = np.concatenate(([True], b_s[1:] != b_s[:-1]))
        starts = np.flatnonzero(newgrp)
        sizes = np.diff(np.append(starts, len(b_s)))
        gid = np.repeat(np.arange(len(starts)), sizes)  # cumsum-free
        min_ts = ts[order][starts][gid]
        min_doc = doc_h[order][starts][gid]
        ok_sorted = (ts[order] == min_ts) & (doc_h[order] == min_doc)
        ok = np.empty(len(band), dtype=bool)
        ok[order] = ok_sorted
        unseen_sorted = np.ones(len(band), dtype=bool)
        if len(self.seen):
            unseen = ~self.seen.contains(band)
            ok &= unseen
            unseen_sorted = unseen[order]
        # retain per-band winners (unseen bands only — seen ones can
        # never be re-registered) for register_survivors
        w_keep = unseen_sorted[starts]
        self._winners = (b_s[starts][w_keep].copy(),
                         ts[order][starts][w_keep].copy(),
                         doc_h[order][starts][w_keep].copy())
        # per-doc aggregates
        o2 = np.lexsort((doc_h, ts))
        t2, d2 = ts[o2], doc_h[o2]
        new2 = np.concatenate(([True], (t2[1:] != t2[:-1]) | (d2[1:] != d2[:-1])))
        s2 = np.flatnonzero(new2)
        n2 = np.diff(np.append(s2, len(t2)))
        ok_counts = np.add.reduceat(ok[o2].astype(np.int64), s2)
        g_ts, g_doc = t2[s2], d2[s2]
        agg = pa.table({
            "ts_ms": pa.array(g_ts, pa.int64()),
            "doc_h": pa.array(g_doc, pa.uint64()),
            "ok_bands": pa.array(ok_counts, pa.int64()),
            "n_bands": pa.array(n2, pa.int64()),
        })
        # same doc-hash rule as reduce_neardup's partition ownership
        part = (g_doc % np.uint64(n_reducers)).astype(np.int64)
        o3 = np.argsort(part, kind="stable")
        sp = part[o3]
        slices: list[pa.Table | None] = []
        for p in range(n_reducers):
            lo = np.searchsorted(sp, p, "left")
            hi = np.searchsorted(sp, p, "right")
            slices.append(agg.take(pa.array(o3[lo:hi])) if hi > lo else None)
        return slices

    def register_survivors(self, table: pa.Table) -> int:
        """Record the bands whose retained epoch winner is in the given
        survivor (ts_ms, doc_h) set (called by the reduce tasks AFTER the
        cross-partition AND).  A band's winner doc lives in exactly one
        reducer slice, so no band registers twice across the epoch's
        calls; the membership guard keeps replay idempotent.  Winners are
        cleared by the epoch's band snapshot (ordered after every
        register via the reduce-ref barrier)."""
        if self._winners is None or table.num_rows == 0:
            return 0
        wb, wt, wd = self._winners
        if len(wb) == 0:
            return 0
        st = table["ts_ms"].to_numpy()
        sd = table["doc_h"].to_numpy().astype(np.uint64)
        so = np.lexsort((st, sd))
        sd_s, st_s = sd[so], st[so]
        pos = np.searchsorted(sd_s, wd, "left")
        pos_c = np.minimum(pos, len(sd_s) - 1)
        hit = (sd_s[pos_c] == wd) & (st_s[pos_c] == wt)
        # true 64-bit doc_h collisions only: scan the run for matching ts
        maybe = np.flatnonzero((sd_s[pos_c] == wd) & ~hit)
        for j in maybe:
            k = int(pos[j])
            while k < len(sd_s) and sd_s[k] == wd[j]:
                if st_s[k] == wt[j]:
                    hit[j] = True
                    break
                k += 1
        b = np.unique(wb[hit])
        if len(self.seen):
            b = b[~self.seen.contains(b)]
        if len(b):
            self.seen.add(b)
            self._delta.append(b)
        return int(len(b))

    def buffered_rows(self) -> int:
        return int(len(self.seen))

    def snapshot(self, snap_dir: str, *reduce_barrier) -> dict[str, list[str]]:
        """``reduce_barrier`` carries the epoch's reduce-task result refs:
        Ray resolves them before this method runs, and each reduce task
        waits its register acks internally — so execution here certifies
        register-done (register → snapshot), and per-submitter actor FIFO
        orders the NEXT epoch's driver-submitted close_epoch after this
        snapshot, all without a driver-side barrier."""
        os.makedirs(snap_dir, exist_ok=True)
        self._snaps_since_compact += 1
        compact = self._snaps_since_compact >= self._compact_every
        if compact:
            base = self.seen.values()
            arrs = [base] if len(base) else []
            self._snap_paths = []
            self._snaps_since_compact = 0
        else:
            arrs = self._delta
        h = np.concatenate(arrs) if arrs else None
        if h is not None and len(h):
            suffix = "base" if compact else "delta"
            p = os.path.join(snap_dir, f"p{self.partition_id:04d}_neardup_{suffix}.parquet")
            pq.write_table(pa.table({"h": pa.array(h, pa.uint64())}), p)
            self._snap_paths.append(p)
        self._delta = []
        # the epoch's winner map is only needed by register_survivors,
        # every call of which precedes this snapshot (reduce-ref barrier)
        self._winners = None
        return {"neardup": list(self._snap_paths)}

    def restore(self, paths: dict[str, list[str]]) -> None:
        self.seen = SortedRunMembership(
            mem_cap=self.seen._mem_cap,
            spill_prefix=f"ffr_ndband_p{self.partition_id:04d}_")
        for p in paths.get("neardup", []):
            self.seen.add(pq.read_table(p)["h"].to_numpy().astype(np.uint64))
        self._snap_paths = list(paths.get("neardup", []))
        self._delta = []
        self._cand = []
        self._winners = None


@ray.remote
def split_alert_rows(block: pa.Table, n_partitions: int) -> list[pa.Table | None]:
    """Split one finalize partition's alert-input rows by key hash (NOT
    window-salted: rising-edge state is per-key serial)."""
    if block is None or block.num_rows == 0:
        return [None] * n_partitions
    key = (pd.Series(np.asarray(block["key_lang"], dtype=object)) + _ALERT_SEP
           + pd.Series(np.asarray(block["key_host"], dtype=object))).to_numpy(dtype=object)
    h = pd.util.hash_array(key, categorize=False)
    part = (h % np.uint64(n_partitions)).astype(np.int64)
    out: list[pa.Table | None] = []
    for p in range(n_partitions):
        m = part == p
        out.append(block.take(pa.array(np.flatnonzero(m))) if m.any() else None)
    return out


@ray.remote
def route_block(block: pa.Table, part_col: str, handles: list, method: str) -> int:
    """Distributed router: split one Arrow block by its partition column and
    push each slice to its owning actor — no driver funnel."""
    if block.num_rows == 0:
        return 0
    parts = block[part_col].to_numpy()
    order = np.argsort(parts, kind="stable")
    sorted_parts = parts[order]
    bounds = np.flatnonzero(np.concatenate(([True], sorted_parts[1:] != sorted_parts[:-1])))
    bounds = np.append(bounds, len(sorted_parts))
    refs = []
    for i in range(len(bounds) - 1):
        s, e = bounds[i], bounds[i + 1]
        pid = int(sorted_parts[s])
        sub = block.take(pa.array(order[s:e]))
        refs.append(getattr(handles[pid], method).remote(sub.drop_columns([part_col])))
    ray.get(refs)
    return block.num_rows


class StatePool:
    """Driver-side handle bundle for the window + join actor pools."""

    def __init__(self, n_partitions: int, session_gap_ms: int, join_retention_ms: int,
                 compact_every: int = 8, session_max_ms: int = 0,
                 with_dedup: bool = False, with_neardup: bool = False,
                 cep_pattern=None, session_gap_by_lang: dict | None = None,
                 allowed_lateness_ms: int = 0,
                 session_gap_expr: str | None = None) -> None:
        self.n = n_partitions
        # adaptive reservation: never let the 2·n state actors claim more
        # than ~40% of the cluster's scheduling budget, or map/finalize
        # tasks starve (2·n·0.25 == num_cpus deadlocks outright)
        cpus = float(ray.cluster_resources().get("CPU", 8))
        per_actor = round(min(0.25, 0.4 * cpus / max(1, 2 * n_partitions)), 3)
        self.window_actors = [
            WindowStateActor.options(num_cpus=per_actor).remote(
                i, session_gap_ms, compact_every, session_max_ms,
                session_gap_by_lang, allowed_lateness_ms, session_gap_expr)
            for i in range(n_partitions)
        ]
        self.join_actors = [
            JoinStateActor.options(num_cpus=per_actor).remote(
                i, join_retention_ms, compact_every)
            for i in range(n_partitions)
        ]
        # the alert pool also runs the streaming-CEP scan when a pattern
        # is configured (one sorted pass and one set of processes serve
        # both — a separate CEP pool measured ~+30-40% headline wall)
        self.alert_actors = [
            AlertStateActor.remote(i, cep_pattern) for i in range(n_partitions)
        ]
        # Optional state pools spawn ONLY when their feature is on: every
        # actor is a whole Python worker process, and 2n idle processes
        # measurably slow the default pipeline on a saturated node
        # (measured ~+30% headline wall when they were unconditional).
        # curation dedup state (num_cpus=0, like alerts: microseconds of
        # work per epoch — does not count against the ~40% actor budget)
        self.dedup_actors = [
            DedupStateActor.remote(i, compact_every) for i in range(n_partitions)
        ] if with_dedup else []
        # near-dup band state (num_cpus=0 for the same reason)
        self.neardup_actors = [
            NearDupStateActor.remote(i, compact_every) for i in range(n_partitions)
        ] if with_neardup else []

    def ready(self) -> None:
        """Block until every state actor process is constructed.  Actor
        spawn is async — without this, the spawn storm (up to 3·n worker
        processes) lands inside the first epoch's transform and inflates
        it; callers that measure steady-state throughput wait here first."""
        ray.get([
            a.__ray_ready__.remote()
            for a in (self.window_actors + self.join_actors + self.alert_actors
                      + self.dedup_actors + self.neardup_actors)
        ])

    def feed_alerts_and_cep(self, alert_refs: list) -> tuple[list, list]:
        """Route finalize partitions' closed-window rows to the per-key
        alert actors; ONE feed per actor per epoch (transition order must
        be the in-feed sort, not RPC arrival order).  Each feed returns
        BOTH the emitted alert table and the CEP match table (empty when
        no pattern is configured) from one sorted pass — returned here as
        (alert_feed_refs, cep_feed_refs) via num_returns=2."""
        parted = [
            split_alert_rows.options(num_returns=self.n).remote(r, self.n)
            for r in alert_refs
        ]
        pairs = [
            self.alert_actors[p].feed.options(num_returns=2).remote(
                *[row[p] for row in parted])
            for p in range(self.n)
        ]
        return [a for a, _ in pairs], [c for _, c in pairs]

    def snapshot_alerts(self, snap_dir: str) -> dict[str, dict[str, str]]:
        a = ray.get([x.snapshot.remote(os.path.join(snap_dir, "alerts")) for x in self.alert_actors])
        return {f"alerts_{i}": p for i, p in enumerate(a)}

    def mature(self, watermark_ms: int) -> list[pa.Table]:
        refs = [a.mature_fixed.remote(watermark_ms) for a in self.window_actors]
        refs += [a.mature_sessions.remote(watermark_ms) for a in self.window_actors]
        return [t for t in ray.get(refs) if t is not None and t.num_rows]

    def mature_refs(self, watermark_ms: int) -> list:
        """Like ``mature`` but returns the raw object refs (possibly
        None-valued) so matured blocks flow straight into downstream tasks
        without a driver round-trip."""
        refs = [a.mature_fixed.remote(watermark_ms) for a in self.window_actors]
        refs += [a.mature_sessions.remote(watermark_ms) for a in self.window_actors]
        return refs

    def mature_refire_refs(self, watermark_ms: int) -> list:
        """Allowed-lateness refire sweep refs — one (table | None,
        n_dropped) per window actor, consumed by finalize_refires tasks.
        MUST be submitted after mature_refs (mailbox: the fixed close of
        this watermark moves content into retention first)."""
        return [a.mature_refires.remote(watermark_ms) for a in self.window_actors]

    def evict_join(self, watermark_ms: int) -> int:
        return sum(ray.get([a.evict.remote(watermark_ms) for a in self.join_actors]))

    def buffered(self) -> dict[str, int]:
        w = ray.get([a.buffered_rows.remote() for a in self.window_actors])
        j = ray.get([a.buffered_rows.remote() for a in self.join_actors])
        return {
            "fixed": sum(x["fixed"] for x in w),
            "session": sum(x["session"] for x in w),
            "join": sum(j),
        }

    def snapshot_windows(self, snap_dir: str) -> dict[str, dict[str, str]]:
        w = ray.get(self.snapshot_windows_refs(snap_dir))
        return {f"window_{i}": p for i, p in enumerate(w)}

    def snapshot_windows_refs(self, snap_dir: str) -> list:
        """Async variant: submit the per-actor snapshot tasks and return
        their refs — the driver overlaps them with the finalize tasks and
        resolves them before the manifest commit (snapshot-then-commit is
        preserved; only the WAIT moves)."""
        return [a.snapshot.remote(os.path.join(snap_dir, "window")) for a in self.window_actors]

    def snapshot_join(self, snap_dir: str) -> dict[str, dict[str, str]]:
        j = ray.get(self.snapshot_join_refs(snap_dir))
        return {f"join_{i}": p for i, p in enumerate(j)}

    def snapshot_join_refs(self, snap_dir: str) -> list:
        return [a.snapshot.remote(os.path.join(snap_dir, "join")) for a in self.join_actors]

    def snapshot_alerts_refs(self, snap_dir: str) -> list:
        return [x.snapshot.remote(os.path.join(snap_dir, "alerts")) for x in self.alert_actors]

    def close_dedup_refs(self) -> list:
        return [a.close_epoch.remote() for a in self.dedup_actors]

    def snapshot_dedup_refs(self, snap_dir: str) -> list:
        return [a.snapshot.remote(os.path.join(snap_dir, "dedup")) for a in self.dedup_actors]

    def close_neardup_refs(self, n_reducers: int) -> list[list]:
        """One row per actor of ``n_reducers`` verdict-slice refs (actor
        method with num_returns): reducer p fetches column p only, so
        every verdict row crosses the object store exactly once."""
        return [
            list(a.close_epoch.options(num_returns=n_reducers).remote(n_reducers))
            for a in self.neardup_actors
        ]

    def snapshot_neardup_refs(self, snap_dir: str, *reduce_barrier) -> list:
        """Band snapshots, gated on the epoch's reduce refs (register →
        snapshot without a driver barrier — see NearDupStateActor.snapshot)."""
        return [
            a.snapshot.remote(os.path.join(snap_dir, "neardup"), *reduce_barrier)
            for a in self.neardup_actors
        ]

    def evict_join_refs(self, watermark_ms: int) -> list:
        return [a.evict.remote(watermark_ms) for a in self.join_actors]

    def buffered_refs(self) -> tuple[list, list, list, list]:
        w = [a.buffered_rows.remote() for a in self.window_actors]
        j = [a.buffered_rows.remote() for a in self.join_actors]
        # dedup / near-dup state grows monotonically with the corpus — the
        # gauge the 100-TB design point watches (seen-hash / seen-band rows)
        d = [a.buffered_rows.remote() for a in self.dedup_actors]
        nd = [a.buffered_rows.remote() for a in self.neardup_actors]
        return w, j, d, nd

    def snapshot(self, snap_dir: str) -> dict[str, dict[str, str]]:
        return {**self.snapshot_windows(snap_dir), **self.snapshot_join(snap_dir)}

    def restore(self, snap: dict[str, dict[str, list[str]]], watermark_ms: int) -> None:
        refs = []
        for i, a in enumerate(self.window_actors):
            refs.append(a.restore.remote(snap.get(f"window_{i}", {}), watermark_ms))
        for i, a in enumerate(self.join_actors):
            refs.append(a.restore.remote(snap.get(f"join_{i}", {}), watermark_ms))
        for i, a in enumerate(self.alert_actors):
            refs.append(a.restore.remote(snap.get(f"alerts_{i}", {})))
        for i, a in enumerate(self.dedup_actors):
            refs.append(a.restore.remote(snap.get(f"dedup_{i}", {})))
        for i, a in enumerate(self.neardup_actors):
            refs.append(a.restore.remote(snap.get(f"neardup_{i}", {})))
        ray.get(refs)

    def rescale_restore(self, snap: dict, watermark_ms: int, old_n: int) -> None:
        """Savepoint-style RESCALE restore (Flink savepoint-rescaling
        analog): the checkpoint was written by ``old_n`` state partitions,
        this pool has ``self.n`` — read every partition's committed
        state, re-split each row by the SAME ownership hash the routing
        uses at the new partition count, and hand each actor its share
        as in-memory tables (the next snapshot persists the re-hashed
        layout, so a later resume is a plain restore).

        Supported for window / join / alert / CEP / exact-dedup state;
        the caller refuses near-dup rescale (its band registry spills to
        per-partition sorted runs on disk).  v1 funnels the open state
        through the driver once at rescale time — open state is
        watermark-bounded (not corpus-sized); at cluster scale this
        becomes a task-parallel exchange with the same split rules."""
        from ..functions import fingerprint as fp
        from ..pipelines.streaming import window_salt_hash  # runtime import: no cycle at module load

        def _read_concat(paths: list[str]) -> pa.Table | None:
            tabs = [pq.read_table(p) for p in paths]
            tabs = [t for t in tabs if t.num_rows]
            return (pa.concat_tables(tabs, promote_options="default").combine_chunks()
                    if tabs else None)

        def _split(tab: pa.Table | None, part: "np.ndarray | None") -> list:
            if tab is None:
                return [None] * self.n
            return [
                tab.take(pa.array(np.flatnonzero(part == p)))
                for p in range(self.n)
            ]

        refs = []
        # windows: fixed rows re-salt by (key_hash, window_start); session
        # rows re-own by key_hash — identical to route_and_split
        fixed = _read_concat([
            p for i in range(old_n)
            for p in snap.get(f"window_{i}", {}).get("fixed", [])])
        sess = _read_concat([
            p for i in range(old_n)
            for p in snap.get(f"window_{i}", {}).get("session", [])])
        f_part = None
        if fixed is not None:
            f_part = (window_salt_hash(
                fixed["key_hash"].to_numpy(),
                fixed["window_start"].to_numpy()) % np.uint64(self.n)).astype(np.int64)
        s_part = None
        if sess is not None:
            s_part = (sess["key_hash"].to_numpy().astype(np.uint64)
                      % np.uint64(self.n)).astype(np.int64)
        for p, (fx, ss) in enumerate(zip(_split(fixed, f_part), _split(sess, s_part))):
            refs.append(self.window_actors[p].restore_tables.remote(fx, ss, watermark_ms))
        # join build side: owned by host hash (feed_updates' rule)
        join = _read_concat([
            p for i in range(old_n)
            for p in snap.get(f"join_{i}", {}).get("join", [])])
        j_part = None
        if join is not None:
            j_part = (fp.text_hash64(join["key_host"].combine_chunks())
                      % np.uint64(self.n)).astype(np.int64)
        for p, jt in enumerate(_split(join, j_part)):
            refs.append(self.join_actors[p].restore_table.remote(jt, watermark_ms))
        # alert flag + CEP tail per-key JSON state (both live in the alert
        # pool's snapshot): owned by hash of lang\x1fhost
        # (split_alert_rows' rule; the stored key appends \x1fkind)
        def _shares(name: str) -> list[dict]:
            merged: dict = {}
            for i in range(old_n):
                pth = snap.get(f"alerts_{i}", {}).get(name)
                if pth:
                    import json

                    with open(pth) as f:
                        merged.update(json.load(f))
            shares: list[dict] = [{} for _ in range(self.n)]
            if merged:
                ks = list(merged)
                prefix = np.array([k.rsplit(_ALERT_SEP, 1)[0] for k in ks],
                                  dtype=object)
                part = (pd.util.hash_array(prefix, categorize=False)
                        % np.uint64(self.n)).astype(np.int64)
                for k, p in zip(ks, part):
                    shares[int(p)][k] = merged[k]
            return shares

        flag_shares, cep_shares = _shares("alerts"), _shares("cep")
        for p, a in enumerate(self.alert_actors):
            refs.append(a.restore_state.remote(flag_shares[p], cep_shares[p]))
        # exact-dedup seen set: owned by text_hash
        if self.dedup_actors:
            arrs = [
                pq.read_table(p)["h"].to_numpy().astype(np.uint64)
                for i in range(old_n)
                for p in snap.get(f"dedup_{i}", {}).get("dedup", [])
            ]
            h = np.concatenate(arrs) if arrs else np.empty(0, dtype=np.uint64)
            d_part = (h % np.uint64(self.n)).astype(np.int64)
            for p, a in enumerate(self.dedup_actors):
                refs.append(a.restore_hashes.remote(h[d_part == p]))
        ray.get(refs)

    def shutdown(self) -> None:
        for a in (self.window_actors + self.join_actors + self.alert_actors
                  + self.dedup_actors + self.neardup_actors):
            ray.kill(a)
        self.window_actors = []
        self.join_actors = []
        self.alert_actors = []
        self.dedup_actors = []
        self.neardup_actors = []
