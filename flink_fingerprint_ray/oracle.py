"""Single-process oracle of the engine's streaming semantics (SURVEY.md §5).

The reference ships no tests; correctness is anchored by this independent,
sequential implementation of the SAME event-time contract documented in
``pipelines/streaming.py``:

- epoch slices by arrival position (``fixtures.write_epochs`` bounds);
- watermark_e = max(watermark_{e-1}, max(warc_ts in epoch) − lateness);
- late iff warc_ts < watermark at epoch start → dropped;
- empty extracted text dropped (``src/flink_job/job.py:68`` analog);
- tumbling/sliding windows ``[s, e)`` close in the first epoch whose
  watermark ≥ e; sessions close when last_ts + gap ≤ watermark;
- join: per-epoch update feed → probe at window close → retention evict.

In-window math (stats pinned-order reductions, dup-cluster union-find) is
shared with the engine via ``stages.windows`` — the oracle independently
exercises the DISTRIBUTED machinery: epoch/watermark bookkeeping, state
routing, cross-epoch buffering, join state, and the exactly-once sink.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .functions import fingerprint as fp
from .stages.windows import (
    compute_stats,
    dup_cluster_counts,
    fingerprint_id,
    sliding_window_starts,
    tumbling_window_start,
)

N_BANDS = 16


def _epoch_bounds(n_rows: int, n_epochs: int) -> np.ndarray:
    return np.linspace(0, n_rows, n_epochs + 1).astype(int)


def _finalize(kind: str, key: tuple[str, str], start: int, end: int, rows: pd.DataFrame, updates_probe) -> dict:
    band_cols = [f"band_{b}" for b in range(N_BANDS)]
    mh_cols = [c for c in rows.columns if c.startswith("mh_")]
    exact, near, clusters = dup_cluster_counts(
        rows["text_hash"].to_numpy(dtype=np.uint64),
        rows[band_cols].to_numpy(dtype=np.uint64),
        rows[mh_cols].to_numpy(dtype=np.uint32),
    )
    stats = compute_stats(rows["text_len"].to_numpy())
    rec = {
        "fingerprint_id": fingerprint_id(key[0], key[1], kind, start, end),
        "key_lang": key[0],
        "key_host": key[1],
        "window_kind": kind,
        "window_start": start,
        "window_end": end,
        "doc_count": int(len(rows)),
        "exact_dup_count": exact,
        "near_dup_count": near,
        "dup_cluster_count": clusters,
        "min_len": stats["min"],
        "max_len": stats["max"],
        "median_len": stats["median"],
        "mean_len": stats["mean"],
        "std_len": stats["std_dev"],
    }
    rec.update(updates_probe(key[1], start, end))
    return rec


def oracle_fingerprints(
    pages: pa.Table,
    n_epochs: int,
    updates: pa.Table | None = None,
    tumbling_size_ms: int = 60_000,
    sliding: tuple[int, int] | None = None,
    cumulate: tuple[int, int] | None = None,
    session_gap_ms: int = 0,
    lateness_ms: int = 10_000,
    join_retention_ms: int = 300_000,
    session_max_ms: int | None = None,
    extractor: str = "strict",
    blocklist: pa.Table | None = None,
    session_gap_by_lang: dict | None = None,
    allowed_lateness_ms: int = 0,
    return_refires: bool = False,
    session_gap_expr: str | None = None,
) -> pd.DataFrame:
    """Expected engine output (F3 schema + update counts) for `pages`
    split into `n_epochs` arrival epochs.

    With ``allowed_lateness_ms`` > 0 (Flink allowedLateness, FIXED
    windows only): rows up to that far behind the watermark are admitted
    — a late row whose window is still open joins its first fire; one
    whose window already fired RE-FIRES the window as an updated full
    aggregate on the refire channel.  ``return_refires=True`` returns
    ``(main_df, refires_df)`` where refires carries F3 columns +
    refire_seq (1-based firing counter per window)."""
    if session_gap_by_lang and allowed_lateness_ms:
        raise ValueError("allowed_lateness_ms with session_gap_by_lang is "
                         "not supported (mirrors PipelineConfig)")
    if session_gap_expr and (session_gap_by_lang or allowed_lateness_ms):
        raise ValueError("session_gap_expr excludes session_gap_by_lang / "
                         "allowed_lateness_ms (mirrors PipelineConfig)")
    if session_max_ms is None:
        # mirror PipelineConfig.__post_init__'s AUTO rule exactly
        gap_cap = max([session_gap_ms, *(session_gap_by_lang or {}).values()])
        session_max_ms = 20 * gap_cap if session_gap_ms else 0
    # per-doc fingerprints (shared deterministic kernels)
    if extractor == "general":
        from .functions.html import extract_text_general

        text = extract_text_general(pages["html"])
    else:
        text = fp.extract_text(pages["html"])
    ts_all = pages["warc_ts"].cast(pa.int64()).to_numpy()
    host_all = np.asarray(fp.host_of(pages["url"]), dtype=object)
    lang_all = np.asarray(pages["lang"], dtype=object)
    text_np = np.asarray(text, dtype=object)
    import pyarrow.compute as pc

    text_len_all = pc.utf8_length(text).cast(pa.int64()).to_numpy()
    th_all = fp.text_hash64(text)
    mh_all = fp.minhash(text)
    bands_all = fp.minhash_band_keys(mh_all, N_BANDS)

    df = pd.DataFrame(
        {
            "ts_ms": ts_all,
            "key_lang": lang_all,
            "key_host": host_all,
            "text_len": text_len_all,
            "text_hash": th_all,
            "_empty": np.array([t == "" for t in text_np]),
        }
    )
    for b in range(N_BANDS):
        df[f"band_{b}"] = bands_all[:, b]
    for i in range(mh_all.shape[1]):
        df[f"mh_{i}"] = mh_all[:, i]

    gap_row = None
    if session_gap_expr:
        # general extractor: same compiled-formula surface as the engine,
        # evaluated once over the numeric narrow-row columns
        from .functions.exprs import compile_expr

        arr = compile_expr(session_gap_expr)(pa.table({
            "ts_ms": pa.array(ts_all, pa.int64()),
            "text_len": pa.array(text_len_all, pa.int64()),
            "text_hash": pa.array(th_all),
        }))
        gap_row = np.maximum(np.floor(np.asarray(
            arr.to_numpy(zero_copy_only=False))).astype(np.int64), 1)

    bounds = _epoch_bounds(pages.num_rows, n_epochs)
    upd_df = None
    upd_bounds = None
    if updates is not None:
        upd_df = pd.DataFrame(
            {
                "key_host": np.asarray(fp.host_of(updates["url"]), dtype=object),
                "update_ts_ms": updates["update_ts"].cast(pa.int64()).to_numpy(),
                "change_kind": np.asarray(updates["change_kind"], dtype=object),
            }
        )
        upd_bounds = _epoch_bounds(len(upd_df), n_epochs)

    bl_hosts_all = None
    bl_bounds = None
    if blocklist is not None:
        bl_hosts_all = np.asarray(blocklist["host"], dtype=object)
        bl_bounds = _epoch_bounds(len(bl_hosts_all), n_epochs)
    bl_set: set = set()

    wm = 0
    fixed_buf: dict[tuple, list[int]] = {}   # (kind,lang,host,start,end) -> row idx
    session_buf: dict[tuple, list[int]] = {}  # (lang,host) -> row idx
    # session allowed-lateness state: (lang,host) -> list of
    # [row_idx, fired_count, late_new_this_epoch] — mirrors the engine's
    # unified sweep (_mature_sessions_lateness) sequentially per key
    sess_state: dict[tuple, list[list]] = {}
    join_buf = pd.DataFrame(columns=["key_host", "update_ts_ms", "change_kind"])
    out: list[dict] = []
    # allowed-lateness state (engine: WindowStateActor retention)
    retained: dict[tuple, list[int]] = {}      # fired window -> content idx
    refire_pending: dict[tuple, list[int]] = {}  # this epoch's late rows
    refire_seq: dict[tuple, int] = {}
    refires: list[dict] = []

    def probe(host: str, s: int, e: int) -> dict:
        res = {"update_count": 0, "update_modified": 0, "update_deleted": 0, "update_redirected": 0}
        if len(join_buf) == 0:
            return res
        m = (join_buf["key_host"] == host) & (join_buf["update_ts_ms"] >= s) & (join_buf["update_ts_ms"] < e)
        if not m.any():
            return res
        res["update_count"] = int(m.sum())
        vc = join_buf.loc[m, "change_kind"].value_counts()
        for k in ("modified", "deleted", "redirected"):
            res[f"update_{k}"] = int(vc.get(k, 0))
        return res

    for e_i in range(n_epochs):
        rows = df.iloc[bounds[e_i]: bounds[e_i + 1]]
        if len(rows) == 0:
            continue
        wm_prev = wm
        wm = max(wm, int(rows["ts_ms"].max()) - lateness_ms)
        # join build side: add this epoch's updates first (engine step 1)
        if upd_df is not None:
            join_buf = pd.concat(
                [join_buf, upd_df.iloc[upd_bounds[e_i]: upd_bounds[e_i + 1]]],
                ignore_index=True,
            )
        admit_floor = wm_prev - allowed_lateness_ms if allowed_lateness_ms else wm_prev
        rows = rows[(rows["ts_ms"] >= admit_floor) & (~rows["_empty"])]
        # broadcast-state blocklist: side epochs STRICTLY BEFORE this one
        # (engine: page_transform blocked_ref, same strictly-before rule)
        if bl_hosts_all is not None:
            if e_i > 0:
                bl_set.update(bl_hosts_all[bl_bounds[e_i - 1]: bl_bounds[e_i]])
            if bl_set:
                rows = rows[~rows["key_host"].isin(bl_set)]

        # buffer fixed windows: a window whose end <= wm_prev already
        # fired, so its rows (necessarily all late) go to the refire
        # path; late rows in still-open windows join the first fire
        for kind, wins in _assign(rows, tumbling_size_ms, sliding, cumulate):
            for (lang, host, s, en), idx in wins.items():
                wkey = (kind, lang, host, s, en)
                if allowed_lateness_ms and en <= wm_prev:
                    refire_pending.setdefault(wkey, []).extend(idx)
                else:
                    fixed_buf.setdefault(wkey, []).extend(idx)
        # buffer sessions — with allowed lateness, late-admitted rows
        # enter the session state too (Flink session windows MERGE on
        # late elements; engine: add_session_late + the unified sweep)
        if session_gap_ms > 0:
            if allowed_lateness_ms:
                for (lang, host), g in rows.groupby(["key_lang", "key_host"], sort=False):
                    st = sess_state.setdefault((lang, host), [])
                    for i, t in zip(g.index.tolist(), g["ts_ms"].tolist()):
                        st.append([i, 0, t < wm_prev])
            else:
                for (lang, host), g in rows.groupby(["key_lang", "key_host"], sort=False):
                    session_buf.setdefault((lang, host), []).extend(g.index.tolist())

        # close fixed windows with end <= wm
        for wkey in [k for k in fixed_buf if k[4] <= wm]:
            kind, lang, host, s, en = wkey
            idx = fixed_buf.pop(wkey)
            g = df.loc[idx]
            out.append(_finalize(kind, (lang, host), s, en, g, probe))
            if allowed_lateness_ms:
                retained[wkey] = list(idx)
        # close sessions
        if session_gap_ms > 0 and not allowed_lateness_ms:
            for skey in list(session_buf):
                # dynamic per-element gap: the gap is a function of the
                # element's key_lang, constant within a (lang, host) key —
                # session end max(ts + gap) therefore reduces to
                # last_ts + gap(lang) here (engine: mature_sessions'
                # dynamic_session_segments path, which also handles
                # arbitrary per-row gaps)
                gap = (session_gap_by_lang.get(skey[0], session_gap_ms)
                       if session_gap_by_lang else session_gap_ms)
                idx = session_buf[skey]
                g = df.loc[idx].sort_values("ts_ms", kind="stable")
                ts = g["ts_ms"].to_numpy()
                running = None
                if gap_row is not None:
                    # general extractor mirror: per-key running cummax of
                    # (ts + gap_i); break where ts exceeds the running end
                    # (engine: dynamic_session_segments)
                    running = np.maximum.accumulate(ts + gap_row[g.index.to_numpy()])
                    brk = np.ones(len(ts), dtype=bool)
                    brk[1:] = ts[1:] > running[:-1]
                    sid = np.cumsum(brk) - 1
                else:
                    sid = np.concatenate(([0], np.cumsum(np.diff(ts) > gap)))
                keep: list[int] = []
                for s_id in np.unique(sid):
                    pos = np.flatnonzero(sid == s_id)
                    sg = g.iloc[pos]
                    first = int(ts[pos[0]])
                    s_end = (int(running[pos[-1]]) if running is not None
                             else int(ts[pos[-1]]) + gap)
                    # session_max_ms: state-bounding force-close (engine:
                    # WindowStateActor.mature_sessions cap)
                    if s_end <= wm or (
                            session_max_ms and first + session_max_ms <= wm):
                        out.append(
                            _finalize("session", skey, first, s_end, sg, probe)
                        )
                    else:
                        keep.extend(sg.index.tolist())
                if keep:
                    session_buf[skey] = keep
                else:
                    del session_buf[skey]
        # session close/retention/refire under allowed lateness — the
        # sequential mirror of the engine's unified sweep
        # (WindowStateActor._mature_sessions_lateness): re-segment ALL
        # session rows of a key (open + retained-fired + this epoch's
        # late-admitted) by the constant gap, then per segment:
        # admission-drop expired late rows, emit closed segments with
        # never-fired content (MAIN if nothing fired before, REFIRE with
        # refire_seq = max(fired) otherwise), evict past retention or on
        # a cap-forced close of a still-active segment.
        if session_gap_ms > 0 and allowed_lateness_ms:
            for skey in list(sess_state):
                entries = sess_state[skey]
                entries.sort(key=lambda en: int(df.at[en[0], "ts_ms"]))
                for _pass in (0, 1):
                    segs: list[list[list]] = []
                    for en in entries:
                        t = int(df.at[en[0], "ts_ms"])
                        if segs and t - int(df.at[segs[-1][-1][0], "ts_ms"]) <= session_gap_ms:
                            segs[-1].append(en)
                        else:
                            segs.append([en])
                    if _pass == 1:
                        break
                    # admission: late-new rows in retention-expired
                    # segments never contribute (engine counts them as
                    # refire_dropped)
                    surv = []
                    dropped = False
                    for seg in segs:
                        end = int(df.at[seg[-1][0], "ts_ms"]) + session_gap_ms
                        if end + allowed_lateness_ms <= wm:
                            keep = [en for en in seg if not en[2]]
                            dropped = dropped or len(keep) < len(seg)
                            surv.extend(keep)
                        else:
                            surv.extend(seg)
                    entries = surv
                    if not dropped:
                        break
                kept: list[list] = []
                for seg in segs:
                    first = int(df.at[seg[0][0], "ts_ms"])
                    end = int(df.at[seg[-1][0], "ts_ms"]) + session_gap_ms
                    cap_closed = bool(session_max_ms
                                      and first + session_max_ms <= wm
                                      and end > wm)
                    closed = end <= wm or cap_closed
                    maxf = max(en[1] for en in seg)
                    has_new = any(en[1] == 0 for en in seg)
                    if closed and has_new:
                        rec = _finalize("session", skey, first, end,
                                        df.loc[[en[0] for en in seg]], probe)
                        if maxf == 0:
                            out.append(rec)
                        else:
                            rec["refire_seq"] = maxf
                            refires.append(rec)
                        for en in seg:
                            en[1] = maxf + 1
                    if not (end + allowed_lateness_ms <= wm or cap_closed):
                        kept.extend(seg)
                for en in kept:
                    en[2] = False
                if kept:
                    sess_state[skey] = kept
                else:
                    del sess_state[skey]
        # allowed-lateness refires (engine: mature_refires — evict first,
        # then each window with admissible late arrivals re-fires its
        # FULL updated aggregate; a late row for an evicted window drops)
        if allowed_lateness_ms:
            for k in [k for k in retained
                      if k[4] + allowed_lateness_ms <= wm]:
                retained.pop(k)
                refire_seq.pop(k, None)
            for wkey in list(refire_pending):
                idx = refire_pending.pop(wkey)
                if wkey[4] + allowed_lateness_ms <= wm:
                    continue  # window evicted — late rows dropped
                content = retained.setdefault(wkey, [])
                content.extend(idx)
                refire_seq[wkey] = refire_seq.get(wkey, 0) + 1
                kind, lang, host, s, en = wkey
                rec = _finalize(kind, (lang, host), s, en,
                                df.loc[content], probe)
                rec["refire_seq"] = refire_seq[wkey]
                refires.append(rec)
        # evict join state past retention (engine step 7)
        if len(join_buf):
            join_buf = join_buf[join_buf["update_ts_ms"] >= wm - join_retention_ms]

    if return_refires:
        return pd.DataFrame(out), pd.DataFrame(refires)
    return pd.DataFrame(out)


def oracle_clean_stream(
    pages: pa.Table,
    n_epochs: int,
    min_chars: int,
    bench_hashes: np.ndarray | None = None,
    lateness_ms: int = 10_000,
) -> pd.DataFrame:
    """Expected STREAMING curation output (url, ts_ms, text_hash): per
    epoch, non-late non-empty rows pass the quality gate (extracted-text
    length >= min_chars) and decontamination (no trigram in
    ``bench_hashes``); across epochs the FIRST epoch containing a
    text_hash wins, and within an epoch the row with min (ts_ms, url).
    Mirrors the engine's DedupStateActor contract bit-for-bit."""
    from .functions.textstats import ngram_set_hashes

    text = fp.extract_text(pages["html"])
    ts_all = pages["warc_ts"].cast(pa.int64()).to_numpy()
    url_all = np.asarray(pages["url"], dtype=object)
    text_np = np.asarray(text, dtype=object)
    import pyarrow.compute as pc

    text_len = pc.utf8_length(text).cast(pa.int64()).to_numpy()
    th_all = fp.text_hash64(text)
    contaminated = np.zeros(pages.num_rows, dtype=bool)
    if bench_hashes is not None and len(bench_hashes):
        bench = np.unique(np.asarray(bench_hashes, dtype=np.uint64))
        hashes, counts = ngram_set_hashes(text, n=3)
        if len(hashes):
            gram_doc = np.repeat(np.arange(pages.num_rows), counts)
            pos = np.minimum(np.searchsorted(bench, hashes), len(bench) - 1)
            contaminated[np.unique(gram_doc[bench[pos] == hashes])] = True

    bounds = _epoch_bounds(pages.num_rows, n_epochs)
    wm = 0
    seen: set[int] = set()
    out: list[tuple] = []
    for e_i in range(n_epochs):
        lo, hi = bounds[e_i], bounds[e_i + 1]
        if hi <= lo:
            continue
        wm_prev = wm
        wm = max(wm, int(ts_all[lo:hi].max()) - lateness_ms)
        idx = np.arange(lo, hi)
        ok = (
            (ts_all[idx] >= wm_prev)
            & (text_len[idx] > 0)
            & (text_len[idx] >= min_chars)
            & ~contaminated[idx]
        )
        cand = idx[ok]
        # within-epoch winner per hash: min (ts_ms, url); first epoch wins
        order = np.lexsort((url_all[cand], ts_all[cand], th_all[cand]))
        c = cand[order]
        first = np.ones(len(c), dtype=bool)
        first[1:] = th_all[c][1:] != th_all[c][:-1]
        for i in c[first]:
            h = int(th_all[i])
            if h not in seen:
                seen.add(h)
                out.append((str(url_all[i]), int(ts_all[i]), h, e_i))
        _ = text_np  # (text retained for debuggability)
    df = pd.DataFrame(out, columns=["url", "ts_ms", "text_hash", "_epoch"])
    df["ts_ms"] = df["ts_ms"].astype(np.int64)
    df["text_hash"] = df["text_hash"].astype(np.uint64)
    return (
        df.sort_values(["_epoch", "ts_ms", "url"], kind="stable")
        .drop(columns=["_epoch"])
        .reset_index(drop=True)
    )


def oracle_neardup_stream(
    pages: pa.Table,
    n_epochs: int,
    n_bands: int = 16,
    lateness_ms: int = 10_000,
) -> pd.DataFrame:
    """Expected STREAMING near-dup output (url, ts_ms): per epoch, a
    non-late non-empty doc survives iff NONE of its minhash LSH band keys
    was registered by a survivor of an earlier epoch AND it is the
    (ts_ms, url)-minimal candidate carrying EVERY one of its bands this
    epoch (min over the full epoch candidate set — order-independent).
    Survivors register all their bands.  Mirrors the engine's
    NearDupStateActor + reduce_neardup contract bit-for-bit."""
    text = fp.extract_text(pages["html"])
    ts_all = pages["warc_ts"].cast(pa.int64()).to_numpy()
    url_all = np.asarray(pages["url"], dtype=object)
    import pyarrow.compute as pc

    text_len = pc.utf8_length(text).cast(pa.int64()).to_numpy()
    _, mh = fp.simhash_and_minhash(text)
    band_mat = fp.minhash_band_keys(mh, n_bands)

    # Doc identity IS the numeric (ts_ms, doc_h) pair, exactly as on the
    # engine's exchange (route_neardup computes doc_h =
    # text_hash64(url)·φ + ts): the reduce AND-groups all verdict rows of
    # a key together, so distinct input rows sharing the pair merge into
    # ONE logical doc whose band set is the union and whose reported url
    # is the MINIMAL one.
    with np.errstate(over="ignore"):
        doc_h_all = (fp.text_hash64(pages["url"])
                     * np.uint64(0x9E3779B97F4A7C15)
                     + ts_all.astype(np.uint64))

    bounds = _epoch_bounds(pages.num_rows, n_epochs)
    wm = 0
    seen: set[int] = set()
    out: list[tuple] = []
    for e_i in range(n_epochs):
        lo, hi = bounds[e_i], bounds[e_i + 1]
        if hi <= lo:
            continue
        wm_prev = wm
        wm = max(wm, int(ts_all[lo:hi].max()) - lateness_ms)
        idx = np.arange(lo, hi)
        cand = idx[(ts_all[idx] >= wm_prev) & (text_len[idx] > 0)]
        merged: dict[tuple, set] = {}
        key_url: dict[tuple, str] = {}
        for i in cand:
            key = (int(ts_all[i]), int(doc_h_all[i]))
            merged.setdefault(key, set()).update(int(b) for b in band_mat[i])
            u = str(url_all[i])
            if key not in key_url or u < key_url[key]:
                key_url[key] = u
        # per band: the (ts_ms, doc_h)-minimal merged doc carrying it
        band_min: dict[int, tuple] = {}
        for key, bands in merged.items():
            for b in bands:
                if b not in band_min or key < band_min[b]:
                    band_min[b] = key
        # phase 1: verdicts against the COMMITTED seen set + the epoch-min
        # rule only (matches NearDupStateActor.close_epoch); phase 2:
        # registration (matches reduce_neardup → register)
        survivors = [key for key, bands in merged.items()
                     if all(b not in seen and band_min[b] == key
                            for b in bands)]
        for key in survivors:
            seen.update(merged[key])
            out.append((key_url[key], key[0], e_i))
    df = pd.DataFrame(out, columns=["url", "ts_ms", "_epoch"])
    df["ts_ms"] = df["ts_ms"].astype(np.int64)
    return (
        df.sort_values(["_epoch", "ts_ms", "url"], kind="stable")
        .drop(columns=["_epoch"])
        .reset_index(drop=True)
    )


def oracle_media_stream(
    pages: pa.Table,
    n_epochs: int,
    lateness_ms: int = 10_000,
) -> pd.DataFrame:
    """Expected media side-channel output (url, ts_ms, media_mean,
    media_std): per epoch, non-late non-empty-text rows whose ``media``
    payload is present decode via the same signature-sniffing dispatch
    (netpbm / JPEG / PNG) and identical numpy ops as the engine's
    PageMediaStage, so float equality is exact."""
    from .stages.media import decode_any_image

    text = fp.extract_text(pages["html"])
    ts_all = pages["warc_ts"].cast(pa.int64()).to_numpy()
    url_all = np.asarray(pages["url"], dtype=object)
    import pyarrow.compute as pc

    nonempty = pc.not_equal(text, "").to_numpy(zero_copy_only=False)
    media = pages["media"].combine_chunks()
    valid = media.is_valid().to_numpy(zero_copy_only=False)
    bounds = _epoch_bounds(pages.num_rows, n_epochs)
    wm = 0
    out: list[tuple] = []
    for e_i in range(n_epochs):
        lo, hi = bounds[e_i], bounds[e_i + 1]
        if hi <= lo:
            continue
        wm_prev = wm
        wm = max(wm, int(ts_all[lo:hi].max()) - lateness_ms)
        for i in range(lo, hi):
            if ts_all[i] >= wm_prev and nonempty[i] and valid[i]:
                img = decode_any_image(media[i].as_py())
                out.append((str(url_all[i]), int(ts_all[i]),
                            float(img.mean()), float(img.std())))
    df = pd.DataFrame(out, columns=["url", "ts_ms", "media_mean", "media_std"])
    df["ts_ms"] = df["ts_ms"].astype(np.int64)
    return df.reset_index(drop=True)


def oracle_late_rows(
    pages: pa.Table,
    n_epochs: int,
    lateness_ms: int = 10_000,
    allowed_lateness_ms: int = 0,
) -> pd.DataFrame:
    """Expected dead-letter side output (url, ts_ms): exactly the rows
    that arrive behind the watermark at their epoch's START —
    watermark_e = max(watermark_{e-1}, max(warc_ts in epoch) − lateness),
    late iff warc_ts < watermark before this epoch's advance.  With
    allowed lateness, rows inside the allowance are ADMITTED (window
    refires), so only rows beyond it reach the DLQ."""
    ts_all = pages["warc_ts"].cast(pa.int64()).to_numpy()
    url_all = np.asarray(pages["url"], dtype=object)
    bounds = _epoch_bounds(pages.num_rows, n_epochs)
    wm = 0
    out: list[tuple] = []
    for e_i in range(n_epochs):
        lo, hi = bounds[e_i], bounds[e_i + 1]
        if hi <= lo:
            continue
        wm_prev = wm
        wm = max(wm, int(ts_all[lo:hi].max()) - lateness_ms)
        for i in range(lo, hi):
            if ts_all[i] < wm_prev - allowed_lateness_ms:
                out.append((str(url_all[i]), int(ts_all[i])))
    df = pd.DataFrame(out, columns=["url", "ts_ms"])
    df["ts_ms"] = df["ts_ms"].astype(np.int64)
    return df.reset_index(drop=True)


def oracle_alerts(fingerprints: pd.DataFrame) -> pd.DataFrame:
    """Expected rising-edge alert rows from an oracle fingerprint table:
    per (key_lang, key_host, window_kind) in window_start order, emit the
    windows where dup_cluster_count > 0 transitions False→True
    (reference: ``process_odr.py:1131-1145``).  Valid because per key a
    window closes in window_start order (watermark monotonicity)."""
    if len(fingerprints) == 0:
        return pd.DataFrame(columns=["key_lang", "key_host", "window_kind",
                                     "window_start", "window_end", "dup_cluster_count"])
    df = fingerprints.sort_values(
        ["key_lang", "key_host", "window_kind", "window_start", "window_end"],
        kind="stable")
    flags = (df["dup_cluster_count"].to_numpy() > 0)
    keys = (df["key_lang"].astype(str) + "\x1f" + df["key_host"].astype(str)
            + "\x1f" + df["window_kind"].astype(str)).to_numpy()
    n = len(df)
    new_key = np.ones(n, dtype=bool)
    new_key[1:] = keys[1:] != keys[:-1]
    prev = np.concatenate(([False], flags[:-1]))
    prev[new_key] = False
    rising = flags & ~prev
    return df.loc[rising, ["key_lang", "key_host", "window_kind",
                           "window_start", "window_end", "dup_cluster_count"]
                  ].reset_index(drop=True)


def oracle_cep_matches(fingerprints: pd.DataFrame, pattern) -> pd.DataFrame:
    """Expected streaming-CEP output (Flink MATCH_RECOGNIZE analog,
    AFTER MATCH SKIP TO NEXT ROW): over the globally sorted closed-window
    stream, emit one row per window whose last len(pattern) strictly-
    consecutive windows of the same (key_lang, key_host, window_kind)
    satisfy the pattern's dup_cluster_count predicates elementwise.
    Mirrors cep_scan (state/store.py)."""
    from .state.store import _CEP_OPS, parse_cep_pattern

    preds = parse_cep_pattern(pattern)
    R = len(preds)
    df = fingerprints.sort_values(
        ["key_lang", "key_host", "window_kind", "window_start", "window_end"],
        kind="stable").reset_index(drop=True)
    keys = (df["key_lang"].astype(str) + "\x1f" + df["key_host"].astype(str)
            + "\x1f" + df["window_kind"].astype(str)).to_numpy()
    vals = {c: df[c].to_numpy().astype(np.int64)
            for c in {col for col, _, _ in preds}}
    n = len(df)
    new_key = np.ones(n, dtype=bool)
    new_key[1:] = keys[1:] != keys[:-1]
    gs = np.flatnonzero(new_key)
    pos = np.arange(n) - np.repeat(gs, np.diff(np.append(gs, n)))
    ok = pos >= R - 1
    for j, (col, op, c) in enumerate(preds):
        shift = R - 1 - j
        pj = _CEP_OPS[op](vals[col], c)
        if shift == 0:
            ok &= pj
        else:
            shifted = np.zeros(n, dtype=bool)
            shifted[shift:] = pj[:-shift]
            ok &= shifted
    hits = np.flatnonzero(ok)
    out = df.iloc[hits][["key_lang", "key_host", "window_kind",
                         "window_start", "window_end"]].reset_index(drop=True)
    out.insert(3, "match_start",
               df["window_start"].to_numpy()[hits - (R - 1)])
    return out


def oracle_window_topn(fingerprints: pd.DataFrame, n: int) -> pd.DataFrame:
    """Expected windowed Top-N output from the oracle fingerprint rows:
    per tumbling window, hosts ranked by total doc_count (desc, host asc
    tiebreak), rank <= n.  Mirrors the engine's write_topn_part — the
    per-epoch union equals this global ranking because a tumbling window
    closes atomically within one epoch."""
    df = fingerprints[fingerprints["window_kind"] == "tumbling"]
    g = (df.groupby(["window_start", "window_end", "key_host"], as_index=False)
           ["doc_count"].sum())
    g = g.sort_values(["window_start", "doc_count", "key_host"],
                      ascending=[True, False, True], kind="stable")
    g["rank"] = g.groupby("window_start").cumcount() + 1
    out = g[g["rank"] <= n][
        ["window_start", "window_end", "rank", "key_host", "doc_count"]]
    return out.reset_index(drop=True)


def _assign(rows: pd.DataFrame, tumbling_size_ms: int, sliding,
            cumulate=None):
    """Yield (kind, {(lang,host,start,end): [row_idx]}) per configured kind."""
    ts = rows["ts_ms"].to_numpy()
    idx = rows.index.to_numpy()
    lang = rows["key_lang"].to_numpy()
    host = rows["key_host"].to_numpy()

    def group(starts: np.ndarray, ends: np.ndarray, take: np.ndarray) -> dict:
        d: dict[tuple, list[int]] = {}
        for i, s, en in zip(take, starts, ends):
            d.setdefault((lang[i], host[i], int(s), int(en)), []).append(idx[i])
        return d

    ws = tumbling_window_start(ts, tumbling_size_ms)
    local = np.arange(len(ts))
    yield "tumbling", group(ws, ws + tumbling_size_ms, local)
    if sliding is not None:
        size, slide = sliding
        take, starts = sliding_window_starts(ts, size, slide)
        yield "sliding", group(starts, starts + size, take)
    if cumulate is not None:
        from .stages.windows import cumulate_window_slices

        step, mx = cumulate
        take, starts, ends = cumulate_window_slices(ts, step, mx)
        yield "cumulate", group(starts, ends, take)
