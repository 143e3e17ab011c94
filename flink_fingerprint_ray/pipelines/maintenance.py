"""Committed-output maintenance ops.

``compact_epochs`` rewrites many small committed epoch fences into ONE
compacted fence — the operational gap a 100-TB deployment hits after a
month of minute-sized epochs: 43k fence dirs × P part files each make
listing/reading the committed table metadata-bound.  The manifest chain
stays intact (per-epoch entries, metrics, state snapshots, cursor and
watermark are untouched), so resume, replay and the channel guards are
unaffected; only the DATA file layout changes.

Crash-safe ordering (same snapshot-then-commit discipline as the sink):

  1. merge the covered fences' parquet files per channel into a staged
     compaction dir (rename mode) / a fresh immutable attempt prefix
     (manifest mode);
  2. promote it (atomic dir rename / no-op) and atomically rewrite the
     manifest with the compaction record — the commit point: readers
     (``_fence_files``) now resolve the covered epochs to the compacted
     dir and ignore their old fences;
  3. delete the superseded fence dirs (rename mode only; manifest mode
     leaves them as orphans for out-of-band GC — object stores have no
     atomic recursive delete).  A crash between 2 and 3 leaves orphans
     that readers already ignore.

Only epochs STRICTLY BEFORE the committed cursor are compacted: the
newest fence stays replayable under the crash-rewind protocol (a replay
republishes its epoch dir, which must not collide with a compaction
record covering the same epoch).
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from .sink import CheckpointManifest

# channel filename patterns, matching the accessors' _fence_files globs;
# each channel compacts to ONE file whose name the same glob still matches
_CHANNELS = [
    ("part-*.parquet", "part-00000.parquet"),
    ("refires-p*.parquet", "refires-p0000.parquet"),
    ("clean-p*.parquet", "clean-p0000.parquet"),
    ("neardup-p*.parquet", "neardup-p0000.parquet"),
    ("media-b*.parquet", "media-b0000.parquet"),
    ("late-b*.parquet", "late-b0000.parquet"),
    ("topn.parquet", "topn.parquet"),
    ("cep.parquet", "cep.parquet"),
    ("alerts.parquet", "alerts.parquet"),
]


def compact_epochs(out_dir: str, upto: int | None = None) -> dict:
    """Compact committed epoch fences ``[0 .. upto]`` (default: all but
    the newest, ``cursor - 1``) into one fence dir.  Re-compacting later
    folds the previous compaction in (one record covers the union).
    Returns {"epochs": [...], "dir": ..., "files": n, "rows": n}; no-op
    ({"epochs": []}) when fewer than two fences would be covered."""
    m = CheckpointManifest(out_dir)
    mode = m.state.get("commit_mode", "rename")
    committed = sorted(int(k) for k in m.state["epochs"])
    hi_cap = m.cursor - 1 if upto is None else min(upto, m.cursor - 1)
    targets = [e for e in committed if e <= hi_cap]
    prior = m.state.get("compactions", [])
    prior_covered = {e for c in prior for e in c["epochs"]}
    # sources: every prior compaction dir + each target epoch's own fence
    src_dirs = [c["dir"] for c in prior]
    src_dirs += [m.state["epochs"][str(e)]["lineage"]["output_fence"]
                 for e in targets if e not in prior_covered]
    if len(targets) < 2 or len(src_dirs) < 2:
        return {"epochs": [], "dir": None, "files": 0, "rows": 0}

    hi = max(targets)
    if mode == "manifest":
        base = os.path.join(out_dir, "data", f"compact=00000-{hi:05d}")
        os.makedirs(base, exist_ok=True)
        n = 0
        while os.path.exists(os.path.join(base, f"attempt-{n:03d}")):
            n += 1
        staged = final = os.path.join(base, f"attempt-{n:03d}")
        os.makedirs(staged)
    else:
        staged = os.path.join(out_dir, "_staging", f"compact=00000-{hi:05d}")
        if os.path.exists(staged):
            shutil.rmtree(staged)
        os.makedirs(staged)
        final = os.path.join(out_dir, f"compact=00000-{hi:05d}")

    n_files = n_rows = 0
    for pattern, out_name in _CHANNELS:
        tabs = []
        for d in src_dirs:
            for f in sorted(glob.glob(os.path.join(d, pattern))):
                tabs.append(pq.read_table(f))
                n_files += 1
        if not tabs:
            continue
        merged = pa.concat_tables(tabs, promote_options="default")
        n_rows += merged.num_rows
        pq.write_table(merged, os.path.join(staged, out_name))

    if mode != "manifest":
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(staged, final)
    record = {"epochs": targets, "dir": final}
    m.state["compactions"] = [record]
    m.save()  # <- the commit point: readers switch to the compacted dir

    if mode != "manifest":  # step 3: GC the superseded fences
        for c in prior:
            if os.path.isdir(c["dir"]) and c["dir"] != final:
                shutil.rmtree(c["dir"])
        for e in targets:
            if e in prior_covered:
                continue
            d = m.state["epochs"][str(e)]["lineage"]["output_fence"]
            if os.path.isdir(d):
                shutil.rmtree(d)
    return {"epochs": targets, "dir": final, "files": n_files, "rows": n_rows}
