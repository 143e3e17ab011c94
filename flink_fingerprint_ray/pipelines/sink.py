"""Idempotent epoch-fenced Parquet sink + checkpoint manifest.

The reference's exactness comes from Flink checkpoints (60 s,
``docker-compose.yml:38``) over an at-least-once Kafka sink
(``src/flink_job/kafka_config.py:34-43``); here exactly-once OBSERVABLE
rows come from the sink itself:

  1. write epoch K's output to ``out/_staging/epoch=K/`` (partitioned
     Parquet part files);
  2. snapshot actor state (caller does this BEFORE commit —
     snapshot-then-commit ordering, SURVEY.md §7.4.4);
  3. atomically rename staging → ``out/epoch=K/`` and append the fence to
     the manifest (tmp file + ``os.replace`` — atomic on POSIX).

A re-run of epoch K first discards any uncommitted staging dir and skips
already-committed fences, so replays are idempotent.  The manifest also
carries the source cursor, watermark, per-partition state snapshot paths,
per-epoch metrics and lineage (input files → output fence) — the
"per-partition lineage + metrics enabling checkpoint/resume" of the north
star.
"""

from __future__ import annotations

import json
import os
import shutil


class CheckpointManifest:
    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.json")
        self.state: dict = {"epochs": {}, "watermark_ms": 0, "cursor": -1}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.state = json.load(f)
            # persisted minhash/simhash state embeds polars' seeded token
            # hash, which is not guaranteed stable across polars versions:
            # refuse resume if the recorded hash fingerprint differs from
            # what this build computes (better a loud error than silently
            # corrupted dup-cluster counts).
            recorded = self.state.get("token_hash_fp")
            if recorded is not None and self.state["cursor"] >= 0:
                from ..functions.fingerprint import hash_fingerprint

                current = hash_fingerprint()
                if recorded != current:
                    raise RuntimeError(
                        "checkpoint manifest was written with an incompatible "
                        f"token-hash build (recorded {recorded[:12]}…, current "
                        f"{current[:12]}…) — persisted fingerprint state cannot "
                        "be resumed; rerun from scratch or restore the original "
                        "polars version"
                    )

    def ensure_channels(self, channels: dict) -> None:
        """Record the enabled side channels (curation / neardup / media /
        late_side) on a fresh run and REFUSE resume when a checkpoint was
        written with a different set — a toggled flag would silently skip
        or mix side outputs across epochs while the window path kept
        committing (same loud-error contract as the token-hash guard).
        Checkpoints from builds that predate this guard carry no record;
        the first resume is accepted as-is but records the current set so
        the guard engages from the next resume onward."""
        recorded = self.state.get("channels")
        if recorded is None:
            self.state["channels"] = dict(channels)
            return
        if recorded != channels:
            raise RuntimeError(
                "checkpoint manifest was written with a different side-channel "
                f"configuration (recorded {recorded}, current {channels}) — "
                "resuming would skip or mix side outputs across epochs; rerun "
                "from scratch or restore the original PipelineConfig flags"
            )

    def ensure_commit_mode(self, mode: str) -> None:
        """Record the sink commit protocol on a fresh run and REFUSE
        resume under a different one: rename-mode fences live at
        ``epoch=K`` dirs, manifest-mode fences are attempt dirs resolved
        through the manifest — mixing them would make committed epochs
        invisible to the reader.  Pre-guard checkpoints carry no record;
        the first resume records the current mode."""
        recorded = self.state.get("commit_mode")
        if recorded is None:
            self.state["commit_mode"] = mode
            return
        if recorded != mode:
            raise RuntimeError(
                f"checkpoint manifest was committed with commit_mode="
                f"{recorded!r}, config wants {mode!r} — resuming would hide "
                "already-committed fences from the reader; resume with the "
                "original mode"
            )

    def fence_dirs(self) -> list[str]:
        """Committed fence dirs in epoch order — the manifest-mode
        reader's source of truth (uncommitted attempts never appear)."""
        eps = self.state["epochs"]
        return [eps[k]["lineage"]["output_fence"] for k in sorted(eps, key=int)]

    @property
    def cursor(self) -> int:
        return int(self.state["cursor"])

    @property
    def watermark_ms(self) -> int:
        return int(self.state["watermark_ms"])

    def committed(self, epoch: int) -> bool:
        return str(epoch) in self.state["epochs"]

    def last_snapshot(self) -> dict:
        if self.cursor < 0:
            return {}
        return self.state["epochs"][str(self.cursor)].get("state_snapshot", {})

    def save(self) -> None:
        """Atomically persist the current state (tmp + ``os.replace`` —
        on an object store: one conditional manifest PUT).  ``commit``
        uses this; maintenance ops (``compact_epochs``) use it directly."""
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)

    def commit(
        self,
        epoch: int,
        watermark_ms: int,
        state_snapshot: dict,
        metrics: dict,
        lineage: dict,
    ) -> None:
        if "token_hash_fp" not in self.state:
            from ..functions.fingerprint import hash_fingerprint

            self.state["token_hash_fp"] = hash_fingerprint()
        self.state["epochs"][str(epoch)] = {
            "watermark_ms": watermark_ms,
            "state_snapshot": state_snapshot,
            "metrics": metrics,
            "lineage": lineage,
        }
        self.state["cursor"] = epoch
        self.state["watermark_ms"] = watermark_ms
        self.save()


class EpochSink:
    """Two commit protocols, selected by ``commit_mode``:

    - ``"rename"`` (default): stage under ``_staging/epoch=K``, promote
      with an atomic directory rename (POSIX ``os.replace``).  Correct on
      a shared filesystem; object stores have no atomic rename.
    - ``"manifest"`` (S3-style): every attempt writes its part files to a
      FINAL immutable location ``data/epoch=K/attempt-NNN/`` (never
      renamed, never overwritten — a fresh attempt gets a fresh prefix);
      the COMMIT is the single atomic manifest write that records which
      attempt dir is epoch K's fence (on a real object store: one
      conditional PUT of manifest.json).  Readers resolve committed
      files through the manifest, so uncommitted/orphaned attempts from
      killed runs are invisible; orphans are left for out-of-band GC
      (object stores have no atomic recursive delete).  This is the
      Iceberg/Delta-style metadata-pointer commit.
    """

    def __init__(self, out_dir: str, commit_mode: str = "rename") -> None:
        if commit_mode not in ("rename", "manifest"):
            raise ValueError(f"commit_mode must be 'rename' or 'manifest', got {commit_mode!r}")
        self.out_dir = out_dir
        self.commit_mode = commit_mode
        self.staging_root = os.path.join(out_dir, "_staging")
        self.data_root = os.path.join(out_dir, "data")
        os.makedirs(self.staging_root, exist_ok=True)
        self._attempts: dict[int, str] = {}

    def staging_dir(self, epoch: int) -> str:
        if self.commit_mode == "manifest":
            base = os.path.join(self.data_root, f"epoch={epoch:05d}")
            os.makedirs(base, exist_ok=True)
            n = 0
            while os.path.exists(os.path.join(base, f"attempt-{n:03d}")):
                n += 1  # killed-run leftovers stay put: orphans, GC'd later
            d = os.path.join(base, f"attempt-{n:03d}")
            os.makedirs(d)
            self._attempts[epoch] = d
            return d
        d = os.path.join(self.staging_root, f"epoch={epoch:05d}")
        if os.path.exists(d):  # uncommitted leftovers from a killed run
            shutil.rmtree(d)
        os.makedirs(d)
        return d

    def final_dir(self, epoch: int) -> str:
        if self.commit_mode == "manifest":
            return self._attempts[epoch]
        return os.path.join(self.out_dir, f"epoch={epoch:05d}")

    def publish(self, epoch: int) -> str:
        """Promote staging → committed fence.  Rename mode: atomic dir
        rename.  Manifest mode: NO-OP on the data — the files are already
        at their final immutable paths; the caller's subsequent
        ``CheckpointManifest.commit`` (recording this fence dir) IS the
        atomic commit point."""
        if self.commit_mode == "manifest":
            return self._attempts[epoch]
        src, dst = os.path.join(self.staging_root, f"epoch={epoch:05d}"), self.final_dir(epoch)
        if os.path.exists(dst):
            shutil.rmtree(dst)  # replay of an epoch overwrites the same fence
        os.replace(src, dst)
        return dst
