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
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)


class EpochSink:
    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.staging_root = os.path.join(out_dir, "_staging")
        os.makedirs(self.staging_root, exist_ok=True)

    def staging_dir(self, epoch: int) -> str:
        d = os.path.join(self.staging_root, f"epoch={epoch:05d}")
        if os.path.exists(d):  # uncommitted leftovers from a killed run
            shutil.rmtree(d)
        os.makedirs(d)
        return d

    def final_dir(self, epoch: int) -> str:
        return os.path.join(self.out_dir, f"epoch={epoch:05d}")

    def publish(self, epoch: int) -> str:
        """Atomically promote staging → committed fence dir."""
        src, dst = os.path.join(self.staging_root, f"epoch={epoch:05d}"), self.final_dir(epoch)
        if os.path.exists(dst):
            shutil.rmtree(dst)  # replay of an epoch overwrites the same fence
        os.replace(src, dst)
        return dst
