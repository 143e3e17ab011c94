"""Bounded micro-batch epoch source over a Parquet "stream".

The reference's Kafka source (``src/flink_job/kafka_config.py:24-31``)
becomes an ordered sequence of Parquet file groups: one directory per
epoch (``.../epoch=K/*.parquet``), arrival order = epoch order, the source
cursor = last committed epoch index (persisted in the checkpoint
manifest).  Per-epoch event-time bounds come from Parquet column
statistics — no data scan needed to advance the watermark
(``max(warc_ts) − allowed_lateness``, the bounded-out-of-orderness
strategy of ``src/flink_job/kafka_config.py:46-49``).
"""

from __future__ import annotations

import datetime
import glob
import os
import re
from dataclasses import dataclass

import pyarrow.parquet as pq

from .retry import with_retries


@dataclass
class Epoch:
    index: int
    files: list[str]
    max_ts_ms: int  # from parquet column stats
    num_rows: int
    total_bytes: int = 0  # on-disk (compressed) size of the epoch's files


class EpochSource:
    def __init__(self, root: str, ts_col: str = "warc_ts") -> None:
        self.root = root
        self.ts_col = ts_col
        self._epochs = self._discover()

    def _discover(self, skip: set[int] | None = None) -> list[Epoch]:
        dirs = sorted(
            d for d in glob.glob(os.path.join(self.root, "epoch=*")) if os.path.isdir(d)
        )
        out = []
        for d in dirs:
            m = re.search(r"epoch=(\d+)", d)
            if skip and int(m.group(1)) in skip:
                continue  # tailing: already scanned, stats never re-read
            # a writer seals an epoch by removing its _INPROGRESS marker;
            # an unsealed directory is invisible to the cursor (the
            # tailing analog of Kafka's committed-offset visibility)
            if os.path.exists(os.path.join(d, "_INPROGRESS")):
                continue
            files = sorted(glob.glob(os.path.join(d, "*.parquet")))
            if not files:
                continue
            max_ts = 0
            rows = 0
            n_bytes = 0
            for f in files:
                n_bytes += os.path.getsize(f)
                # transient-IO retry (S6 analog): stats reads hit storage
                # per file; a blip must not kill epoch discovery
                md = with_retries(lambda f=f: pq.read_metadata(f))
                rows += md.num_rows
                schema_idx = md.schema.to_arrow_schema().get_field_index(self.ts_col)
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(schema_idx).statistics
                    if st is not None and st.has_min_max:
                        v = st.max
                        if hasattr(v, "timestamp"):
                            # parquet stats for timestamp[ms] come back as a
                            # tz-NAIVE datetime; naive .timestamp() would
                            # interpret it in the host's local timezone and
                            # shift the watermark on any non-UTC host. Pin
                            # it to UTC (stored epoch-ms are UTC by contract).
                            if v.tzinfo is None:
                                v = v.replace(tzinfo=datetime.timezone.utc)
                            ts_ms = int(v.timestamp() * 1000)
                        else:
                            ts_ms = int(v)
                        max_ts = max(max_ts, ts_ms)
            out.append(Epoch(int(m.group(1)), files, max_ts, rows, n_bytes))
        return out

    def refresh(self) -> int:
        """Tailing mode (the reference's unbounded Kafka consumption,
        ``kafka_config.py:24-31``): re-scan the root for NEWLY sealed
        epoch directories.  Known epochs keep their cached stats — one
        metadata read per file ever, however often the poll fires.
        Returns the number of newly discovered epochs."""
        known = {e.index for e in self._epochs}
        new = self._discover(skip=known)
        if new:
            self._epochs = sorted(self._epochs + new, key=lambda e: e.index)
        return len(new)

    def epochs(self, start: int = 0) -> list[Epoch]:
        return [e for e in self._epochs if e.index >= start]

    def __len__(self) -> int:
        return len(self._epochs)
