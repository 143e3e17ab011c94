"""EpochSource watermark derivation must be timezone-independent.

Parquet column statistics for timestamp[ms] columns come back as
tz-NAIVE datetimes; naive ``datetime.timestamp()`` interprets them in
the host's LOCAL timezone, which would shift every watermark by the
UTC offset on a non-UTC host and break engine/oracle parity.  The
source pins stats datetimes to UTC — this locks that in under a
non-UTC TZ.
"""

import glob
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from flink_fingerprint_ray import fixtures
from flink_fingerprint_ray.sources.epochs import EpochSource


def _with_tz(tz, fn):
    old = os.environ.get("TZ")
    os.environ["TZ"] = tz
    time.tzset()
    try:
        return fn()
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        time.tzset()


def test_watermark_max_ts_is_tz_independent(tmp_path):
    pages = fixtures.make_pages(n_docs=400)
    fixtures.write_epochs(pages, str(tmp_path), n_epochs=2)
    root = os.path.join(str(tmp_path), "pages")

    utc_epochs = _with_tz("UTC", lambda: EpochSource(root).epochs())
    ny_epochs = _with_tz("America/New_York", lambda: EpochSource(root).epochs())

    assert [e.max_ts_ms for e in utc_epochs] == [e.max_ts_ms for e in ny_epochs]

    # and both equal the raw int64 max actually stored in the files
    for e in utc_epochs:
        raw = max(
            int(pq.read_table(f, columns=["warc_ts"])["warc_ts"]
                .cast(pa.int64()).to_numpy().max())
            for f in e.files
        )
        assert e.max_ts_ms == raw
