"""WARC source (sources/warc.py): spec framing, gzip members, HTTP
envelopes (Content-Length + chunked), the Ray read path, and the
documents-table-derived ingest query vs its DuckDB oracle."""

from __future__ import annotations

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from flink_fingerprint_ray.functions.fingerprint import extract_text, wrap_html
from flink_fingerprint_ray.sources.warc import (
    build_warc,
    parse_warc,
    read_warc,
    write_warc,
)

SF = "/root/testdata/sf0.001"


def _records(n: int, seed: int = 0) -> list[dict]:
    rng = np.random.RandomState(seed)
    return [
        {
            "url": f"https://h{i % 3}.example.com/p{i}",
            "ts_ms": 1_700_000_000_000 + i * 1000 + int(rng.randint(0, 500)),
            "html": wrap_html(f"doc {i} body text & more <x> " + "w " * int(rng.randint(0, 40))),
        }
        for i in range(n)
    ]


class TestWarcCodec:
    def test_roundtrip_plain_and_gzip(self):
        recs = _records(20)
        plain = parse_warc(build_warc(recs, gzip_members=False))
        gz = parse_warc(build_warc(recs, gzip_members=True))
        assert plain.num_rows == 20 and gz.equals(plain)
        assert plain["url"].to_pylist() == [r["url"] for r in recs]
        assert plain["html"].to_pylist() == [r["html"] for r in recs]
        assert plain["warc_ts"].cast("int64").to_pylist() == [r["ts_ms"] for r in recs]
        assert plain["http_status"].to_pylist() == [200] * 20
        assert all("text/html" in c for c in plain["content_type"].to_pylist())

    def test_chunked_transfer_decoding(self):
        # bodies long enough that chunks split mid-body
        recs = _records(6)
        recs[2]["html"] = wrap_html("x" * 5000)
        t = parse_warc(build_warc(recs, chunked_every=1))
        assert t["html"].to_pylist() == [r["html"] for r in recs]

    def test_extract_text_inverts_fixture_bodies(self):
        recs = _records(8)
        t = parse_warc(build_warc(recs))
        txt = extract_text(t["html"]).to_pylist()
        assert txt[0].startswith("doc 0 body text & more <x>")
        assert all(x for x in txt)

    def test_non_response_records_filtered(self):
        recs = _records(4)
        data = build_warc(recs, gzip_members=False)
        # splice a warcinfo record in front (spec-shaped, no HTTP body)
        info_body = b"software: test\r\n"
        info = (b"WARC/1.0\r\n"
                b"WARC-Type: warcinfo\r\n"
                b"WARC-Date: 2023-11-14T22:13:20Z\r\n"
                b"WARC-Record-ID: <urn:uuid:0>\r\n"
                b"Content-Type: application/warc-fields\r\n"
                + f"Content-Length: {len(info_body)}\r\n\r\n".encode()
                + info_body + b"\r\n\r\n")
        t = parse_warc(info + data)
        assert t.num_rows == 4
        t2 = parse_warc(info + data, keep_types=("response", "warcinfo"))
        assert t2.num_rows == 5

    def test_non_200_status_parsed(self):
        recs = _records(3)
        recs[1]["status"] = 404
        t = parse_warc(build_warc(recs))
        assert t["http_status"].to_pylist() == [200, 404, 200]

    def test_fractional_warc_date(self):
        from flink_fingerprint_ray.sources.warc import _parse_warc_date

        assert _parse_warc_date("2023-11-14T22:13:20Z") == 1_700_000_000_000
        assert _parse_warc_date("2023-11-14T22:13:20.250Z") == 1_700_000_000_250

    def test_rejects_lost_framing(self):
        recs = _records(2)
        data = build_warc(recs, gzip_members=False)
        with pytest.raises(ValueError):
            parse_warc(b"garbage" + data)


class TestWarcRay:
    def test_read_warc_multi_file(self, ray_session, tmp_path):
        recs = _records(30, seed=7)
        for s in range(3):
            write_warc(recs[s::3], str(tmp_path / f"part-{s}.warc.gz"),
                       chunked_every=4)
        ds = read_warc(sorted(glob.glob(str(tmp_path / "*.warc.gz"))))
        df = ds.to_pandas().sort_values("url").reset_index(drop=True)
        want = sorted(r["url"] for r in recs)
        assert df["url"].tolist() == want
        got = dict(zip(df["url"], df["html"]))
        for r in recs:
            assert got[r["url"]] == r["html"]

    def test_warc_ingest_matches_oracle(self, ray_session):
        from flink_fingerprint_ray.pipelines.queries import (
            ORACLE_SQL,
            QUERIES,
        )

        eng = QUERIES["warc_ingest"](SF)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        ora = con.execute(ORACLE_SQL["warc_ingest"]).df()
        pd.testing.assert_frame_equal(eng.reset_index(drop=True),
                                      ora.reset_index(drop=True),
                                      check_dtype=False)


class TestWarcToEpochs:
    def test_crawl_to_flagship_pipeline_parity(self, ray_session, tmp_path):
        """The full story a web-corpus user runs: WARC crawl files →
        warc_to_epochs (text extraction + lang-id en route, sealed epoch
        dirs) → flagship streaming pipeline → oracle parity on the
        read-back page table.  Proves the bridge emits exactly the
        schema/ordering the engine and oracle share."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from flink_fingerprint_ray import fixtures
        from flink_fingerprint_ray.oracle import oracle_fingerprints
        from flink_fingerprint_ray.pipelines.streaming import (
            PipelineConfig,
            StreamingFingerprintPipeline,
        )
        from flink_fingerprint_ray.sources.warc import warc_to_epochs

        pages = fixtures.make_pages(n_docs=900, seed=51)
        # crawl files = contiguous arrival slices (the offset analog)
        n_files = 3
        bounds = np.linspace(0, pages.num_rows, n_files + 1).astype(int)
        paths = []
        for s in range(n_files):
            sl = pages.slice(bounds[s], bounds[s + 1] - bounds[s])
            recs = [{"url": u, "ts_ms": t, "html": h}
                    for u, t, h in zip(sl["url"].to_pylist(),
                                       sl["warc_ts"].cast("int64").to_pylist(),
                                       sl["html"].to_pylist())]
            paths.append(write_warc(recs, str(tmp_path / f"crawl-{s}.warc.gz"),
                                    chunked_every=7))

        root = str(tmp_path / "stream")
        dirs = warc_to_epochs(paths, root, files_per_epoch=1)
        assert len(dirs) == n_files
        assert not any(os.path.exists(os.path.join(d, "_INPROGRESS"))
                       for d in dirs)

        # read-back table in epoch order == the oracle's arrival order
        back = pa.concat_tables([
            pq.read_table(f)
            for d in dirs
            for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
        ])
        assert back.num_rows == pages.num_rows
        assert back["url"].to_pylist() == pages["url"].to_pylist()
        assert back["html"].to_pylist() == pages["html"].to_pylist()
        assert (back["warc_ts"].cast("int64").to_pylist()
                == pages["warc_ts"].cast("int64").to_pylist())
        # text extraction inverted the fixture wrapper exactly
        assert back["text"].to_pylist() == pages["text"].to_pylist()

        cfg = PipelineConfig(sliding=None, session_gap_ms=0,
                             n_state_partitions=2)
        pipe = StreamingFingerprintPipeline(
            os.path.join(root, "pages"), str(tmp_path / "out"), cfg=cfg)
        pipe.run()
        eng = pipe.result_dataset().to_pandas()
        pipe.shutdown()

        ora = oracle_fingerprints(back, n_files, sliding=None,
                                  session_gap_ms=0)
        sc = ["window_kind", "key_lang", "key_host", "window_start"]
        pd.testing.assert_frame_equal(
            eng.sort_values(sc).reset_index(drop=True)[ora.columns.tolist()],
            ora.sort_values(sc).reset_index(drop=True), check_dtype=False)


class TestWarcIncremental:
    def test_iter_warc_tables_chunking(self):
        from flink_fingerprint_ray.sources.warc import iter_warc_tables

        recs = _records(25, seed=11)
        data = build_warc(recs, gzip_members=True, chunked_every=6)
        chunks = list(iter_warc_tables(data, chunk_rows=7))
        assert [c.num_rows for c in chunks] == [7, 7, 7, 4]
        import pyarrow as pa

        joined = pa.concat_tables(chunks)
        assert joined["url"].to_pylist() == [r["url"] for r in recs]
        assert joined["html"].to_pylist() == [r["html"] for r in recs]

    def test_truncated_archive_raises(self):
        recs = _records(3)
        data = build_warc(recs, gzip_members=False)
        with pytest.raises(ValueError, match="truncated"):
            parse_warc(data[:-40])

    def test_record_spanning_member_boundary(self):
        # spec-legal: one gzip member holding SEVERAL records, and a
        # whole-file single-member archive — framing must not assume
        # member == record
        import zlib

        from flink_fingerprint_ray.sources.warc import parse_warc as pw

        recs = _records(10, seed=13)
        plain = build_warc(recs, gzip_members=False)
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        whole = co.compress(plain) + co.flush()
        t = pw(whole)
        assert t["url"].to_pylist() == [r["url"] for r in recs]


class TestWet:
    def test_wet_roundtrip(self):
        from flink_fingerprint_ray.sources.warc import build_wet, parse_warc

        recs = [{"url": f"https://h{i}.example.com/{i}",
                 "ts_ms": 1_700_000_000_000 + i * 777,
                 "text": f"doc {i} plain text & <no html> " + "t " * i}
                for i in range(12)]
        t = parse_warc(build_wet(recs), keep_types=("conversion",))
        assert t.num_rows == 12
        assert [b.decode() for b in t["html"].to_pylist()] \
            == [r["text"] for r in recs]
        assert t["http_status"].to_pylist() == [0] * 12  # no HTTP envelope
        # response-only parse sees none of them
        assert parse_warc(build_wet(recs)).num_rows == 0

    def test_read_wet_ray(self, ray_session, tmp_path):
        from flink_fingerprint_ray.sources.warc import read_wet, write_wet

        recs = [{"url": f"https://h.example.com/{i}",
                 "ts_ms": 1_700_000_000_000 + i,
                 "text": f"text {i}"} for i in range(9)]
        write_wet(recs[:5], str(tmp_path / "a.warc.wet.gz"))
        write_wet(recs[5:], str(tmp_path / "b.warc.wet.gz"))
        df = read_wet([str(tmp_path / "a.warc.wet.gz"),
                       str(tmp_path / "b.warc.wet.gz")]).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        assert df["text"].tolist() == [r["text"] for r in recs]
        ms = ((df["warc_ts"] - pd.Timestamp(0)) // pd.Timedelta(milliseconds=1))
        assert ms.tolist() == [r["ts_ms"] for r in recs]

    def test_wet_ingest_matches_oracle(self, ray_session):
        from flink_fingerprint_ray.pipelines.queries import (
            ORACLE_SQL,
            QUERIES,
        )

        eng = QUERIES["wet_ingest"](SF)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        ora = con.execute(ORACLE_SQL["wet_ingest"]).df()
        pd.testing.assert_frame_equal(eng.reset_index(drop=True),
                                      ora.reset_index(drop=True),
                                      check_dtype=False)


class TestCdxIndex:
    def test_index_offsets_tile_file_and_random_access(self, tmp_path):
        from flink_fingerprint_ray.sources.warc import (
            build_cdx_index,
            fetch_warc_records,
        )

        recs = _records(40, seed=17)
        p = str(tmp_path / "a.warc.gz")
        write_warc(recs, p, chunked_every=5)
        data = open(p, "rb").read()
        idx = build_cdx_index(data, filename=p)
        assert idx.num_rows == 40
        assert idx["url"].to_pylist() == [r["url"] for r in recs]
        offs = idx["offset"].to_pylist()
        lens = idx["length"].to_pylist()
        assert offs[0] == 0
        assert all(offs[k + 1] == offs[k] + lens[k] for k in range(39))
        assert offs[-1] + lens[-1] == len(data)
        # fetch every 7th record by byte range only
        sub = idx.take([k for k in range(40) if k % 7 == 0])
        got = fetch_warc_records(sub)
        assert got["url"].to_pylist() == [recs[k]["url"] for k in range(0, 40, 7)]
        assert got["html"].to_pylist() == [recs[k]["html"] for k in range(0, 40, 7)]

    def test_rejects_non_member_layouts(self):
        from flink_fingerprint_ray.sources.warc import build_cdx_index

        recs = _records(3)
        with pytest.raises(ValueError):
            build_cdx_index(build_warc(recs, gzip_members=False))

    def test_ray_reader_keeps_raw_bytes(self, ray_session, tmp_path):
        # .gz paths must NOT be auto-gunzipped by the read task — the
        # index addresses compressed ranges and the streaming parser
        # decodes member-at-a-time
        from flink_fingerprint_ray.sources.warc import index_warc_files

        recs = _records(12, seed=19)
        p = str(tmp_path / "b.warc.gz")
        write_warc(recs, p)
        idx = index_warc_files([p]).to_pandas()
        assert len(idx) == 12
        assert idx["offset"].iloc[0] == 0
        assert (idx["offset"] + idx["length"]).iloc[-1] == os.path.getsize(p)

    def test_cdx_lookup_matches_oracle(self, ray_session):
        from flink_fingerprint_ray.pipelines.queries import (
            ORACLE_SQL,
            QUERIES,
        )

        eng = QUERIES["warc_cdx_lookup"](SF)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        ora = con.execute(ORACLE_SQL["warc_cdx_lookup"]).df()
        pd.testing.assert_frame_equal(eng.reset_index(drop=True),
                                      ora.reset_index(drop=True),
                                      check_dtype=False)


class TestWarcGeneralExtraction:
    def test_crawl_bridge_with_general_extractor_parity(self, ray_session,
                                                        tmp_path):
        """Messy real-world markup through the WHOLE crawl story:
        WARC.gz files of hostile-template pages → warc_to_epochs with
        extractor="general" → flagship pipeline (same extractor) →
        oracle parity on the read-back table."""
        import glob as _glob

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from flink_fingerprint_ray import fixtures
        from flink_fingerprint_ray.oracle import oracle_fingerprints
        from flink_fingerprint_ray.pipelines.streaming import (
            PipelineConfig,
            StreamingFingerprintPipeline,
        )
        from flink_fingerprint_ray.sources.warc import warc_to_epochs, write_warc

        pages = fixtures.make_pages(n_docs=600, seed=61, html_style="messy")
        n_files = 3
        bounds = np.linspace(0, pages.num_rows, n_files + 1).astype(int)
        paths = []
        for s in range(n_files):
            sl = pages.slice(bounds[s], bounds[s + 1] - bounds[s])
            recs = [{"url": u, "ts_ms": t, "html": h}
                    for u, t, h in zip(sl["url"].to_pylist(),
                                       sl["warc_ts"].cast("int64").to_pylist(),
                                       sl["html"].to_pylist())]
            paths.append(write_warc(recs, str(tmp_path / f"c{s}.warc.gz"),
                                    chunked_every=5))
        root = str(tmp_path / "stream")
        dirs = warc_to_epochs(paths, root, files_per_epoch=1,
                              extractor="general")
        back = pa.concat_tables([
            pq.read_table(f)
            for d in dirs
            for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))
        ])
        # the bridge's text column is the GENERAL extraction (includes
        # template boilerplate lines), not the strict fixture text
        assert back.num_rows == pages.num_rows
        assert back["text"].to_pylist() != pages["text"].to_pylist()
        assert all("\n" in t for t in back["text"].to_pylist()[:10])

        cfg = PipelineConfig(sliding=None, session_gap_ms=0,
                             n_state_partitions=2, extractor="general")
        pipe = StreamingFingerprintPipeline(
            os.path.join(root, "pages"), str(tmp_path / "out"), cfg=cfg)
        pipe.run()
        eng = pipe.result_dataset().to_pandas()
        pipe.shutdown()
        ora = oracle_fingerprints(back, n_files, sliding=None,
                                  session_gap_ms=0, extractor="general")
        sc = ["window_kind", "key_lang", "key_host", "window_start"]
        pd.testing.assert_frame_equal(
            eng.sort_values(sc).reset_index(drop=True)[ora.columns.tolist()],
            ora.sort_values(sc).reset_index(drop=True), check_dtype=False)
