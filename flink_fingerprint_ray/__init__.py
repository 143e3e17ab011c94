"""flink_fingerprint_ray — a Ray-Data-native structured-streaming engine.

Re-creates the query/data-processing capabilities of the reference
``raviy-iu/flink-fingerprint`` (PyFlink 1.18 + Kafka; see SURVEY.md) as an
idiomatic Ray Data engine over Parquet tables of Common-Crawl-style web
pages ``(url, warc_ts, html, text, lang)``:

- per-url SimHash/MinHash content fingerprints computed in ``map_batches``
  over zero-copy Arrow batches (``functions/fingerprint.py``);
- tumbling / sliding / session event-time windows keyed by
  ``(lang, url-host)`` with bounded-out-of-orderness watermarks
  (``stages/windows.py``, reference: ``src/flink_job/job.py:78-82``,
  ``src/flink_job/kafka_config.py:46-49``);
- near-duplicate cluster counts per window plus a standalone dedup suite
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine,
  ``stages/dedup.py``);
- a stateful stream-stream join of window fingerprints against a
  late-arriving page-update stream with watermark-driven state eviction
  (``pipelines/streaming.py``, reference:
  ``src/postprocess/save_fingerprints.py:66-153``);
- hash-partitioned window-state actor pool with per-epoch
  snapshot/restore (``state/store.py``);
- idempotent epoch-fenced Parquet sink + checkpoint manifest with
  per-partition lineage and metrics (``pipelines/sink.py``).

No code in this package calls ``ray.init()``/``ray.shutdown()`` — only
``bench.py``, CLI entry points and the pytest session fixture own a Ray
session (driver contract, see ``__ray_entry__.py``).
"""

__version__ = "0.1.0"
