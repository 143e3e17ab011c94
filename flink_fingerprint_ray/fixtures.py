"""Deterministic fixture generators (FIXTURES.md F1/F2).

The reference validates operationally with a synthetic Kafka producer
(``src/generator/data_generator.py:46-69`` — 5 keys, 1 Hz, 15% nulls);
our analog is a seeded page-table generator with Zipf-skewed hosts,
controlled out-of-orderness vs ``warc_ts``, injected duplicate clusters,
and ~2% empty documents (the "null" analog dropped like
``src/flink_job/job.py:68``).

Arrival order == row order.  ``write_epochs`` splits rows by arrival
position into one Parquet file per epoch (the Kafka partition/offset
analog); ``warc_ts`` jitter then exercises the watermark logic.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.fingerprint import wrap_html

BASE_TS_MS = 1_700_000_000_000  # fixed epoch base (UTC)
LANGS = ["en", "de", "fr", "hi", "zh"]

_VOCAB = (
    "the quick brown fox jumps over lazy dog stream data window shuffle "
    "partition arrow batch actor block spill hash join sort merge scan "
    "filter project group count mean median crawl page host link anchor "
    "title body text token shingle cluster near exact dup fingerprint "
    "watermark epoch state snapshot resume commit fence lineage metric"
).split()


def _gen_texts(rng: np.random.RandomState, n: int,
               tokens_lo: int = 12, tokens_hi: int = 40) -> list[str]:
    """Seeded texts with injected duplicate structure:
    ~70% unique, ~15% exact-dup clusters, ~15% near-dup clusters.

    ``tokens_lo``/``tokens_hi`` size the documents: the defaults make
    tiny (~200 B) docs for fast tests; bench corpora pass larger ranges
    so per-doc compute matches real KB-sized web pages.

    Vectorized (one randint sweep for every original token) so million-doc
    bench corpora generate in seconds, not minutes."""
    kind = rng.rand(n)
    is_orig = kind >= 0.30
    if n:
        is_orig[0] = True  # a dup needs an earlier original to copy
    lengths = rng.randint(tokens_lo, tokens_hi, size=n)
    vocab = np.array(_VOCAB, dtype=object)

    # all original token sequences in one flat draw
    orig_rows = np.flatnonzero(is_orig)
    orig_lens = lengths[orig_rows]
    flat = vocab[rng.randint(0, len(vocab), size=int(orig_lens.sum()))]
    bounds = np.concatenate(([0], np.cumsum(orig_lens)))
    originals = [flat[bounds[i]:bounds[i + 1]] for i in range(len(orig_rows))]

    # each dup row copies a uniformly-chosen EARLIER original
    n_before = np.cumsum(is_orig) - is_orig  # originals strictly before row i
    src = np.minimum((rng.rand(n) * np.maximum(n_before, 1)).astype(np.int64),
                     np.maximum(n_before - 1, 0))
    orig_pos = np.cumsum(is_orig) - 1  # row -> its index in `originals`

    texts: list[str] = []
    for i in range(n):
        if is_orig[i]:
            texts.append(" ".join(originals[orig_pos[i]]))
        elif kind[i] < 0.15:  # exact dup
            texts.append(" ".join(originals[src[i]]))
        else:  # near dup: 1-2 token edits
            toks = originals[src[i]].copy()
            for _ in range(rng.randint(1, 3)):
                toks[rng.randint(len(toks))] = _VOCAB[rng.randint(len(_VOCAB))]
            texts.append(" ".join(toks))
    return texts


def make_pages(
    n_docs: int = 2000,
    seed: int = 42,
    n_hosts: int = 40,
    step_ms: int = 500,
    lateness_ms: int = 10_000,
    late_frac: float = 0.01,
    ooo_frac: float = 0.05,
    empty_frac: float = 0.02,
    tokens_lo: int = 12,
    tokens_hi: int = 40,
    media_frac: float = 0.0,
    media_codecs: str = "netpbm",
    html_style: str = "strict",
) -> pa.Table:
    """F1 `pages` table: (url, warc_ts, html, text, lang [, media]).

    warc_ts is mostly increasing with jitter; ~ooo_frac rows out of order
    within the watermark bound; ~late_frac rows later than the bound
    (must be dropped as late and counted in metrics).

    ``media_frac > 0`` attaches a GENUINE encoded image payload (seeded
    gradient+noise) to that fraction of pages — the multimodal column
    the flagship's media side-channel decodes under the streaming
    contract; other rows carry null.  ``media_codecs="mixed"`` cycles
    netpbm P6 / baseline JPEG / lossless PNG / GIF89a payloads (the side
    channel sniffs each signature); the default is netpbm-only.
    """
    rng = np.random.RandomState(seed)
    # Zipf-skewed host choice: a few hot hosts exercise salting
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    probs = (1.0 / ranks**1.2)
    probs /= probs.sum()
    host_idx = rng.choice(n_hosts, size=n_docs, p=probs)
    hosts = np.array([f"h{i:03d}.example.com" for i in range(n_hosts)], dtype=object)[host_idx]
    urls = np.array([f"https://{h}/p{i}" for i, h in enumerate(hosts)], dtype=object)

    lang_probs = np.array([0.5, 0.2, 0.15, 0.1, 0.05])
    langs = np.array(LANGS, dtype=object)[rng.choice(len(LANGS), size=n_docs, p=lang_probs)]

    ts = BASE_TS_MS + np.arange(n_docs, dtype=np.int64) * step_ms
    jitter = rng.randint(0, max(1, lateness_ms // 3), size=n_docs)
    ts = ts + jitter
    ooo = rng.rand(n_docs) < ooo_frac
    ts[ooo] -= rng.randint(1, lateness_ms, size=ooo.sum())
    late = rng.rand(n_docs) < late_frac
    ts[late] -= lateness_ms * 3 + rng.randint(0, lateness_ms, size=late.sum())

    texts = _gen_texts(rng, n_docs, tokens_lo, tokens_hi)
    empty = rng.rand(n_docs) < empty_frac
    for i in np.flatnonzero(empty):
        texts[i] = ""
    if html_style == "messy":
        # real-world markup (the four hostile templates of
        # functions/html.py) — pair with PipelineConfig(extractor="general")
        from .functions.html import wrap_html_messy

        html = [wrap_html_messy(t, i) for i, t in enumerate(texts)]
    else:
        html = [wrap_html(t) for t in texts]

    cols = {
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(ts, type=pa.timestamp("ms")),
        "html": pa.array(html, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    }
    if media_frac > 0:
        from .functions.gif import encode_gif
        from .functions.jpeg import encode_jpeg
        from .functions.png import encode_png
        from .stages.media import encode_ppm

        has_media = rng.rand(n_docs) < media_frac
        payloads: list[bytes | None] = [None] * n_docs
        for k, i in enumerate(np.flatnonzero(has_media)):
            h, w = int(rng.randint(16, 48)), int(rng.randint(16, 48))
            gx = np.linspace(0, 255, w, dtype=np.float64)[None, :]
            gy = np.linspace(0, 255, h, dtype=np.float64)[:, None]
            img = np.stack([
                np.broadcast_to(gx, (h, w)),
                np.broadcast_to(gy, (h, w)),
                rng.randint(0, 256, (h, w)).astype(np.float64),
            ], axis=2).astype(np.uint8)
            if media_codecs == "mixed":
                # cycle the four REAL image codecs — the side-channel
                # (and its oracle) sniffs each payload's signature; GIF
                # carries the same scene quantized to its 32-gray palette
                if k % 4 == 3:
                    pal = np.stack([np.arange(32)] * 3, axis=1) \
                        .astype(np.uint8) * 8
                    payloads[int(i)] = encode_gif(
                        (img[:, :, 2] // 8).astype(np.uint8), pal,
                        interlace=k % 8 == 3)
                else:
                    payloads[int(i)] = (encode_ppm(img) if k % 4 == 0 else
                                        encode_jpeg(img, quality=90)
                                        if k % 4 == 1 else encode_png(img))
            else:
                payloads[int(i)] = encode_ppm(img)
        cols["media"] = pa.array(payloads, type=pa.binary())
    return pa.table(cols)


def make_page_updates(pages: pa.Table, seed: int = 43, hit_frac: float = 0.3) -> pa.Table:
    """F2 `page_updates`: late-arriving update stream (join probe side).

    ~hit_frac of updates reference F1 urls (join hits); delays span
    {in-window, late-but-within-retention, beyond-retention} — analog of
    the dual-consumer correlation buffer
    (``src/postprocess/save_fingerprints.py:66-153``).
    """
    rng = np.random.RandomState(seed)
    n = max(1, pages.num_rows // 2)
    urls = np.asarray(pages["url"], dtype=object)
    ts = pages["warc_ts"].cast(pa.int64()).to_numpy()
    pick = rng.randint(0, len(urls), size=n)
    hit = rng.rand(n) < hit_frac
    upd_urls = np.where(hit, urls[pick], np.array([f"https://miss{i}.example.com/x" for i in range(n)], dtype=object))
    delay_kind = rng.randint(0, 3, size=n)
    delay = np.select(
        [delay_kind == 0, delay_kind == 1, delay_kind == 2],
        [rng.randint(0, 30_000, size=n), rng.randint(30_000, 240_000, size=n), rng.randint(400_000, 800_000, size=n)],
    )
    upd_ts = ts[pick] + delay
    kinds = np.array(["modified", "deleted", "redirected"], dtype=object)[rng.randint(0, 3, size=n)]
    texts = np.asarray(pages["text"], dtype=object)[pick]
    new_text = np.array([t + " updated" if t else "updated" for t in texts], dtype=object)
    order = np.argsort(upd_ts, kind="stable")  # arrival roughly by time
    return pa.table(
        {
            "url": pa.array(upd_urls[order], type=pa.string()),
            "update_ts": pa.array(upd_ts[order], type=pa.timestamp("ms")),
            "change_kind": pa.array(kinds[order], type=pa.string()),
            "new_text": pa.array(new_text[order], type=pa.string()),
        }
    )


def make_blocklist(pages: pa.Table, n_hosts: int = 3,
                   seed: int = 51) -> pa.Table:
    """Broadcast-state side-input stream: (host, update_ts) rows naming
    hosts to drop from ingest.  Hosts are drawn from the corpus's hot end
    (so the rules measurably bite) and rows are spread over arrival order
    — split with ``write_epochs`` they become a dynamic rules stream
    whose epoch-K rows gate page epochs > K."""
    rng = np.random.RandomState(seed)
    hosts = np.asarray(
        [u.split("/")[2] for u in np.asarray(pages["url"], dtype=object)],
        dtype=object)
    uniq, counts = np.unique(hosts, return_counts=True)
    hot = uniq[np.argsort(-counts)][:max(8, n_hosts * 2)]
    chosen = hot[rng.choice(len(hot), size=n_hosts, replace=False)]
    ts0 = int(pages["warc_ts"].cast(pa.int64())[0].as_py())
    # a few rows per chosen host so every side epoch carries something
    rows = [(h, ts0 + 1000 * (i * n_hosts + j))
            for j, h in enumerate(chosen) for i in range(3)]
    return pa.table({
        "host": pa.array([r[0] for r in rows], pa.string()),
        "update_ts": pa.array(np.array([r[1] for r in rows], np.int64),
                              pa.timestamp("ms")),
    })


def write_epochs(
    table: pa.Table,
    out_dir: str,
    n_epochs: int = 8,
    prefix: str = "pages",
    rows_per_file: int = 40_000,
    target_file_bytes: int = 32 << 20,
    target_rg_bytes: int = 4 << 20,
) -> list[str]:
    """Split rows by ARRIVAL position into Parquet files per epoch:
    ``{out_dir}/{prefix}/epoch=K/part-*.parquet`` (the source-cursor unit
    that the checkpoint manifest records).  Files and row groups are
    sized by BYTES (capped at ``rows_per_file`` rows) so readers
    parallelize along file/row-group boundaries for any document size —
    a row-count-only shard turns KB-sized docs into one monolithic file
    whose every read split re-decodes the whole thing. Returns epoch dir
    paths."""
    paths = []
    row_bytes = max(1, table.nbytes // max(1, table.num_rows))
    rpf = int(max(1000, min(rows_per_file, target_file_bytes // row_bytes)))
    rg = int(max(250, min(10_000, target_rg_bytes // row_bytes)))
    bounds = np.linspace(0, table.num_rows, n_epochs + 1).astype(int)
    for k in range(n_epochs):
        d = os.path.join(out_dir, prefix, f"epoch={k:05d}")
        os.makedirs(d, exist_ok=True)
        ep = table.slice(bounds[k], bounds[k + 1] - bounds[k])
        n_files = max(1, -(-ep.num_rows // rpf))
        fb = np.linspace(0, ep.num_rows, n_files + 1).astype(int)
        for j in range(n_files):
            pq.write_table(
                ep.slice(fb[j], fb[j + 1] - fb[j]),
                os.path.join(d, f"part-{j:04d}.parquet"),
                row_group_size=rg,
            )
        paths.append(d)
    return paths


def pages_from_documents(sf_dir: str) -> pa.Table:
    """Derive a deterministic pages table from the driver's read-only
    ``documents.parquet`` (TESTDATA.md) — used by ``entry()`` and the
    correctness queries so the flagship pipeline runs on driver data.

    Derivation is simple enough for the DuckDB oracle to mirror in SQL:
      host   = 'h' || (doc_id % 20) || '.example.com'
      url    = 'https://' || host || '/d' || doc_id
      warc_ts= epoch_ms(BASE_TS_MS + doc_id * 1000)
    """
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"])
    doc_id = docs["doc_id"].to_numpy()
    texts = np.asarray(docs["text"], dtype=object)
    hosts = [f"h{int(i) % 20}.example.com" for i in doc_id]
    urls = [f"https://{h}/d{int(i)}" for i, h in zip(doc_id, hosts)]
    ts = BASE_TS_MS + doc_id.astype(np.int64) * 1000
    html = [wrap_html(str(t)) for t in texts]
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("ms")),
            "html": pa.array(html, type=pa.binary()),
            "text": docs["text"].combine_chunks().cast(pa.string()),
            "lang": docs["lang"].combine_chunks().cast(pa.string()),
        }
    )


def make_labeled_corpus(n_docs: int = 1200, seed: int = 77,
                        n_classes: int = 5) -> pa.Table:
    """Deterministic LABELED text corpus for training the real T6 model
    artifact (``functions/model.py``): each class writes words drawn
    from its own letter distribution, so class identity IS learnable
    from character trigrams (unlike the documents table, whose lang
    column is independent noise).  Returns (text, label)."""
    rng = np.random.RandomState(seed)
    alphabets = [
        "aeioulmnrst", "bcdfgkptvwy", "qrszxjkwvtn",
        "hijyaeopmcd", "uogltrnbfqe",
    ][:n_classes]
    vocabs = []
    for a in alphabets:
        letters = np.array(list(a))
        words = set()
        while len(words) < 60:
            n = rng.randint(3, 9)
            words.add("".join(letters[rng.randint(0, len(letters), n)]))
        vocabs.append(np.array(sorted(words)))
    shared = np.array(["the", "data", "and", "of", "to"])
    texts, labels = [], []
    for i in range(n_docs):
        c = i % n_classes
        n_words = rng.randint(30, 120)
        own = vocabs[c][rng.randint(0, len(vocabs[c]), n_words)]
        mix = rng.rand(n_words) < 0.1
        own[mix] = shared[rng.randint(0, len(shared), int(mix.sum()))]
        texts.append(" ".join(own))
        labels.append(f"class{c}")
    return pa.table({"text": pa.array(texts, pa.large_string()),
                     "label": pa.array(labels)})
