"""A small REAL trained model for the T6 scorer stage (reference analog:
the schema-enforced LLM scoring job, ``src/llm_inference/llm_job.py:254-332``
— a model artifact loaded once per worker, applied per batch).

The model is a multinomial logistic regression over hashed character
trigram counts, trained with deterministic full-batch gradient descent
(numpy only — no external ML deps in the sandbox) and QUANTIZED to int64
weights for serving.  Quantization is what makes the distributed path
testable to zero mismatches: scores are exact integer dot products, so
argmax/margins are identical for ANY batching (float GEMM blocking may
differ per batch shape), any actor count, and any replay.

Training is a fixture-side concern (the artifact is built once from a
documents table and saved as ``.npz``); serving loads the artifact and
is vectorized per batch: one bincount featurize + one integer matmul.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

QUANT_SCALE = 10_000  # weight quantization: int(round(w * QUANT_SCALE))


def _utf8_bytes_and_offsets(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (byte buffer, offsets) of a string column, lowercased
    ASCII-wise (A-Z -> a-z; multibyte UTF-8 passes through unchanged)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.cast(pa.large_string())
    if col.null_count:
        col = col.fill_null("")
    buf = np.frombuffer(col.buffers()[2], dtype=np.uint8) if col.buffers()[2] \
        else np.empty(0, dtype=np.uint8)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[col.offset:
                                                           col.offset + len(col) + 1]
    lo, hi = int(offs[0]), int(offs[-1])
    b = buf[lo:hi].copy()
    b[(b >= 65) & (b <= 90)] += 32
    return b, (offs - lo).astype(np.int64)


def trigram_counts(col, n_buckets: int) -> np.ndarray:
    """(n_docs, n_buckets) int64 hashed char-trigram counts — fully
    vectorized: one rolling hash over the concatenated byte buffer, one
    bincount; trigrams never cross document boundaries."""
    b, offs = _utf8_bytes_and_offsets(col)
    n = len(offs) - 1
    out_len = len(b)
    if out_len < 3 or n == 0:
        return np.zeros((n, n_buckets), dtype=np.int64)
    h = (b[:-2].astype(np.uint32) * np.uint32(31 * 31)
         + b[1:-1].astype(np.uint32) * np.uint32(31)
         + b[2:].astype(np.uint32)) % np.uint32(n_buckets)
    # row of each trigram start position; valid iff the trigram fits
    # inside its own document
    lens = np.diff(offs)
    row = np.repeat(np.arange(n, dtype=np.int64), lens)[: len(h)]
    pos_in_doc = np.arange(len(h), dtype=np.int64) - offs[row]
    valid = pos_in_doc <= (lens[row] - 3)
    idx = row[valid] * n_buckets + h[valid].astype(np.int64)
    return np.bincount(idx, minlength=n * n_buckets).reshape(n, n_buckets)


def train_lang_model(texts, labels, n_buckets: int = 1024, iters: int = 120,
                     lr: float = 2.0, l2: float = 1e-4) -> dict:
    """Deterministic softmax regression on length-normalized trigram
    counts; returns the QUANTIZED serving artifact dict."""
    X = trigram_counts(texts, n_buckets).astype(np.float64)
    lens = np.maximum(X.sum(axis=1, keepdims=True), 1.0)
    X /= lens
    classes = sorted(set(str(v) for v in labels))
    y = np.array([classes.index(str(v)) for v in labels])
    n, c = len(y), len(classes)
    W = np.zeros((n_buckets, c))
    b = np.zeros(c)
    onehot = np.eye(c)[y]
    for _ in range(iters):
        z = X @ W + b
        z -= z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        g = (p - onehot) / n
        W -= lr * (X.T @ g + l2 * W)
        b -= lr * g.sum(axis=0)
    return {
        "W": np.round(W * QUANT_SCALE).astype(np.int64),
        "b": np.round(b * QUANT_SCALE).astype(np.int64),
        "classes": np.asarray(classes),
        "n_buckets": np.int64(n_buckets),
    }


def save_lang_model(path: str, model: dict) -> None:
    np.savez(path, **model)


def load_lang_model(path: str) -> dict:
    d = np.load(path, allow_pickle=False)
    return {"W": d["W"], "b": d["b"],
            "classes": [str(c) for c in d["classes"]],
            "n_buckets": int(d["n_buckets"])}


def fit_save_lang_model(documents_path: str, model_path: str,
                        text_col: str = "text", label_col: str = "lang",
                        n_buckets: int = 1024) -> dict:
    """Train from a documents parquet and persist the artifact (the
    fixture-generator step that builds what the scorer stage loads)."""
    import pyarrow.parquet as pq

    t = pq.read_table(documents_path, columns=[text_col, label_col])
    model = train_lang_model(t[text_col], t[label_col].to_pylist(),
                             n_buckets=n_buckets)
    save_lang_model(model_path, model)
    return model


def score_texts(col, model: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """EXACT integer scoring: ``counts @ W_q + n_trigrams * b_q`` (the
    length-normalized training score scaled by the positive per-row
    trigram count — argmax-invariant, and bit-identical under any
    batching).  Returns (pred_class_index, best_score, margin)."""
    counts = trigram_counts(col, model["n_buckets"])
    ntri = counts.sum(axis=1, keepdims=True)
    scores = counts @ model["W"] + ntri * model["b"]
    order = np.argsort(scores, axis=1, kind="stable")
    pred = order[:, -1]
    best = np.take_along_axis(scores, order[:, -1:], axis=1)[:, 0]
    second = (np.take_along_axis(scores, order[:, -2:-1], axis=1)[:, 0]
              if scores.shape[1] > 1 else np.zeros(len(pred), dtype=np.int64))
    return pred, best, best - second
