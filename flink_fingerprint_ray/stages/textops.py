"""Actor-pool text-analysis stages over a documents table: language-ID,
quality scoring, token counting, rolling-hash fingerprints.

Each stage is a callable CLASS for ``map_batches(Cls, concurrency=N)`` —
model/pattern state built once per actor in ``__init__`` (the T5/T6
stateful-stage pattern of the reference, SURVEY.md §2.3), vectorized
kernels from ``functions/textstats.py`` in ``__call__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import fingerprint as fp
from ..functions.textstats import (
    LangIdModel,
    bpe_ish_token_count,
    quality_features,
    rolling_fingerprint,
    whitespace_token_count,
)


class TextFeatureStage:
    """tokens / quality / fingerprint features per document."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch[self.text_col]
        feats = quality_features(t)
        out = batch
        out = out.append_column("n_tokens_ws", whitespace_token_count(t).cast(pa.int64()))
        out = out.append_column("n_tokens_bpe", bpe_ish_token_count(t).cast(pa.int64()))
        for name in ("mean_token_len", "punct_ratio", "stopword_ratio",
                     "upper_ratio", "digit_ratio", "quality_score"):
            out = out.append_column(name, pa.array(np.round(feats[name], 6), pa.float64()))
        out = out.append_column("doc_fingerprint", pa.array(rolling_fingerprint(t), pa.uint64()))
        out = out.append_column("simhash", pa.array(fp.simhash(t), pa.uint64()))
        return out


class LangIdStage:
    """Language-ID actor stage: marker tables compiled once per actor."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred") -> None:
        self.text_col = text_col
        self.out_col = out_col
        self.model = LangIdModel()  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        pred = self.model.predict(batch[self.text_col])
        return batch.append_column(self.out_col, pa.array(pred, pa.string()))
