"""Distributed BPE (byte-pair encoding) vocabulary training + apply.

Shape — the one production BPE trainers use (Sennrich et al. 2016;
HuggingFace tokenizers' trainer): the corpus collapses FIRST to a
(word, count) table — one combiner-style exchange of per-block partials,
the only all-to-all in the whole operator — and every merge decision is
computed from that compact table, never from the corpus again.  At
100 TB the word table is capped at the top-``max_words`` words by
frequency (the standard frequency cutoff every real trainer applies),
so the merge loop's input is O(vocab), independent of corpus size, and
runs on the driver exactly like the IVF/PQ codebook fit in
``stages/similarity.py``.

Apply is the reverse broadcast: the learned merge ranks (a few hundred
string pairs) ship once via ``ray.put`` and each batch segments only its
UNIQUE words (cache per actor), then maps per-word token counts back to
rows — per-batch work is O(unique words), not O(rows).

Beyond-reference (LLM training-data layer); the word-count exchange is
the same shape as the reference's value_counts analog
(kiln ``src/transform/process_data.py`` tag counting).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import fingerprint as fp

EOW = "\x00"  # end-of-word sentinel (NUL never occurs in the corpus; a
# collision would affect trainer and reference identically, so the check holds)


# ---------------------------------------------------------------------------
# Pass 1: corpus -> (word, count) table
# ---------------------------------------------------------------------------

def word_count_partial(batch: pa.Table, text_col: str = "text") -> pd.DataFrame:
    """Per-block (word, n) partials — the combiner before the one exchange."""
    pl = fp._polars()
    s = pl.Series(batch[text_col].combine_chunks().cast(pa.large_string()))
    words = s.str.extract_all(r"\S+").explode().drop_nulls()
    vc = words.value_counts()
    return pd.DataFrame({"word": vc[vc.columns[0]].to_pandas(),
                         "n": vc["count"].to_numpy().astype(np.int64)})


def word_count_sweep(t: pa.Table) -> pd.DataFrame:
    return t.to_pandas().groupby("word", sort=False)["n"].sum().reset_index()


def top_words(counts: pd.DataFrame, max_words: int) -> pd.DataFrame:
    """Deterministic frequency cutoff: (n DESC, word ASC), stable."""
    return (counts.sort_values(["n", "word"], ascending=[False, True],
                               kind="stable")
            .head(max_words).reset_index(drop=True))


# ---------------------------------------------------------------------------
# Pass 2: merge loop over the compact (word, count) table
# ---------------------------------------------------------------------------

def train_merges_from_counts(words, counts, n_merges: int) -> pd.DataFrame:
    """Classic BPE trainer with incremental pair-count maintenance.

    Each word is a symbol list (chars + EOW); pair counts are weighted by
    word count.  Ties break to the lexicographically smallest (left,
    right) pair, so the result is deterministic.  Incremental delta
    updates (only words containing the merged pair are rescanned) — the
    naive recount-per-iteration formulation lives in
    ``reference_train_merges`` and is what the ``_check`` query compares
    against.
    """
    syms = [list(w) + [EOW] for w in words]
    wcount = [int(c) for c in counts]

    pair_n: dict[tuple, int] = {}
    pair_words: dict[tuple, set] = {}
    for wi, s in enumerate(syms):
        c = wcount[wi]
        for a, b in zip(s, s[1:]):
            p = (a, b)
            pair_n[p] = pair_n.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)

    out_rank, out_left, out_right, out_n = [], [], [], []
    for rank in range(n_merges):
        live = [(p, n) for p, n in pair_n.items() if n > 0]
        if not live:
            break
        best, best_n = min(live, key=lambda kv: (-kv[1], kv[0]))
        out_rank.append(rank)
        out_left.append(best[0])
        out_right.append(best[1])
        out_n.append(best_n)
        merged = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            s = syms[wi]
            c = wcount[wi]
            # remove this word's old pair contributions
            for a, b in zip(s, s[1:]):
                p = (a, b)
                pair_n[p] -= c
                if pair_n[p] <= 0:
                    pair_n.pop(p, None)
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
            # left-to-right non-overlapping merge of `best` in the word
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[wi] = ns
            for a, b in zip(ns, ns[1:]):
                p = (a, b)
                pair_n[p] = pair_n.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)
    return pd.DataFrame({
        "merge_rank": pd.array(out_rank, dtype="int64"),
        "left": out_left, "right": out_right,
        "pair_count": pd.array(out_n, dtype="int64"),
    })


def reference_train_merges(words, counts, n_merges: int) -> pd.DataFrame:
    """Paper-pseudocode trainer: full pair recount every iteration
    (Sennrich et al. 2016 Fig. 1 shape).  Only used by the ``_check``
    query as the independent recompute — shares no state-update code
    with ``train_merges_from_counts``."""
    syms = {w: list(w) + [EOW] for w in words}
    wc = dict(zip(words, (int(c) for c in counts)))
    rows = []
    for rank in range(n_merges):
        pairs: dict[tuple, int] = {}
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + wc[w]
        if not pairs:
            break
        best, best_n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append((rank, best[0], best[1], best_n))
        for w, s in syms.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                    ns.append(best[0] + best[1])
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return pd.DataFrame({
        "merge_rank": pd.array([r[0] for r in rows], dtype="int64"),
        "left": [r[1] for r in rows], "right": [r[2] for r in rows],
        "pair_count": pd.array([r[3] for r in rows], dtype="int64"),
    })


# ---------------------------------------------------------------------------
# Apply: segment words with a learned merge table
# ---------------------------------------------------------------------------

def segment_greedy(word: str, ranks: dict) -> list:
    """GPT-2-style apply: repeatedly merge the LOWEST-RANK pair present."""
    s = list(word) + [EOW]
    while len(s) > 1:
        best_rank, best = None, None
        for p in zip(s, s[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        ns, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                ns.append(best[0] + best[1])
                i += 2
            else:
                ns.append(s[i])
                i += 1
        s = ns
    return s


def segment_in_order(word: str, merges: list) -> list:
    """Reference apply: replay merges in TRAINING ORDER (equivalent to
    greedy lowest-rank for BPE — later merges only consume symbols built
    by earlier ones; the ``_check`` query exploits the equivalence as an
    independent recompute)."""
    s = list(word) + [EOW]
    for left, right in merges:
        ns, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                ns.append(left + right)
                i += 2
            else:
                ns.append(s[i])
                i += 1
        s = ns
    return s


class BpeTokenCounter:
    """Actor-pool apply stage: merge ranks fetched once in ``__init__``,
    per-batch work is segment-unique-words (memoized across batches in
    ``self._cache``) + a vectorized word->n_tokens map over the rows."""

    def __init__(self, ranks_ref) -> None:
        import ray
        self.ranks = ray.get(ranks_ref)
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        pl = fp._polars()
        s = pl.Series(batch["text"].combine_chunks().cast(pa.large_string()))
        lists = s.str.extract_all(r"\S+")
        lens = lists.list.len().to_numpy().astype(np.int64)
        flat = lists.explode().drop_nulls().to_pandas().to_numpy()
        uniq, inv = np.unique(flat, return_inverse=True) if len(flat) else \
            (np.array([], dtype=object), np.array([], dtype=np.int64))
        ntok_u = np.empty(len(uniq), np.int64)
        for i, w in enumerate(uniq):
            n = self._cache.get(w)
            if n is None:
                n = len(segment_greedy(w, self.ranks))
                self._cache[w] = n
            ntok_u[i] = n
        per_word = ntok_u[inv] if len(flat) else ntok_u
        sums = np.zeros(len(lens), np.int64)
        nz = lens > 0
        if nz.any():
            offsets = np.zeros(int(nz.sum()), np.int64)
            np.cumsum(lens[nz][:-1], out=offsets[1:])
            sums[nz] = np.add.reduceat(per_word, offsets)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_words": pa.array(lens, pa.int64()),
            "n_bpe_tokens": pa.array(sums, pa.int64()),
        })
