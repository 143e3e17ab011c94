"""BPE trainer/apply kernel unit tests (pure functions, no Ray needed
except the one actor-pool apply smoke that rides the session fixture)."""

import numpy as np
import pandas as pd
import pytest

from flink_fingerprint_ray.stages.bpe import (
    EOW,
    reference_train_merges,
    segment_greedy,
    segment_in_order,
    top_words,
    train_merges_from_counts,
)

WORDS = ["lower", "lowest", "newer", "newest", "wider", "low", "new"]
COUNTS = [5, 2, 6, 3, 3, 7, 4]


def test_trainer_matches_paper_reference():
    eng = train_merges_from_counts(WORDS, COUNTS, 20)
    ref = reference_train_merges(WORDS, COUNTS, 20)
    pd.testing.assert_frame_equal(eng, ref)


def test_trainer_stops_when_pairs_exhausted():
    # single 2-symbol word: one merge consumes everything
    out = train_merges_from_counts(["ab"], [3], 10)
    # ab+EOW: merge (a,b) -> [ab,EOW]; merge (ab,EOW) -> [abEOW];
    # no pairs remain -> stops after 2 of the requested 10
    assert len(out) == 2
    ref = reference_train_merges(["ab"], [3], 10)
    pd.testing.assert_frame_equal(out, ref)


def test_trainer_tiebreak_is_lexicographic():
    # all four pairs tie at n=2; EOW (NUL) sorts before any letter, so the
    # lexicographic tie-break picks ('a', EOW) deterministically
    out = train_merges_from_counts(["aa", "bb"], [2, 2], 1)
    assert (out["left"][0], out["right"][0]) == ("a", EOW)


def test_greedy_apply_equals_in_order_apply():
    merges_df = train_merges_from_counts(WORDS, COUNTS, 12)
    merges = list(zip(merges_df["left"], merges_df["right"]))
    ranks = {p: i for i, p in enumerate(merges)}
    for w in WORDS + ["newly", "widest", "l", ""]:
        assert segment_greedy(w, ranks) == segment_in_order(w, merges), w


def test_segment_roundtrip_covers_word():
    merges_df = train_merges_from_counts(WORDS, COUNTS, 12)
    ranks = {(l, r): i for i, (l, r)
             in enumerate(zip(merges_df["left"], merges_df["right"]))}
    for w in WORDS:
        assert "".join(segment_greedy(w, ranks)) == w + EOW


def test_top_words_deterministic_cutoff():
    df = pd.DataFrame({"word": ["b", "a", "c"], "n": [5, 5, 9]})
    top = top_words(df, 2)
    assert list(top["word"]) == ["c", "a"]  # count desc, then word asc


def test_token_counter_stage_matches_reference(ray_session):
    import pyarrow as pa
    import ray

    from flink_fingerprint_ray.stages.bpe import BpeTokenCounter

    merges_df = train_merges_from_counts(WORDS, COUNTS, 12)
    ranks = {(l, r): i for i, (l, r)
             in enumerate(zip(merges_df["left"], merges_df["right"]))}
    merges = list(zip(merges_df["left"], merges_df["right"]))
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["lower newest wider", "", "new new newly low"],
    })
    out = (ray.data.from_arrow(docs)
           .map_batches(BpeTokenCounter,
                        fn_constructor_kwargs={"ranks_ref": ray.put(ranks)},
                        concurrency=1, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want_tokens = [
        sum(len(segment_in_order(w, merges)) for w in t.split())
        for t in docs["text"].to_pylist()
    ]
    assert list(out["n_words"]) == [3, 0, 4]
    assert list(out["n_bpe_tokens"]) == want_tokens
