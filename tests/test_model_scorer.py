"""Real-model T6 scorer stage: training determinism, exact quantized
scoring, actor-pool parity, and backpressure under a slow scorer."""

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from flink_fingerprint_ray.functions.model import (
    load_lang_model,
    save_lang_model,
    score_texts,
    train_lang_model,
    trigram_counts,
)

SF = "/root/testdata/sf0.001"


def test_trigram_counts_basic():
    col = pa.array(["abcabc", "AB", "", "xyz"])
    c = trigram_counts(col, 64)
    assert c.shape == (4, 64)
    # "abcabc" has 4 trigrams, "AB"/"" none, "xyz" one
    assert c.sum(axis=1).tolist() == [4, 0, 0, 1]
    # lowercasing: "ABC" and "abc" hash identically
    c2 = trigram_counts(pa.array(["ABCabc"]), 64)
    assert c2.sum() == 4


def test_train_is_deterministic_and_learns(tmp_path):
    from flink_fingerprint_ray.fixtures import make_labeled_corpus

    t = make_labeled_corpus(seed=77)
    m1 = train_lang_model(t["text"], t["label"].to_pylist())
    m2 = train_lang_model(t["text"], t["label"].to_pylist())
    assert np.array_equal(m1["W"], m2["W"]) and np.array_equal(m1["b"], m2["b"])
    path = str(tmp_path / "m.npz")
    save_lang_model(path, m1)
    m3 = load_lang_model(path)
    held = make_labeled_corpus(seed=78)  # held-out: different seed
    pred, best, margin = score_texts(held["text"], m3)
    classes = np.asarray(m3["classes"], dtype=object)
    acc = (classes[pred] == np.asarray(held["label"], dtype=object)).mean()
    assert acc >= 0.9  # a real trained model, not noise
    assert (margin >= 0).all()


def test_scoring_batch_invariant(tmp_path):
    """Quantized integer scores must be bit-identical under any batching
    — the property that lets the distributed check pin 0 mismatches."""
    import pyarrow.parquet as pq

    from flink_fingerprint_ray.fixtures import make_labeled_corpus

    c = make_labeled_corpus(seed=77)
    m = train_lang_model(c["text"], c["label"].to_pylist())
    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["text"])
    _, full, _ = score_texts(t["text"], m)
    parts = []
    for lo in range(0, t.num_rows, 37):
        _, s, _ = score_texts(t.slice(lo, 37)["text"], m)
        parts.append(s)
    assert np.array_equal(full, np.concatenate(parts))


def test_distributed_matches_single_process(ray_session):
    import __ray_entry__ as entrymod

    df = entrymod.queries()["model_lang_score_check"](SF)
    assert df["mismatch_rows"].iloc[0] == 0
    assert df["accuracy_floor"].iloc[0] == 1


def test_slow_scorer_backpressure(ray_session, tmp_path):
    """A deliberately slow scorer on a (1, 3) actor pool: Ray Data must
    bound in-flight batches to the pool size (each actor processes one
    batch at a time) while still scaling the pool up — the
    batching/backpressure behavior the reference's throttled LLM stage
    relies on (llm_job.py:254-332)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from flink_fingerprint_ray.pipelines.queries import _lang_model_path
    from flink_fingerprint_ray.stages.textops import ModelScorerStage

    @ray.remote(num_cpus=0)
    class Gauge:
        def __init__(self):
            self.cur = 0
            self.peak = 0
            self.calls = 0

        def enter(self):
            self.cur += 1
            self.calls += 1
            self.peak = max(self.peak, self.cur)

        def exit(self):
            self.cur -= 1

        def stats(self):
            return self.cur, self.peak, self.calls

    gauge = Gauge.remote()
    model_path = _lang_model_path(SF)

    class SlowScorer(ModelScorerStage):
        def __init__(self):
            super().__init__(model_path)

        def __call__(self, batch):
            ray.get(gauge.enter.remote())
            try:
                time.sleep(0.05)
                return super().__call__(batch)
            finally:
                gauge.exit.remote()

    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"])
    ds = ray.data.from_arrow(t).repartition(25)
    out = ds.map_batches(SlowScorer, concurrency=(1, 3), batch_size=20,
                         batch_format="pyarrow") \
        .select_columns(["doc_id", "model_lang"]).to_pandas()
    cur, peak, calls = ray.get(gauge.stats.remote())
    assert cur == 0
    assert calls >= 25
    assert 1 <= peak <= 3  # bounded in-flight batches == pool cap
    # outputs still oracle-pinned under the slow path
    model = load_lang_model(model_path)
    pred, _, _ = score_texts(t["text"], model)
    classes = np.asarray(model["classes"], dtype=object)
    ref = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(),
                        "model_lang": classes[pred]})
    got = out.sort_values("doc_id").reset_index(drop=True)
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)
