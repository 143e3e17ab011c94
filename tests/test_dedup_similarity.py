"""Dedup-suite and similarity-search correctness on corpora with KNOWN
duplicate structure."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from flink_fingerprint_ray.stages import dedup as dd
from flink_fingerprint_ray.stages import similarity as sim


@pytest.fixture(scope="module")
def doc_ds(ray_session):
    """120 docs: 3 known exact-dup clusters, 2 near-dup clusters, rest unique."""
    import ray.data

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(300)]
    texts, kinds = [], []
    originals = []
    for i in range(100):
        toks = [vocab[rng.randint(len(vocab))] for _ in range(30)]
        originals.append(toks)
        texts.append(" ".join(toks))
        kinds.append("unique")
    # exact dups: docs 100..105 copy docs 0,1,2 (two copies each)
    for j in range(3):
        texts += [" ".join(originals[j])] * 2
        kinds += ["exact"] * 2
    # near dups: docs 106..109 are 1-token edits of docs 10, 11
    for j in (10, 11):
        t = list(originals[j])
        t[5] = "EDITED"
        texts += [" ".join(t), " ".join(originals[j])]
        kinds += ["near"] * 2
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                    "text": pa.array(texts)})
    return ray.data.from_arrow(tbl), texts


def test_exact_dedup(doc_ds):
    ds, texts = doc_ds
    out = dd.exact_dedup(ds, "doc_id").to_pandas()
    expected = pd.Series(texts).groupby(pd.Series(texts)).size()
    assert len(out) == len(set(texts))
    assert out["n_dups"].sum() == len(texts)
    assert sorted(out["n_dups"].value_counts().to_dict().items()) == sorted(
        expected.value_counts().to_dict().items()
    )


def test_minhash_lsh_finds_known_clusters(doc_ds):
    ds, texts = doc_ds
    edges = dd.minhash_lsh_edges(ds, "doc_id", threshold=0.7)
    clusters = dd.cluster_table(edges)
    # the 3 exact-dup trios (0,100,101), (1,102,103), (2,104,105)
    for base, a, b in ((0, 100, 101), (1, 102, 103), (2, 104, 105)):
        cl = clusters[clusters["member_id"].isin([base, a, b])]
        assert len(cl) == 3 and cl["cluster_id"].nunique() == 1
    # near-dup pairs land in clusters with their originals
    near_members = clusters[clusters["member_id"] >= 106]
    assert len(near_members) >= 2


def test_simhash_clusters_catch_exact_dups(doc_ds):
    ds, _ = doc_ds
    clusters = dd.cluster_table(dd.simhash_edges(ds, "doc_id", max_hamming=3))
    for base, a, b in ((0, 100, 101), (1, 102, 103), (2, 104, 105)):
        cl = clusters[clusters["member_id"].isin([base, a, b])]
        assert len(cl) == 3 and cl["cluster_id"].nunique() == 1


def test_single_process_references_match_engine(doc_ds):
    """The check-query recomputes (bucket all-pairs / brute hamming +
    independent label propagation) agree row-exactly with the distributed
    pipelines on the planted corpus."""
    ds, texts = doc_ds
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                    "text": pa.array(texts)})
    eng_mh = dd.cluster_table(dd.minhash_lsh_edges(ds, "doc_id", threshold=0.8))
    ref_mh = dd.minhash_reference_clusters(
        tbl["doc_id"].to_numpy(), tbl["text"], threshold=0.8)
    assert dd.clusters_mismatch(eng_mh, ref_mh)["mismatch_rows"][0] == 0
    eng_sh = dd.cluster_table(dd.simhash_edges(ds, "doc_id", max_hamming=3))
    ref_sh = dd.simhash_reference_clusters(
        tbl["doc_id"].to_numpy(), tbl["text"], max_hamming=3)
    assert dd.clusters_mismatch(eng_sh, ref_sh)["mismatch_rows"][0] == 0
    # and the reference actually finds the planted trios
    for base, a, b in ((0, 100, 101), (1, 102, 103), (2, 104, 105)):
        cl = ref_mh[ref_mh["member_id"].isin([base, a, b])]
        assert len(cl) == 3 and cl["cluster_id"].nunique() == 1


def test_ngram_jaccard_exact_confirm(doc_ds):
    ds, _ = doc_ds
    clusters = dd.cluster_table(dd.ngram_jaccard_edges(ds, "doc_id", threshold=0.99))
    # at threshold 0.99 only exact dups survive the EXACT jaccard confirm:
    # the three trios plus the two original-copies from the near-dup block
    # (106/108 are the edited variants and must NOT appear)
    assert set(clusters["member_id"]) == {0, 100, 101, 1, 102, 103, 2, 104, 105, 10, 107, 11, 109}


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    import ray.data

    rng = np.random.RandomState(9)
    centers = rng.randn(6, 32)
    vecs = np.concatenate([c + 0.05 * rng.randn(40, 32) for c in centers])
    ids = np.arange(len(vecs), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(vecs.astype(np.float32))),
    })
    return ray.data.from_arrow(tbl), vecs, ids


def test_embedding_pairs_match_numpy(vec_ds):
    ds, vecs, ids = vec_ds
    out = dd.embedding_cosine_pairs(ds, threshold=0.99).to_pandas()
    v = vecs.astype(np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = vn @ vn.T
    micros = np.floor(sims * 1e6 + 0.5).astype(np.int64)
    iu = np.triu_indices(len(v), k=1)
    expect = int((micros[iu] >= 990_000).sum())
    assert len(out) == expect > 0


def test_brute_force_topk_matches_numpy(vec_ds):
    ds, vecs, ids = vec_ds
    q = vecs[:4]
    out = sim.brute_force_topk(ds, q, ids[:4], k=3)
    v = vecs.astype(np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = vn[:4] @ vn.T
    for qi in range(4):
        s = sims[qi].copy()
        s[qi] = -np.inf
        order = np.lexsort((ids, -np.floor(s * 1e6 + 0.5)))
        expect = ids[order[:3]].tolist()
        got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert got == expect


def test_ivf_recall(vec_ds):
    ds, vecs, ids = vec_ds
    cents = sim.train_centroids(vecs, n_cells=6, seed=0)
    exact = sim.brute_force_topk(ds, vecs[:8], ids[:8], k=5)
    approx = sim.ivf_topk(ds, vecs[:8], ids[:8], cents, k=5, n_probe=3)
    assert sim.ivf_recall(exact, approx) >= 0.9


def test_pq_recall_and_code_shape(vec_ds):
    """ADC+rerank PQ: codes are m_sub uint8 per vector (the compressed
    stored form), encoding is deterministic, and shortlist+exact-rerank
    recall vs brute force stays high."""
    ds, vecs, ids = vec_ds
    books = sim.train_pq(vecs, m_sub=8, n_codes=32, seed=0)
    assert books.shape[0] == 8 and books.shape[2] == vecs.shape[1] // 8
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    c1, c2 = sim._pq_codes(vn, books), sim._pq_codes(vn, books)
    assert c1.dtype == np.uint8 and (c1 == c2).all()
    exact = sim.brute_force_topk(ds, vecs[:8], ids[:8], k=5)
    # this fixture's clusters are TIGHTER than the PQ quantization error
    # (within-cluster sims ~0.998), so ADC cannot rank inside a cluster;
    # the rerank shortlist must cover the whole 40-member cluster for the
    # exact pass to fix the order — which is precisely the knob's job
    approx = sim.pq_topk(ds, vecs[:8], ids[:8], books, k=5, rerank=48)
    assert sim.ivf_recall(exact, approx) >= 0.9
    tagged = sim.pq_assign(ds, books).take_batch(10, batch_format="pyarrow")
    assert tagged["pq_code"].type.list_size == 8


def test_distributed_components_matches_union_find(ray_session):
    """Scale-path CC (hash-partitioned min-label propagation) must produce
    the exact cluster table of the driver-side union-find."""
    import numpy as np
    import pandas as pd
    import ray.data

    from flink_fingerprint_ray.stages.dedup import (
        distributed_components,
        edges_to_clusters,
    )

    rng = np.random.RandomState(5)
    # random graph: 300 nodes, chains + stars + isolated pairs
    a = rng.randint(0, 300, size=250)
    b = rng.randint(0, 300, size=250)
    keep = a != b
    edges = pd.DataFrame({"a": np.minimum(a, b)[keep].astype("int64"),
                          "b": np.maximum(a, b)[keep].astype("int64")})
    want = edges_to_clusters(edges)
    got = distributed_components(ray.data.from_pandas(edges))
    pd.testing.assert_frame_equal(got, want)


def test_embedding_lsh_recall_vs_exact(ray_session):
    """LSH near-dup pairs at a near-dup threshold must (a) be a subset of
    the exact pairs with identical sims, (b) reach high recall."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from flink_fingerprint_ray.stages.dedup import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_lsh,
    )

    rng = np.random.RandomState(9)
    # 40 cluster centers; 4 jittered members each → many >=0.9-cos pairs
    centers = rng.randn(40, 32)
    vecs, ids = [], []
    for i, c in enumerate(centers):
        for j in range(4):
            v = c + 0.05 * rng.randn(32)
            vecs.append(v)
            ids.append(i * 4 + j)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(tbl)
    exact = embedding_cosine_pairs(ds, threshold=0.9).to_pandas()
    lsh = embedding_cosine_pairs_lsh(
        ray.data.from_arrow(tbl), threshold=0.9).to_pandas()
    assert len(exact) > 50
    ek = set(zip(exact["id_a"], exact["id_b"]))
    lk = set(zip(lsh["id_a"], lsh["id_b"]))
    assert lk <= ek                      # no false pairs (exact confirm)
    assert len(lk) / len(ek) >= 0.9      # high recall at near-dup threshold
    merged = lsh.merge(exact, on=["id_a", "id_b"], suffixes=("_l", "_e"))
    assert (merged["cos_sim_micros_l"] == merged["cos_sim_micros_e"]).all()


def test_canonical_docs_priority_keep_on_planted_dups(ray_session):
    """Exact-dup groups spanning sources must keep the (source, doc_id)-
    minimal copy; held to DuckDB's window-function answer on the same
    table (the sf fixtures have no exact dups below sf0.1, so the
    priority-keep branch is exercised here)."""
    import duckdb
    import ray.data

    from flink_fingerprint_ray.pipelines.queries import (
        SQL_CANONICAL_DOCS, _canonical_sweep)
    from flink_fingerprint_ray.stages.shuffle import grouped_map

    rng = np.random.RandomState(11)
    texts, sources, ids = [], [], []
    nid = 0
    for g in range(12):
        body = " ".join(f"w{rng.randint(400)}" for _ in range(25))
        n_copies = 3 if g < 5 else 1
        for c in range(n_copies):
            texts.append(body)
            # later copies get LOWER-priority ids but varied sources so
            # min-(source, id) differs from min-id for some groups
            sources.append(f"src{(g * 7 + c * 3) % 5}")
            ids.append(nid)
            nid += 1
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "source": pa.array(sources, pa.string())})
    ds = ray.data.from_arrow(tbl).repartition(4)
    narrow = ds.map_batches(
        lambda b: dd.add_text_hash(b).select(["text_hash", "doc_id", "source"]),
        batch_format="pyarrow")
    eng = (grouped_map(narrow, ["text_hash"], _canonical_sweep).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", tbl)
    ora = (con.execute(SQL_CANONICAL_DOCS).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng[["doc_id", "source", "n_dups"]],
                                  ora[["doc_id", "source", "n_dups"]],
                                  check_dtype=False)
    assert (eng["n_dups"] > 1).sum() == 5  # the planted triples collapsed


def test_semantic_dedup_matches_reference_across_splits(vec_ds):
    """Distributed SemDeDup (block-parallel EM + hash-exchanged confirm)
    must be bit-identical to the single-process reference regardless of
    how rows are blocked."""
    from flink_fingerprint_ray.stages import semantic as sm

    ds, vecs, ids = vec_ds
    for n_blocks in (1, 5):
        mm = sm.semantic_dedup_mismatch(
            ds.repartition(n_blocks), threshold=0.95, k=6, iters=6)
        assert int(mm["mismatch_rows"][0]) == 0


def test_semantic_dedup_keeps_one_per_planted_group(ray_session):
    """Planted duplicate groups (cos > 0.99 within, far apart between):
    exactly the lowest id of each group survives; singletons all survive."""
    import ray.data

    from flink_fingerprint_ray.stages import semantic as sm

    rng = np.random.RandomState(17)
    dim = 48
    vecs, ids, group_of = [], [], {}
    next_id = 0
    for g in range(30):
        base = rng.randn(dim)
        base /= np.linalg.norm(base)
        n_members = 3 if g < 10 else 1   # 10 dup triples, 20 singletons
        for _ in range(n_members):
            v = base + 0.01 * rng.randn(dim)   # cos > 0.99 within group
            vecs.append(v)
            group_of[next_id] = g
            ids.append(next_id)
            next_id += 1
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)
    df = sm.semantic_dedup_table(ds, threshold=0.95, k=8, iters=8)
    kept = set(df.loc[df["is_kept"] == 1, "vec_id"])
    by_group = {}
    for vid, g in group_of.items():
        by_group.setdefault(g, []).append(vid)
    for g, members in by_group.items():
        kept_members = sorted(m for m in members if m in kept)
        assert kept_members == [min(members)], (g, kept_members)


def test_distributed_pagerank_matches_reference(ray_session):
    """Random graphs: the hash-partitioned power iteration equals the
    single-process recompute within float-order tolerance, and on a star
    graph the hub outranks every leaf."""
    import ray.data

    from flink_fingerprint_ray.stages.graph import (
        distributed_pagerank,
        reference_pagerank,
    )

    rng = np.random.RandomState(3)
    for trial in range(3):
        n = 60 + 40 * trial
        edges = pd.DataFrame({
            "src": rng.randint(0, n, 4 * n).astype(np.int64),
            "dst": rng.randint(0, n, 4 * n).astype(np.int64),
        })
        edges = edges[edges["src"] != edges["dst"]].drop_duplicates()
        ds = ray.data.from_pandas(edges).repartition(3)
        dist = distributed_pagerank(ds, iters=10)
        ref = reference_pagerank(edges, iters=10)
        m = dist.merge(ref, on="node", suffixes=("_d", "_r"))
        assert len(m) == len(ref) == len(dist)
        assert (m["rank_micros_d"] - m["rank_micros_r"]).abs().max() <= 2

    star = pd.DataFrame({"src": np.zeros(20, np.int64),
                         "dst": np.arange(1, 21, dtype=np.int64)})
    pr = distributed_pagerank(ray.data.from_pandas(star), iters=10)
    hub = pr.loc[pr["node"] == 0, "rank_micros"].iloc[0]
    assert (pr.loc[pr["node"] != 0, "rank_micros"] < hub).all()
