#!/usr/bin/env python
"""Benchmark harness for the Ray-Data-native fingerprint engine.

Default mode: runs the headline streaming fingerprint pipeline (epoched
page stream -> fingerprint -> windows -> state -> join -> fenced sink)
plus the operator query suite over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``), under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32).  Prints ONE JSON line:

    {"metric": ..., "value": <headline seconds>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline pipeline twice in FRESH processes
(num_cpus=8 then num_cpus=32) on the same input and reports both
throughputs plus efficiency = thr32 / (4 * thr8)  (sandbox proxy for
the N -> 4N node criterion; see BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Headline corpus size: deterministic seeded page stream (FIXTURES.md F1).
N_DOCS = int(os.environ.get("BENCH_N_DOCS", "960000"))
N_EPOCHS = int(os.environ.get("BENCH_N_EPOCHS", "4"))

# Queries skipped in the timed suite: O(n^2) pair materialization and the
# *_check invariant probes are correctness oracles (each runs an engine
# pipeline PLUS a single-process recompute), not throughput paths — the
# underlying operators are all timed under their own names.
SKIP_QUERIES = {
    "embedding_near_pairs",
    "minhash_lsh_clusters_check",
    "simhash_clusters_check",
    "semantic_dedup_check",
    "ann_topk_ivf_check",
    "ann_topk_pq_check",
    "ann_topk_ivfpq_check",
    "supplier_pagerank_check",
    "lowess_smooth_check",
    "media_image_features_check",
    "media_flac_check",
    "media_mp2_check",
    "media_mp3_check",
    "media_webp_features_check",
    "media_mpeg1_frames_check",
    "countmin_check",
    "winnow_fingerprints_check",
    "host_pagerank_check",
    "pack_greedy_check",
    "host_hits_check",
}


def _init_ray(num_cpus: int) -> None:
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level=logging.ERROR,
        )
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _consume(res) -> int:
    """Materialize a query result enough to force full execution."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_format="pyarrow", batch_size=None):
            n += b.num_rows
        return n
    if isinstance(res, pa.Table):
        return res.num_rows
    if isinstance(res, pd.DataFrame):
        return len(res)
    return 0


def _doc_tokens() -> tuple[int, int]:
    lo, hi = os.environ.get("BENCH_DOC_TOKENS", "12-40").split("-")
    return int(lo), int(hi)


def write_corpus(dest: str, n_docs: int, n_epochs: int) -> int:
    """Seeded deterministic page + update stream on disk (FIXTURES.md
    F1/F2).  Returns total html bytes (for MB/s reporting)."""
    import pyarrow.compute as pc

    from flink_fingerprint_ray import fixtures

    lo, hi = _doc_tokens()
    pages = fixtures.make_pages(n_docs=n_docs, seed=42, n_hosts=200,
                                tokens_lo=lo, tokens_hi=hi)
    updates = fixtures.make_page_updates(pages, seed=43)
    n_bytes = int(pc.sum(pc.binary_length(pages["html"])).as_py())
    fixtures.write_epochs(pages, dest, n_epochs=n_epochs, prefix="pages")
    fixtures.write_epochs(updates, dest, n_epochs=n_epochs, prefix="updates")
    return n_bytes


def run_headline(num_cpus: int, n_docs: int = N_DOCS, n_epochs: int = N_EPOCHS,
                 corpus_dir: str | None = None, neardup: bool = False,
                 channels: bool = False, allowed_ms: int = 0) -> dict:
    """The flagship streaming pipeline on a seeded page stream; returns
    wall seconds + docs/sec.  ``corpus_dir``: pre-generated corpus to
    reuse (the --scaling parent writes it ONCE so both parallelism levels
    read identical files)."""
    from flink_fingerprint_ray.pipelines.streaming import (
        PipelineConfig,
        StreamingFingerprintPipeline,
    )

    tmp = corpus_dir or tempfile.mkdtemp(prefix="ffr_bench_")
    out = tempfile.mkdtemp(prefix="ffr_bench_out_")
    n_bytes = int(os.environ.get("BENCH_CORPUS_BYTES", "0"))
    try:
        if corpus_dir is None:
            n_bytes = write_corpus(tmp, n_docs, n_epochs)
        cfg = PipelineConfig(
            sliding=(120_000, 60_000),
            session_gap_ms=120_000,
            # capped at 8: interleaved A/B at 32 CPUs showed 16 partitions
            # ~35% slower on the fat-doc corpus (2x actor processes, 2x
            # snapshot files, 2x route slices) and no better on the tiny-doc
            # headline; 8 CPUs keeps 4 (8 partitions measured ~40% slower
            # there — actor CPU reservation starves the transform)
            n_state_partitions=min(8, max(4, num_cpus // 2)),
            neardup=neardup,
            # --channels-ab: the round-4d window Top-N + CEP side outputs
            **({"window_topn": 3, "cep_pattern": (">0", "==0")}
               if channels else {}),
            # --lateness-ab: allowed-lateness retention + refire channel
            **({"allowed_lateness_ms": allowed_ms} if allowed_ms else {}),
        )
        pipe = StreamingFingerprintPipeline(
            os.path.join(tmp, "pages"),
            os.path.join(out, "out"),
            updates_root=os.path.join(tmp, "updates"),
            cfg=cfg,
        )
        pipe.ready()  # actor pool spawned before the timed window
        t0 = time.perf_counter()
        res = pipe.run()
        elapsed = time.perf_counter() - t0
        n_out = _consume(pipe.result_dataset())
        pipe.shutdown()
        # scale telemetry riding every bench run (S9 lag + state gauges):
        # epochs_behind is the source-lag analog, buffered rows bound the
        # actor-state footprint the 100-TB design depends on
        per = res.get("per_epoch", [])
        telemetry = {
            "epochs_behind_max": max((m.get("epochs_behind", 0) for m in per), default=0),
            "buffered_rows_max": max(
                (sum(m.get("buffered", {}).values()) for m in per), default=0),
            "buffered_rows_final": sum(per[-1].get("buffered", {}).values()) if per else 0,
            "late_dropped": res.get("late_dropped", 0),
            "distinct_urls_est": res.get("distinct_urls_est", 0),
        }
        if neardup:
            telemetry["neardup_kept"] = int(sum(m.get("neardup_kept", 0) for m in per))
            telemetry["neardup_dropped"] = int(
                sum(m.get("neardup_dropped", 0) for m in per))
        return {
            "sec": round(elapsed, 3),
            "docs_per_sec": round(n_docs / elapsed, 1),
            "mb_per_sec": round(n_bytes / 1e6 / elapsed, 1) if n_bytes else None,
            "corpus_mb": round(n_bytes / 1e6, 1) if n_bytes else None,
            "n_docs": n_docs,
            "n_epochs": n_epochs,
            "n_fingerprints": n_out,
            "telemetry": telemetry,
        }
    finally:
        if corpus_dir is None:
            shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def _warm_pool(num_cpus: int) -> None:
    """Spin up the task-worker pool and its per-worker heavy imports
    (pandas hash tables, the polars tokenizer) before the timed loop, so
    the first query measures its kernels rather than process spawn —
    tumbling_stats read 6.8 s cold vs 1.6 s warm for identical work."""
    import pyarrow as _pa
    import ray.data

    def _touch(b: "_pa.Table") -> "_pa.Table":
        from flink_fingerprint_ray.functions import fingerprint as fp

        fp.text_hash64(_pa.array(["warm"]))
        fp._tokenize(_pa.array(["warm up doc"]))
        return b

    ray.data.range(num_cpus * 4, override_num_blocks=num_cpus * 4) \
        .map_batches(_touch, batch_format="pyarrow").materialize()


def run_queries(sf_dir: str) -> dict[str, float]:
    from flink_fingerprint_ray.pipelines.queries import QUERIES

    _warm_pool(NUM_CPUS)
    times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        if name in SKIP_QUERIES:
            continue
        t0 = time.perf_counter()
        _consume(fn(sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def approx_quality(sf_dir: str) -> dict[str, float]:
    """Quality numbers for the approximate paths, so BENCH records not
    just their speed: IVF recall@k vs the brute-force ground truth."""
    from flink_fingerprint_ray.pipelines.queries import (
        q_ann_topk,
        q_ann_topk_ivf,
        q_ann_topk_pq,
    )
    from flink_fingerprint_ray.stages.similarity import ivf_recall

    exact = q_ann_topk(sf_dir)
    return {
        "ann_topk_ivf_recall": round(ivf_recall(exact, q_ann_topk_ivf(sf_dir)), 4),
        "ann_topk_pq_recall": round(ivf_recall(exact, q_ann_topk_pq(sf_dir)), 4),
    }


def _burn(_):
    x = 0
    for i in range(30_000_000):
        x += i * i
    return x


_CAL_HTML = None  # built once in the parent; shared copy-on-write via fork


def _workload_burn(_):
    """One dose of the pipeline's OWN per-doc kernel chain (extract →
    simhash+minhash → band keys → content hash) over a fixed batch —
    embarrassingly parallel, no Ray, no coordination."""
    from flink_fingerprint_ray.functions import fingerprint as fp

    for _ in range(4):
        t = fp.extract_text(_CAL_HTML)
        sh, mh = fp.simhash_and_minhash(t)
        fp.minhash_band_keys(mh, 16)
        fp.text_hash64(t)
    return 0


def _calibrations(lo: int, hi: int) -> dict[str, float]:
    """Measured hardware scaling ceilings of THIS machine at lo vs hi
    processes, for perfectly parallel work with ZERO orchestration.

    The sandbox VM's vCPUs are oversubscribed at the host, so even ideal
    code cannot reach 1.0.  Two yardsticks:

    - ``alu``: register-only integer math (no memory traffic);
    - ``workload``: the pipeline's own per-doc kernel chain over a fixed
      batch — same instruction/memory mix as the engine's hot path, so
      it is the honest "what would dedicated nodes deliver" ceiling for
      THIS workload (streaming fingerprint kernels are memory-bandwidth
      heavy, which the ALU burn does not capture).
    """
    global _CAL_HTML
    import multiprocessing as mp

    if _CAL_HTML is None:
        from flink_fingerprint_ray import fixtures

        tlo, thi = _doc_tokens()
        _CAL_HTML = fixtures.make_pages(
            n_docs=4000, seed=7, n_hosts=50, tokens_lo=tlo, tokens_hi=thi
        )["html"].combine_chunks()
    out = {}
    for name, fn in (("alu", _burn), ("workload", _workload_burn)):
        rates = {}
        for n in (lo, hi):
            t0 = time.perf_counter()
            with mp.Pool(n) as p:
                p.map(fn, range(n))
            rates[n] = n / (time.perf_counter() - t0)
        out[name] = round(rates[hi] / ((hi / lo) * rates[lo]), 3)
    return out


def _scaling_child(num_cpus: int, corpus_dir: str) -> dict:
    """Run in a FRESH process per parallelism level (fresh Ray session),
    reading the parent's pre-generated corpus."""
    env = dict(os.environ, RAY_GRAFT_CPUS=str(num_cpus),
               BENCH_N_DOCS=os.environ["BENCH_N_DOCS"],
               BENCH_N_EPOCHS=os.environ["BENCH_N_EPOCHS"],
               BENCH_CORPUS_DIR=corpus_dir)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--_headline-only"],
        env=env, capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true",
                    help="run headline at num_cpus=8 and 32 in fresh processes")
    ap.add_argument("--_headline-only", dest="headline_only", action="store_true",
                    help=argparse.SUPPRESS)
    ap.add_argument("--neardup-ab", dest="neardup_ab", action="store_true",
                    help="interleaved plain-vs-neardup A/B pairs on one "
                         "shared corpus (the only drift-proof overhead "
                         "measurement on this host)")
    ap.add_argument("--channels-ab", dest="channels_ab", action="store_true",
                    help="interleaved plain-vs-(window_topn+cep_pattern) "
                         "A/B pairs on one shared corpus — the round-4d "
                         "side-channel cost protocol")
    ap.add_argument("--large", action="store_true",
                    help="large-corpus headline: 3.84M docs / 4 epochs "
                         "(BENCH_N_DOCS overridable), headline only — the "
                         "per-round institutionalized form of the ad-hoc "
                         "large runs quoted in BASELINE.md (VERDICT r4 #5)")
    ap.add_argument("--lateness-ab", dest="lateness_ab", action="store_true",
                    help="interleaved plain-vs-allowed_lateness A/B pairs "
                         "on one shared corpus — the retention + refire "
                         "channel cost (route sends closable copies to "
                         "the state actors when the feature is on)")
    args = ap.parse_args()

    if args.large:
        import ray

        n_docs = int(os.environ.get("BENCH_N_DOCS", str(N_DOCS * 4)))
        n_epochs = int(os.environ.get("BENCH_N_EPOCHS", N_EPOCHS))
        _init_ray(NUM_CPUS)
        _warm_pool(NUM_CPUS)
        headline = run_headline(NUM_CPUS, n_docs=n_docs, n_epochs=n_epochs)
        print(json.dumps({
            "metric": "large-corpus streaming fingerprint pipeline wall time (sec)",
            "value": headline["sec"],
            "unit": "sec",
            "num_cpus": NUM_CPUS,
            "headline": headline,
        }))
        ray.shutdown()
        return

    if args.lateness_ab:
        # same drift-proof protocol as --channels-ab: shared corpus,
        # unrecorded warmup, alternating-order same-minute pairs.
        # allowed = 60 s (one tumbling window of retention horizon).
        import ray

        n_docs = int(os.environ.get("BENCH_N_DOCS", N_DOCS))
        n_epochs = int(os.environ.get("BENCH_N_EPOCHS", N_EPOCHS))
        pairs_n = int(os.environ.get("BENCH_AB_PAIRS", "3"))
        allowed = int(os.environ.get("BENCH_ALLOWED_MS", "60000"))
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
        corpus = tempfile.mkdtemp(prefix="ffr_latab_corpus_")
        os.environ["BENCH_CORPUS_BYTES"] = str(write_corpus(corpus, n_docs, n_epochs))
        run_headline(NUM_CPUS, n_docs=n_docs, n_epochs=n_epochs, corpus_dir=corpus)
        pairs = []
        for k in range(pairs_n):
            order = (0, allowed) if k % 2 == 0 else (allowed, 0)
            res = {}
            for a_ms in order:
                res[a_ms] = run_headline(NUM_CPUS, n_docs=n_docs,
                                         n_epochs=n_epochs,
                                         corpus_dir=corpus, allowed_ms=a_ms)
            plain, lat = res[0], res[allowed]
            pairs.append({
                "plain_sec": plain["sec"], "lateness_sec": lat["sec"],
                "overhead": round(lat["sec"] / plain["sec"] - 1.0, 3),
            })
        ratios = sorted(p["overhead"] for p in pairs)
        print(json.dumps({
            "metric": "allowed-lateness retention overhead (interleaved same-corpus A/B)",
            "value": ratios[len(ratios) // 2],
            "unit": "fractional wall overhead (median pair)",
            "overhead_min_pair": ratios[0],
            "allowed_ms": allowed,
            "pairs": pairs,
            "n_docs": n_docs,
            "n_epochs": n_epochs,
            "num_cpus": NUM_CPUS,
        }))
        ray.shutdown()
        shutil.rmtree(corpus, ignore_errors=True)
        return

    if args.channels_ab:
        # same drift-proof protocol as --neardup-ab: shared corpus,
        # unrecorded warmup, alternating-order same-minute pairs
        import ray

        n_docs = int(os.environ.get("BENCH_N_DOCS", N_DOCS))
        n_epochs = int(os.environ.get("BENCH_N_EPOCHS", N_EPOCHS))
        pairs_n = int(os.environ.get("BENCH_AB_PAIRS", "3"))
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
        corpus = tempfile.mkdtemp(prefix="ffr_chab_corpus_")
        os.environ["BENCH_CORPUS_BYTES"] = str(write_corpus(corpus, n_docs, n_epochs))
        run_headline(NUM_CPUS, n_docs=n_docs, n_epochs=n_epochs, corpus_dir=corpus)
        pairs = []
        for k in range(pairs_n):
            order = (False, True) if k % 2 == 0 else (True, False)
            res = {}
            for ch_flag in order:
                res[ch_flag] = run_headline(NUM_CPUS, n_docs=n_docs,
                                            n_epochs=n_epochs,
                                            corpus_dir=corpus, channels=ch_flag)
            plain, ch = res[False], res[True]
            pairs.append({
                "plain_sec": plain["sec"], "channels_sec": ch["sec"],
                "overhead": round(ch["sec"] / plain["sec"] - 1.0, 3),
            })
        ratios = sorted(p["overhead"] for p in pairs)
        print(json.dumps({
            "metric": "window_topn+cep channel overhead (interleaved same-corpus A/B)",
            "value": ratios[len(ratios) // 2],
            "unit": "fractional wall overhead (median pair)",
            "overhead_min_pair": ratios[0],
            "pairs": pairs,
            "n_docs": n_docs,
            "n_epochs": n_epochs,
            "num_cpus": NUM_CPUS,
        }))
        ray.shutdown()
        return

    if args.neardup_ab:
        # Host capacity swings 2-4x minute-to-minute (BASELINE.md), so
        # near-dup overhead is only meaningful as SAME-MINUTE interleaved
        # pairs over identical input; report every pair plus the median
        # and minimum pairwise ratio.  Corpus size via BENCH_N_DOCS
        # (default 960k, the round-3/4 A/B protocol size).
        import ray

        n_docs = int(os.environ.get("BENCH_N_DOCS", N_DOCS))
        n_epochs = int(os.environ.get("BENCH_N_EPOCHS", N_EPOCHS))
        pairs_n = int(os.environ.get("BENCH_AB_PAIRS", "3"))
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
        corpus = tempfile.mkdtemp(prefix="ffr_ndab_corpus_")
        os.environ["BENCH_CORPUS_BYTES"] = str(write_corpus(corpus, n_docs, n_epochs))
        # unrecorded warmup: first touch of the corpus + worker spawn
        # otherwise bias whichever side runs first
        run_headline(NUM_CPUS, n_docs=n_docs, n_epochs=n_epochs, corpus_dir=corpus)
        pairs = []
        for k in range(pairs_n):
            order = (False, True) if k % 2 == 0 else (True, False)
            res = {}
            for nd_flag in order:
                res[nd_flag] = run_headline(NUM_CPUS, n_docs=n_docs,
                                            n_epochs=n_epochs,
                                            corpus_dir=corpus, neardup=nd_flag)
            plain, nd = res[False], res[True]
            pairs.append({
                "plain_sec": plain["sec"], "neardup_sec": nd["sec"],
                "overhead": round(nd["sec"] / plain["sec"] - 1.0, 3),
                "neardup_kept": nd["telemetry"].get("neardup_kept"),
                "neardup_dropped": nd["telemetry"].get("neardup_dropped"),
            })
        ratios = sorted(p["overhead"] for p in pairs)
        print(json.dumps({
            "metric": "streaming near-dup overhead (interleaved same-corpus A/B)",
            "value": ratios[len(ratios) // 2],
            "unit": "fractional wall overhead (median pair)",
            "overhead_min_pair": ratios[0],
            "pairs": pairs,
            "n_docs": n_docs,
            "n_epochs": n_epochs,
            "num_cpus": NUM_CPUS,
        }))
        ray.shutdown()
        return

    if args.scaling:
        # scaling evidence needs a compute-dominated workload:
        # (a) epochs big enough that the per-epoch serial section
        #     (watermark barrier + state snapshot + manifest commit,
        #     O(state) not O(data)) is <10% of epoch wall time;
        # (b) REALISTICALLY-SIZED documents (~10 KB html, like real web
        #     pages) so per-doc compute — extraction + fingerprints, the
        #     part that dominates at the 100 TB design point — outweighs
        #     per-row coordination, which tiny ~200 B test docs do not
        #     (at this size the 8-CPU level is ~100% kernel-saturated).
        # 60k docs/epoch: per-epoch overheads (route barrier, snapshots,
        # commit) are fixed-size, so bigger epochs measure steady-state
        # transform scaling rather than orchestration floor
        os.environ.setdefault("BENCH_N_DOCS", "240000")
        os.environ.setdefault("BENCH_N_EPOCHS", "4")
        os.environ.setdefault("BENCH_DOC_TOKENS", "768-2560")
        lo, hi = 8, 32
        rounds = int(os.environ.get("BENCH_SCALING_ROUNDS", "3"))
        corpus = tempfile.mkdtemp(prefix="ffr_scaling_corpus_")
        n_bytes = write_corpus(corpus, int(os.environ["BENCH_N_DOCS"]),
                               int(os.environ["BENCH_N_EPOCHS"]))
        os.environ["BENCH_CORPUS_BYTES"] = str(n_bytes)
        # PAIRED rounds with a per-round hardware calibration: the host's
        # vCPUs are oversubscribed by other tenants and the available
        # capacity swings minute-to-minute (measured ALU ceiling varies
        # 0.57-0.98 across minutes!), so a single pair of runs — or a
        # calibration taken at a different moment than the runs — is
        # noise.  Each round runs lo then hi back-to-back on the same
        # corpus in fresh processes; the reported efficiency is the
        # MEDIAN across rounds, with every round's raw numbers included.
        pairs = []
        try:
            for _ in range(rounds):
                r_lo = _scaling_child(lo, corpus)["headline"]
                r_hi = _scaling_child(hi, corpus)["headline"]
                cal = _calibrations(lo, hi)
                eff = round(
                    r_hi["docs_per_sec"] / ((hi / lo) * r_lo["docs_per_sec"]), 3)
                pairs.append({
                    f"num_cpus={lo}": r_lo,
                    f"num_cpus={hi}": r_hi,
                    "efficiency": eff,
                    "hardware_ceiling_alu": cal["alu"],
                    "hardware_ceiling_workload": cal["workload"],
                    # normalized against the SAME round's ceiling — pairing
                    # cancels the host's minute-scale capacity swings
                    "efficiency_vs_hardware": round(eff / cal["alu"], 3),
                })
        finally:
            shutil.rmtree(corpus, ignore_errors=True)
        effs = sorted(p["efficiency"] for p in pairs)
        alu = sorted(p["hardware_ceiling_alu"] for p in pairs)
        wl = sorted(p["hardware_ceiling_workload"] for p in pairs)
        norm = sorted(p["efficiency_vs_hardware"] for p in pairs)
        med_eff = effs[len(effs) // 2]
        med_alu = alu[len(alu) // 2]
        med_wl = wl[len(wl) // 2]
        med_norm = norm[len(norm) // 2]
        best = max(pairs, key=lambda p: p["efficiency"])
        print(json.dumps({
            "metric": "streaming fingerprint pipeline scaling (fresh ray sessions, same input)",
            "value": med_eff,
            "unit": "efficiency",
            "sf": SF_DIR,
            "rounds": pairs,
            "throughput_lo": best[f"num_cpus={lo}"]["docs_per_sec"],
            "throughput_hi": best[f"num_cpus={hi}"]["docs_per_sec"],
            "cpu_ratio": hi / lo,
            "scaling_efficiency": med_eff,
            "scaling_efficiency_best": best["efficiency"],
            "hardware_ceiling_alu": med_alu,
            "hardware_ceiling_workload": med_wl,
            # normalized per ROUND against that round's own same-minute
            # ALU ceiling (the HIGHEST scaling any work achieves on this
            # oversubscribed host — pure register math — so conservative),
            # then median'd: pairing cancels the minute-scale host
            # capacity swings that dominate unpaired statistics.  The
            # workload ceiling (same kernels, zero orchestration, naive
            # multiprocessing) is usually LOWER than the pipeline's own
            # efficiency: Ray's shared object store + block backpressure
            # manage memory pressure better than fork-joined processes
            # holding private copies.
            "efficiency_vs_hardware": med_norm,
            "efficiency_vs_workload_ceiling": round(med_eff / med_wl, 3),
        }))
        return

    _init_ray(NUM_CPUS)
    # Warm the worker pool INCLUDING the per-worker heavy imports before
    # any timed section (queries and headline both): the first epoch
    # otherwise measures process spawn + pandas/polars import, which at
    # num_cpus=32 is ~30% of headline wall vs ~14% at 8 — a spawn-cost
    # artifact, not pipeline scaling (real clusters run warm workers).
    _warm_pool(NUM_CPUS)
    headline = run_headline(
        NUM_CPUS,
        n_docs=int(os.environ.get("BENCH_N_DOCS", N_DOCS)),
        n_epochs=int(os.environ.get("BENCH_N_EPOCHS", N_EPOCHS)),
        corpus_dir=os.environ.get("BENCH_CORPUS_DIR"),
    )
    queries = {} if args.headline_only else run_queries(SF_DIR)
    quality = {} if args.headline_only else approx_quality(SF_DIR)
    # the streaming MinHash-LSH near-dup path (neardup=True) gets its own
    # measured line on a quarter-size corpus: same job + the band exchange,
    # band-state actors and AND-reduce, so the cost of streaming near-dup
    # dedup is visible per round (kept/dropped ride the telemetry)
    neardup = {} if args.headline_only else run_headline(
        NUM_CPUS, n_docs=max(N_DOCS // 4, 1000), n_epochs=N_EPOCHS, neardup=True)
    result = {
        "metric": "streaming fingerprint pipeline wall time (sec) + per-query suite",
        "value": headline["sec"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "headline": headline,
        "neardup": neardup,
        "quality": quality,
    }
    print(json.dumps(result))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
