"""``ray job submit``-able driver CLI (SURVEY.md §3.4 lifecycle).

The north rule runs the engine "via ray job submit on a fixed-size
multi-node Ray cluster"; this module is that entry point:

    ray job submit --working-dir . -- \\
        python -m flink_fingerprint_ray run \\
            --pages-root /data/pages --out /data/out \\
            --updates-root /data/updates --sliding 120000,60000 \\
            --session-gap-ms 120000 --neardup --follow

Inside a submitted job ``ray.init()`` attaches to the hosting cluster;
run standalone it starts a local session (``RAY_ADDRESS`` respected).
Library code never calls ``ray.init()`` — only this CLI, ``bench.py``
and the test fixture own a session (CLAUDE.md invariant), so the guard
here is ``if not ray.is_initialized()``.

Subcommands:

- ``run``      — the streaming fingerprint pipeline: resume-safe (picks
                 up after the committed cursor), exactly-once sink,
                 optional ``--follow`` directory tailing.  Prints one
                 JSON metrics line (lag, late counts, per-epoch rows).
- ``compact``  — epoch-fence compaction maintenance
                 (``pipelines/maintenance.compact_epochs``).
- ``query``    — run one registered batch query from
                 ``pipelines/queries.QUERIES`` over an sf_dir; write
                 parquet (``--out``) or print a row count + head.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_up() -> None:
    import logging

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False,
                  "logging_level": logging.ERROR}
        cpus = os.environ.get("RAY_GRAFT_CPUS")
        if cpus:
            kwargs["num_cpus"] = int(cpus)
        # inside `ray job submit`, init() attaches to the hosting
        # cluster; standalone it starts a local session
        ray.init(**kwargs)
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _pair(text: str) -> tuple[int, int]:
    a, b = text.split(",")
    return int(a), int(b)


def _build_run_parser(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("run", help="streaming fingerprint pipeline")
    p.add_argument("--pages-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--updates-root", default=None)
    p.add_argument("--blocklist-root", default=None)
    p.add_argument("--tumbling-ms", type=int, default=60_000)
    p.add_argument("--sliding", type=_pair, default=None,
                   metavar="SIZE_MS,SLIDE_MS")
    p.add_argument("--cumulate", type=_pair, default=None,
                   metavar="STEP_MS,MAX_MS")
    p.add_argument("--session-gap-ms", type=int, default=0)
    p.add_argument("--session-gap-expr", default=None)
    p.add_argument("--session-max-ms", type=int, default=None)
    p.add_argument("--lateness-ms", type=int, default=10_000)
    p.add_argument("--allowed-lateness-ms", type=int, default=0)
    p.add_argument("--join-retention-ms", type=int, default=300_000)
    p.add_argument("--n-state-partitions", type=int, default=8)
    p.add_argument("--commit-mode", choices=("rename", "manifest"),
                   default="rename")
    p.add_argument("--extractor", choices=("strict", "general"),
                   default="strict")
    p.add_argument("--curation-min-chars", type=int, default=0)
    p.add_argument("--neardup", action="store_true")
    p.add_argument("--media-features", action="store_true")
    p.add_argument("--late-side-output", action="store_true")
    p.add_argument("--window-topn", type=int, default=0)
    p.add_argument("--cep", default=None,
                   help="comma-separated CEP predicates, e.g. '>0,==0'")
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--follow", action="store_true",
                   help="tail the source directory (Kafka-consumer analog)")
    p.add_argument("--idle-timeout-s", type=float, default=5.0)
    p.add_argument("--stop-file", default=None)
    p.add_argument("--metrics-out", default=None,
                   help="also write the metrics JSON to this path")


def _cmd_run(args: argparse.Namespace) -> int:
    from .pipelines.streaming import PipelineConfig, StreamingFingerprintPipeline

    cfg = PipelineConfig(
        tumbling_size_ms=args.tumbling_ms,
        sliding=args.sliding,
        cumulate=args.cumulate,
        session_gap_ms=args.session_gap_ms,
        session_gap_expr=args.session_gap_expr,
        session_max_ms=args.session_max_ms,
        lateness_ms=args.lateness_ms,
        allowed_lateness_ms=args.allowed_lateness_ms,
        join_retention_ms=args.join_retention_ms,
        n_state_partitions=args.n_state_partitions,
        commit_mode=args.commit_mode,
        extractor=args.extractor,
        curation_min_chars=args.curation_min_chars,
        neardup=args.neardup,
        media_features=args.media_features,
        late_side_output=args.late_side_output,
        window_topn=args.window_topn,
        cep_pattern=tuple(args.cep.split(",")) if args.cep else None,
    )
    pipe = StreamingFingerprintPipeline(
        args.pages_root, args.out,
        updates_root=args.updates_root,
        blocklist_root=args.blocklist_root,
        cfg=cfg,
    )
    try:
        res = pipe.run(max_epochs=args.max_epochs, follow=args.follow,
                       idle_timeout_s=args.idle_timeout_s,
                       stop_file=args.stop_file)
    finally:
        pipe.shutdown()
    line = json.dumps(res, default=str)
    print(line)
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            f.write(line + "\n")
    return 0


def _cmd_compact(args: argparse.Namespace) -> int:
    from .pipelines.maintenance import compact_epochs

    print(json.dumps(compact_epochs(args.out, upto=args.upto)))
    return 0


def _cmd_query(args: argparse.Namespace) -> int:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as papq

    import ray.data

    from .pipelines.queries import QUERIES

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; registered: "
              f"{', '.join(sorted(QUERIES))}", file=sys.stderr)
        return 2
    res = QUERIES[args.name](args.sf)
    if args.out:
        if isinstance(res, ray.data.Dataset):
            res.write_parquet(args.out)
        else:
            tbl = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
            papq.write_table(tbl, args.out)
        print(json.dumps({"query": args.name, "out": args.out}))
        return 0
    if isinstance(res, ray.data.Dataset):
        n = res.count()
        head = res.limit(args.head).to_pandas()
    else:
        df = res.to_pandas() if isinstance(res, pa.Table) else res
        n = len(df)
        head = df.head(args.head)
    with pd.option_context("display.width", 200):
        print(head)
    print(json.dumps({"query": args.name, "rows": int(n)}))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="flink_fingerprint_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    _build_run_parser(sub)
    pc = sub.add_parser("compact", help="compact committed epoch fences")
    pc.add_argument("--out", required=True)
    pc.add_argument("--upto", type=int, default=None)
    pq = sub.add_parser("query", help="run one registered batch query")
    pq.add_argument("name")
    pq.add_argument("--sf", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    pq.add_argument("--out", default=None, help="write result parquet here")
    pq.add_argument("--head", type=int, default=10)
    args = ap.parse_args(argv)
    _ray_up()
    if args.cmd == "run":
        return _cmd_run(args)
    if args.cmd == "compact":
        return _cmd_compact(args)
    return _cmd_query(args)


if __name__ == "__main__":
    raise SystemExit(main())
