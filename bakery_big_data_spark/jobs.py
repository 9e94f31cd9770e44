"""spark-submit-able job entry points — the reference's job scripts
(``processing/jobs/bronze_to_silver.py`` etc. launched via
``spark-submit``, makefile:105-121) re-expressed as one CLI over the
medallion pipeline:

    python -m bakery_big_data_spark.jobs medallion \\
        --sf-dir /root/testdata/sf0.001 --out /tmp/lake
    python -m bakery_big_data_spark.jobs streaming-ingest \\
        --src /path/json --out /path/bronze --checkpoint /path/ckpt

Each subcommand builds its own session (as every reference job does),
runs one layer, prints a one-line row-count summary, and exits — the
Airflow-shaped unit of work.
"""

from __future__ import annotations

import argparse
import json


def _medallion(args: argparse.Namespace) -> dict[str, int]:
    from bakery_big_data_spark.pipeline.medallion import run_medallion
    from bakery_big_data_spark.session import get_spark

    spark = get_spark("job-medallion")
    layers = run_medallion(spark, args.sf_dir, args.out)
    return {name: df.count() for name, df in layers.items()}


def _streaming_ingest(args: argparse.Namespace) -> dict[str, int]:
    from bakery_big_data_spark.session import get_spark
    from bakery_big_data_spark.streaming.ingest import (
        read_json_stream,
        start_append_sink,
    )

    spark = get_spark("job-streaming-ingest")
    q = start_append_sink(
        read_json_stream(spark, args.src),
        args.out,
        args.checkpoint,
        available_now=True,
    )
    q.awaitTermination()
    return {"ingested_total": spark.read.parquet(args.out).count()}


def _curation(args: argparse.Namespace) -> dict[str, int]:
    from bakery_big_data_spark.pipeline.curation import run_curation_pipeline
    from bakery_big_data_spark.session import get_spark

    spark = get_spark("job-curation")
    layers = run_curation_pipeline(spark, args.sf_dir, args.out)
    return {name: df.count() for name, df in layers.items()}


def _maintenance(args: argparse.Namespace) -> dict[str, int]:
    """Nightly table maintenance (the reference schedules these as Airflow
    DAG tasks; Iceberg calls them rewrite_data_files / expire_snapshots):
    compact every parquet table under --lake (optionally Z-order
    re-clustered via --zorder col1,col2) and expire old snapshot versions
    of every manifest-bearing table down to --keep-last."""
    import os

    from bakery_big_data_spark.session import get_spark
    from bakery_big_data_spark.sources.sinks import optimize_table
    from bakery_big_data_spark.sources.snapshots import expire_snapshots

    spark = get_spark("job-maintenance")
    zdims = tuple(args.zorder.split(",")) if args.zorder else None
    summary: dict[str, int] = {"tables_optimized": 0, "versions_expired": 0}
    for name in sorted(os.listdir(args.lake)):
        path = os.path.join(args.lake, name)
        if not os.path.isdir(path):
            continue
        if os.path.exists(os.path.join(path, "_snapshot_manifest.json")):
            summary["versions_expired"] += len(
                expire_snapshots(path, keep_last=args.keep_last)
            )
        elif any(f.endswith(".parquet") for f in os.listdir(path)):
            # Z-order only tables that carry the requested dims as
            # INTEGRAL columns (the Morton key is bit interleaving — a
            # double dim would fail analysis); others get plain
            # compaction instead of failing mid-loop (after earlier
            # tables were already rewritten).
            integral = {"byte", "short", "int", "integer", "bigint", "long"}
            types = {
                f.name: f.dataType.simpleString()
                for f in spark.read.parquet(path).schema.fields
            }
            table_zdims = (
                zdims
                if zdims
                and all(types.get(d, "") in integral for d in zdims)
                else None
            )
            optimize_table(spark, path, zorder_dims=table_zdims)
            summary["tables_optimized"] += 1
    return summary


def main(argv: list[str] | None = None) -> dict[str, int]:
    parser = argparse.ArgumentParser(prog="bakery_big_data_spark.jobs")
    sub = parser.add_subparsers(dest="job", required=True)

    m = sub.add_parser("medallion", help="bronze→silver→gold→features")
    m.add_argument("--sf-dir", required=True)
    m.add_argument("--out", required=True)
    m.set_defaults(fn=_medallion)

    s = sub.add_parser("streaming-ingest", help="drain a JSON file stream")
    s.add_argument("--src", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--checkpoint", required=True)
    s.set_defaults(fn=_streaming_ingest)

    cu = sub.add_parser(
        "curation", help="quality->dedup->decontaminate->split manifest"
    )
    cu.add_argument("--sf-dir", required=True)
    cu.add_argument("--out", required=True)
    cu.set_defaults(fn=_curation)

    mt = sub.add_parser(
        "maintenance", help="compact/zorder tables + expire snapshots"
    )
    mt.add_argument("--lake", required=True)
    mt.add_argument("--zorder", default=None, help="col1,col2")
    mt.add_argument("--keep-last", type=int, default=2)
    mt.set_defaults(fn=_maintenance)

    args = parser.parse_args(argv)
    result = args.fn(args)
    print(json.dumps({"job": args.job, "counts": result}))
    return result


if __name__ == "__main__":
    main()
