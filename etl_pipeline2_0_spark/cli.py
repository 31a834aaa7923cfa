"""CLI entry points (reference main.py: menu / batch / watch — SURVEY.md §3).

Usage:
    python -m etl_pipeline2_0_spark batch <input_dir> <out_dir> [--rowstore]
    python -m etl_pipeline2_0_spark watch <input_dir> <out_dir>
    python -m etl_pipeline2_0_spark payload <out_dir>   (reads stdin)
    python -m etl_pipeline2_0_spark serve [--host H] [--port P]

The reference's interactive menu collapses to subcommands; watch mode runs
until interrupted (checkpointed — a restart resumes exactly-once where it
left off, unlike the reference's stateless watchdog).
"""

from __future__ import annotations

import argparse
import json
import sys

from etl_pipeline2_0_spark.pipeline import run_batch
from etl_pipeline2_0_spark.session import get_spark
from etl_pipeline2_0_spark.streaming.watch import run_watch_mode


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_pipeline2_0_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("batch", help="process a directory of mixed-format files")
    b.add_argument("input_dir")
    b.add_argument("out_dir")
    b.add_argument("--rowstore", action="store_true")

    w = sub.add_parser("watch", help="watch a directory (Structured Streaming)")
    w.add_argument("input_dir")
    w.add_argument("out_dir")

    s = sub.add_parser("payload", help="process one payload from stdin")
    s.add_argument("out_dir")

    v = sub.add_parser("serve", help="HTTP server: POST /process (reference app.py)")
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8000)

    args = p.parse_args(argv)
    spark = get_spark(app_name=f"etl-pipeline2.0-{args.cmd}")
    try:
        if args.cmd == "serve":
            from etl_pipeline2_0_spark.server import create_server

            server = create_server(spark, host=args.host, port=args.port)
            print(
                f"serving on http://{server.server_address[0]}:"
                f"{server.server_address[1]}",
                flush=True,
            )
            server.serve_forever()
        elif args.cmd == "batch":
            res = run_batch(
                spark,
                input_path=args.input_dir,
                out_dir=args.out_dir,
                use_rowstore=args.rowstore,
            )
            print(json.dumps(res["metadata"], default=str))
        elif args.cmd == "watch":
            q = run_watch_mode(spark, args.input_dir, args.out_dir)
            q.awaitTermination()
        else:
            res = run_batch(
                spark, payloads=[sys.stdin.read()], out_dir=args.out_dir
            )
            print(json.dumps(res["items_by_type"]))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
