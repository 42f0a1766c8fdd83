"""Evaluation CLI (cf. eval/run.py in the reference — same subcommands):

    python -m eval_harness.run evaluate [--config PATH] [--out DIR]
    python -m eval_harness.run check    [--config PATH]
    python -m eval_harness.run list-configs
    python -m eval_harness.run generate [--documents DIR] [--ground-truth PATH]

`evaluate` prints a rich summary table, writes JSON + markdown reports, and
exits non-zero when Hit Rate@k < 0.80 (the reference's success threshold,
eval/run.py:196-200). `generate` materializes the synthetic corpus.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

from eval_harness.runner import (
    HIT_RATE_SUCCESS_THRESHOLD,
    EvalConfig,
    EvalRunner,
    load_ground_truth,
    write_reports,
)
from eval_harness.client import RAGClient

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def _print_summary(report: dict) -> None:
    try:
        from rich.console import Console
        from rich.table import Table

        console = Console()
        s = report["summary"]
        table = Table(title=f"Evaluation: {report['config']}")
        table.add_column("metric")
        table.add_column("value", justify="right")
        table.add_row("queries", str(s.get("n_queries", 0)))
        table.add_row("hit_rate", f"{s.get('hit_rate_mean', 0):.3f}")
        table.add_row("mrr", f"{s.get('mrr_mean', 0):.3f}")
        table.add_row("ndcg", f"{s.get('ndcg_mean', 0):.3f}")
        table.add_row("latency p50 ms", f"{s.get('latency_p50_ms', 0):.1f}")
        table.add_row("latency p95 ms", f"{s.get('latency_p95_ms', 0):.1f}")
        if s.get("rejection_success_rate") is not None:
            table.add_row("rejection success", f"{s['rejection_success_rate']:.0%}")
        console.print(table)
        banner = (
            f"[green]PASS[/green] hit_rate >= {HIT_RATE_SUCCESS_THRESHOLD}"
            if s.get("passed")
            else f"[red]FAIL[/red] hit_rate < {HIT_RATE_SUCCESS_THRESHOLD}"
        )
        console.print(banner)
    except ImportError:
        print(report["summary"])


def cmd_evaluate(args) -> int:
    config = EvalConfig.from_yaml(args.config) if args.config else EvalConfig()
    if getattr(args, "endpoint", None):
        config.rag_endpoint = args.endpoint
    if getattr(args, "ground_truth", None):
        config.ground_truth_path = args.ground_truth
    client = RAGClient(endpoint=config.rag_endpoint, mode=config.connection_mode)
    if not client.health_check():
        print(f"Server at {config.rag_endpoint} is not ready", file=sys.stderr)
        return 2
    queries = load_ground_truth(config.ground_truth_path)
    runner = EvalRunner(config, client)
    report = runner.run_evaluation(queries)
    _print_summary(report)
    write_reports(report, args.out)
    return 0 if report["summary"].get("passed") else 1


def cmd_check(args) -> int:
    config = EvalConfig.from_yaml(args.config) if args.config else EvalConfig()
    client = RAGClient(endpoint=config.rag_endpoint, mode=config.connection_mode)
    ok = client.health_check()
    print(f"server ready: {ok}")
    if ok:
        stats = client.get_stats()
        print(f"stats: {stats}")
    try:
        queries = load_ground_truth(config.ground_truth_path)
        rejections = sum(1 for q in queries if q.is_rejection)
        print(
            f"ground truth: {len(queries)} queries "
            f"({len(queries) - rejections} retrieval, {rejections} rejection)"
        )
    except OSError as e:
        print(f"ground truth unreadable: {e}")
        return 1
    return 0 if ok else 1


def cmd_list_configs(args) -> int:
    for path in sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))):
        cfg = EvalConfig.from_yaml(path)
        print(f"{os.path.basename(path)}: {cfg.name} — {cfg.description}")
    return 0


def cmd_generate(args) -> int:
    if args.split == "thirdparty":
        from eval_harness.thirdparty import (
            generate_thirdparty_corpus,
            generate_thirdparty_ground_truth,
        )

        names = generate_thirdparty_corpus(args.documents)
        count = generate_thirdparty_ground_truth(args.ground_truth)
    else:
        from eval_harness.corpus import (
            generate_corpus,
            generate_ground_truth,
        )

        names = generate_corpus(args.documents)
        count = generate_ground_truth(args.ground_truth, split=args.split)
    print(f"wrote {len(names)} PDFs to {args.documents}")
    print(
        f"wrote {count} ground-truth queries ({args.split} split) "
        f"to {args.ground_truth}"
    )
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="eval_harness")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_eval = sub.add_parser("evaluate")
    p_eval.add_argument("--config", default=None)
    p_eval.add_argument("--out", default="eval_harness/reports")
    p_eval.add_argument("--endpoint", default=None,
                        help="override the config's rag_endpoint")
    p_eval.add_argument("--ground-truth", default=None,
                        help="override the config's ground_truth_path")
    p_eval.set_defaults(fn=cmd_evaluate)

    p_check = sub.add_parser("check")
    p_check.add_argument("--config", default=None)
    p_check.set_defaults(fn=cmd_check)

    p_list = sub.add_parser("list-configs")
    p_list.set_defaults(fn=cmd_list_configs)

    p_gen = sub.add_parser("generate")
    p_gen.add_argument("--documents", default="./documents")
    p_gen.add_argument(
        "--ground-truth", default="eval_harness/ground_truth/queries.jsonl"
    )
    p_gen.add_argument(
        "--split", choices=("dev", "test", "thirdparty"), default="dev",
        help="dev = tuning split (corpus_data.py); test = held-out "
        "report-only split (heldout_data.py); thirdparty = real "
        "third-party documents (thirdparty.py: CPython reference + "
        "pygame docs) through the full pdf->chunk->embed pipeline",
    )
    p_gen.set_defaults(fn=cmd_generate)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
