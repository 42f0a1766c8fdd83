"""One-shot quality evaluation: corpus -> live server -> all three configs.

Boots the real server (trained assets; FakeReranker unless the trained
reranker asset exists), indexes the authored eval corpus, runs baseline /
embedding_only / bm25_only, and writes reports into eval_harness/reports/.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_eval.py
"""

from __future__ import annotations

import json
import os
import shutil
import socket
import subprocess
import sys
import tempfile
import time


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main(argv=None) -> int:
    import argparse

    import requests

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--heldout",
        action="store_true",
        help="ALSO run the held-out test split (baseline_heldout config "
        "over eval_harness/heldout_data.py queries). Report-only: nothing "
        "may ever be tuned on its numbers.",
    )
    ap.add_argument(
        "--thirdparty",
        action="store_true",
        help="ALSO run the third-party split: after the authored-corpus "
        "runs, ingest eval_harness/thirdparty.py's real documents "
        "(CPython reference + pygame docs) through the live pipeline and "
        "evaluate baseline_thirdparty over them. Report-only.",
    )
    args = ap.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = tempfile.mkdtemp(prefix="quality_eval_")
    docs = os.path.join(work, "documents")
    data = os.path.join(work, "data")
    logs = os.path.join(work, "logs")
    for d in (docs, data, logs):
        os.makedirs(d)

    from eval_harness.corpus import generate_corpus, generate_ground_truth

    names = generate_corpus(docs)
    gt = os.path.join(work, "queries.jsonl")
    nq = generate_ground_truth(gt)
    print(f"{len(names)} PDFs, {nq} queries -> {work}")
    gt_heldout = None
    if args.heldout:
        gt_heldout = os.path.join(work, "queries_heldout.jsonl")
        nh = generate_ground_truth(gt_heldout, split="test")
        print(f"+ {nh} held-out test-split queries")

    port = _free_port()
    env = dict(os.environ)
    env.update(
        DATA_DIR=data,
        DOCUMENTS_DIR=docs,
        LOG_DIR=logs,
        MCP_HTTP_BIND=f"127.0.0.1:{port}",
        DEV="1",
        # share the persistent compile cache across eval runs (the default
        # DATA_DIR-scoped cache is recreated fresh every run, repaying
        # multi-minute tunnel compiles each time)
        JAX_COMPILATION_CACHE_DIR=os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/rag_tpu_jax_cache"
        ),
    )
    has_rr = os.path.exists(
        os.path.join(repo, "rust_local_rag_tpu", "assets", "reranker.safetensors")
    )
    if has_rr:
        # reranking is opt-in via the model-name env (reference contract:
        # empty OLLAMA_RERANK_MODEL disables); the trained asset loads
        # automatically once a name is set
        env.update(RAG_TPU_RERANK_MODEL="tpu-reranker")
    else:
        env.update(RAG_TPU_RERANK_MODEL="fake-rr", RAG_TPU_FAKE_RERANKER="1")
    base = f"http://127.0.0.1:{port}"
    srv = subprocess.Popen(
        [sys.executable, "-m", "rust_local_rag_tpu"],
        env=env,
        cwd=repo,
        stdout=open(os.path.join(work, "server.out"), "w"),
        stderr=subprocess.STDOUT,
    )
    try:
        for _ in range(900):  # tunnel compiles can take minutes
            try:
                if requests.get(f"{base}/readyz", timeout=3).status_code == 200:
                    break
            except requests.RequestException:
                pass
            if srv.poll() is not None:
                out = os.path.join(work, "server.out")
                if os.path.exists(out):
                    with open(out) as f:
                        print("---- server.out tail ----")
                        print("".join(f.readlines()[-40:]))
                raise RuntimeError(f"server died (exit {srv.returncode})")
            time.sleep(2)
        else:
            out = os.path.join(work, "server.out")
            if os.path.exists(out):
                with open(out) as f:
                    print("---- server.out tail ----")
                    print("".join(f.readlines()[-40:]))
            raise RuntimeError("server never became ready")
        print("server ready; indexing...")
        requests.post(f"{base}/reindex", timeout=10)
        for _ in range(600):
            j = requests.get(f"{base}/jobs/active", timeout=10).json()
            if j is None:
                break
            time.sleep(3)
        stats = requests.get(f"{base}/stats", timeout=10).json()
        print("stats:", stats)

        from eval_harness.run import main as eval_main

        out_dir = os.path.join(repo, "eval_harness", "reports")
        results = {}
        runs = [("baseline", gt), ("embedding_only", gt), ("bm25_only", gt)]
        if gt_heldout:
            runs.append(("baseline_heldout", gt_heldout))
        for cfg, gt_path in runs:
            code = eval_main(
                [
                    "evaluate",
                    "--config", f"eval_harness/configs/{cfg}.yaml",
                    "--endpoint", base,
                    "--ground-truth", gt_path,
                    "--out", out_dir,
                ]
            )
            results[cfg] = "PASS" if code == 0 else "FAIL"

        if args.thirdparty:
            # phase 2: add the REAL third-party documents to the live
            # corpus (authored docs hash-skip on the incremental reindex)
            # and evaluate over them — generalization to text nobody on
            # this project wrote, through the full pdf->chunk->embed path
            from eval_harness.thirdparty import (
                generate_thirdparty_corpus,
                generate_thirdparty_ground_truth,
            )

            tp_names = generate_thirdparty_corpus(docs)
            gt_tp = os.path.join(work, "queries_thirdparty.jsonl")
            ntp = generate_thirdparty_ground_truth(gt_tp)
            print(f"+ {len(tp_names)} third-party PDFs, {ntp} queries; "
                  "reindexing...")
            requests.post(f"{base}/reindex", timeout=10)
            for _ in range(900):
                j = requests.get(f"{base}/jobs/active", timeout=10).json()
                if j is None:
                    break
                time.sleep(3)
            print("stats:", requests.get(f"{base}/stats", timeout=10).json())
            code = eval_main(
                [
                    "evaluate",
                    "--config",
                    "eval_harness/configs/baseline_thirdparty.yaml",
                    "--endpoint", base,
                    "--ground-truth", gt_tp,
                    "--out", out_dir,
                ]
            )
            results["baseline_thirdparty"] = "PASS" if code == 0 else "FAIL"
        print(json.dumps(results))
        return 0
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=10)
        except subprocess.TimeoutExpired:
            srv.kill()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
