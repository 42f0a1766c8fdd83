"""Blend sweep harness (reusable): boots one server with the current env
(point RERANKER_WEIGHTS at a staged checkpoint to validate a new judge)
and evaluates the listed search_params points on the 50-query eval.

Boots one server (trained assets), indexes the eval corpus, then runs the
baseline evaluation at several (reranker, initial) blends plus a
reranker-off control. Prints one summary line per point.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_rerank_weight.py
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

import yaml


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main() -> int:
    import requests

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = tempfile.mkdtemp(prefix="sweep_hw_")
    docs, data, logs = (os.path.join(work, d) for d in ("documents", "data", "logs"))
    for d in (docs, data, logs):
        os.makedirs(d)

    from eval_harness.corpus import generate_corpus, generate_ground_truth

    generate_corpus(docs)
    gt = os.path.join(work, "queries.jsonl")
    generate_ground_truth(gt)

    port = _free_port()
    env = dict(os.environ)
    env.update(
        DATA_DIR=data,
        DOCUMENTS_DIR=docs,
        LOG_DIR=logs,
        MCP_HTTP_BIND=f"127.0.0.1:{port}",
        DEV="1",
        RAG_TPU_RERANK_MODEL="tpu-reranker",
        JAX_COMPILATION_CACHE_DIR=os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/rag_tpu_jax_cache"
        ),
    )
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
        requests.post(f"{base}/reindex", timeout=10)
        for _ in range(600):
            if requests.get(f"{base}/jobs/active", timeout=10).json() is None:
                break
            time.sleep(3)
        print("indexed:", requests.get(f"{base}/stats", timeout=10).json())

        from eval_harness.run import main as eval_main

        base_cfg = yaml.safe_load(
            open(os.path.join(repo, "eval_harness", "configs", "baseline.yaml"))
        )
        if len(sys.argv) > 1:
            # custom points: comma-separated reranker weights ("off" for
            # the no-reranker control; 0.0 = judge runs as the rejection
            # gate only, ranking untouched)
            points = []
            for tok_w in sys.argv[1].split(","):
                if tok_w == "off":
                    points.append(("rr_off", {"use_reranker": False}))
                else:
                    w = float(tok_w)
                    points.append((
                        f"rr_{tok_w}",
                        {"weights": {"reranker": w, "initial": 1.0 - w}},
                    ))
        else:
            points = [
                ("rr_off", {"use_reranker": False}),
                ("rr_0.5", {"weights": {"reranker": 0.5, "initial": 0.5}}),
                ("rr_0.35", {"weights": {"reranker": 0.35, "initial": 0.65}}),
                ("rr_0.25", {"weights": {"reranker": 0.25, "initial": 0.75}}),
                ("rr_0.7", {"weights": {"reranker": 0.7, "initial": 0.3}}),
            ]
        out_dir = os.path.join(work, "reports")
        os.makedirs(out_dir, exist_ok=True)
        results = {}
        for name, sp in points:
            cfg = dict(base_cfg)
            cfg["name"] = name
            params = dict(cfg.get("search_params") or {})
            params.update(sp)
            cfg["search_params"] = params
            cfg_path = os.path.join(work, f"{name}.yaml")
            yaml.safe_dump(cfg, open(cfg_path, "w"))
            eval_main(
                [
                    "evaluate",
                    "--config", cfg_path,
                    "--endpoint", base,
                    "--ground-truth", gt,
                    "--out", out_dir,
                ]
            )
            reports = sorted(
                f for f in os.listdir(out_dir)
                if f.startswith(f"eval_{name}_") and f.endswith(".json")
            )
            s = json.load(open(os.path.join(out_dir, reports[-1])))["summary"]
            results[name] = {
                "hit": round(s["hit_rate_mean"], 3),
                "mrr": round(s["mrr_mean"], 3),
                "rej": round(s["rejection_success_rate"], 3),
            }
            print(name, results[name], flush=True)
        print(json.dumps(results))
        return 0
    except BaseException:
        out_path = os.path.join(work, "server.out")
        if os.path.exists(out_path):
            print("---- server.out tail ----")
            print(open(out_path).read()[-4000:])
        raise
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=10)
        except subprocess.TimeoutExpired:
            srv.kill()
        if os.environ.get("SWEEP_KEEP"):
            print(f"reports kept in {work}")
        else:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
