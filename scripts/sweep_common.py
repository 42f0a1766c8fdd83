"""Shared harness for eval sweep scripts: boot one server with the
current env over the authored eval corpus, run parameterized baseline
points against it, tear down. sweep_blend.py / sweep_rejection.py supply
only their point lists.

SWEEP_KEEP=1 preserves the work dir (per-query reports) after the run.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import socket
import subprocess
import sys
import tempfile
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@contextlib.contextmanager
def eval_server(prefix: str = "sweep_"):
    """Boot the real server (trained assets, current env) over the eval
    corpus; yields (base_url, ground_truth_path, work_dir) once indexed."""
    import requests

    work = tempfile.mkdtemp(prefix=prefix)
    docs, data, logs = (
        os.path.join(work, d) for d in ("documents", "data", "logs")
    )
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
        cwd=REPO,
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
        yield base, gt, work
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


def run_points(base: str, gt: str, work: str, points) -> dict:
    """Evaluate each (name, search_params-update) point against the live
    server using a baseline.yaml variant; returns {name: summary-subset}
    and prints one line per point."""
    from eval_harness.run import main as eval_main

    base_cfg = yaml.safe_load(
        open(os.path.join(REPO, "eval_harness", "configs", "baseline.yaml"))
    )
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
        print(f"{name}: {results[name]}")
    return results
