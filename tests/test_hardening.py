"""Hardening parity tests: dual-model hot-swap, fail-fast exit codes,
concurrent PDF extraction, profiling utilities
(cf. tests/exit_codes.rs, tests/async_pdf.rs, SURVEY.md §5)."""

import os
import subprocess
import sys
import threading

import numpy as np
import pytest

from rust_local_rag_tpu.engine import RagEngine
from rust_local_rag_tpu.models import EmbeddingService, HashEncoder
from rust_local_rag_tpu.ingest.pdf import extract_pdf_text
from rust_local_rag_tpu.utils.profiling import StepTimer

import pdfgen


# ----- dual-model coexistence (BASELINE config 3; rag_engine.rs:1586-1645) -----

def test_two_models_hot_swap(tmp_path):
    """nomic-768 and mxbai-1024 class indexes coexist; switching models
    never destroys the other's data."""
    data = str(tmp_path)
    docs = {
        "a.pdf": pdfgen.make_pdf(["Alpha document about quantum physics topics."]),
        "b.pdf": pdfgen.make_pdf(["Beta document about gardening and compost."]),
    }

    svc768 = EmbeddingService(HashEncoder(dim=768, model_name="nomic-embed-text"))
    eng_a = RagEngine(data, svc768)
    for name, pdf in docs.items():
        eng_a.add_document(name, pdf)
    assert eng_a.get_stats()["chunks"] >= 2

    # switch to a 1024-d model: fresh index, 768 data untouched on disk
    svc1024 = EmbeddingService(HashEncoder(dim=1024, model_name="mxbai-embed-large"))
    eng_b = RagEngine(data, svc1024)
    assert len(eng_b.store) == 0
    eng_b.add_document("a.pdf", docs["a.pdf"])
    assert eng_b.get_stats()["chunks"] >= 1
    assert eng_b.store.dim == 1024

    # switch back: the 768 index is fully intact (incl. hash-skip state)
    eng_a2 = RagEngine(data, EmbeddingService(HashEncoder(dim=768, model_name="nomic-embed-text")))
    assert eng_a2.get_stats()["chunks"] == eng_a.get_stats()["chunks"]
    assert eng_a2.add_document("a.pdf", docs["a.pdf"]) == 0  # hash skip
    res = eng_a2.search("quantum physics", 1)
    assert res and res[0].document == "a.pdf"


def test_dim_change_same_model_forces_reindex(tmp_path):
    """Same model name, different encoder dim -> reindex flag, no crash."""
    data = str(tmp_path)
    eng = RagEngine(data, EmbeddingService(HashEncoder(dim=64, model_name="m")))
    eng.add_document("a.pdf", pdfgen.make_pdf(["Some document content here."]))
    eng2 = RagEngine(data, EmbeddingService(HashEncoder(dim=128, model_name="m")))
    assert eng2.needs_reindex()
    assert len(eng2.store) == 0


# ----- fail-fast exit code (tests/exit_codes.rs parity) -----

@pytest.mark.slow
def test_server_exits_nonzero_on_broken_startup(tmp_path):
    """Spawn the real entry point with an impossible DATA_DIR and assert a
    non-zero exit (the reference asserts the same with an unreachable
    OLLAMA_URL)."""
    env = dict(os.environ)
    env.update(
        {
            "DATA_DIR": "/proc/definitely/not/writable",
            "DOCUMENTS_DIR": str(tmp_path / "docs"),
            "LOG_DIR": str(tmp_path / "logs"),
            "RAG_TPU_FAKE_ENCODER": "1",
            "JAX_PLATFORMS": "cpu",
        }
    )
    proc = subprocess.run(
        [sys.executable, "-m", "rust_local_rag_tpu"],
        env=env,
        capture_output=True,
        timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode != 0
    assert b"Startup failed" in proc.stderr + proc.stdout


# ----- concurrent PDF extraction (tests/async_pdf.rs parity) -----

def test_concurrent_pdf_extraction_no_interference():
    pdfs = [
        pdfgen.make_pdf([f"Document number {i} with unique content token{i}."])
        for i in range(8)
    ]
    results = [None] * 8
    errors = []

    def work(i):
        try:
            results[i] = extract_pdf_text(pdfs[i])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for i, text in enumerate(results):
        assert f"token{i}" in text  # no cross-contamination


# ----- profiling utilities -----

def test_step_timer_percentiles():
    t = StepTimer()
    for ms in [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]:
        t.record_ms(ms)
    s = t.stats()
    assert s.sample_size == 10
    assert s.mean_ms == 55
    assert s.median_ms == 60  # data[n//2]
    # nearest-rank: idx = round(0.95 * (10-1)) = round(8.55) = 9 -> 100
    assert s.p95_ms == 100
    assert s.p99_ms == 100
    assert s.max_ms == 100


def test_step_timer_context_manager():
    import time as _t

    t = StepTimer()
    with t:
        _t.sleep(0.01)
    s = t.stats()
    assert s.sample_size == 1
    assert s.max_ms >= 5


def test_step_timer_empty_raises():
    with pytest.raises(ValueError):
        StepTimer().stats()
