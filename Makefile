# rust_local_rag_tpu — build/test/run targets (cf. the reference's Makefile)

PY ?= python

.PHONY: help test native bench serve tui eval-generate eval check ci clean

help:
	@echo "targets:"
	@echo "  test          run the test suite (8-device virtual CPU mesh)"
	@echo "  native        build the C++ host components (BM25 index)"
	@echo "  bench         run the TPU benchmark (prints one JSON line)"
	@echo "  serve         start the RAG server (HTTP + MCP)"
	@echo "  tui           start the terminal client"
	@echo "  eval-generate write the synthetic eval corpus + ground truth"
	@echo "  eval          run the quality evaluation against a live server"
	@echo "  check         eval-harness health/ground-truth sanity check"
	@echo "  ci            native + test"

test:
	$(PY) -m pytest tests/ -x -q

native:
	$(MAKE) -C native

bench:
	$(PY) bench.py

serve:
	$(PY) -m rust_local_rag_tpu

tui:
	$(PY) -m rust_local_rag_tpu.tui

eval-generate:
	$(PY) -m eval_harness.run generate

eval:
	$(PY) -m eval_harness.run evaluate --config eval_harness/configs/baseline.yaml

check:
	$(PY) -m eval_harness.run check

ci: native test

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
