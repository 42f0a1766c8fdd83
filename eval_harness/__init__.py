"""Retrieval quality evaluation framework.

Python counterpart of the reference's eval/ package (SURVEY.md §2.2): IR
metrics, an HTTP/MCP client, a YAML-config runner over JSONL ground truth,
rejection-query handling, page-tolerance fuzzy matching, and report output —
plus a synthetic corpus generator so the whole evaluation can run
hermetically (the reference requires a live proprietary PDF corpus).
"""
