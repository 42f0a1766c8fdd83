"""rag-tui — terminal client for the RAG server.

Python/curses counterpart of the reference's ratatui client
(src/bin/rag_tui, SURVEY.md §2.1 row 18 / §3.5): search-as-you-type with a
stale-search-id guard, result list + detail view with the full score
breakdown, background reindex trigger + job polling, periodic stats/health
probes, a settings editor that round-trips .env preserving comments, and
three color themes. Runs against the same HTTP API.
"""
