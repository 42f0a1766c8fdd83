"""API surface: HTTP JSON routes + MCP streamable-HTTP tools."""

from rust_local_rag_tpu.server.formatting import format_search_results  # noqa: F401
