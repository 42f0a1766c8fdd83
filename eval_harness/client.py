"""RAG server client for evaluation: HTTP mode (recommended) and MCP
JSON-RPC mode (cf. eval/rag_client.py in the reference — same endpoints,
same fuzzy-matching rules)."""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from typing import List, Optional

import requests


@dataclass
class SearchResult:
    chunk_id: str
    document: str
    page: int
    text: str
    score: float
    section: Optional[str] = None
    embedding_score: Optional[float] = None


@dataclass
class SearchResponse:
    results: List[SearchResult]
    latency_ms: float


class RAGClient:
    def __init__(
        self,
        endpoint: str = "http://localhost:3046",
        mode: str = "http",
        timeout: int = 60,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.mode = mode
        self.timeout = timeout
        self._session = requests.Session()

    def search(
        self, query: str, top_k: int = 5, params: Optional[dict] = None
    ) -> SearchResponse:
        """`params` carries optional per-request search settings (weights,
        use_reranker, rejection_threshold) straight into the request body /
        tool arguments."""
        start = time.perf_counter()
        if self.mode == "mcp":
            results = self._search_via_mcp(query, top_k, params)
        else:
            results = self._search_via_http(query, top_k, params)
        return SearchResponse(
            results=results, latency_ms=(time.perf_counter() - start) * 1000
        )

    def _parse_results(self, rows) -> List[SearchResult]:
        out = []
        for r in rows:
            out.append(
                SearchResult(
                    chunk_id=r.get("chunk_id", ""),
                    document=r.get("document", r.get("document_name", "")),
                    page=int(r.get("page", r.get("page_number", 0))),
                    text=r.get("text", ""),
                    score=float(r.get("score", r.get("relevance_score", 0.0))),
                    section=r.get("section"),
                    embedding_score=r.get("embedding_score"),
                )
            )
        return out

    def _search_via_http(
        self, query: str, top_k: int, params: Optional[dict] = None
    ) -> List[SearchResult]:
        body = {"query": query, "top_k": top_k}
        if params:
            body.update(params)
        try:
            resp = self._session.post(
                f"{self.endpoint}/search",
                json=body,
                timeout=self.timeout,
            )
            resp.raise_for_status()
            return self._parse_results(resp.json().get("results", []))
        except requests.exceptions.RequestException as e:
            raise ConnectionError(f"Failed to connect to RAG server: {e}") from e

    def _search_via_mcp(
        self, query: str, top_k: int, params: Optional[dict] = None
    ) -> List[SearchResult]:
        """MCP tools/call; our server returns markdown text like the
        reference's, so results are parsed from the markdown blocks."""
        arguments = {"query": query, "top_k": top_k}
        if params:
            arguments.update(params)
        payload = {
            "jsonrpc": "2.0",
            "id": int(time.time() * 1000),
            "method": "tools/call",
            "params": {
                "name": "search_documents",
                "arguments": arguments,
            },
        }
        try:
            resp = self._session.post(
                self.endpoint, json=payload, timeout=self.timeout
            )
            resp.raise_for_status()
            data = resp.json()
        except requests.exceptions.RequestException as e:
            raise ConnectionError(f"Failed to connect to MCP endpoint: {e}") from e
        if "error" in data:
            raise ConnectionError(f"MCP error: {data['error']}")
        texts = [
            item.get("text", "")
            for item in data.get("result", {}).get("content", [])
            if item.get("type") == "text"
        ]
        return _parse_markdown_results("\n".join(texts))

    def health_check(self) -> bool:
        try:
            if self.mode == "mcp":
                payload = {"jsonrpc": "2.0", "id": 1, "method": "tools/list"}
                r = self._session.post(self.endpoint, json=payload, timeout=5)
                return r.status_code == 200 and "result" in r.json()
            r = self._session.get(f"{self.endpoint}/readyz", timeout=5)
            return r.status_code == 200
        except (requests.exceptions.RequestException, ValueError):
            return False

    def get_stats(self) -> dict:
        if self.mode == "mcp":
            payload = {
                "jsonrpc": "2.0",
                "id": 1,
                "method": "tools/call",
                "params": {"name": "get_stats", "arguments": {}},
            }
            r = self._session.post(self.endpoint, json=payload, timeout=10)
            r.raise_for_status()
            for item in r.json().get("result", {}).get("content", []):
                text = item.get("text", "")
                if "{" in text:
                    return json.loads(text[text.index("{"):])
            return {}
        r = self._session.get(f"{self.endpoint}/stats", timeout=10)
        r.raise_for_status()
        return r.json()


def _parse_markdown_results(text: str) -> List[SearchResult]:
    """Parse the MCP markdown format back into structured results:
    **1. [85%] doc.pdf (page 5)** blocks separated by ---."""
    import re

    results: List[SearchResult] = []
    pattern = re.compile(
        r"\*\*(\d+)\. \[(\d+)%\] (.+?)(?: \(page (\d+)\))?\*\*\n"
        r"(?:\*Section: (.*?)\*\n)?\n(.*?)(?=\n\n---|\Z)",
        re.S,
    )
    for m in pattern.finditer(text):
        _, pct, doc, page, section, body = m.groups()
        results.append(
            SearchResult(
                chunk_id="",
                document=doc.strip(),
                page=int(page) if page else 0,
                text=body.strip(),
                score=int(pct) / 100.0,
                section=section,
            )
        )
    return results


# ----- fuzzy gold matching (eval/rag_client.py:249-283 semantics) -----

def normalize_doc_name(name: str) -> str:
    return name.lower().replace(".pdf", "").strip()


def make_chunk_key(document: str, page: int) -> str:
    return f"{normalize_doc_name(document)}::{page}"


def matches_gold_reference(
    retrieved: SearchResult, gold_doc: str, gold_page: int, tolerance: int = 1
) -> bool:
    doc_match = normalize_doc_name(retrieved.document) == normalize_doc_name(gold_doc)
    page_match = abs(retrieved.page - gold_page) <= tolerance
    return doc_match and page_match
