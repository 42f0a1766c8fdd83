"""HTTP client for the TUI (cf. bin/rag_tui/api.rs)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import requests


@dataclass
class TuiSearchResult:
    text: str
    score: float
    document: str
    chunk_id: str
    chunk_index: int
    page_number: int
    section: Optional[str] = None
    embedding_score: Optional[float] = None
    lexical_score: Optional[float] = None
    initial_score: Optional[float] = None
    reranker_score: Optional[float] = None
    yes_logprob: Optional[float] = None
    no_logprob: Optional[float] = None

    @classmethod
    def from_json(cls, r: dict) -> "TuiSearchResult":
        return cls(
            text=r.get("text", ""),
            score=float(r.get("score", 0.0)),
            document=r.get("document", ""),
            chunk_id=r.get("chunk_id", ""),
            chunk_index=int(r.get("chunk_index", 0)),
            page_number=int(r.get("page_number", 0)),
            section=r.get("section"),
            embedding_score=r.get("embedding_score"),
            lexical_score=r.get("lexical_score"),
            initial_score=r.get("initial_score"),
            reranker_score=r.get("reranker_score"),
            yes_logprob=r.get("yes_logprob"),
            no_logprob=r.get("no_logprob"),
        )


@dataclass
class Stats:
    documents: int = 0
    chunks: int = 0
    status: str = "unknown"
    embedding_model: str = ""
    reranker_model: Optional[str] = None


@dataclass
class JobStatus:
    job_id: str
    status: str
    progress: int
    total: int
    error: Optional[str] = None


class ApiClient:
    def __init__(self, base_url: str = "http://127.0.0.1:3046", timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._session = requests.Session()

    def search(self, query: str, top_k: int = 10, diversity: float = 0.3
               ) -> List[TuiSearchResult]:
        r = self._session.post(
            f"{self.base_url}/search",
            json={"query": query, "top_k": top_k, "diversity_factor": diversity},
            timeout=self.timeout,
        )
        r.raise_for_status()
        return [TuiSearchResult.from_json(x) for x in r.json().get("results", [])]

    def stats(self) -> Stats:
        r = self._session.get(f"{self.base_url}/stats", timeout=5)
        r.raise_for_status()
        d = r.json()
        return Stats(
            documents=int(d.get("documents", 0)),
            chunks=int(d.get("chunks", 0)),
            status=d.get("status", "unknown"),
            embedding_model=d.get("embedding_model", ""),
            reranker_model=d.get("reranker_model"),
        )

    def health(self) -> bool:
        try:
            return (
                self._session.get(f"{self.base_url}/healthz", timeout=3).status_code
                == 200
            )
        except requests.RequestException:
            return False

    def start_reindex(self) -> JobStatus:
        r = self._session.post(f"{self.base_url}/reindex", timeout=10)
        if r.status_code == 409:
            raise RuntimeError("A reindex job is already in progress")
        r.raise_for_status()
        d = r.json()
        return JobStatus(job_id=d["job_id"], status="pending", progress=0, total=0)

    def job_status(self, job_id: str) -> Optional[JobStatus]:
        r = self._session.get(f"{self.base_url}/jobs/{job_id}", timeout=5)
        if r.status_code == 404:
            return None
        r.raise_for_status()
        d = r.json()
        return JobStatus(
            job_id=d["job_id"],
            status=d["status"],
            progress=int(d.get("progress", 0)),
            total=int(d.get("total", 0)),
            error=d.get("error"),
        )

    def watch_jobs(self, on_job, should_stop) -> None:
        """Blocking: open the server's MCP SSE channel and invoke
        on_job(JobStatus) for each pushed reindex progress notification
        (server/sessions.py job push). Returns when the stream drops or
        should_stop() turns true; the caller reconnects with backoff.
        The TUI uses this for instant progress; 1 s polling remains the
        fallback when the channel is down."""
        import json as _json

        r = self._session.post(
            f"{self.base_url}/mcp",
            json={
                "jsonrpc": "2.0", "id": 1, "method": "initialize",
                "params": {"protocolVersion": "2025-03-26"},
            },
            timeout=10,
        )
        sid = r.headers.get("Mcp-Session-Id")
        if not sid:
            return
        with self._session.get(
            f"{self.base_url}/mcp",
            headers={"Accept": "text/event-stream", "Mcp-Session-Id": sid},
            stream=True,
            timeout=(5, 60),  # keep-alives arrive every 15 s
        ) as resp:
            if resp.status_code != 200:
                return
            for line in resp.iter_lines(decode_unicode=True):
                if should_stop():
                    return
                if not line or not line.startswith("data: "):
                    continue
                try:
                    msg = _json.loads(line[6:])
                except ValueError:
                    continue
                params = msg.get("params") or {}
                if (
                    msg.get("method") == "notifications/message"
                    and params.get("logger") == "jobs"
                ):
                    d = params.get("data") or {}
                    on_job(
                        JobStatus(
                            job_id=d.get("job_id", ""),
                            status=d.get("status", "unknown"),
                            progress=int(d.get("progress") or 0),
                            total=int(d.get("total") or 0),
                            error=d.get("error"),
                        )
                    )

    def active_job(self) -> Optional[JobStatus]:
        r = self._session.get(f"{self.base_url}/jobs/active", timeout=5)
        r.raise_for_status()
        d = r.json()
        if d is None:
            return None
        return JobStatus(
            job_id=d["job_id"],
            status=d["status"],
            progress=int(d.get("progress", 0)),
            total=int(d.get("total", 0)),
            error=d.get("error"),
        )
