"""Host serving ceiling: does multi-process serving (SO_REUSEPORT) buy
anything on this box? (VERDICT r4 item 6.)

N forked aiohttp processes share one port via reuse_port and serve the
canned /search body (no engine — the question is the HOST ceiling, not the
device). A raw-socket pipelined client drives each configuration. On a
single-core host (len(os.sched_getaffinity(0)) == 1) the expectation is
that N>1 only adds context-switch overhead; the measured numbers decide.

    python scripts/exp_reuseport.py            # N in (1, 2, 4)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import socket
import threading
import time

PORT = 18233
BODY = json.dumps({"results": [
    {"text": "synthetic chunk 123", "score": 0.9, "document": "doc1.pdf",
     "chunk_id": "c123", "chunk_index": 123, "page_number": 3,
     "section": None, "embedding_score": 0.8, "lexical_score": 0.1,
     "initial_score": 0.7}
] * 100}).encode()

REQ = (b"POST /search HTTP/1.1\r\nHost: x\r\nContent-Type: application/json\r\n"
       b"Content-Length: 61\r\n\r\n"
       b'{"query": "probe", "top_k": 100, "diversity_factor": 0.0000}\n')


def server_proc(port: int) -> None:
    import asyncio

    from aiohttp import web

    async def search(request: web.Request) -> web.Response:
        await request.read()
        return web.Response(body=BODY, content_type="application/json")

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    app = web.Application()
    app.router.add_post("/search", search)
    runner = web.AppRunner(app, access_log=None)
    loop.run_until_complete(runner.setup())
    site = web.TCPSite(runner, "127.0.0.1", port, reuse_port=True)
    loop.run_until_complete(site.start())
    loop.run_forever()


def raw_worker(out, dur: float, depth: int = 8) -> None:
    s = socket.create_connection(("127.0.0.1", PORT))
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    n = 0
    stop = time.monotonic() + dur
    buf = b""
    while time.monotonic() < stop:
        s.sendall(REQ * depth)
        need = depth
        while need:
            chunk = s.recv(262144)
            if not chunk:
                out.append(n)
                return
            buf += chunk
            while True:
                i = buf.find(b"\r\n\r\n")
                if i < 0:
                    break
                h = buf[:i]
                j = h.lower().find(b"content-length:")
                cl = int(h[j + 15:h.find(b"\r", j)])
                if len(buf) < i + 4 + cl:
                    break
                buf = buf[i + 4 + cl:]
                n += 1
                need -= 1
    out.append(n)


def measure(nprocs: int, clients: int = 4, dur: float = 8.0) -> float:
    procs = [
        mp.Process(target=server_proc, args=(PORT,), daemon=True)
        for _ in range(nprocs)
    ]
    for p in procs:
        p.start()
    # single-core: interpreter+aiohttp startup serializes across procs
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        try:
            socket.create_connection(("127.0.0.1", PORT), timeout=1).close()
            break
        except OSError:
            time.sleep(0.5)
    time.sleep(1.5 * nprocs)
    try:
        out: list = []
        ts = [
            threading.Thread(target=raw_worker, args=(out, dur))
            for _ in range(clients)
        ]
        t0 = time.monotonic()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        return sum(out) / (time.monotonic() - t0)
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            p.join(timeout=5)
        time.sleep(0.5)


def main() -> None:
    cores = len(os.sched_getaffinity(0))
    results = {"usable_cores": cores}
    for n in (1, 2, 4):
        qps = measure(n)
        results[f"reuseport_{n}proc_qps"] = round(qps, 1)
        print(f"{n} proc(s): {qps:.0f} qps", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
