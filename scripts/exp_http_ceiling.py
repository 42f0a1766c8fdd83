"""Measure the 1-core host's HTTP ceiling: a null aiohttp /search handler
(no engine) driven by (a) the bench's aiohttp client subprocess and (b) a
minimal raw-socket keep-alive client. Decides whether the round-3 serving
work needs a native (C++) front-end or whether aiohttp can reach the 2k QPS
target once the engine is off the critical path."""
from __future__ import annotations

import asyncio
import json
import socket
import subprocess
import sys
import threading
import time

from aiohttp import web

PORT = 18231
BODY = json.dumps({"results": [
    {"text": "synthetic chunk 123", "score": 0.9, "document": "doc1.pdf",
     "chunk_id": "c123", "chunk_index": 123, "page_number": 3,
     "section": None, "embedding_score": 0.8, "lexical_score": 0.1,
     "initial_score": 0.7}
] * 100}).encode()


async def search(request: web.Request) -> web.Response:
    await request.read()
    return web.Response(body=BODY, content_type="application/json")


def run_server():
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    app = web.Application()
    app.router.add_post("/search", search)
    runner = web.AppRunner(app, access_log=None)
    loop.run_until_complete(runner.setup())
    site = web.TCPSite(runner, "127.0.0.1", PORT)
    loop.run_until_complete(site.start())
    loop.run_forever()


t = threading.Thread(target=run_server, daemon=True)
t.start()
time.sleep(1)

# (a) aiohttp client subprocess (the round-2 bench client)
client_src = r"""
import asyncio, json, sys, time
import aiohttp
base, conns, dur = sys.argv[1], int(sys.argv[2]), float(sys.argv[3])
async def main():
    n = 0
    async with aiohttp.ClientSession() as s:
        stop = time.monotonic() + dur
        async def worker(tid):
            nonlocal n
            i = 0
            while time.monotonic() < stop:
                b = {'query': f'client {tid} probe {i}', 'top_k': 100,
                     'diversity_factor': 0.0, 'use_reranker': False}
                try:
                    async with s.post(base + '/search', json=b) as r:
                        await r.read()
                        if r.status == 200: n += 1
                except Exception: continue
                i += 1
        t0 = time.monotonic()
        await asyncio.gather(*[worker(t) for t in range(conns)])
        print(json.dumps({'qps': n / (time.monotonic() - t0)}))
asyncio.run(main())
"""
p = subprocess.run([sys.executable, "-c", client_src,
                    f"http://127.0.0.1:{PORT}", "64", "8"],
                   capture_output=True, text=True)
print("aiohttp-client null-handler:", p.stdout.strip(), flush=True)

# (b) raw-socket pipelined client (threads, keep-alive, no HTTP lib)
REQ = (b"POST /search HTTP/1.1\r\nHost: x\r\nContent-Type: application/json\r\n"
       b"Content-Length: 61\r\n\r\n"
       b'{"query": "probe", "top_k": 100, "diversity_factor": 0.0000}\n')
assert len(b'{"query": "probe", "top_k": 100, "diversity_factor": 0.0000}\n') == 61


def raw_worker(out, dur, depth=8):
    s = socket.create_connection(("127.0.0.1", PORT))
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    n = 0
    stop = time.monotonic() + dur
    buf = b""
    # pipeline `depth` requests at a time
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
                # parse content-length
                h = buf[:i]
                j = h.lower().find(b"content-length:")
                cl = int(h[j + 15:h.find(b"\r", j)])
                if len(buf) < i + 4 + cl:
                    break
                buf = buf[i + 4 + cl:]
                n += 1
                need -= 1
    out.append(n)


for nthreads in (1, 4):
    out = []
    ts = [threading.Thread(target=raw_worker, args=(out, 8)) for _ in range(nthreads)]
    t0 = time.monotonic()
    [x.start() for x in ts]
    [x.join() for x in ts]
    el = time.monotonic() - t0
    print(f"raw-pipelined client x{nthreads}: qps={sum(out)/el:.0f}", flush=True)
