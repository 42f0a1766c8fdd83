"""Protocol-only ceiling: aiohttp server returning a canned 100-result
search payload; async client load over loopback. No JAX, no engine."""
import asyncio, json, time, sys
from aiohttp import web, ClientSession

results = [
    {"text": "synthetic chunk text " * 10, "score": 0.5, "document": f"doc{i}.pdf",
     "chunk_id": f"c{i}", "chunk_index": i, "page_number": 1 + i % 40,
     "section": None, "embedding_score": 0.3, "lexical_score": 0.1,
     "initial_score": 0.25}
    for i in range(100)
]
payload = {"results": results}
canned = json.dumps(payload)
print(f"payload {len(canned)} bytes")

async def search(request):
    body = await request.json()           # parse like the real route
    k = int(body.get("top_k", 100))
    return web.json_response({"results": results[:k]})

async def main(clients=128, duration=8.0):
    app = web.Application()
    app.router.add_post("/search", search)
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", 3199)
    await site.start()
    n = 0
    stop = time.perf_counter() + duration
    async with ClientSession() as s:
        async def worker():
            nonlocal n
            while time.perf_counter() < stop:
                async with s.post("http://127.0.0.1:3199/search",
                                  json={"query": "q", "top_k": 100}) as r:
                    await r.read()
                n += 1
        await asyncio.gather(*[worker() for _ in range(clients)])
    await runner.cleanup()
    print(f"protocol-only: {n / duration:.0f} qps ({clients} clients, "
          f"server+client sharing one core)")

t0 = time.perf_counter()
for _ in range(200):
    json.dumps(payload)
print(f"json.dumps(100 results): {(time.perf_counter()-t0)/200*1000:.2f} ms")
asyncio.run(main())
