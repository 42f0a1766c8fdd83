"""Hot-lane HTTP fast path: a hand-rolled asyncio.Protocol that serves
POST /search straight from the socket and hands EVERYTHING else to
aiohttp's own protocol on the same port.

Why it exists: the reference's API layer is compiled Rust (axum,
/root/reference/src/mcp_server.rs:573-582) and costs microseconds per
request; aiohttp's per-request machinery (streams, multidict parsing, a
Task per request) measures ~260 us on this single-core host — most of
the serving budget at multi-thousand-QPS targets. The fast path parses
the one hot route with bytes.find, submits into the search batcher with
a loop-native completion, and writes the native serializer's response
bytes directly to the transport: no Task, no Request object, no
middleware. Everything that is not exactly `POST /search` (MCP, SSE,
jobs, stats, chunked bodies, 100-continue) is delegated by swapping the
transport's protocol to a freshly made aiohttp RequestHandler and
replaying the buffered bytes — aiohttp sees a normal connection from
byte 0 of the current request.

Correctness contracts:
  * Responses on one connection go out in request order (HTTP/1.1
    pipelining): each request takes an ordered slot; writes drain from
    the head.
  * Delegation only happens at a request boundary with no fast responses
    pending; a mixed connection keeps aiohttp semantics from that
    request on.
  * The fast path answers exactly like http_api's /search handler: same
    validation (shared helper), same 400 texts, same hot-lane bytes or
    object-lane JSON.
"""

from __future__ import annotations

import asyncio
import json
import logging
from collections import deque
from typing import Optional

logger = logging.getLogger(__name__)

_MAX_HEADER = 32 * 1024
_MAX_BODY = 64 * 1024 * 1024  # match aiohttp client_max_size

_H200 = (
    b"HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n"
    b"Content-Length: "
)
_H400 = (
    b"HTTP/1.1 400 Bad Request\r\nContent-Type: text/plain; "
    b"charset=utf-8\r\nContent-Length: "
)
_H500 = (
    b"HTTP/1.1 500 Internal Server Error\r\nContent-Length: 0\r\n\r\n"
)


class _Slot:
    """One in-order response slot on a connection."""

    __slots__ = ("payload", "close_after")

    def __init__(self, close_after: bool = False):
        self.payload: Optional[bytes] = None  # full response bytes
        self.close_after = close_after


class _SlotFuture:
    """Future-shaped completion the batcher can resolve on the event
    loop (SearchBatcher._complete treats it as an asyncio future and
    calls set_result/set_exception via call_soon_threadsafe)."""

    __slots__ = ("proto", "slot")

    def __init__(self, proto: "FastPathProtocol", slot: _Slot):
        self.proto = proto
        self.slot = slot

    def done(self) -> bool:
        return self.slot.payload is not None

    def set_result(self, res) -> None:
        self.proto._finish_slot(self.slot, res, None)

    def set_exception(self, exc: BaseException) -> None:
        self.proto._finish_slot(self.slot, None, exc)


class FastPathProtocol(asyncio.Protocol):
    def __init__(self, aio_factory, ctx, loop):
        # aio_factory: aiohttp's web.Server (a protocol factory)
        self._factory = aio_factory
        self._ctx = ctx
        self._loop = loop
        self._buf = bytearray()
        self._pending: "deque[_Slot]" = deque()
        self._transport = None
        self._delegated = False
        self._want_delegate = False
        self._closed = False

    # ----- asyncio.Protocol -----

    def connection_made(self, transport) -> None:
        self._transport = transport

    def data_received(self, data: bytes) -> None:
        # after set_protocol the loop delivers straight to aiohttp; this
        # only runs while the connection is in fast mode
        self._buf += data
        self._process()

    def eof_received(self):
        return False  # close when peer half-closes

    def connection_lost(self, exc) -> None:
        self._closed = True
        self._pending.clear()

    # ----- request loop -----

    def _process(self) -> None:
        while not self._closed and not self._want_delegate:
            he = self._buf.find(b"\r\n\r\n")
            if he < 0:
                if len(self._buf) > _MAX_HEADER:
                    self._transport.close()
                return
            head = bytes(self._buf[:he])
            if not head.startswith(b"POST /search"):
                self._want_delegate = True
                break
            # require an exact path match: "POST /search HTTP/1.1" or a
            # query-string variant goes to aiohttp for real routing
            nl = head.find(b"\r\n")
            reqline = head if nl < 0 else head[:nl]
            parts = reqline.split()
            if len(parts) < 2 or parts[1] != b"/search":
                self._want_delegate = True
                break
            low = head.lower()
            if (
                b"transfer-encoding:" in low
                or b"expect:" in low
            ):
                self._want_delegate = True
                break
            j = low.find(b"content-length:")
            if j < 0:
                self._want_delegate = True
                break
            eol = low.find(b"\r", j)
            try:
                cl = int(low[j + 15 : eol if eol > 0 else len(low)])
            except ValueError:
                self._want_delegate = True
                break
            if cl > _MAX_BODY:
                self._want_delegate = True
                break
            total = he + 4 + cl
            if len(self._buf) < total:
                return  # body not complete yet
            body = bytes(self._buf[he + 4 : total])
            del self._buf[:total]
            close_after = b"connection: close" in low
            self._handle(body, close_after)
        if self._want_delegate and not self._delegated:
            # only swap protocols at a clean point: no fast response may
            # still be queued, or interleaved writes would corrupt the
            # stream order
            if not self._pending:
                self._delegate()

    def _handle(self, body: bytes, close_after: bool) -> None:
        from rust_local_rag_tpu.server.http_api import parse_search_params

        slot = _Slot(close_after)
        self._pending.append(slot)
        try:
            payload = json.loads(body)
        except (ValueError, UnicodeDecodeError):
            self._finish_slot(slot, None, None, err400=b"invalid JSON")
            return
        if not isinstance(payload, dict):
            self._finish_slot(slot, None, None, err400=b"invalid JSON")
            return
        params, err = parse_search_params(payload)
        if err is not None:
            self._finish_slot(slot, None, None, err400=err.encode())
            return
        try:
            self._ctx.batcher.submit(
                params["query"],
                params["top_k"],
                params["diversity"],
                params["weights"],
                rejection_threshold=params["rejection_threshold"],
                rejection_query_floor=params["rejection_query_floor"],
                use_reranker=params["use_reranker"],
                want_payload=True,
                rejection_cosine_floor=params["rejection_cosine_floor"],
                rejection_unseen_mass=params["rejection_unseen_mass"],
                rejection_unseen_cos=params["rejection_unseen_cos"],
                rejection_unseen_judge=params["rejection_unseen_judge"],
                afuture=_SlotFuture(self, slot),
                loop=self._loop,
            )
        except Exception as e:  # noqa: BLE001
            self._finish_slot(slot, None, e)

    # ----- completion (runs on the event loop) -----

    def _finish_slot(self, slot, res, exc, err400: bytes = None) -> None:
        if err400 is not None:
            slot.payload = (
                _H400 + str(len(err400)).encode() + b"\r\n\r\n" + err400
            )
        elif exc is not None:
            logger.error("Search error: %s", exc)
            slot.payload = _H500
        elif isinstance(res, (bytes, bytearray)):
            slot.payload = (
                _H200 + str(len(res)).encode() + b"\r\n\r\n" + bytes(res)
            )
        else:
            # object lane (rerank-on / sharded): same JSON the aiohttp
            # handler produces
            out = json.dumps(
                {"results": [r.to_dict() for r in res]}
            ).encode()
            slot.payload = (
                _H200 + str(len(out)).encode() + b"\r\n\r\n" + out
            )
        self._drain()

    def _drain(self) -> None:
        if self._closed:
            return
        wrote_close = False
        bufs = []
        while self._pending and self._pending[0].payload is not None:
            slot = self._pending.popleft()
            bufs.append(slot.payload)
            if slot.close_after:
                wrote_close = True
                break
        if bufs:
            self._transport.write(b"".join(bufs))
        if wrote_close:
            self._transport.close()
            self._closed = True
        elif self._want_delegate and not self._pending and not self._delegated:
            self._delegate()

    # ----- delegation -----

    def _delegate(self) -> None:
        """Swap this connection over to aiohttp: future transport events
        go directly to a fresh RequestHandler; buffered bytes replay so
        aiohttp sees the request from its first byte."""
        self._delegated = True
        inner = self._factory()
        self._transport.set_protocol(inner)
        inner.connection_made(self._transport)
        if self._buf:
            inner.data_received(bytes(self._buf))
            self._buf = bytearray()


def serve(app, ctx, host: str, port: int) -> None:
    """Blocking serve loop: aiohttp runner + fast-path protocol factory
    on one socket. SIGTERM/SIGINT (or KeyboardInterrupt) stop the loop;
    cleanup mirrors web.run_app."""
    import signal

    from aiohttp import web

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    runner = web.AppRunner(app, access_log=None)
    loop.run_until_complete(runner.setup())
    factory = runner.server  # aiohttp's own protocol factory
    srv = loop.run_until_complete(
        loop.create_server(
            lambda: FastPathProtocol(factory, ctx, loop), host, port
        )
    )

    def _stop() -> None:
        loop.stop()

    for sig in (signal.SIGINT, signal.SIGTERM):
        try:
            loop.add_signal_handler(sig, _stop)
        except (NotImplementedError, RuntimeError):
            pass
    try:
        loop.run_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.close()
        loop.run_until_complete(srv.wait_closed())
        loop.run_until_complete(runner.cleanup())
        loop.close()
