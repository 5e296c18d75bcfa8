"""Multi-backend request router — scale serving across chips/hosts.

The continuous-batching engine (serve/engine.py) is single-device; pods
and multi-chip hosts run one server per chip and put this router in
front (ROADMAP §9; the reference is single-process CPU and has no serving
story at all, PLAN.md ambition). Protocol is the same JSON-lines one as
serve/server.py, so clients cannot tell a router from a server.

Routing: least-outstanding-requests (a long-form request occupies its
backend longer, so new work drains to idle chips — the cross-host
analog of the engine's in-process lane split). `{"stats": true}` fans out
to every backend and returns the merged counters plus per-backend detail.

Run: python -m whisper_tpu.serve.router --backends h1:p1,h2:p2 [--port P]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
from typing import List, Tuple

from whisper_tpu.serve.server import _LINE_LIMIT


class Backend:
    def __init__(self, host: str, port: int):
        self.host = host
        self.port = port
        self.inflight = 0
        self.served = 0
        self.errors = 0

    @property
    def name(self) -> str:
        return f"{self.host}:{self.port}"

    async def forward(self, line: bytes) -> bytes:
        """One request -> one response line (connection per request keeps
        failure isolation simple; the engine batches across connections)."""
        self.inflight += 1
        try:
            reader, writer = await asyncio.open_connection(
                self.host, self.port, limit=_LINE_LIMIT
            )
            try:
                writer.write(line)
                await writer.drain()
                resp = await reader.readline()
                if not resp:
                    raise ConnectionError(f"backend {self.name} closed")
                self.served += 1
                return resp
            finally:
                writer.close()
                try:
                    await writer.wait_closed()
                except Exception:
                    pass
        except Exception:
            self.errors += 1
            raise
        finally:
            self.inflight -= 1


class Router:
    def __init__(self, backends: List[Tuple[str, int]]):
        self.backends = [Backend(h, p) for h, p in backends]

    def pick(self) -> Backend:
        return min(self.backends, key=lambda b: b.inflight)

    async def stats(self, req_id) -> bytes:
        per = {}
        for b in self.backends:
            try:
                resp = json.loads(await b.forward(
                    json.dumps({"id": req_id, "stats": True}).encode() + b"\n"
                ))
                per[b.name] = resp.get("stats", {})
            except Exception as e:
                per[b.name] = {"error": str(e)}
        merged: dict = {}
        for s in per.values():
            for k, v in s.items():
                if isinstance(v, (int, float)):
                    merged[k] = merged.get(k, 0) + v
        merged["backends"] = per
        return (json.dumps({"id": req_id, "stats": merged}) + "\n").encode()

    async def handle_client(self, reader, writer) -> None:
        try:
            while True:
                line = await reader.readline()
                if not line:
                    break
                req_id = None
                try:
                    msg = json.loads(line)
                    req_id = msg.get("id") if isinstance(msg, dict) else None
                    if isinstance(msg, dict) and msg.get("stats"):
                        resp = await self.stats(req_id)
                    else:
                        resp = await self.pick().forward(line)
                except Exception as e:  # per-request isolation
                    resp = (json.dumps(
                        {"id": req_id, "error": str(e)}
                    ) + "\n").encode()
                writer.write(resp)
                await writer.drain()
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:
                pass


async def serve_router(backends: List[Tuple[str, int]], host: str,
                       port: int, ready_event=None) -> None:
    router = Router(backends)
    server = await asyncio.start_server(
        router.handle_client, host, port, limit=_LINE_LIMIT
    )
    if ready_event is not None:
        ready_event.set()
    async with server:
        await server.serve_forever()


def parse_backends(spec: str) -> List[Tuple[str, int]]:
    out = []
    for part in spec.split(","):
        host, _, port = part.strip().rpartition(":")
        out.append((host or "127.0.0.1", int(port)))
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backends", required=True,
                   help="comma list of host:port transcription servers")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8700)
    args = p.parse_args(argv)

    class Ev:
        def set(self):
            print(f"Routing on {args.host}:{args.port} -> "
                  f"{args.backends}", flush=True)

    asyncio.run(serve_router(parse_backends(args.backends), args.host,
                             args.port, Ev()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
