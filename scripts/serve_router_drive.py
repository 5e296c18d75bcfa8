"""Router-fronted serving drive on the REAL chip (VERDICT r4 item 7).

Starts one real transcription server (the chip's engine) as a subprocess,
an in-process router it self-registers with (periodic re-announce), then
drives N concurrent short streams through the ROUTER and reports the
aggregate real-time factor — validating the registration + routing path
against the real engine rather than echo backends (tests/test_serve.py)
or CPU engines (tests/test_multihost_serve.py).

Single-chip environment => one backend; the point is the control plane +
data plane composition on real hardware, not multi-chip scaling (see
docs/MULTIHOST.md trust-model section for what remains unexercised).

Usage: python scripts/serve_router_drive.py [--streams 16] [--seconds 2]
       [--variant x5] [--model-id openai/whisper-base] [--reps 3]
"""

from __future__ import annotations

import argparse
import base64
import concurrent.futures as cf
import json
import os
import socket
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _ask(port: int, req: dict, timeout=600) -> dict:
    with socket.create_connection(("127.0.0.1", port), timeout=timeout) as s:
        s.sendall((json.dumps(req) + "\n").encode())
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    return json.loads(buf)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--variant", default="x5")
    ap.add_argument("--model-id", default="openai/whisper-base")
    ap.add_argument("--max-new-tokens", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import asyncio

    from whisper_tpu.serve.router import serve_router

    rport = _free_port()
    ready = threading.Event()
    loop_holder: dict = {}

    def run_router():
        async def amain():
            class Ev:
                def set(self):
                    ready.set()

            loop_holder["loop"] = asyncio.get_running_loop()
            await serve_router([], "127.0.0.1", rport, Ev())

        try:
            asyncio.run(amain())
        except RuntimeError:
            pass

    threading.Thread(target=run_router, daemon=True).start()
    if not ready.wait(10):
        print("router failed to bind", file=sys.stderr)
        return 1

    sport = _free_port()
    env = dict(os.environ)
    # PREPEND, don't clobber: the axon TPU plugin is discovered via an
    # existing PYTHONPATH entry (/root/.axon_site); overwriting it made the
    # server subprocess die with "Backend 'axon' is not in the list of known
    # backends" (queue3 log 07:39Z).
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    srv = subprocess.Popen(
        [sys.executable, "-m", "whisper_tpu.serve.server",
         "--allow-random-init", "--model-id", args.model_id,
         "--variant", args.variant,
         "--max-new-tokens", str(args.max_new_tokens),
         "--port", str(sport), "--register-with", f"127.0.0.1:{rport}",
         "--reannounce-s", "5"],
        env=env, cwd=REPO,
    )
    try:
        # Registration (post-warmup listener bind) is the readiness gate.
        deadline = time.time() + 1200
        while time.time() < deadline:
            if srv.poll() is not None:
                print("server died during warmup", file=sys.stderr)
                return 1
            try:
                stats = _ask(rport, {"id": "s", "stats": True}, timeout=10)
                if stats.get("stats", {}).get("backends"):
                    break
            except OSError:
                pass
            time.sleep(2.0)
        else:
            print("backend never registered", file=sys.stderr)
            return 1
        print(f"backend registered; driving {args.streams} x "
              f"{args.seconds:g}s streams through the router", flush=True)

        rng = np.random.default_rng(0)
        n_samp = int(args.seconds * 16000)
        payloads = []
        for i in range(args.streams):
            x = (0.1 * np.sin(2 * np.pi * (150 + 10 * i)
                              * np.arange(n_samp) / 16000.0)
                 + 0.03 * rng.standard_normal(n_samp))
            pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
            payloads.append(base64.b64encode(pcm.tobytes()).decode())

        total_audio = args.streams * args.seconds
        for rep in range(args.reps):
            def one(i):
                t = time.perf_counter()
                r = _ask(rport, {"id": f"{rep}-{i}",
                                 "pcm16_b64": payloads[i]})
                assert "error" not in r, r
                return time.perf_counter() - t

            t0 = time.perf_counter()
            with cf.ThreadPoolExecutor(args.streams) as ex:
                lat = sorted(ex.map(one, range(args.streams)))
            wall = time.perf_counter() - t0
            p = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))]
            print(f"rep{rep}: wall {wall:.2f}s -> "
                  f"{total_audio / wall:.0f}x aggregate THROUGH ROUTER | "
                  f"latency p50 {p(0.5):.2f}s p95 {p(0.95):.2f}s",
                  flush=True)
        stats = _ask(rport, {"id": "sf", "stats": True})["stats"]
        per = stats["backends"]
        print("router accounting:",
              {k: {"served": v.get("router_served"),
                   "errors": v.get("router_errors"),
                   "healthy": v.get("healthy")} for k, v in per.items()},
              flush=True)
        return 0
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=30)
        except subprocess.TimeoutExpired:
            srv.kill()
        loop = loop_holder.get("loop")
        if loop is not None:
            loop.call_soon_threadsafe(loop.stop)


if __name__ == "__main__":
    raise SystemExit(main())
