"""HTTP front end for the online-TTA server: a deployable endpoint.

Wraps `serve.TTAServer` (per-client adaptation state, greedy-tick vmapped
batching) in a threaded HTTP server with a micro-batching queue: requests
that arrive while a tick is running coalesce into the next tick, so
concurrent clients share one compiled vmapped step exactly as in the
library API — each client's trajectory stays what a dedicated stream
would produce (tests/test_serve_http.py asserts equality through the
wire).  The reference has no serving story at all; this is the
transport layer over the beyond-reference serving capability.

Protocol (binary npy/npz over HTTP — no serialization framework needed):

  POST /register?client=ID                  -> 200 {"ok": true}, 409 dup
  POST /reset?client=ID                     -> 200, 404 unknown
  POST /submit?client=ID   body: .npz with `pc` (B,N,3) [+ `rgb`]
                                            -> 200 .npy final logits (B,K)
  POST /snapshot?client=ID&path=P[&blocking=0]  -> 200 (server-local path)
  POST /restore?client=ID&path=P            -> 200
  GET  /healthz                             -> 200 {"clients":…,"ticks":…}

One request per client per tick is enforced by deferral, not rejection: a
client's second in-flight submit waits for the next tick.
"""
from __future__ import annotations

import io
import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np

from uni_adapter_tpu.serve import TTAServer


class _Pending:
    __slots__ = ("client", "pc", "rgb", "event", "result", "error")

    def __init__(self, client: str, pc: np.ndarray, rgb: Optional[np.ndarray]):
        self.client = client
        self.pc = pc
        self.rgb = rgb
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[Exception] = None


class _Batcher:
    """Micro-batching queue in front of TTAServer.submit.

    A single ticker thread drains the queue; while a tick computes, newly
    arriving requests pile up for the next one (natural coalescing — no
    fixed gather window needed beyond `gather_ms` for the very first
    request of a tick).  At most one request per client per tick: extras
    stay queued.
    """

    def __init__(self, server: TTAServer, gather_ms: float = 2.0,
                 max_batch: Optional[int] = None,
                 state_lock: Optional[threading.Lock] = None):
        self._server = server
        self._gather_s = gather_ms / 1e3
        self._max_batch = max_batch or max(server.sizes)
        # guards server.states against concurrent register/reset/snapshot
        # (a reset landing mid-tick must not be overwritten by the tick's
        # state write-back)
        self._state_lock = state_lock or threading.Lock()
        self._lock = threading.Lock()
        self._queue: List[_Pending] = []
        self._wakeup = threading.Event()
        self._stop = False
        self.ticks = 0
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="tta-http-batcher")
        self._thread.start()

    def submit(self, client: str, pc: np.ndarray,
               rgb: Optional[np.ndarray], timeout: float = 300.0
               ) -> np.ndarray:
        req = _Pending(client, pc, rgb)
        with self._lock:
            self._queue.append(req)
        self._wakeup.set()
        if not req.event.wait(timeout):
            raise TimeoutError(f"tick did not complete within {timeout}s")
        if req.error is not None:
            raise req.error
        return req.result

    def shutdown(self) -> None:
        self._stop = True
        self._wakeup.set()
        self._thread.join(timeout=10)

    def _take_tick(self) -> List[_Pending]:
        """Pop up to max_batch requests, at most one per client, preserving
        arrival order for the rest."""
        with self._lock:
            tick: List[_Pending] = []
            seen = set()
            rest: List[_Pending] = []
            for req in self._queue:
                if req.client not in seen and len(tick) < self._max_batch:
                    seen.add(req.client)
                    tick.append(req)
                else:
                    rest.append(req)
            self._queue = rest
            if not self._queue:
                self._wakeup.clear()
        return tick

    def _loop(self) -> None:
        while not self._stop:
            if not self._wakeup.wait(timeout=0.5):
                continue
            # small gather window so a burst arriving together shares the
            # first tick too (subsequent bursts coalesce behind the running
            # tick without any window)
            if self._gather_s:
                time.sleep(self._gather_s)
            tick = self._take_tick()
            if not tick:
                continue
            try:
                with self._state_lock:
                    out = self._server.submit(
                        [(r.client, r.pc, r.rgb) for r in tick])
                for r in tick:
                    r.result = out[r.client]
            except Exception as e:  # surface per-request, keep serving
                for r in tick:
                    r.error = e
            finally:
                self.ticks += 1
                for r in tick:
                    r.event.set()


def _make_handler(server: TTAServer, batcher: _Batcher, lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route through logging, not stderr
            logging.debug("serve_http: " + fmt, *args)

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _npy(self, arr: np.ndarray) -> None:
            buf = io.BytesIO()
            np.save(buf, arr)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _q(self) -> Tuple[str, Dict[str, str]]:
            u = urlparse(self.path)
            return u.path, {k: v[0] for k, v in parse_qs(u.query).items()}

        def do_GET(self):
            path, _ = self._q()
            if path == "/healthz":
                with lock:
                    n = len(server.states)
                self._json(200, {"ok": True, "clients": n,
                                 "ticks": batcher.ticks,
                                 "sizes": list(server.sizes)})
            else:
                self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):
            path, q = self._q()
            try:
                if path == "/register":
                    with lock:
                        server.register(q["client"])
                    self._json(200, {"ok": True})
                elif path == "/reset":
                    with lock:
                        server.reset(q["client"])
                    self._json(200, {"ok": True})
                elif path == "/submit":
                    n = int(self.headers.get("Content-Length", 0))
                    with np.load(io.BytesIO(self.rfile.read(n))) as z:
                        pc = z["pc"]
                        rgb = z["rgb"] if "rgb" in z.files else None
                    self._npy(batcher.submit(q["client"], pc, rgb))
                elif path == "/snapshot":
                    blocking = q.get("blocking", "1") != "0"
                    with lock:
                        server.snapshot(q["client"], q["path"],
                                        blocking=blocking)
                    self._json(200, {"ok": True})
                elif path == "/restore":
                    with lock:
                        server.restore(q["client"], q["path"])
                    self._json(200, {"ok": True})
                else:
                    self._json(404, {"error": f"unknown path {path}"})
            except KeyError as e:
                self._json(404, {"error": str(e)})
            except ValueError as e:
                msg = str(e)
                code = (409 if "already registered" in msg
                        else 404 if "not registered" in msg else 400)
                self._json(code, {"error": msg})
            except Exception as e:
                logging.exception("serve_http: %s failed", path)
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class HTTPTTAServer:
    """Owns the HTTP listener + batcher around a TTAServer.

    `start()` binds (port=0 picks a free port — read `.port` after) and
    serves on a daemon thread; `close()` stops the listener, drains the
    batcher and any async snapshots.
    """

    def __init__(self, server: TTAServer, host: str = "127.0.0.1",
                 port: int = 0, gather_ms: float = 2.0,
                 max_batch: Optional[int] = None):
        self.server = server
        self._lock = threading.Lock()   # guards register/reset/snapshot
        self.batcher = _Batcher(server, gather_ms=gather_ms,
                                max_batch=max_batch, state_lock=self._lock)
        self._httpd = ThreadingHTTPServer(
            (host, port), _make_handler(server, self.batcher, self._lock))
        self._httpd.daemon_threads = True
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._httpd.server_port

    def start(self) -> "HTTPTTAServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True,
            name="tta-http-listener")
        self._thread.start()
        logging.info("HTTP TTA server listening on :%d", self.port)
        return self

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
        self.batcher.shutdown()
        self.server.drain_snapshots()

    def __enter__(self) -> "HTTPTTAServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()
