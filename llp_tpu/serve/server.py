"""Persistent link-prediction serving daemon (HTTP/JSON over the warm engine).

The reference ships no inference process at all (SURVEY §1: two training
scripts, nothing serves the distilled student).  The one-shot CLI
(``llp_tpu.cli.serve``) answers a single query batch and exits — every
invocation pays process start-up, checkpoint load, encode, and jit compiles.
This module is the long-lived counterpart: load + encode ONCE, keep the jit
cache warm, and answer queries until shut down.

TPU-shaped details:

* **Static-shape request bucketing** — query/pair batches are padded up to
  the next power of two before hitting the jitted retrieval/scoring programs,
  so arbitrary request sizes reuse a logarithmic number of compiled programs
  instead of recompiling per length (XLA recompiles on any shape change).
* **Serialized device access with bounded backpressure** — a TPU chip is a
  single-client resource and the engine programs already batch internally,
  so concurrency belongs in the batch dimension, not in threads.  The
  daemon therefore runs ONE device program at a time (a single worker
  thread), but accepts concurrent connections (``ThreadingHTTPServer``)
  into a bounded wait queue: a second client queues in FIFO order instead
  of blocking at the TCP accept level, and a client past the queue bound
  gets an orderly ``503 {"error": ...}`` instead of an ever-growing backlog.
* **Cross-request dynamic batching** — requests that queue while a device
  program runs are MERGED for the next one: same-``k`` top-k queries
  concatenate into one padded retrieval call, score requests into one pair
  batch (chunked at the per-request caps).  Results are exact (each row is
  independent), and under concurrency the measured ~35 ms/request
  per-dispatch floor (BASELINE.md, the axon tunnel's fixed cost) is paid
  once per BATCH instead of once per request.  No timers: batch size adapts
  to the backlog — an idle daemon serves single requests at single-request
  latency.  Validation runs per request BEFORE merging, so one bad request
  400s alone and can never poison a batch.

Endpoints (all JSON):

* ``GET  /healthz``                         -> table metadata + request count
* ``POST /v1/topk``  {"queries": [int...], "k": int}
                                            -> per-query partners + scores
* ``POST /v1/score`` {"pairs": [[src, dst]...]} -> pair probabilities

No third-party dependencies: stdlib ``http.server`` + ``json`` only.
"""

from __future__ import annotations

import json
import queue as _queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np

MAX_BODY_BYTES = 16 << 20  # reject absurd request bodies before parsing
MAX_QUEUE = 8  # in-flight + waiting POSTs beyond this get an orderly 503


def _bucket(n: int, floor: int = 8) -> int:
    """Next power of two ≥ n (≥ floor): logarithmically many jit shapes."""
    b = floor
    while b < n:
        b <<= 1
    return b


class ServingState:
    """Owns the embedding table + predictor and answers padded queries."""

    def __init__(self, predictor_params, h, *, mode: str = "mlp",
                 block: Optional[int] = None, approx: bool = False,
                 compute_dtype=None,
                 fused: bool = False, max_queries: int = 4096,
                 max_pairs: int = 1 << 20, quantize: str = "none"):
        self.params = predictor_params
        if quantize in ("int8", "int4"):
            # Per-row quantized table: 4x (int8, ~1pp recall@10) or 8x
            # (int4 packed nibbles) less HBM than fp32 — see
            # llp_tpu.serve.quant; retrieval/scoring dequantize on the fly
            # ('inner' dots run on the codes directly).
            import jax.numpy as jnp

            from llp_tpu.serve.quant import quantize_table

            h = quantize_table(jnp.asarray(h), bits=int(quantize[3:]))
        elif quantize != "none":
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.h = h
        self.quantize = quantize
        self.mode = mode
        self.block = block
        self.approx = approx
        self.compute_dtype = compute_dtype
        self.fused = fused
        self.num_nodes = int(h.shape[0])
        self.dim = int(h.shape[1])
        self.requests = 0
        # Bound the per-request device footprint: retrieval materializes
        # (Q, block) score tiles and scoring gathers 2·P rows — an unbounded
        # batch would let one request OOM the chip.
        self.max_queries = max_queries
        self.max_pairs = max_pairs

    def _check_ids(self, ids: np.ndarray, what: str):
        if ids.size == 0:
            raise ValueError(f"{what}: empty id list")
        if ids.min() < 0 or ids.max() >= self.num_nodes:
            raise ValueError(
                f"{what} out of range: table has {self.num_nodes} nodes "
                f"(got min {ids.min()}, max {ids.max()})"
            )

    def topk(self, queries, k: int) -> Tuple[np.ndarray, np.ndarray]:
        from llp_tpu.serve.engine import top_k_partners

        qi = self.validate_topk(queries, k)
        q = qi.size
        qp = np.zeros((_bucket(q),), np.int32)
        qp[:q] = qi  # pad with node 0: same program shape for any |queries|
        vals, ids = top_k_partners(
            self.params, self.h, qp, k=k, mode=self.mode, block=self.block,
            approx=self.approx, compute_dtype=self.compute_dtype,
        )
        return np.asarray(vals)[:q], np.asarray(ids)[:q]

    def score(self, pairs) -> np.ndarray:
        from llp_tpu.serve.engine import score_pairs

        arr = self.validate_score(pairs)
        m = arr.shape[0]
        pp = np.zeros((_bucket(m), 2), np.int32)
        pp[:m] = arr
        out = score_pairs(
            self.params, self.h, pp[:, 0], pp[:, 1], mode=self.mode,
            fused=self.fused,
        )
        return np.asarray(out)[:m]

    def validate_topk(self, queries, k: int) -> np.ndarray:
        """Per-request validation (no device work): returns the flat id
        array or raises ValueError.  Runs BEFORE cross-request batching so a
        bad request can never poison a merged batch."""
        qi = np.asarray(queries, np.int32)
        if qi.ndim != 1:
            raise ValueError(
                f"queries must be a flat list of node ids, got a "
                f"{qi.ndim}-D array of shape {qi.shape}"
            )
        self._check_ids(qi, "queries")
        if qi.size > self.max_queries:
            raise ValueError(
                f"too many queries ({qi.size} > {self.max_queries}); "
                f"split the request"
            )
        if not 1 <= k <= self.num_nodes - 1:
            raise ValueError(f"k must be in [1, {self.num_nodes - 1}], got {k}")
        return qi

    def validate_score(self, pairs) -> np.ndarray:
        arr = np.asarray(pairs, np.int32)
        if arr.ndim != 2 or arr.shape[1] != 2:
            raise ValueError("pairs must be a list of [src, dst] id pairs")
        if arr.shape[0] > self.max_pairs:
            raise ValueError(
                f"too many pairs ({arr.shape[0]} > {self.max_pairs}); "
                f"split the request"
            )
        self._check_ids(arr.reshape(-1), "pairs")
        return arr

    def warmup(self, k: int = 10) -> None:
        """Pre-compile the smallest request bucket so the first real query
        doesn't pay the jit (useful behind a load balancer's health check)."""
        self.topk([0], k)
        self.score([[0, 0]])


class ShardedServingState(ServingState):
    """Serving over a NODE-SHARDED embedding table on a device mesh.

    The multi-chip regime: when the table doesn't fit (or shouldn't hog) one
    chip, rows are owner-partitioned across the mesh and retrieval runs
    per-shard with an exact cross-shard merge
    (:func:`llp_tpu.parallel.eval.make_sharded_topk_partners` — the same
    ``approx`` knob applies per shard).  Queries stay tiny and replicated;
    pair scoring reuses the base engine under GSPMD (XLA inserts the row
    gathers across shards).
    """

    def __init__(self, predictor_params, h, mesh, *, mode: str = "mlp",
                 block: Optional[int] = None, approx: bool = False,
                 axis: str = "data",
                 compute_dtype=None, quantize: str = "none",
                 max_queries: int = 4096, max_pairs: int = 1 << 20):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = int(h.shape[0])
        ndev = mesh.shape[axis]
        pad = (-n) % ndev
        if quantize in ("int8", "int4"):
            # Pad the fp32 rows FIRST (zero rows quantize to codes 0 /
            # scale 1 — dequantized pads are exactly 0), then quantize and
            # shard both planes by owner.  int4's lane-packed storage holds
            # TWO logical rows per storage row, so its pad also makes every
            # shard's logical row count even (storage shards stay aligned).
            from llp_tpu.serve.quant import QuantTable, quantize_table

            if quantize == "int4":
                pad = (-n) % (2 * ndev)
            hp = jnp.asarray(h)
            if pad:
                hp = jnp.concatenate(
                    [hp, jnp.zeros((pad, hp.shape[1]), hp.dtype)]
                )
            qt = quantize_table(hp, bits=int(quantize[3:]))
            h = QuantTable(
                q=jax.device_put(qt.q, NamedSharding(mesh, P(axis, None))),
                scale=jax.device_put(qt.scale, NamedSharding(mesh, P(axis))),
                bits=qt.bits,
            )
        elif quantize == "none":
            if pad:
                h = jnp.concatenate([h, jnp.zeros((pad, h.shape[1]), h.dtype)])
            h = jax.device_put(h, NamedSharding(mesh, P(axis, None)))
        else:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        super().__init__(predictor_params, h, mode=mode, block=block,
                         approx=approx, compute_dtype=compute_dtype,
                         max_queries=max_queries, max_pairs=max_pairs)
        self.quantize = quantize
        self.num_nodes = n  # id validation against REAL rows, not padding
        self.mesh = mesh
        self.axis = axis
        self._topk_fns = {}
        from llp_tpu.serve.engine import _take_rows

        self._gather_q = jax.jit(
            lambda table, qi: _take_rows(table, qi),
            out_shardings=NamedSharding(mesh, P()),
        )

    def topk(self, queries, k: int):
        from llp_tpu.parallel.eval import make_sharded_topk_partners

        qi = self.validate_topk(queries, k)
        if k not in self._topk_fns:
            self._topk_fns[k] = make_sharded_topk_partners(
                self.mesh, k=k, mode=self.mode, num_nodes=self.num_nodes,
                block=self.block, axis=self.axis, approx=self.approx,
                compute_dtype=self.compute_dtype,
            )
        q = qi.size
        qp = np.zeros((_bucket(q),), np.int32)
        qp[:q] = qi
        q_h = self._gather_q(self.h, qp)
        vals, ids = self._topk_fns[k](self.params, self.h, q_h, qp)
        return np.asarray(vals)[:q], np.asarray(ids)[:q]


class BatchingEngine:
    """Single-worker device executor with cross-request batching.

    One thread owns all device work (the chip is a single-client resource).
    Each drain cycle it takes EVERYTHING queued: same-``k`` top-k requests
    concatenate into one padded retrieval call and score requests into one
    pair batch (chunked at the state's per-request caps), then per-request
    slices resolve each waiter.  Payloads arrive pre-validated
    (``validate_topk``/``validate_score``), so merged execution cannot fail
    on one request's bad input.  Exactness: every output row depends only on
    its own query/pair, so merged results equal sequential ones.
    """

    def __init__(self, state: ServingState):
        self.state = state
        self.queue: _queue.Queue = _queue.Queue()
        self.batched_calls = 0   # device calls issued
        self.batched_requests = 0  # requests served through them
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, kind: str, payload) -> dict:
        item = {"kind": kind, "payload": payload,
                "done": threading.Event(), "result": None, "error": None}
        self.queue.put(item)
        return item

    def call(self, kind: str, payload, timeout: float = 600.0):
        item = self.submit(kind, payload)
        if not item["done"].wait(timeout):
            raise TimeoutError("device worker did not answer in time")
        if item["error"] is not None:
            raise item["error"]
        return item["result"]

    def _run(self):
        while True:
            items = [self.queue.get()]
            try:
                while True:
                    items.append(self.queue.get_nowait())
            except _queue.Empty:
                pass
            self._execute(items)

    def _execute(self, items):
        topk_groups: dict = {}
        scores = []
        for it in items:
            if it["kind"] == "topk":
                topk_groups.setdefault(it["payload"][1], []).append(it)
            else:
                scores.append(it)
        for k, group in topk_groups.items():
            self._run_chunked(
                group, cap=self.state.max_queries,
                sizes=[it["payload"][0].size for it in group],
                concat=lambda its: np.concatenate(
                    [it["payload"][0] for it in its]
                ),
                run=lambda merged, k=k: self.state.topk(merged, k),
                split=lambda res, off, n: (res[0][off:off + n],
                                           res[1][off:off + n]),
            )
        if scores:
            self._run_chunked(
                scores, cap=self.state.max_pairs,
                sizes=[it["payload"].shape[0] for it in scores],
                concat=lambda its: np.concatenate(
                    [it["payload"] for it in its], axis=0
                ),
                run=self.state.score,
                split=lambda res, off, n: res[off:off + n],
            )

    def _run_chunked(self, items, *, cap, sizes, concat, run, split):
        # Greedy chunks that respect the per-call cap (a single request is
        # already validated <= cap).
        i = 0
        while i < len(items):
            j, total = i, 0
            while j < len(items) and total + sizes[j] <= cap:
                total += sizes[j]
                j += 1
            chunk = items[i:j]
            try:
                res = run(concat(chunk))
                self.batched_calls += 1
                self.batched_requests += len(chunk)
                off = 0
                for it, n in zip(chunk, sizes[i:j]):
                    it["result"] = split(res, off, n)
                    off += n
            except Exception as e:  # noqa: BLE001 — resolve every waiter
                for it in chunk:
                    it["error"] = e
            finally:
                for it in chunk:
                    it["done"].set()
            i = j


def _make_handler(state: ServingState, max_queue: int = MAX_QUEUE,
                  engine: Optional[BatchingEngine] = None):
    # One device program at a time (the worker thread owns the device);
    # up to max_queue POSTs may be in flight + waiting, the rest get 503.
    engine = engine or BatchingEngine(state)
    slots = threading.Semaphore(max_queue)

    class Handler(BaseHTTPRequestHandler):
        # quiet: no per-request stderr lines
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                self._reply(200, {
                    "status": "ok", "nodes": state.num_nodes,
                    "dim": state.dim, "mode": state.mode,
                    "table_dtype": (
                        state.h.fmt if hasattr(state.h, "fmt")
                        else str(np.dtype(state.h.dtype))
                    ),
                    "requests": state.requests,
                    "device_calls": engine.batched_calls,
                    "batched_requests": engine.batched_requests,
                })
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            length = int(self.headers.get("Content-Length", 0))
            if length > MAX_BODY_BYTES:
                self._reply(413, {"error": "request body too large"})
                return
            try:
                req = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError as e:
                self._reply(400, {"error": f"bad JSON: {e}"})
                return
            if not slots.acquire(blocking=False):
                self._reply(503, {
                    "error": f"server busy: more than {max_queue} requests "
                             f"queued; retry later"
                })
                return
            try:
                self._dispatch(req)  # the engine worker serializes device work
            finally:
                slots.release()

        def _dispatch(self, req):
            try:
                if self.path == "/v1/topk":
                    k = int(req.get("k", 10))
                    # Validate BEFORE batching: a bad request 400s alone.
                    qi = state.validate_topk(req.get("queries", []), k)
                    vals, ids = engine.call("topk", (qi, k))
                    state.requests += 1
                    self._reply(200, {"results": [
                        {"query": int(q), "partners": row_i.tolist(),
                         "scores": [round(float(v), 6) for v in row_v]}
                        for q, row_v, row_i in zip(qi, vals, ids)
                    ]})
                elif self.path == "/v1/score":
                    pairs = state.validate_score(req.get("pairs", []))
                    scores = engine.call("score", pairs)
                    state.requests += 1
                    self._reply(200, {
                        "scores": [round(float(v), 6) for v in scores]
                    })
                else:
                    self._reply(404, {"error": f"unknown path {self.path}"})
            except (ValueError, TypeError, KeyError) as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — daemon must not drop the
                # connection on an engine error; surface it to the client.
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def make_server(state: ServingState, host: str = "127.0.0.1",
                port: int = 0, *, max_queue: int = MAX_QUEUE) -> ThreadingHTTPServer:
    """Bind (but don't start) the daemon; ``server.server_port`` has the
    actual port when ``port=0``.  Connections are handled concurrently but
    the device work is serialized behind a lock with a ``max_queue``-bounded
    wait queue (503 past it)."""
    srv = ThreadingHTTPServer((host, port), _make_handler(state, max_queue))
    srv.daemon_threads = True
    return srv


def serve_forever(state: ServingState, host: str = "127.0.0.1",
                  port: int = 8080, *,
                  max_queue: int = MAX_QUEUE,
                  ready_line: bool = True) -> None:
    """Run the daemon until interrupted (the CLI ``--port`` entry)."""
    srv = make_server(state, host, port, max_queue=max_queue)
    if ready_line:
        print(json.dumps({
            "serving": f"http://{host}:{srv.server_port}",
            "nodes": state.num_nodes, "dim": state.dim, "mode": state.mode,
        }), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()


class BackgroundServer:
    """Thread-hosted server for tests / embedding in another process."""

    def __init__(self, state: ServingState, host: str = "127.0.0.1",
                 port: int = 0, *, max_queue: int = MAX_QUEUE):
        self.server = make_server(state, host, port, max_queue=max_queue)
        self.port = self.server.server_port
        self._thread: Optional[threading.Thread] = None

    def __enter__(self):
        self._thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self.server.shutdown()
        self.server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
