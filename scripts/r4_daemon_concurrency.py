"""Round-4 TPU batch 2: serving daemon under CONCURRENT load (VERDICT r3
item 2).

Boots the HTTP daemon in-process (BackgroundServer) over a collab-scale
table and drives it with 1/2/4/8 concurrent loopback clients per workload:

* topk 'inner' approx+bf16 fp32-table (Q=256, k=10)
* topk 'mlp'   approx+bf16 (Q=256, k=10)
* topk 'inner' approx int8 table
* score 4096 pairs ('mlp')

Records aggregate req/s and per-request p50/p95 vs concurrency — the
evidence for the bounded-queue + cross-request dynamic batching design
(serve/server.py). /healthz deltas show device_calls vs batched_requests.

Usage: python scripts/r4_daemon_concurrency.py <logfile>
"""

import json
import sys
import threading
import time
import urllib.request

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4_daemon.log"
LOG = open(OUT, "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


def post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def healthz(port):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/healthz", timeout=600
    ) as r:
        return json.loads(r.read())


def drive(port, path, payload, conc, per_client):
    lats = []
    lock = threading.Lock()
    errors = []

    def client():
        mine = []
        for _ in range(per_client):
            t0 = time.perf_counter()
            try:
                post(port, path, payload)
            except Exception as exc:  # noqa: BLE001 - record 503s etc.
                errors.append(repr(exc))
                continue
            mine.append(time.perf_counter() - t0)
        with lock:
            lats.extend(mine)

    h0 = healthz(port)
    threads = [threading.Thread(target=client) for _ in range(conc)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    h1 = healthz(port)
    lats = np.array(sorted(lats))
    n = len(lats)
    dcalls = h1.get("device_calls", 0) - h0.get("device_calls", 0)
    breqs = h1.get("batched_requests", 0) - h0.get("batched_requests", 0)
    return dict(
        conc=conc, n=n, errors=len(errors), wall=wall,
        rps=n / wall if wall else 0.0,
        p50=float(lats[n // 2]) * 1e3 if n else float("nan"),
        p95=float(lats[min(n - 1, int(n * 0.95))]) * 1e3 if n else float("nan"),
        device_calls=dcalls, batched=breqs,
    )


import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root


def main():
    import jax
    import jax.numpy as jnp

    from llp_tpu.models.predictor import init_link_predictor
    from llp_tpu.serve.server import BackgroundServer, ServingState

    log(f"devices: {jax.devices()}")
    n, hdim = 235_868, 256
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(jax.random.fold_in(key, 1), (n, hdim), jnp.float32)
    float(h[0, 0])
    log(f"table ready: {n}x{hdim} fp32 ({n * hdim * 4 / 1e6:.0f} MB)")

    rng = np.random.default_rng(0)
    queries = rng.integers(0, n, size=256).tolist()
    pairs = rng.integers(0, n, size=(4096, 2)).tolist()
    preds = {
        m: init_link_predictor(jax.random.fold_in(key, 2), m, hdim, hdim, 1, 2)
        for m in ("inner", "mlp")
    }

    workloads = [
        ("topk_inner_bf16", "inner", dict(approx=True, compute_dtype=jnp.bfloat16),
         "/v1/topk", {"queries": queries, "k": 10}, "none"),
        ("topk_mlp_bf16", "mlp", dict(approx=True, compute_dtype=jnp.bfloat16),
         "/v1/topk", {"queries": queries, "k": 10}, "none"),
        ("topk_inner_int8", "inner", dict(approx=True),
         "/v1/topk", {"queries": queries, "k": 10}, "int8"),
        ("score_mlp_4096", "mlp", dict(),
         "/v1/score", {"pairs": pairs}, "none"),
    ]

    results = {}
    for name, mode, skw, path, payload, quant in workloads:
        if quant == "int8":
            from llp_tpu.serve.quant import quantize_table

            table = quantize_table(h)
        else:
            table = h
        state = ServingState(preds[mode], table, mode=mode, **skw)
        with BackgroundServer(state) as srv:
            post(srv.port, path, payload)  # compile + warm
            post(srv.port, path, payload)
            # Warm the whole MERGE-bucket ladder: out-of-phase clients make
            # the worker merge 2 or 3 same-shape requests, whose padded
            # buckets (512/1024 queries; 8k/16k pairs) differ from both the
            # single-request bucket and the 4-merge the per-conc warmup
            # produces — a cold bucket mid-measurement showed up as a
            # single ~2.2 s compile outlier (p95 2216/2413 ms in the first
            # r4s2 capture) that tanked one concurrency row per run.
            for mult in (2, 3, 4, 8):
                if "queries" in payload:
                    big = {"queries": (queries * mult)[: 256 * mult],
                           "k": payload["k"]}
                else:
                    big = {"pairs": (pairs * mult)[: 4096 * mult]}
                post(srv.port, path, big)
            rows = []
            for conc in (1, 2, 4, 8):
                per_client = max(8, 32 // conc)
                # warmup pass: merged-batch bucket shapes compile on first
                # use (conc=4 merges 4x256 queries -> a new padded bucket);
                # steady state is the second pass.
                drive(srv.port, path, payload, conc, max(2, per_client // 4))
                r = drive(srv.port, path, payload, conc, per_client)
                rows.append(r)
                log(f"{name} conc={conc}: {r['rps']:.2f} req/s "
                    f"p50={r['p50']:.1f}ms p95={r['p95']:.1f}ms "
                    f"n={r['n']} err={r['errors']} "
                    f"device_calls={r['device_calls']} batched={r['batched']}")
            results[name] = rows
    log("JSON " + json.dumps(results))
    log("DONE")


if __name__ == "__main__":
    main()
