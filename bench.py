"""Benchmark: teacher-GNN training throughput (edges scored / second).

Protocol (mirrors the reference teacher hot loop, train_teacher_gnn.py:21-73):
full-graph 2-layer SAGE forward per link batch, BCE on [positives ; uniform
negatives], per-group clip, Adam.  One epoch scores 2·E edges.  The TPU path
is llp_tpu's jit'd scan-per-epoch program; the baseline is the same math in
plain torch on CPU (the reference's own stack, minus CUDA, which this
environment lacks — the reference itself is CPU-runnable by design).

TWO scales (the regimes BASELINE.md's rooflines show are different):

* warm  — N=20k / D=256: the feature table (~20 MB) is cache-resident;
  gathers run at ~500 GB/s.  The historical headline number.
* cold  — collab shape, N=235,868 / D=128 / 3-layer SAGE: the ~120 MB table
  misses cache and the per-SpMM random sender-gather is the wall (~100 GB/s
  effective; BASELINE.md "Collab-scale teacher roofline").  Regressions in
  the cold-gather path cannot hide behind the warm number.

The headline JSON line reports the warm metric with a PINNED torch-CPU
baseline: the CPU denominator is remeasured live (median of k best-step
samples, recorded in "extra"), but the ratio divides by
max(pinned, live_median) — the pinned floor is the best CPU rate ever
observed on this host class, so transient host starvation (the 136×-2200×
vs_baseline swings of rounds past) can no longer inflate the headline.

Prints ONE JSON line:
  {"metric": "teacher_train_edges_per_sec", "value": ..., "unit": "edges/s",
   "vs_baseline": ..., "extra": {...cold scale + baseline samples...}}

Env knobs: LLP_BENCH_SCALES=warm[,cold] (default both on TPU, warm-only
elsewhere — the cold scale needs the real chip to say anything).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# ---- workloads ----------------------------------------------------------------
WARM = dict(n=20_000, k=16, deg=16.0, dim=256, hidden=256, layers=2,
            batch=64 * 1024, epochs_per_call=10, seed=7)
# collab stand-in shape (registry _REAL_SHAPES: N=235,868, D=128, deg 8.2;
# teacher recipe: 3-layer SAGE — supervised_transductive.sh collab row)
COLD = dict(n=235_868, k=64, deg=8.2, dim=128, hidden=256, layers=3,
            batch=64 * 1024, epochs_per_call=1, seed=11)

# Pinned torch-CPU baselines (edges scored/s) for this host class — floors
# the live remeasurement can only RAISE, never undercut, so transient host
# starvation cannot inflate vs_baseline.  Derivation (BASELINE.md "bench
# baseline pinning", round 2): warm = best CPU rate ever implied by a
# recorded bench run (8.85M/136x ≈ 65k; live best-step medians measure
# 23-28k under load); cold = ~2x the best busy-host sample (5.4k; the
# full-graph forward amortizes over one batch at collab scale, so the
# per-edge rate drops ~10x from warm).
PINNED_CPU_WARM = 65_000.0
PINNED_CPU_COLD = 10_000.0

# Regression FLOORS for the round-3 extra gates (student + serving): the
# biggest measured wins outside the teacher metric, pinned so a silent
# slowdown trips `ok: false` in the round JSON (VERDICT r2 weak #3).
# Values from BASELINE.md healthy-relay runs with ~40-50% headroom for
# relay/tunnel variance (ms floors are CEILINGS: ok = value <= floor).
GATE_FLOORS = {
    # Absolute TEACHER throughput floors (round 5 — the headline metric was
    # the only unguarded number; a kernel/layout regression could ship with
    # gates_ok true).  Records: warm 9.03-9.19M (r3/r4 sessions), driver
    # capture 8.88M; cold 714.1-714.5k.  Floors sit below the documented
    # +-3% session-variance band; a real regression (e.g. the XLA SpMM
    # fallback at ~2.25x slower, or the r3 local_ids padded layout) lands
    # far under them.
    "teacher_warm_edges_per_sec": 8.3e6,
    "teacher_cold_edges_per_sec": 650e3,
    # collab-scale bf16 minibatch student measured 12.17M edges/s (driver
    # level, session 7); epoch-fn level here — floor at 6M.
    "student_bf16_edges_per_sec": 6.0e6,
    # 235k fp32 table, Q=256, k=10 (ms): inner approx single-pass measured
    # 4.7 (r2); inner exact blocked 10.7 (r2); mlp bf16+approx at the
    # default block measured 51.5 (r3 — the XLA path at b8192; the r2
    # 102 ms record was the b16k cliff, scripts/bench_mlp_fused2.py).
    # observed 4.7 (r2 healthy relay) to 12.3 (r3 session where ALL
    # memory-bound ops ran ~2x slower — same-session gather/segsum shifted
    # identically, so it is host/relay variance, not a code regression);
    # the floor catches the 672-ms-class walls, not session noise.
    "inner_approx_235k_ms": 20.0,
    "inner_exact_235k_ms": 25.0,
    "mlp_approx_235k_ms": 80.0,
    # 10M-row int8 table (ms): inner approx blocked measured 25.4 (r2);
    # mlp int8+bf16 approx measured 553 at the default block (r3).
    "inner_approx_10m_int8_ms": 60.0,
    "mlp_approx_10m_int8_ms": 900.0,
    # 10M-row int4 (lane-packed) table: per-block unpack + int8 MXU dots;
    # the 100M run measured 515 ms over 382 blocks (~1.35 ms/block, r4s2)
    # -> ~53 expected at 10M; floor catches the padded-layout/copy walls.
    "inner_approx_10m_int4_ms": 150.0,
    # HTTP daemon, 8 concurrent clients, inner approx+bf16 topk on the 242MB
    # table: measured 52.2 req/s aggregate (r4, cross-request dynamic
    # batching; single-client is ~12-16).  Floor 25 = a broken batcher,
    # with 2x headroom for session variance.
    "daemon_conc8_rps": 25.0,
}


def build_problem(spec):
    from llp_tpu.data.synthetic import community_features, sbm_graph

    ei, comm = sbm_graph(spec["n"], spec["k"], spec["deg"], seed=spec["seed"])
    x = community_features(comm, spec["dim"], kind="gauss", seed=spec["seed"])
    return ei.astype(np.int64), x


def bench_tpu(spec, ei: np.ndarray, x: np.ndarray, *,
              encoder: str = "sage", conv: str = "sage") -> float:
    import jax
    import jax.numpy as jnp

    from llp_tpu.core import build_graph
    from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn

    n, dim, hidden = spec["n"], spec["dim"], spec["hidden"]
    epc = spec["epochs_per_call"]
    graph = build_graph(ei, n)
    xd = jnp.asarray(x)
    e = ei.shape[1]
    pos_edges = jnp.asarray(ei.T.astype(np.int32))
    neg_keys = jnp.zeros((1,), jnp.int32)

    impl = "segsum" if jax.default_backend() in ("tpu", "axon") else "xla"
    if impl == "segsum":
        from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum

        prepare_segsum(graph)

    # One device program runs all epochs_per_call epochs (epoch-level scan):
    # dispatch latency and the layer-1 aggregation hoist amortize across the
    # block — the same `epochs_per_jit` knob the CLI driver exposes.
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder=encoder,
        conv=conv,
        predictor_mode="mlp",
        dropout=0.0,
        num_nodes=n,
        num_pos_edges=e,
        link_batch_size=spec["batch"],
        neg_mode="uniform",
        lr=0.005,
        spmm_impl=impl,
        epochs_per_call=epc,
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder=encoder, in_channels=dim,
        hidden_channels=hidden, num_layers=spec["layers"],
        predictor_mode="mlp",
    )
    opt_state = tx.init(params)

    def consume(params, loss):
        # device->host reads; block_until_ready is unreliable on the axon
        # runtime, but a host read cannot complete before the value exists.
        first_leaf = jax.tree_util.tree_leaves(params["encoder"])[0]
        return float(loss[-1] if epc > 1 else loss) + float(
            first_leaf.reshape(-1)[0]
        )

    def timed(params, opt_state, key0):
        keys = jnp.stack([jax.random.PRNGKey(key0 + i) for i in range(epc)])
        if epc == 1:
            keys = keys[0]
        t0 = time.perf_counter()
        params, opt_state, losses = epoch_fn(
            params, opt_state, keys, graph, xd, pos_edges, neg_keys,
        )
        consume(params, losses)
        return time.perf_counter() - t0, params, opt_state

    # warmup/compile
    _, params, opt_state = timed(params, opt_state, 1)
    dt, params, opt_state = timed(params, opt_state, 100)
    return 2 * e * epc / dt


def bench_student(spec, ei: np.ndarray, x: np.ndarray) -> float:
    """Collab-scale bf16 minibatch student edges/s (the distillation hot
    loop, reference main.py:96-214) — one whole-epoch device program, random
    frozen teacher features (throughput doesn't depend on their values)."""
    import jax
    import jax.numpy as jnp

    from llp_tpu.core import build_graph
    from llp_tpu.models.predictor import init_link_predictor
    from llp_tpu.train.student import (
        init_student_params,
        make_student_epoch_fn,
    )

    n, dim, hidden = spec["n"], spec["dim"], spec["hidden"]
    e = ei.shape[1]
    bl = spec["batch"]
    bn = max(1, int(n / (e / min(bl, e))))
    graph = build_graph(ei, n)
    xd = jnp.asarray(x)
    pos_edges = jnp.asarray(ei.T.astype(np.int32))
    t_h = jnp.asarray(
        np.random.default_rng(3).normal(size=(n, hidden)).astype(np.float32)
    )
    tpred = init_link_predictor(
        jax.random.PRNGKey(5), "mlp", hidden, hidden, 1, 2
    )
    epc = 4  # fuse epochs into one program: amortizes dispatch like the
    # teacher bench (single tunnel dispatches carry 1.5-24 ms overhead)
    epoch_fn, tx = make_student_epoch_fn(
        num_nodes=n, num_pos_edges=e, link_batch_size=bl,
        node_batch_size=bn, minibatch=True, compute_dtype="bfloat16",
        epochs_per_call=epc,
        # The real collab-scale driver switches to uniform negatives past
        # MAX_EXACT_NODES (loop.py::_effective_neg_mode — dense keys u*N+v
        # overflow int32 at this N); gate the program production runs.
        neg_mode="uniform",
    )
    params = init_student_params(
        jax.random.PRNGKey(2), in_channels=dim, hidden_channels=hidden,
        num_layers=spec["layers"], predictor_mode="mlp",
    )
    opt_state = tx.init(params)
    neg_keys = jnp.zeros((1,), jnp.int32)

    def run(params, opt_state, k0):
        keys = jnp.stack([jax.random.PRNGKey(k0 + i) for i in range(epc)])
        t0 = time.perf_counter()
        params, opt_state, loss = epoch_fn(
            params, opt_state, keys,
            graph, xd, t_h, tpred, pos_edges, neg_keys,
        )
        _ = float(loss[-1])  # device->host read: honest completion timing
        return time.perf_counter() - t0, params, opt_state

    _, params, opt_state = run(params, opt_state, 0)  # compile
    dts = []
    for i in (10, 20):  # params/opt_state are DONATED — thread them through
        dt, params, opt_state = run(params, opt_state, i)
        dts.append(dt)
    return 2 * e * epc / min(dts)


def _bench_daemon_conc8(pred_inner, h1) -> dict:
    """Aggregate req/s of the HTTP daemon at 8 concurrent clients (inner
    approx+bf16 topk, Q=256, k=10) — the bounded-queue + dynamic-batching
    design claim, gated. One warmup drive compiles the merged buckets."""
    import json as _json
    import threading
    import urllib.request

    import jax.numpy as jnp

    from llp_tpu.serve.server import BackgroundServer, ServingState

    n_total = int(h1.shape[0])
    rng = np.random.default_rng(9)
    payload = _json.dumps(
        {"queries": rng.integers(0, n_total, 256).tolist(), "k": 10}
    ).encode()

    def drive(port, conc, per_client):
        done, errors = [], []

        def client():
            for _ in range(per_client):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/v1/topk", data=payload,
                    headers={"Content-Type": "application/json"},
                )
                try:
                    with urllib.request.urlopen(req, timeout=600) as r:
                        r.read()
                except Exception as exc:  # noqa: BLE001 - a dead thread
                    # would silently deflate the measured rate; record and
                    # keep driving so the gate output shows WHY it failed.
                    errors.append(repr(exc))
                    continue
                done.append(1)

        ts = [threading.Thread(target=client) for _ in range(conc)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        return len(done) / (time.perf_counter() - t0), errors

    state = ServingState(pred_inner, h1, mode="inner", approx=True,
                         compute_dtype=jnp.bfloat16)
    with BackgroundServer(state) as srv:
        drive(srv.port, 1, 1)   # compile base bucket
        drive(srv.port, 8, 2)   # compile merged buckets
        rps, errors = drive(srv.port, 8, 6)
    floor = GATE_FLOORS["daemon_conc8_rps"]
    out = {"rps": round(rps, 2), "floor_rps": floor,
           "ok": bool(rps >= floor and not errors)}
    if errors:
        out["errors"] = errors[:4]
    return out


def bench_serving() -> dict:
    """Serving retrieval gates, chained in-jit (single dispatches carry
    ~1.5-24 ms of axon tunnel latency — BASELINE.md protocol)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from llp_tpu.models.predictor import init_link_predictor
    from llp_tpu.serve.engine import top_k_partners
    from llp_tpu.serve.quant import QuantTable, quantize_table

    q_n, k_top, kchain = 256, 10, 5
    rng = np.random.default_rng(5)
    out = {}

    def chain(name, fn, hp, n_total):
        qi0 = jnp.asarray(rng.integers(0, n_total, q_n).astype(np.int32))

        @jax.jit
        def run(qi, hpv):
            def step(q, _):
                vals, ids = fn(q, hpv)
                q2 = (q + ids[:, 0]) % np.int32(n_total)
                return q2.astype(jnp.int32), vals[0, 0]

            return lax.scan(step, qi, None, length=kchain)

        qf, vs = run(qi0, hp)
        _ = float(vs[-1]) + float(qf[0])
        t0 = time.perf_counter()
        qf, vs = run(qi0, hp)
        _ = float(vs[-1]) + float(qf[0])
        ms = (time.perf_counter() - t0) / kchain * 1e3
        floor = GATE_FLOORS[name]
        out[name] = {"ms": round(ms, 2), "floor_ms": floor,
                     "ok": bool(ms <= floor)}

    n1 = 235_868
    h1 = jnp.asarray(rng.normal(size=(n1, 256)).astype(np.float32))
    pred = init_link_predictor(jax.random.PRNGKey(1), "mlp", 256, 256, 1, 2)
    pred_inner = init_link_predictor(jax.random.PRNGKey(1), "inner", 256, 256)
    bf = jnp.bfloat16
    chain("inner_approx_235k_ms",
          lambda qi, hp: top_k_partners(pred_inner, hp, qi, k=k_top,
                                        mode="inner", approx=True,
                                        compute_dtype=bf), h1, n1)
    chain("inner_exact_235k_ms",
          lambda qi, hp: top_k_partners(pred_inner, hp, qi, k=k_top,
                                        mode="inner"), h1, n1)
    chain("mlp_approx_235k_ms",
          lambda qi, hp: top_k_partners(pred, hp, qi, k=k_top, mode="mlp",
                                        approx=True, compute_dtype=bf),
          h1, n1)

    # Daemon under concurrent load (round-4 gate): 8 loopback clients on the
    # HTTP daemon over the same 242MB table — cross-request dynamic batching
    # measured 52 req/s aggregate at p95~165ms (scripts/
    # r4_daemon_concurrency.py, BASELINE.md daemon-concurrency table);
    # floor 25 catches a broken batcher (conc-1 rate is ~12-16).
    out["daemon_conc8_rps"] = _bench_daemon_conc8(pred_inner, h1)
    del h1

    # 10M-row int8 table, built blockwise on device (fp32 never exceeds one
    # build block — the scale regime from BASELINE.md's 10M check).
    n2, h2d = 10_000_000, 128
    build = jax.jit(lambda key: quantize_table(
        jax.random.normal(key, (2_000_000, h2d), jnp.float32)
    ))
    parts = [build(jax.random.PRNGKey(50 + i)) for i in range(5)]
    qt = QuantTable(q=jnp.concatenate([p.q for p in parts]),
                    scale=jnp.concatenate([p.scale for p in parts]))
    del parts
    pred2 = init_link_predictor(jax.random.PRNGKey(2), "mlp", h2d, h2d, 1, 2)
    pred2_inner = init_link_predictor(jax.random.PRNGKey(2), "inner", h2d,
                                      h2d)
    chain("inner_approx_10m_int8_ms",
          lambda qi, hp: top_k_partners(pred2_inner, hp, qi, k=k_top,
                                        mode="inner", approx=True), qt, n2)
    chain("mlp_approx_10m_int8_ms",
          lambda qi, hp: top_k_partners(pred2, hp, qi, k=k_top, mode="mlp",
                                        approx=True, compute_dtype=bf),
          qt, n2)
    del qt

    # 10M-row int4 (lane-packed) table — the 8x-memory format (round 4 s2;
    # 100M-on-one-chip validated in scripts/serve_scale100m_int4.py).
    build4 = jax.jit(lambda key: quantize_table(
        jax.random.normal(key, (2_000_000, h2d), jnp.float32), bits=4
    ))
    parts = [build4(jax.random.PRNGKey(50 + i)) for i in range(5)]
    qt4 = QuantTable(q=jnp.concatenate([p.q for p in parts]),
                     scale=jnp.concatenate([p.scale for p in parts]),
                     bits=4)
    del parts
    chain("inner_approx_10m_int4_ms",
          lambda qi, hp: top_k_partners(pred2_inner, hp, qi, k=k_top,
                                        mode="inner", approx=True), qt4, n2)
    return out


def bench_torch_cpu(spec, ei: np.ndarray, x: np.ndarray,
                    max_steps: int = 6) -> float:
    """Equivalent teacher step in plain torch (CPU): same model math, same
    batch/negative protocol. Extrapolates per-edge rate from the FASTEST
    step (the 2-core host is intermittently starved by the TPU tunnel
    process; the fastest step is the baseline's honest capability)."""
    import torch

    torch.manual_seed(0)
    n, d, h = spec["n"], spec["dim"], spec["hidden"]
    batch = spec["batch"]
    e = ei.shape[1]
    src = torch.from_numpy(ei[0])
    dst = torch.from_numpy(ei[1])
    deg = torch.zeros(n).index_add_(0, dst, torch.ones(e)).clamp(min=1.0)
    xt = torch.from_numpy(x)

    lin = lambda i, o: torch.nn.Linear(i, o)
    dims = [d] + [h] * spec["layers"]
    enc = torch.nn.ModuleList(
        [torch.nn.ModuleDict(dict(ll=lin(dims[i], dims[i + 1]),
                                  lr=lin(dims[i], dims[i + 1])))
         for i in range(spec["layers"])]
    )
    pred = torch.nn.Sequential(lin(h, h), torch.nn.ReLU(), lin(h, 1))
    opt = torch.optim.Adam(list(enc.parameters()) + list(pred.parameters()),
                           lr=0.005)
    bce = torch.nn.BCELoss()

    def sage_fwd():
        feats = xt
        for i, layer in enumerate(enc):
            agg = torch.zeros(n, feats.shape[1]).index_add_(0, dst, feats[src])
            agg = agg / deg[:, None]
            feats_new = layer["ll"](agg) + layer["lr"](feats)
            feats = torch.relu(feats_new) if i < len(enc) - 1 else feats_new
        return feats

    steps = -(-e // batch)
    timed = min(max_steps, steps)
    perm = torch.randperm(e)
    best = float("inf")
    for i in range(timed):
        t0 = time.perf_counter()
        opt.zero_grad()
        z = sage_fwd()
        idx = perm[i * batch : (i + 1) * batch]
        b = idx.numel()
        pe_src, pe_dst = src[idx], dst[idx]
        ne = torch.randint(0, n, (2, b))
        s = torch.cat([pe_src, ne[0]])
        t = torch.cat([pe_dst, ne[1]])
        out = torch.sigmoid(pred(z[s] * z[t])).squeeze(-1)
        labels = torch.cat([torch.ones(b), torch.zeros(b)])
        loss = bce(out, labels)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(enc.parameters(), 1.0)
        torch.nn.utils.clip_grad_norm_(pred.parameters(), 1.0)
        opt.step()
        dt = time.perf_counter() - t0
        best = min(best, dt / (2 * b))
    return 1.0 / best


def _cpu_baseline(spec, ei, x, pinned: float, k: int):
    """Live median-of-k best-step samples, floored by the pinned constant."""
    samples = [round(bench_torch_cpu(spec, ei, x), 1) for _ in range(k)]
    live = float(np.median(samples))
    return max(pinned, live), {"live_median": live, "samples": samples,
                               "pinned": pinned}


def teacher_gates(warm_tpu: float, cold_tpu: float) -> dict:
    """Absolute regression gates on the headline teacher numbers (round 5).

    Pure function of the two measured rates so the gate logic itself is
    unit-testable without a chip (tests/test_bench_surface.py)."""
    wf = GATE_FLOORS["teacher_warm_edges_per_sec"]
    cf = GATE_FLOORS["teacher_cold_edges_per_sec"]
    return {
        "teacher_warm_edges_per_sec": {
            "value": round(warm_tpu, 1), "floor": wf,
            "ok": bool(warm_tpu >= wf),
        },
        "teacher_cold_edges_per_sec": {
            "value": round(cold_tpu, 1), "floor": cf,
            "ok": bool(cold_tpu >= cf),
        },
    }


def _parse_args(argv=None):
    """--help/--dry-run guard (round-5 VERDICT weak #6): ANY bench invocation
    used to run the TPU benchmark; argparse exits before jax ever imports, so
    an accidental `python bench.py --help` can no longer open a TPU session
    (the axon backend initializes at the first jax import-and-op, and every
    client exit wedges the relay)."""
    import argparse

    p = argparse.ArgumentParser(
        description=(
            "llp_tpu round benchmark — teacher-train edges/s on the real "
            "TPU chip vs a pinned torch-CPU baseline, plus student/serving/"
            "daemon regression gates. Prints ONE JSON line. Running with no "
            "flags RUNS THE BENCHMARK (opens a TPU session)."
        ),
        epilog=(
            "Env knobs: LLP_BENCH_SCALES=warm[,cold] (default both on TPU); "
            "LLP_BENCH_GATES=0 skips the student/serving gate suite."
        ),
    )
    p.add_argument(
        "--dry-run", action="store_true",
        help="print the resolved config (scales, floors, env) and exit "
             "WITHOUT initializing any jax backend or touching the TPU",
    )
    return p.parse_args(argv)


def main():
    args = _parse_args()
    scales = os.environ.get("LLP_BENCH_SCALES")
    if args.dry_run:
        print(json.dumps({
            "dry_run": True,
            "scales": scales or "warm,cold on TPU else warm",
            "gates": os.environ.get("LLP_BENCH_GATES", "1"),
            "warm": WARM, "cold": COLD,
            "pinned_cpu": {"warm": PINNED_CPU_WARM, "cold": PINNED_CPU_COLD},
            "gate_floors": GATE_FLOORS,
        }))
        return
    if scales is None:
        import jax

        on_tpu = jax.default_backend() in ("tpu", "axon")
        scales = "warm,cold" if on_tpu else "warm"
    scales = [s for s in scales.split(",") if s]

    extra = {}

    ei, x = build_problem(WARM)
    warm_tpu = bench_tpu(WARM, ei, x)
    warm_cpu, warm_cpu_info = _cpu_baseline(WARM, ei, x, PINNED_CPU_WARM, k=3)
    extra["warm_cpu_baseline"] = warm_cpu_info

    if "cold" in scales:
        ei_c, x_c = build_problem(COLD)
        cold_tpu = bench_tpu(COLD, ei_c, x_c)
        # One live sample only — a collab-scale torch step costs tens of
        # seconds; the pinned constant is the stable floor.
        cold_cpu, cold_cpu_info = _cpu_baseline(
            COLD, ei_c, x_c, PINNED_CPU_COLD, k=1
        )
        extra["cold"] = {
            "metric": "teacher_train_edges_per_sec_collab_scale",
            "value": round(cold_tpu, 1),
            "vs_baseline": round(cold_tpu / cold_cpu, 2),
            "cpu_baseline": cold_cpu_info,
        }

        # Round-3 regression gates: student + serving floors (TPU only —
        # the ms floors are chip measurements).  LLP_BENCH_GATES=0 skips.
        # Round-5: the headline teacher numbers gate absolutely (they were
        # the only unguarded metrics — VERDICT r4 weak #1).
        extra["teacher_gates"] = teacher_gates(warm_tpu, cold_tpu)

        if os.environ.get("LLP_BENCH_GATES", "1") == "0":
            extra["gates"] = "skipped"  # explicit: green vs not-run
            extra["gates_ok"] = bool(
                all(v["ok"] for v in extra["teacher_gates"].values())
            )
        else:
            # Record-only encoder matrix (VERDICT r4 weak #2): the cold
            # collab-scale epoch through GCN and the linear-then-aggregate
            # conv — the r4 one-shot trace measured all three at ~181
            # ms/step; recording per round makes a layout regression in the
            # factored sym-norm / sage_updated paths visible in the round
            # JSON history (the structural CPU gate is
            # tests/test_encoder_segsum_gate.py; the absolute floor above
            # guards the SAGE path).
            extra["encoder_matrix"] = {
                name: round(bench_tpu(COLD, ei_c, x_c, encoder=enc,
                                      conv=conv), 1)
                for name, enc, conv in (
                    ("gcn_cold_edges_per_sec", "gcn", "sage"),
                    ("sage_updated_cold_edges_per_sec", "sage",
                     "sage_updated"),
                )
            }

            stu = bench_student(COLD, ei_c, x_c)
            floor = GATE_FLOORS["student_bf16_edges_per_sec"]
            extra["student"] = {
                "metric": "student_bf16_minibatch_edges_per_sec_collab_scale",
                "value": round(stu, 1),
                "floor": floor,
                "ok": bool(stu >= floor),
            }
            extra["serving"] = bench_serving()
            extra["gates_ok"] = bool(
                extra["student"]["ok"]
                and all(v["ok"] for v in extra["serving"].values())
                and all(v["ok"] for v in extra["teacher_gates"].values())
            )
    else:
        # Warm-only invocation: the collab-scale gates need the cold problem.
        extra["gates"] = "skipped"

    print(
        json.dumps(
            {
                "metric": "teacher_train_edges_per_sec",
                "value": round(warm_tpu, 1),
                "unit": "edges/s",
                "vs_baseline": round(warm_tpu / warm_cpu, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
