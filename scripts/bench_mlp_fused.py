"""TPU measurement (round 3): fused VMEM 'mlp' retrieval kernel.

BASELINE.md's accounting says 'mlp' retrieval at Q=256/N=235k/H=F=256 is
z1-traffic-bound: 102 ms measured bf16 ≈ the 30.8 GB hidden-activation
round-trip; matmul FLOP floor ~40 ms at v5e bf16 rate.  The fused kernel
(ops/pallas/mlp_topk_kernel.py) keeps z1 in VMEM — this script measures it
against the unfused path, sweeps (TQ, TB) tiles, covers int8 tables, and
runs the 10M-row mlp recall gate (VERDICT round-2 item 6).

Protocol: one long-lived process, chained-scan in-jit timing (data
dependence through query ids), line-buffered log (argv[1]), table passed as
a jit ARGUMENT (closure constants blow the relay's upload limit).
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_mlp_fused.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.models.predictor import init_link_predictor  # noqa: E402
from llp_tpu.ops.pallas.mlp_topk_kernel import (  # noqa: E402
    _mlp_logits_call,
    _prep_weights,
)
from llp_tpu.serve.engine import top_k_partners  # noqa: E402
from llp_tpu.serve.quant import QuantTable, quantize_table  # noqa: E402

N, H, Q, K_TOP = 235_868, 256, 256, 10
KCHAIN = 10
rng = np.random.default_rng(5)
log(f"devices: {jax.devices()}")

pred = init_link_predictor(jax.random.PRNGKey(1), "mlp", H, H, 1, 2)

# Random table (the retrieval cost doesn't care about embedding semantics).
h_emb = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
qt = quantize_table(h_emb)
_ = float(qt.scale[0]) + float(h_emb[0, 0])
qi0 = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))
log(f"table ready: N={N} H={H} (fp32 {h_emb.nbytes >> 20}MB, int8 "
    f"{qt.nbytes >> 20}MB)")


def chain(name, fn, hp, n_total=N):
    """fn(qi, hp) -> (vals, ids); KCHAIN chained calls in one jit."""

    @jax.jit
    def run(qi, hpv):
        def step(q, _):
            vals, ids = fn(q, hpv)
            q2 = (q + ids[:, 0]) % np.int32(n_total)
            return q2.astype(jnp.int32), vals[0, 0]

        qf, vs = lax.scan(step, qi, None, length=KCHAIN)
        return qf, vs

    try:
        qf, vs = run(qi0, hp)
        _ = float(vs[-1]) + float(qf[0])
        t0 = time.perf_counter()
        qf, vs = run(qi0, hp)
        _ = float(vs[-1]) + float(qf[0])
        dt = (time.perf_counter() - t0) / KCHAIN * 1e3
        pps = Q * n_total / (dt / 1e3) / 1e9
        log(f"{name}: {dt:.2f} ms/call ({pps:.2f} B pairs/s)")
        return dt
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:300]}")
        return None


def engine_fn(**kw):
    def fn(qi, hp):
        return top_k_partners(pred, hp, qi, k=K_TOP, mode="mlp", **kw)

    return fn


BF = jnp.bfloat16

log("--- collab scale: engine-routed paths ---")
chain("unfused fp32 approx b4096 (r2 baseline)",
      engine_fn(approx=True, mlp_fused=False), h_emb)
chain("unfused bf16 approx b4096 (r2 best)",
      engine_fn(approx=True, compute_dtype=BF, mlp_fused=False), h_emb)
chain("FUSED fp32 approx auto", engine_fn(approx=True), h_emb)
chain("FUSED bf16 approx auto",
      engine_fn(approx=True, compute_dtype=BF), h_emb)
chain("FUSED bf16 exact b16384",
      engine_fn(compute_dtype=BF, block=16384), h_emb)
chain("FUSED fp32 exact b16384", engine_fn(block=16384), h_emb)
chain("FUSED int8 approx auto (fp32 dequant)", engine_fn(approx=True), qt)
chain("FUSED int8+bf16 approx auto",
      engine_fn(approx=True, compute_dtype=BF), qt)

log("--- (TQ, TB) tile sweep: raw kernel over the whole padded table ---")


def sweep_fn(tq, tb, dtype):
    """One fused-kernel pass over the padded table + one approx_max_k."""
    npad = -(-N // tb) * tb

    def fn(qi, hp):
        q_h = jnp.take(hp, qi, axis=0).astype(dtype)
        flat_w = _prep_weights(pred["lins"], dtype)
        logits = _mlp_logits_call(
            q_h, hp.astype(dtype), None, flat_w, nw=2, quant=False,
            tq=tq, tb=tb, interpret=False,
        )  # (Q, npad)
        ids_all = jnp.arange(npad, dtype=jnp.int32)
        invalid = (ids_all[None, :] >= N) | (ids_all[None, :] == qi[:, None])
        logits = jnp.where(invalid, -jnp.inf, logits)
        tv, tp = lax.approx_max_k(logits, K_TOP)
        return tv, tp.astype(jnp.int32)

    return fn, npad


for tq, tb in [(8, 256), (16, 256), (8, 512), (16, 512), (32, 512),
               (4, 256), (8, 1024)]:
    fn, npad = sweep_fn(tq, tb, BF)
    pad = npad - N
    hp = jnp.concatenate([h_emb, jnp.zeros((pad, H), jnp.float32)])
    chain(f"sweep bf16 tq={tq} tb={tb}", fn, hp)

log("--- recall gates (collab scale) ---")
try:
    v_ex, i_ex = top_k_partners(pred, h_emb, qi0, k=K_TOP, mode="mlp",
                                mlp_fused=False)
    i_ex = np.asarray(i_ex)

    def recall(ids):
        ids = np.asarray(ids)
        return float(np.mean([
            len(set(i_ex[i].tolist()) & set(ids[i].tolist())) / K_TOP
            for i in range(Q)
        ]))

    _, i_f = top_k_partners(pred, h_emb, qi0, k=K_TOP, mode="mlp",
                            approx=True, compute_dtype=BF)
    log(f"recall@10 FUSED bf16+approx vs fp32-exact: {recall(i_f):.4f}")
    _, i_q = top_k_partners(pred, qt, qi0, k=K_TOP, mode="mlp",
                            approx=True, compute_dtype=BF)
    log(f"recall@10 FUSED int8+bf16+approx vs fp32-exact: {recall(i_q):.4f}")
    _, i_fe = top_k_partners(pred, h_emb, qi0, k=K_TOP, mode="mlp",
                             block=16384)
    log(f"exact-mode FUSED id match vs unfused: "
        f"{float((np.asarray(i_fe) == i_ex).mean()):.4f}")
except Exception as ex:  # noqa: BLE001
    log(f"recall gates FAILED {type(ex).__name__}: {str(ex)[:300]}")

log("--- 10M-row int8 mlp (H=128) ---")
try:
    N10, H10 = 10_000_000, 128
    pred10 = init_link_predictor(jax.random.PRNGKey(2), "mlp", H10, H10, 1, 2)

    @jax.jit
    def build_block(key):
        rows = jax.random.normal(key, (2_000_000, H10), jnp.float32)
        a = jnp.max(jnp.abs(rows), axis=1)
        s = jnp.where(a > 0, a / 127.0, 1.0)
        return (jnp.clip(jnp.round(rows / s[:, None]), -127, 127)
                .astype(jnp.int8), s)

    t0 = time.perf_counter()
    codes, scales = [], []
    for i in range(5):
        c, s = build_block(jax.random.PRNGKey(100 + i))
        codes.append(c)
        scales.append(s)
    qt10 = QuantTable(q=jnp.concatenate(codes), scale=jnp.concatenate(scales))
    del codes, scales
    _ = float(qt10.scale[-1])
    log(f"10M int8 table built in {time.perf_counter() - t0:.1f}s "
        f"({qt10.nbytes >> 20}MB)")
    qi10 = jnp.asarray(rng.integers(0, N10, Q).astype(np.int32))

    def fn10(**kw):
        def fn(qi, hp):
            return top_k_partners(pred10, hp, qi, k=K_TOP, mode="mlp", **kw)

        return fn

    qi0 = qi10  # chain() reads the module-level qi0
    chain("10M FUSED int8+bf16 approx auto",
          fn10(approx=True, compute_dtype=BF), qt10, n_total=N10)
    chain("10M FUSED int8 fp32 approx auto", fn10(approx=True), qt10,
          n_total=N10)
    chain("10M unfused int8+bf16 approx b4096 (r2 path)",
          fn10(approx=True, compute_dtype=BF, mlp_fused=False), qt10,
          n_total=N10)

    # Recall gate: int8+bf16+approx fused vs int8 fp32 exact (the mlp gate
    # VERDICT item 6 asked for; fp32-dense ground truth would need a 5.1GB
    # table — the int8 exact ranking is the served ground truth here).
    v_ex10, i_ex10 = top_k_partners(pred10, qt10, qi10, k=K_TOP, mode="mlp",
                                    block=65536)
    i_ex10 = np.asarray(i_ex10)
    _, i_a10 = top_k_partners(pred10, qt10, qi10, k=K_TOP, mode="mlp",
                              approx=True, compute_dtype=BF)
    i_a10 = np.asarray(i_a10)
    rec10 = float(np.mean([
        len(set(i_ex10[i].tolist()) & set(i_a10[i].tolist())) / K_TOP
        for i in range(Q)
    ]))
    log(f"10M recall@10 FUSED int8+bf16+approx vs int8-exact: {rec10:.4f}")
except Exception as ex:  # noqa: BLE001
    log(f"10M phase FAILED {type(ex).__name__}: {str(ex)[:300]}")

log("DONE")
