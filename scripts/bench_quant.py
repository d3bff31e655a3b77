"""TPU measurement (round 2): int8-quantized serving tables vs fp32/bf16.

Hypotheses from BASELINE.md:
* collab-scale fp32 table (235k x 256 = 240MB) is COLD — uniform-random
  row gathers run ~63M rows/s (4x below cache-warm); the int8 table (60MB)
  fits the measured cache-warm regime (<=64MB) → score_pairs should speed up.
* 'inner' single-pass retrieval scores on the MXU int8 path with int32
  accumulation (llp_tpu/serve/quant.int8_dot_scores) — table DMA drops 4x
  vs fp32 / 2x vs bf16.
* 'mlp' blocked retrieval is FLOP-bound — int8 only shrinks the candidate
  DMA (blocks dequantize to fp32/bf16 for the MLP), expect ~bf16 parity.

Protocol: one long-lived process, chained-scan timing (data dependence
through the query/pair ids), tables as JIT ARGUMENTS (a closed-over 240MB
constant serializes into the remote-compile upload → relay HTTP 413),
line-buffered log (argv[1]) — .claude/skills/verify/SKILL.md.
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_quant.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.models.mlp import init_mlp  # noqa: E402
from llp_tpu.models.predictor import init_link_predictor  # noqa: E402
from llp_tpu.serve import encode_nodes, score_pairs, top_k_partners  # noqa: E402
from llp_tpu.serve.quant import quantize_table  # noqa: E402

N, D, H, Q, K_TOP = 235_000, 256, 256, 256, 10
rng = np.random.default_rng(2)
log(f"devices: {jax.devices()}")

xs = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
enc = init_mlp(jax.random.PRNGKey(0), 2, D, H, H)
h32 = encode_nodes(enc, xs, block=32768)
_ = float(h32[0, 0])
qt = quantize_table(h32)
_ = int(np.asarray(qt.q[0, 0]))
log(f"tables ready: fp32 {h32.nbytes/1e6:.0f}MB, int8 {qt.nbytes/1e6:.0f}MB")
qi0 = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))

pred_mlp = init_link_predictor(jax.random.PRNGKey(1), "mlp", H, H, 1, 2)
pred_inner = init_link_predictor(jax.random.PRNGKey(1), "inner", H, H, 1, 2)


def chain_topk(name, table, mode, params, kchain=10, **kw):
    @jax.jit
    def run(qi, tab):
        def step(q, _):
            vals, ids = top_k_partners(
                params, tab, q, k=K_TOP, mode=mode, block=16384, **kw
            )
            q2 = (q + jnp.maximum(ids[:, 0], 0)) % np.int32(N)
            return q2.astype(jnp.int32), vals[0, 0]

        qf, vs = lax.scan(step, qi, None, length=kchain)
        return qf, vs

    try:
        qf, vs = run(qi0, table)
        _ = float(vs[-1]) + float(qf[0])
        t0 = time.perf_counter()
        qf, vs = run(qi0, table)
        _ = float(vs[-1]) + float(qf[0])
        dt = (time.perf_counter() - t0) / kchain * 1e3
        pps = Q * N / (dt / 1e3) / 1e9
        log(f"{name}: {dt:.2f} ms/call ({pps:.2f} B pairs/s)")
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:300]}")


M = 1_000_000
src0 = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
dst0 = jnp.asarray(rng.integers(0, N, M).astype(np.int32))


def chain_score(name, table, mode, params, kchain=5):
    @jax.jit
    def run(src, dst, tab):
        def step(carry, _):
            s, d = carry
            out = score_pairs(params, tab, s, d, mode=mode)
            # data dependence: rotate ids by a value derived from the output
            off = (out[0] * 1000.0).astype(jnp.int32)
            return ((s + off + 1) % np.int32(N), (d + off + 7) % np.int32(N)), out[0]

        (sf, _), vs = lax.scan(step, (src, dst), None, length=kchain)
        return sf, vs

    try:
        sf, vs = run(src0, dst0, table)
        _ = float(vs[-1]) + float(sf[0])
        t0 = time.perf_counter()
        sf, vs = run(src0, dst0, table)
        _ = float(vs[-1]) + float(sf[0])
        dt = (time.perf_counter() - t0) / kchain * 1e3
        log(f"{name}: {dt:.2f} ms/1M pairs ({M/(dt/1e3)/1e6:.0f} M pairs/s)")
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:300]}")


log("--- topk retrieval (Q=256, k=10) ---")
chain_topk("inner exact fp32", h32, "inner", pred_inner)
chain_topk("inner approx fp32 (single-pass)", h32, "inner", pred_inner, approx=True)
chain_topk("inner approx bf16", h32, "inner", pred_inner, approx=True,
           compute_dtype=jnp.bfloat16)
chain_topk("inner approx INT8 (MXU int8 single-pass)", qt, "inner", pred_inner,
           approx=True)
chain_topk("inner exact INT8 (blocked dequant)", qt, "inner", pred_inner)
chain_topk("mlp approx fp32", h32, "mlp", pred_mlp, approx=True, kchain=4)
chain_topk("mlp approx bf16", h32, "mlp", pred_mlp, approx=True,
           compute_dtype=jnp.bfloat16, kchain=4)
chain_topk("mlp approx INT8 (dequant fp32 blocks)", qt, "mlp", pred_mlp,
           approx=True, kchain=4)
chain_topk("mlp approx INT8+bf16 (dequant bf16 blocks)", qt, "mlp", pred_mlp,
           approx=True, compute_dtype=jnp.bfloat16, kchain=4)

log("--- score_pairs (1M uniform pairs) ---")
chain_score("mlp fp32 table", h32, "mlp", pred_mlp)
chain_score("mlp INT8 table", qt, "mlp", pred_mlp)
chain_score("inner fp32 table", h32, "inner", pred_inner)
chain_score("inner INT8 table", qt, "inner", pred_inner)

log("--- int8 recall/quality vs fp32 (device) ---")
try:
    vf, idf = top_k_partners(pred_inner, h32, qi0, k=K_TOP, mode="inner")
    vq, idq = top_k_partners(pred_inner, qt, qi0, k=K_TOP, mode="inner",
                             approx=True)
    a, b = np.asarray(idf), np.asarray(idq)
    rec = np.mean([
        len(set(a[i].tolist()) & set(b[i].tolist())) / K_TOP for i in range(Q)
    ])
    mae = np.abs(np.asarray(vf) - np.asarray(vq)).max()
    log(f"inner int8+approx recall@{K_TOP} vs fp32 exact: {rec:.4f}, "
        f"score maxerr {mae:.4f}")
    vfm, idfm = top_k_partners(pred_mlp, h32, qi0, k=K_TOP, mode="mlp")
    vqm, idqm = top_k_partners(pred_mlp, qt, qi0, k=K_TOP, mode="mlp",
                               approx=True)
    am, bm = np.asarray(idfm), np.asarray(idqm)
    recm = np.mean([
        len(set(am[i].tolist()) & set(bm[i].tolist())) / K_TOP
        for i in range(Q)
    ])
    log(f"mlp int8+approx recall@{K_TOP} vs fp32 exact: {recm:.4f}, "
        f"score maxerr {np.abs(np.asarray(vfm) - np.asarray(vqm)).max():.4f}")
except Exception as ex:  # noqa: BLE001
    log(f"recall check FAILED {type(ex).__name__}: {str(ex)[:300]}")

log("DONE")
