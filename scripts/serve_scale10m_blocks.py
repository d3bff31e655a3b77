"""TPU follow-up: retrieval block-size scaling on the 10M-row int8 table.

serve_scale10m.py measured inner+approx at 672 ms/call with 65k-row blocks
(153 per-block ApproxTopK merges) — ~17x above a bandwidth estimate, so the
merge count is the suspect.  This sweeps the block size (score-tile height)
and also tries a direct int8 block matmul (skip the dequantized candidate
block entirely — codes+scale-grid per block, the blocked counterpart of
quant.int8_dot_scores).

Protocol: one process, chained scans, tables as jit args, log to argv[1].
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/serve_scale10m_blocks.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.models.predictor import init_link_predictor  # noqa: E402
from llp_tpu.serve import top_k_partners  # noqa: E402
from llp_tpu.serve.quant import QuantTable  # noqa: E402

N, H, Q, K_TOP = 10_000_000, 128, 256, 10
BLOCK_BUILD = 2_000_000
log(f"devices: {jax.devices()}")


@jax.jit
def build_block(key):
    h = jax.random.normal(key, (BLOCK_BUILD, H), jnp.float32)
    a = jnp.max(jnp.abs(h), axis=1)
    scale = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.clip(jnp.round(h / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


t0 = time.time()
qs, ss = [], []
for i in range(N // BLOCK_BUILD):
    q, s = build_block(jax.random.fold_in(jax.random.PRNGKey(7), i))
    qs.append(q)
    ss.append(s)
qt = QuantTable(q=jnp.concatenate(qs), scale=jnp.concatenate(ss))
del qs, ss
_ = int(np.asarray(qt.q[-1, -1]))
log(f"int8 table built: {qt.shape} in {time.time()-t0:.1f}s")

rng = np.random.default_rng(3)
qi0 = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))
pred_inner = init_link_predictor(jax.random.PRNGKey(1), "inner", H, H, 1, 2)


def chain(name, fn, kchain=3):
    @jax.jit
    def run(qi, tab):
        def step(q, _):
            vals, ids = fn(q, tab)
            q2 = (q + jnp.maximum(ids[:, 0], 0)) % np.int32(N)
            return q2.astype(jnp.int32), vals[0, 0]

        qf, vs = lax.scan(step, qi, None, length=kchain)
        return qf, vs

    try:
        qf, vs = run(qi0, qt)
        _ = float(vs[-1]) + float(qf[0])
        t0 = time.perf_counter()
        qf, vs = run(qi0, qt)
        _ = float(vs[-1]) + float(qf[0])
        dt = (time.perf_counter() - t0) / kchain * 1e3
        log(f"{name}: {dt:.1f} ms/call ({Q*N/(dt/1e3)/1e9:.1f} B pairs/s, "
            f"{dt/Q:.3f} ms/query)")
        return dt
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:300]}")
        return None


def engine_block(block):
    def fn(qi, tab):
        return top_k_partners(pred_inner, tab, qi, k=K_TOP, mode="inner",
                              block=block, approx=True)

    return fn


def int8_blocked(block):
    """Direct int8 per-block dot (no dequantized candidate block): the
    blocked counterpart of quant.int8_dot_scores."""

    def fn(qi, tab):
        nb = N // block
        q_rows = jnp.take(tab.q, qi, axis=0)            # (Q, H) int8
        s_q = jnp.take(tab.scale, qi, axis=0)           # (Q,)

        def body(_, b0):
            cq = lax.dynamic_slice_in_dim(tab.q, b0, block, axis=0)
            cs = lax.dynamic_slice_in_dim(tab.scale, b0, block, axis=0)
            dots = lax.dot_general(
                q_rows, cq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (s_q[:, None] * cs[None, :])
            cand_ids = b0 + jnp.arange(block, dtype=jnp.int32)
            dots = jnp.where(cand_ids[None, :] == qi[:, None], -jnp.inf, dots)
            bv, bp = lax.approx_max_k(dots, K_TOP)
            return None, (bv, jnp.take(cand_ids, bp.astype(jnp.int32)))

        _, (bv, bi) = lax.scan(
            body, None, jnp.arange(nb, dtype=jnp.int32) * block
        )
        av = jnp.moveaxis(bv, 0, 1).reshape(Q, nb * K_TOP)
        ai = jnp.moveaxis(bi, 0, 1).reshape(Q, nb * K_TOP)
        tv, tp = lax.top_k(av, K_TOP)
        return jax.nn.sigmoid(tv), jnp.take_along_axis(ai, tp, axis=1)

    return fn


log("--- engine inner+approx, block sweep ---")
for blk in (65536, 262144, 1_000_000, 2_000_000):
    chain(f"engine dequant block={blk}", engine_block(blk))

log("--- direct int8 block dot (skip dequant) ---")
for blk in (250_000, 1_000_000, 2_000_000):
    chain(f"int8-dot block={blk}", int8_blocked(blk))

log("DONE")
