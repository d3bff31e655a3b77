"""TPU measurement (session 7): top-K partner retrieval variants.

The session-3 serving bench put inner-mode retrieval at 46.8 ms for Q=256
over N=235k — 0.66 TFLOP/s effective, far under both MXU and HBM limits, so
the per-block exact ``lax.top_k`` merges are the suspect. Variants measured:

  A. current: blocked exact merge (k+B top_k per block)     [baseline]
  B. blocked, per-block ``lax.approx_max_k`` + one final exact top_k
  C. inner only: single (Q,H)x(H,N) matmul + ONE top_k over N
  D. inner only: single matmul + ONE approx_max_k over N
  E. bf16 variants (existing compute_dtype option)

One long-lived process, chained-scan timing (data dependence through the
query ids), line-buffered log (argv[1]) — the axon relay protocol from
.claude/skills/verify/SKILL.md.  The table is a JIT ARGUMENT, not a closure:
closure constants get serialized into the remote-compile HLO upload and a
240MB table blows the relay's HTTP body limit (observed 413).
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_topk.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.models.mlp import init_mlp  # noqa: E402
from llp_tpu.models.predictor import (  # noqa: E402
    apply_link_predictor,
    init_link_predictor,
)
from llp_tpu.serve.engine import _pad_rows  # noqa: E402

N, D, H, Q, K_TOP = 235_000, 256, 256, 256, 10
KCHAIN = 10
rng = np.random.default_rng(2)
log(f"devices: {jax.devices()}")

xs = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
enc = init_mlp(jax.random.PRNGKey(0), 2, D, H, H)
from llp_tpu.serve import encode_nodes  # noqa: E402

h_emb = encode_nodes(enc, xs, block=32768)
_ = float(h_emb[0, 0])
log(f"table ready: N={N} H={H}")
qi0 = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))

HP32, NB16 = _pad_rows(h_emb, 16384)
_, NB64 = _pad_rows(h_emb, 65536)
HP64 = _pad_rows(h_emb, 65536)[0]
HPBF = HP32.astype(jnp.bfloat16)
HP512 = _pad_rows(h_emb, 512)[0]
HP512BF = HP512.astype(jnp.bfloat16)


def chain(name, fn, hp):
    """fn: (qi, hp) -> (vals, ids); timed as KCHAIN chained calls in one jit."""

    @jax.jit
    def run(qi, hpv):
        def step(q, _):
            vals, ids = fn(q, hpv)
            q2 = (q + ids[:, 0]) % np.int32(N)
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
        pps = Q * N / (dt / 1e3) / 1e9
        log(f"{name}: {dt:.2f} ms/call ({pps:.2f} B pairs/s)")
        return dt
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:300]}")
        return None


def blocked(params, mode, block, nb, merge):
    def fn(qi, hp):
        q_h = jnp.take(hp, qi, axis=0).astype(hp.dtype)

        def score_block(b0):
            cand = lax.dynamic_slice_in_dim(hp, b0, block, axis=0)
            cand_ids = b0 + jnp.arange(block, dtype=jnp.int32)
            pp = jax.tree_util.tree_map(lambda a: a.astype(hp.dtype), params)
            s = apply_link_predictor(
                pp, q_h[:, None, :], cand[None, :, :], mode=mode, train=False
            )
            invalid = (cand_ids[None, :] >= N) | (cand_ids[None, :] == qi[:, None])
            return jnp.where(invalid, -jnp.inf, s.astype(jnp.float32)), cand_ids

        if merge == "exact":
            def body(carry, b0):
                vals, ids = carry
                s, cand_ids = score_block(b0)
                av = jnp.concatenate([vals, s], axis=1)
                ai = jnp.concatenate(
                    [ids, jnp.broadcast_to(cand_ids[None, :], (Q, block))], axis=1
                )
                tv, tp = lax.top_k(av, K_TOP)
                return (tv, jnp.take_along_axis(ai, tp, axis=1)), None

            init = (
                jnp.full((Q, K_TOP), -jnp.inf, jnp.float32),
                jnp.full((Q, K_TOP), -1, jnp.int32),
            )
            (vals, ids), _ = lax.scan(
                body, init, jnp.arange(nb, dtype=jnp.int32) * block
            )
            return vals, ids
        else:  # per-block approx, one final exact merge
            def body(_, b0):
                s, cand_ids = score_block(b0)
                tv, tp = lax.approx_max_k(s, K_TOP)
                return None, (tv, jnp.take(cand_ids, tp.astype(jnp.int32)))

            _, (bv, bi) = lax.scan(
                body, None, jnp.arange(nb, dtype=jnp.int32) * block
            )  # (nb, Q, k)
            av = jnp.moveaxis(bv, 0, 1).reshape(Q, nb * K_TOP)
            ai = jnp.moveaxis(bi, 0, 1).reshape(Q, nb * K_TOP)
            tv, tp = lax.top_k(av, K_TOP)
            return tv, jnp.take_along_axis(ai, tp, axis=1)

    return fn


def single_pass(merge):
    """inner mode only: one (Q,H)x(H,Npad) matmul, one top-k over N."""

    def fn(qi, hp):
        npad = hp.shape[0]
        ids_all = jnp.arange(npad, dtype=jnp.int32)
        q_h = jnp.take(hp, qi, axis=0)
        s = (q_h @ hp.T).astype(jnp.float32)  # (Q, Npad); sigmoid is monotone
        invalid = (ids_all[None, :] >= N) | (ids_all[None, :] == qi[:, None])
        s = jnp.where(invalid, -jnp.inf, s)
        if merge == "exact":
            return lax.top_k(s, K_TOP)
        tv, tp = lax.approx_max_k(s, K_TOP)
        return tv, tp.astype(jnp.int32)

    return fn


pred_mlp = init_link_predictor(jax.random.PRNGKey(1), "mlp", H, H, 1, 2)
pred_inner = init_link_predictor(jax.random.PRNGKey(1), "inner", H, H, 1, 2)

log("--- inner mode ---")
chain("A inner exact blocked b16k (current)", blocked(pred_inner, "inner", 16384, NB16, "exact"), HP32)
chain("B inner approx blocked b16k", blocked(pred_inner, "inner", 16384, NB16, "approx"), HP32)
chain("B inner approx blocked b65k", blocked(pred_inner, "inner", 65536, NB64, "approx"), HP64)
chain("C inner single-pass exact", single_pass("exact"), HP512)
chain("D inner single-pass approx", single_pass("approx"), HP512)
chain("D inner single-pass approx bf16", single_pass("approx"), HP512BF)
chain("E inner exact blocked b16k bf16", blocked(pred_inner, "inner", 16384, NB16, "exact"), HPBF)

log("--- mlp mode ---")
chain("A mlp exact blocked b16k (current)", blocked(pred_mlp, "mlp", 16384, NB16, "exact"), HP32)
chain("B mlp approx blocked b16k", blocked(pred_mlp, "mlp", 16384, NB16, "approx"), HP32)
chain("B mlp approx blocked b65k", blocked(pred_mlp, "mlp", 65536, NB64, "approx"), HP64)
chain("E mlp approx blocked b16k bf16", blocked(pred_mlp, "mlp", 16384, NB16, "approx"), HPBF)

# recall sanity of approx vs exact on one call (host compare)
try:
    va, ia = jax.jit(single_pass("exact"))(qi0, HP512)
    vb, ib = jax.jit(single_pass("approx"))(qi0, HP512)
    ia_np, ib_np = np.asarray(ia), np.asarray(ib)
    rec = np.mean([
        len(set(ia_np[i].tolist()) & set(ib_np[i].tolist())) / K_TOP
        for i in range(Q)
    ])
    log(f"approx_max_k recall@{K_TOP} vs exact (inner single-pass): {rec:.4f}")
except Exception as ex:  # noqa: BLE001
    log(f"recall check FAILED {type(ex).__name__}: {str(ex)[:200]}")

log("DONE")
