"""TPU scale check: serving a 10M-node int8 embedding table on one chip.

The measured int8 headline is CAPACITY (BASELINE.md round-2 quant table):
4x less HBM at unchanged recall.  This check exercises the regime that
capacity unlocks — N=10,000,000, H=128: fp32 would be 5.1GB of table (plus
fp32 score/merge temporaries — uncomfortable next to a training job on a
16GB chip); int8 is 1.28GB.  The table is BUILT blockwise on device (the
fp32 intermediate never materializes beyond one block), then retrieval and
pair scoring run the normal engine paths (single-pass is budget-gated out
at this N — the blocked merges handle it).

Protocol: one long-lived process, chained-scan timing, tables as jit
arguments, line-buffered log (argv[1]).
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/serve_scale10m.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.models.predictor import init_link_predictor  # noqa: E402
from llp_tpu.serve import score_pairs, top_k_partners  # noqa: E402
from llp_tpu.serve.quant import QuantTable  # noqa: E402

N, H, Q, K_TOP = 10_000_000, 128, 256, 10
BLOCK_BUILD = 500_000
log(f"devices: {jax.devices()}")


@jax.jit
def build_block(key):
    """One (BLOCK_BUILD, H) block of synthetic embeddings, quantized —
    the fp32 intermediate lives only inside this program."""
    h = jax.random.normal(key, (BLOCK_BUILD, H), jnp.float32)
    a = jnp.max(jnp.abs(h), axis=1)
    scale = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.clip(jnp.round(h / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


nb = N // BLOCK_BUILD
t0 = time.time()
qs, ss = [], []
for i in range(nb):
    q, s = build_block(jax.random.fold_in(jax.random.PRNGKey(7), i))
    qs.append(q)
    ss.append(s)
qt = QuantTable(q=jnp.concatenate(qs), scale=jnp.concatenate(ss))
del qs, ss
_ = int(np.asarray(qt.q[-1, -1]))
log(f"int8 table built on device: {qt.shape} = {qt.nbytes/1e9:.2f} GB "
    f"in {time.time()-t0:.1f}s")

try:
    from llp_tpu.utils.memory import get_device_memory_map

    log(f"device memory: {get_device_memory_map()}")
except Exception as ex:  # noqa: BLE001
    log(f"memory stats unavailable: {ex}")

rng = np.random.default_rng(3)
qi0 = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))
pred_inner = init_link_predictor(jax.random.PRNGKey(1), "inner", H, H, 1, 2)
pred_mlp = init_link_predictor(jax.random.PRNGKey(1), "mlp", H, H, 1, 2)


def chain_topk(name, mode, params, kchain=3, **kw):
    @jax.jit
    def run(qi, tab):
        def step(q, _):
            vals, ids = top_k_partners(
                params, tab, q, k=K_TOP, mode=mode, block=65536, **kw
            )
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
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:300]}")


log("--- retrieval over 10M rows (Q=256, k=10, blocked) ---")
chain_topk("inner approx int8", "inner", pred_inner, approx=True)
chain_topk("inner exact int8", "inner", pred_inner)
chain_topk("mlp approx int8+bf16", "mlp", pred_mlp, approx=True,
           compute_dtype=jnp.bfloat16, kchain=1)

M = 1_000_000
src0 = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
dst0 = jnp.asarray(rng.integers(0, N, M).astype(np.int32))


@jax.jit
def run_score(src, dst, tab):
    def step(carry, _):
        s, d = carry
        out = score_pairs(pred_mlp, tab, s, d, mode="mlp")
        off = (out[0] * 1000.0).astype(jnp.int32)
        return ((s + off + 1) % np.int32(N), (d + off + 7) % np.int32(N)), out[0]

    (sf, _), vs = lax.scan(step, (src, dst), None, length=3)
    return sf, vs


try:
    sf, vs = run_score(src0, dst0, qt)
    _ = float(vs[-1]) + float(sf[0])
    t0 = time.perf_counter()
    sf, vs = run_score(src0, dst0, qt)
    _ = float(vs[-1]) + float(sf[0])
    dt = (time.perf_counter() - t0) / 3 * 1e3
    log(f"score_pairs 1M uniform on 10M-row int8 table (mlp): {dt:.1f} ms "
        f"({M/(dt/1e3)/1e6:.0f} M pairs/s)")
except Exception as ex:  # noqa: BLE001
    log(f"score FAILED {type(ex).__name__}: {str(ex)[:300]}")

log("DONE")
