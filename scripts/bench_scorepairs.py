"""TPU measurement (session 7, part 3): score_pairs breakdown.

Session-3 recorded 1M-pair scoring at 56 ms (inner) / 60 ms (mlp) against a
~5 ms gather floor — never diagnosed. Chained in-jit timing isolates: the
engine's blocked scan (current), an unblocked single expression, the fused
SDDMM kernel vs plain XLA, block-size sensitivity, and the bare gathers.

Axon relay protocol: one process, line-buffered log, arrays as jit ARGS.
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_scorepairs.log"
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
from llp_tpu.serve import encode_nodes  # noqa: E402
from llp_tpu.serve.engine import _score_blocked  # noqa: E402

N, D, H = 235_000, 256, 256
NPAIRS = 1 << 20
KCHAIN = 10
rng = np.random.default_rng(2)
log(f"devices: {jax.devices()}")
xs = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
enc = init_mlp(jax.random.PRNGKey(0), 2, D, H, H)
h_emb = encode_nodes(enc, xs, block=32768)
_ = float(h_emb[0, 0])
src0 = jnp.asarray(rng.integers(0, N, NPAIRS).astype(np.int32))
dst0 = jnp.asarray(rng.integers(0, N, NPAIRS).astype(np.int32))
log(f"ready: N={N} H={H} pairs={NPAIRS}")

preds = {
    "inner": init_link_predictor(jax.random.PRNGKey(1), "inner", H, H, 1, 2),
    "mlp": init_link_predictor(jax.random.PRNGKey(1), "mlp", H, H, 1, 2),
}


def chain(name, fn):
    """fn: (src, dst, h) -> (NPAIRS,) scores; chained with an index shift."""

    @jax.jit
    def run(s, d, h):
        def step(carry, _):
            s_, d_ = carry
            out = fn(s_, d_, h)
            shift = (out[:8].sum() > -1).astype(jnp.int32)  # data dep, +1
            return (jnp.roll(s_, shift), jnp.roll(d_, shift)), out[0]

        (sf, df), outs = lax.scan(step, (s, d), None, length=KCHAIN)
        return sf[0] + df[0], outs

    try:
        r, outs = run(src0, dst0, h_emb)
        _ = float(r) + float(outs[-1])
        t0 = time.perf_counter()
        r, outs = run(src0, dst0, h_emb)
        _ = float(r) + float(outs[-1])
        dt = (time.perf_counter() - t0) / KCHAIN * 1e3
        log(f"{name}: {dt:.2f} ms ({NPAIRS/dt*1e3/1e6:.1f} M pairs/s)")
        return dt
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:250]}")
        return None


def blocked(mode, block, fused):
    params = preds[mode]

    def fn(s, d, h):
        nb = NPAIRS // block

        def body(_, sd):
            hi = jnp.take(h, sd[0], axis=0)
            hj = jnp.take(h, sd[1], axis=0)
            return None, apply_link_predictor(
                params, hi, hj, mode=mode, train=False, fused=fused
            )

        _, out = lax.scan(body, None, (s.reshape(nb, block), d.reshape(nb, block)))
        return out.reshape(-1)

    return fn


def unblocked(mode, fused):
    params = preds[mode]

    def fn(s, d, h):
        hi = jnp.take(h, s, axis=0)
        hj = jnp.take(h, d, axis=0)
        return apply_link_predictor(
            params, hi, hj, mode=mode, train=False, fused=fused
        )

    return fn


def gathers_only(s, d, h):
    hi = jnp.take(h, s, axis=0)
    hj = jnp.take(h, d, axis=0)
    return (hi[:, 0] + hj[:, 0]).astype(jnp.float32)


chain("bare gathers (2x 1M rows)", gathers_only)
for mode in ("inner", "mlp"):
    chain(f"{mode} blocked131k fused (current)", blocked(mode, 131072, True))
    chain(f"{mode} blocked131k xla", blocked(mode, 131072, False))
    chain(f"{mode} unblocked xla", unblocked(mode, False))
    chain(f"{mode} unblocked fused", unblocked(mode, True))
    chain(f"{mode} blocked262k xla", blocked(mode, 262144, False))

# engine path single dispatch for reference (includes tunnel overhead)
for mode in ("inner", "mlp"):
    out = _score_blocked(preds[mode], h_emb, src0, dst0, mode=mode, block=131072)
    _ = float(out[0])
    t0 = time.perf_counter()
    out = _score_blocked(preds[mode], h_emb, src0, dst0, mode=mode, block=131072)
    _ = float(out[0])
    log(f"engine single-dispatch {mode}: {(time.perf_counter()-t0)*1e3:.2f} ms")

log("DONE")
