"""TPU scale check: 100M-node int4 serving table on ONE chip.

int4 packs two codes per byte: a 100M x 128 table = 6.4 GB codes + 0.4 GB
fp32 scales = 6.8 GB — an order past the 10M int8 check (1.32 GB) and
impossible at fp32 (51.2 GB) or int8 (13.2 GB would fit but leave no room
for programs).  Built blockwise on device (no fp32 intermediate above one
build block).  Measures inner approx blocked retrieval (Q=256, k=10) and a
recall sample vs int8 on a 1M-row sub-table.

Protocol: one process, chained scans, table as jit arg, log to argv[1].
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("LLP_SCALE_CPU"):  # CPU smoke path (axon ignores env vars)
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/serve_scale100m_int4.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from llp_tpu.models.predictor import init_link_predictor  # noqa: E402
from llp_tpu.serve import top_k_partners  # noqa: E402
from llp_tpu.serve.quant import QuantTable, pack_int4  # noqa: E402

N = int(os.environ.get("LLP_SCALE_N", 100_000_000))  # env knob: CPU smoke
H, Q, K_TOP = 128, 256, 10
BLOCK_BUILD = min(2_000_000, N)
log(f"devices: {jax.devices()}")


@jax.jit
def build_block4(key):
    h = jax.random.normal(key, (BLOCK_BUILD, H), jnp.float32)
    a = jnp.max(jnp.abs(h), axis=1)
    scale = jnp.where(a > 0, a / 7.0, 1.0)
    q = jnp.clip(jnp.round(h / scale[:, None]), -7, 7).astype(jnp.int8)
    return pack_int4(q), scale


import functools  # noqa: E402


@functools.partial(jax.jit, donate_argnums=(0, 1))
def write_block(out_q, out_s, qstart, sstart, q, s):
    # Donated in-place writes: a concatenate of 50 blocks would transiently
    # double the 6.4 GB table; this keeps peak = table + one block.
    # Starts are traced scalars so one program serves every block (codes
    # index STORAGE rows = logical/2; scales index logical rows).
    return (
        jax.lax.dynamic_update_slice_in_dim(out_q, q, qstart, 0),
        jax.lax.dynamic_update_slice_in_dim(out_s, s, sstart, 0),
    )


t0 = time.time()
# Lane-packed int4 storage: (ceil(N/2), H) uint8, two logical rows per
# storage row (llp_tpu.serve.quant.QuantTable bits=4).  BLOCK_BUILD is
# even, so block writes land on storage-row boundaries (start // 2).
assert N % 2 == 0 and BLOCK_BUILD % 2 == 0
out_q = jnp.zeros((N // 2, H), jnp.uint8)
out_s = jnp.zeros((N,), jnp.float32)
for i, start in enumerate(range(0, N, BLOCK_BUILD)):
    q, s = build_block4(jax.random.fold_in(jax.random.PRNGKey(7), i))
    rem = min(BLOCK_BUILD, N - start)
    if rem < BLOCK_BUILD:  # tail block: write only the real rows (a full
        # block write would be rejected and a skipped tail would leave
        # zero-code rows scoring sigmoid(0)=0.5)
        q, s = q[: rem // 2], s[:rem]
    out_q, out_s = write_block(
        out_q, out_s, jnp.int32(start // 2), jnp.int32(start), q, s
    )
qt = QuantTable(q=out_q, scale=out_s, bits=4)
_ = int(np.asarray(qt.q[-1, -1]))
log(f"int4 table built: logical {qt.shape} packed {qt.q.shape} "
    f"({qt.nbytes / 1e9:.2f} GB) in {time.time() - t0:.1f}s")

rng = np.random.default_rng(3)
qi0 = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))
pred_inner = init_link_predictor(jax.random.PRNGKey(1), "inner", H, H, 1, 2)


def chain(name, fn, tab, qi_init, n_mod, kchain=3):
    @jax.jit
    def run(qi, t):
        def step(q, _):
            vals, ids = fn(q, t)
            q2 = (q + jnp.maximum(ids[:, 0], 0)) % np.int32(n_mod)
            return q2.astype(jnp.int32), vals[0, 0]

        qf, vs = lax.scan(step, qi, None, length=kchain)
        return qf, vs

    qf, vs = run(qi_init, tab)
    _ = float(vs[-1]) + float(qf[0])
    t0 = time.perf_counter()
    qf, vs = run(qi_init, tab)
    _ = float(vs[-1]) + float(qf[0])
    dt = (time.perf_counter() - t0) / kchain
    log(f"  {name}: {dt * 1e3:.1f} ms/call "
        f"({Q * n_mod / dt / 1e9:.1f} B pairs/s, {dt * 1e3 / Q:.3f} ms/query)")


chain(
    "inner approx int4 100M (block=auto)",
    lambda q, t: top_k_partners(
        pred_inner, t, q, k=K_TOP, mode="inner", approx=True
    ),
    qt, qi0, N,
)

# Recall sample: int4 vs exact-dequant ranking on a 1M-row slice (CPU-side
# exact reference over 100M rows is not computable; the slice is the gate).
M = min(1_000_000, N)
sub = QuantTable(q=qt.q[: M // 2], scale=qt.scale[:M], bits=4)  # storage
# rows = logical/2 (lane-packed)
qi_s = jnp.asarray(rng.integers(0, M, 64).astype(np.int32))
v4, i4 = top_k_partners(pred_inner, sub, qi_s, k=K_TOP, mode="inner",
                        approx=True)
vx, ix = top_k_partners(pred_inner, sub, qi_s, k=K_TOP, mode="inner",
                        approx=False)
i4, ix = np.asarray(i4), np.asarray(ix)
rec = np.mean([
    len(set(a.tolist()) & set(b.tolist())) / K_TOP for a, b in zip(ix, i4)
])
log(f"recall@10 approx-vs-exact on the int4 1M slice: {rec:.3f}")
log("DONE")
