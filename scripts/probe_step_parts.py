"""Round-5 diagnostic 6: which PART of the training step crashes at N=5M?

1M epochs pass (fp32 + bf16); 5M epochs crash (fp32 + bf16); isolated
chunked spmm fwd/grad passes at 10M.  Bisect the step at 5M bf16:

  C1: grad wrt h of take-rows -> predictor -> bce   (decoder + scatter-add)
  C2: grad of encoder forward (hoist + 2 conv layers, chunked segsum)
  C3: one full batch_loss value_and_grad + adam update (no epoch scan)
  C4: 3-step lax.scan of C3 (mini epoch)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_step_parts.py <log>
"""

import os
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_step_parts.log"
LOG = open(OUT, "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


os.environ.setdefault("LLP_SEGSUM_CHUNK_BYTES", str(1 << 29))
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import ml_dtypes  # noqa: E402
import numpy as np  # noqa: E402

log(f"=== probe_step_parts start; devices: {jax.devices()}")

from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.models.encoder import apply_encoder  # noqa: E402
from llp_tpu.models.predictor import apply_link_predictor  # noqa: E402
from llp_tpu.ops.losses import bce_loss  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import attach_segsum  # noqa: E402
from llp_tpu.train.teacher import (  # noqa: E402
    init_teacher_params,
    make_teacher_epoch_fn,
)
from llp_tpu.utils.precision import cast_params  # noqa: E402

N, BL = 5_000_000, 1 << 18
with np.load("/tmp/scale10m_cache_10000000.npz") as z:
    EI = z["ei"]
keep = (EI[0] < N) & (EI[1] < N)
ei = EI[:, keep]
del EI
E = ei.shape[1]
t0 = time.time()
g = attach_segsum(build_graph(ei.astype(np.int64), N))
z1 = jnp.zeros((1,), jnp.int32)
g = g.replace(senders=z1, receivers=z1, csr_row=z1,
              edge_mask=jnp.zeros((1,), bool))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, 64)).astype(ml_dtypes.bfloat16))
pos = jnp.asarray(ei.T.astype(np.int32))
del ei
params0 = init_teacher_params(
    jax.random.PRNGKey(0), encoder="sage", in_channels=64,
    hidden_channels=128, num_layers=2, predictor_mode="mlp",
)
p16 = cast_params(params0, jnp.bfloat16)
nk = jnp.zeros((1,), jnp.int32)
idx = jnp.asarray(rng.integers(0, N, size=4 * BL).astype(np.int32))
h_big = jnp.asarray(rng.normal(size=(N, 128)).astype(ml_dtypes.bfloat16))
labels = jnp.concatenate(
    [jnp.ones((BL,), jnp.float32), jnp.zeros((BL,), jnp.float32)])
log(f"setup {time.time() - t0:.0f}s (E={E})")


def run(name, fn, *args):
    try:
        t0 = time.time()
        out = jax.jit(fn)(*args)
        v = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]
                  .astype(jnp.float32))
        log(f"{name}: OK {time.time() - t0:.1f}s v={v:.5f}")
        return True
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED: {str(ex)[:300]}")
        return False


# C1: decoder grad wrt the big h (gather rows -> predictor -> bce -> scatter)
def dec_loss(h):
    rows = jnp.take(h, idx, axis=0)
    hi, hj = rows[: 2 * BL], rows[2 * BL:]
    out = apply_link_predictor(p16["predictor"], hi, hj, mode="mlp",
                               train=False)
    return bce_loss(out, labels, jnp.ones_like(labels))


if not run("C1 decoder-grad", lambda h: jax.grad(dec_loss)(h), h_big):
    log("stopping")
    sys.exit(0)


# C2: encoder grad (hoisted first agg computed in-program like the epoch)
def enc_loss(p, xx):
    from llp_tpu.models.encoder import precompute_first_aggregation

    xa = precompute_first_aggregation("sage", g, xx, impl="segsum")
    h = apply_encoder("sage", p["encoder"], g, xx, x_agg=xa, impl="segsum")
    return jnp.sum(jnp.take(h, idx[:1000], axis=0).astype(jnp.float32) ** 2)


if not run("C2 encoder-grad", lambda p, xx: jax.grad(enc_loss)(p, xx),
           p16, x):
    log("stopping")
    sys.exit(0)

# C3/C4: the real step, via make_teacher_epoch_fn at 1 and 3 steps
for name, steps in (("C3 one-step", 1), ("C4 three-step-scan", 3)):
    fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.0, num_nodes=N,
        num_pos_edges=steps * BL, link_batch_size=BL, neg_mode="uniform",
        lr=0.005, spmm_impl="segsum", compute_dtype="bfloat16",
    )
    p = jax.tree_util.tree_map(jnp.copy, params0)
    opt = tx.init(p)
    try:
        t0 = time.time()
        comp = fn.lower(p, opt, jax.random.PRNGKey(1), g, x,
                        pos[: steps * BL], nk).compile()
        ma = comp.memory_analysis()
        log(f"{name}: compiled {time.time() - t0:.0f}s "
            f"temp={ma.temp_size_in_bytes >> 20}MB")
        t0 = time.time()
        _, _, loss = comp(p, opt, jax.random.PRNGKey(2), g, x,
                          pos[: steps * BL], nk)
        log(f"{name}: OK {time.time() - t0:.1f}s loss={float(loss):.4f}")
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED: {str(ex)[:300]}")
        break
log("DONE")
