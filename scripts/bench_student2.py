"""Student-step component floors + minibatch-vs-fullbatch at collab scale.

Follow-up to bench_student.py (full 30.3 / label-only 21.6 / KD 8.7 ms/step):
  a. raw dense matmul rate at the step's shapes (chained in-jit)
  b. gathered 3-layer MLP fwd and fwd+bwd over the 342k target rows
  c. full-node MLP fwd+bwd over all 236k rows (the minibatch=False encoder)
  d. predictor fwd+bwd on 262k pairs
  e. context sampling alone
  f. dropout-RNG cost: full LLP step with dropout=0
  g. full LLP step with minibatch=False (does the reference's gather help
     or hurt on TPU, where x always lives on device?)

Writes to argv[1]; run in background.
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_student2.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.data.synthetic import community_features, sbm_graph  # noqa: E402
from llp_tpu.models.mlp import apply_mlp  # noqa: E402
from llp_tpu.models.predictor import apply_link_predictor  # noqa: E402
from llp_tpu.sample.walk import sample_contexts  # noqa: E402
from llp_tpu.train.student import init_student_params, make_student_epoch_fn  # noqa: E402
from llp_tpu.train.teacher import init_teacher_params  # noqa: E402

log(f"backend={jax.default_backend()}")

N, D, H, L = 235_868, 128, 256, 3
BL = 64 * 1024
C = 12
log("building problem...")
ei, comm = sbm_graph(N, 64, 8.2, seed=7)
x = jnp.asarray(community_features(comm, D, kind="gauss", seed=7))
g = build_graph(ei, N)
E = int(ei.shape[1])
pos = jnp.asarray(ei.T.astype(np.int32))
BN = max(1, int(N / (E / min(BL, E))))
STEPS = -(-E // BL)
NROWS = BN * (1 + C) + 4 * BL  # gathered-forward row count
params = init_student_params(
    jax.random.PRNGKey(2), in_channels=D, hidden_channels=H, num_layers=L,
    predictor_mode="mlp",
)
t_h = jnp.asarray(np.random.default_rng(0).normal(size=(N, H)).astype(np.float32))
teacher = init_teacher_params(
    jax.random.PRNGKey(3), encoder="sage", in_channels=D, hidden_channels=H,
    num_layers=L, predictor_mode="mlp",
)
tpred = teacher["predictor"]
log(f"N={N} E={E} bn={BN} gathered rows/step={NROWS}")

K = 20
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (NROWS,), 0, N, dtype=jnp.int32)
pi = jax.random.randint(jax.random.fold_in(key, 1), (4 * BL,), 0, N, dtype=jnp.int32)
pj = jax.random.randint(jax.random.fold_in(key, 2), (4 * BL,), 0, N, dtype=jnp.int32)
anchors = jax.random.randint(jax.random.fold_in(key, 3), (BN,), 0, N, dtype=jnp.int32)


def chain(name, fn, init, per_iter_note="", operands=()):
    # Big operands ride as jit ARGS: closure constants get serialized into
    # the remote-compile request, which the axon relay caps (~HTTP 413 at
    # a few hundred MB).
    @jax.jit
    def run(v, *ops):
        def step(v, i):
            return fn(v, i, *ops), ()
        v, _ = lax.scan(step, v, jnp.arange(K))
        return v

    r = run(init, *operands)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    r = run(init, *operands)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    dt = (time.perf_counter() - t0) / K * 1e3
    log(f"  {name}: {dt:.2f} ms {per_iter_note}")
    return dt


# a. raw matmuls at step shapes (scalar carry threaded through the weight
# so XLA can't hoist or slice the product; full-sum forces the whole matmul)
w1 = jax.random.normal(key, (D, H), jnp.float32)
w2 = jax.random.normal(key, (H, H), jnp.float32)
a1 = jax.random.normal(key, (NROWS, D), jnp.float32)
a2 = jax.random.normal(key, (NROWS, H), jnp.float32)
fl1 = 2 * NROWS * D * H / 1e9
fl2 = 2 * NROWS * H * H / 1e9


def mm_it(v, i, a, w):
    y = a @ (w * (1.0 + v[0] * 1e-30))
    return (v[0] * 0.5 + jnp.sum(y) * 1e-12,)


chain("matmul (342k,128)@(128,256)", mm_it,
      (jnp.float32(0.0),), f"[{fl1:.0f} GFLOP]", operands=(a1, w1))
chain("matmul (342k,256)@(256,256)", mm_it,
      (jnp.float32(0.0),), f"[{fl2:.0f} GFLOP]", operands=(a2, w2))

# b/c. MLP fwd and fwd+bwd, gathered vs full-node
enc = params["encoder"]


def mlp_fwd_gathered(v, i, x_, idx_):
    rows = jnp.take(x_, idx_ + i * 0, axis=0)
    out = apply_mlp(enc, rows, dropout=0.0, train=False)
    return (v[0] * 0.999 + jnp.sum(out) * 1e-12,)


chain("gathered MLP fwd (342k rows, no dropout)", mlp_fwd_gathered,
      (jnp.float32(0.0),), operands=(x, idx))


def mlp_fwdbwd(rows_fn):
    def loss(p, i, *ops):
        out = apply_mlp(p, rows_fn(i, *ops), dropout=0.0, train=False)
        return jnp.sum(out * out) * 1e-12

    def it(p, i, *ops):
        gr = jax.grad(loss)(p, i, *ops)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-12 * b, p, gr)

    return it


chain("gathered MLP fwd+bwd (342k rows)", mlp_fwdbwd(
    lambda i, x_, idx_: jnp.take(x_, idx_ + i * 0, axis=0)), enc,
    operands=(x, idx))
chain("full-node MLP fwd+bwd (236k rows)", mlp_fwdbwd(
    lambda i, x_: x_), enc, operands=(x,))

# d. predictor fwd+bwd on 262k pairs
hfix = jax.random.normal(key, (N, H), jnp.float32)


def pred_it(p, i, h_, pi_, pj_):
    def loss(p):
        out = apply_link_predictor(
            p, jnp.take(h_, pi_, axis=0), jnp.take(h_, pj_, axis=0),
            mode="mlp", train=False,
        )
        return jnp.sum(out) * 1e-9

    gr = jax.grad(loss)(p)
    return jax.tree_util.tree_map(lambda a, b: a + 1e-12 * b, p, gr)


chain("predictor mlp fwd+bwd (262k pairs)", pred_it, params["predictor"],
      operands=(hfix, pi, pj))


# e. context sampling alone
def samp_it(v, i, g_, anchors_):
    s = sample_contexts(jax.random.fold_in(key, i), g_, anchors_,
                        ps_method="nb", step=3, hops=2, ns_rate=1)
    return (v[0] * 0.999 + jnp.sum(s) * 1e-12,)


chain(f"sample_contexts (bn={BN})", samp_it, (jnp.float32(0.0),),
      operands=(g, anchors))


# f/g. whole-epoch variants
def timeit(name, **kw):
    mb = kw.pop("minibatch", True)
    epoch_fn, tx = make_student_epoch_fn(
        num_nodes=N, num_pos_edges=E, link_batch_size=BL, node_batch_size=BN,
        predictor_mode="mlp", lr=0.005, neg_mode="uniform", minibatch=mb, **kw,
    )
    p = init_student_params(
        jax.random.PRNGKey(2), in_channels=D, hidden_channels=H,
        num_layers=L, predictor_mode="mlp",
    )
    opt = tx.init(p)
    k = jax.random.PRNGKey(9)
    t0 = time.perf_counter()
    p, opt, loss = epoch_fn(p, opt, k, g, x, t_h, tpred, pos, None)
    _ = float(jnp.sum(loss))
    log(f"  {name}: compile+first {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _i in range(3):
        p, opt, loss = epoch_fn(p, opt, k, g, x, t_h, tpred, pos, None)
    _ = float(jnp.sum(loss))
    dt = (time.perf_counter() - t0) / 3
    log(f"  {name}: {dt * 1e3:.1f} ms/epoch = {E / dt / 1e6:.2f} M edges/s "
        f"({dt / STEPS * 1e3:.2f} ms/step)")
    del p, opt
    return dt


timeit("full LLP fp32 dropout=0 (minibatch)", dropout=0.0, true_label=0.1,
       llp_d=1.0, llp_r=1.0)
timeit("full LLP fp32 dropout=0.5 FULL-BATCH", dropout=0.5, true_label=0.1,
       llp_d=1.0, llp_r=1.0, minibatch=False)
timeit("label-only fp32 dropout=0.5 FULL-BATCH", dropout=0.5, true_label=1.0,
       llp_d=0.0, llp_r=0.0, minibatch=False)
log("DONE")
