"""Benchmark: teacher-GNN training throughput (edges scored / second).

Protocol (mirrors the reference teacher hot loop, train_teacher_gnn.py:21-73):
full-graph 2-layer SAGE forward per link batch, BCE on [positives ; uniform
negatives], per-group clip, Adam.  One epoch scores 2·E edges.  The TPU path
is llp_tpu's jit'd scan-per-epoch program; the baseline is the same math in
plain torch on CPU (the reference's own stack, minus CUDA, which this
environment lacks — the reference itself is CPU-runnable by design).

Prints ONE JSON line:
  {"metric": "teacher_train_edges_per_sec", "value": ..., "unit": "edges/s",
   "vs_baseline": ...}
"""

from __future__ import annotations

import json
import time

import numpy as np

# ---- workload ----------------------------------------------------------------
N_NODES = 20_000
AVG_DEG = 16.0
DIM = 256
HIDDEN = 256
BATCH = 64 * 1024
TPU_EPOCHS = 10
SEED = 7


def build_problem():
    from llp_tpu.data.synthetic import community_features, sbm_graph

    ei, comm = sbm_graph(N_NODES, 16, AVG_DEG, seed=SEED)
    x = community_features(comm, DIM, kind="gauss", seed=SEED)
    return ei.astype(np.int64), x


def bench_tpu(ei: np.ndarray, x: np.ndarray) -> float:
    import jax
    import jax.numpy as jnp

    from llp_tpu.core import build_graph
    from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn

    graph = build_graph(ei, N_NODES)
    xd = jnp.asarray(x)
    e = ei.shape[1]
    pos_edges = jnp.asarray(ei.T.astype(np.int32))
    neg_keys = jnp.zeros((1,), jnp.int32)

    impl = "segsum" if jax.default_backend() in ("tpu", "axon") else "xla"
    if impl == "segsum":
        from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum

        prepare_segsum(graph)

    # One device program runs all TPU_EPOCHS epochs (epoch-level scan):
    # dispatch latency and the layer-1 aggregation hoist amortize across the
    # block — the same `epochs_per_jit` knob the CLI driver exposes.
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="sage",
        predictor_mode="mlp",
        dropout=0.0,
        num_nodes=N_NODES,
        num_pos_edges=e,
        link_batch_size=BATCH,
        neg_mode="uniform",
        lr=0.005,
        spmm_impl=impl,
        epochs_per_call=TPU_EPOCHS,
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=DIM,
        hidden_channels=HIDDEN, num_layers=2, predictor_mode="mlp",
    )
    opt_state = tx.init(params)

    def consume(params, loss):
        # device->host reads; block_until_ready is unreliable on the axon
        # runtime, but a host read cannot complete before the value exists.
        return float(loss[-1]) + float(
            params["encoder"]["convs"][0]["lin_l"]["w"][0, 0]
        )

    def timed(params, opt_state, key0):
        keys = jnp.stack(
            [jax.random.PRNGKey(key0 + i) for i in range(TPU_EPOCHS)]
        )
        t0 = time.perf_counter()
        params, opt_state, losses = epoch_fn(
            params, opt_state, keys, graph, xd, pos_edges, neg_keys,
        )
        consume(params, losses)
        return time.perf_counter() - t0, params, opt_state

    # warmup/compile
    _, params, opt_state = timed(params, opt_state, 1)
    dt, params, opt_state = timed(params, opt_state, 100)
    return 2 * e * TPU_EPOCHS / dt


def bench_torch_cpu(ei: np.ndarray, x: np.ndarray, max_steps: int = 6) -> float:
    """Equivalent teacher step in plain torch (CPU): same model math, same
    batch/negative protocol. Extrapolates from a few steps."""
    import torch

    torch.manual_seed(0)
    n, d, h = N_NODES, DIM, HIDDEN
    e = ei.shape[1]
    src = torch.from_numpy(ei[0])
    dst = torch.from_numpy(ei[1])
    deg = torch.zeros(n).index_add_(0, dst, torch.ones(e)).clamp(min=1.0)
    xt = torch.from_numpy(x)

    lin = lambda i, o: torch.nn.Linear(i, o)
    enc = torch.nn.ModuleDict(
        dict(l1l=lin(d, h), l1r=lin(d, h), l2l=lin(h, h), l2r=lin(h, h))
    )
    pred = torch.nn.Sequential(lin(h, h), torch.nn.ReLU(), lin(h, 1))
    opt = torch.optim.Adam(list(enc.parameters()) + list(pred.parameters()), lr=0.005)
    bce = torch.nn.BCELoss()

    def sage_fwd():
        def conv(feats, ll, lr):
            agg = torch.zeros(n, feats.shape[1]).index_add_(0, dst, feats[src])
            agg = agg / deg[:, None]
            return ll(agg) + lr(feats)

        z = torch.relu(conv(xt, enc["l1l"], enc["l1r"]))
        return conv(z, enc["l2l"], enc["l2r"])

    steps = -(-e // BATCH)
    timed = min(max_steps, steps)
    perm = torch.randperm(e)
    # Per-step timing, best step kept: the 2-core host is intermittently
    # starved by the TPU tunnel process, so a sum-of-steps measurement
    # swings wildly; the FASTEST step is the baseline's honest capability.
    best = float("inf")
    for i in range(timed):
        t0 = time.perf_counter()
        opt.zero_grad()
        z = sage_fwd()
        idx = perm[i * BATCH : (i + 1) * BATCH]
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


def main():
    ei, x = build_problem()
    tpu_eps = bench_tpu(ei, x)
    cpu_eps = bench_torch_cpu(ei, x)
    print(
        json.dumps(
            {
                "metric": "teacher_train_edges_per_sec",
                "value": round(tpu_eps, 1),
                "unit": "edges/s",
                "vs_baseline": round(tpu_eps / cpu_eps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
