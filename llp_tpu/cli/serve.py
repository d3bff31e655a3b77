"""Serving entry point: load a trained artifact and answer link queries.

No counterpart exists in the reference (it has no inference binary; SURVEY
§1) — this is the deployment surface for the artifacts the training CLIs
produce: the student checkpoint (graph-free MLP — the LLP use case) or a
teacher checkpoint (serves its saved best-val node features).

    # top-K partner retrieval for query nodes
    python -m llp_tpu.cli.serve --checkpoint saved/cora-student_transductive \\
        --datasets cora --topk 10 --queries 0,42,1337

    # score explicit candidate pairs
    python -m llp_tpu.cli.serve --checkpoint saved/cora-student_transductive \\
        --datasets cora --pairs 0:5,3:77

Prints one JSON line per query / pair batch, plus a timing line.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="LLP link-prediction serving (TPU)")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="checkpoint path prefix (no .npz/.json extension)")
    p.add_argument("--datasets", type=str, default="cora")
    p.add_argument("--dataset_dir", type=str, default="./data")
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--topk", type=int, default=0)
    p.add_argument("--queries", type=str, default="",
                   help="comma-separated query node ids for --topk")
    p.add_argument("--pairs", type=str, default="",
                   help="comma-separated src:dst pairs to score")
    p.add_argument("--block", type=int, default=None,
                   help="retrieval tile height (default: auto — tall "
                        "matmul tiles for 'inner' approx, 16384 exact, "
                        "8192 for 'mlp')")
    p.add_argument("--approx", action="store_true",
                   help="retrieve --topk through XLA ApproxTopK (4-5x at "
                        "serving shapes, recall ~0.95-0.98; exact on CPU)")
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="retrieval scoring dtype (fp32 merges; ~2x for the "
                        "'mlp' decoder)")
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8", "int4"],
                   help="store the embedding table per-row quantized: int8 "
                        "= 4x less HBM at ~1pp recall@10 cost (pair scoring "
                        "1.17x, retrieval speed-neutral — "
                        "scripts/bench_quant.py); int4 = packed nibbles, 8x "
                        "less HBM at a larger measured recall cost "
                        "(tests/test_quant.py int4 gates + BASELINE.md)")
    p.add_argument("--reencode", action="store_true",
                   help="GNN checkpoints: re-encode over the dataset's full "
                        "edge set (inductive serving) instead of serving the "
                        "checkpointed best-val features")
    p.add_argument("--port", type=int, default=None,
                   help="run as a persistent HTTP/JSON daemon on this port "
                        "(0 = auto-pick) instead of answering one batch: "
                        "GET /healthz, POST /v1/topk {queries,k}, "
                        "POST /v1/score {pairs}")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--shard", action="store_true",
                   help="daemon mode: node-shard the embedding table across "
                        "all visible devices (per-shard retrieval + exact "
                        "cross-shard merge)")
    p.add_argument("--warmup", type=int, default=0,
                   help="daemon mode: pre-compile the smallest request "
                        "bucket for this k before accepting traffic")
    p.add_argument("--max_queue", type=int, default=8,
                   help="daemon mode: in-flight + waiting requests past "
                        "this bound get an orderly 503")
    p.add_argument("--max_queries", type=int, default=4096,
                   help="per-request topk query cap (bounds the device "
                        "footprint of one request)")
    p.add_argument("--max_pairs", type=int, default=1 << 20,
                   help="per-request score pair cap")
    args = p.parse_args(argv)

    from llp_tpu.cli.common import setup_device

    setup_device(args.device)

    import jax.numpy as jnp
    import numpy as np

    from llp_tpu.data.registry import get_dataset
    from llp_tpu.serve import (
        encode_nodes,
        load_serving_artifacts,
        score_pairs,
        top_k_partners,
    )

    params, feats, meta = load_serving_artifacts(args.checkpoint)
    mode = meta.get("predictor", "mlp")

    t0 = time.perf_counter()
    is_gnn = meta.get("encoder", "mlp") != "mlp"
    if is_gnn and args.reencode:
        # Inductive serving: embed over the dataset's current edge set (new
        # nodes/edges included) — the production-path re-encode (reference
        # train_teacher_gnn.py:190-193) as a deployment operation.
        from llp_tpu.core.graph import build_graph
        from llp_tpu.serve.engine import encode_graph_nodes

        ds = get_dataset(args.dataset_dir, args.datasets)
        graph = build_graph(ds.edge_index, ds.num_nodes)
        h = encode_graph_nodes(
            params["encoder"], graph, jnp.asarray(ds.x),
            encoder=meta.get("encoder", "sage"),
            conv=meta.get("conv", "sage"),
            norm_type=meta.get("norm_type", "none"),
        )
    elif feats is not None and is_gnn:
        # GNN teacher: serve the checkpointed best-val embeddings.
        h = jnp.asarray(feats)
    else:
        if is_gnn:
            raise SystemExit(
                "GNN checkpoint has no saved features — pass --reencode to "
                "embed over the dataset's edge set"
            )
        ds = get_dataset(args.dataset_dir, args.datasets)
        h = encode_nodes(
            params["encoder"], jnp.asarray(ds.x),
            norm_type=meta.get("norm_type", "none"),
        )
    float(h[0, 0])  # force materialization for honest timing
    t_encode = time.perf_counter() - t0

    out = {"checkpoint": args.checkpoint, "nodes": int(h.shape[0]),
           "dim": int(h.shape[1]), "encode_s": round(t_encode, 4)}

    if args.port is not None:
        # Daemon mode: encode once (above), answer queries until killed.
        from llp_tpu.serve.server import (
            ServingState, ShardedServingState, serve_forever,
        )

        if args.shard:
            import jax
            from jax.sharding import Mesh

            devs = jax.devices()
            state = ShardedServingState(
                params["predictor"], h,
                Mesh(np.array(devs), ("data",)),
                mode=mode, block=args.block, approx=args.approx,
                compute_dtype=(jnp.bfloat16
                               if args.compute_dtype == "bfloat16" else None),
                quantize=args.quantize,
                max_queries=args.max_queries, max_pairs=args.max_pairs,
            )
            out["shards"] = len(devs)
        else:
            state = ServingState(
                params["predictor"], h, mode=mode, block=args.block,
                approx=args.approx,
                compute_dtype=(jnp.bfloat16
                               if args.compute_dtype == "bfloat16" else None),
                quantize=args.quantize,
                max_queries=args.max_queries, max_pairs=args.max_pairs,
            )
        # The state owns the (possibly int8-quantized) table now — drop the
        # fp32 encode output so the daemon doesn't pin BOTH copies in device
        # memory for its lifetime (at 10M rows that's 5.1 GB of dead fp32
        # next to the 1.3 GB int8 table the flag was meant to buy).
        del h
        if args.warmup:
            state.warmup(args.warmup)
        print(json.dumps(out), flush=True)
        serve_forever(state, args.host, args.port,
                      max_queue=args.max_queue)
        return out

    # One-shot paths: quantize here (the daemon branch above quantizes inside
    # its ServingState instead — quantizing before the branch kept an unused
    # extra int8 copy alive for the daemon's lifetime).
    table = h
    if args.quantize in ("int8", "int4"):
        from llp_tpu.serve.quant import quantize_table

        table = quantize_table(h, bits=int(args.quantize[3:]))

    if args.topk and args.queries:
        qi = np.array([int(s) for s in args.queries.split(",")], np.int32)
        if qi.size and (qi.min() < 0 or qi.max() >= h.shape[0]):
            raise SystemExit(
                f"--queries out of range: table has {h.shape[0]} nodes "
                f"(got min {qi.min()}, max {qi.max()}); XLA gather would "
                f"silently clamp"
            )
        t0 = time.perf_counter()
        vals, ids = top_k_partners(
            params["predictor"], table, qi, k=args.topk, mode=mode,
            block=args.block, approx=args.approx,
            compute_dtype=(jnp.bfloat16
                           if args.compute_dtype == "bfloat16" else None),
        )
        vals, ids = np.asarray(vals), np.asarray(ids)
        dt = time.perf_counter() - t0
        out["topk_s"] = round(dt, 4)
        out["pairs_scored_per_s"] = round(len(qi) * h.shape[0] / max(dt, 1e-9))
        for r, q in enumerate(qi):
            print(json.dumps({
                "query": int(q),
                "partners": ids[r].tolist(),
                "scores": [round(float(v), 6) for v in vals[r]],
            }))

    if args.pairs:
        se = [s.split(":") for s in args.pairs.split(",")]
        src = np.array([int(a) for a, _ in se], np.int32)
        dst = np.array([int(b) for _, b in se], np.int32)
        both = np.concatenate([src, dst])
        if both.size and (both.min() < 0 or both.max() >= h.shape[0]):
            raise SystemExit(
                f"--pairs out of range: table has {h.shape[0]} nodes "
                f"(got min {both.min()}, max {both.max()})"
            )
        t0 = time.perf_counter()
        scores = np.asarray(
            score_pairs(params["predictor"], table, src, dst, mode=mode)
        )
        out["score_s"] = round(time.perf_counter() - t0, 4)
        print(json.dumps({
            "pairs": [f"{a}:{b}" for a, b in zip(src.tolist(), dst.tolist())],
            "scores": [round(float(v), 6) for v in scores],
        }))

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
