"""Shared CLI plumbing: argparse surfaces mirroring the reference flags
(reference ``src/main.py:239-270``, ``src/train_teacher_gnn.py:271-290``),
plus YAML config loading and device selection."""

from __future__ import annotations

import argparse
import dataclasses


def add_common_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", type=str, default=None, help="YAML config file")
    p.add_argument("--device", type=str, default="auto",
                   help="'auto' (TPU if present), 'cpu', or 'cpu:N' for an "
                        "N-device virtual mesh")
    p.add_argument("--log_steps", type=int, default=1)
    p.add_argument("--encoder", type=str, default="sage",
                   choices=["sage", "gcn", "mlp"])
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--hidden_channels", type=int, default=256)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=0.005)
    p.add_argument("--epochs", type=int, default=20000)
    p.add_argument("--eval_steps", type=int, default=5)
    p.add_argument("--dataset_dir", type=str, default="./data")
    p.add_argument("--datasets", type=str, default="cora")
    p.add_argument("--predictor", type=str, default="mlp", choices=["inner", "mlp"])
    # The reference exposes norm_type only on the model constructors
    # (models.py:14,84); surfaced here as a flag for completeness.
    p.add_argument("--norm_type", type=str, default="none",
                   choices=["none", "layer", "batch"])
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--metric", type=str, default="Hits@20")
    p.add_argument("--use_valedges_as_input", action="store_true")
    p.add_argument(
        "--use_edge_weight", action="store_true",
        help="aggregate with the dataset's per-edge weights (collab's "
             "co-authorship counts): weighted mean for SAGE, weighted "
             "sym-norm for GCN",
    )
    p.add_argument("--transductive", type=str, default="transductive",
                   choices=["transductive", "production"])
    p.add_argument("--minibatch", action="store_true")
    p.add_argument("--results_dir", type=str, default="./results")
    p.add_argument("--save_dir", type=str, default="./saved")
    p.add_argument(
        "--spmm_impl", type=str, default="auto",
        choices=["auto", "xla", "segsum"],
    )
    p.add_argument(
        "--epochs_per_jit", type=int, default=1,
        help="fuse N epochs into one device program (must divide eval_steps)",
    )
    p.add_argument(
        "--compute_dtype", type=str, default="float32",
        choices=["float32", "bfloat16"],
        help="training compute dtype (fp32 master params; eval stays fp32)",
    )
    p.add_argument(
        "--num_devices", type=int, default=1,
        help="data-parallel training over the first N local devices "
             "(shard_map whole-epoch programs; pair with --device cpu:N "
             "for a virtual CPU mesh)",
    )
    p.add_argument(
        "--sharding", type=str, default="dp", choices=["dp", "halo"],
        help="multi-device execution model (with --num_devices > 1): "
             "'dp' replicates node features and shards edges+batches; "
             "'halo' shards the feature matrix by node owner — boundary "
             "exchange for the sage/gcn teacher, owner-sharded "
             "feature/teacher tables for the minibatch student",
    )
    p.add_argument(
        "--reorder", type=str, default="none",
        choices=["none", "locality", "rcm"],
        help="node-id relabel at data-prep time (isomorphism; artifacts "
             "stay in the dataset's original id space): 'locality' groups "
             "low-cut clusters into contiguous id ranges (shrinks halo "
             "exchange volume, clusters SpMM gathers), 'rcm' is reverse "
             "Cuthill-McKee",
    )
    p.add_argument(
        "--reorder_parts", type=int, default=0,
        help="cluster count for --reorder locality (0 = auto: num_devices "
             "when multi-device, else 64)",
    )
    p.add_argument(
        "--checkpoint_every", type=int, default=0,
        help="epochs between train-state snapshots (0 = off)",
    )
    p.add_argument(
        "--resume", action="store_true",
        help="resume from the last train-state snapshot if present",
    )


def setup_device(spec: str) -> None:
    """Honor --device before any jax computation."""
    import jax

    if spec == "auto":
        return
    if spec == "cpu" or spec.startswith("cpu:"):
        import os

        if ":" in spec:
            n = int(spec.split(":")[1])
            flags = os.environ.get("XLA_FLAGS", "")
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={n}".strip()
            )
        jax.config.update("jax_platforms", "cpu")
        return
    raise SystemExit(f"unknown --device {spec!r}")


def config_from_args(cls, args: argparse.Namespace, rename: dict,
                     defaults: dict | None = None):
    """Build a config dataclass from parsed args (+ optional YAML base).

    Precedence: explicit CLI flag > YAML > CLI default. ``defaults`` (the
    parser's own defaults, e.g. ``vars(p.parse_args([]))``) lets untouched
    CLI defaults yield to YAML values — without it every default would
    silently clobber the --config file and the YAML layer would be dead for
    any field that also has a flag.
    """
    names = {f.name for f in dataclasses.fields(cls)}
    d = {}
    if args.config:
        import yaml

        with open(args.config) as f:
            d.update(yaml.safe_load(f) or {})
    for k, v in vars(args).items():
        k2 = rename.get(k, k)
        if k2 not in names:
            continue
        if (
            defaults is not None
            and k2 in d
            and k in defaults
            and v == defaults[k]
        ):
            continue  # flag not set by the user: keep the YAML value
        d[k2] = v
    return cls(**{k: v for k, v in d.items() if k in names})
