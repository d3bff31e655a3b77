"""Production split generator — the reference ``generate_production_split.py``
``__main__`` (reference ``:141-159``), writing the npz artifact both trainers
load.

    python -m llp_tpu.cli.make_production_split --datasets=citeseer
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="Generate a production (unseen-node) split")
    p.add_argument("--datasets", type=str, default="citeseer")
    p.add_argument("--dataset_dir", type=str, default="./data")
    p.add_argument("--seed", type=int, default=234)
    # cora/citeseer default to 0.3/0.3/0.3 like the reference
    # (train_teacher_gnn.py:352-365); others 0.1.
    p.add_argument("--test_ratio", type=float, default=None)
    p.add_argument("--val_node_ratio", type=float, default=None)
    p.add_argument("--val_ratio", type=float, default=None)
    p.add_argument("--old_old_extra_ratio", type=float, default=0.1)
    args = p.parse_args(argv)

    from llp_tpu.data.io import dataset_fingerprint, save_production_split_npz
    from llp_tpu.data.registry import get_dataset
    from llp_tpu.data.splits import do_production_edge_split
    from llp_tpu.utils.config import SplitConfig

    sc = SplitConfig.for_dataset(args.datasets)
    ds = get_dataset(args.dataset_dir, args.datasets)
    ps = do_production_edge_split(
        ds.x,
        ds.edge_index,
        test_ratio=args.test_ratio if args.test_ratio is not None else sc.test_ratio,
        val_node_ratio=args.val_node_ratio
        if args.val_node_ratio is not None
        else sc.val_node_ratio,
        val_ratio=args.val_ratio if args.val_ratio is not None else sc.val_ratio,
        old_old_extra_ratio=args.old_old_extra_ratio,
        seed=args.seed,
    )
    out = os.path.join(args.dataset_dir, f"{args.datasets}_production.npz")
    # Fingerprint so the trainers accept (and never silently replace) it.
    save_production_split_npz(
        out, ps, fingerprint=dataset_fingerprint(ds.x, ds.edge_index)
    )
    print("Datasets Information:")
    print(f"Name:\t{args.datasets}")
    print(f"#Old Nodes:\t{ps.old_nodes.size}")
    print(f"#New Nodes:\t{ps.new_nodes.size}")
    print(f"#Old-Old testing edges:\t{ps.test_old_old.shape[1]}")
    print(f"#Old-New testing edges:\t{ps.test_old_new.shape[1]}")
    print(f"#New-New testing edges:\t{ps.test_new_new.shape[1]}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
