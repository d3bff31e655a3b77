"""Migrate reference (snap-research/linkless-link-prediction) pickle artifacts
into this framework's on-disk formats.

A reference user brings their existing ``../data/*.pkl`` splits and
``../saved-models`` / ``../saved-features`` teacher artifacts (SURVEY §1
artifact contract); this converts them into the npz split caches and teacher
checkpoints the llp_tpu drivers consume, so experiments continue on identical
data and identical teacher weights.

    # transductive split (+ the dataset export the split belongs to)
    python -m llp_tpu.cli.import_reference --datasets=cora \
        --split_pkl=.../data/cora.pkl --dataset_npz=.../cora.npz

    # production split (self-contained: the pickle carries the full graph)
    python -m llp_tpu.cli.import_reference --datasets=cora \
        --production_pkl=.../data/cora_production.pkl

    # teacher checkpoint for student distillation
    python -m llp_tpu.cli.import_reference --datasets=cora --encoder=sage \
        --models_pkl=.../saved-models/cora-sage_transductive.pkl \
        --features_pkl=.../saved-features/cora-sage_transductive.pkl
"""

from __future__ import annotations

import argparse
import os
import shutil


def main(argv=None):
    p = argparse.ArgumentParser(description="Import reference pickle artifacts")
    p.add_argument("--datasets", type=str, required=True)
    p.add_argument("--dataset_dir", type=str, default="./data")
    p.add_argument("--save_dir", type=str, default="./saved")
    p.add_argument("--split_pkl", type=str, default=None,
                   help="reference ../data/{ds}.pkl transductive split")
    p.add_argument("--dataset_npz", type=str, default=None,
                   help="matching {ds}.npz dataset export (required with "
                        "--split_pkl: the split cache is fingerprinted "
                        "against its dataset)")
    p.add_argument("--production_pkl", type=str, default=None,
                   help="reference ../data/{ds}_production.pkl 6-tuple")
    p.add_argument("--models_pkl", type=str, default=None,
                   help="reference ../saved-models teacher state-dict pickle")
    p.add_argument("--features_pkl", type=str, default=None,
                   help="reference ../saved-features node-embedding pickle")
    p.add_argument("--encoder", type=str, default="sage",
                   choices=["sage", "gcn", "mlp"])
    p.add_argument("--num_layers", type=int, default=None,
                   help="encoder depth; default: counted off the weights")
    p.add_argument("--conv", type=str, default=None,
                   choices=["sage", "sage_updated"],
                   help="SAGE conv variant for GNN re-encoding; default "
                        "follows the reference's dataset rule (sage_updated "
                        "for coauthor-physics)")
    p.add_argument("--transductive", type=str, default="transductive",
                   choices=["transductive", "production"])
    args = p.parse_args(argv)

    if not (args.split_pkl or args.production_pkl or args.models_pkl):
        p.error("nothing to do: pass --split_pkl, --production_pkl and/or "
                "--models_pkl/--features_pkl")

    from llp_tpu.data.io import (
        dataset_fingerprint,
        save_dataset_npz,
        save_production_split_npz,
        save_split_npz,
    )

    os.makedirs(args.dataset_dir, exist_ok=True)

    if args.split_pkl:
        if not args.dataset_npz:
            p.error("--split_pkl needs --dataset_npz: the imported split is "
                    "fingerprinted against its dataset so the trainers never "
                    "pair it with a different graph")
        import numpy as np

        from llp_tpu.data.import_reference import load_transductive_split_pickle

        with np.load(args.dataset_npz) as z:
            fp = dataset_fingerprint(z["x"], z["edge_index"])
        ds_dst = os.path.join(args.dataset_dir, f"{args.datasets}.npz")
        if os.path.abspath(args.dataset_npz) != os.path.abspath(ds_dst):
            shutil.copyfile(args.dataset_npz, ds_dst)
            print(f"wrote {ds_dst}")
        split = load_transductive_split_pickle(args.split_pkl)
        out = os.path.join(args.dataset_dir, f"{args.datasets}_split.npz")
        save_split_npz(out, split, fingerprint=fp)
        e = {k: split[k]["edge"].shape[0] for k in ("train", "valid", "test")}
        print(f"wrote {out} (train/valid/test positives: "
              f"{e['train']}/{e['valid']}/{e['test']})")

    if args.production_pkl:
        from llp_tpu.data.import_reference import load_production_split_pickle

        ps, full_x, full_ei = load_production_split_pickle(args.production_pkl)
        ds_out = os.path.join(args.dataset_dir, f"{args.datasets}.npz")
        save_dataset_npz(ds_out, full_x, full_ei)
        print(f"wrote {ds_out} (N={full_x.shape[0]}, E={full_ei.shape[1]})")
        out = os.path.join(args.dataset_dir, f"{args.datasets}_production.npz")
        save_production_split_npz(
            out, ps, fingerprint=dataset_fingerprint(full_x, full_ei)
        )
        print(f"wrote {out} (train graph N={ps.training_x.shape[0]} "
              f"E={ps.training_edge_index.shape[1]}; val +/-: "
              f"{ps.val_pos.shape[1]}/{ps.val_neg.shape[1]}; test "
              f"oo/on/nn: {ps.test_old_old.shape[1]}/"
              f"{ps.test_old_new.shape[1]}/{ps.test_new_new.shape[1]})")

    if args.models_pkl or args.features_pkl:
        if not (args.models_pkl and args.features_pkl):
            p.error("teacher import needs BOTH --models_pkl and "
                    "--features_pkl (params + best-val embeddings)")
        from llp_tpu.data.import_reference import import_teacher_checkpoint

        os.makedirs(args.save_dir, exist_ok=True)
        out = os.path.join(
            args.save_dir,
            f"{args.datasets}-{args.encoder}_{args.transductive}",
        )
        meta = import_teacher_checkpoint(
            args.models_pkl,
            args.features_pkl,
            out,
            encoder=args.encoder,
            num_layers=args.num_layers,
            conv=args.conv,
            dataset=args.datasets,
            setting=args.transductive,
        )
        print(f"wrote teacher checkpoint {out} "
              f"(hidden={meta['hidden_channels']}, "
              f"num_layers={meta['num_layers']}, conv={meta['conv']}, "
              f"predictor_layers={meta['predictor_layers']})")


if __name__ == "__main__":
    main()
