"""Teacher training entry point — the reference ``train_teacher_gnn.py`` CLI.

    python -m llp_tpu.cli.train_teacher --datasets=cora --encoder=sage \
        --transductive=transductive --runs=5
"""

from __future__ import annotations

import argparse

from llp_tpu.cli.common import add_common_flags, config_from_args, setup_device


def main(argv=None):
    p = argparse.ArgumentParser(description="LLP teacher GNN training (TPU)")
    add_common_flags(p)
    p.add_argument("--batch_size", type=int, default=64 * 1024)
    p.add_argument("--runs", type=int, default=5)
    args = p.parse_args(argv)

    setup_device(args.device)

    from llp_tpu.train.loop import run_teacher
    from llp_tpu.utils.config import TeacherConfig

    cfg = config_from_args(
        TeacherConfig, args, rename={}, defaults=vars(p.parse_args([]))
    )
    stats, _ = run_teacher(cfg)
    return stats


if __name__ == "__main__":
    main()
