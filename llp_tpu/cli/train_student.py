"""Student distillation entry point — the reference ``main.py`` CLI.

    python -m llp_tpu.cli.train_student --datasets=cora --LLP_D=1 --LLP_R=1 \
        --True_label=0.1 --runs=10
"""

from __future__ import annotations

import argparse

from llp_tpu.cli.common import add_common_flags, config_from_args, setup_device


def main(argv=None):
    p = argparse.ArgumentParser(description="LLP student MLP distillation (TPU)")
    add_common_flags(p)
    p.add_argument("--link_batch_size", type=int, default=64 * 1024)
    p.add_argument("--node_batch_size", type=int, default=64 * 1024)
    p.add_argument("--runs", type=int, default=10)
    p.add_argument("--True_label", dest="True_label", type=float, default=0.1)
    p.add_argument("--KD_RM", dest="KD_RM", type=float, default=0.0)
    p.add_argument("--KD_LM", dest="KD_LM", type=float, default=0.0)
    p.add_argument("--LLP_D", dest="LLP_D", type=float, default=1.0)
    p.add_argument("--LLP_R", dest="LLP_R", type=float, default=1.0)
    p.add_argument(
        "--llp_r_chunk", type=int, default=0,
        help="LLP_R pair chunk size (0 = materialize all C(C,2) pairs)",
    )
    p.add_argument("--margin", type=float, default=0.1)
    p.add_argument("--rw_step", type=int, default=3)
    p.add_argument("--ns_rate", type=int, default=1)
    p.add_argument("--hops", type=int, default=2)
    p.add_argument("--ps_method", type=str, default="nb", choices=["rw", "nb"])
    args = p.parse_args(argv)

    setup_device(args.device)

    from llp_tpu.train.loop import run_student
    from llp_tpu.utils.config import StudentConfig

    cfg = config_from_args(
        StudentConfig,
        args,
        defaults=vars(p.parse_args([])),
        rename={
            "True_label": "true_label",
            "KD_RM": "kd_rm",
            "KD_LM": "kd_lm",
            "LLP_D": "llp_d",
            "LLP_R": "llp_r",
        },
    )
    stats, _ = run_student(cfg)
    return stats


if __name__ == "__main__":
    main()
