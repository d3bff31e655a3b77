"""One-command real-data parity harness.

Scans the dataset directory for REAL datasets (any of the four raw formats
the registry parses, or ``{name}.npz`` exports), runs the reference's blessed
teacher + student recipes on each, and emits a Table-2/3-shaped report
(mean±std over runs, test-at-argmax-val selection, split provenance) to
``<results_dir>/parity_report_<setting>.{json,md}``.

This is the "drop the downloads in, get a parity report" command the paper
workflow implies but the reference never ships — its closest analogue is
running ``scripts/LLP_transductive.sh`` / ``scripts/supervised_*.sh`` by hand
and diffing ``../results/*.txt`` against the paper's Tables 2/3 (reference
``scripts/LLP_transductive.sh:1-15``, ``scripts/supervised_transductive.sh:
1-17``, selection protocol ``src/logger.py:27-41``).

    python -m llp_tpu.cli.parity --dataset_dir ./data            # all found
    python -m llp_tpu.cli.parity --datasets cora,collab --setting transductive

Synthetic stand-ins are SKIPPED by default (their numbers are not comparable
to the paper); pass ``--include_synthetic`` for offline smoke runs.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

# The 8 datasets of the reference's experiment grid (Tables 2/3).
ALL_DATASETS = (
    "cora", "citeseer", "pubmed", "coauthor-cs", "coauthor-physics",
    "amazon-computers", "amazon-photos", "collab",
)

# Teacher recipes — reference scripts/supervised_transductive.sh:1-17 and
# supervised_production.sh:1-7 (sage encoder, runs=10; only lr / num_layers
# deviate from argparse defaults).
TEACHER_RECIPES = {
    "transductive": {
        "cora": dict(lr=0.005),
        "citeseer": dict(lr=0.005),
        "pubmed": dict(lr=0.005),
        "coauthor-cs": dict(lr=0.005),
        "coauthor-physics": dict(lr=0.005),
        "amazon-photos": dict(lr=0.001),
        "amazon-computers": dict(lr=0.001),
        "collab": dict(lr=0.005, num_layers=3),
    },
    "production": {
        "cora": dict(),
        "citeseer": dict(),
        "pubmed": dict(),
        "coauthor-cs": dict(),
        "coauthor-physics": dict(),
        "amazon-computers": dict(lr=0.001),
        "amazon-photos": dict(lr=0.001),
        # no collab production recipe in the reference (never run there)
    },
}

# Student (LLP) recipes — reference scripts/LLP_transductive.sh:1-15 and
# LLP_production.sh:1-7, flag names mapped to StudentConfig fields.
STUDENT_RECIPES = {
    "transductive": {
        "cora": dict(llp_d=0.001, llp_r=1.0, true_label=0.1, dropout=0.5,
                     hops=2, lr=0.01, margin=0.1, ns_rate=1, rw_step=3),
        "citeseer": dict(llp_d=0.001, llp_r=1000.0, true_label=0.001,
                         dropout=0.5, hops=1, lr=0.01, margin=0.1, ns_rate=4,
                         rw_step=3),
        "pubmed": dict(llp_d=0.1, llp_r=0.1, true_label=0.0001, dropout=0.0,
                       hops=3, lr=0.01, margin=0.05, ns_rate=5, rw_step=5),
        "coauthor-cs": dict(llp_d=100.0, llp_r=0.1, true_label=10.0,
                            dropout=0.0, hops=3, lr=0.001, margin=0.1,
                            ns_rate=4, rw_step=3),
        "coauthor-physics": dict(llp_d=1.0, llp_r=1.0, true_label=1.0,
                                 dropout=0.0, hidden_channels=512, hops=15,
                                 lr=0.001, margin=0.05, ns_rate=3,
                                 num_layers=2, rw_step=1, minibatch=True),
        "amazon-photos": dict(llp_d=1.0, llp_r=1.0, true_label=1.0,
                              dropout=0.0, hidden_channels=256, hops=15,
                              lr=0.001, margin=0.05, ns_rate=10, num_layers=2,
                              rw_step=3, minibatch=True),
        "amazon-computers": dict(llp_d=1.0, llp_r=1.0, true_label=1.0,
                                 dropout=0.0, hidden_channels=512, hops=5,
                                 lr=0.0005, margin=0.05, ns_rate=5,
                                 num_layers=2, rw_step=2, minibatch=True),
        "collab": dict(llp_d=1.0, llp_r=0.0, true_label=1.0, dropout=0.0,
                       hidden_channels=1024, hops=3, lr=0.001, margin=0.01,
                       ns_rate=3, num_layers=3, rw_step=3, minibatch=True),
    },
    "production": {
        "cora": dict(llp_d=0.001, llp_r=0.01, true_label=1000.0, dropout=0.5,
                     hops=3, lr=0.01, margin=0.05, ns_rate=3, rw_step=3),
        "citeseer": dict(llp_d=0.0, llp_r=0.0001, true_label=100.0,
                         dropout=0.5, hops=1, lr=0.01, margin=0.1, ns_rate=5,
                         rw_step=3),
        "pubmed": dict(llp_d=0.01, llp_r=0.001, true_label=0.0001,
                       dropout=0.0, hops=3, lr=0.01, margin=0.2, ns_rate=5,
                       rw_step=3),
        "coauthor-cs": dict(llp_d=10.0, llp_r=100.0, true_label=1.0,
                            dropout=0.0, hops=1, lr=0.001, margin=0.1,
                            ns_rate=4, rw_step=3),
        "coauthor-physics": dict(llp_d=10.0, llp_r=0.01, true_label=0.1,
                                 dropout=0.0, hops=2, lr=0.0005, margin=0.2,
                                 ns_rate=4, rw_step=2),
        "amazon-computers": dict(llp_d=0.0, llp_r=0.1, true_label=0.01,
                                 dropout=0.0, hops=2, lr=0.001, margin=0.2,
                                 ns_rate=4, rw_step=2),
        "amazon-photos": dict(llp_d=0.0001, llp_r=1000.0, true_label=100.0,
                              dropout=0.0, hops=2, lr=0.001, margin=0.05,
                              ns_rate=2, rw_step=3),
    },
}


def discover_datasets(dataset_dir: str, include_synthetic: bool = False):
    """Probe the registry for each reference dataset; returns
    ``{name: Dataset}`` for the ones that resolve to REAL data (any loader
    format), plus a skip list of ``(name, reason)``."""
    from llp_tpu.data.registry import get_dataset

    found, skipped = {}, []
    for name in ALL_DATASETS:
        try:
            ds = get_dataset(dataset_dir, name)
        except Exception as exc:  # unreadable artifact: report, keep going
            skipped.append((name, f"load error: {exc}"))
            continue
        if ds.synthetic and not include_synthetic:
            skipped.append((name, "only a synthetic stand-in (no real data)"))
            continue
        found[name] = ds
    return found, skipped


def _filtered(cls, base: dict):
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in base.items() if k in names}


def run_parity(
    *,
    dataset_dir: str,
    datasets=None,
    setting: str = "transductive",
    results_dir: str = "./results",
    save_dir: str = "./saved",
    include_synthetic: bool = False,
    overrides: dict | None = None,
    verbose: bool = True,
) -> dict:
    """Run the blessed teacher+student recipe per discovered dataset and
    write the parity report.  ``overrides`` (runs/epochs/patience/...) apply
    to BOTH configs — use them to shrink smoke runs; leave empty for the
    paper protocol."""
    from llp_tpu.train.loop import run_student, run_teacher
    from llp_tpu.utils.config import StudentConfig, TeacherConfig

    if setting not in TEACHER_RECIPES:
        raise ValueError(f"setting must be transductive|production, got {setting!r}")
    overrides = overrides or {}
    found, skipped = discover_datasets(dataset_dir, include_synthetic)
    if datasets is not None:
        missing = [d for d in datasets if d not in found]
        for m in missing:
            if not any(s[0] == m for s in skipped):
                skipped.append((m, "not found"))
        found = {k: v for k, v in found.items() if k in datasets}

    report = {
        "setting": setting,
        "dataset_dir": os.path.abspath(dataset_dir),
        "generated_unix": time.time(),
        "skipped": [{"dataset": n, "reason": r} for n, r in skipped],
        "entries": [],
    }
    for name, ds in found.items():
        if name not in TEACHER_RECIPES[setting] or name not in STUDENT_RECIPES[setting]:
            report["skipped"].append(
                {"dataset": name,
                 "reason": f"no blessed {setting} recipe in the reference"}
            )
            continue
        provenance = (
            ds.split_name
            if (setting == "transductive" and ds.split_name)
            else ("do_edge_split:seed=234" if setting == "transductive"
                  else "do_production_edge_split:seed=234")
        )
        common = dict(
            datasets=name, dataset_dir=dataset_dir, transductive=setting,
            results_dir=results_dir, save_dir=save_dir,
        )
        t_kwargs = dict(common, **TEACHER_RECIPES[setting][name])
        t_kwargs.update(_filtered(TeacherConfig, overrides))
        t_cfg = TeacherConfig(**_filtered(TeacherConfig, t_kwargs))
        if verbose:
            print(f"[parity:{setting}] {name}: teacher ({t_cfg.runs} runs)")
        t0 = time.time()
        t_stats, _ = run_teacher(t_cfg, verbose=False)
        t_secs = time.time() - t0

        s_kwargs = dict(common, **STUDENT_RECIPES[setting][name])
        s_kwargs.update(_filtered(StudentConfig, overrides))
        s_cfg = StudentConfig(**_filtered(StudentConfig, s_kwargs))
        if verbose:
            print(f"[parity:{setting}] {name}: student ({s_cfg.runs} runs)")
        t0 = time.time()
        s_stats, _ = run_student(s_cfg, verbose=False)
        s_secs = time.time() - t0

        report["entries"].append(
            {
                "dataset": name,
                "metric": t_cfg.metric,
                "split": provenance,
                "synthetic_standin": bool(ds.synthetic),
                "teacher": {"runs": t_cfg.runs, "stats": t_stats,
                            "seconds": round(t_secs, 1)},
                "student": {"runs": s_cfg.runs, "stats": s_stats,
                            "seconds": round(s_secs, 1)},
            }
        )
        if verbose:
            m = t_cfg.metric
            print(
                f"[parity:{setting}] {name}: teacher {m} "
                f"{_fmt(t_stats.get(m))} | student {m} {_fmt(s_stats.get(m))}"
            )

    os.makedirs(results_dir, exist_ok=True)
    json_path = os.path.join(results_dir, f"parity_report_{setting}.json")
    with open(json_path, "w") as f:
        json.dump(report, f, indent=2)
    md_path = os.path.join(results_dir, f"parity_report_{setting}.md")
    with open(md_path, "w") as f:
        f.write(render_markdown(report))
    report["json_path"], report["md_path"] = json_path, md_path
    if verbose:
        print(f"[parity] report: {json_path} / {md_path}")
    return report


def _fmt(stat) -> str:
    """'mean±std' ×100, the paper's table convention (logger.py:30)."""
    if not stat or "test" not in stat:
        return "-"
    m, s = stat["test"]
    return f"{100 * m:.2f}±{100 * s:.2f}"


def render_markdown(report: dict) -> str:
    """Table-2 (transductive) / Table-3 (production buckets) shaped view."""
    setting = report["setting"]
    lines = [
        f"# LLP parity report — {setting}",
        "",
        f"dataset_dir: `{report['dataset_dir']}`",
        "",
    ]
    if setting == "transductive":
        lines += [
            "| dataset | metric | teacher (GNN) | student (LLP) | AUC teacher | AUC student | runs (T/S) | split |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for e in report["entries"]:
            t, s = e["teacher"], e["student"]
            lines.append(
                f"| {e['dataset']}{' (standin)' if e['synthetic_standin'] else ''} "
                f"| {e['metric']} | {_fmt(t['stats'].get(e['metric']))} "
                f"| {_fmt(s['stats'].get(e['metric']))} "
                f"| {_fmt(t['stats'].get('AUC'))} | {_fmt(s['stats'].get('AUC'))} "
                f"| {t['runs']}/{s['runs']} | {e['split']} |"
            )
    else:
        buckets = ("test", "old_old", "old_new", "new_new")
        lines += [
            "| dataset | metric | who | " + " | ".join(buckets) + " | runs | split |",
            "|---|---|---|" + "---|" * len(buckets) + "---|---|",
        ]

        def _bucket_fmt(stats, metric, b):
            st = stats.get(metric) or {}
            if b not in st:
                return "-"
            m, s = st[b]
            return f"{100 * m:.2f}±{100 * s:.2f}"

        for e in report["entries"]:
            for who in ("teacher", "student"):
                st = e[who]["stats"]
                row = " | ".join(
                    _bucket_fmt(st, e["metric"], b) for b in buckets
                )
                lines.append(
                    f"| {e['dataset']}{' (standin)' if e['synthetic_standin'] else ''} "
                    f"| {e['metric']} | {who} | {row} | {e[who]['runs']} "
                    f"| {e['split']} |"
                )
    if report["skipped"]:
        lines += ["", "## Skipped", ""]
        for s in report["skipped"]:
            lines.append(f"- {s['dataset']}: {s['reason']}")
    return "\n".join(lines) + "\n"


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Run the blessed LLP recipes on every real dataset found "
                    "and emit a Table-2/3-shaped parity report"
    )
    p.add_argument("--dataset_dir", type=str, default="./data")
    p.add_argument("--datasets", type=str, default="",
                   help="comma-separated subset (default: every real dataset found)")
    p.add_argument("--setting", type=str, default="transductive",
                   choices=["transductive", "production", "both"])
    p.add_argument("--results_dir", type=str, default="./results")
    p.add_argument("--save_dir", type=str, default="./saved")
    p.add_argument("--include_synthetic", action="store_true",
                   help="also run on synthetic stand-ins (offline smoke; "
                        "numbers NOT comparable to the paper)")
    p.add_argument("--runs", type=int, default=None,
                   help="override the reference run count (10)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--patience", type=int, default=None)
    p.add_argument("--eval_steps", type=int, default=None)
    p.add_argument("--epochs_per_jit", type=int, default=None)
    p.add_argument("--device", type=str, default="auto")
    args = p.parse_args(argv)

    from llp_tpu.cli.common import setup_device

    setup_device(args.device)
    overrides = {
        k: getattr(args, k)
        for k in ("runs", "epochs", "patience", "eval_steps", "epochs_per_jit")
        if getattr(args, k) is not None
    }
    datasets = [d for d in args.datasets.split(",") if d] or None
    settings = (
        ["transductive", "production"] if args.setting == "both"
        else [args.setting]
    )
    for setting in settings:
        run_parity(
            dataset_dir=args.dataset_dir, datasets=datasets, setting=setting,
            results_dir=args.results_dir, save_dir=args.save_dir,
            include_synthetic=args.include_synthetic, overrides=overrides,
        )


if __name__ == "__main__":
    main()
