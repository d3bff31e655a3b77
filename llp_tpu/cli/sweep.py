"""Hyperparameter sweep driver — the local, W&B-free equivalent of the
reference's 13 sweep YAMLs (reference ``configurations/*.yaml``: random
search maximizing Hits@20 — Hits@50 for collab — over the LLP loss weights,
dropout, walk shape, lr, margin).

The reference's W&B YAMLs load VERBATIM: ``program: main.py`` maps to the
student driver and ``program: train_teacher_gnn.py`` to the teacher
(reference ``configurations/cora_transductive.yaml:89``), parameter names in
the reference spelling (``LLP_D``/``True_label``/...) rename to config
fields, and the ``method``/``metric``/``parameters`` keys are the W&B
vocabulary.  Extensions over the reference format:

    trials: 20                  # sweep length (W&B leaves this to the agent)
    base: {datasets: cora}      # fixed config fields outside the search

Usage:
    python -m llp_tpu.cli.sweep --config configurations/cora_transductive.yaml
    python -m llp_tpu.cli.sweep --config ... --out sweep.json --resume
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random


def sample_params(parameters: dict, rng: random.Random) -> dict:
    out = {}
    for name, spec in parameters.items():
        if "values" in spec:
            out[name] = rng.choice(spec["values"])
        elif "value" in spec:
            out[name] = spec["value"]
        else:
            dist = spec.get("distribution", "uniform")
            lo, hi = spec["min"], spec["max"]
            if dist == "log_uniform":
                # W&B semantics: bounds are IN LOG SPACE (exp(U[lo, hi]));
                # *_values is the value-space variant below.
                out[name] = math.exp(rng.uniform(lo, hi))
            elif dist == "log_uniform_values":
                out[name] = math.exp(rng.uniform(math.log(lo), math.log(hi)))
            elif dist == "int_uniform":
                out[name] = rng.randint(int(lo), int(hi))
            else:
                out[name] = rng.uniform(lo, hi)
    return out


# Reference sweep-YAML parameter names -> our config fields.
_RENAME = {
    "True_label": "true_label",
    "KD_RM": "kd_rm",
    "KD_LM": "kd_lm",
    "LLP_D": "llp_d",
    "LLP_R": "llp_r",
}

# The reference YAMLs name their entry scripts (cora_transductive.yaml:89);
# accept those verbatim alongside our own program names.
_PROGRAM_MAP = {
    "main.py": "student",
    "train_teacher_gnn.py": "teacher",
    "student": "student",
    "teacher": "teacher",
}


def _resolve_program(spec: dict) -> str:
    program = spec.get("program", "student")
    base = os.path.basename(str(program))
    if base not in _PROGRAM_MAP:
        raise ValueError(
            f"unknown sweep program {program!r}; expected one of "
            f"{sorted(_PROGRAM_MAP)}"
        )
    return _PROGRAM_MAP[base]


def trial_config(spec: dict, rng: random.Random):
    """Draw one trial: ``(config, sampled_params, program)``.

    Consumes exactly one trial's worth of the rng stream — resume replays
    completed trials through this to realign the stream.
    """
    import dataclasses

    from llp_tpu.utils.config import StudentConfig, TeacherConfig

    program = _resolve_program(spec)
    cls = StudentConfig if program == "student" else TeacherConfig
    names = {f.name for f in dataclasses.fields(cls)}
    sampled = sample_params(spec.get("parameters", {}), rng)
    sampled = {_RENAME.get(k, k): v for k, v in sampled.items()}
    cfg_kwargs = {
        k: v for k, v in (spec.get("base") or {}).items() if k in names
    }
    cfg_kwargs.update({k: v for k, v in sampled.items() if k in names})
    return cls(**cfg_kwargs), sampled, program


def run_sweep(spec: dict, *, out_path: str | None = None, seed: int = 0,
              max_trials: int | None = None, verbose: bool = True,
              resume: bool = False) -> dict:
    from llp_tpu.train.loop import run_student, run_teacher

    metric = spec.get("metric", {}).get("name", "Hits@20")
    trials = max_trials if max_trials is not None else spec.get("trials", 20)
    rng = random.Random(seed)

    best = None
    history = []
    start = 0
    if resume and out_path and os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        history = prev.get("history", [])
        best = prev.get("best")
        start = len(history)
        # Replay the completed trials' draws so trial i samples the same
        # parameters it would have in an uninterrupted sweep.
        for _ in range(start):
            sample_params(spec.get("parameters", {}), rng)
        if verbose and start:
            print(f"[sweep] resuming at trial {start}/{trials}")

    def _flush():
        if out_path:
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            with open(out_path, "w") as f:
                json.dump({"best": best, "history": history}, f, indent=2)

    for trial in range(start, trials):
        cfg, sampled, program = trial_config(spec, rng)
        runner = run_student if program == "student" else run_teacher
        stats, _ = runner(cfg, verbose=False)
        val = stats.get(metric, {}).get("valid", stats.get(metric, {}).get("val", (0,)))[0]
        test = stats.get(metric, {}).get("test", (0, 0))[0]
        rec = {"trial": trial, "params": sampled, "valid": val, "test": test}
        history.append(rec)
        if best is None or val > best["valid"]:
            best = rec
        if verbose:
            print(
                f"[sweep trial {trial + 1}/{trials}] {metric} valid={val:.2f} "
                f"test={test:.2f} (best valid={best['valid']:.2f})"
            )
        _flush()
    _flush()
    return {"best": best, "history": history}


def main(argv=None):
    import yaml

    p = argparse.ArgumentParser(description="LLP hyperparameter sweep")
    p.add_argument("--config", type=str, required=True, help="sweep spec YAML")
    p.add_argument("--trials", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default=None, help="JSON results path")
    p.add_argument(
        "--resume", action="store_true",
        help="continue a half-finished sweep from --out (replays completed "
             "trials' RNG draws so remaining trials match the uninterrupted "
             "stream)",
    )
    p.add_argument("--device", type=str, default="auto")
    args = p.parse_args(argv)

    from llp_tpu.cli.common import setup_device

    setup_device(args.device)
    with open(args.config) as f:
        spec = yaml.safe_load(f)
    result = run_sweep(
        spec, out_path=args.out, seed=args.seed, max_trials=args.trials,
        resume=args.resume,
    )
    print(json.dumps(result["best"], indent=2))


if __name__ == "__main__":
    main()
