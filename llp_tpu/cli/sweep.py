"""Hyperparameter sweep driver — the local, W&B-free equivalent of the
reference's 13 sweep YAMLs (reference ``configurations/*.yaml``: random
search maximizing Hits@20 — Hits@50 for collab — over the LLP loss weights,
dropout, walk shape, lr, margin; ``program: main.py``).

Sweep spec YAML (same vocabulary as the reference files):

    method: random
    metric: {name: "Hits@20", goal: maximize}
    trials: 20
    program: student            # or teacher
    parameters:
      LLP_D:   {values: [0.0001, 0.001, ..., 1000]}
      lr:      {distribution: log_uniform_values, min: 0.0001, max: 0.05}
      dropout: {values: [0.0, 0.5]}
      ...
    base:                        # fixed config fields
      datasets: cora
      runs: 3

Usage: python -m llp_tpu.cli.sweep --config configs/cora_transductive.yaml
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


def run_sweep(spec: dict, *, out_path: str | None = None, seed: int = 0,
              max_trials: int | None = None, verbose: bool = True) -> dict:
    import dataclasses

    from llp_tpu.train.loop import run_student, run_teacher
    from llp_tpu.utils.config import StudentConfig, TeacherConfig

    program = spec.get("program", "student")
    metric = spec.get("metric", {}).get("name", "Hits@20")
    trials = max_trials if max_trials is not None else spec.get("trials", 20)
    rng = random.Random(seed)

    cls = StudentConfig if program == "student" else TeacherConfig
    names = {f.name for f in dataclasses.fields(cls)}
    base = {k: v for k, v in (spec.get("base") or {}).items() if k in names}

    best = None
    history = []
    for trial in range(trials):
        sampled = sample_params(spec.get("parameters", {}), rng)
        sampled = {_RENAME.get(k, k): v for k, v in sampled.items()}
        cfg_kwargs = dict(base)
        cfg_kwargs.update({k: v for k, v in sampled.items() if k in names})
        cfg = cls(**cfg_kwargs)
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
        if out_path:
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            with open(out_path, "w") as f:
                json.dump({"best": best, "history": history}, f, indent=2)
    return {"best": best, "history": history}


def main(argv=None):
    import yaml

    p = argparse.ArgumentParser(description="LLP hyperparameter sweep")
    p.add_argument("--config", type=str, required=True, help="sweep spec YAML")
    p.add_argument("--trials", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default=None, help="JSON results path")
    p.add_argument("--device", type=str, default="auto")
    args = p.parse_args(argv)

    from llp_tpu.cli.common import setup_device

    setup_device(args.device)
    with open(args.config) as f:
        spec = yaml.safe_load(f)
    result = run_sweep(
        spec, out_path=args.out, seed=args.seed, max_trials=args.trials
    )
    print(json.dumps(result["best"], indent=2))


if __name__ == "__main__":
    main()
