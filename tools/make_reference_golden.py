#!/usr/bin/env python
"""Run the ACTUAL reference code (/root/reference/src) under tools/refshim and
export golden artifacts into tests/golden/ (VERDICT r3 item 1).

Produces:
  tests/golden/data/cora.npz                 the tiny graph (shared with llp_tpu)
  tests/golden/data/cora.pkl                 genuine transductive split pickle
  tests/golden/data/cora_production.pkl      genuine production 6-tuple pickle
  tests/golden/saved-models/*.pkl            genuine teacher checkpoints
  tests/golden/saved-features/*.pkl          genuine teacher feature exports
  tests/golden/results/*.txt                 reference run summaries
  tests/golden/golden_models.npz             fixed-weight per-layer activations
  tests/golden/golden_losses.npz             deterministic 3-step loss trajectories
  tests/golden/golden_eval.npz               Evaluator hits@K + AUC on fixed scores
  tests/golden/golden_meta.json              run metrics parsed from results files

Everything here EXECUTES reference code (runpy / direct calls); nothing is
translated. Regenerate with: python tools/make_reference_golden.py
"""

import json
import os
import re
import runpy
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(ROOT, "tests", "golden")
REF = "/root/reference/src"

sys.path.insert(0, os.path.join(ROOT, "tools", "refshim"))
sys.path.insert(0, REF)

import numpy as np  # noqa: E402
import torch  # noqa: E402

# --- environment-fidelity patches (see refshim README) -----------------------
# The reference hardcodes .to("cuda") in two places and was written for
# torch 1.13 (torch.load defaulted to weights_only=False).
if not torch.cuda.is_available():
    _orig_to = torch.Tensor.to

    def _cpu_to(self, *args, **kwargs):
        def fix(a):
            if isinstance(a, str) and a.startswith("cuda"):
                return "cpu"
            if isinstance(a, torch.device) and a.type == "cuda":
                return torch.device("cpu")
            return a

        args = tuple(fix(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = fix(kwargs["device"])
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _cpu_to

_orig_load = torch.load


def _load_full(*args, **kwargs):
    kwargs.setdefault("weights_only", False)
    return _orig_load(*args, **kwargs)


torch.load = _load_full


def run_entry(path, argv):
    sys.argv = [os.path.basename(path)] + argv
    print(f"\n=== running {os.path.basename(path)} {' '.join(argv)} ===")
    runpy.run_path(path, run_name="__main__")


def main():
    # fresh golden tree
    if os.path.isdir(GOLD):
        shutil.rmtree(GOLD)
    src_cwd = os.path.join(GOLD, "src")
    os.makedirs(src_cwd)
    os.chdir(src_cwd)  # reference writes ../data, ../results, ../saved-*

    teacher_args = [
        "--datasets=cora", "--encoder=sage", "--runs=2", "--epochs=60",
        "--eval_steps=1", "--log_steps=1000",
    ]
    student_args = [
        "--datasets=cora", "--encoder=sage", "--runs=2", "--epochs=40",
        "--eval_steps=1", "--log_steps=1000",
    ]

    # Phases A-D: the reference's two binaries, both settings, end to end.
    run_entry(os.path.join(REF, "train_teacher_gnn.py"), teacher_args)
    run_entry(os.path.join(REF, "main.py"), student_args)
    run_entry(
        os.path.join(REF, "train_teacher_gnn.py"),
        teacher_args + ["--transductive=production"],
    )
    run_entry(
        os.path.join(REF, "main.py"),
        student_args + ["--transductive=production"],
    )
    # Phase E: GCN teacher e2e (genuine cora-gcn_transductive checkpoint +
    # features) and the student MINIBATCH path (main.py:52-144 —
    # train_minibatch with the CPU-feature gather, .to("cuda") patched).
    run_entry(
        os.path.join(REF, "train_teacher_gnn.py"),
        [a if a != "--encoder=sage" else "--encoder=gcn" for a in teacher_args],
    )
    run_entry(os.path.join(REF, "main.py"), student_args + ["--minibatch"])
    # Phase F: the 0.1-ratio production branch (train_teacher_gnn.py:361-364
    # switches test/val_node/val ratios to 0.1 for every dataset except
    # cora/citeseer) — a second genuine production pickle on coauthor-cs;
    # and the student's ps_method='rw' sampler mode (one long walk per
    # anchor instead of concatenated hop-walks, main.py:36-38).
    run_entry(
        os.path.join(REF, "train_teacher_gnn.py"),
        ["--datasets=coauthor-cs", "--encoder=sage", "--runs=1",
         "--epochs=30", "--eval_steps=1", "--log_steps=1000",
         "--transductive=production"],
    )
    run_entry(os.path.join(REF, "main.py"), student_args + ["--ps_method=rw"])
    # Phase G: the COLLAB branch (official-split protocol: shipped
    # valid/test negatives, Hits@{10,50,100}, Hits@50 selection, uniform
    # randint negatives, minibatch student — main.py:306-316,83-84;
    # train_teacher_gnn.py:321-331). The shim PygLinkPropPredDataset also
    # exports the identical graph+split as collab.npz (llp_tpu interchange).
    run_entry(
        os.path.join(REF, "train_teacher_gnn.py"),
        ["--datasets=collab", "--encoder=sage", "--runs=1", "--epochs=40",
         "--eval_steps=1", "--log_steps=1000"],
    )
    run_entry(
        os.path.join(REF, "main.py"),
        ["--datasets=collab", "--encoder=sage", "--runs=1", "--epochs=30",
         "--eval_steps=1", "--log_steps=1000", "--minibatch"],
    )
    shutil.copyfile(
        os.path.join(src_cwd, "dataset", "collab.npz"),
        os.path.join(GOLD, "data", "collab.npz"),
    )

    os.chdir(GOLD)
    export_model_goldens()
    export_loss_goldens()
    export_eval_goldens()
    export_eval_protocol_goldens()
    export_meta()
    shutil.rmtree(src_cwd, ignore_errors=True)
    print("\ngolden artifacts written to", GOLD)


# ----------------------------------------------------------- fixed-weight fwd


def _state_arrays(prefix, module):
    # .copy() is load-bearing: .numpy() is a VIEW of the live parameter, and
    # optimizer steps mutate parameters in place — a view captured "before
    # training" would silently serialize post-training values at savez time.
    return {
        f"{prefix}::sd::{k}": v.detach().numpy().copy()
        for k, v in module.state_dict().items()
    }


def _hooked_forward(module, call, names):
    """Run ``call()`` with forward hooks on the named submodules; returns
    {name: output array}."""
    captured = {}
    handles = []
    mods = dict(module.named_modules())
    for n in names:
        def make(n):
            def hook(_m, _i, out):
                captured[n] = out.detach().numpy()
            return hook
        handles.append(mods[n].register_forward_hook(make(n)))
    out = call()
    for h in handles:
        h.remove()
    return captured, out.detach().numpy()


def export_model_goldens():
    """Per-layer activations of the reference's models under fixed weights on
    a fixed graph (reference code: models.py:6-150, sageconv_updated.py:65-89)."""
    from models import GCN, MLP, SAGE, LinkPredictor
    from sageconv_updated import SAGEConv_updated
    from torch_geometric import seed_everything
    from torch_geometric.nn import SAGEConv

    z = np.load(os.path.join(GOLD, "data", "cora.npz"))
    x = torch.from_numpy(z["x"])
    split = torch.load(os.path.join(GOLD, "data", "cora.pkl"))
    ei = split["train"]["edge"].t()  # the message graph the reference trains on

    out = {"x": z["x"], "edge_index": ei.numpy()}
    D, H = x.size(1), 48

    def add(tag, model, fwd_args, hook_names):
        model.eval()
        with torch.no_grad():
            capt, final = _hooked_forward(model, lambda: model(*fwd_args), hook_names)
        out.update({f"{tag}::act::{k}": v for k, v in capt.items()})
        out[f"{tag}::out"] = final
        out.update(_state_arrays(tag, model))

    seed_everything(7)
    add("mlp_l3", MLP(3, D, H, H, 0.0), (x,), ["layers.0", "layers.1", "layers.2"])
    seed_everything(8)
    add("gcn_l2", GCN(D, H, H, 2, 0.0), (x, ei), ["convs.0", "convs.1"])
    seed_everything(9)
    add("gcn_l3", GCN(D, H, H, 3, 0.0), (x, ei), ["convs.0", "convs.1", "convs.2"])
    seed_everything(10)
    add("sage_l2", SAGE("cora", D, H, H, 2, 0.0, SAGEConv), (x, ei), ["convs.0", "convs.1"])
    seed_everything(11)
    add("sage_l3", SAGE("cora", D, H, H, 3, 0.0, SAGEConv), (x, ei), ["convs.0", "convs.1", "convs.2"])
    seed_everything(12)
    add("sageu_l2", SAGE("cora", D, H, H, 2, 0.0, SAGEConv_updated), (x, ei), ["convs.0", "convs.1"])

    # norm variants of the reference MLP (models.py:27-37): one train-mode
    # pass (batch stats; dropout=0) then the eval-mode pass is the golden
    for tag, ntype in [("mlp_batch_l3", "batch"), ("mlp_layer_l3", "layer")]:
        seed_everything(13)
        m = MLP(3, D, H, H, 0.0, norm_type=ntype)
        m.train()
        with torch.no_grad():
            train_out = m(x).numpy()
        m.eval()
        with torch.no_grad():
            capt, final = _hooked_forward(m, lambda: m(x), ["layers.0", "norms.0", "layers.1", "norms.1", "layers.2"])
        out.update({f"{tag}::act::{k}": v for k, v in capt.items()})
        out[f"{tag}::out"] = final
        out[f"{tag}::train_out"] = train_out
        out.update(_state_arrays(tag, m))

    # predictors on the sage_l2 embedding
    h = torch.from_numpy(out["sage_l2::out"])
    pairs = ei[:, :256]
    out["pred_pairs"] = pairs.numpy()
    for tag, kind in [("pred_mlp", "mlp"), ("pred_inner", "inner")]:
        seed_everything(14)
        p = LinkPredictor(kind, H, H, 1, 2, 0.0)
        p.eval()
        with torch.no_grad():
            s = p(h[pairs[0]], h[pairs[1]]).squeeze(-1).numpy()
        out[f"{tag}::out"] = s
        out.update(_state_arrays(tag, p))

    np.savez_compressed(os.path.join(GOLD, "golden_models.npz"), **out)
    print("golden_models.npz:", len(out), "arrays")


# ------------------------------------------------------------- loss goldens


def export_loss_goldens():
    """Deterministic 3-step loss trajectories from the reference's OWN train
    loops (train_teacher_gnn.py:21-73 and main.py:147-236) with fixed
    negatives/context samples and dropout=0."""
    import train_teacher_gnn as T
    from models import GCN, MLP, SAGE, LinkPredictor
    from sageconv_updated import SAGEConv_updated
    from torch_geometric import seed_everything
    from torch_geometric.data import Data
    from torch_geometric.nn import SAGEConv
    from torch_cluster import random_walk

    z = np.load(os.path.join(GOLD, "data", "cora.npz"))
    x = torch.from_numpy(z["x"])
    split = torch.load(os.path.join(GOLD, "data", "cora.pkl"))
    pos = split["train"]["edge"]  # (E, 2)
    ei = pos.t()
    N, D, H = x.size(0), x.size(1), 64
    E = pos.size(0)

    out = {"x": z["x"], "edge_index": ei.numpy(), "lr": np.float64(0.005)}

    # fixed negatives shared by every trajectory
    seed_everything(100)
    from torch_geometric.utils import negative_sampling as real_neg

    fixed_neg = real_neg(torch.stack([ei[1], ei[0]]), num_nodes=N, num_neg_samples=E, method="dense")
    out["neg_edge"] = fixed_neg.numpy()
    T.negative_sampling = lambda *a, **k: fixed_neg

    data = Data(x=x)
    data.adj_t = ei

    def teacher_traj(tag, model):
        pred = LinkPredictor("mlp", H, H, 1, 2, 0.0)
        seed_everything(200)
        model.reset_parameters()
        pred.reset_parameters()
        opt = torch.optim.Adam(list(model.parameters()) + list(pred.parameters()), lr=0.005)
        torch.manual_seed(123)
        losses = [
            T.train(model, pred, data, split, opt, 1 << 20, tag.split("_")[0] if tag.startswith("gcn") else "sage", "cora", "transductive")
            for _ in range(3)
        ]
        out[f"teacher_{tag}::losses"] = np.array(losses)
        out.update(_state_arrays(f"teacher_{tag}::model", model))
        out.update(_state_arrays(f"teacher_{tag}::pred", pred))
        # state dicts above are POST-step; re-init to export the initial ones
        seed_everything(200)
        model.reset_parameters()
        pred.reset_parameters()
        out.update(_state_arrays(f"teacher_{tag}::model0", model))
        out.update(_state_arrays(f"teacher_{tag}::pred0", pred))

    teacher_traj("sage", SAGE("cora", D, H, H, 2, 0.0, SAGEConv))
    teacher_traj("sageu", SAGE("cora", D, H, H, 2, 0.0, SAGEConv_updated))
    teacher_traj("gcn", GCN(D, H, H, 2, 0.0))

    # ---- student (main.py's module-level train(), extracted by executing the
    # module prefix up to main(); main.py self-executes on import so runpy on
    # the whole file is not an option here)
    src = open(os.path.join(REF, "main.py")).read()
    prefix = src[: src.index("\ndef main(")]
    ns = {}
    exec(compile(prefix, os.path.join(REF, "main.py"), "exec"), ns)

    # fixed context samples from the reference sampler semantics
    seed_everything(101)
    B, rw_step, hops, ns_rate = N, 3, 2, 1
    anchors = torch.arange(N)
    pos_b = None
    for _ in range(rw_step):
        w = random_walk(ei[0], ei[1], anchors, hops, coalesced=False)
        pos_b = w if pos_b is None else torch.cat((pos_b, w[:, 1:]), 1)
    neg_b = torch.randint(0, N, (B, rw_step * hops * ns_rate), dtype=torch.long)
    out["samples_pos"] = pos_b.numpy()
    out["samples_neg"] = neg_b.numpy()

    ns["neighbor_samplers"] = lambda *a, **k: (pos_b, neg_b)
    ns["negative_sampling"] = lambda *a, **k: fixed_neg

    import argparse

    args = argparse.Namespace(
        transductive="transductive", datasets="cora", LLP_D=1.0, LLP_R=1.0,
        True_label=0.1, KD_RM=0.0, KD_LM=0.0, margin=0.1, rw_step=rw_step,
        ns_rate=ns_rate, hops=hops, ps_method="nb", link_batch_size=1 << 20,
        node_batch_size=N, hidden_channels=H, minibatch=False,
    )
    seed_everything(201)
    model = MLP(2, D, H, H, 0.0)
    pred = LinkPredictor("mlp", H, H, 1, 2, 0.0)
    tpred = LinkPredictor("mlp", H, H, 1, 2, 0.0)
    t_h = torch.randn(N, H)
    for p in tpred.parameters():
        p.requires_grad = False
    out["t_h"] = t_h.numpy()
    out.update(_state_arrays("student::model0", model))
    out.update(_state_arrays("student::pred0", pred))
    out.update(_state_arrays("student::tpred", tpred))

    opt = torch.optim.Adam(list(model.parameters()) + list(pred.parameters()), lr=0.005)
    torch.manual_seed(124)
    losses = [
        ns["train"](model, pred, t_h, tpred, data, split, opt, args, torch.device("cpu"))
        for _ in range(3)
    ]
    out["student::losses"] = np.array(losses)

    # Second trajectory with the KD_RM (cosine) and KD_LM (MSE) baselines
    # ACTIVE (main.py:220): node_batch_size=N makes the cosine term's
    # node_perm a full permutation, so the mean is order-invariant and the
    # trajectory stays deterministic.
    args_kd = argparse.Namespace(**{**vars(args), "KD_RM": 0.3, "KD_LM": 0.3})
    seed_everything(202)
    model2 = MLP(2, D, H, H, 0.0)
    pred2 = LinkPredictor("mlp", H, H, 1, 2, 0.0)
    out.update(_state_arrays("student_kd::model0", model2))
    out.update(_state_arrays("student_kd::pred0", pred2))
    opt2 = torch.optim.Adam(
        list(model2.parameters()) + list(pred2.parameters()), lr=0.005
    )
    torch.manual_seed(125)
    losses2 = [
        ns["train"](model2, pred2, t_h, tpred, data, split, opt2, args_kd,
                    torch.device("cpu"))
        for _ in range(3)
    ]
    out["student_kd::losses"] = np.array(losses2)

    np.savez_compressed(os.path.join(GOLD, "golden_losses.npz"), **out)
    print("golden_losses.npz:", {k: v for k, v in out.items() if k.endswith("losses")})


# ------------------------------------------------------------- eval goldens


def export_eval_goldens():
    from ogb.linkproppred import Evaluator
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(5)
    pos = torch.from_numpy((rng.random(400) * 0.9 + 0.1).astype(np.float32))
    neg = torch.from_numpy((rng.random(600) * 0.8).astype(np.float32))
    ev = Evaluator("ogbl-ddi")
    out = {"pos": pos.numpy(), "neg": neg.numpy()}
    for K in (10, 20, 30, 50, 700):
        ev.K = K
        out[f"hits@{K}"] = np.float64(ev.eval({"y_pred_pos": pos, "y_pred_neg": neg})[f"hits@{K}"])
    y = np.concatenate([np.ones(400), np.zeros(600)])
    s = np.concatenate([pos.numpy(), neg.numpy()])
    out["auc"] = np.float64(roc_auc_score(y, s))
    np.savez_compressed(os.path.join(GOLD, "golden_eval.npz"), **out)


def export_eval_protocol_goldens():
    """EXACT evaluation-protocol goldens: the reference's own
    ``test_transductive`` / ``test_production`` (train_teacher_gnn.py:76-268)
    driven with the GENUINE saved checkpoints in eval mode — deterministic,
    so llp_tpu's evaluators must reproduce every Hits@K/AUC number."""
    import argparse

    import train_teacher_gnn as T
    from models import SAGE, LinkPredictor
    from ogb.linkproppred import Evaluator
    from torch_geometric.data import Data
    from torch_geometric.nn import SAGEConv

    out = {}
    z = np.load(os.path.join(GOLD, "data", "cora.npz"))
    x = torch.from_numpy(z["x"])
    D, H = x.size(1), 256
    ev = Evaluator("ogbl-ddi")

    def load_pair(tag):
        blob = torch.load(os.path.join(GOLD, "saved-models", f"cora-sage_{tag}.pkl"))
        model = SAGE("cora", D, H, H, 2, 0.0, SAGEConv)
        model.load_state_dict(blob["gnn"])
        pred = LinkPredictor("mlp", H, H, 1, 2, 0.0)
        pred.load_state_dict(blob["predictor"])
        model.eval()
        pred.eval()
        return model, pred

    # transductive protocol
    split = torch.load(os.path.join(GOLD, "data", "cora.pkl"))
    model, pred = load_pair("transductive")
    data = Data(x=x)
    data.adj_t = split["train"]["edge"].t()
    args = argparse.Namespace(minibatch=False)
    with torch.no_grad():
        results, h = T.test_transductive(
            model, pred, data, split, ev, 1 << 16, "sage", "cora", args
        )
    for k, v in results.items():
        out[f"trans::{k}"] = np.asarray(v, np.float64)
    out["trans::h"] = h.detach().numpy()

    # production protocol (5-tuples vs the shared negative set)
    model_p, pred_p = load_pair("production")
    tr_d, val_d, inf_d, _, bundle, negs = torch.load(
        os.path.join(GOLD, "data", "cora_production.pkl")
    )
    with torch.no_grad():
        results_p, h_p = T.test_production(
            model_p, pred_p, val_d, inf_d, bundle, negs, ev, 1 << 16,
            "sage", "cora",
        )
    for k, v in results_p.items():
        out[f"prod::{k}"] = np.asarray(v, np.float64)
    out["prod::h_val"] = h_p.detach().numpy()

    # collab protocol: Ks {10,50,100} against the SHIPPED negatives
    # (train_teacher_gnn.py:132-145), graph+split from the shim's npz export
    z_c = np.load(os.path.join(GOLD, "data", "collab.npz"))
    blob_c = torch.load(
        os.path.join(GOLD, "saved-models", "collab-sage_transductive.pkl")
    )
    D_c = z_c["x"].shape[1]
    model_c = SAGE("collab", D_c, 256, 256, 2, 0.0, SAGEConv)
    model_c.load_state_dict(blob_c["gnn"])
    pred_c = LinkPredictor("mlp", 256, 256, 1, 2, 0.0)
    pred_c.load_state_dict(blob_c["predictor"])
    model_c.eval()
    pred_c.eval()
    split_c = {
        part: {
            kk.split("__", 2)[2]: torch.from_numpy(z_c[kk])
            for kk in z_c.files
            if kk.startswith(f"split__{part}__")
        }
        for part in ("train", "valid", "test")
    }
    data_c = Data(x=torch.from_numpy(z_c["x"]))
    data_c.adj_t = torch.from_numpy(z_c["edge_index"])
    with torch.no_grad():
        results_c, h_c = T.test_transductive(
            model_c, pred_c, data_c, split_c, ev, 1 << 16, "sage", "collab",
            args,
        )
    for k, v in results_c.items():
        out[f"collab::{k}"] = np.asarray(v, np.float64)
    out["collab::h"] = h_c.detach().numpy()

    np.savez_compressed(os.path.join(GOLD, "golden_eval_protocol.npz"), **out)
    print("golden_eval_protocol.npz:",
          {k: out[k].tolist() for k in ("trans::AUC", "prod::AUC", "collab::AUC")})


# --------------------------------------------------------------------- meta


def export_meta():
    """Parse the appended results files into per-RUN entries.

    A results file holds one ``Namespace(...)`` header + one ``All runs:``
    block per reference invocation (several runs share a file — e.g. the
    sage AND gcn teachers both append to cora_supervised_transductive.txt);
    each run is recorded with enough of its argument string to select on.
    """
    meta = {"graph": "cora tiny (refshim SBM, N=300)", "runs": []}
    resdir = os.path.join(GOLD, "results")
    for fn in sorted(os.listdir(resdir)):
        txt = open(os.path.join(resdir, fn)).read()
        segments = re.split(r"(?=Namespace\()", txt)
        for seg in segments:
            if not seg.startswith("Namespace("):
                continue
            entries = {}
            for m in re.finditer(r"(Hits@\d+|AUC):\nTest: ([\d.]+) ± ([\d.]+|nan)", seg):
                entries[m.group(1)] = {
                    "test_mean": float(m.group(2)),
                    "test_std": float(m.group(3)),
                }
            for m in re.finditer(
                r"(Hits@\d+|AUC):\n\s*Final val: ([\d.]+) ± ([\d.]+|nan)\s*Final Test: ([\d.]+) ± ([\d.]+|nan)\s*"
                r"Final old_old: ([\d.]+) ± ([\d.]+|nan)\s*Final old_new: ([\d.]+) ± ([\d.]+|nan)\s*Final new_new: ([\d.]+) ± ([\d.]+|nan)",
                seg,
            ):
                entries[m.group(1)] = {
                    "val_mean": float(m.group(2)), "test_mean": float(m.group(4)),
                    "old_old_mean": float(m.group(6)), "old_new_mean": float(m.group(8)),
                    "new_new_mean": float(m.group(10)),
                }
            if entries:
                ps = re.search(r"ps_method='(\w+)'", seg)
                meta["runs"].append({
                    "file": fn,
                    "args": seg[: seg.index(")") + 1],
                    "minibatch": "minibatch=True" in seg,
                    "encoder": re.search(r"encoder='(\w+)'", seg).group(1),
                    "ps_method": ps.group(1) if ps else None,
                    "metrics": entries,
                })
    with open(os.path.join(GOLD, "golden_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("golden_meta.json runs:",
          [(r["file"], r["encoder"], r["minibatch"]) for r in meta["runs"]])


if __name__ == "__main__":
    main()
