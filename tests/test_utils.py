"""Checkpoint roundtrip, torch weight import parity, logger semantics, config."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from llp_tpu.evaln.logger import ProductionRunLogger, RunLogger
from llp_tpu.models import apply_mlp, init_link_predictor, init_mlp
from llp_tpu.models.predictor import apply_link_predictor
from llp_tpu.train.teacher import init_teacher_params
from llp_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from llp_tpu.utils.config import SplitConfig, StudentConfig, TeacherConfig
from llp_tpu.utils.torch_import import import_link_predictor, import_mlp


def test_checkpoint_roundtrip(tmp_path):
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=8,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"params": params, "features": jnp.ones((4, 16))},
                    meta={"encoder": "sage", "hidden_channels": 16})
    loaded, meta = load_checkpoint(path)
    assert meta["hidden_channels"] == 16
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_mlp_import_activation_parity(rng):
    # Build a torch MLP with the reference's forward, import its weights,
    # check exact activation parity (the BASELINE.md allclose gate).
    torch.manual_seed(0)
    lins = torch.nn.ModuleList(
        [torch.nn.Linear(12, 16), torch.nn.Linear(16, 16), torch.nn.Linear(16, 8)]
    )
    state = {}
    for i, l in enumerate(lins):
        state[f"layers.{i}.weight"] = l.weight
        state[f"layers.{i}.bias"] = l.bias
    params = import_mlp(state, 3)

    x = rng.normal(size=(10, 12)).astype(np.float32)
    t = torch.from_numpy(x)
    for i, l in enumerate(lins):
        t = l(t)
        if i != 2:
            t = torch.relu(t)
    ours = np.asarray(apply_mlp(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, t.detach().numpy(), atol=1e-5)


def test_torch_predictor_import_parity(rng):
    torch.manual_seed(1)
    lins = torch.nn.ModuleList([torch.nn.Linear(16, 16), torch.nn.Linear(16, 1)])
    state = {}
    for i, l in enumerate(lins):
        state[f"lins.{i}.weight"] = l.weight
        state[f"lins.{i}.bias"] = l.bias
    params = import_link_predictor(state, 2)
    hi = rng.normal(size=(6, 16)).astype(np.float32)
    hj = rng.normal(size=(6, 16)).astype(np.float32)
    t = torch.from_numpy(hi) * torch.from_numpy(hj)
    t = torch.relu(lins[0](t))
    t = torch.sigmoid(lins[1](t)).squeeze(-1)
    ours = np.asarray(
        apply_link_predictor(params, jnp.asarray(hi), jnp.asarray(hj), mode="mlp")
    )
    np.testing.assert_allclose(ours, t.detach().numpy(), atol=1e-5)


def test_run_logger_selection():
    # Test-at-argmax-val, mean±std over runs (logger.py:27-41).
    lg = RunLogger(2)
    lg.add_result(0, (0.1, 0.5))
    lg.add_result(0, (0.9, 0.7))  # argmax val -> test 0.7
    lg.add_result(0, (0.8, 0.9))
    lg.add_result(1, (0.5, 0.3))
    lg.add_result(1, (0.6, 0.4))  # argmax -> 0.4
    s = lg.statistics()
    np.testing.assert_allclose(s["test"][0], 100 * (0.7 + 0.4) / 2)
    # torch-style sample std (ddof=1)
    np.testing.assert_allclose(
        s["test"][1], np.std([70.0, 40.0], ddof=1), rtol=1e-6
    )


def test_production_logger_five_tuple():
    lg = ProductionRunLogger(1)
    lg.add_result(0, (0.5, 0.4, 0.3, 0.2, 0.1))
    lg.add_result(0, (0.7, 0.5, 0.4, 0.3, 0.2))
    s = lg.statistics()
    assert abs(s["val"][0] - 70.0) < 1e-6
    assert abs(s["new_new"][0] - 20.0) < 1e-6


def test_config_finalize_metric_override():
    c = StudentConfig(datasets="collab", metric="Hits@20").finalize()
    assert c.metric == "Hits@50"  # main.py:315
    assert c.neg_mode == "uniform"
    assert c.hits_ks == (10, 50, 100)
    c2 = TeacherConfig(datasets="cora", metric="auc").finalize()
    assert c2.metric == "Hits@20"  # main.py:304
    assert c2.neg_mode == "dense"


def test_config_node_batch_coupling():
    # main.py:335: node_batch_size = N / (E / link_B)
    c = StudentConfig(link_batch_size=30)
    assert c.coupled_node_batch_size(100, 75) == int(100 / (75 / 30))


def test_split_config_per_dataset():
    assert SplitConfig.for_dataset("cora").test_ratio == 0.3
    assert SplitConfig.for_dataset("pubmed").test_ratio == 0.1


def test_config_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("datasets: citeseer\nlr: 0.01\nllp_r: 1000\nhops: 1\n")
    c = StudentConfig.from_yaml(str(p), runs=3)
    assert c.datasets == "citeseer" and c.lr == 0.01
    assert c.llp_r == 1000 and c.hops == 1 and c.runs == 3


def test_profiler_trace_context(tmp_path):
    import jax.numpy as jnp

    from llp_tpu.utils.profiling import trace

    d = str(tmp_path / "trace")
    with trace(d):
        _ = float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    import os

    assert os.path.isdir(d)
    with trace(None):  # no-op path
        pass


def test_meter_excludes_compile_windows():
    from llp_tpu.utils.profiling import ThroughputMeter

    m = ThroughputMeter(edges_per_epoch=100)
    m.start_epoch()
    m.end_epoch(2, exclude=True)  # compile-bearing block
    m.start_epoch()
    m.end_epoch(2)
    assert m.summary()["epochs"] == 4
    assert len(m.epoch_times) == 2 and len(m.excluded_times) == 2
    # steady-state mean comes from the non-excluded windows only
    assert m.mean_epoch_s == sum(m.epoch_times) / 2
