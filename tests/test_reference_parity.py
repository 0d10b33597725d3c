"""Parity against the ACTUAL compiled reference binary.

tools/reference_build/build.sh compiles the reference cpu_train_gcn
(read-only tree, scratch-dir patches for its debug exit(0) and hardcoded
ENABLE_GPU, naive-BLAS shims) and tests/goldens/ref_gcn_cora_synth.json
freezes its output on the deterministic synthetic-cora dataset.

Verified facts encoded here:
  * epoch-0 loss/acc and final test accuracy match EXACTLY (forward
    parity with deterministic Glorot init),
  * the float64 oracle (reference semantics, exact arithmetic) matches
    OUR trajectory to 3 decimals on every epoch, while the reference
    binary itself drifts after epoch 1 — f32 accumulation noise pushed
    through Adam's 1/sqrt(v); our divergence from the binary is bounded
    by the binary's own divergence from exact arithmetic.
"""

import json
import os

import numpy as np
import pytest

from graphaibench_tpu.nn import Model, ModelConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "ref_gcn_cora_synth.json")


@pytest.fixture(scope="module")
def synth_cora(tmp_path_factory):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "reference_build"))
    from make_dataset import build
    out = str(tmp_path_factory.mktemp("ds") / "cora")
    build(out)
    from graphaibench_tpu.graph.io import load_gnn_dataset
    return load_gnn_dataset(out)


def test_reference_binary_parity(synth_cora):
    with open(GOLDEN) as f:
        golden = json.load(f)
    ds = synth_cora
    cfg = ModelConfig(arch="gcn", num_layers=2, dim_init=ds.feat_len,
                      dim_hid=16, num_cls=ds.num_classes, lr=0.02)
    model = Model(cfg, ds)
    losses, accs = [], []
    for _ in range(10):
        l, a = model.train_epoch()
        losses.append(l)
        accs.append(a)
    # epoch 0: exact forward parity (same deterministic init)
    assert abs(losses[0] - golden["train_loss"][0]) < 5e-4
    assert abs(accs[0] - golden["train_acc"][0]) < 5e-3
    # trajectory: within the binary's own f32-noise envelope
    for i in range(10):
        assert abs(losses[i] - golden["train_loss"][i]) < 0.08, (i, losses[i])
    # final test accuracy: exact
    assert abs(model.evaluate("test") - golden["test_acc"]) < 5e-3


def test_oracle_matches_our_trajectory(synth_cora):
    """The float64 exact-arithmetic oracle tracks our jax implementation
    (NOT the drifting f32 binary) — 3-decimal agreement for 10 epochs."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from oracle_gnn import GcnOracle
    from graphaibench_tpu.graph import transforms as T
    from graphaibench_tpu.nn.layers import init_params

    ds = synth_cora
    g = T.add_selfloop(ds.graph)
    w = T.gcn_edge_norms(g)
    cfg = ModelConfig(arch="gcn", num_layers=2, dim_init=ds.feat_len,
                      dim_hid=16, num_cls=ds.num_classes, lr=0.02)
    model = Model(cfg, ds)
    params = init_params(cfg)
    oracle = GcnOracle(g, w, cfg.gconv_dims,
                       [np.asarray(p["W_neigh"]) for p in params["gconv"]],
                       cfg.lr, 0, 140, ds.labels, ds.train_mask)
    for i in range(10):
        ours, _ = model.train_epoch()
        exact, _ = oracle.step(np.asarray(ds.feats))
        assert abs(ours - exact) < 2e-3, (i, ours, exact)


@pytest.mark.parametrize("arch,acc_tol", [("sage", 5e-3), ("gat", 1e-2)])
def test_reference_binary_parity_sage_gat(synth_cora, arch, acc_tol):
    """SAGE/GAT vs the compiled reference binaries: epoch-0 exact,
    final test accuracy within tolerance (f32-Adam trajectory noise)."""
    with open(os.path.join(os.path.dirname(GOLDEN),
                           "ref_sage_gat_cora_synth.json")) as f:
        golden = json.load(f)[arch]
    ds = synth_cora
    kw = dict(use_l2norm=True, use_dense=True) if arch == "gat" else {}
    cfg = ModelConfig(arch=arch, num_layers=2, dim_init=ds.feat_len,
                      dim_hid=16, num_cls=ds.num_classes, lr=0.02, **kw)
    model = Model(cfg, ds)
    losses = [model.train_epoch()[0] for _ in range(10)]
    assert abs(losses[0] - golden["train_loss"][0]) < 1e-3
    for i in range(10):
        assert abs(losses[i] - golden["train_loss"][i]) < 0.25, (i, losses[i])
    assert abs(model.evaluate("test") - golden["test_acc"]) < acc_tol


def test_gat_parity_gap_explained(synth_cora):
    """The GAT final-accuracy gap vs the compiled binary (0.899 ours vs
    0.893 binary) is SEMANTIC, not numerical — pinned by a float64
    bisect oracle (GatOracle):

    * reference semantics = partial gradient (gat_aggregator.cpp
      d_aggregate drops the feature->score path, :199 propagates only
      the transposed value path) + per-update-call Adam power schedule
      (optimizer.cpp:33-34): the float64 oracle reproduces the binary's
      10-epoch loss trajectory to print precision and its 0.893 exactly,
      so the binary carries NO material f32 noise here;
    * our semantics = exact full gradient (verified equal to jax
      autodiff at machine epsilon) + per-step Adam: the oracle
      reproduces our Model's trajectory and 0.899 exactly.
    """
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from oracle_gnn import GatOracle
    from graphaibench_tpu.graph import transforms as T
    from graphaibench_tpu.nn.layers import init_params

    with open(os.path.join(os.path.dirname(GOLDEN),
                           "ref_sage_gat_cora_synth.json")) as f:
        golden = json.load(f)["gat"]
    ds = synth_cora
    cfg = ModelConfig(arch="gat", num_layers=2, dim_init=ds.feat_len,
                      dim_hid=16, num_cls=ds.num_classes, lr=0.02,
                      use_l2norm=True, use_dense=True)
    model = Model(cfg, ds)
    ours = [model.train_epoch()[0] for _ in range(10)]
    ours_acc = model.evaluate("test")

    g = T.add_selfloop(ds.graph)
    b, e, _ = ds.train_range
    tb, te, _ = ds.test_range
    params = init_params(cfg)

    ref_o = GatOracle(g, cfg.gconv_dims, params, cfg.lr, b, e, ds.labels,
                      ds.train_mask, full_grad=False, ref_adam_schedule=True)
    ref_losses = [ref_o.step(np.asarray(ds.feats))[0] for _ in range(10)]
    ref_acc = ref_o.accuracy(np.asarray(ds.feats), tb, te, ds.test_mask,
                             ds.labels)
    for i in range(10):   # binary == its float64 oracle (3-decimal prints)
        assert abs(ref_losses[i] - golden["train_loss"][i]) < 1e-3, i
    assert abs(ref_acc - golden["test_acc"]) < 5e-4

    our_o = GatOracle(g, cfg.gconv_dims, params, cfg.lr, b, e, ds.labels,
                      ds.train_mask, full_grad=True, ref_adam_schedule=False)
    our_losses = [our_o.step(np.asarray(ds.feats))[0] for _ in range(10)]
    our_acc = our_o.accuracy(np.asarray(ds.feats), tb, te, ds.test_mask,
                             ds.labels)
    for i in range(10):   # our f32 Model == its float64 oracle
        assert abs(our_losses[i] - ours[i]) < 2e-3, i
    assert abs(our_acc - ours_acc) < 5e-4
