"""Data-parallel GraphSAINT (parallel/dp_saint.py): one DP step over a
P-device mesh equals the serial mean-gradient step on the same P
subgraphs, and training converges on citeseer. The reference analog is
the OMP-parallel multi-subgraph sampler (net.cpp:159, 288-358)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from conftest import fixture_path

from graphaibench_tpu.graph import load_gnn_dataset
from graphaibench_tpu.nn import Model, ModelConfig, apply_model
from graphaibench_tpu.nn.model import pad_subgraph
from graphaibench_tpu.nn.sampler import SaintSampler
from graphaibench_tpu.ops import math as gmath
from graphaibench_tpu.ops.device_graph import DeviceGraph
from graphaibench_tpu.parallel.dp_saint import (
    DATA_AXIS,
    _stack_batch,
    train_sampled_dp,
)


def _citeseer_ds(feat=16):
    ds = load_gnn_dataset(fixture_path("citeseer"), synth_feat_len=feat)
    rng = np.random.default_rng(1)
    centers = rng.standard_normal(
        (ds.num_classes, ds.feat_len)).astype(np.float32)
    ds.feats = (ds.feats + centers[ds.labels % ds.num_classes]
                + 0.3 * rng.standard_normal(ds.feats.shape).astype(np.float32))
    nv = ds.graph.nv
    ds.train_range, ds.val_range, ds.test_range = (
        (0, 1500, 1500), (1500, 2300, 800), (2312, 3312, 1000))
    for name, r in (("train_mask", ds.train_range),
                    ("val_mask", ds.val_range),
                    ("test_mask", ds.test_range)):
        m = np.zeros(nv, dtype=np.uint8)
        m[r[0]:r[1]] = 1
        setattr(ds, name, m)
    return ds


def _serial_dp_step(model, n_rep, subg_size, n_pad, e_pad, seed):
    """The expected result of ONE DP step, computed without the mesh:
    sample the same P subgraphs (same seed arithmetic as
    train_sampled_dp), average their per-subgraph gradients, one
    optimizer update."""
    sampler = SaintSampler(model.data.graph, model.training.host,
                           model.data.train_mask)
    feats_np = np.asarray(model.data.feats)
    labels_np = np.asarray(model.data.labels)
    batch = [
        pad_subgraph(sampler, model.cfg.arch, subg_size, seed + r,
                     n_pad, e_pad, feats_np, labels_np)
        for r in range(n_rep)
    ]
    d, e_pad = _stack_batch(batch, n_pad)

    def one_loss(params, r):
        dg = DeviceGraph(
            row_ptr=jnp.zeros(n_pad + 1, jnp.int32),
            col_idx=jnp.asarray(d["cd"][r]),
            edge_src=jnp.asarray(d["es"][r]),
            deg=jnp.asarray(d["deg"][r]),
            trans_perm=jnp.asarray(d["tp"][r]),
            ell=(), nv=n_pad, ne=e_pad,
        )
        logits = apply_model(model.cfg, params, dg, jnp.asarray(d["ww"][r]),
                             jnp.asarray(d["x"][r]), train=True)
        probs = jax.nn.softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(jnp.asarray(d["lab"][r]), logits.shape[-1],
                                dtype=logits.dtype)
        valid = jnp.asarray(d["valid"][r])
        ce = jnp.where(valid, gmath.cross_entropy(onehot, probs), 0.0)
        return jnp.sum(ce) / jnp.float32(d["denom"][r])

    grads = [jax.grad(one_loss)(model.params, r) for r in range(n_rep)]
    mean_grads = jax.tree.map(
        lambda *g: sum(g[1:], g[0]) / n_rep, *grads)
    return model.opt.update(mean_grads, model.opt_state, model.params)


@pytest.mark.parametrize("arch", ["gcn", "gat"])
def test_dp_step_equals_serial_mean_gradient(arch):
    ds = _citeseer_ds()
    cfg = ModelConfig(arch=arch, num_layers=2, dim_init=ds.feat_len,
                      dim_hid=8, num_cls=ds.num_classes, lr=0.02)
    n_rep, subg_size, seed = 4, 200, 7
    mesh = Mesh(np.asarray(jax.devices()[:n_rep]), (DATA_AXIS,))

    model = Model(cfg, ds)
    n_pad = -(-subg_size // 8) * 8
    host = model.training.host
    avg_deg = max(host.ne // max(host.nv, 1), 1)
    e_pad = -(-(n_pad * (avg_deg + 2)) // 64) * 64
    exp_params, exp_opt = _serial_dp_step(
        model, n_rep, subg_size, n_pad, e_pad, seed)

    model2 = Model(cfg, ds)   # fresh identical init
    train_sampled_dp(model2, 1, subg_size, mesh=mesh, seed=seed,
                     verbose=False)

    for got, want in zip(jax.tree.leaves(model2.params),
                         jax.tree.leaves(exp_params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)
    for got, want in zip(jax.tree.leaves(model2.opt_state),
                         jax.tree.leaves(exp_opt)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)


def test_dp_training_converges_citeseer():
    ds = _citeseer_ds()
    cfg = ModelConfig(arch="gcn", num_layers=2, dim_init=ds.feat_len,
                      dim_hid=16, num_cls=ds.num_classes, lr=0.02)
    mesh = Mesh(np.asarray(jax.devices()), (DATA_AXIS,))
    model = Model(cfg, ds)
    first = model.evaluate("test")
    train_sampled_dp(model, 25, 400, mesh=mesh, verbose=False, seed=3)
    acc = model.evaluate("test")
    assert acc > max(0.5, first), f"dp-saint test acc {acc} (init {first})"


def test_train_cli_dp_saint(monkeypatch, capsys):
    """GAB_DP routes sampled training (subg_size > 0) onto the
    data-parallel GraphSAINT path and still reports test accuracy."""
    from graphaibench_tpu import cli

    monkeypatch.setenv("GAB_DP", "4")
    # argv: arch ds epochs threads loss hidden sdrop fdrop lr layers
    #       subg_size val_interval
    rc = cli.cmd_train(["gcn", "/root/reference/inputs/cora", "4", "0",
                        "softmax", "16", "0", "0", "0.02", "2", "300", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Step   0" in out and "subg_nv" in out
    val_lines = [l for l in out.splitlines() if "val_acc" in l]
    assert val_lines, out
    acc = float(out.rsplit("Test accuracy:", 1)[1])
    assert 0.0 <= acc <= 1.0


def test_dp_epad_growth_recompiles_once():
    """A replica whose sample overflows the initial e_pad grows the
    shared pad; the batch still stacks and the step still runs."""
    ds = _citeseer_ds()
    cfg = ModelConfig(arch="gcn", num_layers=2, dim_init=ds.feat_len,
                      dim_hid=8, num_cls=ds.num_classes, lr=0.02)
    mesh = Mesh(np.asarray(jax.devices()[:2]), (DATA_AXIS,))
    model = Model(cfg, ds)
    # absurdly small starting pad: force growth on the very first batch
    sampler = SaintSampler(model.data.graph, model.training.host,
                           model.data.train_mask)
    d0 = pad_subgraph(sampler, "gcn", 200, 0, 200, 64,
                      np.asarray(ds.feats), np.asarray(ds.labels))
    assert d0["e_pad"] > 64   # really grew
    batch = [d0, pad_subgraph(sampler, "gcn", 200, 1, 200, d0["e_pad"],
                              np.asarray(ds.feats), np.asarray(ds.labels))]
    stacked, e_pad = _stack_batch(batch, 200)
    assert stacked["es"].shape == (2, e_pad)
    # the padded tail of every replica must keep the sentinel row
    for r in range(2):
        assert stacked["es"][r, -1] == 200 - 1
    train_sampled_dp(model, 2, 200, mesh=mesh, verbose=False, seed=0)
