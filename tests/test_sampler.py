"""GraphSAINT sampler tests."""

import numpy as np
import pytest

from conftest import fixture_path

from graphaibench_tpu.graph import load_gnn_dataset, transforms as T
from graphaibench_tpu.nn import Model, make_config
from graphaibench_tpu.nn.sampler import SaintSampler


@pytest.fixture(scope="module")
def citeseer_ds():
    ds = load_gnn_dataset(fixture_path("citeseer"), synth_feat_len=16)
    nv = ds.graph.nv
    ds.train_range = (0, 1000, 1000)
    m = np.zeros(nv, dtype=np.uint8); m[:1000] = 1
    ds.train_mask = m
    ds.val_range = ds.test_range = (1000, 2000, 1000)
    m2 = np.zeros(nv, dtype=np.uint8); m2[1000:2000] = 1
    ds.val_mask = ds.test_mask = m2
    return ds


def test_select_vertices(citeseer_ds):
    ds = citeseer_ds
    masked = T.masked_subgraph(ds.graph, ds.train_mask)
    s = SaintSampler(ds.graph, masked, ds.train_mask, frontier_size=50)
    vs = s.select_vertices(200, seed=1)
    assert len(vs) <= 200
    assert len(vs) >= 50
    assert np.all(np.diff(vs) > 0)  # sorted unique
    # all sampled vertices lie in the training set (frontier + masked nbrs)
    assert np.all(ds.train_mask[vs] == 1)
    # determinism
    np.testing.assert_array_equal(vs, s.select_vertices(200, seed=1))


def test_generate_subgraph(citeseer_ds):
    ds = citeseer_ds
    masked = T.masked_subgraph(ds.graph, ds.train_mask)
    s = SaintSampler(ds.graph, masked, ds.train_mask, frontier_size=50)
    sub, l2g, mask = s.generate_subgraph(150, seed=2)
    assert sub.nv == len(l2g)
    assert mask.sum() == len(l2g)
    # subgraph edges all connect sampled vertices, mapped back correctly
    src, dst = sub.coo()
    gsrc, gdst = l2g[src], l2g[dst]
    full_src, full_dst = masked.coo()
    pairs = set(zip(full_src.tolist(), full_dst.tolist()))
    for a, b in zip(gsrc.tolist(), gdst.tolist()):
        assert (a, b) in pairs


def test_train_sampled_gcn(citeseer_ds):
    cfg = make_config("gcn", 2, citeseer_ds.feat_len, 8,
                      citeseer_ds.num_classes, subg_size=200, lr=0.05)
    assert cfg.use_dense and cfg.use_l2norm  # sampling turns on the head
    model = Model(cfg, citeseer_ds, inductive=True)
    model.train_sampled(5, 200, verbose=False)
    acc = model.evaluate("val")
    assert np.isfinite(acc)
