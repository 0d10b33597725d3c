"""Converters, timers, checkpointing."""

import numpy as np
import jax.numpy as jnp

from graphaibench_tpu.graph.converters import convert, read_gr, read_mtx
from graphaibench_tpu.graph.io import load_graph
from graphaibench_tpu.utils import OpTimers, restore_checkpoint, save_checkpoint


def test_mtx_matches_binary_fixture(tester):
    g = read_mtx("/root/reference/inputs/tester.mtx")
    np.testing.assert_array_equal(g.row_ptr, tester.row_ptr)
    np.testing.assert_array_equal(g.col_idx, tester.col_idx)


def test_read_csgr():
    g = read_gr("/root/reference/inputs/gnn-tester/tester.csgr")
    assert g.nv == 7 and g.ne == 12


def test_convert_pipeline(tmp_path):
    out = str(tmp_path / "conv")
    g = convert("/root/reference/inputs/tester.mtx", out, clean=True)
    g2 = load_graph(out)
    np.testing.assert_array_equal(g2.col_idx, g.col_idx)
    # with orientation: halves the symmetric edge count
    out2 = str(tmp_path / "dag")
    dag = convert("/root/reference/inputs/tester.mtx", out2, orient=True)
    assert dag.ne == g.ne // 2


def test_op_timers(capsys):
    t = OpTimers()
    with t.op("sparse_mm"):
        pass
    t.add("dense_mm", 0.5)
    t.print_timers()
    out = capsys.readouterr().out
    assert "dense_mm" in out and "sparse_mm" in out


def test_checkpoint_roundtrip(tmp_path):
    state = {"w": jnp.arange(6.0).reshape(2, 3), "nested": [jnp.ones(4)]}
    save_checkpoint(str(tmp_path / "ck"), state, step=3)
    like = {"w": jnp.zeros((2, 3)), "nested": [jnp.zeros(4)]}
    restored = restore_checkpoint(str(tmp_path / "ck"), like, step=3)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(state["w"]))
    np.testing.assert_array_equal(np.asarray(restored["nested"][0]), 1.0)


def test_csgr_gnn_dataset_end_to_end():
    """Legacy csgr dataset path (reference reader.cpp:16-246): load the
    gnn-tester fixture and train a 2-layer GCN on it."""
    from graphaibench_tpu.graph.io import load_gnn_dataset_csgr
    from graphaibench_tpu.nn import Model, make_config

    ds = load_gnn_dataset_csgr("/root/reference/inputs/gnn-tester")
    assert ds.graph.nv == 7 and ds.feats.shape == (7, 3)
    assert ds.num_classes == 7
    assert ds.train_range == (0, 5, 5)
    cfg = make_config("gcn", 2, ds.feat_len, 8, ds.num_classes)
    m = Model(cfg, ds)
    losses = [m.train_epoch()[0] for _ in range(15)]
    assert losses[-1] < losses[0]
