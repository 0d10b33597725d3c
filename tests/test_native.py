"""Native C++ kernels: bit-exact parity with the Python implementations."""

import numpy as np
import pytest

from graphaibench_tpu import native
from graphaibench_tpu.compress import cgr
from graphaibench_tpu.graph import transforms as T
from graphaibench_tpu.graph.generators import grid2d, rmat

pytestmark = pytest.mark.skipif(not native.available(), reason="no g++ toolchain")


@pytest.fixture(scope="module")
def g():
    return rmat(10, 8, seed=7)


def test_build_csr_parity(g):
    src, dst = g.coo()
    rp, ci = native.build_csr(src, dst, g.nv)
    np.testing.assert_array_equal(rp, g.row_ptr)
    np.testing.assert_array_equal(ci, g.col_idx)


def test_orientation_parity(g):
    rp, ci = native.orientation(g.row_ptr, g.col_idx)
    dag = T.orientation(g)
    np.testing.assert_array_equal(rp, dag.row_ptr)
    np.testing.assert_array_equal(ci, dag.col_idx)


@pytest.mark.parametrize("cfg", [
    cgr.CgrConfig(),
    cgr.CgrConfig(use_interval=True),
    cgr.CgrConfig(res_seg_len=0),
    cgr.CgrConfig(zeta_k=1),
    cgr.CgrConfig(alignment="word", add_degree=True),
])
def test_cgr_native_bit_exact(g, cfg):
    off_n, data_n = native.cgr_encode(g.row_ptr, g.col_idx, cfg)
    # python reference encoding of the same graph
    import graphaibench_tpu.native as nat
    lib = nat._LIB
    try:
        nat._LIB = None
        nat._TRIED = True  # force python path
        pg = cgr.encode_graph(g, cfg)
    finally:
        nat._LIB = lib
    assert np.array_equal(off_n, pg.offsets)
    assert data_n == pg.data
    # native decode
    deg = g.degrees().astype(np.int64)
    col = native.cgr_decode(g.nv, data_n, off_n, g.row_ptr, deg, cfg)
    np.testing.assert_array_equal(col, g.col_idx)


def test_cgr_native_intervals_grid():
    gg = grid2d(25)
    cfg = cgr.CgrConfig(use_interval=True, min_itv_len=2)
    off, data = native.cgr_encode(gg.row_ptr, gg.col_idx, cfg)
    col = native.cgr_decode(gg.nv, data, off, gg.row_ptr,
                            gg.degrees().astype(np.int64), cfg)
    np.testing.assert_array_equal(col, gg.col_idx)


def test_saint_native(g):
    tn = np.arange(g.nv // 2, dtype=np.int64)
    vs = native.saint_sample(g.row_ptr, g.col_idx, tn, 300, 100, 3000, 11)
    assert len(np.unique(vs)) == len(vs)
    assert np.all(np.diff(vs) > 0)
    vs2 = native.saint_sample(g.row_ptr, g.col_idx, tn, 300, 100, 3000, 11)
    np.testing.assert_array_equal(vs, vs2)  # deterministic


def test_stable_key_sort_matches_lexsort(g):
    src, dst = g.coo()
    perm = native.stable_key_sort(dst, g.nv)
    np.testing.assert_array_equal(perm, np.lexsort((src, dst)))
    # tiny edge cases
    assert len(native.stable_key_sort(np.empty(0, np.int32), 4)) == 0
    with pytest.raises(ValueError):
        native.stable_key_sort(np.array([0, 5], np.int32), 4)


def test_transpose_perm_native_matches_python(g):
    from graphaibench_tpu.graph import transforms as T

    src, dst = g.coo()
    got = T.transpose_edge_permutation(g)
    np.testing.assert_array_equal(got, np.lexsort((src, dst)))


def test_build_seg_ell_native_matches_fallback(g):
    import graphaibench_tpu.native as nat
    from graphaibench_tpu.ops.device_graph import build_seg_ell

    a = build_seg_ell(g, seg_rows=100)
    lib = nat._LIB
    try:
        nat._LIB = None
        nat._TRIED = True  # force the per-segment mask fallback
        b = build_seg_ell(g, seg_rows=100)
    finally:
        nat._LIB = lib
    assert a.bounds == b.bounds
    assert len(a.segs) == len(b.segs)
    for sa, sb in zip(a.segs, b.segs):
        assert len(sa) == len(sb)
        for ba, bb in zip(sa, sb):
            assert ba.width == bb.width
            np.testing.assert_array_equal(np.asarray(ba.row_ids),
                                          np.asarray(bb.row_ids))
            np.testing.assert_array_equal(np.asarray(ba.nbr),
                                          np.asarray(bb.nbr))
            np.testing.assert_array_equal(np.asarray(ba.edge_id),
                                          np.asarray(bb.edge_id))


def _buckets_equal(a, b):
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        assert ba.width == bb.width
        np.testing.assert_array_equal(np.asarray(ba.row_ids),
                                      np.asarray(bb.row_ids))
        np.testing.assert_array_equal(np.asarray(ba.nbr), np.asarray(bb.nbr))
        np.testing.assert_array_equal(np.asarray(ba.edge_id),
                                      np.asarray(bb.edge_id))


def test_ell_pack_native_matches_numpy(g):
    """build_ell_buckets and ell_from_coo route through the native
    packer — buckets must be bit-identical to the numpy virtual-row
    path (identity and explicit edge ids, with heavy-row splitting)."""
    import graphaibench_tpu.native as nat
    from graphaibench_tpu.ops.device_graph import (
        build_ell_buckets, ell_from_coo)

    src, dst = g.coo()
    rng = np.random.default_rng(0)
    eids = rng.permutation(g.ne).astype(np.int64)
    shuffle = rng.permutation(g.ne)

    a1 = build_ell_buckets(g, split=8)          # forces heavy-row splits
    a2 = build_ell_buckets(g)
    a3 = ell_from_coo(src[shuffle], dst[shuffle], eids[shuffle],
                      sentinel=g.ne, as_numpy=True)
    lib = nat._LIB
    try:
        nat._LIB = None
        nat._TRIED = True
        b1 = build_ell_buckets(g, split=8)
        b2 = build_ell_buckets(g)
        b3 = ell_from_coo(src[shuffle], dst[shuffle], eids[shuffle],
                          sentinel=g.ne, as_numpy=True)
    finally:
        nat._LIB = lib
    _buckets_equal(a1, b1)
    _buckets_equal(a2, b2)
    _buckets_equal(a3, b3)
