"""Unit tests for the per-shard ELL slot kernels (parallel/shard_ell.py):
outputs AND custom-VJP gradients must match the naive gather/segment
formulation on each shard's rectangular local graph."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphaibench_tpu.graph import transforms as T
from graphaibench_tpu.graph.generators import rmat
from graphaibench_tpu.parallel.partition import build_sharded_graph
from graphaibench_tpu.parallel.shard_ell import (
    build_shard_ell,
    gat_fused_local,
    slot_sddmm_add,
    slot_spmm,
)

P = 4


@pytest.fixture(scope="module")
def shard_setup():
    g = T.add_selfloop(rmat(8, 8, seed=7))  # 256 v, power-law
    w = T.gcn_edge_norms(g)
    sg = build_sharded_graph(g, w, P)
    se = build_shard_ell(sg)
    return sg, se


def _local(se, p):
    return jax.tree.map(lambda a: a[p], se)


def _naive_spmm(sg, p, w, x_ext):
    msgs = x_ext[sg.col_idx[p]] * jnp.where(sg.edge_valid[p], w, 0.0)[:, None]
    return jax.ops.segment_sum(msgs, jnp.asarray(sg.edge_src[p]),
                               num_segments=sg.nv_pad)


def test_slot_spmm_matches_naive_with_grads(shard_setup):
    sg, se = shard_setup
    rng = np.random.default_rng(0)
    nv_ext = sg.nv_pad + sg.h_max
    for p in range(P):
        x = jnp.asarray(rng.standard_normal((nv_ext, 8)).astype(np.float32))
        w = jnp.asarray(sg.edge_w[p])
        es = jnp.asarray(sg.edge_src[p])
        ci = jnp.asarray(sg.col_idx[p])
        va = jnp.asarray(sg.edge_valid[p])
        sep = _local(se, p)

        out = slot_spmm(sg.nv_pad, sep, w, x, es, ci, va)
        ref = _naive_spmm(sg, p, w, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        # grads wrt w and x through a scalar functional
        ct = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
        f_new = lambda w_, x_: jnp.vdot(
            slot_spmm(sg.nv_pad, sep, w_, x_, es, ci, va), ct)
        f_ref = lambda w_, x_: jnp.vdot(_naive_spmm(sg, p, w_, x_), ct)
        gw_n, gx_n = jax.grad(f_new, argnums=(0, 1))(w, x)
        gw_r, gx_r = jax.grad(f_ref, argnums=(0, 1))(w, x)
        # padded slots carry no semantics; compare only valid slots
        np.testing.assert_allclose(np.asarray(gw_n)[np.asarray(va)],
                                   np.asarray(gw_r)[np.asarray(va)],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r),
                                   rtol=1e-4, atol=1e-5)


def test_slot_sddmm_add_matches_naive_with_grads(shard_setup):
    sg, se = shard_setup
    rng = np.random.default_rng(1)
    nv_ext = sg.nv_pad + sg.h_max
    for p in range(P):
        sa = jnp.asarray(rng.standard_normal(sg.nv_pad).astype(np.float32))
        sb = jnp.asarray(rng.standard_normal(nv_ext).astype(np.float32))
        es = jnp.asarray(sg.edge_src[p])
        ci = jnp.asarray(sg.col_idx[p])
        va = np.asarray(sg.edge_valid[p])
        sep = _local(se, p)

        out = slot_sddmm_add(sg.nv_pad, nv_ext, sep, sa, sb, es, ci)
        ref = sa[es] + sb[ci]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6)

        ct_np = rng.standard_normal(sg.e_max).astype(np.float32)
        ct_np[~va] = 0.0  # consumers never read padded slots
        ct = jnp.asarray(ct_np)
        f_new = lambda a, b: jnp.vdot(
            slot_sddmm_add(sg.nv_pad, nv_ext, sep, a, b, es, ci), ct)
        f_ref = lambda a, b: jnp.vdot(
            jnp.where(jnp.asarray(va), a[es] + b[ci], 0.0), ct)
        ga_n, gb_n = jax.grad(f_new, argnums=(0, 1))(sa, sb)
        ga_r, gb_r = jax.grad(f_ref, argnums=(0, 1))(sa, sb)
        np.testing.assert_allclose(np.asarray(ga_n), np.asarray(ga_r),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb_n), np.asarray(gb_r),
                                   rtol=1e-4, atol=1e-5)


def _naive_gat(sg, p, logits, x_ext):
    va = jnp.asarray(sg.edge_valid[p])
    es = jnp.asarray(sg.edge_src[p])
    ci = jnp.asarray(sg.col_idx[p])
    neg = jnp.finfo(jnp.float32).min
    lg = jnp.where(va, logits, neg)
    row_max = jax.ops.segment_max(lg, es, num_segments=sg.nv_pad)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    e = jnp.where(va, jnp.exp(lg - jax.lax.stop_gradient(row_max)[es]), 0.0)
    denom = jax.ops.segment_sum(e, es, num_segments=sg.nv_pad)
    s = e / jnp.maximum(denom[es], 1e-30)
    msgs = x_ext[ci] * s[:, None]
    return jax.ops.segment_sum(msgs, es, num_segments=sg.nv_pad)


def test_gat_fused_local_matches_naive_with_grads(shard_setup):
    sg, se = shard_setup
    rng = np.random.default_rng(2)
    nv_ext = sg.nv_pad + sg.h_max
    for p in range(P):
        x = jnp.asarray(rng.standard_normal((nv_ext, 8)).astype(np.float32))
        logits = jnp.asarray(
            rng.standard_normal(sg.e_max).astype(np.float32))
        es = jnp.asarray(sg.edge_src[p])
        ci = jnp.asarray(sg.col_idx[p])
        va = jnp.asarray(sg.edge_valid[p])
        sep = _local(se, p)

        out = gat_fused_local(sg.nv_pad, sep, logits, x, es, ci, va)
        ref = _naive_gat(sg, p, logits, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

        ct = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
        f_new = lambda l, x_: jnp.vdot(
            gat_fused_local(sg.nv_pad, sep, l, x_, es, ci, va), ct)
        f_ref = lambda l, x_: jnp.vdot(_naive_gat(sg, p, l, x_), ct)
        gl_n, gx_n = jax.grad(f_new, argnums=(0, 1))(logits, x)
        gl_r, gx_r = jax.grad(f_ref, argnums=(0, 1))(logits, x)
        np.testing.assert_allclose(np.asarray(gl_n)[np.asarray(va)],
                                   np.asarray(gl_r)[np.asarray(va)],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r),
                                   rtol=1e-4, atol=1e-5)


def test_segmented_layout_matches_flat(shard_setup):
    """Forcing tiny segment thresholds must not change any output or
    gradient (the column-segmented layout is a pure re-tiling)."""
    sg, se_flat = shard_setup
    se_seg = build_shard_ell(sg, seg_rows=16, seg_min_rows=32)
    assert se_seg.fwd_bounds is not None and len(se_seg.fwd_bounds) >= 2
    # stacked segment axis present: (P, S, R)
    assert all(b.row_ids.ndim == 3 for b in se_seg.fwd)
    rng = np.random.default_rng(3)
    nv_ext = sg.nv_pad + sg.h_max
    for p in range(2):
        x = jnp.asarray(rng.standard_normal((nv_ext, 8)).astype(np.float32))
        w = jnp.asarray(sg.edge_w[p])
        logits = jnp.asarray(rng.standard_normal(sg.e_max).astype(np.float32))
        es = jnp.asarray(sg.edge_src[p])
        ci = jnp.asarray(sg.col_idx[p])
        va = jnp.asarray(sg.edge_valid[p])
        a, b = _local(se_flat, p), _local(se_seg, p)

        f1 = lambda w_, x_, se_: jnp.sum(
            slot_spmm(sg.nv_pad, se_, w_, x_, es, ci, va) ** 2)
        np.testing.assert_allclose(float(f1(w, x, a)), float(f1(w, x, b)),
                                   rtol=1e-5)
        g1 = jax.grad(f1, argnums=1)(w, x, a)
        g2 = jax.grad(f1, argnums=1)(w, x, b)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5)

        f2 = lambda l, se_: jnp.sum(
            gat_fused_local(sg.nv_pad, se_, l, x, es, ci, va) ** 2)
        np.testing.assert_allclose(float(f2(logits, a)),
                                   float(f2(logits, b)), rtol=1e-5)
        gl1 = jax.grad(f2)(logits, a)
        gl2 = jax.grad(f2)(logits, b)
        np.testing.assert_allclose(np.asarray(gl1)[np.asarray(va)],
                                   np.asarray(gl2)[np.asarray(va)],
                                   rtol=1e-4, atol=1e-5)


def test_shard_ell_covers_every_edge(shard_setup):
    """Every valid slot appears exactly once in the fwd layout and once
    in the transpose layout; padding carries only the sentinel."""
    sg, se = shard_setup
    for layout in (se.fwd, se.trans):
        for p in range(P):
            n_valid = int(sg.edge_valid[p].sum())
            eids = np.concatenate(
                [np.asarray(b.edge_id[p]).ravel() for b in layout])
            real = eids[eids < sg.e_max]
            assert sorted(real) == list(range(n_valid))
