"""Fused GAT attention: softmax-over-edges + weighted SpMM in one op.

The reference fuses attention score + softmax + dropout into one CUDA
kernel (``compute_attn_score_warp``, include/gnn/graph_operations.h:250)
because materializing per-edge score traffic dominates GAT. The same is
true on TPU, but the expensive part is different: per-edge (ne,)-sized
broadcasts of the row max / row denominator (``x[seg]`` gathers at ~30 ms
per 4M-edge gather) and the scatter-heavy ``jax.ops.segment_*`` row
reductions.

This op removes them: inside each ELL degree bucket the normalizers are
indexed **per row** (an (R,)-sized gather, ~30x fewer lookups), so the
softmax fuses into the aggregation pass and no normalized score vector is
ever written to HBM on the forward path. The backward pass is an exact
custom VJP (softmax adjoint + transposed-permutation SpMM + SDDMM),
mirroring the reference's hand-written GAT backward
(gat_aggregator.cpp:106-175) with the csr2cs​c replaced by the
host-precomputed edge permutation.

Measured (rmat17, 4M edges, F=128): unfused segment_softmax + spmm
forward 190 ms -> fused 75 ms; see bench extras gat_epoch_s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from graphaibench_tpu.ops.device_graph import DeviceGraph
from graphaibench_tpu.ops.segment import _row_reduce_ell
from graphaibench_tpu.ops.spmm import sddmm_dot, spmm_ell


def _fused_fwd_pass(g: DeviceGraph, logits, edge_w, x, m, z):
    """One streaming pass: per-bucket normalized scores -> aggregation."""
    from graphaibench_tpu.ops.spmm import bucket_row_chunks

    l_pad = jnp.concatenate([logits, jnp.full((1,), -jnp.inf, logits.dtype)])
    w_pad = jnp.concatenate([edge_w, jnp.zeros((1,), edge_w.dtype)])
    out = jnp.zeros((g.nv, x.shape[1]), x.dtype)

    def accumulate(out, buckets, xs):
        for b in buckets:
            for lo, hi in bucket_row_chunks(b, xs.shape[1]):
                rows = b.row_ids[lo:hi]
                lb = l_pad[b.edge_id[lo:hi]]        # (r, W)
                # row-indexed normalizers: r gathers, not ne
                sb = jnp.exp(lb - m[rows][:, None]) * z[rows][:, None]
                sb = sb * w_pad[b.edge_id[lo:hi]]
                # padded slots: exp(-inf - m) = 0 (m finite, edge_w pad 0)
                out = out.at[rows].add(
                    jnp.einsum("rw,rwf->rf", sb, xs[b.nbr[lo:hi]]))
        return out

    if g.seg_ell is not None:
        for (lo, hi), buckets in zip(g.seg_ell.bounds, g.seg_ell.segs):
            out = accumulate(out, buckets, x[lo:hi])
        return out
    return accumulate(out, g.ell, x)


def _row_denom_ell(g: DeviceGraph, logits, m):
    """rowsum(exp(l - m[row])) as a streaming bucket pass (row-indexed m,
    no (ne,)-sized broadcast gather)."""
    from graphaibench_tpu.ops.device_graph import all_buckets

    l_pad = jnp.concatenate([logits, jnp.full((1,), -jnp.inf, logits.dtype)])
    out = jnp.zeros((g.nv,), logits.dtype)
    for b in all_buckets(g):
        eb = jnp.exp(l_pad[b.edge_id] - m[b.row_ids][:, None])
        out = out.at[b.row_ids].add(eb.sum(axis=1))
    return out


def _norm_consts(g: DeviceGraph, logits):
    m = _row_reduce_ell(g, logits, "max")
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    z = 1.0 / jnp.maximum(_row_denom_ell(g, logits, m), 1e-38)
    return m, z


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def gat_attention_spmm(g: DeviceGraph, logits: jnp.ndarray,
                       edge_w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """out = A(softmax_row(logits) * edge_w) @ x, fused over ELL buckets.

    Fully differentiable in logits, edge_w, and x (edge_w's cotangent is
    softmax(logits) * <ct[src], x[dst]>, matching the unfused path)."""
    m, z = _norm_consts(g, logits)
    return _fused_fwd_pass(g, logits, edge_w, x, m, z)


def _fwd(g, logits, edge_w, x):
    m, z = _norm_consts(g, logits)
    y = _fused_fwd_pass(g, logits, edge_w, x, m, z)
    return y, (g, logits, edge_w, x, m, z)


def _scores_soft(g: DeviceGraph, logits, m, z):
    """Materialize the softmax scores (backward only). m and z travel in
    one packed row gather — the gather engine is row-rate-bound, so an
    (nv, 2) row costs the same as a scalar."""
    mz = jnp.stack([m, z], axis=1)[g.edge_src]     # (ne, 2)
    return jnp.exp(logits - mz[:, 0]) * mz[:, 1]


def _bwd(res, ct):
    g, logits, edge_w, x, m, z = res
    # backward affords one materialized score vector
    s_soft = _scores_soft(g, logits, m, z)         # softmax(l)
    s = s_soft * edge_w                            # masked scores
    # dx: adjoint aggregation = same topology, transpose-permuted weights
    assert g.has_transpose
    dx = spmm_ell(g, s[g.trans_perm], ct)
    # per-edge <ct[src], x[dst]> feeds both the edge_w cotangent and the
    # softmax adjoint (matching the unfused segment_softmax path, so
    # gradient semantics don't depend on which implementation dispatches)
    raw = sddmm_dot(g, ct, x)
    dew = s_soft * raw
    dsw = raw * edge_w
    # softmax adjoint: dl = s * (dsw - rowsum(s*dsw)) with the row sum
    # computed by a streaming ELL pass
    inner = _row_reduce_ell(g, s_soft * dsw, "sum")
    dl = s_soft * (dsw - inner[g.edge_src])
    from graphaibench_tpu.ops.spmm import _zero_cotangent

    return (_zero_cotangent(g), dl, dew, dx)


gat_attention_spmm.defvjp(_fwd, _bwd)
