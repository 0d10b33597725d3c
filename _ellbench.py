import time, numpy as np, jax
import jax.numpy as jnp
from graphaibench_tpu.graph.generators import rmat
from graphaibench_tpu.graph import transforms as T

g = T.add_selfloop(rmat(17, 16, seed=0))
ne, nv = g.ne, g.nv
deg = g.degrees().astype(np.int64); row_ptr = g.row_ptr; col = g.col_idx
rng = np.random.default_rng(0)
F = 128
x = jnp.asarray(rng.standard_normal((nv, F)).astype(np.float32))
wnp = rng.standard_normal(ne).astype(np.float32)
w = jnp.asarray(np.concatenate([wnp, [0.0]]).astype(np.float32))

def build(widths, split):
    widths = sorted(widths)
    nchunks = (deg + split - 1) // split
    nchunks = np.maximum(nchunks, 1)
    vr_t = np.repeat(np.arange(nv, dtype=np.int32), nchunks)
    first = np.repeat(np.cumsum(nchunks) - nchunks, nchunks)
    k = np.arange(len(vr_t)) - first            # chunk index within vertex
    vr_s = row_ptr[vr_t] + k * split
    vr_l = np.minimum(deg[vr_t] - k * split, split).astype(np.int64)
    keep = vr_l > 0
    vr_t, vr_s, vr_l = vr_t[keep], vr_s[keep], vr_l[keep]
    buckets, slots = [], 0
    for wi, W in enumerate(widths):
        lo = widths[wi-1] if wi > 0 else 0
        sel = (vr_l > lo) & (vr_l <= W)
        if not sel.any(): continue
        t, s, l = vr_t[sel], vr_s[sel], vr_l[sel]
        offs = np.arange(W, dtype=np.int64)[None, :]
        inr = offs < l[:, None]
        pos = np.where(inr, s[:, None] + offs, 0)
        nbr = np.where(inr, col[pos], 0).astype(np.int32)
        eid = np.where(inr, pos, ne).astype(np.int32)
        buckets.append((jnp.asarray(t), jnp.asarray(nbr), jnp.asarray(eid)))
        slots += nbr.size
    return buckets, slots

def spmm(buckets):
    out = jnp.zeros((nv, F), jnp.float32)
    for t, nbr, eid in buckets:
        out = out.at[t].add(jnp.einsum("rw,rwf->rf", w[eid], x[nbr]))
    return out

def bench(f, iters=20):
    run = jax.jit(lambda _: jax.lax.fori_loop(0, iters, lambda i, a: a + f()[0,0], 0.0))
    run(0).block_until_ready()
    t0 = time.perf_counter(); run(0).block_until_ready()
    return (time.perf_counter()-t0)/iters

from graphaibench_tpu.ops.device_graph import to_device_graph
from graphaibench_tpu.ops.spmm import spmm_ell
dgs = to_device_graph(g, with_transpose=False, with_ell=True)
ref = spmm_ell(dgs, jnp.asarray(wnp), x)
t_cur = bench(lambda: spmm_ell(dgs, jnp.asarray(wnp), x))
print(f"current: {ne/t_cur/1e6:6.1f} M e/s pad=1.356", flush=True)

pow2 = [1<<i for i in range(15)]
grid15 = sorted({1,2,3,4,6,8,12,16,24,32,48,64,96,128,192,256,384,512})
import sys
for name, widths, split in [
    ("pow2 split512", pow2, 512),
    ("grid1.5 split512", grid15, 512),
]:
    bks, slots = build(widths, split)
    got = spmm(bks)
    ok = bool(jnp.allclose(got, ref, atol=1e-3, rtol=1e-3))
    t = bench(lambda: spmm(bks))
    print(f"{name:18s}: {ne/t/1e6:6.1f} M e/s slots={slots} pad={slots/ne:.3f} nb={len(bks)} ok={ok}", flush=True)
