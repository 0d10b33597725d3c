"""On-device (TPU) CGR adjacency decoding.

CGR is a bit-granular stream of Elias gamma / zeta_k codes — every code's
position depends on all previous codes, so a flat vectorization like the
StreamVByte decoder's (device_decode.py) is impossible. What makes TPU
decode viable is the format's own RESIDUAL SEGMENTATION (cgr_encoder.cc
append_segment semantics, reproduced in compress/cgr.py): every closed
segment is padded to exactly ``res_seg_len`` bits, so segment k of
vertex v starts at the statically computable bit position
``segs_base(v) + k * res_seg_len`` and is decodable INDEPENDENTLY
(each segment's first residual is coded against v, continuations against
the in-segment predecessor).

The decoder therefore runs in three vectorized phases:

  1. header pass, one lane per VERTEX (2 sequential gamma codes:
     optional degree, then num_segments-1) -> segs_base,
  2. count pass, one lane per (vertex, segment) (1 gamma code),
  3. residual pass: a lax.scan of at most ``trip`` zeta_k codes where
     every (vertex, segment) lane decodes one code per step — the
     segment length bounds the trip count by ~res_seg_len/3 REGARDLESS
     of degree skew (a hub's 20k-edge list is just 20k/res_cnt lanes).

All bit reads are 32-bit windows from a word-pair gather (bytes packed
MSB-first -> big-endian word view), leading-zero counts via lax.clz.

Reference analog: include/cgr_decoder.cuh:269 + the segmented GPU TC
kernels (src/structure/tc_gpu_compressed.cu) which assign segments to
warps the same way. Interval-coded streams (use_interval=True) and
res_seg_len < 64 (where a single zeta code could straddle a segment
slot) fall back to the host decoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from graphaibench_tpu.graph.csr import CSRGraph


def _pairs(words: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([words[:-1], words[1:]], axis=1)      # (W-1, 2)


def _quads(words: jnp.ndarray) -> jnp.ndarray:
    """(W-3, 4) sliding word windows: one 16-byte row gather yields a
    96+ bit bit-window — enough for any whole zeta/gamma code (max ~48
    bits), halving the gathers per decoded code."""
    return jnp.stack([words[:-3], words[1:-2], words[2:-1], words[3:]],
                     axis=1)


def _read32(pairs: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Bits [p, p+32) of the MSB-first stream, MSB-aligned in a uint32."""
    pw = pairs[p >> 5]                                      # (L, 2)
    w0 = pw[..., 0].astype(jnp.uint32)
    w1 = pw[..., 1].astype(jnp.uint32)
    s = (p & 31).astype(jnp.uint32)
    return jnp.where(s == 0, w0, (w0 << s) | (w1 >> (32 - s)))


def _clz(win: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.clz(jax.lax.bitcast_convert_type(win, jnp.int32))


def _read_gamma(pairs, p):
    """(value, nbits) of the gamma code at bit position p."""
    win = _read32(pairs, p)
    l = _clz(win)                                           # len bits
    low = _read32(pairs, p + l + 1)
    l_u = l.astype(jnp.uint32)
    frac = jnp.where(l == 0, jnp.uint32(0), low >> (32 - l_u))
    y = (jnp.uint32(1) << l_u) | frac
    return (y - 1).astype(jnp.int32), 2 * l + 1


def _read_zeta(pairs, p, k: int):
    """(value, nbits) of the zeta_k code at bit position p."""
    if k == 1:
        return _read_gamma(pairs, p)
    win = _read32(pairs, p)
    h = _clz(win)
    nb = (h + 1) * k                                        # y bits
    yw = _read32(pairs, p + h + 1)
    nb_u = jnp.minimum(nb, 32).astype(jnp.uint32)
    y = jnp.where(nb >= 32, yw, yw >> (32 - nb_u))
    return (y - 1).astype(jnp.int32), h + 1 + nb


def _read_code_quad(quads, p, k: int):
    """(value, nbits) of one whole zeta_k (gamma if k==1) code from a
    SINGLE quad gather: 64 bits of window reach past any valid code."""
    q = quads[p >> 5]                                       # (L, 4)
    q0 = q[..., 0].astype(jnp.uint32)
    q1 = q[..., 1].astype(jnp.uint32)
    q2 = q[..., 2].astype(jnp.uint32)
    sv = (p & 31).astype(jnp.uint32)
    hi = jnp.where(sv == 0, q0, (q0 << sv) | (q1 >> (32 - sv)))
    lo = jnp.where(sv == 0, q1, (q1 << sv) | (q2 >> (32 - sv)))
    h = _clz(hi)
    if k == 1:
        # gamma: y = 1<<h | next h bits after the leading one
        off = (h + 1).astype(jnp.uint32)
        yw = jnp.where(off == 32, lo, (hi << off) | (lo >> (32 - off)))
        h_u = h.astype(jnp.uint32)
        frac = jnp.where(h == 0, jnp.uint32(0), yw >> (32 - h_u))
        y = (jnp.uint32(1) << h_u) | frac
        return (y - 1).astype(jnp.int32), 2 * h + 1
    nb = (h + 1) * k
    off = (h + 1).astype(jnp.uint32)
    yw = jnp.where(off == 32, lo, (hi << off) | (lo >> (32 - off)))
    nb_u = jnp.minimum(nb, 32).astype(jnp.uint32)
    y = jnp.where(nb >= 32, yw, yw >> (32 - nb_u))
    return (y - 1).astype(jnp.int32), h + 1 + nb


def _nat2int(x: jnp.ndarray) -> jnp.ndarray:
    """int_2_nat inverse: even -> n/2, odd -> -((n+1)/2)."""
    return jnp.where(x & 1, -((x + 1) >> 1), x >> 1)


@functools.partial(jax.jit, static_argnames=("add_degree",))
def _headers(pairs, bit_off, add_degree: bool):
    """Per-vertex header decode -> (nsegs, segs_base)."""
    p = bit_off
    if add_degree:
        d, nb = _read_gamma(pairs, p)
        p = p + nb
        ns, nb2 = _read_gamma(pairs, p)
        nsegs = jnp.where(d == 0, 0, ns + 1)
        base = jnp.where(d == 0, p, p + nb2)
    else:
        ns, nb2 = _read_gamma(pairs, p)
        nsegs = ns + 1
        base = p + nb2
    return nsegs, base


@jax.jit
def _counts(pairs, seg_start, active):
    c, nb = _read_gamma(pairs, seg_start)
    return jnp.where(active, c, 0), seg_start + nb


@functools.partial(jax.jit, static_argnames=("k", "trip", "ne"),
                   donate_argnames=("col",))
def _residual_pass(quads, data_p, counts, lane_v, base, col, k: int,
                   trip: int, ne: int):
    """Decode up to ``trip`` codes for every lane and scatter into the
    shared col buffer. Called once per count-bucket so the scan length
    tracks each lane's actual work instead of the global max."""
    zeros = jnp.zeros_like(data_p)

    def step(carry, _):
        p, prev, i = carry
        x, nb = _read_code_quad(quads, p, k)
        val = jnp.where(i == 0, lane_v + _nat2int(x), prev + x + 1)
        active = i < counts
        p = jnp.where(active, p + nb, p)
        prev = jnp.where(active, val, prev)
        return (p, prev, i + 1), jnp.where(active, val, 0)

    # unroll: the per-step fixed cost (one small dependent kernel per
    # code) dominates at ~1.5 ms/step through the tunnel; unrolling
    # fuses 8 codes per loop iteration (measured 13.6 -> see BASELINE)
    _, vals = jax.lax.scan(step, (data_p, zeros, jnp.int32(0)), None,
                           length=trip, unroll=min(8, trip))  # (trip, L)
    i = jnp.arange(trip, dtype=jnp.int32)[:, None]
    slots = jnp.where(i < counts[None, :], base[None, :] + i, ne)
    return col.at[slots].set(vals, mode="drop")


def _gamma_len_np(x: np.ndarray) -> np.ndarray:
    """Host gamma bit length: 2*floor(log2(x+1)) + 1."""
    return 2 * (np.floor(np.log2(x + 1)).astype(np.int64)) + 1


def _pow2_pad(n: int, lo: int = 1024) -> int:
    t = lo
    while t < n:
        t *= 2
    return t


def cgr_decode_device(cg) -> CSRGraph:
    """Decode a CompressedGraph (CGR scheme) on device.

    Degrees are DERIVED from the per-segment counts — no side file
    needed. Two small host syncs happen at load time (per-vertex segment
    counts, then per-segment residual counts) so the residual scans can
    be BUCKETED by count like the ELL SpMM: without bucketing the scan
    length is the global max count and >10x of the work is padding
    (measured 952 ms -> the bucketed passes below). Raises ValueError
    for stream shapes the device path cannot address (interval coding,
    tiny segments); callers fall back to the host decoder, mirroring the
    reference's CPU decode path."""
    cfg = cg.cfg
    if cfg.use_interval:
        raise ValueError("device CGR decode: interval streams unsupported")
    if cfg.res_seg_len == 0:
        raise ValueError("device CGR decode: unsegmented (unary) stream")
    if cfg.res_seg_len < 64:
        raise ValueError("device CGR decode: res_seg_len < 64 may split "
                         "a single zeta code across segment slots")
    nv, ne = cg.nv, cg.ne
    unit = cfg.unit_bits
    seg_len = cfg.res_seg_len

    data = cg.data
    pad = (-len(data)) % 4 + 16
    words = jnp.asarray(np.frombuffer(
        data + b"\x00" * pad, dtype=">u4").astype(np.uint32))
    pairs = _pairs(words)
    quads = _quads(words)

    off = np.asarray(cg.offsets, dtype=np.int64)
    bits = off * unit
    assert bits[-1] < 2**31, "stream too large for int32 bit positions"
    bit_off = jnp.asarray(bits[:nv].astype(np.int32))

    nsegs_d, segs_base_d = _headers(pairs, bit_off, cfg.add_degree)
    nsegs = np.asarray(nsegs_d).astype(np.int64)
    segs_base = np.asarray(segs_base_d)

    # exact (vertex, segment) lanes, in CSR order
    lane_v = np.repeat(np.arange(nv, dtype=np.int32), nsegs)
    starts = np.concatenate([[0], np.cumsum(nsegs)[:-1]])
    lane_k = (np.arange(len(lane_v), dtype=np.int64)
              - starts[lane_v]).astype(np.int32)
    seg_start = segs_base[lane_v] + lane_k * seg_len
    L = len(lane_v)
    if L == 0 or ne == 0:
        row_ptr = np.zeros(nv + 1, np.int64)
        return CSRGraph(row_ptr=row_ptr, col_idx=np.zeros(0, np.int32))

    counts_d, _ = _counts(pairs, jnp.asarray(seg_start),
                          jnp.ones(L, bool))
    counts = np.asarray(counts_d).astype(np.int64)

    data_p = (seg_start + _gamma_len_np(counts)).astype(np.int32)
    base = (np.cumsum(counts) - counts).astype(np.int32)
    deg = np.zeros(nv, np.int64)
    np.add.at(deg, lane_v, counts)
    row_ptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    assert row_ptr[-1] == ne, (row_ptr[-1], ne)

    # count-bucketed residual scans (pow2 trip grid; lane counts padded
    # to a pow2 so compile shapes stay bounded across graphs)
    col = jnp.zeros((ne,), jnp.int32)
    order = np.argsort(counts, kind="stable")
    sorted_counts = counts[order]
    # the merged last segment can hold up to ~2*seg_len/3 codes, so the
    # grid must reach past seg_len/3 — cap at 2*seg_len
    trips = [t for t in (8, 32, 128, 512, 2048, 8192) if t <= 2 * seg_len]
    lo = 0
    for trip in trips:
        hi = np.searchsorted(sorted_counts, trip, side="right")
        sel = order[lo:hi]
        sel = sel[counts[sel] > 0]
        lo = hi
        if len(sel) == 0:
            continue
        n_pad = _pow2_pad(len(sel))
        padder = np.zeros(n_pad - len(sel), np.int32)
        col = _residual_pass(
            quads,
            jnp.asarray(np.concatenate([data_p[sel], padder])),
            jnp.asarray(np.concatenate(
                [counts[sel].astype(np.int32), padder])),
            jnp.asarray(np.concatenate([lane_v[sel], padder])),
            jnp.asarray(np.concatenate([base[sel], padder])),
            col, cfg.zeta_k, trip, ne)
    assert lo == L or sorted_counts[lo] <= trips[-1], "count exceeds grid"
    return CSRGraph(row_ptr=row_ptr,
                    col_idx=np.asarray(col, dtype=np.int32))
