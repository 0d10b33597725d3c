"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the
sharded path must reproduce the single-device results exactly (it is the
same math, reorganized)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from graphaibench_tpu.graph import transforms as T
from graphaibench_tpu.graph.generators import rmat, uniform_random
from graphaibench_tpu.graph.partition import (
    csr_segmenting,
    edgecut_induced_partition_1d,
    edgecut_partition_1d,
    schedule_least_first,
    schedule_round_robin,
)
from graphaibench_tpu.nn import Model, ModelConfig
from graphaibench_tpu.nn.layers import init_params
from graphaibench_tpu.ops.device_graph import to_device_graph
from graphaibench_tpu.ops.spmm import spmm_coo
from graphaibench_tpu.parallel import (
    AXIS,
    build_sharded_graph,
    make_sharded_spmm,
    make_sharded_trainer,
    pad_rows,
)


def make_mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), (AXIS,))


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_host_partitioners():
    g = uniform_random(300, 900, seed=11)
    bounds = edgecut_partition_1d(g, 4)
    assert bounds[0] == 0 and bounds[-1] == g.nv
    assert np.all(np.diff(bounds) >= 0)
    parts = edgecut_induced_partition_1d(g, 4)
    # every edge out of a master appears in exactly one part
    total = sum(p.subgraph.ne for p in parts)
    assert total == g.ne
    for p in parts:
        # master-local ids map back to the global range
        lo, hi = p.global_range
        np.testing.assert_array_equal(
            p.local_to_global[: p.num_masters], np.arange(lo, hi)
        )
    segs = csr_segmenting(g, 64)
    assert sum(s.ne for s in segs.segments) == g.ne
    rr = schedule_round_robin(g.ne, 3, chunk_size=16)
    assert sum(len(c) for c in rr) == g.ne
    lf = schedule_least_first(g, 3, chunk_size=16)
    assert sum(len(c) for c in lf) == g.ne


def test_partition_file_roundtrip(tmp_path):
    """write_partitions / read_partition persist the induced partitions
    in the reference's <prefix>-part<i> binary CSR layout
    (graph_partition.cc:18-35) and roundtrip exactly."""
    from graphaibench_tpu.graph.partition import (
        read_partition,
        write_partitions,
    )

    g = uniform_random(300, 900, seed=11)
    prefix = str(tmp_path / "ur300")
    parts = write_partitions(g, 3, prefix)
    for i, p in enumerate(parts):
        q = read_partition(prefix, i)
        np.testing.assert_array_equal(q.subgraph.row_ptr, p.subgraph.row_ptr)
        np.testing.assert_array_equal(q.subgraph.col_idx, p.subgraph.col_idx)
        np.testing.assert_array_equal(q.local_to_global, p.local_to_global)
        assert q.num_masters == p.num_masters
        assert q.global_range == p.global_range


@pytest.mark.parametrize("kw", [dict(),                       # ELL + overlap
                                dict(overlap=False),          # unified ELL
                                dict(use_ell=False)])         # segment oracle
def test_sharded_spmm_matches_single(mesh, kw):
    g = rmat(9, 8, seed=3)  # 512 vertices, power-law
    w = T.gcn_edge_norms(T.add_selfloop(g))
    gsl = T.add_selfloop(g)
    sg = build_sharded_graph(gsl, w, mesh.devices.size)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((gsl.nv, 32)).astype(np.float32)

    spmm_fn = make_sharded_spmm(mesh, sg, **kw)
    out_sharded = np.asarray(spmm_fn(jnp.asarray(pad_rows(x, sg.padded_nv))))[: gsl.nv]

    dg = to_device_graph(gsl, with_ell=False)
    out_single = np.asarray(spmm_coo(dg, jnp.asarray(w), jnp.asarray(x)))
    np.testing.assert_allclose(out_sharded, out_single, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("arch", ["gcn", "sage", "gat", "ggnn"])
def test_sharded_training_matches_single_device(mesh, arch):
    """Loss trajectory of the 8-shard halo-exchange trainer must track the
    single-device Model (same init, same data)."""
    from graphaibench_tpu.graph.io import GnnDataset
    from graphaibench_tpu.nn.model import GraphBundle, aggregation_weights, prepare_graph

    g = uniform_random(240, 700, seed=5)
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((g.nv, 12)).astype(np.float32)
    labels = rng.integers(0, 5, g.nv).astype(np.int32)
    mask = np.ones(g.nv, dtype=np.uint8)
    tr = (0, 120, 120)
    ds = GnnDataset(graph=g, feats=feats, labels=labels, train_mask=mask,
                    val_mask=mask, test_mask=mask, num_classes=5,
                    train_range=tr, val_range=tr, test_range=tr)
    kw = dict(use_l2norm=True, use_dense=True) if arch == "gat" else {}
    cfg = ModelConfig(arch=arch, num_layers=2, dim_init=12, dim_hid=8,
                      num_cls=5, lr=0.02, **kw)

    single = Model(cfg, ds)

    prepped = prepare_graph(g, arch)
    w = aggregation_weights(prepped, arch)
    sg = build_sharded_graph(prepped, w, mesh.devices.size)
    trainer = make_sharded_trainer(mesh, cfg, sg, feats, labels, tr, mask)

    params = init_params(cfg)
    from graphaibench_tpu.nn.optim import Adam
    opt_state = Adam(lr=cfg.lr).init(params)

    # eval logits at identical initial params must agree tightly
    lg_d = np.asarray(trainer.eval_logits(params))
    lg_s = np.asarray(single._eval_logits(
            single.params, single.full.device, single.full.edge_w,
            single.feats))
    np.testing.assert_allclose(lg_d, lg_s, rtol=1e-4, atol=1e-5)

    # ggnn's GRU gates (sigmoid/tanh products) amplify f32 summation-
    # order noise faster than the ReLU archs across Adam steps
    tol = 1e-3 if arch == "ggnn" else 2e-4
    for step in range(3):
        s_loss, _ = single.train_epoch()
        params, opt_state, d_loss = trainer.train_step(params, opt_state)
        assert abs(s_loss - float(d_loss)) < tol, (step, s_loss, float(d_loss))

    # weights track closely; exact equality is impossible because Adam's
    # early grad/sqrt(v) step amplifies f32 summation-order noise to
    # ~±lr for elements whose gradient is ~0
    for l in range(2):
        np.testing.assert_allclose(
            np.asarray(params["gconv"][l]["W_neigh"]),
            np.asarray(single.params["gconv"][l]["W_neigh"]),
            atol=3 * cfg.lr,
        )


def test_sharded_spmm_empty_shards(mesh):
    """Graph smaller than the shard count still works (trailing shards
    own only padding)."""
    g = T.add_selfloop(uniform_random(10, 20, seed=1))
    w = np.ones(g.ne, dtype=np.float32)
    sg = build_sharded_graph(g, w, mesh.devices.size)
    x = np.ones((g.nv, 4), dtype=np.float32)
    out = np.asarray(make_sharded_spmm(mesh, sg)(jnp.asarray(pad_rows(x, sg.padded_nv))))
    deg = g.degrees().astype(np.float32)
    np.testing.assert_allclose(out[: g.nv, 0], deg, rtol=1e-5)


def test_sharded_spmm_bf16_gathers_close_to_f32(mesh):
    """The sharded _ell_apply/_ell_apply_packed bf16-at-scale gathered
    operands (shared policy with the single-chip spmm_ell) must track
    the f32 path within bf16 tolerance. Forced by dropping the size
    gate; below the gate the path stays exact f32."""
    from graphaibench_tpu.ops import device_graph as dgm

    g = rmat(9, 8, seed=3)
    gsl = T.add_selfloop(g)
    w = T.gcn_edge_norms(gsl)
    sg = build_sharded_graph(gsl, w, mesh.devices.size)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((gsl.nv, 128)).astype(np.float32)
    xp = jnp.asarray(pad_rows(x, sg.padded_nv))

    saved = dgm.SEG_ELL_MIN_NV
    try:
        ref = np.asarray(make_sharded_spmm(mesh, sg)(xp))[: gsl.nv]
        dgm.SEG_ELL_MIN_NV = 0          # force bf16 gathers
        got = np.asarray(make_sharded_spmm(mesh, sg)(xp))[: gsl.nv]
    finally:
        dgm.SEG_ELL_MIN_NV = saved
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(got / scale, ref / scale, atol=3e-2)


def test_overlap_split_matches_unified(mesh):
    """The own/halo overlap split (interior aggregation concurrent with
    the all_to_all) must agree with the unified extended-table layout:
    same edges, disjointly partitioned, scatter-added into the same
    rows."""
    from graphaibench_tpu.nn.model import aggregation_weights, prepare_graph
    from graphaibench_tpu.nn.optim import Adam
    from graphaibench_tpu.parallel.shard_ell import build_shard_ell

    g = uniform_random(300, 900, seed=7)
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((g.nv, 16)).astype(np.float32)
    labels = rng.integers(0, 4, g.nv).astype(np.int32)
    mask = np.ones(g.nv, dtype=np.uint8)
    tr = (0, g.nv, g.nv)
    cfg = ModelConfig(arch="gcn", num_layers=2, dim_init=16, dim_hid=8,
                      num_cls=4, lr=0.02)
    prepped = prepare_graph(g, "gcn")
    w = aggregation_weights(prepped, "gcn")
    sg = build_sharded_graph(prepped, w, mesh.devices.size)

    # the edge partition is exact: own + halo slot counts = valid edges
    def n_slots(se):
        return sum(int((np.asarray(b.edge_id) != se.sentinel).sum())
                   for b in se.fwd)

    n_all = n_slots(build_shard_ell(sg))
    n_own = n_slots(build_shard_ell(sg, part="own"))
    n_halo = n_slots(build_shard_ell(sg, part="halo"))
    assert n_own + n_halo == n_all == int(sg.edge_valid.sum())
    assert n_halo > 0  # 8-way split of a random graph must have halos

    params = init_params(cfg)
    t_ov = make_sharded_trainer(mesh, cfg, sg, feats, labels, tr, mask,
                                overlap=True)
    t_un = make_sharded_trainer(mesh, cfg, sg, feats, labels, tr, mask,
                                overlap=False)
    np.testing.assert_allclose(np.asarray(t_ov.eval_logits(params)),
                               np.asarray(t_un.eval_logits(params)),
                               rtol=1e-5, atol=1e-5)
    p1, o1 = params, Adam(lr=cfg.lr).init(params)
    p2, o2 = params, Adam(lr=cfg.lr).init(params)
    for _ in range(3):
        p1, o1, l1 = t_ov.train_step(p1, o1)
        p2, o2, l2 = t_un.train_step(p2, o2)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_distributed_pagerank_matches_serial(mesh):
    """8-shard PageRank (halo-exchange SpMM per pull iteration) must
    match the serial oracle on a directed power-law graph."""
    from graphaibench_tpu.analytics import verifiers
    from graphaibench_tpu.parallel import distributed_pagerank

    g = rmat(9, 8, seed=11)
    scores, iters = distributed_pagerank(mesh, g)
    assert 1 < iters <= 100
    ref = verifiers.pagerank_serial(g, T.reverse(g))
    np.testing.assert_allclose(scores, ref, rtol=2e-3, atol=1e-7)


def test_distributed_bfs_cc_match_serial(mesh):
    """8-shard BFS / CC (halo-exchange pull fixpoints) vs the serial
    oracles, on a symmetric graph with isolated vertices."""
    from graphaibench_tpu.analytics import verifiers
    from graphaibench_tpu.parallel import distributed_bfs, distributed_cc

    g = T.sort_and_clean(T.symmetrize(rmat(9, 6, seed=13)))
    depth, sweeps = distributed_bfs(mesh, g, 0)
    ref = verifiers.bfs_serial(g, 0)
    unreach = ref < 0 if ref.min() < 0 else ref >= 2**30
    np.testing.assert_array_equal(depth[~unreach], ref[~unreach])
    assert np.all(depth[unreach] >= 2**30)
    assert 1 < sweeps <= g.nv

    labels, _ = distributed_cc(mesh, g)
    ref_cc = verifiers.cc_serial(g)
    # same partition: labels equal iff components equal
    remap = {}
    for a, b in zip(labels, ref_cc):
        assert remap.setdefault(a, b) == b


def test_distributed_kcore_bc_match_serial(mesh):
    """8-shard k-core (bulk peeling on halo sum-pulls) and BC (Brandes
    level-synchronous fwd/bwd) vs the serial oracles, symmetric graph."""
    from graphaibench_tpu.analytics import verifiers
    from graphaibench_tpu.parallel import distributed_bc, distributed_kcore

    g = T.sort_and_clean(T.symmetrize(rmat(8, 6, seed=23)))
    core, levels = distributed_kcore(mesh, g)
    np.testing.assert_array_equal(core, verifiers.kcore_serial(g))
    assert levels >= 1

    srcs = [0, 7, 19]
    bc = distributed_bc(mesh, g, srcs)
    ref = verifiers.bc_serial(g, srcs)
    np.testing.assert_allclose(bc, ref, rtol=1e-5, atol=1e-5)


def test_analytics_cli_gab_shards_routing(monkeypatch):
    """GAB_SHARDS routes the analytics CLI onto the mesh solvers (the
    reference's *_dist_cpu / *_multigpu binaries as one CLI); the
    verifier must print Correct (exit 0) for a sharded run."""
    from graphaibench_tpu.analytics import run_benchmark

    monkeypatch.setenv("GAB_SHARDS", "8")
    for kernel in ("tc", "bfs", "kcore"):
        assert run_benchmark(
            kernel, "/root/reference/inputs/citeseer", []) == 0, kernel


def test_distributed_sssp_matches_dijkstra(mesh):
    """8-shard SSSP (min-plus pull fixpoint on packed per-slot weights)
    vs the serial Dijkstra oracle (src/traversal/verifier.cc:42-85
    analog), weighted directed graph with unreachable vertices."""
    from graphaibench_tpu.analytics import verifiers
    from graphaibench_tpu.parallel import distributed_sssp

    g = T.sort_and_clean(rmat(9, 6, seed=17))
    rng_w = np.random.default_rng(5)
    w = rng_w.uniform(0.1, 4.0, g.ne).astype(np.float32)
    dist, sweeps = distributed_sssp(mesh, g, w, 0)
    ref = verifiers.dijkstra_serial(g, w, 0)
    unreach = ~np.isfinite(ref) if ref.dtype.kind == "f" else ref < 0
    assert np.all(np.isinf(dist[unreach]))
    np.testing.assert_allclose(dist[~unreach], ref[~unreach],
                               rtol=1e-5, atol=1e-5)
    assert 1 < sweeps <= g.nv


def test_locality_order_cuts_halo():
    """Community-ordered 1-D sharding must shrink the halo on a graph
    with planted structure (vs the shuffled original)."""
    import numpy as np

    from graphaibench_tpu.graph import transforms as T
    from graphaibench_tpu.graph.csr import from_edges
    from graphaibench_tpu.parallel import build_sharded_graph

    # 8 communities of 64, dense inside, sparse across, ids shuffled
    rng = np.random.default_rng(0)
    n, k = 512, 8
    comm = rng.permutation(np.repeat(np.arange(k), n // k))
    edges = []
    for _ in range(6000):
        u, v = rng.integers(0, n, 2)
        if u != v and (comm[u] == comm[v] or rng.random() < 0.02):
            edges.append((u, v))
    src = np.array([e[0] for e in edges] + [e[1] for e in edges])
    dst = np.array([e[1] for e in edges] + [e[0] for e in edges])
    g = T.sort_and_clean(from_edges(src, dst, n))
    w = np.ones(g.ne, np.float32)

    def halo_of(gg):
        sg = build_sharded_graph(gg, np.ones(gg.ne, np.float32), 8)
        return int((sg.halo_map >= 0).sum())

    base = halo_of(g)
    perm = T.locality_order(g, "louvain")
    g2 = T.relabel(g, perm)
    assert g2.ne == g.ne
    ordered = halo_of(g2)
    assert ordered < 0.55 * base, (ordered, base)
    # bfs order also helps
    g3 = T.relabel(g, T.locality_order(g, "bfs"))
    assert halo_of(g3) < 0.9 * base


def test_train_cli_sharded_val_acc(monkeypatch, capsys):
    """GAB_SHARDS routes `cli train` onto the sharded trainer, which must
    print val accuracy at val_interval cadence and honor cfg.optimizer
    like the single-chip Model path (ADVICE r2)."""
    from graphaibench_tpu import cli

    monkeypatch.setenv("GAB_SHARDS", "4")
    # argv: arch ds epochs threads loss hidden sdrop fdrop lr layers
    #       subg_size val_interval
    rc = cli.cmd_train(["gcn", "/root/reference/inputs/cora", "5", "0",
                        "softmax", "16", "0", "0", "0.02", "2", "0", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "sharded trainer: 4 device(s)" in out
    val_lines = [l for l in out.splitlines() if "val_acc" in l]
    assert [l.split(":")[0] for l in val_lines] == ["Epoch   2", "Epoch   4"]
    acc = float(out.rsplit("Test accuracy:", 1)[1])
    assert 0.0 <= acc <= 1.0


def test_trainer_from_shard_files_matches_in_memory(mesh, tmp_path):
    """write_trainer_shards -> make_sharded_trainer_from_files rebuilds
    a trainer whose step loss equals the in-memory one exactly (the
    per-host shard-file flow; single-process path here, the 2-process
    path in tests/test_multiprocess.py)."""
    from graphaibench_tpu.nn.model import aggregation_weights, prepare_graph
    from graphaibench_tpu.nn.optim import Adam
    from graphaibench_tpu.parallel.shard_io import (
        make_sharded_trainer_from_files,
        write_trainer_shards,
    )

    g = rmat(9, 8, seed=0)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((g.nv, 16)).astype(np.float32)
    labels = rng.integers(0, 4, g.nv).astype(np.int32)
    cfg = ModelConfig(arch="gcn", num_layers=2, dim_init=16, dim_hid=16,
                      num_cls=4, lr=0.02)
    mask = np.ones(g.nv, dtype=np.uint8)
    tr = (0, g.nv, g.nv)
    prepped = prepare_graph(g, cfg.arch)
    w = aggregation_weights(prepped, cfg.arch)
    sg = build_sharded_graph(prepped, w, mesh.devices.size)

    val = ((g.nv // 2, g.nv, g.nv - g.nv // 2), mask)
    prefix = str(tmp_path / "sf")
    write_trainer_shards(prefix, cfg, sg, feats, labels, tr, mask,
                         eval_ranges={"val": val})
    t_mem = make_sharded_trainer(mesh, cfg, sg, feats, labels, tr, mask,
                                 eval_ranges={"val": val})
    t_file, cfg2 = make_sharded_trainer_from_files(mesh, prefix)
    assert cfg2 == cfg

    params = init_params(cfg)
    opt = Adam(lr=cfg.lr).init(params)
    _, _, l_mem = t_mem.train_step(params, opt)
    _, _, l_file = t_file.train_step(params, opt)
    np.testing.assert_allclose(np.asarray(l_file), np.asarray(l_mem),
                               rtol=0, atol=0)

    # in-mesh psum accuracy == host masked accuracy on gathered logits
    from graphaibench_tpu.ops import math as gmath

    logits = np.asarray(t_mem.eval_logits(params))
    idx = np.arange(g.nv)
    vmask = (idx >= g.nv // 2) & (mask != 0)
    ref_acc = float(gmath.masked_accuracy_single(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(vmask)))
    assert abs(t_mem.eval_accuracy(params, "val") - ref_acc) < 1e-9
    assert abs(t_file.eval_accuracy(params, "val") - ref_acc) < 1e-9


@pytest.mark.parametrize("shape,arch,dims", [
    ((2, 4), "gcn", (16, 8)),
    ((4, 2), "sage", (16, 8)),
    ((2, 4), "sage", (16, 8)),
    ((2, 4), "gcn", (18, 7)),    # ragged: neither dim divides M=4
    ((2, 4), "gat", (16, 8)),    # attention scalars psum + f-op bwd
    ((4, 2), "gat", (18, 7)),    # ragged GAT
])
def test_tp_trainer_matches_single_device(shape, arch, dims):
    """Tensor-parallel trainer over a 2-D (graph x model) mesh: loss
    trajectory and eval logits/accuracy must track the single-device
    Model (feature dim sharded over the model axis, vertices over the
    graph axis)."""
    from graphaibench_tpu.graph.io import GnnDataset
    from graphaibench_tpu.nn.model import aggregation_weights, prepare_graph
    from graphaibench_tpu.nn.optim import Adam
    from graphaibench_tpu.parallel import MODEL_AXIS, make_tp_trainer

    G, M = shape
    f_in, f_hid = dims
    mesh2 = Mesh(np.array(jax.devices()[:G * M]).reshape(G, M),
                 (AXIS, MODEL_AXIS))
    g = uniform_random(240, 700, seed=5)
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((g.nv, f_in)).astype(np.float32)
    labels = rng.integers(0, 5, g.nv).astype(np.int32)
    mask = np.ones(g.nv, dtype=np.uint8)
    tr = (0, 120, 120)
    ds = GnnDataset(graph=g, feats=feats, labels=labels, train_mask=mask,
                    val_mask=mask, test_mask=mask, num_classes=5,
                    train_range=tr, val_range=tr, test_range=tr)
    kw = dict(use_l2norm=True, use_dense=True) if arch == "gat" else {}
    cfg = ModelConfig(arch=arch, num_layers=2, dim_init=f_in,
                      dim_hid=f_hid, num_cls=5, lr=0.02, **kw)
    single = Model(cfg, ds)

    prepped = prepare_graph(g, arch)
    w = aggregation_weights(prepped, arch)
    sg = build_sharded_graph(prepped, w, G)   # GRAPH-axis shards
    trainer = make_tp_trainer(mesh2, cfg, sg, feats, labels, tr, mask,
                              eval_ranges={"val": (tr, mask)})

    params = init_params(cfg)
    opt_state = Adam(lr=cfg.lr).init(params)

    lg_d = np.asarray(trainer.eval_logits(params))
    lg_s = np.asarray(single._eval_logits(
        single.params, single.full.device, single.full.edge_w,
        single.feats))
    np.testing.assert_allclose(lg_d, lg_s, rtol=1e-4, atol=1e-5)

    from graphaibench_tpu.ops import math as gmath
    ref_acc = float(gmath.masked_accuracy_single(
        jnp.asarray(lg_s), jnp.asarray(labels),
        jnp.asarray((np.arange(g.nv) < 120) & (mask != 0))))
    # the oracle divides in f32; the in-mesh count ratio is exact
    assert abs(trainer.eval_accuracy(params, "val") - ref_acc) < 1e-6

    for step in range(3):
        s_loss, _ = single.train_epoch()
        params, opt_state, d_loss = trainer.train_step(params, opt_state)
        assert abs(s_loss - float(d_loss)) < 2e-4, (step, s_loss,
                                                    float(d_loss))


def test_tp_trainer_from_shard_files(tmp_path):
    """The shard-file path drives the tensor-parallel trainer too: a
    (4 graph x 2 model) mesh built from per-shard files must reproduce
    the in-memory TP trainer's step loss exactly."""
    from graphaibench_tpu.nn.model import aggregation_weights, prepare_graph
    from graphaibench_tpu.nn.optim import Adam
    from graphaibench_tpu.parallel import MODEL_AXIS, make_tp_trainer
    from graphaibench_tpu.parallel.shard_io import (
        make_sharded_trainer_from_files,
        write_trainer_shards,
    )

    mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                 (AXIS, MODEL_AXIS))
    g = uniform_random(240, 700, seed=5)
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((g.nv, 16)).astype(np.float32)
    labels = rng.integers(0, 5, g.nv).astype(np.int32)
    mask = np.ones(g.nv, dtype=np.uint8)
    tr = (0, 120, 120)
    cfg = ModelConfig(arch="gcn", num_layers=2, dim_init=16, dim_hid=8,
                      num_cls=5, lr=0.02)
    prepped = prepare_graph(g, cfg.arch)
    w = aggregation_weights(prepped, cfg.arch)
    sg = build_sharded_graph(prepped, w, 4)           # GRAPH-axis shards

    prefix = str(tmp_path / "tp")
    write_trainer_shards(prefix, cfg, sg, feats, labels, tr, mask)
    t_mem = make_tp_trainer(mesh2, cfg, sg, feats, labels, tr, mask)
    t_file, cfg2 = make_sharded_trainer_from_files(
        mesh2, prefix, model_axis=MODEL_AXIS)
    assert cfg2 == cfg

    params = init_params(cfg)
    opt = Adam(lr=cfg.lr).init(params)
    _, _, l_mem = t_mem.train_step(params, opt)
    _, _, l_file = t_file.train_step(params, opt)
    np.testing.assert_allclose(np.asarray(l_file), np.asarray(l_mem),
                               rtol=0, atol=0)


def test_edge_balanced_partition_matches_single(mesh):
    """balance="edge" (equal-edge contiguous blocks + perm row layout)
    must train identically to the single-device Model AND balance edges
    better than uniform blocks on a skewed graph."""
    from graphaibench_tpu.graph.generators import rmat
    from graphaibench_tpu.graph.io import GnnDataset
    from graphaibench_tpu.nn.model import (
        Model,
        aggregation_weights,
        prepare_graph,
    )
    from graphaibench_tpu.nn.optim import Adam

    g = rmat(9, 6, seed=4)   # power-law: uniform blocks skew badly
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((g.nv, 10)).astype(np.float32)
    labels = rng.integers(0, 4, g.nv).astype(np.int32)
    mask = np.ones(g.nv, dtype=np.uint8)
    tr = (0, g.nv // 2, g.nv // 2)
    ds = GnnDataset(graph=g, feats=feats, labels=labels, train_mask=mask,
                    val_mask=mask, test_mask=mask, num_classes=4,
                    train_range=tr, val_range=tr, test_range=tr)
    cfg = ModelConfig(arch="gcn", num_layers=2, dim_init=10, dim_hid=8,
                      num_cls=4, lr=0.02)
    single = Model(cfg, ds)
    prepped = prepare_graph(g, "gcn")
    w = aggregation_weights(prepped, "gcn")
    P_ = mesh.devices.size
    sg_u = build_sharded_graph(prepped, w, P_)
    sg_e = build_sharded_graph(prepped, w, P_, balance="edge")
    bal_u = sg_u.edge_valid.sum(1).max() / max(sg_u.edge_valid.sum(1).mean(), 1)
    bal_e = sg_e.edge_valid.sum(1).max() / max(sg_e.edge_valid.sum(1).mean(), 1)
    assert bal_e < bal_u, (bal_e, bal_u)
    assert not np.array_equal(sg_e.perm, np.arange(g.nv))  # real layout

    trainer = make_sharded_trainer(mesh, cfg, sg_e, feats, labels, tr, mask)
    params = init_params(cfg)
    opt_state = Adam(lr=cfg.lr).init(params)
    lg_d = np.asarray(trainer.eval_logits(params))
    lg_s = np.asarray(single._eval_logits(
        single.params, single.full.device, single.full.edge_w,
        single.feats))
    np.testing.assert_allclose(lg_d, lg_s, rtol=1e-4, atol=1e-5)
    for step in range(3):
        s_loss, _ = single.train_epoch()
        params, opt_state, d_loss = trainer.train_step(params, opt_state)
        assert abs(s_loss - float(d_loss)) < 2e-4, (step, s_loss)
