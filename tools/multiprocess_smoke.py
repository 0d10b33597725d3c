"""Two-process jax.distributed smoke — the DCN-path proof.

Each process runs this script with a distinct process id; together they
bring up the distributed runtime (the reference's MPI bootstrap analog,
include/dist.h:29-42), build the host-major pod mesh spanning BOTH
processes' CPU devices, and run one sharded GNN train step whose
gradient psum crosses the process boundary.

  python tools/multiprocess_smoke.py <pid> <nproc> <port>

Launched by tests/test_multiprocess.py; also runnable by hand.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    # 2 virtual CPU devices per process -> a 4-device pod mesh
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # pin the platform BEFORE backend init (the axon TPU plugin would
    # otherwise win and report process_count()==1)
    jax.config.update("jax_platforms", "cpu")
    # CPU multi-process needs a cross-process collectives backend; gloo
    # ships with jaxlib (the MPI analog for the CPU client)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from graphaibench_tpu.parallel import multihost

    assert multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()

    import numpy as np

    from graphaibench_tpu.graph.generators import rmat
    from graphaibench_tpu.nn.layers import ModelConfig, init_params
    from graphaibench_tpu.nn.model import aggregation_weights, prepare_graph
    from graphaibench_tpu.nn.optim import Adam
    from graphaibench_tpu.parallel import build_sharded_graph, make_sharded_trainer

    mesh = multihost.pod_mesh()
    n = mesh.devices.size
    assert n == 2 * nproc, n  # devices from every process present

    g = rmat(9, 8, seed=0)
    rng = np.random.default_rng(0)
    feat, ncls = 16, 4
    feats = rng.standard_normal((g.nv, feat)).astype(np.float32)
    labels = rng.integers(0, ncls, g.nv).astype(np.int32)
    cfg = ModelConfig(arch="gcn", num_layers=2, dim_init=feat, dim_hid=16,
                      num_cls=ncls, lr=0.02)
    prepped = prepare_graph(g, cfg.arch)
    w = aggregation_weights(prepped, cfg.arch)
    sg = build_sharded_graph(prepped, w, n)
    mask = np.ones(g.nv, dtype=np.uint8)
    tr = (0, g.nv // 2, g.nv // 2)
    trainer = make_sharded_trainer(mesh, cfg, sg, feats, labels, tr, mask)
    params = init_params(cfg)
    opt_state = Adam(lr=cfg.lr).init(params)
    _p, _o, loss = trainer.train_step(params, opt_state)
    # loss is replicated across the mesh; fetching it is process-local
    loss = float(jax.device_get(jax.tree.leaves(loss)[0]))
    assert np.isfinite(loss), loss
    print(f"MPSMOKE pid={pid} procs={jax.process_count()} "
          f"devices={n} loss={loss:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
