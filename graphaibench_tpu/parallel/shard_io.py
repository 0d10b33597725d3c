"""Per-host shard files for multi-host training.

The reference's distributed solvers never load the global graph on
every rank: an offline partitioner writes per-PE files and each rank
reads only its own (`<prefix>-part<rank>`, graph_partition.cc:18-35,
consumed by multigpu_nvshmem.cu:13-120). This module is that flow for
the sharded trainer: ``write_trainer_shards`` runs the full host prep
ONCE offline (topology, halo-exchange plan, ELL layouts, feature/label
slices — all padding maxima are computed globally so every shard file
has identical leaf shapes) and persists one pickle per shard;
``make_sharded_trainer_from_files`` has each process load only the
shards its devices own and assembles the global device arrays with
``jax.make_array_from_process_local_data``.

Tested by the REAL 2-process jax.distributed run
(tools/multiprocess_smoke.py / tests/test_multiprocess.py): the
file-loaded trainer's loss equals the in-memory trainer's exactly.
"""

from __future__ import annotations

import dataclasses
import os
import pickle

import jax
import numpy as np

from graphaibench_tpu.nn.layers import ModelConfig
from graphaibench_tpu.parallel.halo import AXIS
from graphaibench_tpu.parallel.train import (
    ShardedTrainer,
    prepare_trainer_host,
    trainer_from_host,
)

_FORMAT = 1


def _slice_host(host: dict, p: int) -> dict:
    """Shard p's slice of every trainer host array (leading axis kept
    at length 1 for the stacked groups; vertex arrays sliced by the
    owned row range)."""
    nv_pad = host["nv_pad"]
    rows = slice(p * nv_pad, (p + 1) * nv_pad)
    take = lambda a: np.asarray(a)[p:p + 1]
    return dict(
        x=np.asarray(host["x"])[rows],
        lab=np.asarray(host["lab"])[rows],
        valid=np.asarray(host["valid"])[rows],
        ga={k: take(v) for k, v in host["ga"].items()},
        ell=jax.tree.map(take, host["ell"]),
        eval_masks={k: np.asarray(v)[rows]
                    for k, v in host["eval_masks"].items()},
    )


def write_trainer_shards(
    prefix: str,
    cfg: ModelConfig,
    sg,
    feats: np.ndarray,
    labels: np.ndarray,
    train_range: tuple[int, int, int],
    train_mask: np.ndarray,
    *,
    use_ell: bool = True,
    overlap: bool = True,
    eval_ranges: dict | None = None,
) -> None:
    """Offline step: prepare the full trainer host state and write
    ``<prefix>-shard<p>.pkl`` per shard. Every file carries the shared
    metadata (cfg, scalars), so any process can bootstrap from its own
    shards alone."""
    host = prepare_trainer_host(cfg, sg, feats, labels, train_range,
                                train_mask, use_ell=use_ell,
                                overlap=overlap, eval_ranges=eval_ranges)
    meta = dict(
        format=_FORMAT,
        # per-write nonce: every shard of one write carries the same
        # value, so a loader can detect files mixed across generations
        # (an interrupted rewrite of an existing prefix would otherwise
        # splice old and new shards with identical shapes)
        write_id=os.urandom(8).hex(),
        cfg=dataclasses.asdict(cfg),
        nv=host["nv"], nv_pad=host["nv_pad"],
        num_shards=host["num_shards"],
        begin=host["begin"], end=host["end"], count=host["count"],
    )
    os.makedirs(os.path.dirname(os.path.abspath(prefix)), exist_ok=True)
    for p in range(host["num_shards"]):
        rec = _slice_host(host, p)
        rec["meta"] = meta
        tmp = f"{prefix}-shard{p}.pkl.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(rec, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, f"{prefix}-shard{p}.pkl")


def local_shard_ids(mesh) -> list[int]:
    """Mesh positions owned by this process (pod_mesh is host-major, so
    they are contiguous)."""
    pid = jax.process_index()
    return [i for i, d in enumerate(mesh.devices.flat)
            if d.process_index == pid]


def load_local_shards(prefix: str,
                      shard_ids: list[int]) -> tuple[dict, dict]:
    """Concatenate the listed shard files into this process's local
    slab of every trainer host array. Returns (host_arrays, meta)."""
    recs = []
    for p in shard_ids:
        with open(f"{prefix}-shard{p}.pkl", "rb") as f:
            recs.append(pickle.load(f))
    meta = recs[0]["meta"]
    if meta.get("format") != _FORMAT:
        raise ValueError(f"unsupported shard-file format: {meta}")
    for p, r in zip(shard_ids, recs):
        if r["meta"] != meta:
            raise ValueError(
                f"shard {p} is from a different write generation "
                f"(write_id {r['meta'].get('write_id')} != "
                f"{meta.get('write_id')}) — rewrite the prefix")
    cat = lambda key: np.concatenate([r[key] for r in recs], axis=0)
    host = dict(
        x=cat("x"), lab=cat("lab"), valid=cat("valid"),
        ga={k: np.concatenate([r["ga"][k] for r in recs], axis=0)
            for k in recs[0]["ga"]},
        ell=jax.tree.map(
            lambda *leaves: np.concatenate(leaves, axis=0),
            *[r["ell"] for r in recs]),
        eval_masks={k: np.concatenate([r["eval_masks"][k] for r in recs],
                                      axis=0)
                    for k in recs[0]["eval_masks"]},
        **{k: meta[k] for k in ("nv", "nv_pad", "num_shards", "begin",
                                "end", "count")},
    )
    return host, meta


def make_sharded_trainer_from_files(
    mesh,
    prefix: str,
    *,
    optimizer: str = "adam",
    axis: str = AXIS,
    model_axis: str | None = None,
) -> tuple[ShardedTrainer, ModelConfig]:
    """Build the sharded trainer with each process reading ONLY the
    shard files its mesh devices own — no process ever materializes the
    global graph or feature matrix. With ``model_axis`` set (2-D mesh),
    the tensor-parallel forward runs; shard files are per GRAPH shard
    (replicated over the model axis), so a process's shard ids are the
    distinct graph coordinates of its devices."""
    if model_axis is None:
        ids = local_shard_ids(mesh)
        graph_dim = mesh.devices.size
    else:
        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        graph_dim = axes[axis]
        g_pos = np.argmax(np.asarray(mesh.axis_names) == axis)
        pid = jax.process_index()
        mine = [idx[g_pos] for idx, d in np.ndenumerate(mesh.devices)
                if d.process_index == pid]
        ids = sorted(set(int(i) for i in mine))
    host, meta = load_local_shards(prefix, ids)
    P_total = meta["num_shards"]
    assert P_total == graph_dim, (P_total, graph_dim)
    cfg = ModelConfig(**meta["cfg"])
    scale = P_total // len(ids)

    from jax.sharding import NamedSharding

    def put(local, spec):
        local = np.asarray(local)
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(local, sharding)
        gshape = (local.shape[0] * scale,) + local.shape[1:]
        return jax.make_array_from_process_local_data(sharding, local,
                                                      gshape)

    trainer = trainer_from_host(mesh, cfg, host, put, optimizer=optimizer,
                                axis=axis, model_axis=model_axis)
    return trainer, cfg
