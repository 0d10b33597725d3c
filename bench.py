"""Headline benchmark: SpMM edges/s/chip (the BASELINE.json north-star
kernel metric) on a power-law RMAT graph, plus full GCN/GAT epoch times
at rmat17 and rmat20.

Prints ONE JSON line:
  {"metric": "spmm_edges_per_s", "value": ..., "unit": "edges/s",
   "vs_baseline": <fraction of the measured pure-gather roofline>}

Failure hardening (round-2 postmortem: BENCH_r02.json was an rc=1
tunnel-outage record and the already-computed rmat17 numbers were lost):
  - backend init is retried with backoff before giving up;
  - every section runs under _section(), which stashes its numbers as
    they are produced and converts an exception into an `errors` entry;
  - the final JSON line is emitted from whatever was captured, with
    missing fields null — mirroring how the reference prints results
    incrementally as each stage completes (train.cpp:39-76).
A totally dead backend still prints a parsable line with value=null.

Methodology: every timing runs K iterations INSIDE one jit via
lax.fori_loop — dispatch through the device tunnel costs ~10ms, so
per-call host timing measures latency, not throughput. The roofline is
the chip's measured random row-gather rate on the same row size (the
TPU gather unit is row-rate-bound for rows <= 512 B); an SpMM cannot
beat the gather that feeds it, so vs_baseline = spmm_rate / gather_bound
is the honest speed-of-light fraction. The reference publishes no
absolute GNN numbers (src/gnn/README.md "TBD")."""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time

import numpy as np

EXTRA: dict = {}
ERRORS: dict = {}
HEADLINE: dict = {"edges_per_s": None, "sol_edges_per_s": None}

# test hooks (tests/test_bench_harness.py): force a section to throw /
# shrink graph sizes so the hardening itself is testable on CPU
_FAULTS = set(filter(None, os.environ.get("GAB_BENCH_FAULT", "").split(",")))

# wall-clock budget for the WHOLE bench run. Round-3 postmortem: the
# driver killed bench.py mid-rmat20 (rc=124) and the record — printed
# only at the very end — was lost. Two defenses now: (a) the cumulative
# record line is re-printed after EVERY section (the driver parses the
# last JSON line, so a timeout keeps everything measured so far), and
# (b) sections that would start past the budget are skipped so the run
# exits 0 with a partial-but-parsed record.
_T_START = time.perf_counter()
_BUDGET_S = float(os.environ.get("GAB_BENCH_BUDGET_S", "1500"))


def _elapsed() -> float:
    return time.perf_counter() - _T_START


def _maybe_fault(name: str):
    if name in _FAULTS:
        raise RuntimeError(f"injected fault ({name})")


class _SkipSection(Exception):
    pass


def _emit():
    """Print the cumulative record as one JSON line (the driver parses
    the LAST JSON line on stdout, so each section makes the on-disk
    result strictly better — mirroring the reference's incremental
    per-stage self-reporting, src/gnn/train.cpp:60-76)."""
    value = HEADLINE["edges_per_s"]
    sol = HEADLINE["sol_edges_per_s"]
    record = {
        "metric": "spmm_edges_per_s",
        "value": None if value is None else float(value),
        "unit": "edges/s",
        "vs_baseline": (None if value is None or not sol
                        else float(value / sol)),
        "extra": EXTRA,
    }
    if ERRORS:
        record["errors"] = ERRORS
    print(json.dumps(record), flush=True)


@contextlib.contextmanager
def _section(name: str):
    """Run one bench section; on failure record the error and move on so
    the sections already measured still reach the final JSON line.
    Yields a fault-check callable the body invokes first (test hook)."""
    t0 = time.perf_counter()

    def _gate():
        # budget guard first: a section that would START past the
        # budget is skipped so the run exits 0 with a partial record
        if _elapsed() > _BUDGET_S:
            raise _SkipSection
        _maybe_fault(name)

    try:
        yield _gate
        print(f"[bench] {name} ok ({time.perf_counter() - t0:.1f}s)",
              file=sys.stderr)
    except _SkipSection:
        EXTRA.setdefault("skipped_over_budget", []).append(name)
        print(f"[bench] {name} SKIPPED: over budget "
              f"({_elapsed():.0f}s > {_BUDGET_S:.0f}s)", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 - any failure must not kill the record
        ERRORS[name] = f"{type(e).__name__}: {e}"[:300]
        print(f"[bench] {name} FAILED: {ERRORS[name]}", file=sys.stderr)
    _emit()


def _init_backend(retries: int | None = None, backoff_s: float | None = None):
    """Initialize the jax backend, retrying transient tunnel outages."""
    import jax

    retries = retries or int(os.environ.get("GAB_BENCH_RETRIES", "3"))
    # persistent compile cache: jit-through-the-tunnel compiles cost
    # 10-60 s each; caching serialized executables across bench runs
    # keeps the driver's end-of-round run inside its budget. If the
    # backend's executables aren't serializable jax just logs and
    # compiles as before.
    try:
        import jax

        cache_dir = os.environ.get(
            "GAB_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"))
        if cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass
    if backoff_s is None:
        backoff_s = float(os.environ.get("GAB_BENCH_BACKOFF_S", "60"))
    # the installed axon plugin force-appends itself and ignores the
    # JAX_PLATFORMS env var (CLAUDE.md); tests pin the platform here
    plat = os.environ.get("GAB_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    for attempt in range(retries):
        try:
            devs = jax.devices()
            print(f"[bench] backend up: {devs[0].platform} x{len(devs)}",
                  file=sys.stderr)
            # a transient failure followed by a successful retry is a
            # healthy run — don't leave a stale errors entry
            ERRORS.pop("backend_init", None)
            return True
        except Exception as e:  # noqa: BLE001
            ERRORS["backend_init"] = f"{type(e).__name__}: {e}"[:300]
            print(f"[bench] backend init attempt {attempt + 1}/{retries} "
                  f"failed: {ERRORS['backend_init']}", file=sys.stderr)
            if attempt + 1 < retries:
                time.sleep(backoff_s)
    return False


def _bench_looped(f, init, iters, *args):
    """Median-of-3 timed runs, each on a FRESH input with the result
    value fetched: through the tunnelled TPU, identical repeat
    executions can be served from a cache and block_until_ready can
    return early (see CLAUDE.md), so neither repeats nor bare blocking
    are trustworthy.

    Every array/pytree operand MUST ride in ``*args`` — a closed-over
    device array is serialized into the remote compile request, and at
    rmat20 the seg-ELL layout alone exceeds the tunnel's request limit
    (HTTP 413, observed; CLAUDE.md rule)."""
    import jax

    run = jax.jit(lambda c, *a: jax.lax.fori_loop(
        0, iters, lambda i, v: f(i, v, *a), c))
    _ = np.asarray(run(init, *args)[0])  # compile + force (tiny slice fetch)
    times = []
    for k in range(3):
        init_k = init + np.float32(1e-6) * (k + 1)
        _ = np.asarray(init_k[0])           # materialize input first
        t0 = time.perf_counter()
        out = run(init_k, *args)
        _ = np.asarray(out[0])              # force execution; fetch one row
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1]


def _timed_epochs(model, epochs, retries=1):
    """Median-free epoch timing: one compile pass, one timed pass.
    The remote compile helper has failed transiently with HTTP 500 on
    the largest programs (round-3 session: rmat20 fwd+bwd epochs), so
    the compile attempt is retried once before the section gives up."""
    for attempt in range(retries + 1):
        try:
            model.train_epochs(epochs)  # compile
            break
        except Exception:  # noqa: BLE001 - transient remote-compile 500s
            if attempt == retries:
                raise
            print(f"[bench] epoch compile failed (attempt {attempt + 1}), "
                  "retrying", file=sys.stderr)
            time.sleep(20)
    t0 = time.perf_counter()
    model.train_epochs(epochs)
    return (time.perf_counter() - t0) / epochs


def main():
    headline = HEADLINE

    if _init_backend():
        import jax.numpy as jnp

        from graphaibench_tpu.graph.generators import rmat
        from graphaibench_tpu.graph.io import GnnDataset
        from graphaibench_tpu.nn.layers import ModelConfig
        from graphaibench_tpu.nn.model import GraphBundle, Model
        from graphaibench_tpu.ops.spmm import spmm_ell

        scale = int(os.environ.get("GAB_BENCH_SCALE", "17"))
        ef, feat = (16, 128) if scale >= 17 else (8, 16)
        scale20 = int(os.environ.get("GAB_BENCH_SCALE20", "20"))
        ef20 = 32 if scale20 >= 20 else 8
        rng = np.random.default_rng(0)
        g = gb = x = ds = None

        def make_ds(graph, feats):
            labels = rng.integers(0, 16, graph.nv).astype(np.int32)
            mask = np.ones(graph.nv, dtype=np.uint8)
            tr = (0, graph.nv, graph.nv)
            return GnnDataset(graph=graph, feats=np.asarray(feats),
                              labels=labels, train_mask=mask, val_mask=mask,
                              test_mask=mask, num_classes=16, train_range=tr,
                              val_range=tr, test_range=tr)

        with _section("rmat17_spmm") as chk:
            chk()
            g = rmat(scale, ef, seed=0, cache=True)
            gb = GraphBundle.build(g, "gcn")
            nv, ne = gb.host.nv, gb.host.ne
            x = jnp.asarray(rng.standard_normal((nv, feat)).astype(np.float32))
            # SpMM throughput (best strategy for this size: ELL; packed
            # static weights = the production training path)
            dt = _bench_looped(
                lambda i, v, dg, w: spmm_ell(dg, w, v), x, 20,
                gb.device, gb.edge_w_agg)
            headline["edges_per_s"] = ne / dt
            from graphaibench_tpu.ops.device_graph import iter_buckets_sliced
            slots = sum(b.nbr.size for b, _ in iter_buckets_sliced(gb.device))
            EXTRA["graph"] = f"rmat{scale} nv={nv} ne={ne} feat={feat}"
            EXTRA["spmm_ms"] = dt * 1e3
            EXTRA["ell_padding_overhead"] = slots / ne

        with _section("rmat17_roofline") as chk:
            chk()
            # roofline: pure weighted row-gather of the same number of
            # padded rows (iteration-dependent indices defeat
            # constant-folding rewrites)
            from graphaibench_tpu.ops.device_graph import iter_buckets_sliced
            slots = sum(b.nbr.size for b, _ in iter_buckets_sliced(gb.device))
            idx = jnp.asarray(rng.integers(0, g.nv, slots).astype(np.int32))
            wg = jnp.asarray(rng.standard_normal(slots).astype(np.float32))

            def gather_only(i, acc, xs, idxs, wgs):
                shifted = (idxs + i) % g.nv
                return acc + (xs[shifted] * wgs[:, None]).sum(0)

            dt_g = _bench_looped(gather_only, jnp.zeros(feat), 10, x, idx, wg)
            gather_rows_per_s = slots / dt_g
            headline["sol_edges_per_s"] = gather_rows_per_s * g.ne / slots
            EXTRA["gather_rows_per_s"] = float(gather_rows_per_s)
            EXTRA["sol_edges_per_s"] = float(headline["sol_edges_per_s"])

        with _section("rmat17_gcn_epoch") as chk:
            chk()
            ds = make_ds(g, x)
            cfg = ModelConfig(arch="gcn", num_layers=2, dim_init=feat,
                              dim_hid=128, num_cls=16, lr=0.01)
            EXTRA["gcn_epoch_s"] = _timed_epochs(Model(cfg, ds), 10)

        with _section("rmat17_gat_epoch") as chk:
            chk()
            cfg_gat = ModelConfig(arch="gat", num_layers=2, dim_init=feat,
                                  dim_hid=128, num_cls=16, lr=0.01)
            EXTRA["gat_epoch_s"] = _timed_epochs(Model(cfg_gat, ds), 10)

        # --- scale regime: rmat20 (1M v / 32M e), where the gather-
        # locality cliff lives (CLAUDE.md scale findings). Each sub-
        # section is isolated so an OOM here never erases the rmat17
        # record above.
        import gc

        del gb, ds
        # every big object is cleared AFTER its section whether or not
        # the section threw — a failed body's partially-built buffers
        # must not cascade the OOM into the later sections
        g20 = x20 = ds20 = gb20 = m20 = m20g = None
        gc.collect()

        with _section("rmat20_spmm") as chk:
            chk()
            g20 = rmat(scale20, ef20, seed=0)
            gb20 = GraphBundle.build(g20, "gcn")
            x20 = jnp.asarray(
                rng.standard_normal((g20.nv, feat)).astype(np.float32))
            dt20 = _bench_looped(
                lambda i, v, dg, w: spmm_ell(dg, w, v), x20, 5,
                gb20.device, gb20.edge_w_agg)
            EXTRA["rmat20_spmm_ms"] = dt20 * 1e3
            EXTRA["rmat20_spmm_edges_per_s"] = g20.ne / dt20
        gb20 = None
        gc.collect()

        def _epoch_with_layout_fallback(arch, key):
            """Time the full-batch epoch on the default (segmented)
            layout; if remote compilation fails deterministically — the
            tunnel's compile helper has a program-size ceiling and the
            rmat20 seg-ELL fwd+bwd program exceeded it in round 3 — the
            plain ELL layout (8x fewer unrolled gather stages) is
            retried and the record says which layout the number belongs
            to. The retry happens OUTSIDE the except block: the caught
            exception's traceback pins the failed seg-ELL Model's
            frames, and ~1+ GB of seg device-graph HBM must be freed
            before the fallback Model compiles."""
            cfg = ModelConfig(arch=arch, num_layers=2, dim_init=feat,
                              dim_hid=128, num_cls=16, lr=0.01)
            # honor a pre-set GAB_SEG_ELL (operator escape hatch): label
            # the first attempt by the layout that actually ran
            prior = os.environ.get("GAB_SEG_ELL")
            seg_off = (prior is not None and
                       prior.strip().lower() in ("0", "false", "off", "no"))
            try:
                model = Model(cfg, ds20)
                # label by the layout the model ACTUALLY built (GAT
                # auto-plains even at scale — measured faster)
                actual = ("seg_ell" if model.training.device.seg_ell
                          is not None else "plain_ell")
                EXTRA[key] = _timed_epochs(model, 3)
                EXTRA[key + "_layout"] = (actual + "_env" if seg_off
                                          else actual)
                del model
                return
            except Exception as e:  # noqa: BLE001 - fall back below
                ERRORS[key + "_seg"] = f"{type(e).__name__}: {e}"[:300]
                print(f"[bench] {key} first layout failed "
                      f"({type(e).__name__}); retrying on plain ELL",
                      file=sys.stderr)
            if seg_off:  # already plain — nothing smaller to retry on
                raise RuntimeError(ERRORS[key + "_seg"])
            gc.collect()
            os.environ["GAB_SEG_ELL"] = "0"
            try:
                EXTRA[key] = _timed_epochs(Model(cfg, ds20), 3)
                EXTRA[key + "_layout"] = "plain_ell_fallback"
            finally:
                if prior is None:
                    del os.environ["GAB_SEG_ELL"]
                else:
                    os.environ["GAB_SEG_ELL"] = prior

        with _section("rmat20_gcn_epoch") as chk:
            chk()
            ds20 = make_ds(g20, x20)
            x20 = None
            gc.collect()
            _epoch_with_layout_fallback("gcn", "rmat20_gcn_epoch_s")
        m20 = x20 = None
        gc.collect()

        with _section("rmat20_gat_epoch") as chk:
            chk()
            if ds20 is None:
                raise RuntimeError(
                    "rmat20 dataset unavailable (gcn section failed)")
            _epoch_with_layout_fallback("gat", "rmat20_gat_epoch_s")
        m20g = None
        gc.collect()

    _emit()  # final (same cumulative record the last section printed)


if __name__ == "__main__":
    main()
