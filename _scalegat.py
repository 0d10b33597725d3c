import time, numpy as np
from graphaibench_tpu.graph.csr import CSRGraph
from graphaibench_tpu.graph.io import GnnDataset
from graphaibench_tpu.nn.layers import ModelConfig
from graphaibench_tpu.nn.model import Model

g = CSRGraph(row_ptr=np.load("/tmp/r20/rp.npy"), col_idx=np.load("/tmp/r20/ci.npy"))
rng = np.random.default_rng(0)
x = rng.standard_normal((g.nv, 128)).astype(np.float32)
labels = rng.integers(0, 16, g.nv).astype(np.int32)
mask = np.ones(g.nv, dtype=np.uint8); tr = (0, g.nv, g.nv)
ds = GnnDataset(graph=g, feats=x, labels=labels, train_mask=mask, val_mask=mask,
                test_mask=mask, num_classes=16, train_range=tr, val_range=tr, test_range=tr)
for arch in ("gat", "ggnn"):
    cfg = ModelConfig(arch=arch, num_layers=2 if arch == "gat" else 1,
                      dim_init=128, dim_hid=128, num_cls=16, lr=0.01)
    t0=time.perf_counter()
    m = Model(cfg, ds)
    print(f"{arch} build {time.perf_counter()-t0:.0f}s", flush=True)
    t0=time.perf_counter(); l, a = m.train_epochs(3); t1=time.perf_counter()
    t2=time.perf_counter(); l, a = m.train_epochs(3); t3=time.perf_counter()
    assert np.isfinite(l).all(), l
    print(f"{arch} rmat20: first3 {t1-t0:.0f}s warm {(t3-t2)/3*1e3:.0f} ms/epoch last_loss={l[-1]:.3f}", flush=True)
