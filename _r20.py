import time, numpy as np
from graphaibench_tpu.graph.csr import CSRGraph
from graphaibench_tpu.graph.io import GnnDataset
from graphaibench_tpu.nn.layers import ModelConfig
from graphaibench_tpu.nn.model import Model
from graphaibench_tpu.analytics.tc import triangle_count

g = CSRGraph(row_ptr=np.load("/tmp/r20/rp.npy"), col_idx=np.load("/tmp/r20/ci.npy"))
print(f"loaded nv={g.nv} ne={g.ne}", flush=True)
rng = np.random.default_rng(0)
x = rng.standard_normal((g.nv, 128)).astype(np.float32)
labels = rng.integers(0, 16, g.nv).astype(np.int32)
mask = np.ones(g.nv, dtype=np.uint8); tr = (0, g.nv, g.nv)
ds = GnnDataset(graph=g, feats=x, labels=labels, train_mask=mask, val_mask=mask,
                test_mask=mask, num_classes=16, train_range=tr, val_range=tr, test_range=tr)
cfg = ModelConfig(arch="gcn", num_layers=2, dim_init=128, dim_hid=128, num_cls=16, lr=0.01)
t0=time.perf_counter()
m = Model(cfg, ds)
print(f"model build+upload {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter(); m.train_epoch(); print(f"first epoch (compile) {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
for _ in range(5): m.train_epoch()
print(f"GCN epoch rmat20: {(time.perf_counter()-t0)/5*1e3:.0f} ms", flush=True)
t0=time.perf_counter(); n = triangle_count(g); t1=time.perf_counter()
t2=time.perf_counter(); n2 = triangle_count(g); t3=time.perf_counter()
assert n == n2
print(f"tc rmat20: tri={n} first={t1-t0:.1f}s warm={t3-t2:.2f}s", flush=True)
