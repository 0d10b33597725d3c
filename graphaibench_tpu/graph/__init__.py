from graphaibench_tpu.graph.csr import CSRGraph, from_edges  # noqa: F401
from graphaibench_tpu.graph.io import (  # noqa: F401
    GnnDataset,
    Meta,
    load_gnn_dataset,
    load_graph,
    read_meta,
    save_graph,
)
from graphaibench_tpu.graph import transforms  # noqa: F401
