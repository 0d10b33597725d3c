from graphaibench_tpu.parallel.partition import ShardedGraph, build_sharded_graph, pad_rows  # noqa: F401
from graphaibench_tpu.parallel.halo import AXIS, halo_exchange, make_sharded_spmm  # noqa: F401
from graphaibench_tpu.parallel.train import (  # noqa: F401
    MODEL_AXIS,
    ShardedTrainer,
    make_sharded_trainer,
    make_tp_trainer,
)
from graphaibench_tpu.parallel.dist_analytics import (  # noqa: F401
    distributed_bfs,
    distributed_cc,
    distributed_sssp,
    distributed_kcore,
    distributed_bc,
    distributed_pagerank,
    distributed_triangle_count,
)
