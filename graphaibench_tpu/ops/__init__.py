from graphaibench_tpu.ops.device_graph import DeviceGraph, to_device_graph  # noqa: F401
from graphaibench_tpu.ops.spmm import (  # noqa: F401
    sddmm_add,
    sddmm_dot,
    spmm,
    spmm_coo,
    spmm_dense,
    spmm_ell,
)
from graphaibench_tpu.ops.segment import segment_softmax, segment_softmax_vjp  # noqa: F401
from graphaibench_tpu.ops.rng import glorot_reference, uniform_reference  # noqa: F401
