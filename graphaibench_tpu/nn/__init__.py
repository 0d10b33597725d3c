from graphaibench_tpu.nn.layers import (  # noqa: F401
    ModelConfig,
    apply_model,
    init_params,
    make_config,
)
from graphaibench_tpu.nn.losses import masked_sigmoid_loss, masked_softmax_loss  # noqa: F401
from graphaibench_tpu.nn.model import GraphBundle, Model  # noqa: F401
from graphaibench_tpu.nn.optim import OPTIMIZERS, Adam  # noqa: F401
