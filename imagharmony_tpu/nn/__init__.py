from imagharmony_tpu.nn import layers
from imagharmony_tpu.nn.layers import (
    conv2d,
    conv2d_init,
    embedding,
    embedding_init,
    group_norm,
    group_norm_init,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)

__all__ = [
    "layers",
    "linear",
    "linear_init",
    "layer_norm",
    "layer_norm_init",
    "group_norm",
    "group_norm_init",
    "conv2d",
    "conv2d_init",
    "embedding",
    "embedding_init",
]
