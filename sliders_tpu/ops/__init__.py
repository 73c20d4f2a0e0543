from sliders_tpu.ops.basic import (  # noqa: F401
    conv2d,
    group_norm,
    layer_norm,
    linear,
    timestep_embedding,
)
from sliders_tpu.ops.attention import multihead_attention, set_default_attention_impl  # noqa: F401
