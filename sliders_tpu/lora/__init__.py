from sliders_tpu.lora.network import create_slider_network, target_module_paths  # noqa: F401
from sliders_tpu.ops.basic import SliderLora  # noqa: F401
