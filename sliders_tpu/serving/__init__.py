from sliders_tpu.serving.server import SliderEngine, make_http_server  # noqa: F401
