from sliders_tpu.diffusion.schedulers import (  # noqa: F401
    DiffusionSchedule,
    Sampler,
    make_sampler,
    make_schedule,
)
