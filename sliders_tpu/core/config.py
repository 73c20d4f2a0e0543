"""Config system — loads the reference's training YAMLs unchanged.

Pydantic tree mirroring the reference `RootConfig`
(trainscripts/textsliders/config_util.py:14-104): same sections, same field
names, same defaults, so `data/config.yaml` / `data/config-xl.yaml` from the
reference repo work as-is. TPU-specific knobs live in the extra
`TpuConfig` section (ignored by the reference schema, defaulted here).
"""

from __future__ import annotations

from typing import Literal, Optional

import yaml
from pydantic import BaseModel, ConfigDict

PRECISION_TYPES = Literal["fp32", "fp16", "bf16", "float32", "float16", "bfloat16"]
NETWORK_TYPES = Literal["lierla", "c3lier"]

TRAINING_METHODS = Literal[
    "noxattn",  # all layers except cross-attn and time_embed
    "innoxattn",  # all layers except cross-attn
    "selfattn",  # self-attn only
    "xattn",  # cross-attn only
    "full",  # everything
    "xattn-strict",  # cross-attn, excluding to_out
    "noxattn-hspace",  # noxattn filter, mid_block modules only
    "noxattn-hspace-last",  # noxattn filter, mid_block resnet-1 conv2 only
    # flux-sliders extras (flux-sliders/utils/lora.py:37-39)
    "xattn-up",
    "xattn-down",
    "xattn-mid",
]


class PretrainedModelConfig(BaseModel):
    name_or_path: str
    v2: bool = False
    v_pred: bool = False
    clip_skip: Optional[int] = None


class NetworkConfig(BaseModel):
    type: NETWORK_TYPES = "lierla"
    rank: int = 4
    alpha: float = 1.0
    training_method: TRAINING_METHODS = "full"


class TrainConfig(BaseModel):
    precision: PRECISION_TYPES = "bfloat16"
    noise_scheduler: Literal["ddim", "ddpm", "lms", "euler_a"] = "ddim"

    iterations: int = 500
    lr: float = 1e-4
    optimizer: str = "adamw"
    optimizer_args: str = ""
    lr_scheduler: str = "constant"

    max_denoising_steps: int = 50


class SaveConfig(BaseModel):
    name: str = "untitled"
    path: str = "./output"
    per_steps: int = 200
    precision: PRECISION_TYPES = "float32"
    # extension for saved slider weights; reference writes .pt by default
    # (train_lora.py:319) but also supports .safetensors (lora.py:245-248).
    format: Literal["safetensors", "pt"] = "safetensors"


class LoggingConfig(BaseModel):
    use_wandb: bool = False
    verbose: bool = False
    # interval for stdout metric lines (reference uses a tqdm bar per step)
    log_every: int = 10


class OtherConfig(BaseModel):
    # reference: whether to enable xformers attention (train_lora.py:68).
    # Kept for YAML compatibility; our equivalent is the attention impl knob
    # in TpuConfig.
    use_xformers: bool = False


class TpuConfig(BaseModel):
    """TPU-native extension section (absent from reference configs)."""

    model_config = ConfigDict(protected_namespaces=())

    # mesh axis sizes; -1 on dp means "all remaining devices"
    dp: int = -1
    tp: int = 1
    # attention implementation: 'auto' picks pallas flash attention on TPU
    # when shapes allow, else XLA dot-product attention.
    attention: Literal["auto", "pallas", "xla"] = "auto"
    # batch of prompt-noise samples per device per step (reference is 1 total)
    per_device_batch: int = 1
    # gradient checkpointing of transformer blocks
    remat: bool = True
    # donate buffers in the train step
    donate: bool = True
    # profile trace dir ('' disables)
    profile_dir: str = ""
    # nan guard (jax.config debug_nans equivalent at the step level)
    nan_check: bool = False
    # checkpoint-resume: save full train state every N steps ('' disables)
    state_checkpoint_every: int = 0
    # scan N reference iterations inside one compiled dispatch (amortizes
    # host->device dispatch overhead, ~70 ms/step through remote tunnels —
    # BASELINE.md). Semantics identical per step; periodic saves coarsen to
    # chunk boundaries. Only active with a single static-resolution bucket.
    steps_per_call: int = 1


from pydantic import Field, model_validator


class RootConfig(BaseModel):
    prompts_file: str
    pretrained_model: PretrainedModelConfig
    network: NetworkConfig = Field(default_factory=NetworkConfig)
    train: TrainConfig = Field(default_factory=TrainConfig)
    save: SaveConfig = Field(default_factory=SaveConfig)
    logging: LoggingConfig = Field(default_factory=LoggingConfig)
    other: OtherConfig = Field(default_factory=OtherConfig)
    tpu: TpuConfig = Field(default_factory=TpuConfig)

    @model_validator(mode="before")
    @classmethod
    def _null_sections_use_defaults(cls, values):
        # a YAML `train:` with no body parses as None -> use the defaults
        # (reference backfills missing sections, config_util.py:86-104)
        for k in ("network", "train", "save", "logging", "other", "tpu"):
            if k in values and values[k] is None:
                values.pop(k)
        return values


def load_config_from_yaml(config_path: str) -> RootConfig:
    """Reference `config_util.load_config_from_yaml` semantics: missing
    sections are backfilled with defaults (config_util.py:86-104)."""
    with open(config_path, "r") as f:
        config = yaml.safe_load(f)

    root = RootConfig(**config)
    if root.train is None:
        root.train = TrainConfig()
    if root.save is None:
        root.save = SaveConfig()
    if root.logging is None:
        root.logging = LoggingConfig()
    if root.other is None:
        root.other = OtherConfig()
    if root.tpu is None:
        root.tpu = TpuConfig()
    return root
