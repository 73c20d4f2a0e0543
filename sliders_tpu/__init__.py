"""sliders_tpu — a TPU-native JAX framework for Concept Sliders.

From-scratch reimplementation of the capabilities of rohitgandikota/sliders
(Concept Sliders, ECCV 2024): rank-r LoRA "slider" adapters that give a single
scalar continuous control over semantic attributes in diffusion models.

Design (see SURVEY.md for the reference analysis):
  - models/     own JAX implementations of CLIP text encoders, SD1/SD2/SDXL
                UNets, the VAE, and FLUX MMDiT, with HF-safetensors converters.
  - ops/        compute primitives: attention (Pallas flash attention on TPU),
                group norm, functional linear/conv with LoRA hooks.
  - lora/       functional LoRA: params live in their own pytree; the slider
                scale is a traced scalar (no monkey patching, no recompiles).
  - diffusion/  schedulers as pure functions over precomputed tables.
  - prompts/    prompt-pair objective (reference prompt_util.py semantics).
  - training/   jitted slider train steps (text + image sliders).
  - pipelines/  samplers with start-noise slider gating, inversion/editing.
  - parallel/   mesh + sharding rules (dp/tp) for multi-chip TPU.
  - evals/      CLIP-score / LPIPS harness.
"""

__version__ = "0.1.0"
