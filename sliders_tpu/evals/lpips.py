"""LPIPS (AlexNet) perceptual distance in JAX.

Replaces the reference's `lpips.LPIPS(net='alex')` structural-preservation
gate (eval-scripts/lpip_score.py:44,67): LPIPS between each scale's images
and the scale-0 folder at 64px. Architecture: torchvision AlexNet feature
taps relu1-5, per-channel unit normalization, squared diff, learned 1x1
non-negative linear weights, spatial mean, sum over taps (Zhang et al. 2018).

Weights load from local torch checkpoints (torchvision alexnet + the lpips
package's `alex.pth` linear weights) via `load_torch_weights`; random-init
is available for tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# lpips input normalization (the package's ScalingLayer constants)
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])

# AlexNet feature stack: (out_ch, kernel, stride, pad), maxpool after 1,2
ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}


def _conv(p, x, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, p["weight"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def alexnet_features(params: dict, x: jax.Array) -> list[jax.Array]:
    """x: (B, H, W, 3) in lpips-normalized space. Returns relu1..relu5."""
    feats = []
    for i, (_, k, s, p) in enumerate(ALEX_CONVS):
        x = jax.nn.relu(_conv(params["convs"][str(i)], x, s, p))
        feats.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return feats


def lpips_distance(params: dict, x: jax.Array, y: jax.Array) -> jax.Array:
    """x, y: (B, H, W, 3) in [-1, 1]. Returns (B,) distances."""
    xn = (x - _SHIFT) / _SCALE
    yn = (y - _SHIFT) / _SCALE
    fx = alexnet_features(params, xn)
    fy = alexnet_features(params, yn)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        d2 = (a - b) ** 2
        w = params["lins"][str(i)]["weight"]  # (C,) non-negative
        total = total + jnp.mean(jnp.sum(d2 * w, axis=-1), axis=(1, 2))
    return total


def load_torch_weights(alexnet_path: str, lpips_lin_path: str) -> dict:
    """Build params from local torch checkpoints:
    - `alexnet_path`: torchvision alexnet state_dict (.pth)
    - `lpips_lin_path`: lpips package 'alex.pth' (lin0..lin4 1x1 conv weights)
    """
    import torch

    alex = torch.load(alexnet_path, map_location="cpu", weights_only=True)
    lins = torch.load(lpips_lin_path, map_location="cpu", weights_only=True)
    convs = {}
    # torchvision features indices of the conv layers
    conv_idx = [0, 3, 6, 8, 10]
    for i, idx in enumerate(conv_idx):
        w = alex[f"features.{idx}.weight"].numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
        b = alex[f"features.{idx}.bias"].numpy()
        convs[str(i)] = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
    lin_p = {}
    for i in range(5):
        w = lins[f"lin{i}.model.1.weight"].numpy()  # (1, C, 1, 1)
        lin_p[str(i)] = {"weight": jnp.asarray(w[0, :, 0, 0])}
    return {"convs": convs, "lins": lin_p}


def init_params(key) -> dict:
    """Random init with the real architecture (tests / smoke only — not a
    perceptual metric without trained weights)."""
    convs = {}
    in_c = 3
    for i, (out_c, k, _, _) in enumerate(ALEX_CONVS):
        kk = jax.random.fold_in(key, i)
        convs[str(i)] = {
            "weight": jax.random.normal(kk, (k, k, in_c, out_c)) * (in_c * k * k) ** -0.5,
            "bias": jnp.zeros((out_c,)),
        }
        in_c = out_c
    lins = {
        str(i): {"weight": jnp.abs(jax.random.normal(jax.random.fold_in(key, 100 + i), (c,))) * 0.1}
        for i, (c, _, _, _) in enumerate(ALEX_CONVS)
    }
    return {"convs": convs, "lins": lins}


def load_image_64(path: str) -> jnp.ndarray:
    """Reference loader contract (lpip_score.py:22-33): shortest side -> 64
    (bilinear), to [-1, 1]."""
    import numpy as np
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    if w < h:
        nw, nh = 64, round(h * 64 / w)
    else:
        nw, nh = round(w * 64 / h), 64
    img = img.resize((nw, nh), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    return jnp.asarray((arr - 0.5) * 2.0)[None]
