"""Native C++ image loader: build, PIL parity, error paths.

Skips (not fails) when the toolchain or image libraries are absent — the
loader itself falls back to PIL in that case (native_loader.load_batch)."""

import os

import numpy as np
import pytest

from sliders_tpu.data import native_loader
from sliders_tpu.data.paired_images import preprocess_image


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (w, h) in enumerate([(96, 64), (64, 64), (50, 120)]):
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        a = ((a.astype(np.float32) + np.roll(a, 1, 0)) / 2).astype(np.uint8)
        p = str(d / f"im{i}.png")
        Image.fromarray(a).save(p)
        paths.append(p)
        j = str(d / f"im{i}.jpg")
        Image.fromarray(a).save(j, quality=95)
        paths.append(j)
    return paths


def test_pil_parity(images):
    """Decode + bicubic resize + normalize matches the PIL path up to
    PIL's fixed-point coefficient quantization."""
    if not native_loader.available():
        pytest.skip("native loader did not build")
    from PIL import Image

    out = native_loader.load_batch(images, 48)
    ref = np.stack([preprocess_image(Image.open(p), 48) for p in images])
    assert out.shape == ref.shape == (len(images), 48, 48, 3)
    # PIL quantizes each separable pass to u8 (int16 fixed-point coeffs);
    # the native loader keeps float between passes — ≤ ~5/255 on noisy
    # images at aggressive downscales, ≤ 1/255 on natural images
    assert np.abs(out - ref).max() < 0.04


def test_missing_file_raises(images):
    if not native_loader.available():
        pytest.skip("native loader did not build")
    with pytest.raises(FileNotFoundError):
        native_loader.load_batch([images[0], "/nonexistent/x.png"], 32)


def test_undecodable_raises(images, tmp_path):
    if not native_loader.available():
        pytest.skip("native loader did not build")
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image at all")
    with pytest.raises(ValueError):
        native_loader.load_batch([str(bad)], 32)


def test_fallback_path_matches(images, monkeypatch):
    """With the native lib unavailable, load_batch silently serves PIL."""
    monkeypatch.setattr(native_loader, "_get_lib", lambda: None)
    from PIL import Image

    out = native_loader.load_batch(images[:2], 32)
    ref = np.stack([preprocess_image(Image.open(p), 32) for p in images[:2]])
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_paired_folders_use_native(tmp_path, images):
    """sample_pair goes through the native loader when available and the
    result matches the PIL pipeline within quantization tolerance."""
    from PIL import Image

    from sliders_tpu.data.paired_images import PairedImageFolders

    yy, xx = np.mgrid[0:40, 0:40]
    for i, scale_dir in enumerate(("pos", "neg")):
        (tmp_path / scale_dir).mkdir()
        a = np.stack([yy * 6, xx * 6, (yy + xx) * 3 + i * 20], -1).astype(np.uint8)
        Image.fromarray(a).save(tmp_path / scale_dir / "a.png")
    ds = PairedImageFolders(str(tmp_path), ["pos", "neg"], [1.0, -1.0])
    s, lo, hi = ds.sample_pair(np.random.default_rng(2), 32)
    assert s == 1.0 and lo.shape == (32, 32, 3) and hi.shape == (32, 32, 3)
    ref = preprocess_image(Image.open(tmp_path / "neg" / "a.png"), 32)
    assert np.abs(lo - ref).max() < 0.02
