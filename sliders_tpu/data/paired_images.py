"""Paired before/after image dataset for image sliders.

The reference's data contract (train_lora-scale.py:211-220): per-scale
folders under a main folder (`--folders 'bigsize,smallsize' --scales '1,-1'`);
each iteration picks a scale s, pairs the folder at −s with the folder at +s,
and samples the SAME filename from both, resized to the train resolution.

Host-side loader (PIL decode/resize is not TPU work); preprocessing matches
diffusers VaeImageProcessor: [0,255] -> [-1,1], NHWC float32.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field

import numpy as np


IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp")

logger = logging.getLogger(__name__)


def preprocess_image(img, resolution: int) -> np.ndarray:
    """PIL image -> (H, W, 3) float32 in [-1, 1]."""
    from PIL import Image

    img = img.convert("RGB").resize((resolution, resolution), Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    return arr * 2.0 - 1.0


@dataclass
class PairedImageFolders:
    folder_main: str
    folders: list[str]  # aligned with scales
    scales: list[float]
    _bad_files: set = field(default_factory=set, repr=False)

    def __post_init__(self):
        if len(self.folders) != len(self.scales):
            raise ValueError("folders and scales must align")
        self.scales_unique = sorted({abs(s) for s in self.scales if s != 0})
        self._by_scale = {s: f for s, f in zip(self.scales, self.folders)}
        for s in self.scales_unique:
            if s not in self._by_scale or -s not in self._by_scale:
                raise ValueError(f"need folders for both +{s} and -{s}")

    def filenames(self, scale: float) -> list[str]:
        d = os.path.join(self.folder_main, self._by_scale[scale])
        return sorted(
            f for f in os.listdir(d) if f.lower().endswith(IMAGE_EXTS)
        )

    def sample_pair(self, rng: np.random.Generator, resolution: int):
        """Returns (scale, low_image, high_image) — same filename from the
        −scale and +scale folders.

        Uses the native C++ loader (data/native_loader.py: libjpeg/libpng
        decode + PIL-equivalent bicubic, threaded) when it builds; set
        SLIDERS_TPU_NO_NATIVE_LOADER=1 to force the PIL path.

        Malformed/missing images are skipped with a warning and a fresh
        filename is drawn (the reference tolerates bad images mid-run,
        trainscripts/imagesliders/train_lora-scale-xl.py:261-286, so one
        corrupt file must never abort a long training job). A filename that
        failed once is excluded for the rest of the run; if every file of a
        scale is bad, raises RuntimeError."""
        s = float(rng.choice(self.scales_unique))
        names = [n for n in self.filenames(-s) if (s, n) not in self._bad_files]
        while names:
            name = names[int(rng.integers(len(names)))]
            try:
                return (s, *self._load_pair(s, name, resolution))
            except (OSError, ValueError) as e:
                logger.warning(
                    "skipping unreadable image pair %r (scale %s): %s", name, s, e
                )
                self._bad_files.add((s, name))
                names.remove(name)
        raise RuntimeError(
            f"no decodable image pairs left for scale {s} under {self.folder_main}"
        )

    def _load_pair(self, s: float, name: str, resolution: int):
        lo_path = os.path.join(self.folder_main, self._by_scale[-s], name)
        hi_path = os.path.join(self.folder_main, self._by_scale[s], name)
        if not os.environ.get("SLIDERS_TPU_NO_NATIVE_LOADER"):
            from sliders_tpu.data import native_loader

            if native_loader.available():
                lo, hi = native_loader.load_batch([lo_path, hi_path], resolution)
                return lo, hi
        from PIL import Image

        with Image.open(lo_path) as lo, Image.open(hi_path) as hi:
            return preprocess_image(lo, resolution), preprocess_image(hi, resolution)


def parse_folder_args(folders: str, scales: str) -> tuple[list[str], list[float]]:
    """Reference CLI format: comma-separated strings
    (train_lora-scale.py:420-443)."""
    fs = [f.strip() for f in folders.split(",")]
    ss = [float(s.strip()) for s in scales.split(",")]
    if len(fs) != len(ss):
        raise ValueError("the number of folders need to match the number of scales")
    return fs, ss
