"""Generate tests/fixtures/reference_slider_tiny.pt — a slider checkpoint
in the reference's exact save_weights format, hand-built (see
test_lora._hand_built_reference_state). Run once; the fixture is committed."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import torch  # noqa: E402

from test_lora import _hand_built_reference_state  # noqa: E402

if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "fixtures",
                       "reference_slider_tiny.pt")
    torch.save(_hand_built_reference_state(), out)
    print(f"wrote {out}")
