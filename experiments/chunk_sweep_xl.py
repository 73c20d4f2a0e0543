"""SDXL text-slider chunk (tpu.steps_per_call) sweep — round-3 follow-up.

Round-3 found chunk=10 meets the north-star (1.733 steps/s) and chunk=20
failed to LOAD through the axon tunnel (TPU backend InvalidArgument,
"program too large"). The chunk is a `lax.scan` with a constant-size body,
so program size should NOT grow with chunk — this script re-tests 15 and 20
to find out whether 20's failure was transient tunnel flake or real, and
whether 15 buys headline margin over 10.

The measurement IS bench.main_sdxl (imported, chunk parameterized) — one
protocol source, so the sweep can never drift from the official bench.
Usage:
    python experiments/chunk_sweep_xl.py 15 20

Result (round-3, recorded in BASELINE.md): 15 -> 1.783, 20 -> 1.494
(loads fine — the earlier failure was transient); chunk=10 stays default.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (configures the persistent compile cache on import)


def main():
    chunks = [int(a) for a in sys.argv[1:]] or [15]
    results = {}
    for c in chunks:
        try:
            results[str(c)] = round(bench.main_sdxl(chunk=c), 4)
        except Exception as e:  # record tunnel/program-size failures, keep going
            results[str(c)] = f"FAILED: {type(e).__name__}: {str(e)[:300]}"
        print(json.dumps({"chunk_sweep_xl": results}), flush=True)
    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
