"""LPIPS-score a scale-sweep run vs its scale-0 folder — reference
eval-scripts/lpip_score.py CLI. Writes `lpips_score.csv`."""

from __future__ import annotations

import argparse


def main(args):
    from sliders_tpu.evals.lpips import load_torch_weights
    from sliders_tpu.evals.scoring import lpips_scores

    params = load_torch_weights(args.alexnet_weights, args.lpips_weights)
    lpips_scores(args.im_path, args.true, args.prompts_path, params)


def build_parser():
    p = argparse.ArgumentParser(prog="LPIPS")
    p.add_argument("--im_path", type=str, required=True)
    p.add_argument("--prompts_path", type=str, required=True)
    p.add_argument("--true", type=str, required=True, help="scale-0 folder name")
    p.add_argument(
        "--alexnet_weights", type=str, required=True,
        help="local torchvision alexnet state_dict (.pth)",
    )
    p.add_argument(
        "--lpips_weights", type=str, required=True,
        help="local lpips 'alex.pth' linear weights",
    )
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
