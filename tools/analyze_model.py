#!/usr/bin/env python
"""Model analysis: parameter counts + compiled FLOP estimates.

Counterpart of the reference's `tools/analyze_model.py` (fvcore flop
tables); here the FLOP count comes from XLA's own cost analysis of the
compiled forward, which is what actually runs.

  python tools/analyze_model.py [--config-file cfg.yaml] [--frames 2]
      [--height 360] [--width 640]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("--frames", type=int, default=2)
    parser.add_argument("--height", type=int, default=360)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args(argv)

    from s2d_tpu.utils.jax_setup import enable_compilation_cache, force_cpu
    force_cpu()  # analysis doesn't need the accelerator
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2d_tpu.config import load_config
    from s2d_tpu.models import build_model

    cfg = load_config(args.config_file or None, args.opts)
    model = build_model(cfg, compute_dtype=jnp.float32)
    h = -(-args.height // 32) * 32
    w = -(-args.width // 32) * 32
    images = jnp.zeros((1, args.frames, h, w, 3))
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), images)

    sizes = jax.tree_util.tree_map(lambda x: int(np.prod(x.shape)), variables)
    leaves_with_paths = jax.tree_util.tree_leaves_with_path(sizes)
    total = sum(v for _, v in leaves_with_paths)
    by_top = {}
    for path, v in leaves_with_paths:
        names = [getattr(p, "key", str(p)) for p in path]
        top = names[1] if len(names) > 1 else names[0]
        by_top[top] = by_top.get(top, 0) + v
    print(f"parameters: {total / 1e6:.2f} M")
    for k, v in sorted(by_top.items(), key=lambda kv: -kv[1]):
        print(f"  {k:20s} {v / 1e6:8.2f} M")

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    lowered = jax.jit(model.apply).lower(variables, images)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if cost:
        flops = cost.get("flops", float("nan"))
        print(f"forward flops ({args.frames}f @ {h}x{w}): {flops / 1e9:.1f} GFLOP "
              f"({flops / 1e9 / args.frames:.1f} GFLOP/frame)")
        print(f"bytes accessed: {cost.get('bytes accessed', 0) / 1e9:.2f} GB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
