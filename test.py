#!/usr/bin/env python
"""Inference / evaluation CLI.

Re-design of reference codes/test.py:21-107 (whole-image fixed-pipeline
inference with PSNR stats and input/middles/GT strips) and
codes/test_split.py (patch-split tiled inference — here `split: true` runs
the jit-compiled feathered tiling from parallel/tiling.py).

Usage:
  JAX_PLATFORMS=cpu python test.py --opt configs/synthetic_test.yaml
"""

import argparse
import os
import sys

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--opt", required=True)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--max-images", type=int, default=None)
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    from reconfigisp_tpu import config
    from reconfigisp_tpu.pipeline import Pipeline
    from reconfigisp_tpu.data import create_dataset
    from reconfigisp_tpu.utils import checkpoint
    from reconfigisp_tpu.utils.metrics import psnr as psnr_fn
    from reconfigisp_tpu.utils.logging_utils import setup_logger

    opt = config.parse(args.opt, is_train=False)
    paths = opt["path"]
    logger = setup_logger("base", paths.get("log"), f"test_{opt['name']}")

    net_opt = opt["network_G"]
    pipe = Pipeline(net_opt["architecture"],
                    use_proxy=bool(net_opt.get("use_proxy")))
    state = pipe.init(jax.random.PRNGKey(0))
    if paths.get("pretrain_model_G"):
        loaded = checkpoint.load_network(paths["pretrain_model_G"])
        state = jax.tree.map(jnp.asarray, loaded)
        logger.info(f"loaded model {paths['pretrain_model_G']}")

    ds_opt = dict(opt["datasets"]["test"] if opt["datasets"].get("test")
                  else opt["datasets"]["train"])
    ds_opt["is_train"] = False
    dataset = create_dataset(ds_opt)

    split = bool(ds_opt.get("patch_size"))
    if split:
        from reconfigisp_tpu.parallel.tiling import tiled_apply
        patch = int(ds_opt["patch_size"])
        stride = int(ds_opt.get("patch_stride", patch))

    out_dir = paths.get("results_root")
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    fwd = jax.jit(lambda s, x: pipe(s, x))
    psnrs = []
    n = len(dataset) if args.max_images is None \
        else min(args.max_images, len(dataset))
    for i in range(n):
        sample = dataset[i]
        x = jnp.asarray(sample["noisy"])[None]
        if split:
            y = tiled_apply(lambda xx: pipe(state, xx), x,
                            patch=patch, stride=stride)
        else:
            y = fwd(state, x)
        gt = sample.get("gt")
        if gt is not None:
            p = float(psnr_fn(y, jnp.asarray(gt)[None])[0])
            psnrs.append(p)
            logger.info(f"[{i}] psnr {p:.3f}")
        if out_dir:
            import cv2
            img = np.clip(np.asarray(y[0]) * 255.0, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(out_dir, f"{i:04d}.png"), img)
    if psnrs:
        arr = np.asarray(psnrs)
        # min/max/mean/std summary (reference test.py:101-107)
        logger.info(f"PSNR min {arr.min():.3f} max {arr.max():.3f} "
                    f"mean {arr.mean():.3f} std {arr.std():.3f}")
        print(f"psnr_mean={arr.mean():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
