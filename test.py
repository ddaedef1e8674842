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

    from reconfigisp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from reconfigisp_tpu import config
    from reconfigisp_tpu.pipeline import Pipeline
    from reconfigisp_tpu.data import create_dataset
    from reconfigisp_tpu.utils import checkpoint
    from reconfigisp_tpu.utils.metrics import psnr as psnr_fn, ssim as ssim_fn
    from reconfigisp_tpu.utils.imaging import tensor2bgr
    from reconfigisp_tpu.utils.logging_utils import setup_logger

    opt = config.parse(args.opt, is_train=False)
    paths = opt["path"]
    logger = setup_logger("base", paths.get("log"), f"test_{opt['name']}")

    net_opt = opt["network_G"]
    pipe = Pipeline(net_opt["architecture"],
                    use_proxy=config.network_uses_proxy(net_opt))
    state = pipe.init(jax.random.PRNGKey(0))
    if paths.get("pretrain_model_G"):
        loaded = checkpoint.load_network(paths["pretrain_model_G"])
        state = jax.tree.map(jnp.asarray, loaded)
        logger.info(f"loaded model {paths['pretrain_model_G']}")

    ds_opt = dict(opt["datasets"]["test"] if opt["datasets"].get("test")
                  else opt["datasets"]["train"])
    ds_opt["is_train"] = False
    dataset = create_dataset(ds_opt)

    from reconfigisp_tpu import precision as precision_mod
    split = bool(ds_opt.get("patch_size"))
    if split:
        from reconfigisp_tpu.parallel.tiling import tiled_apply
        patch = int(ds_opt["patch_size"])
        stride = int(ds_opt.get("patch_stride", patch))
        # one compiled program for the whole tiled frame (gather + lax.map
        # over chunks + feathered blend) — the reference pays a full
        # host<->device round trip per patch (test_split.py:88-100)
        tiled_fwd = precision_mod.policy_jit(lambda s, xx: tiled_apply(
            lambda pp: pipe(s, pp), xx, patch=patch, stride=stride))

    out_dir = paths.get("results_root")
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    is_yolo = "yolo" in (opt["model"] or "")
    if is_yolo:
        from reconfigisp_tpu.search.trainer import build_yolo_evaluator
        from reconfigisp_tpu.yolo.net import apply_yolo
        from reconfigisp_tpu.yolo.loss import decode_head
        from reconfigisp_tpu.yolo import metrics as ymetrics
        img_size = ds_opt.get("data_size", 64) or 64
        blocks, yweights = build_yolo_evaluator(opt["yolo"], img_size)
        all_dets, all_gts, all_tcls = [], [], []

    save_strips = bool(ds_opt.get("save_strips", True))
    # policy_jit keys the compile cache on the storage policy, so the
    # `precision:` option applies no matter when the first trace happens
    fwd = precision_mod.policy_jit(
        lambda s, x: pipe(s, x, return_intermediates=True))
    psnrs, ssims = [], []
    n = len(dataset) if args.max_images is None \
        else min(args.max_images, len(dataset))
    # storage precision for the CNN stacks (option `precision: bf16`
    # halves activation HBM traffic on TPU); one-shot CLI, so enter the
    # policy for the process lifetime.
    if opt.get("precision"):
        ctx = precision_mod.cnn_storage(str(opt["precision"]))
        ctx.__enter__()
    for i in range(n):
        sample = dataset[i]
        x = jnp.asarray(sample["noisy"])[None]
        mids = None
        if split:
            y = tiled_fwd(state, x)
        else:
            y, mids, _ = fwd(state, x)
        gt = sample.get("gt")
        if gt is not None and not is_yolo:
            p = float(psnr_fn(y, jnp.asarray(gt)[None])[0])
            s = float(ssim_fn(y, jnp.asarray(gt)[None])[0])
            psnrs.append(p)
            ssims.append(s)
            logger.info(f"[{i}] psnr {p:.3f} ssim {s:.4f}")
        if is_yolo:
            heads = apply_yolo(yweights, blocks, y[..., ::-1])
            # decode strides come from the ACTUAL frame fed to the detector —
            # in split mode the merged frame can be larger than data_size, and
            # using the configured size would mis-scale every box (the
            # reference's yolo split test only renders, test_yolo_split.py:125;
            # here mAP is wired, so the grid must match the frame)
            frame_h, frame_w = int(y.shape[1]), int(y.shape[2])
            boxes, confs, clss = [], [], []
            for head, anchors, _ in heads:
                b, cf, cl = decode_head(head, anchors, frame_h)
                boxes.append(np.asarray(b[0]).reshape(-1, 4))
                confs.append(np.asarray(cf[0]).reshape(-1))
                clss.append(np.asarray(cl[0]).reshape(-1, cl.shape[-1]))
            dets = ymetrics.non_max_suppression(
                np.concatenate(boxes), np.concatenate(confs),
                np.concatenate(clss),
                conf_thres=ds_opt.get("conf_thres", 0.5) or 0.5)
            lab = sample["label"]
            valid = lab[lab[:, 0] > 0.5]
            gtb = np.zeros((len(valid), 5), np.float32)
            gtb[:, 0] = valid[:, 1]
            gtb[:, 1] = (valid[:, 2] - valid[:, 4] / 2) * frame_w
            gtb[:, 2] = (valid[:, 3] - valid[:, 5] / 2) * frame_h
            gtb[:, 3] = (valid[:, 2] + valid[:, 4] / 2) * frame_w
            gtb[:, 4] = (valid[:, 3] + valid[:, 5] / 2) * frame_h
            all_dets.append(dets)
            all_gts.append(gtb)
            all_tcls.extend(valid[:, 1].tolist())
        if out_dir:
            import cv2
            if save_strips and mids is not None and gt is not None:
                # input | intermediates | GT strip (reference test.py:74-99)
                in3 = np.repeat(np.asarray(x[0]), 3, axis=2) \
                    if x.shape[-1] == 1 else np.asarray(x[0])
                pieces = [in3] + [
                    np.repeat(np.asarray(m[0]), 3, axis=2)
                    if m.shape[-1] == 1 else np.asarray(m[0])
                    for m in mids] + [np.asarray(gt)]
                strip = np.concatenate(pieces, axis=1)
                cv2.imwrite(os.path.join(out_dir, f"{i:04d}_strip.png"),
                            tensor2bgr(strip))
            cv2.imwrite(os.path.join(out_dir, f"{i:04d}.png"),
                        tensor2bgr(np.asarray(y[0])))
    if psnrs:
        arr = np.asarray(psnrs)
        # min/max/mean/std summary (reference test.py:101-107)
        logger.info(f"PSNR min {arr.min():.3f} max {arr.max():.3f} "
                    f"mean {arr.mean():.3f} std {arr.std():.3f}")
        logger.info(f"SSIM mean {np.mean(ssims):.4f}")
        print(f"psnr_mean={arr.mean():.4f}")
    if is_yolo:
        stats = ymetrics.get_batch_statistics(all_dets, all_gts)
        if stats:
            out = ymetrics.ap_per_class(
                np.concatenate([s[0] for s in stats]),
                np.concatenate([s[1] for s in stats]),
                np.concatenate([s[2] for s in stats]), all_tcls)
            logger.info(f"mAP {out['mAP']:.4f} P {out['precision'].mean():.3f} "
                        f"R {out['recall'].mean():.3f}")
            print(f"map={out['mAP']:.4f}")
        else:
            logger.info("no detections above threshold")
            print("map=0.0")
    return 0


if __name__ == "__main__":
    sys.exit(main())
