#!/usr/bin/env python
"""Export a trained fixed pipeline as a self-contained serving artifact.

Reads the same config surface as test.py (network_G.architecture +
path.pretrain_model_G), bakes the checkpoint into a StableHLO program
(reconfigisp_tpu/deploy.py), and writes one artifact per served shape.

Usage:
  python tools/export_pipeline.py --opt configs/SID_test.yaml \
      --shape 1x2848x4256x1 --patch 512 --stride 480 \
      --storage bf16 --platforms tpu --out sid_serving.rispt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--shape", required=True,
                    help="NxHxWxC of the serving request, e.g. 1x2848x4256x1"
                         " (N may be 'b' for a symbolic batch, whole-frame"
                         " path only)")
    ap.add_argument("--patch", type=int, default=None)
    ap.add_argument("--stride", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--storage", default=None, choices=[None, "f32", "bf16"])
    ap.add_argument("--data-parallel", type=int, default=1,
                    help="mesh 'data' axis (batch sharding) baked into the "
                         "program; whole-frame only")
    ap.add_argument("--space-parallel", type=int, default=1,
                    help="mesh 'space' axis (height sharding, SPMD conv "
                         "halos); whole-frame only")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. tpu or tpu,cpu")
    ap.add_argument("--platform", default=None,
                    help="local jax platform to trace on (e.g. cpu)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from reconfigisp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from reconfigisp_tpu import config, deploy
    from reconfigisp_tpu.pipeline import Pipeline
    from reconfigisp_tpu.utils import checkpoint

    opt = config.parse(args.opt, is_train=False)
    net_opt = opt["network_G"]
    pipe = Pipeline(net_opt["architecture"],
                    use_proxy=config.network_uses_proxy(net_opt))
    state = pipe.init(jax.random.PRNGKey(0))
    pre = opt["path"].get("pretrain_model_G")
    if pre:
        state = jax.tree.map(jnp.asarray, checkpoint.load_network(pre))
        print(f"loaded {pre}")
    else:
        print("WARNING: no path.pretrain_model_G — exporting init weights")

    shape = tuple("b" if d == "b" else int(d)
                  for d in args.shape.lower().split("x"))
    # tiling defaults from the config's test-set split settings
    ds = opt["datasets"].get("test") or {}
    patch = args.patch if args.patch is not None else ds.get("patch_size")
    stride = args.stride if args.stride is not None \
        else ds.get("patch_stride")
    platforms = args.platforms.split(",") if args.platforms else None

    blob = deploy.export_pipeline(
        pipe, state, shape, patch=patch, stride=stride, chunk=args.chunk,
        storage=args.storage, data_parallel=args.data_parallel,
        space_parallel=args.space_parallel, platforms=platforms)
    deploy.save_artifact(args.out, blob)
    print(f"wrote {args.out}: {len(blob) / 1e6:.2f} MB, "
          f"arch {pipe.architecture}, shape {shape}, "
          f"patch {patch}/{stride}, platforms {platforms or 'local'}")


if __name__ == "__main__":
    main()
