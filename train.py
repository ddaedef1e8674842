#!/usr/bin/env python
"""Training / search CLI.

Re-design of reference codes/train.py:58-301 and codes/train_ft.py (one entry
point dispatches all model types, incl. proxy tuning).  No launcher flags:
distributed execution is a mesh over jax.devices() (`dist: true` in the YAML),
not a process-per-GPU rendezvous (reference train.py:20-55).

Usage:
  JAX_PLATFORMS=cpu python train.py --opt configs/synthetic_search.yaml
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--opt", required=True, help="path to YAML options")
    parser.add_argument("--niter", type=int, default=None,
                        help="override train.niter")
    parser.add_argument("--platform", default=None,
                        help="force jax platform (e.g. cpu)")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host run: jax.distributed.initialize() "
                             "from the TPU environment (the single-controller "
                             "replacement for the reference's pytorch/SLURM "
                             "launchers, codes/train.py:20-55)")
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        import jax
        jax.distributed.initialize()  # coordinator/rank from TPU metadata

    from reconfigisp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from reconfigisp_tpu import config
    from reconfigisp_tpu.search.trainer import run_training

    opt = config.parse(args.opt, is_train=True)
    summary = run_training(opt, max_iters=args.niter)
    print("training done:", summary)
    return 0


if __name__ == "__main__":
    sys.exit(main())
