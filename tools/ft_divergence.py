#!/usr/bin/env python
"""Why do the darts_ft legs decode a different sRGB family? (VERDICT r4 #8)

Across the planted sweep every leg and every seed recovers the planted
denoise (Bayer_01) and a Malvar-class demosaic (Demosaic_03) — but the ft
legs decode grayworld/whiteworld sRGB tails (ops 05/06) where the native
and static-proxy legs pick wbquadratic/filmic stacks (13/04), and
`all_legs_agree_per_seed` is false everywhere.

Mechanism under test: in ft mode only the ft-flagged ops (reinhard,
crysis, filmic, whiteworld, bilateral, median, fastnlm, bm3d —
registry.py ft=True) run through SRCNN proxies, tuned toward the native
op every `ft_interval` iters on the search's own intermediates
(reference codes/models/darts_ft_model.py:206-246).  Between tuning
rounds the proxy is NOT its native op: it is a small CNN with leftover
expressive slack, and the bilevel step optimizes alphas against the
PROXY-world loss.  A slack-y whiteworld proxy can express WB *and* a
tone curve at once, so it can undercut the exactly-evaluated native ops
(gamma, wbmanual, wbquadratic run native in ft mode — no proxy exists
for them).  The decoded architecture then reflects proxy-world
accuracy, not native-world accuracy.

This tool quantifies the native-world cost of that bias: for every seed
in experiments/planted/results.json it step-2-trains each leg's decoded
architecture NATIVELY (same budget/config as the margin table) and
evaluates held-out PSNR.  Results are written back into the artifact
under seeds.<s>.leg_arch_psnr, plus a top-level
ft_divergence_psnr_gap_db summary.

Usage: python tools/ft_divergence.py [--isp-iters N] [--seeds 0,1,2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from planted_demo import train_fixed, eval_psnr, _dump, log  # noqa: E402

RPATH = "experiments/planted/results.json"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--isp-iters", type=int, default=700)
    ap.add_argument("--seeds", default=None,
                    help="subset of seeds (default: all in the artifact)")
    args = ap.parse_args()

    from reconfigisp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    with open(RPATH) as f:
        results = json.load(f)
    seeds = (args.seeds.split(",") if args.seeds
             else sorted(results.get("seeds", {})))

    for s in seeds:
        res = results["seeds"][s]
        table = res.get("leg_arch_psnr", {})
        for leg in ("native", "proxy", "ft"):
            arch = (res.get(f"search_{leg}") or {}).get("architecture")
            if not arch:
                continue
            if table.get(leg, {}).get("architecture") == arch:
                log(f"seed {s}: reusing cached {leg} arch eval")
                continue
            log(f"seed {s}: step-2 training {leg} arch {arch} "
                f"({args.isp_iters} iters)")
            state, logs = train_fixed(arch, args.isp_iters, seed=int(s))
            table[leg] = {"architecture": arch,
                          "train_loss": float(logs.get("loss", np.nan)),
                          "psnr": eval_psnr(arch, state)}
            log(f"  seed {s} {leg}: {table[leg]['psnr']:.2f} dB")
            res["leg_arch_psnr"] = table
            _dump(results, RPATH)

    gaps = {}
    for s in seeds:
        t = results["seeds"][s].get("leg_arch_psnr", {})
        if "native" in t and "ft" in t:
            gaps[s] = round(t["native"]["psnr"] - t["ft"]["psnr"], 3)
    if gaps:
        results["ft_divergence_psnr_gap_db"] = {
            "per_seed": gaps,
            "mean": round(float(np.mean(list(gaps.values()))), 3),
            "note": ("native-arch PSNR minus ft-arch PSNR after identical "
                     "native step-2 training; positive = the ft decode "
                     "costs quality in the native world (proxy-slack "
                     "bias, see tools/ft_divergence.py docstring)"),
        }
        _dump(results, RPATH)
        log(f"ft divergence gap (native - ft, dB): {gaps} "
            f"mean {results['ft_divergence_psnr_gap_db']['mean']}")


if __name__ == "__main__":
    main()
