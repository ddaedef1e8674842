#!/usr/bin/env python
"""Flagship accuracy demo: the full two-step ReconfigISP method on the
planted-pipeline workload, end to end on TPU.

The planted workload (data/datasets.SyntheticPlantedDataset) generates GT
with a KNOWN pipeline — path-denoise -> Malvar -> wbmanual(cast^-1) ->
gamma(1/2.2) — under heavy shot noise and a color cast, so the search has a
ground-truth architecture to recover and no degenerate exposure-only
solution.  This driver runs:

  0. module pretraining (search/proxy_pretrain) -> proxies.ckpt
  1. native-op DARTS search        (configs/planted_search.yaml)
  2. proxy-parity DARTS search     (configs/planted_search_proxy.yaml)
  2b. online proxy-tuning search   (configs/planted_search_ft.yaml,
      model darts_ft — the reference's train_ft mechanism)
  3. step-2 fixed training of the searched architecture + every single-op
     ablation (swap denoise->skip, demosaic->nearest, drop wb, drop gamma)
  4. held-out PSNR evaluation of all trained pipelines

and writes experiments/planted/results.json (consumed by docs/RESULTS.md).

Usage:  python tools/planted_demo.py [--fast] [--skip-pretrain]
  --fast shrinks budgets ~10x for a smoke run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


OUT_DIR = os.path.join("experiments", "planted")
PROXIES = os.path.join(OUT_DIR, "proxies.ckpt")


def log(*a):
    print("[planted_demo]", *a, flush=True)


def eval_psnr(arch: str, state, n: int = 16, size: int = 128,
              seed: int = 99) -> float:
    """Held-out PSNR of a trained pipeline on fresh planted frames."""
    import jax
    import jax.numpy as jnp
    from reconfigisp_tpu.pipeline import Pipeline
    from reconfigisp_tpu.data.datasets import SyntheticPlantedDataset
    from reconfigisp_tpu.utils.metrics import psnr as psnr_fn

    ds = SyntheticPlantedDataset(n=n, size=size, seed=seed)
    pipe = Pipeline(arch)
    fwd = jax.jit(lambda s, x: pipe(s, x))
    vals = []
    for i in range(n):
        s = ds[i]
        y = fwd(state, jnp.asarray(s["noisy"])[None])
        vals.append(float(psnr_fn(y, jnp.asarray(s["gt"])[None])[0]))
    return float(np.mean(vals))


def train_fixed(arch: str, niter: int, *, use_proxy: bool = False) -> tuple:
    """Step-2 training of a fixed architecture -> (final_state, summary)."""
    from reconfigisp_tpu import config
    from reconfigisp_tpu.search.trainer import run_training, IspTrainer
    from reconfigisp_tpu.pipeline import Pipeline
    from reconfigisp_tpu.data.datasets import SyntheticPlantedDataset
    from reconfigisp_tpu.data.sampler import create_loader

    # run the actual config file path (proves the shipped YAML executes),
    # overriding only the architecture under test
    opt = config.parse("configs/planted_isp.yaml", is_train=True)
    opt["network_G"]["architecture"] = arch
    opt["network_G"]["use_proxy"] = use_proxy
    opt["name"] = f"planted_isp_{abs(hash(arch)) % 99999}"
    opt["path"]["models"] = None  # state returned in-process below

    # in-process variant of run_training's isp branch so we can keep the
    # trained state for evaluation
    ds = SyntheticPlantedDataset(
        n=64, size=96, seed=opt["train"].get("manual_seed", 10) or 10)
    pipe = Pipeline(arch, use_proxy=use_proxy)
    tr = IspTrainer(pipe, opt["train"],
                    train_weights=bool(opt["train"].get("train_weights")))
    if os.path.exists(PROXIES):
        from reconfigisp_tpu.utils import checkpoint
        loaded = checkpoint.load_network(PROXIES)
        for opname, w in loaded.items():
            if opname in tr.state["weights"]:
                import jax
                import jax.numpy as jnp
                tr.state["weights"][opname] = jax.tree.map(jnp.asarray, w)
    loader = iter(create_loader(ds, 4))
    logs = {}
    t0 = time.time()
    for i in range(niter):
        logs = tr.train_step(next(loader))
        if (i + 1) % 200 == 0:
            log(f"  [{arch}] iter {i + 1}/{niter} loss {logs['loss']:.3e} "
                f"({(time.time() - t0) / (i + 1):.3f}s/iter)")
    return tr.state, logs


def ablations_of(arch: str) -> dict:
    """Single-op ablations of a searched architecture string."""
    from reconfigisp_tpu.pipeline import parse_architecture
    steps = parse_architecture(arch)
    out = {}
    # denoise off: bayer step -> skip (02)
    out["no_denoise"] = _format([("bayer", 2)] + steps[1:])
    # demosaic -> nearest (01)
    out["nearest_demosaic"] = _format(
        [steps[0], ("demosaic", 1)] + steps[2:])
    # each sRGB step -> skip (10), one at a time
    for i, (dom, idx) in enumerate(steps):
        if dom == "srgb" and idx != 10:
            out[f"drop_srgb_step{i}"] = _format(
                steps[:i] + [("srgb", 10)] + steps[i + 1:])
    return out


def _format(steps) -> str:
    parts = []
    last_dom = None
    for dom, idx in steps:
        tok = {"bayer": "Bayer", "demosaic": "Demosaic", "srgb": "sRGB"}[dom]
        if dom != last_dom:
            parts.append(tok)
            last_dom = dom
        parts.append(f"{idx:02d}")
    return "_".join(parts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--skip-pretrain", action="store_true")
    ap.add_argument("--skip-search", action="store_true",
                    help="reuse architectures from an existing results.json")
    args = ap.parse_args()

    from reconfigisp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    os.makedirs(OUT_DIR, exist_ok=True)
    results = {}
    rpath = os.path.join(OUT_DIR, "results.json")
    if os.path.exists(rpath):
        with open(rpath) as f:
            results = json.load(f)

    scale = 0.1 if args.fast else 1.0
    pre_steps = max(int(3000 * scale), 200)
    search_iters = max(int(1500 * scale), 60)
    isp_iters = max(int(800 * scale), 60)

    # ---- 0) module pretraining -------------------------------------------
    if not args.skip_pretrain and not os.path.exists(PROXIES):
        from reconfigisp_tpu.search.proxy_pretrain import pretrain_modules
        from reconfigisp_tpu.utils import checkpoint
        log(f"pretraining modules ({pre_steps} steps)...")
        trained = pretrain_modules(steps=pre_steps, noise_std=0.05,
                                   log_every=500)
        d, fn = os.path.split(PROXIES)
        checkpoint.save_network(d, "proxies", fn.replace(".ckpt", ""),
                                trained)
        # save_network names it <iter>_<label>.ckpt; normalize to PROXIES
        src = os.path.join(d, f"{fn.replace('.ckpt', '')}_proxies.ckpt")
        if os.path.exists(src):
            os.replace(src, PROXIES)
        log(f"saved {sorted(trained)} -> {PROXIES}")

    # ---- 1+2) searches ----------------------------------------------------
    from reconfigisp_tpu import config
    from reconfigisp_tpu.search.trainer import run_training

    if not args.skip_search:
        for leg, cfg in (("native", "configs/planted_search.yaml"),
                         ("proxy", "configs/planted_search_proxy.yaml"),
                         ("ft", "configs/planted_search_ft.yaml")):
            log(f"{leg} search ({search_iters} iters)...")
            opt = config.parse(cfg, is_train=True)
            t0 = time.time()
            summary = run_training(opt, max_iters=search_iters)
            results[f"search_{leg}"] = {
                "architecture": summary["architecture"],
                "loss": summary.get("loss"),
                "val_loss": summary.get("val_loss"),
                "iters": search_iters,
                "seconds": round(time.time() - t0, 1),
            }
            log(f"{leg} search -> {summary['architecture']} "
                f"({results[f'search_{leg}']['seconds']}s)")
            with open(rpath, "w") as f:
                json.dump(results, f, indent=1)

    arch = results["search_native"]["architecture"]

    # ---- 3+4) step-2 training + ablations + held-out PSNR ----------------
    candidates = {"searched": arch, **ablations_of(arch)}
    # drop cached entries that are not candidates of THIS run's searched
    # architecture (a re-run search may decode differently; a stale
    # ablation key of the old arch would otherwise feed the margin)
    psnrs = {k: v for k, v in results.get("step2_psnr", {}).items()
             if k in candidates}
    for name, a in candidates.items():
        # reuse a cached result only if it trained the same architecture
        # (a re-run search may decode differently)
        if psnrs.get(name, {}).get("architecture") == a:
            continue
        log(f"step-2 training {name}: {a} ({isp_iters} iters)")
        state, logs = train_fixed(a, isp_iters)
        psnrs[name] = {"architecture": a,
                       "train_loss": float(logs.get("loss", np.nan)),
                       "psnr": eval_psnr(a, state)}
        log(f"  {name}: held-out PSNR {psnrs[name]['psnr']:.2f} dB")
        results["step2_psnr"] = psnrs
        with open(rpath, "w") as f:
            json.dump(results, f, indent=1)

    searched = psnrs["searched"]["psnr"]
    best_abl = max(v["psnr"] for k, v in psnrs.items() if k != "searched")
    results["margin_db"] = round(searched - best_abl, 3)
    results["planted_recovered"] = {
        "bayer_is_denoise": arch.startswith("Bayer_01"),
        "demosaic_is_highquality": ("_Demosaic_03" in arch
                                    or "_Demosaic_04" in arch),
    }
    with open(rpath, "w") as f:
        json.dump(results, f, indent=1)
    log(json.dumps(results, indent=1))
    log(f"searched {searched:.2f} dB vs best ablation {best_abl:.2f} dB "
        f"(margin {results['margin_db']:+.2f} dB)")


if __name__ == "__main__":
    main()
