"""Differentiable supernet: per-slot mixed ops with online path pruning.

Re-design of SuperPruneFifteenDemosFourBayerTwo
(reference codes/models/modules/super_prune_fifteen_demos_four_bayer_two.py:13-230):
slots are [bayer(2 ops), demosaic(4 ops), step1..stepN(15 sRGB ops)].  The
torch reference loops Python module objects and skips pruned branches with
`continue`; here the slot mixture is a pure function — softmax(alpha), masked
renormalization (threshold * max pruning, super_prune...py:186-193), weighted
sum of all candidate outputs — so the whole supernet forward (and all five
DARTS forward/backward passes) stays inside one jitted XLA program.  Pruned
branches are multiplied by exact zeros; XLA still computes them (static
shapes), which replaces the reference's dummy-gradient trick for DDP
(super_prune...py:197-201) with ordinary zero cotangents.

Variables pytree:
  {"alphas": {slot: (K,)},                       # architecture logits
   "theta":  {slot: {op_name: (P,) logits}},     # continuous module params
   "omega":  {op_name: weight pytree}}           # CNN weights (shared across
                                                 # slots, frozen during search
                                                 # — the reference's per-slot
                                                 # copies are kept in lockstep
                                                 # by load_proxy_nets anyway,
                                                 # super_prune..._ft.py:194-209)

Extras over the reference: the forward also returns the *expected latency*
(sum over slots of post-prune probs x per-op latency), which feeds the
latency-aware loss that is dormant in the reference (util_loss.py:8-23), and
per-slot pruned-path counts (= reference pruned_paths, super_prune...py:193).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from reconfigisp_tpu.registry import pool, SUPERNET_SRGB_COUNT


class SuperNet:
    def __init__(self, n_step: int, threshold: float,
                 use_proxies: bool = False,
                 srgb_count: int = SUPERNET_SRGB_COUNT,
                 remat: bool = True):
        """
        :param n_step: number of sRGB slots (reference n_step, yml network_G)
        :param threshold: pruning threshold ratio (reference prune_threshold)
        :param use_proxies: search through CNN imitators for the ops the
            reference proxies (parity mode); default False = native
            differentiable algorithms (BM3D stays a proxy either way).
        :param remat: jax.checkpoint each candidate op so the DARTS
            backward passes recompute instead of storing per-op residuals —
            without it the full native 3-step/15-op search step demands
            ~29 GB of HBM at batch 4/crop 48 (the windowed denoise ops'
            225-iteration tap scans each bank per-iteration residuals).
        """
        self.n_step = n_step
        self.threshold = threshold
        self.use_proxies = use_proxies
        self.remat = remat
        srgb_ops = pool("srgb")[:srgb_count]
        self.slots = [("bayer", pool("bayer")), ("demosaic", pool("demosaic"))]
        self.slots += [(f"step{k + 1}", srgb_ops) for k in range(n_step)]

    # ------------------------------------------------------------------ state

    def init(self, key: jax.Array) -> dict:
        alphas = {}
        theta = {}
        omega = {}
        for slot_name, ops in self.slots:
            alphas[slot_name] = jnp.zeros((len(ops),), jnp.float32)
            slot_theta = {}
            for spec in ops:
                if spec.conditional:
                    continue  # conditional ops are fixed-pipeline-only
                if spec.n_params:
                    slot_theta[spec.name] = jnp.asarray(
                        spec.init_logits, jnp.float32)
                key, k = jax.random.split(key)
                if spec.name not in omega:
                    init = self._weight_init(spec)
                    if init is not None:
                        omega[spec.name] = init(k)
            theta[slot_name] = slot_theta
        return {"alphas": alphas, "theta": theta, "omega": omega}

    def _weight_init(self, spec):
        if spec.proxy_only:
            return spec.proxy_init
        if self.use_proxies and spec.proxy_init is not None:
            return spec.proxy_init
        return spec.init_weights

    # ---------------------------------------------------------------- forward

    def _bankable(self, spec) -> bool:
        """sRGB SRCNN-Res proxies share one architecture (padded to
        MAX_PROXY_PARAMS conditioning channels, ops/cnn.py), so all proxies a
        slot evaluates can run as ONE vmapped conv stack — K small convs
        become one batched MXU program."""
        if spec.domain != "srgb":
            return False
        if spec.proxy_only:
            return True
        return self.use_proxies and spec.proxy_apply is not None \
            and spec.ft_target

    def __call__(self, variables, x, *, return_aux: bool = False,
                 fuse_banks: bool = True):
        """x (N,H,W,1) Bayer -> (N,H,W,3) BGR.

        With return_aux: (y, {"intermediates", "latency", "pruned"})."""
        from reconfigisp_tpu.ops import cnn as cnn_mod

        n = x.shape[0]
        mids = []
        latency = jnp.asarray(0.0, jnp.float32)
        pruned = []
        for slot_name, ops in self.slots:
            alpha = variables["alphas"][slot_name]
            probs = jax.nn.softmax(alpha)
            detached = lax.stop_gradient(probs)
            keep = detached >= self.threshold * jnp.max(detached)
            post = jnp.where(keep, probs, 0.0)
            post = post / lax.stop_gradient(jnp.sum(post))

            bank = [i for i, s in enumerate(ops)
                    if fuse_banks and self._bankable(s)]
            y = jnp.zeros((n, x.shape[1], x.shape[2],
                           1 if ops[0].domain == "bayer" else 3), x.dtype)
            lat_slot = jnp.asarray(0.0, jnp.float32)
            for i, spec in enumerate(ops):
                lat_slot = lat_slot + post[i] * spec.latency
                if i in bank and len(bank) >= 2:
                    continue
                params = self._params_for(variables, slot_name, spec, n, x.dtype)
                weights = variables["omega"].get(spec.name)
                apply_fn = spec.get_apply(self.use_proxies)
                if self.remat:
                    apply_fn = jax.checkpoint(apply_fn)
                out = apply_fn(x, params, weights)
                y = y + post[i] * out
            if len(bank) >= 2:
                wstack = jax.tree.map(
                    lambda *ws: jnp.stack(ws),
                    *[variables["omega"][ops[i].name] for i in bank])
                pstack = jnp.stack([
                    jnp.pad(self._params_for(variables, slot_name, ops[i],
                                             n, x.dtype),
                            ((0, 0), (0, cnn_mod.MAX_PROXY_PARAMS -
                                      ops[i].n_params)))
                    for i in bank])  # (K, N, 5)
                bank_fn = jax.vmap(
                    lambda w_, p_: cnn_mod.apply_srcnn_res(w_, x, p_))
                if self.remat:
                    bank_fn = jax.checkpoint(bank_fn)
                outs = bank_fn(wstack, pstack)  # (K, N, H, W, 3)
                y = y + jnp.einsum("k,knhwc->nhwc", post[jnp.asarray(bank)],
                                   outs, preferred_element_type=jnp.float32)
            latency = latency + lat_slot
            pruned.append(jnp.sum(~keep))
            mids.append(y)
            x = y
        if return_aux:
            return x, {"intermediates": mids, "latency": latency,
                       "pruned": jnp.stack(pruned)}
        return x

    @staticmethod
    def _params_for(variables, slot_name, spec, n, dtype):
        if spec.n_params == 0:
            return None
        logits = variables["theta"][slot_name][spec.name]
        p01 = jax.nn.sigmoid(logits).astype(dtype)
        return jnp.broadcast_to(p01[None, :], (n, spec.n_params))

    # -------------------------------------------------------------- utilities

    def argmax_architecture(self, variables) -> str:
        """Decode the current alphas into an architecture string usable by
        Pipeline (the reference's step-2 handoff)."""
        parts = []
        last_domain = None
        for slot_name, ops in self.slots:
            idx = int(jnp.argmax(variables["alphas"][slot_name]))
            domain = ops[0].domain
            token = {"bayer": "Bayer", "demosaic": "Demosaic", "srgb": "sRGB"}[domain]
            if domain != last_domain:
                parts.append(token)
                last_domain = domain
            parts.append(f"{idx + 1:02d}")
        return "_".join(parts)

    @property
    def slot_names(self):
        return [s for s, _ in self.slots]
