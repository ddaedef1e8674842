"""Op registry: the searchable ISP module zoo.

Re-designs the reference's three candidate pools — Bayer (2 ops), demosaic
(4 ops), sRGB (18 ops) — as data: each op is an OpSpec holding its pure apply
function, parameter metadata, default-init logits, a latency estimate and
(optionally) a CNN proxy.  Pool indices are 1-based and match the reference's
architecture strings (reference codes/models/modules/isp_universal.py:60-127,
super_prune_fifteen_demos_four_bayer_two.py:57-171) so e.g.
"Bayer_01_Demosaic_03_sRGB_01_13_11" selects the same algorithms.

Two application modes exist for ops the reference could only search through
CNN imitators:
  * origin — our native JAX implementation (differentiable; the default);
  * proxy  — a parameter-conditioned CNN (capability parity with the
    reference's proxy mechanism, and the only mode for BM3D, whose original
    is MATLAB-bound even in the reference — origin_universal.py:11-13).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

from reconfigisp_tpu.ops import color, tone, demosaic, denoise, conditional
from reconfigisp_tpu.ops import cnn

# Default per-op latency estimates, ms per megapixel on one TPU v5e chip.
# Replace with measured values via reconfigisp_tpu.utils.latency.calibrate().
# This powers the latency-aware loss that is present-but-dormant in the
# reference (codes/utils/util_loss.py:8-23 — no shipped network returns a
# latency; here every pipeline/supernet does).
_DEFAULT_LATENCY = {
    "skip": 0.0,
    "gamma": 0.02, "grayworld": 0.04, "wbmanual": 0.02, "whiteworld": 0.3,
    "wbquadratic": 0.08, "gtmmanual": 0.05,
    "reinhard": 0.08, "crysisengine": 0.04, "filmic": 0.05,
    "bilateral": 2.5, "median": 2.0, "fastnlm": 12.0,
    "nearest": 0.15, "bilinear": 0.15, "laplacian": 0.2, "demosaicnet": 2.0,
    "path_bayer": 8.0, "path_bgr": 30.0, "bm3d": 4.0,
    "conditional_gamma": 0.1, "conditional_wb_manual": 0.1,
    "conditional_wb_quadratic": 0.15,
}


@dataclasses.dataclass(frozen=True)
class OpSpec:
    name: str
    domain: str                      # 'bayer' | 'demosaic' | 'srgb'
    n_params: int
    init_logits: tuple               # default logits; sigmoid -> [0,1] params
    apply: Optional[Callable]        # native apply(x, params, weights)
    latency: float = 0.0
    init_weights: Optional[Callable] = None   # key -> pytree (native weights)
    proxy_apply: Optional[Callable] = None    # proxy apply(x, params, weights)
    proxy_init: Optional[Callable] = None     # key -> pytree
    conditional: bool = False        # raw flat params, no sigmoid/repeat
    init_params: Optional[Callable] = None    # key -> logits (conditional ops)
    ft_target: bool = False          # eligible for online proxy tuning
    ft_target_apply: Optional[Callable] = None  # proxy-training target when
                                                # it differs from `apply`
                                                # (BM3D: native DCT stand-in)

    @property
    def proxy_only(self) -> bool:
        return self.apply is None

    def ft_target_fn(self) -> Optional[Callable]:
        """The function the proxy imitates during pretraining / online tuning
        (reference trains proxies against the original algorithms,
        darts_ft_model.py:221-240)."""
        return self.ft_target_apply if self.ft_target_apply is not None \
            else self.apply

    def get_apply(self, use_proxy: bool) -> Callable:
        if use_proxy or self.apply is None:
            if self.proxy_apply is None:
                return self.apply
            return self.proxy_apply
        return self.apply


def _srcnn_proxy(n_params: int):
    def apply(x, params, weights):
        return cnn.apply_srcnn_res(weights, x, params)

    def init(key):
        return cnn.init_srcnn_res(key, n_params)

    return apply, init


def _demosaic_proxy():
    def apply(x, params, weights):
        return cnn.apply_srcnn_demosaic(weights, x, params)

    def init(key):
        return cnn.init_srcnn_demosaic(key, 0)

    return apply, init


def _conditional_init(n_global: int, base_logits: tuple):
    """Weight part ~ N(0, 0.01^2), global part = base init logits
    (reference isp_universal.py:185-190)."""

    def init(key):
        import jax
        total = conditional.conditional_n_params(
            conditional.DEFAULT_IN_CHANNELS, n_global)
        w = 0.01 * jax.random.normal(key, (total - n_global,))
        import jax.numpy as jnp
        return jnp.concatenate([w, jnp.asarray(base_logits, jnp.float32)])

    return init


_WBQ_INIT = (0, 0, 0, 0, 0, 0, 0.406, 0, 0, 0,
             0, 0, 0, 0, 0, 0, 0, 0.406, 0, 0,
             0, 0, 0, 0, 0, 0, 0, 0, 0.406, 0)  # identity diag, sigmoid->0.6->coef 1


def _build_registry():
    reg = {"bayer": {}, "demosaic": {}, "srgb": {}}

    def add(domain, idx, spec):
        reg[domain][spec.name] = (idx, spec)

    # ---- Bayer pool (reference super_prune...py:57-74) ----
    add("bayer", 1, OpSpec(
        "path_bayer", "bayer", 0, (),
        apply=lambda x, p, w: cnn.apply_path14_bayer(w, x, p),
        init_weights=lambda key: cnn.init_path14_bayer(key, 0),
        latency=_DEFAULT_LATENCY["path_bayer"]))
    add("bayer", 2, OpSpec(
        "skip", "bayer", 0, (), apply=color.skip, latency=0.0))

    # ---- demosaic pool (reference super_prune...py:77-98) ----
    bl_apply, bl_init = _demosaic_proxy()
    lp_apply, lp_init = _demosaic_proxy()
    add("demosaic", 1, OpSpec(
        "nearest", "demosaic", 0, (), apply=demosaic.demosaic_nearest,
        latency=_DEFAULT_LATENCY["nearest"]))
    add("demosaic", 2, OpSpec(
        "bilinear", "demosaic", 0, (), apply=demosaic.demosaic_bilinear,
        proxy_apply=bl_apply, proxy_init=bl_init,
        latency=_DEFAULT_LATENCY["bilinear"]))
    add("demosaic", 3, OpSpec(
        "laplacian", "demosaic", 0, (), apply=demosaic.demosaic_malvar,
        proxy_apply=lp_apply, proxy_init=lp_init,
        latency=_DEFAULT_LATENCY["laplacian"]))
    add("demosaic", 4, OpSpec(
        "demosaicnet", "demosaic", 0, (),
        apply=lambda x, p, w: cnn.apply_srcnn_demosaic(w, x, p),
        init_weights=lambda key: cnn.init_srcnn_demosaic(key, 0),
        latency=_DEFAULT_LATENCY["demosaicnet"]))

    # ---- sRGB pool (reference super_prune...py:101-171, isp_universal.py:74-127) ----
    def add_srgb(idx, name, n_params, init_logits, apply_fn, ft=False,
                 **kw):
        proxy_apply, proxy_init = (None, None)
        if ft or name == "bm3d":
            proxy_apply, proxy_init = _srcnn_proxy(n_params)
        add("srgb", idx, OpSpec(
            name, "srgb", n_params, tuple(init_logits), apply=apply_fn,
            proxy_apply=proxy_apply, proxy_init=proxy_init,
            latency=_DEFAULT_LATENCY[name], ft_target=ft, **kw))

    add_srgb(1, "gamma", 1, (0.,), color.gamma)
    add_srgb(2, "reinhard", 2, (0., 0.), tone.tone_reinhard, ft=True)
    add_srgb(3, "crysisengine", 1, (0.,), tone.tone_crysis, ft=True)
    add_srgb(4, "filmic", 2, (0., 0.), tone.tone_filmic, ft=True)
    add_srgb(5, "grayworld", 0, (), color.grayworld)
    add_srgb(6, "whiteworld", 1, (0.,), color.wb_whiteworld, ft=True)
    add_srgb(7, "bilateral", 3, (0., 0., 0.), denoise.bilateral, ft=True)
    add_srgb(8, "median", 1, (0.,), denoise.median, ft=True)
    add_srgb(9, "fastnlm", 3, (0., 0., 0.), denoise.fastnlm, ft=True)
    add_srgb(10, "skip", 0, (), color.skip)
    add_srgb(11, "wbmanual", 3, (-1.38, -1.38, -1.38), color.wb_manual)
    add("srgb", 12, OpSpec(
        "path_bgr", "srgb", 0, (),
        apply=lambda x, p, w: cnn.apply_path14_bgr(w, x, p),
        init_weights=lambda key: cnn.init_path14_bgr(key, 0),
        latency=_DEFAULT_LATENCY["path_bgr"]))
    add_srgb(13, "wbquadratic", 30, _WBQ_INIT, color.wb_quadratic)
    add_srgb(14, "gtmmanual", 3, (-1.099, 0., 1.099), tone.gtm_manual)
    # BM3D: proxy-only, 5 params (cff, n1, cspace, wtransform, neighborhood);
    # init logits sigmoid to the probabilities noted at super_prune...py:138-139.
    # The proxy trains against the native transform-domain denoiser
    # (ops/denoise.dct_denoise) — the reference instead shipped an externally
    # pretrained checkpoint (super_prune...py:46).
    add_srgb(15, "bm3d", 5, (-1.946, 1.099, -1.099, -1.099, 2.708), None,
             ft=True, ft_target_apply=denoise.dct_denoise)

    # conditional ops (reference isp_universal.py:89-91, 16-18)
    for idx, (name, n_glob, base) in enumerate([
            ("conditional_gamma", 1, (0.,)),
            ("conditional_wb_manual", 3, (-1.38, -1.38, -1.38)),
            ("conditional_wb_quadratic", 30, _WBQ_INIT)], start=16):
        apply_fn = {"conditional_gamma": conditional.conditional_gamma,
                    "conditional_wb_manual": conditional.conditional_wb_manual,
                    "conditional_wb_quadratic": conditional.conditional_wb_quadratic}[name]
        total = conditional.conditional_n_params(
            conditional.DEFAULT_IN_CHANNELS, n_glob)
        add("srgb", idx, OpSpec(
            name, "srgb", total, (), apply=apply_fn, conditional=True,
            init_params=_conditional_init(n_glob, base),
            latency=_DEFAULT_LATENCY[name]))

    return reg


_REGISTRY = _build_registry()

# name -> (index, spec) per domain
registry = _REGISTRY


def get_op(domain: str, name_or_index) -> OpSpec:
    dom = _REGISTRY[domain]
    if isinstance(name_or_index, int):
        for _, (idx, spec) in dom.items():
            if idx == name_or_index:
                return spec
        raise KeyError(f"no op with index {name_or_index} in domain {domain}")
    return dom[name_or_index][1]


def pool(domain: str):
    """Ordered list of OpSpecs for a domain (1-based reference order)."""
    items = sorted(_REGISTRY[domain].values(), key=lambda t: t[0])
    return [spec for _, spec in items]


def op_index(domain: str, name: str) -> int:
    return _REGISTRY[domain][name][0]


# The supernet's sRGB slots use ops 1..15 only (reference super_prune...py:101-118);
# conditional ops 16-18 are fixed-pipeline-only, as in the reference.
SUPERNET_SRGB_COUNT = 15
