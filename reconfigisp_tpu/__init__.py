"""reconfigisp_tpu — a TPU-native reconfigurable-ISP framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ReconfigISP
(ICCV 2021, reference: yuke93/ReconfigISP): differentiable ISP module search
with DARTS-style bilevel optimization, proxy-network tuning for black-box
modules, pixel- or detection-driven objectives, and halo-tiled full-resolution
inference — all expressed as pure functions over parameter pytrees so a whole
raw->sRGB pipeline (or the full mixed-op supernet step) compiles to a single
XLA program.

Layout conventions (TPU-first, differs from the torch reference):
  * images are NHWC (reference uses NCHW);
  * sRGB channel order is BGR, matching the reference's data pipeline
    (reference codes/models/modules/tools_origin.py:37);
  * Bayer mosaics are (N, H, W, 1), RGGB, values in [0, 1];
  * all module parameters are stored as unconstrained logits and squashed
    with sigmoid into [0, 1] at application time
    (reference codes/models/modules/super_prune_fifteen_demos_four_bayer_two.py:206-210).
"""

from reconfigisp_tpu.version import __version__
from reconfigisp_tpu.registry import OpSpec, get_op, pool
from reconfigisp_tpu.pipeline import Pipeline, parse_architecture

__all__ = [
    "__version__",
    "OpSpec",
    "get_op",
    "pool",
    "Pipeline",
    "parse_architecture",
]
