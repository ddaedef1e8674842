"""Architecture strings -> executable ISP pipelines.

Re-design of IspUniversal / OriginUniversal
(reference codes/models/modules/isp_universal.py:130-232,
origin_universal.py:85-161): an architecture is *data* — the string
"Bayer_01_Demosaic_03_sRGB_01_13_11" parses to a static op list, and the whole
raw->sRGB pipeline applies as one pure function over a parameter pytree, so it
jits to a single XLA program (the reference dispatches per-module Python
objects per step).

State pytree layout:
  {"logits":  {step_name: (P,) array or None},
   "weights": {key: pytree}}           # key = step_name override or op name
Logits are squashed with sigmoid and broadcast per batch at apply time
(reference isp_universal.py:219-228); conditional ops take the raw vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reconfigisp_tpu.registry import OpSpec, get_op

_DOMAIN_TOKENS = {"Bayer": "bayer", "Demosaic": "demosaic", "sRGB": "srgb"}


def parse_architecture(arch: str):
    """"Bayer_01_Demosaic_03_sRGB_01_13_11" -> [(domain, 1-based index), ...]
    (reference isp_universal.py:130-164)."""
    steps = []
    domain = None
    for token in arch.split("_"):
        if token in _DOMAIN_TOKENS:
            domain = _DOMAIN_TOKENS[token]
            continue
        if domain is None:
            raise ValueError(
                f"architecture {arch!r} must start with a domain token")
        steps.append((domain, int(token)))
    if not steps:
        raise ValueError(f"empty architecture {arch!r}")
    return steps


class Pipeline:
    """A fixed ISP pipeline (the 'step 2' training / inference object).

    use_proxy=False -> native algorithms (OriginUniversal analog;
    reference origin_universal.py — there BM3D alone stays a proxy, same here).
    use_proxy=True  -> CNN imitators where they exist (IspUniversal analog).
    """

    def __init__(self, architecture: str, use_proxy: bool = False):
        self.architecture = architecture
        self.use_proxy = use_proxy
        self.steps = []
        for i, (domain, idx) in enumerate(parse_architecture(architecture)):
            spec = get_op(domain, idx)
            self.steps.append((f"step{i + 1}_{spec.name}", spec))

    # ------------------------------------------------------------------ state

    def init(self, key: jax.Array) -> dict:
        logits = {}
        weights = {}
        for step_name, spec in self.steps:
            key, k1, k2 = jax.random.split(key, 3)
            if spec.conditional:
                logits[step_name] = spec.init_params(k1)
            elif spec.n_params:
                logits[step_name] = jnp.asarray(spec.init_logits, jnp.float32)
            if self._needs_weights(spec) and spec.name not in weights:
                init = (spec.proxy_init
                        if (self.use_proxy or spec.proxy_only) and spec.proxy_init
                        else spec.init_weights)
                weights[spec.name] = init(k2)
        return {"logits": logits, "weights": weights}

    def _needs_weights(self, spec: OpSpec) -> bool:
        if spec.proxy_only:
            return spec.proxy_init is not None
        if self.use_proxy and spec.proxy_init is not None:
            return True
        return spec.init_weights is not None

    # ------------------------------------------------------------------ apply

    def __call__(self, state: dict, x: jnp.ndarray, *,
                 return_intermediates: bool = False):
        """x: (N, H, W, 1) Bayer (or partial-domain input) -> (N, H, W, 3) BGR.

        Returns y, or (y, intermediates, latency_ms_per_mp) when
        return_intermediates is set (reference isp_universal.py:210-232 records
        intermediate_results; latency is this framework's addition — the sum
        of per-op per-megapixel costs, feeding the latency-aware loss).
        """
        n = x.shape[0]
        mids = []
        latency = 0.0
        for step_name, spec in self.steps:
            params = self._materialize_params(state, step_name, spec, n, x.dtype)
            weights = state["weights"].get(step_name,
                                           state["weights"].get(spec.name))
            x = spec.get_apply(self.use_proxy)(x, params, weights)
            latency += spec.latency
            mids.append(x)
        if return_intermediates:
            return x, mids, jnp.asarray(latency, jnp.float32)
        return x

    @staticmethod
    def _materialize_params(state, step_name, spec, n, dtype):
        if spec.conditional:
            return state["logits"][step_name]
        if spec.n_params == 0:
            return None
        p01 = jax.nn.sigmoid(state["logits"][step_name]).astype(dtype)
        return jnp.broadcast_to(p01[None, :], (n, spec.n_params))

    # -------------------------------------------------------------- utilities

    @property
    def trainable_keys(self):
        """Step names owning trainable logits (= reference
        trainable_parameters, isp_universal.py:234-236)."""
        return [s for s, spec in self.steps
                if spec.n_params or spec.conditional]

    def describe(self) -> str:
        return " -> ".join(f"{s}({spec.domain})" for s, spec in self.steps)
