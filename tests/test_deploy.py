"""Serving-artifact export/load (reconfigisp_tpu/deploy.py).

The reference has no deployment path (inference = torch test scripts,
codes/test.py:21-107); these tests pin the framework's AOT serving story:
weights baked into a portable program, byte-roundtrip, tiled engine parity,
and metadata integrity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reconfigisp_tpu import deploy
from reconfigisp_tpu.pipeline import Pipeline

ARCH = "Bayer_02_Demosaic_03_sRGB_06_02"


@pytest.fixture(scope="module")
def pipe_state():
    pipe = Pipeline(ARCH)
    state = pipe.init(jax.random.PRNGKey(3))
    return pipe, state


def _mosaic(rng, n=1, s=16):
    return jnp.asarray(rng.uniform(0.05, 0.95, (n, s, s, 1)).astype(np.float32))


class TestWholeFrame:
    def test_roundtrip_matches_direct_call(self, pipe_state, rng):
        pipe, state = pipe_state
        x = _mosaic(rng)
        blob = deploy.export_pipeline(pipe, state, (1, 16, 16, 1))
        served = deploy.load_pipeline(blob)
        got = np.asarray(served(x))
        want = np.asarray(pipe(state, x))
        assert got.shape == (1, 16, 16, 3)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_weights_are_baked_in(self, pipe_state, rng):
        """Two different states export to programs with different outputs —
        the artifact, not the caller, carries the weights."""
        pipe, state = pipe_state
        state2 = pipe.init(jax.random.PRNGKey(99))
        # perturb a logit so the programs genuinely differ
        k = next(iter(state2["logits"]))
        state2["logits"][k] = state2["logits"][k] + 2.0
        x = _mosaic(rng)
        a = deploy.load_pipeline(
            deploy.export_pipeline(pipe, state, (1, 16, 16, 1)))(x)
        b = deploy.load_pipeline(
            deploy.export_pipeline(pipe, state2, (1, 16, 16, 1)))(x)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_file_roundtrip_and_metadata(self, pipe_state, tmp_path, rng):
        pipe, state = pipe_state
        blob = deploy.export_pipeline(pipe, state, (2, 16, 16, 1),
                                      storage="bf16")
        p = str(tmp_path / "pipe.rispt")
        deploy.save_artifact(p, blob)
        served = deploy.load_pipeline(p)
        assert served.architecture == ARCH
        assert served.input_shape == (2, 16, 16, 1)
        assert served.meta["cnn_storage"] == "bfloat16"
        assert served.meta["patch"] is None
        y = served(_mosaic(rng, n=2))
        assert np.asarray(y).shape == (2, 16, 16, 3)

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError, match="artifact"):
            deploy.load_pipeline(b"NOTANART" + b"\0" * 32)

    def test_multi_platform_export(self, pipe_state, rng):
        """A CPU host can author a TPU-serving artifact: lowering for
        ["tpu", "cpu"] embeds both targets and the loader picks the local
        one (how production artifacts are built off-accelerator)."""
        pipe, state = pipe_state
        blob = deploy.export_pipeline(pipe, state, (1, 16, 16, 1),
                                      platforms=["tpu", "cpu"])
        served = deploy.load_pipeline(blob)
        assert served.meta["platforms"] == ["tpu", "cpu"]
        y = served(_mosaic(rng))
        assert np.isfinite(np.asarray(y)).all()

    def test_symbolic_batch(self, pipe_state, rng):
        """One whole-frame artifact serves any batch size (N='b')."""
        pipe, state = pipe_state
        served = deploy.load_pipeline(
            deploy.export_pipeline(pipe, state, ("b", 16, 16, 1)))
        assert served.meta["input_shape"][0] == "b"
        for n in (1, 3):
            assert np.asarray(served(_mosaic(rng, n=n))).shape == (n, 16, 16, 3)
        with pytest.raises(ValueError, match="whole-frame"):
            deploy.export_pipeline(pipe, state, ("b", 32, 32, 1), patch=16)


class TestTiledEngine:
    def test_tiled_export_matches_tiled_apply(self, pipe_state, rng):
        from reconfigisp_tpu.parallel.tiling import tiled_apply
        pipe, state = pipe_state
        x = _mosaic(rng, s=48)
        blob = deploy.export_pipeline(pipe, state, (1, 48, 48, 1),
                                      patch=32, stride=24, chunk=2)
        served = deploy.load_pipeline(blob)
        want = np.asarray(tiled_apply(lambda t: pipe(state, t), x,
                                      patch=32, stride=24, chunk=2))
        np.testing.assert_allclose(np.asarray(served(x)), want, atol=1e-6)
        assert served.meta["patch"] == 32 and served.meta["stride"] == 24

    def test_wrong_shape_rejected(self, pipe_state, rng):
        pipe, state = pipe_state
        served = deploy.load_pipeline(
            deploy.export_pipeline(pipe, state, (1, 16, 16, 1)))
        with pytest.raises(Exception):
            served(_mosaic(rng, s=32))


class TestShardedServing:
    def test_mesh_export_matches_replicated(self, pipe_state, rng):
        """A (4 data x 2 space) artifact on the virtual 8-device mesh:
        batch sharded over data, height over space (SPMD conv halos),
        output identical to the single-device program."""
        pipe, state = pipe_state
        x = _mosaic(rng, n=8, s=32)
        blob = deploy.export_pipeline(pipe, state, (8, 32, 32, 1),
                                      data_parallel=4, space_parallel=2)
        served = deploy.load_pipeline(blob)
        assert served.meta["mesh"] == {"data": 4, "space": 2}
        got = np.asarray(served(x))
        want = np.asarray(pipe(state, x))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_mesh_plus_tiling_rejected(self, pipe_state):
        pipe, state = pipe_state
        with pytest.raises(ValueError, match="whole-frame"):
            deploy.export_pipeline(pipe, state, (8, 64, 64, 1),
                                   patch=32, data_parallel=4,
                                   space_parallel=2)


class TestCli:
    def test_export_cli(self, tmp_path, monkeypatch):
        import importlib.util
        import os
        import sys
        spec = importlib.util.spec_from_file_location(
            "export_pipeline_cli",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "tools", "export_pipeline.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        out = str(tmp_path / "synthetic.rispt")
        monkeypatch.setattr(sys, "argv", [
            "export_pipeline.py", "--opt", "configs/synthetic_test.yaml",
            "--shape", "1x32x32x1", "--out", out])
        mod.main()
        served = deploy.load_pipeline(out)
        y = served(np.full((1, 32, 32, 1), 0.5, np.float32))
        assert np.isfinite(np.asarray(y)).all()
