"""AOT export and serving artifacts for fixed ISP pipelines.

The reference has no deployment story — inference means re-running its test
scripts against torch checkpoints (reference codes/test.py:21-107,
codes/test_split.py:56-142), so a serving host needs the full framework,
the op zoo, and a Python re-trace per process.  Here a searched/trained
pipeline exports to a **self-contained StableHLO artifact** (`jax.export`):

  * weights and op parameters are baked in as program constants — the
    artifact is the single file a serving binary needs (plus jax itself;
    this package is NOT required at load time);
  * the program is the production inference path: whole-frame, or the
    single-dispatch feathered batched-tile engine (parallel/tiling.py) for
    12 MP-class frames in bounded memory;
  * the CNN storage-precision policy (precision.py) is applied at export
    trace time and recorded in the artifact metadata;
  * `platforms=["tpu"]` (or cpu/cuda) pins where the portable bytecode may
    run; loading compiles for the local device — no Python re-trace.

Artifact layout: ``RISPTPU1`` magic, uint32 little-endian header length, a
UTF-8 JSON header (version, architecture, shapes, tiling, precision), then
the `jax.export` blob.
"""

from __future__ import annotations

import json
import struct
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from reconfigisp_tpu import precision
from reconfigisp_tpu.pipeline import Pipeline

MAGIC = b"RISPTPU1"
_VERSION = 1


def make_serving_fn(pipe: Pipeline, state: dict, *,
                    patch: Optional[int] = None,
                    stride: Optional[int] = None,
                    chunk: int = 32):
    """image -> sRGB closure over `state`, ready to jit/export.

    With `patch` set, the program is the feathered tiled engine (the
    memory-bounded full-resolution path, reference test_split.py parity);
    `stride` defaults to patch (no overlap), `chunk` tiles per map step.
    """
    if patch:
        from reconfigisp_tpu.parallel.tiling import tiled_apply
        st = int(stride or patch)

        def fn(x):
            return tiled_apply(lambda t: pipe(state, t), x,
                               patch=int(patch), stride=st, chunk=chunk)
    else:
        def fn(x):
            return pipe(state, x)
    return fn


def _mesh_shardings(data: int, space: int):
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    n = data * space
    if len(jax.devices()) < n:
        raise ValueError(f"mesh data={data} x space={space} needs {n} "
                         f"devices, have {len(jax.devices())}")
    mesh = Mesh(np.array(jax.devices()[:n]).reshape(data, space),
                ("data", "space"))
    return mesh, NamedSharding(mesh, PartitionSpec("data", "space",
                                                   None, None))


def export_pipeline(pipe: Pipeline, state: dict,
                    input_shape: Sequence[int], *,
                    patch: Optional[int] = None,
                    stride: Optional[int] = None,
                    chunk: int = 32,
                    storage: Optional[str] = None,
                    data_parallel: int = 1,
                    space_parallel: int = 1,
                    platforms: Optional[Sequence[str]] = None) -> bytes:
    """Export `pipe` with `state` baked in as a serving artifact (bytes).

    input_shape: (N, H, W, C) of the serving request (XLA programs are
    shape-specialized; export one artifact per served shape).  For the
    whole-frame path N may be -1 or "b": the batch dim is exported
    symbolically and one artifact serves any batch size (the tiled engine
    needs a concrete batch — its chunk grouping is shape-arithmetic).
    storage: CNN inter-layer storage dtype applied at trace time
    ('bf16' recommended on TPU; None = the active policy).
    data_parallel/space_parallel: bake a (data x space) mesh into the
    program — batch sharded over 'data', image height over 'space' (the
    SPMD partitioner inserts the conv halo exchanges over ICI, the same
    layout parallel/mesh.py trains with).  The artifact then requires
    data*space local devices at load time; whole-frame path only.
    platforms: lowering targets, e.g. ["tpu"]; None = current backend.
    """
    fn = make_serving_fn(pipe, state, patch=patch, stride=stride,
                         chunk=chunk)
    mesh_dims = (int(data_parallel), int(space_parallel))
    jit_kw = {}
    if mesh_dims != (1, 1):
        if patch:
            raise ValueError("mesh-sharded export is whole-frame only; the "
                             "tiled engine is the single-chip memory story")
        _, sharding = _mesh_shardings(*mesh_dims)
        jit_kw = {"in_shardings": sharding, "out_shardings": sharding}
    dims = list(input_shape)
    poly_batch = dims[0] in (-1, "b", None)
    if poly_batch:
        if patch:
            raise ValueError("symbolic batch is whole-frame only; the tiled "
                             "engine needs a concrete batch size")
        dims[0] = jax.export.symbolic_shape("b")[0]
    spec = jax.ShapeDtypeStruct(tuple(dims), jnp.float32)
    if storage:
        with precision.cnn_storage(storage):
            exported = jax.export.export(
                jax.jit(fn, **jit_kw), platforms=platforms)(spec)
        storage_name = jnp.dtype(precision._DTYPES[storage]).name
    else:
        exported = jax.export.export(
            jax.jit(fn, **jit_kw), platforms=platforms)(spec)
        storage_name = jnp.dtype(precision.cnn_storage_dtype()).name
    header = {
        "version": _VERSION,
        "architecture": pipe.architecture,
        "use_proxy": pipe.use_proxy,
        "input_shape": ["b" if poly_batch else int(dims[0])]
                       + [int(d) for d in dims[1:]],
        "dtype": "float32",
        "patch": int(patch) if patch else None,
        "stride": int(stride or patch) if patch else None,
        "chunk": int(chunk) if patch else None,
        "cnn_storage": storage_name,
        "mesh": ({"data": mesh_dims[0], "space": mesh_dims[1]}
                 if mesh_dims != (1, 1) else None),
        "platforms": list(exported.platforms),
    }
    hjson = json.dumps(header).encode("utf-8")
    return MAGIC + struct.pack("<I", len(hjson)) + hjson + exported.serialize()


def save_artifact(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


class ServingPipeline:
    """A loaded artifact: `meta` dict + `__call__(image) -> sRGB`.

    Loading deserializes portable StableHLO and compiles for the local
    device on first call — no access to the op zoo or the original weights
    is needed (they are constants inside the program).
    """

    def __init__(self, meta: dict, exported):
        self.meta = meta
        self._exported = exported
        self._sharding = None
        mesh = meta.get("mesh")
        if mesh:
            _, self._sharding = _mesh_shardings(mesh["data"], mesh["space"])

    @property
    def architecture(self) -> str:
        return self.meta["architecture"]

    @property
    def input_shape(self):
        return tuple(self.meta["input_shape"])

    def __call__(self, x) -> jnp.ndarray:
        x = jnp.asarray(x, jnp.float32)
        if self._sharding is not None:
            x = jax.device_put(x, self._sharding)
        return self._exported.call(x)


def load_pipeline(src: Union[str, bytes]) -> ServingPipeline:
    """Load an artifact from a path or raw bytes."""
    blob = src
    if isinstance(src, str):
        with open(src, "rb") as f:
            blob = f.read()
    if blob[:len(MAGIC)] != MAGIC:
        raise ValueError(
            f"not a reconfigisp_tpu serving artifact (magic {blob[:8]!r})")
    off = len(MAGIC)
    (hlen,) = struct.unpack("<I", blob[off:off + 4])
    off += 4
    meta = json.loads(blob[off:off + hlen].decode("utf-8"))
    if meta.get("version") != _VERSION:
        raise ValueError(f"unsupported artifact version {meta.get('version')}")
    exported = jax.export.deserialize(blob[off + hlen:])
    return ServingPipeline(meta, exported)
