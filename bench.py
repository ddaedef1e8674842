"""Headline benchmark: raw->sRGB throughput at 12 MP on one TPU chip.

Pipeline: the reference's SID fixed architecture Bayer_01_Demosaic_03_sRGB_01_13_11
(reference codes/options/train/SID_isp.yml:28) — Path-Restore-14L Bayer
denoise, Malvar demosaic, gamma, quadratic CCM, manual WB — compiled to one
XLA program over an HBM-resident 4096x3072 mosaic (12.6 MP).

Baseline: the reference implementation targets CUDA GPUs, which this
environment does not have.  `vs_baseline` is therefore the ratio against a
DOCUMENTED GPU-class estimate (GPU_EST_* constants below: the same tiled
FLOP count at 40% of V100 fp32 peak, ~24 MP/s — BASELINE.md's >=10x
PyTorch-GPU target is judged against this).  The same pipeline independently
written in PyTorch is still measured on the available torch backend (CPU,
~0.34 MP/s at 512x512, cached in .bench_baseline.json) and reported as the
secondary `vs_torch_cpu_measured` key; through round 3 that CPU ratio was
what `vs_baseline` held, which was apples-to-oranges vs the target.
History: 49.6 MP/s (r1, f32, strided Bayer pack, per-frame dispatch) ->
105 MP/s (r2: bf16 storage, reshape-based pack, fused elementwise CCM,
multi-frame dispatch amortizing the ~25 ms tunnel RTT) -> 183.6 MP/s (r2,
BENCH_r02.json: batched-tile inference engine — the jitted feathered tile
program drives the conv stack ~2x harder than one 12 MP-wide conv) ->
210 MP/s (r3: chunk 32 / 8 frames per dispatch, round-3 tile sweep) ->
218 MP/s (r3: pipelined dispatches — enqueue every dispatch before
blocking, hiding the remaining per-dispatch tunnel RTT behind device
compute) -> 311.2 MP/s (r3, BENCH_r03.json: the 183.6-218 figures had
silently measured an f32-storage program — policy_jit dispatches on the
policy active at each call, and the timed loop sat OUTSIDE the
cnn_storage('bf16') context; holding the policy for the whole measurement
recovers the bf16 program: ~40 ms / 12 MP frame).

Prints exactly one JSON line:
  {"metric": ..., "value": MP/s, "unit": "MP/s", "vs_baseline": ratio,
   "mfu": achieved/peak FLOPs, "baseline": what vs_baseline compares against}
"""

from __future__ import annotations

import json
import os
import sys
import time

H, W = 3072, 4096  # 12.58 MP
MP = H * W / 1e6
ARCH = "Bayer_01_Demosaic_03_sRGB_01_13_11"
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_baseline.json")
# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16
PEAK_FLOPS = 197e12
# GPU-class baseline ESTIMATE (no GPU exists in this environment; the
# measured torch figure below is CPU-only).  BASELINE.md's target is >=10x
# PyTorch-GPU raw->sRGB throughput.  Estimate: the pipeline is conv-stack
# dominated (~3.3 TFLOP per 12 MP frame over the same overlap-tiled grid,
# counted below); reference-era torch runs it fp32 without AMP, and cudnn
# 3x3/64ch conv stacks sustain ~40% of fp32 peak.  On a V100 (15.7 TFLOP/s
# fp32; 2080Ti=13.4, A100=19.5 bracket it) that is ~6.3 TFLOP/s ->
# ~1.9 frames/s -> ~24 MP/s.  Even a physically-unachievable 100%-of-peak
# V100 caps at ~60 MP/s.
GPU_EST_PEAK_FP32 = 15.7e12   # V100
GPU_EST_EFFICIENCY = 0.40     # sustained fraction of peak for this stack


def analytic_flops_per_frame(state, patch: int) -> float:
    """MXU/VPU work per tile, counted from the ACTUAL program parameters.

    * conv stack: every 4-D kernel leaf in the pipeline state is a
      (kh, kw, cin, cout) conv evaluated at packed (patch/2)^2 resolution
      (ops/cnn.py Path-Restore runs on RGGB planes) -> 2*kh*kw*cin*cout
      flops/packed-px.  Derived from `state`, not hardcoded shapes, so an
      ARCH change cannot silently stale the count.
    * demosaic: counted from the actual stencil bank the op evaluates
      (ops/demosaic.py _demosaic_conv): distinct stencils are computed once
      (the op dedups by bytes), each costing ~2*ntaps flops/px over its
      nonzero taps, then 12 (color, phase) slots blend at 2 flops/px each.
    * remaining sRGB ops are elementwise (<40 flops/px) — ignored; the
      total is approximate but within a few percent of the MXU work.
    """
    import numpy as np
    import jax.tree_util as jtu
    assert "Demosaic_03" in ARCH, (
        "analytic count assumes the Malvar stencil demosaic; re-derive for "
        f"other demosaic choices (ARCH={ARCH})")
    conv_per_px = sum(
        2 * int(np.prod(leaf.shape))
        for leaf in jtu.tree_leaves(state)
        if hasattr(leaf, "shape") and len(getattr(leaf, "shape", ())) == 4)
    conv = conv_per_px * (patch // 2) ** 2

    from reconfigisp_tpu.ops.demosaic import _BANKS
    bank = _BANKS["malvar"]
    distinct = {k.tobytes(): int((k != 0).sum())
                for c in ("b", "g", "r") for k in bank[c]}
    stencil_per_px = sum(2 * n for n in distinct.values())
    blend_per_px = 12 * 2
    demosaic = (stencil_per_px + blend_per_px) * patch ** 2
    return conv + demosaic


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _device_plane_seconds(trace_dir: str, plane_match=None):
    """Parse a jax.profiler xspace dump and return the device-side
    execution time of the traced region in seconds, or None if no device
    plane was emitted (CPU runs, or a PJRT plugin without profiling).

    The device plane ("/device:TPU:N") carries per-line event streams;
    the "XLA Modules" line holds one event per executed XLA program whose
    duration is the device wall time of that dispatch INCLUDING
    intra-module pipeline gaps — the honest MFU denominator.  We take the
    line with the largest event-duration sum on the device plane (the
    module line dominates the op line by construction), summed over the
    traced region.
    """
    import glob as _glob
    from jax.profiler import ProfileData

    pbs = _glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                     recursive=True)
    if not pbs:
        return None
    pd = ProfileData.from_file(max(pbs, key=os.path.getmtime))
    if plane_match is None:
        plane_match = lambda n: n.startswith("/device:") or "TPU" in n  # noqa: E731
    best = 0.0
    for plane in pd.planes:
        if not plane_match(plane.name):
            continue
        for line in plane.lines:
            tot = sum(e.duration_ns for e in line.events) / 1e9
            best = max(best, tot)
    return best if best > 0 else None


def measure_trace_mfu(fwd, state, stack, flops_per_dispatch):
    """Trace-derived MFU (the third derivation, VERDICT r4 #9): capture a
    jax.profiler device trace of ONE dispatch and divide the analytic
    FLOP count by the TPU plane's measured module-execution time.  Unlike
    the wall-clock MFU this excludes host sync and the ~25 ms tunnel RTT,
    so it bounds the on-device duty cycle from the hardware's own
    timeline rather than from host-visible latency.
    Returns (device_seconds, mfu) or (None, None)."""
    import shutil
    import tempfile
    import jax

    d = tempfile.mkdtemp(prefix="bench_trace_")
    try:
        with jax.profiler.trace(d):
            float(fwd(state, stack))  # device->host true-completion dep
        dev_s = _device_plane_seconds(d)
        if dev_s is None:
            return None, None
        return dev_s, flops_per_dispatch / dev_s / PEAK_FLOPS
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------- TPU measure

def measure_tpu() -> float:
    from reconfigisp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from reconfigisp_tpu.pipeline import Pipeline
    from reconfigisp_tpu.parallel.tiling import tiled_apply
    from reconfigisp_tpu import precision

    log(f"jax devices: {jax.devices()}")
    pipe = Pipeline(ARCH)
    state = pipe.init(jax.random.PRNGKey(0))
    # Timing protocol: the device tunnel memoizes identical dispatches AND
    # reports block_until_ready optimistically, so honest timing needs
    # (a) distinct frames per dispatch and (b) a true device->host scalar
    # dependency.  Each dispatch additionally pays a ~25 ms tunnel round
    # trip, so one dispatch processes FPD frames via lax.scan and the
    # per-frame time divides it out (throughput, not latency).
    #
    # The frames run through the production inference engine: the jitted
    # feather-blended tile program (parallel/tiling.py; same overlap ratio
    # as the reference's split-test configs) with bf16 storage — batched
    # 256px tiles drive the conv stack ~2x harder than one 12 MP-wide conv
    # (same ops and blending as test.py's split mode).
    # All FPD frames enter one dispatch as the tile batch dimension.
    # Round-3 sweep (patch {128,192,256,384} x chunk {16,32} x FPD {4,8}):
    # 256px tiles stay best; chunk 16->32 and FPD 4->8 each add ~15%
    # (bigger map-step batches drive the MXU harder and amortize more of
    # the tunnel RTT) -> 210 MP/s vs 183.6 at chunk 16/FPD 4.
    FPD = 8
    PATCH, STRIDE, CHUNK = 256, 240, 32

    def tiled(s, xs):
        return jnp.sum(tiled_apply(lambda pp: pipe(s, pp), xs,
                                   patch=PATCH, stride=STRIDE, chunk=CHUNK))

    fwd = precision.policy_jit(tiled)
    iters = 6
    stacks = [jax.random.uniform(jax.random.PRNGKey(i), (FPD, H, W, 1),
                                 jnp.float32, 0.02, 0.98)
              for i in range(iters + 2)]
    # the storage-dtype policy applies at TRACE time, and policy_jit
    # dispatches on the policy active AT EACH CALL — so the bf16 context
    # must cover the drain and the timed loop too, or they silently compile
    # and measure a separate f32 program (precision.py; this exact bug once
    # shaved the recorded headline)
    with precision.cnn_storage("bf16"):  # bf16 inter-layer storage on TPU
        t0 = time.perf_counter()
        float(fwd(state, stacks[0]))
        log(f"compile+first run: {time.perf_counter() - t0:.2f}s")
        float(fwd(state, stacks[1]))  # drain
        # Throughput protocol: PIPELINED dispatches — enqueue every dispatch
        # (distinct frames each) before fetching any result, so the ~25 ms
        # tunnel RTT overlaps device compute instead of serializing with it
        # (+5% over dispatch-then-fetch).  The device->host float() fetches
        # at the end are the true-completion dependency; total wall time
        # over all frames is the throughput.  Two passes, best-of-2, to
        # shrug off a transient tunnel stall.
        dts = []
        for half in range(2):
            batch = stacks[2 + half * (iters // 2):
                           2 + (half + 1) * (iters // 2)]
            t0 = time.perf_counter()
            outs = [fwd(state, s) for s in batch]
            for o in outs:
                float(o)
            dts.append((time.perf_counter() - t0) / (len(batch) * FPD))
        dt = min(dts)
        mps = MP / dt

        # MFU: analytic FLOP count of the dispatched program / wall / peak.
        # XLA's compiled cost_analysis() undercounts the WHOLE tiled program
        # ~7x (it does not multiply the lax.map body by its trip count:
        # 3.73 TFLOP/dispatch reported vs ~26 analytic), so the MXU work is
        # (a) counted from the actual program parameters
        #     (analytic_flops_per_frame: conv shapes from the state pytree,
        #      demosaic taps from the stencil bank) over the tile grid
        #     incl. map-group padding (padded tiles are computed too), and
        # (b) CONFIRMED by the compiler on the lax.map BODY alone — one map
        #     step has no trip count to drop, so cost_analysis(body) is
        #     trustworthy, and body_flops * n_map_steps is a second,
        #     compiler-derived count of the same dispatch (within a few %:
        #     XLA counts the elementwise sRGB tail the analytic one skips).
        from reconfigisp_tpu.parallel.tiling import tile_positions
        tiles = len(tile_positions(H, PATCH, STRIDE)) \
            * len(tile_positions(W, PATCH, STRIDE)) * FPD
        group = CHUNK * FPD
        tiles += (-tiles) % group  # map-group padding is computed work
        per_tile = analytic_flops_per_frame(state, PATCH)
        flops_per_dispatch = tiles * per_tile
        mfu = flops_per_dispatch / FPD / dt / PEAK_FLOPS
        log(f"analytic: {flops_per_dispatch / 1e12:.2f} TFLOP/dispatch "
            f"({tiles} tiles) -> "
            f"{flops_per_dispatch / FPD / dt / 1e12:.1f} TFLOP/s bf16 "
            f"(peak {PEAK_FLOPS / 1e12:.0f}; C=64 lane-packing ceiling "
            f"~98 -> ~{flops_per_dispatch / FPD / dt / 98e12:.0%} of it)")
        mfu_xla = None
        try:
            n_steps = tiles // group
            body = jax.jit(lambda s, pp: pipe(s, pp))
            tile_batch = jnp.zeros((group, PATCH, PATCH, 1), jnp.float32)
            cost = body.lower(state, tile_batch).compile().cost_analysis()
            if isinstance(cost, list):  # older jax returns [dict]
                cost = cost[0]
            body_flops = float(cost.get("flops", float("nan")))
            xla_total = body_flops * n_steps
            mfu_xla = xla_total / FPD / dt / PEAK_FLOPS
            log(f"compiler reconciliation: cost_analysis(map body) = "
                f"{body_flops / 1e9:.2f} GFLOP x {n_steps} map steps = "
                f"{xla_total / 1e12:.2f} TFLOP/dispatch "
                f"(analytic {flops_per_dispatch / 1e12:.2f}; "
                f"ratio {xla_total / flops_per_dispatch:.3f}) "
                f"-> mfu_xla {mfu_xla:.3f}")
            whole = jax.jit(tiled).lower(state, stacks[0]).compile() \
                .cost_analysis()
            if isinstance(whole, list):
                whole = whole[0]
            log(f"cost_analysis(whole program) = "
                f"{float(whole.get('flops', float('nan'))) / 1e12:.2f} "
                f"TFLOP/dispatch (drops the lax.map trip count — the known "
                f"undercount)")
        except Exception as e:  # pragma: no cover - backend-dependent
            log(f"cost_analysis unavailable: {e}")
        mfu_trace = None
        try:
            trace_s, mfu_trace = measure_trace_mfu(
                fwd, state, stacks[0], flops_per_dispatch)
            if mfu_trace is not None:
                log(f"device trace: {trace_s * 1e3:.1f} ms on-device per "
                    f"{FPD}-frame dispatch -> mfu_trace {mfu_trace:.3f} "
                    f"(wall-derived {mfu:.3f}; gap = host sync + tunnel "
                    f"RTT hidden by pipelining in the wall figure)")
            else:
                log("device trace: no device plane emitted "
                    "(profiling unsupported on this backend)")
        except Exception as e:  # pragma: no cover - backend-dependent
            log(f"device trace unavailable: {e}")
    log(f"tpu: best-of-2 pipelined {iters // 2}x{FPD}-frame dispatch groups "
        f"-> {mps:.1f} MP/s ({dt * 1e3:.1f} ms / 12MP frame, mfu {mfu:.3f}"
        + (f", mfu_xla {mfu_xla:.3f}" if mfu_xla is not None else "") + ")")
    return mps, mfu, mfu_xla, flops_per_dispatch / FPD, mfu_trace


# ------------------------------------------------------------ torch baseline

def measure_torch_baseline() -> float:
    """Same pipeline in PyTorch on the available torch backend (CPU).
    Measured at 512x512, 2 iters, reported as MP/s."""
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cached = json.load(f)
        if cached.get("arch") == ARCH:
            log(f"torch baseline (cached): {cached['mps']:.2f} MP/s")
            return cached["mps"]

    import numpy as np
    import torch
    import torch.nn.functional as F

    s = 512
    torch.manual_seed(0)

    # Path-Restore-14L Bayer: RGGB pack -> conv stack -> pixel shuffle
    convs = [torch.randn(64, 4, 3, 3) * 0.05] + \
            [torch.randn(64, 64, 3, 3) * 0.05 for _ in range(12)] + \
            [torch.randn(4, 64, 3, 3) * 0.05]
    ccm = torch.randn(10, 3) * 0.1

    def run(x):  # x (1,1,H,W) bayer
        packed = torch.cat([x[:, :, 0::2, 0::2], x[:, :, 0::2, 1::2],
                            x[:, :, 1::2, 0::2], x[:, :, 1::2, 1::2]], 1)
        y = packed
        for i, wgt in enumerate(convs):
            y = F.conv2d(y, wgt, padding=1)
            if i < len(convs) - 1:
                y = F.relu(y)
        bayer = F.pixel_shuffle(y, 2)
        # malvar demosaic (3 output channels x 4 phases as one conv)
        bank = torch.randn(12, 1, 5, 5) * 0.1
        dem = F.conv2d(bayer, bank, padding=2)
        rgbish = dem[:, :3] + dem[:, 3:6] + dem[:, 6:9] + dem[:, 9:12]
        img = torch.sigmoid(rgbish)
        # gamma
        img = img.clamp(1e-6, 1) ** 0.8
        # quadratic CCM
        b, g, r = img[:, 0], img[:, 1], img[:, 2]
        basis = torch.stack([b * b, g * g, r * r, b * g, b * r, g * r,
                             b, g, r, torch.ones_like(b)], -1)
        img = (basis @ ccm).permute(0, 3, 1, 2).clamp(0, 1)
        # manual WB
        return (img * torch.tensor([1.0, 0.9, 1.1]).view(1, 3, 1, 1)).clamp(0, 1)

    x = torch.rand(1, 1, s, s)
    with torch.no_grad():
        run(x)  # warmup
        iters = 2
        t0 = time.perf_counter()
        for _ in range(iters):
            run(x)
        dt = time.perf_counter() - t0
    mps = (s * s / 1e6) * iters / dt
    log(f"torch baseline: {iters} iters @ {s}x{s} in {dt:.2f}s -> {mps:.2f} MP/s")
    with open(CACHE, "w") as f:
        json.dump({"arch": ARCH, "mps": mps}, f)
    return mps


def main():
    # The axon tunnel can be transiently DOWN (backend init retries then
    # raises UNAVAILABLE).  Retry a few times so a short outage at
    # round-end doesn't zero the recorded bench.
    attempts = int(os.environ.get("BENCH_TUNNEL_ATTEMPTS", "3"))
    for i in range(attempts):
        try:
            tpu_mps, mfu, mfu_xla, flops_per_frame, mfu_trace = measure_tpu()
            break
        except Exception as e:  # backend init / UNAVAILABLE
            log(f"TPU measurement attempt {i + 1}/{attempts} failed: {e}")
            if i + 1 == attempts:
                raise
            time.sleep(150)
    try:
        cpu_mps = measure_torch_baseline()
        vs_cpu = tpu_mps / cpu_mps
    except Exception as e:  # pragma: no cover
        log(f"baseline measurement failed: {e}")
        vs_cpu = float("nan")
    # vs_baseline: ratio against a DOCUMENTED GPU-class estimate (see
    # GPU_EST_* at top) — BASELINE.md's target is >=10x PyTorch-GPU and no
    # GPU exists here, so the denominator is the same tiled FLOP count at
    # 40% of V100 fp32 peak.  The measured torch-CPU ratio is kept as a
    # secondary key (it was `vs_baseline` through round 3 and is NOT
    # comparable to the target).
    gpu_est_mps = MP * GPU_EST_PEAK_FP32 * GPU_EST_EFFICIENCY \
        / flops_per_frame
    vs = tpu_mps / gpu_est_mps
    log(f"gpu-class estimate: {flops_per_frame / 1e12:.2f} TFLOP/frame at "
        f"{GPU_EST_EFFICIENCY:.0%} of V100 fp32 peak -> "
        f"{gpu_est_mps:.1f} MP/s; vs_baseline {vs:.2f}x "
        f"(100%-of-peak bound would be {gpu_est_mps / GPU_EST_EFFICIENCY:.0f}"
        f" MP/s -> {vs * GPU_EST_EFFICIENCY:.1f}x)")
    print(json.dumps({
        "metric": "raw2srgb_throughput_12mp",
        "value": round(tpu_mps, 2),
        "unit": "MP/s",
        "vs_baseline": round(vs, 2),
        "baseline": f"pytorch-gpu-estimate(V100-fp32@"
                    f"{GPU_EST_EFFICIENCY:.0%}peak={gpu_est_mps:.1f}MP/s)",
        "vs_torch_cpu_measured": round(vs_cpu, 2) if vs_cpu == vs_cpu
        else None,
        "mfu": round(mfu, 4) if mfu == mfu else None,
        "mfu_xla_body_x_tripcount": round(mfu_xla, 4)
        if mfu_xla is not None else None,
        "mfu_trace_device": round(mfu_trace, 4)
        if mfu_trace is not None else None,
    }))


if __name__ == "__main__":
    main()
