"""Benchmark: end-to-end fine-to-coarse depth on a SkysatLR18-sized
synthetic light field (540 x 960, 100 frames, 1 channel, d in [-1, 4],
120 candidates — the reference's SkysatLR18 [120] configuration,
report/rs_report.tex:430: 448 s on an i3-6100).

Prints ONE JSON line:
  {"metric": ..., "value": MPix/s, "unit": "MPix/s", "vs_baseline": x,
   "cold_s": ..., "steadystate_s": ..., "compile_s": ...,
   "quality_rmse_px": ..., "quality_ok": ...}

The pipeline runs TWICE in-process: the first (cold) timing includes
the platform's DEFERRED first-execution compile of each program (the
persistent .jax_cache only covers the small client-side step — see
docs/PERF.md; cold_s is additionally gated to beat the reference
binary's own runtime for the config).  The second run is the warm
steady-state; `value` and `vs_baseline` are the WARM throughput — the
number that measures the engine rather than the compiler.

Baseline: 100 * 540 * 960 px / 448 s = 0.1157 MPix/s end-to-end
(BASELINE.md).  Sizes can be scaled down with BENCH_SMALL=1 (the value
is still normalized to MPix/s of processed pixels).

Quality gate (round-2 verdict #1a): anchored to what the COMPILED
REFERENCE binary itself scores on the identical scene — measured by
scripts/ref_anchor.py and frozen in REF_ANCHOR.json.  The synthetic-GT
error is heavy-tailed at occlusions/ambiguous lines (median |err|
~0.08 px, RMSE ~1.37 px) and the reference produces that tail
identically, so the gate is a DELTA: repo RMSE <= ref RMSE + 0.1 px and
repo P90|err| <= ref P90 + 0.1 px, both over the pre-run
edge-confidence mask (a pure function of the input, identical for both
engines).
"""

import json
import os
import sys
import time

import numpy as np

# scripts/ref_anchor.py output, committed; keys are "SxVxUxD".
REF_ANCHOR_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "REF_ANCHOR.json")
RMSE_MARGIN_PX = 0.10
P90_MARGIN_PX = 0.10


def synthetic_sequence(S, V, U, seed=0, dmin=-1.0, dmax=4.0):
    """Layered moving-strip light field with band-limited texture.

    Each layer's radiance is an analytic sum of random sinusoids
    (wavelengths 6-60 px): smooth enough that the pipeline's 1-D linear
    interpolation resamples it almost exactly, yet with strong gradients
    so distinct disparity hypotheses decorrelate — the well-textured
    regime the algorithm (and satellite imagery) assumes.  A flat or
    heavily-smoothed texture leaves many EPI lines ambiguous under the
    h=0.2 bandwidth kernel and ANY correct implementation mis-scores
    them (measured: >10% of confident px off by up to the disparity
    range with the round-1 smoothed-noise texture).
    """
    rng = np.random.default_rng(seed)
    s_hat = S // 2
    n_layers = 6
    disps = np.sort(rng.uniform(dmin, dmax, n_layers))
    intervals = [(-10 * U, 10 * U)]
    for _ in range(1, n_layers):
        a = int(rng.integers(0, U - 10))
        b = a + int(rng.integers(8, U // 4))
        intervals.append((a, b))
    # per-layer analytic texture: 0.55 + sum_k a_k sin(2 pi x / lam_k + ph)
    K = 8
    lams = np.exp(rng.uniform(np.log(6.0), np.log(60.0),
                              (n_layers, K))).astype(np.float32)
    amps = rng.uniform(0.3, 1.0, (n_layers, K)).astype(np.float32)
    amps *= 0.42 / np.abs(amps).sum(1, keepdims=True)
    phs = rng.uniform(0, 2 * np.pi, (n_layers, K)).astype(np.float32)
    rowmod = rng.random((V,), dtype=np.float32) * 0.15
    u_idx = np.arange(U)
    # layer-local coordinates for all (layer, s, u) at once
    shifts = (s_hat - np.arange(S))[None, :, None] * \
        disps[:, None, None]                       # [L, S, 1]
    u0 = u_idx[None, None, :] - shifts             # [L, S, U]
    a = np.array([iv[0] for iv in intervals])[:, None, None]
    b = np.array([iv[1] for iv in intervals])[:, None, None]
    covers = (u0 >= a) & (u0 <= b)                 # [L, S, U]
    # nearest layer wins: the highest covering layer index
    owner = np.where(covers.any(0),
                     (n_layers - 1) - np.argmax(covers[::-1], axis=0),
                     0)                            # [S, U]
    src = np.take_along_axis(u0, owner[None], 0)[0]  # [S, U] layer-local x
    val0 = 0.55 + (np.sin(2 * np.pi * src[..., None]
                          / lams[owner] + phs[owner])
                   * amps[owner]).sum(-1).astype(np.float32)
    # broadcast to the full volume on-device (this host's memory
    # bandwidth is too weak to build 200 MB volumes in numpy)
    import jax.numpy as jnp

    vol = (jnp.asarray(val0)[None, :, :, None]
           + jnp.asarray(rowmod)[:, None, None, None])
    gt_s_u = disps[owner].astype(np.float32)  # true disparity per (s, u)
    return vol, gt_s_u


def synthetic_sequence_rgb(S, V, U, seed=0):
    """RGB variant of the layered scene (BENCH_RGB=1): per-layer RGB
    gains decorrelate the channels, and the volume is quantized to
    uint8 so the repo engine and the reference binary (which reads the
    scene back from 8-bit PNGs, scripts/ref_anchor.py) consume
    IDENTICAL radiance data.  Models the reference's costliest headline
    config, RGB MansionLR (report/rs_report.tex:427: 1146x720, d 0:4).
    """
    rng = np.random.default_rng(seed + 101)
    s_hat = S // 2
    n_layers = 6
    disps = np.sort(rng.uniform(0.0, 4.0, n_layers))
    intervals = [(-10 * U, 10 * U)]
    for _ in range(1, n_layers):
        a = int(rng.integers(0, U - 10))
        b = a + int(rng.integers(8, U // 4))
        intervals.append((a, b))
    K = 8
    lams = np.exp(rng.uniform(np.log(6.0), np.log(60.0),
                              (n_layers, K))).astype(np.float32)
    amps = rng.uniform(0.3, 1.0, (n_layers, K)).astype(np.float32)
    amps *= 0.42 / np.abs(amps).sum(1, keepdims=True)
    phs = rng.uniform(0, 2 * np.pi, (n_layers, K)).astype(np.float32)
    gains = rng.uniform(0.55, 1.0, (n_layers, 3)).astype(np.float32)
    rowmod = rng.random((V,), dtype=np.float32) * 0.12
    u_idx = np.arange(U)
    shifts = (s_hat - np.arange(S))[None, :, None] * disps[:, None, None]
    u0 = u_idx[None, None, :] - shifts
    a = np.array([iv[0] for iv in intervals])[:, None, None]
    b = np.array([iv[1] for iv in intervals])[:, None, None]
    covers = (u0 >= a) & (u0 <= b)
    owner = np.where(covers.any(0),
                     (n_layers - 1) - np.argmax(covers[::-1], axis=0),
                     0)                            # [S, U]
    src = np.take_along_axis(u0, owner[None], 0)[0]
    val0 = 0.55 + (np.sin(2 * np.pi * src[..., None]
                          / lams[owner] + phs[owner])
                   * amps[owner]).sum(-1).astype(np.float32)  # [S, U]
    g_su = gains[owner]                            # [S, U, 3]
    import jax.numpy as jnp

    volf = (jnp.asarray(val0)[None, :, :, None]
            * jnp.asarray(g_su)[None]
            + jnp.asarray(rowmod)[:, None, None, None])  # [V, S, U, 3]
    vol_u8 = jnp.clip(jnp.round(volf * 255.0), 0, 255).astype(jnp.uint8)
    gt_s_u = disps[owner].astype(np.float32)
    return vol_u8, gt_s_u


def edge_mask(vol, params):
    """PRE-RUN finest-level edge-confidence mask — identical definition
    to scripts/ref_anchor.py (pure function of the input, so the anchor
    and the gate select the same pixels)."""
    import jax.numpy as jnp

    from remotesensingproject_tpu.ops.edge_confidence import (
        edge_confidence_volume)
    from remotesensingproject_tpu.ops.normalize import normalize_volume

    epis = normalize_volume(jnp.asarray(vol), -1.0)
    ce_vsu, _ = edge_confidence_volume(epis, params)
    ce = np.transpose(np.asarray(ce_vsu), (1, 0, 2))  # [S, V, U]
    return ce > params.edge_score_threshold


def run_once(vol, dmin, dmax, D, use_pallas, verbose, params=None):
    """One full fine-to-coarse pipeline; returns (ftc, fused, seconds)."""
    import contextlib

    from remotesensingproject_tpu.config import DEFAULT_PARAMS
    from remotesensingproject_tpu.models.fine_to_coarse import FineToCoarse

    t0 = time.time()
    with contextlib.redirect_stdout(sys.stderr):
        ftc = FineToCoarse(vol, dmin, dmax, D, use_pallas=use_pallas,
                           params=params or DEFAULT_PARAMS,
                           verbose=verbose,
                           pass_progress=os.environ.get(
                               "BENCH_PROGRESS") == "1")
        # optional resumable run (BENCH_CKPT_DIR=/path): saves each
        # completed pyramid level; crashed runs restart mid-pyramid
        ftc.run(ckpt_dir=os.environ.get("BENCH_CKPT_DIR") or None)
        fused, validity = ftc.get_results()
        fused = np.asarray(fused)  # host sync (block_until_ready is
        # unreliable over the remote-device tunnel)
    return ftc, fused, time.time() - t0


def main():
    import jax

    from remotesensingproject_tpu.config import DEFAULT_PARAMS
    from remotesensingproject_tpu.utils.profiling import (
        enable_compilation_cache)

    if os.environ.get("BENCH_NO_CACHE") == "1":
        cache_dir = None
        print("# compilation cache: DISABLED", file=sys.stderr)
    else:
        cache_dir = enable_compilation_cache()
        print(f"# compilation cache: {cache_dir}", file=sys.stderr)

    small = os.environ.get("BENCH_SMALL") == "1"
    rgb = os.environ.get("BENCH_RGB") == "1"
    hr = os.environ.get("BENCH_HR") == "1"
    d240 = os.environ.get("BENCH_D240") == "1"
    if rgb:
        # MansionLR config (report/rs_report.tex:427: 7409 s on the
        # i3-6100 for 1146x720 RGB, d in [0, 4], 120 candidates)
        S, V, U, D = (24, 128, 256, 32) if small else (100, 720, 1146, 120)
        dmin, dmax = 0.0, 4.0
        metric = "mansionLR_synthetic_rgb_end_to_end_throughput"
        baseline_s = 7409.0 * (S * V * U) / (100 * 720 * 1146)
        anchor_suffix = "rgb"
    elif hr:
        # SkysatHR18 config (rs_report.tex:436: 1714 s for 1080x1920,
        # d in [-2, 8], 120 candidates — the wide-U / wide-d regime)
        S, V, U, D = (24, 256, 512, 32) if small else (100, 1080, 1920,
                                                       120)
        dmin, dmax = -2.0, 8.0
        metric = "skysatHR18_synthetic_end_to_end_throughput"
        baseline_s = 1714.0 * (S * V * U) / (100 * 1080 * 1920)
        anchor_suffix = ""
    elif d240:
        # SkysatLR18 [240] (rs_report.tex:431: 804 s — tests the
        # linear-in-D scaling claim, rs_report.tex:547)
        S, V, U, D = (24, 128, 256, 64) if small else (100, 540, 960,
                                                       240)
        dmin, dmax = -1.0, 4.0
        metric = "skysatLR18_240_synthetic_end_to_end_throughput"
        baseline_s = 804.0 * (S * V * U) / (100 * 540 * 960)
        anchor_suffix = ""
    else:
        S, V, U, D = (24, 128, 256, 32) if small else (100, 540, 960, 120)
        dmin, dmax = -1.0, 4.0
        metric = "skysatLR18_synthetic_end_to_end_throughput"
        baseline_s = 448.0 * (S * V * U) / (100 * 540 * 960)
        anchor_suffix = ""

    t0 = time.time()
    if rgb:
        vol, gt_s_u = synthetic_sequence_rgb(S, V, U)
    else:
        vol, gt_s_u = synthetic_sequence(S, V, U, dmin=dmin, dmax=dmax)
    gen_s = time.time() - t0
    print(f"# generated volume {vol.shape} in {gen_s:.1f}s",
          file=sys.stderr)

    backend = jax.default_backend()
    use_pallas = backend == "tpu"
    print(f"# backend={backend} use_pallas={use_pallas}", file=sys.stderr)

    # BENCH_SCORE=disp|line: the reference's confidence-criterion
    # variants (rs_report.tex:487 gating table; core.hpp:1032-1081) at
    # production shape — evidence rows, gated only on the edge-mode
    # anchor with a wide margin (the reference publishes no quality
    # stats for these modes).
    score_version = os.environ.get("BENCH_SCORE", "edge")
    params = DEFAULT_PARAMS
    if score_version != "edge":
        import dataclasses
        params = dataclasses.replace(
            DEFAULT_PARAMS, score_version=score_version)
        metric += f"_{score_version}"
        if score_version == "disp" and not (rgb or hr or d240):
            # the reference's OWN runtime for C_d gating at thr 0.01
            # (disp_score_threshold's default) is 1462 s on this
            # config, not the ungated 448 s — the gate rejects most
            # propagation sources, so far more pixels are swept; the
            # reference pays the same structural cost
            # (rs_report.tex:487: 3148 / 1878 / 1462 / 448 for thr
            # 0.05 / 0.02 / 0.01 / off).
            baseline_s = 1462.0 * (S * V * U) / (100 * 540 * 960)
    # BENCH_FAST=1: the quality-gated fast mode (mean-shift iteration
    # cap in the Pallas sweep, DepthParams.fast) — same REF_ANCHOR
    # delta gate as the exact path decides whether the trade is within
    # budget on this scene
    if os.environ.get("BENCH_FAST") == "1":
        import dataclasses
        params = dataclasses.replace(params, fast=True)
        metric += "_fast"

    ftc, fused, cold_s = run_once(vol, dmin, dmax, D, use_pallas,
                                  verbose=True, params=params)
    print(f"# cold (compile-inclusive) {cold_s:.1f}s", file=sys.stderr)
    if os.environ.get("BENCH_COLD_ONLY") == "1":
        warm_s = cold_s
    else:
        # release the cold run's pyramid BEFORE building the warm one:
        # `ftc, ... = run_once(...)` would keep the old object (and its
        # ~GBs of per-level state) alive until the call returns — at
        # the HR shape the two pyramids together exhaust HBM
        import gc

        del ftc, fused
        gc.collect()
        ftc, fused, warm_s = run_once(vol, dmin, dmax, D, use_pallas,
                                      verbose=True, params=params)
        print(f"# warm (steady-state)     {warm_s:.1f}s", file=sys.stderr)

    mpix = S * V * U / 1e6
    mpixps = mpix / warm_s
    baseline_mpixps = mpix / baseline_s  # per-config (BASELINE.md rates)
    print(f"# end-to-end warm {warm_s:.1f}s for {mpix:.1f} MPix "
          f"({len(ftc.computers)} pyramid levels)", file=sys.stderr)

    # Quality gate: delta vs the compiled reference's own accuracy on
    # this scene (module docstring; REF_ANCHOR.json from
    # scripts/ref_anchor.py).  Release the pyramid's device state
    # FIRST: only the host-side `fused` is needed from here, and the
    # eager edge-confidence volume below once hit an HBM
    # ResourceExhausted with the full warm pyramid still resident —
    # losing a completed measurement to the post-run check.
    import gc

    del ftc
    gc.collect()
    conf0 = edge_mask(vol, DEFAULT_PARAMS)
    gt = np.broadcast_to(gt_s_u[:, None, :], fused.shape)
    err = np.abs(fused - gt)[conf0]
    rmse = float(np.sqrt(np.mean(err ** 2))) if err.size else float("nan")
    p50 = float(np.percentile(err, 50)) if err.size else float("nan")
    p90 = float(np.percentile(err, 90)) if err.size else float("nan")
    cover = float(conf0.mean())
    print(f"# quality: RMSE {rmse:.4f} px  P50 {p50:.4f}  P90 {p90:.4f} "
          f"on {cover * 100:.1f}% edge-confident px", file=sys.stderr)

    key = f"{S}x{V}x{U}x{D}{anchor_suffix}"
    try:
        with open(REF_ANCHOR_FILE) as f:
            ref = json.load(f)[key]
    except (OSError, KeyError):
        ref = None
    if ref is not None:
        print(f"# reference anchor ({key}): RMSE {ref['rmse_px']} "
              f"P90 {ref['p90_px']} on {ref['coverage'] * 100:.1f}%",
              file=sys.stderr)
        if score_version == "edge":
            quality_ok = (rmse <= ref["rmse_px"] + RMSE_MARGIN_PX
                          and p90 <= ref["p90_px"] + P90_MARGIN_PX)
        else:
            # evidence row: disp/line reject more sources (the C_d/C_l
            # gates), so coverage-conditioned stats drift from the
            # edge-mode anchor; wide sanity margin only
            quality_ok = rmse <= ref["rmse_px"] + 0.5
    else:
        print(f"# WARNING: no reference anchor for {key}; falling back "
              f"to an absolute P50 gate", file=sys.stderr)
        quality_ok = p50 <= 0.5

    # JSON first — a quality failure must not discard the measurement
    # (round-2 advisor #2).
    record = {
        "metric": metric,
        "value": round(mpixps, 4),
        "unit": "MPix/s",
        "vs_baseline": round(mpixps / baseline_mpixps, 2),
        "cold_s": round(cold_s, 1),
        "steadystate_s": round(warm_s, 1),
        "compile_s": round(max(0.0, cold_s - warm_s), 1),
        "quality_rmse_px": round(rmse, 4),
        "quality_p50_px": round(p50, 4),
        "quality_p90_px": round(p90, 4),
        "quality_ref_rmse_px": ref["rmse_px"] if ref else None,
        "quality_ok": bool(quality_ok),
        "cold_ok": bool(cold_s <= baseline_s),
    }
    # cold-run spread across fresh processes for this config, measured
    # by scripts/cold_spread.py (round-4 verdict #7): the server-side
    # deferred first-execution compile has real process-to-process
    # variance; the committed distribution bounds it.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "COLD_SPREAD.json")) as f:
            spread = json.load(f).get(metric)
        if spread:
            record["cold_spread"] = {
                k: spread[k] for k in
                ("min_s", "median_s", "max_s", "max_over_min", "n")}
    except (OSError, KeyError, ValueError):
        pass
    print(json.dumps(record))
    if not quality_ok:
        print("# QUALITY GATE FAILED (see anchor above)", file=sys.stderr)
        sys.exit(1)
    if cold_s > baseline_s and not small:
        # round-3 verdict #1: a user's FIRST run (compile-inclusive)
        # must beat the reference's AOT binary on the same config.
        # (BENCH_SMALL is exempt: the deferred-compile constant terms
        # dominate the toy workload, which the scaled baseline does not
        # model — the gate is about production-shape first contact.)
        print(f"# COLD GATE FAILED: first run {cold_s:.1f}s > "
              f"reference {baseline_s:.1f}s", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
