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
    """Layered moving-strip light field with textured background."""
    rng = np.random.default_rng(seed)
    s_hat = S // 2
    n_layers = 6
    disps = np.sort(rng.uniform(-1.0, 4.0, n_layers))
    intervals = [(-10 * U, 10 * U)]
    for _ in range(1, n_layers):
        a = int(rng.integers(0, U - 10))
        b = a + int(rng.integers(8, U // 4))
        intervals.append((a, b))
    tex = rng.uniform(0.1, 1.0, (n_layers, V, 12 * U)).astype(np.float32)
    for _ in range(2):
        tex = 0.5 * tex + 0.25 * np.roll(tex, 1, 2) + 0.25 * np.roll(
            tex, -1, 2)
    u_idx = np.arange(U)
    vol = np.zeros((V, S, U, 1), np.float32)
    for s in range(S):
        filled = np.zeros(U, bool)
        for li in reversed(range(n_layers)):
            shift = (s_hat - s) * disps[li]
            u0 = u_idx - shift
            a, b = intervals[li]
            cover = (u0 >= a) & (u0 <= b) & ~filled
            if not cover.any():
                continue
            src = np.clip(u0 + 6 * U, 0, tex.shape[2] - 2)
            f = np.floor(src).astype(int)
            t = (src - f).astype(np.float32)[None, :]
            vals = (1 - t) * tex[li][:, f] + t * tex[li][:, f + 1]
            vol[:, s, cover, 0] = vals[:, cover]
            filled |= cover
    return vol


def main():
    import jax

    small = os.environ.get("BENCH_SMALL") == "1"
    if small:
        S, V, U, D = 24, 128, 256, 32
    else:
        S, V, U, D = 100, 540, 960, 120
    dmin, dmax = -1.0, 4.0

    t0 = time.time()
    vol = synthetic_sequence(S, V, U)
    gen_s = time.time() - t0
    print(f"# generated volume {vol.shape} in {gen_s:.1f}s",
          file=sys.stderr)

    from remotesensingproject_tpu.models.fine_to_coarse import FineToCoarse

    backend = jax.default_backend()
    use_pallas = backend == "tpu"
    print(f"# backend={backend} use_pallas={use_pallas}", file=sys.stderr)

    t0 = time.time()
    ftc = FineToCoarse(vol, dmin, dmax, D, use_pallas=use_pallas)
    ftc.run()
    fused, validity = ftc.get_results()
    fused.block_until_ready()
    elapsed = time.time() - t0

    mpix = S * V * U / 1e6
    mpixps = mpix / elapsed
    baseline_mpixps = 51.84 / 448.0  # SkysatLR18 [120] (BASELINE.md)
    print(f"# end-to-end {elapsed:.1f}s for {mpix:.1f} MPix "
          f"({len(ftc.computers)} pyramid levels)", file=sys.stderr)
    print(json.dumps({
        "metric": "skysatLR18_synthetic_end_to_end_throughput",
        "value": round(mpixps, 4),
        "unit": "MPix/s",
        "vs_baseline": round(mpixps / baseline_mpixps, 2),
    }))


if __name__ == "__main__":
    main()
