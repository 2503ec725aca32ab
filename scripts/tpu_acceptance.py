"""Acceptance check on real TPU hardware: Pallas vs XLA pipeline parity.

Runs the full 2-D propagation pipeline twice on a synthetic light field —
once with the Pallas kernels (use_pallas=True) and once with the exact
XLA path — and reports the disparity RMSE between them (budget: 0.5 px,
BASELINE.json), plus agreement statistics.

Usage:  python scripts/tpu_acceptance.py [S V U D]

Defaults to the PRODUCTION SkysatLR18 shape (100 540 960 120) — the
regime where Mosaic-compiled behavior historically diverged from the
interpret-mode tests (round-1 crash).  Pass smaller dims for a quick
smoke run.  A JSON summary is written to ACCEPTANCE_TPU.json.
"""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import oracle
    from remotesensingproject_tpu.models.depth2d import Depth2DComputer
    from remotesensingproject_tpu.utils.profiling import (
        enable_compilation_cache)

    enable_compilation_cache()
    args = [int(a) for a in sys.argv[1:]] or [100, 540, 960, 120]
    S, V, U, D = args
    dmin, dmax = -1.0, 2.0
    vol, gt = oracle.make_synthetic_lf(S=S, V=V, U=U, C=1, n_objects=4,
                                       seed=1, dmin=dmin, dmax=dmax)

    results = {}
    times = {}
    for use_pallas in (True, False):
        c = Depth2DComputer(jnp.asarray(vol), dmin, dmax, D,
                            use_pallas=use_pallas, early_stop=False)
        t0 = time.time()
        st = c.run()
        times[use_pallas] = time.time() - t0
        results[use_pallas] = (
            np.asarray(st.best_depth),
            np.asarray(c.get_valid_depths_mask_s_v_u()),
            np.asarray(st.claim),
        )

    d_p, m_p, cl_p = results[True]
    d_j, m_j, cl_j = results[False]
    both = m_p & m_j
    diff = (d_p - d_j)[both]
    rmse = float(np.sqrt(np.mean(diff ** 2))) if diff.size else 0.0
    print(f"valid-mask agreement: {(m_p == m_j).mean() * 100:.3f}%")
    print(f"claim agreement:      {(cl_p == cl_j).mean() * 100:.3f}%")
    print(f"depth RMSE (valid):   {rmse:.5f} px")
    print(f"depth max|diff|:      {np.abs(diff).max() if diff.size else 0:.5f}")
    print(f"pixels differing >1e-3: "
          f"{(np.abs(d_p - d_j) > 1e-3)[both].mean() * 100:.4f}%")
    s_hat = S // 2
    gt_rmse_p = np.sqrt(np.mean(
        (d_p[s_hat] - gt)[m_p[s_hat]] ** 2))
    print(f"vs ground truth at s_hat (pallas): {gt_rmse_p:.4f} px")
    summary = {
        "shape": {"S": S, "V": V, "U": U, "D": D},
        "backend": jax.default_backend(),
        "mask_agreement": float((m_p == m_j).mean()),
        "claim_agreement": float((cl_p == cl_j).mean()),
        "depth_rmse_px": rmse,
        "depth_maxdiff_px": float(np.abs(diff).max()) if diff.size else 0.0,
        "frac_gt_1e3": float((np.abs(d_p - d_j) > 1e-3)[both].mean()),
        "gt_rmse_at_s_hat": float(gt_rmse_p),
        "run_s_pallas": round(times[True], 1),
        "run_s_xla": round(times[False], 1),
        "pass": bool(rmse <= 0.5),
    }
    with open("ACCEPTANCE_TPU.json", "w") as f:
        json.dump(summary, f, indent=1)
    assert rmse <= 0.5, "RMSE budget exceeded"
    print("ACCEPTANCE: PASS (<= 0.5 px)")


if __name__ == "__main__":
    main()
