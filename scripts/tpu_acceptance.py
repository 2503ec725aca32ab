"""Acceptance check on real TPU hardware: Pallas vs XLA parity.

The golden tests prove (on CPU) that the XLA path is bit-identical to
the compiled reference binary; this script proves the MOSAIC-compiled
kernels agree with that XLA path ON CHIP, at production shapes — the
regime where hardware lowering has historically diverged from the
interpret-mode tests (round-1 crash; round-3's negative
tpu.dynamic_rotate divergence was caught exactly this way).

Structure (compositional — a full-pipeline XLA oracle at production V
is infeasible on chip: the dense jnp sweep costs ~0.3 s/row/pass, so
one 540-row pass alone exceeds the runtime's execution watchdog):

1. pixel-compacted sweep kernel vs the dense jnp sweep, ONE pass at the
   full production shape (100, 540, 960, 120); the jnp oracle runs
   host-paced in 32-row slices to stay under the watchdog;
2. propagation line-paint kernel vs the XLA propagate, bitwise, at the
   production plane shape;
3. full Depth2DComputer pipeline, Pallas vs XLA, all 99 passes, at
   production S/U/D with V=64 (the largest XLA-feasible height;
   pass_chunk=1 keeps each dense dispatch under the watchdog).

Usage:  python scripts/tpu_acceptance.py
Writes ACCEPTANCE_TPU.json.
"""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
sys.path.insert(0, "scripts")

import numpy as np


def sweep_one_pass_ab(S=100, V=540, U=960, D=120, slice_rows=32):
    import jax
    import jax.numpy as jnp

    import oracle
    from remotesensingproject_tpu.config import DEFAULT_PARAMS
    from remotesensingproject_tpu.ops.sweep import sweep_pile
    from remotesensingproject_tpu.ops.sweep_pallas import (
        prepare_padded_epis)
    from remotesensingproject_tpu.ops.sweep_pallas_pixel import (
        sweep_pile_pallas_pixel)

    dmin, dmax = -1.0, 2.0
    params = DEFAULT_PARAMS
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=1, n_objects=4,
                                      seed=1, dmin=dmin, dmax=dmax)
    epis = jnp.asarray(vol) / jnp.max(jnp.asarray(vol))
    s_hat = S // 2
    active = jnp.ones((V, U), bool)

    padded = prepare_padded_epis(epis, dmin, dmax, params.slope_factor)
    pad_f, s_pad = int(padded[1]), int(padded[2])
    t0 = time.time()
    # NB the padded volume must be a jit ARGUMENT — a captured device
    # array is baked into the compile payload (HTTP 413 over axon)
    pal = jax.jit(lambda e, a, ep: sweep_pile_pallas_pixel(
        e, dmin, dmax, D, s_hat, params, active_v_u=a,
        padded=(ep, pad_f, s_pad)))(epis, active, padded[0])
    pal_d = np.asarray(pal.best_depth)
    pal_s = np.asarray(pal.best_score)
    t_pal = time.time() - t0

    # jnp oracle, host-paced v-slices (each its own dispatch)
    lo = jnp.full((slice_rows, U), np.float32(dmin))
    hi = jnp.full((slice_rows, U), np.float32(dmax))
    fn = jax.jit(lambda e, lo_, hi_: sweep_pile(
        e, lo_, hi_, D, jnp.int32(s_hat), params))
    ref_d = np.zeros((V, U), np.float32)
    ref_s = np.zeros((V, U), np.float32)
    t0 = time.time()
    for v0 in range(0, V, slice_rows):
        rows = min(slice_rows, V - v0)
        sl = epis[v0:v0 + rows]
        if rows < slice_rows:  # pad tail slice to the jitted shape
            sl = jnp.pad(sl, ((0, slice_rows - rows), (0, 0), (0, 0),
                              (0, 0)), mode="edge")
        out = fn(sl, lo, hi)
        ref_d[v0:v0 + rows] = np.asarray(out.best_depth)[:rows]
        ref_s[v0:v0 + rows] = np.asarray(out.best_score)[:rows]
        print(f"  oracle rows {v0 + rows}/{V}", flush=True)
    t_ref = time.time() - t0

    exact = float((pal_d == ref_d).mean())
    diff = np.abs(pal_d - ref_d)
    rmse = float(np.sqrt((diff ** 2).mean()))
    return {
        "shape": {"S": S, "V": V, "U": U, "D": D},
        "depth_exact_match": exact,
        "depth_maxdiff_px": float(diff.max()),
        "depth_rmse_px": rmse,
        "score_maxdiff": float(np.abs(pal_s - ref_s).max()),
        "kernel_s": round(t_pal, 2),
        "oracle_s": round(t_ref, 2),
        "pass": bool(rmse <= 0.5),
    }


def pipeline_ab(S=100, V=64, U=960, D=120):
    import jax.numpy as jnp

    import oracle
    from remotesensingproject_tpu.models.depth2d import Depth2DComputer

    dmin, dmax = -1.0, 2.0
    vol, gt = oracle.make_synthetic_lf(S=S, V=V, U=U, C=1, n_objects=4,
                                       seed=1, dmin=dmin, dmax=dmax)
    results = {}
    times = {}
    for use_pallas in (True, False):
        # dense XLA passes cost ~0.3 s/row: one pass per dispatch keeps
        # each launch under the TPU runtime's execution watchdog
        c = Depth2DComputer(jnp.asarray(vol), dmin, dmax, D,
                            use_pallas=use_pallas, early_stop=False,
                            pass_chunk=8 if use_pallas else 1)
        print(f"  pipeline use_pallas={use_pallas} ...", flush=True)
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
    s_hat = S // 2
    gt_rmse_p = float(np.sqrt(np.mean(
        (d_p[s_hat] - gt)[m_p[s_hat]] ** 2)))
    return {
        "shape": {"S": S, "V": V, "U": U, "D": D},
        "mask_agreement": float((m_p == m_j).mean()),
        "claim_agreement": float((cl_p == cl_j).mean()),
        "depth_rmse_px": rmse,
        "depth_maxdiff_px": float(np.abs(diff).max()) if diff.size else 0.0,
        "frac_gt_1e3": float((np.abs(d_p - d_j) > 1e-3)[both].mean()),
        "gt_rmse_at_s_hat": gt_rmse_p,
        "run_s_pallas": round(times[True], 1),
        "run_s_xla": round(times[False], 1),
        "pass": bool(rmse <= 0.5),
    }


def median_ab(V=540, U=960, C=1):
    """On-chip bitwise A/B: Pallas selective median vs the XLA path."""
    import jax
    import jax.numpy as jnp

    from remotesensingproject_tpu.ops.median import selective_median
    from remotesensingproject_tpu.ops.median_pallas import (
        selective_median_pallas)

    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.random((V, U), np.float32) * 5 - 1)
    frame = jnp.asarray(rng.random((V, U, C), np.float32))
    mask = jnp.asarray(rng.random((V, U)) < 0.7)
    fk = jax.jit(lambda s, f, m: selective_median_pallas(s, f, m, 5, 0.1))
    fx = jax.jit(lambda s, f, m: selective_median(s, f, m, 5, 0.1))
    a = np.asarray(fk(src, frame, mask))
    b = np.asarray(fx(src, frame, mask))
    return bool(np.array_equal(a, b))


def slab_ab(S=24, V=64, U=960, D=32):
    """On-chip bitwise A/B: v-slabbed pipeline vs unslabbed (the slab
    scan is the production level-0 route; interpret-mode parity alone
    cannot see hardware-only divergences — the r3 dynamic_rotate
    lesson)."""
    import jax.numpy as jnp

    import oracle
    from remotesensingproject_tpu.models.depth2d import Depth2DComputer

    dmin, dmax = -1.0, 2.0
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=1, n_objects=4,
                                      seed=5, dmin=dmin, dmax=dmax)
    res = {}
    for n in (1, 4):
        c = Depth2DComputer(jnp.asarray(vol), dmin, dmax, D,
                            use_pallas=True, early_stop=False,
                            v_slabs=n)
        st = c.run()
        res[n] = (np.asarray(st.best_depth), np.asarray(st.claim),
                  np.asarray(st.disp_conf))
    same = all(np.array_equal(res[1][i], res[4][i]) for i in range(3))
    return bool(same)


def main():
    import jax

    import prop_kernel_check
    from remotesensingproject_tpu.utils.profiling import (
        enable_compilation_cache)

    enable_compilation_cache()
    summary = {"backend": jax.default_backend()}

    print("1/5 sweep kernel one-pass A/B at production shape", flush=True)
    summary["sweep_production"] = sweep_one_pass_ab()
    print(json.dumps(summary["sweep_production"]), flush=True)

    print("2/5 propagation kernel bitwise A/B", flush=True)
    prop_ok = (prop_kernel_check.check(S=100, V=540, U=960, seed=0)
               and prop_kernel_check.check(seed=1, slope=0.5))
    summary["prop_bitwise_ab"] = bool(prop_ok)

    print("3/5 selective-median kernel bitwise A/B", flush=True)
    summary["median_bitwise_ab"] = median_ab()
    print(f"  median A/B: {summary['median_bitwise_ab']}", flush=True)

    print("4/5 v-slab pipeline bitwise A/B", flush=True)
    summary["slab_bitwise_ab"] = slab_ab()
    print(f"  slab A/B: {summary['slab_bitwise_ab']}", flush=True)

    print("5/5 full-pipeline A/B at V=64", flush=True)
    summary["pipeline_v64"] = pipeline_ab()
    print(json.dumps(summary["pipeline_v64"]), flush=True)

    summary["pass"] = bool(summary["sweep_production"]["pass"]
                           and prop_ok
                           and summary["median_bitwise_ab"]
                           and summary["slab_bitwise_ab"]
                           and summary["pipeline_v64"]["pass"])
    with open("ACCEPTANCE_TPU.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"ACCEPTANCE: {'PASS' if summary['pass'] else 'FAIL'}")
    sys.exit(0 if summary["pass"] else 1)


if __name__ == "__main__":
    main()
