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


def sharded_ab(S=100, V=64, U=960, D=120):
    """Mesh(1) shard_map of the FULL sharded schedule with the Pallas
    engines on the real chip, bitwise vs the single-device driver.

    The sharded path previously ran only on the CPU virtual mesh
    (XLA engines) and in interpret mode — this validates the
    Mosaic-inside-shard_map lowering on hardware (round-4 verdict #5).
    On one device the ppermute halos degenerate to the edge-shard zero
    halos, so the results must be BITWISE equal to the unsharded run.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import oracle
    from remotesensingproject_tpu.models.depth2d import Depth2DComputer
    from remotesensingproject_tpu.parallel.driver import (
        ShardedDepth2DComputer)
    from remotesensingproject_tpu.parallel.mesh import V_AXIS

    dmin, dmax = -1.0, 2.0
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=1, n_objects=4,
                                      seed=1, dmin=dmin, dmax=dmax)
    mesh = Mesh(np.array(jax.devices()[:1]), (V_AXIS,))
    t0 = time.time()
    sh = ShardedDepth2DComputer(jnp.asarray(vol), dmin, dmax, D,
                                mesh=mesh, use_pallas=True,
                                early_stop=False)
    st_sh = sh.run()
    t_sh = time.time() - t0
    single = Depth2DComputer(jnp.asarray(vol), dmin, dmax, D,
                             use_pallas=True, early_stop=False,
                             v_slabs=1)
    st_si = single.run()
    same_depth = bool(np.array_equal(np.asarray(st_sh.best_depth),
                                     np.asarray(st_si.best_depth)))
    same_claim = bool(np.array_equal(np.asarray(st_sh.claim),
                                     np.asarray(st_si.claim)))
    same_conf = bool(np.array_equal(np.asarray(st_sh.disp_conf),
                                    np.asarray(st_si.disp_conf)))
    return {
        "shape": {"S": S, "V": V, "U": U, "D": D},
        "depth_bitwise": same_depth,
        "claim_bitwise": same_claim,
        "conf_bitwise": same_conf,
        "run_s_sharded": round(t_sh, 1),
        "pass": bool(same_depth and same_claim and same_conf),
    }


def sharded2d_ab(S=100, V=64, U=960, D=120):
    """(1, 1) 2-D mesh with use_pallas on the real chip: the pixel
    kernel runs on the u-haloed block with the u_valid global window —
    must be bitwise vs the unsharded kernel (a single shard's halos
    are the zero edge fills, so the semantics coincide exactly)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import oracle
    from remotesensingproject_tpu.config import DEFAULT_PARAMS
    from remotesensingproject_tpu.models.depth2d import (
        Depth2DComputer, Depth2DState, center_outward_schedule)
    from remotesensingproject_tpu.ops.edge_confidence import (
        edge_confidence_volume)
    from remotesensingproject_tpu.parallel.mesh import U_AXIS, V_AXIS
    from remotesensingproject_tpu.parallel.sharding2d import (
        shard_planes_2d, shard_volume_2d, sharded_schedule_2d)

    dmin, dmax = -1.0, 2.0
    params = DEFAULT_PARAMS
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=1, n_objects=4,
                                      seed=1, dmin=dmin, dmax=dmax)
    epis = jnp.asarray(vol) / jnp.max(jnp.asarray(vol))
    frames = jnp.transpose(epis, (1, 0, 2, 3))
    ce_vsu, mask_vsu = jax.jit(edge_confidence_volume,
                               static_argnums=1)(epis, params)
    ce = jnp.transpose(ce_vsu, (1, 0, 2))
    mask = jnp.transpose(mask_vsu, (1, 0, 2))
    mesh2 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                 (V_AXIS, U_AXIS))

    def sp(x):
        return shard_planes_2d(x, mesh2)

    state = Depth2DState(
        ce=sp(ce), ce_mask=sp(mask),
        disp_conf=sp(jnp.zeros((S, V, U))),
        line_conf=sp(jnp.zeros((S, V, U))),
        best_depth=sp(jnp.zeros((S, V, U))),
        rbar=sp(jnp.zeros((S, V, U, 1))),
        claim=sp(mask.copy()))
    fwd2 = sharded_schedule_2d(mesh2, D, params, (dmin, dmax),
                               u_global=U, use_pallas=True)
    schedule = center_outward_schedule(S)
    t0 = time.time()
    done = 0
    while done < len(schedule):
        part = schedule[done:done + 8]
        done += len(part)
        state, _n, _rem = fwd2(
            shard_volume_2d(epis, mesh2), sp(frames),
            sp(jnp.full((S, V, U), np.float32(dmin))),
            sp(jnp.full((S, V, U), np.float32(dmax))),
            jnp.zeros((1,), jnp.float32), state,
            jnp.asarray(part, jnp.int32))
    t_2d = time.time() - t0
    single = Depth2DComputer(epis, dmin, dmax, D, use_pallas=True,
                             early_stop=False, v_slabs=1,
                             epi_scale_factor=1.0)
    st_si = single.run()
    same_depth = bool(np.array_equal(np.asarray(state.best_depth),
                                     np.asarray(st_si.best_depth)))
    same_claim = bool(np.array_equal(np.asarray(state.claim),
                                     np.asarray(st_si.claim)))
    return {
        "shape": {"S": S, "V": V, "U": U, "D": D},
        "depth_bitwise": same_depth,
        "claim_bitwise": same_claim,
        "run_s_2d": round(t_2d, 1),
        "pass": bool(same_depth and same_claim),
    }


def line_kernel_ab(S=100, V=128, U=960, D=120):
    """with_k_best (line mode) on the pixel kernel vs the dense-row
    kernel on chip: k_best planes and depths at active pixels."""
    import jax
    import jax.numpy as jnp

    import oracle
    from remotesensingproject_tpu.config import DEFAULT_PARAMS
    from remotesensingproject_tpu.ops.sweep_pallas import (
        prepare_padded_epis, sweep_pile_pallas)
    from remotesensingproject_tpu.ops.sweep_pallas_pixel import (
        sweep_pile_pallas_pixel)

    dmin, dmax = -1.0, 2.0
    params = DEFAULT_PARAMS
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=1, n_objects=4,
                                      seed=2, dmin=dmin, dmax=dmax)
    epis = jnp.asarray(vol) / jnp.max(jnp.asarray(vol))
    s_hat = S // 2
    padded = prepare_padded_epis(epis, dmin, dmax, params.slope_factor)
    pf, sp = int(padded[1]), int(padded[2])
    active = jnp.ones((V, U), bool)
    px = jax.jit(lambda e, a, ep: sweep_pile_pallas_pixel(
        e, dmin, dmax, D, s_hat, params, active_v_u=a,
        padded=(ep, pf, sp), with_k_best=True))(epis, active, padded[0])
    n_tiles = -(-U // 128)
    flags = jnp.ones((V, n_tiles), bool)
    dn = jax.jit(lambda e, fl, ep: sweep_pile_pallas(
        e, dmin, dmax, D, s_hat, params, with_k_best=True,
        padded=(ep, pf, sp), row_active=fl))(epis, flags, padded[0])
    kp = np.asarray(px.k_best)
    kd = np.asarray(dn.k_best)
    dp = np.asarray(px.best_depth)
    dd = np.asarray(dn.best_depth)
    agree = float((dp == dd).mean())
    # where the argmax picks agree, the K columns must agree closely.
    # The two engines' mean shifts converge from ulp-different samples
    # to ulp-different fixpoints; K = 1 - a * (r - rbar)^2 amplifies an
    # rbar delta by 2*a*|r - rbar| (a = 75 at the defaults), so ~1e-5
    # of rbar drift shows up as ~1e-3 of K — harmless for C_l, which
    # is a K-weighted average of C_e values (measured on chip: 2e-3)
    same = (dp == dd)[:, None, :]
    kdiff = float(np.abs(kp - kd)[np.broadcast_to(same, kp.shape)].max())
    return {
        "shape": {"S": S, "V": V, "U": U, "D": D},
        "depth_agree": agree,
        "k_best_maxdiff_at_agreeing_px": kdiff,
        "pass": bool(agree > 0.99 and kdiff <= 5e-3),
    }


def fast_ab(S=100, V=256, U=960, D=120):
    """DepthParams.fast (mean-shift iteration cap) vs exact on chip:
    speed ratio + depth agreement at the one-pass level."""
    import jax
    import jax.numpy as jnp
    import dataclasses

    import oracle
    from remotesensingproject_tpu.config import DEFAULT_PARAMS
    from remotesensingproject_tpu.ops.sweep_pallas import (
        prepare_padded_epis)
    from remotesensingproject_tpu.ops.sweep_pallas_pixel import (
        sweep_pile_pallas_pixel)

    dmin, dmax = -1.0, 2.0
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=1, n_objects=4,
                                      seed=3, dmin=dmin, dmax=dmax)
    epis = jnp.asarray(vol) / jnp.max(jnp.asarray(vol))
    s_hat = S // 2
    padded = prepare_padded_epis(epis, dmin, dmax, 1.0)
    pf, sp = int(padded[1]), int(padded[2])
    active = jnp.ones((V, U), bool)
    out = {}
    for fast in (False, True):
        params = dataclasses.replace(DEFAULT_PARAMS, fast=fast)
        fn = jax.jit(lambda e, a, ep, p=params: sweep_pile_pallas_pixel(
            e, dmin, dmax, D, s_hat, p, active_v_u=a,
            padded=(ep, pf, sp)))
        r = fn(epis, active, padded[0])
        np.asarray(r.best_depth)  # compile + sync
        t0 = time.time()
        r = fn(epis, active, padded[0])
        d = np.asarray(r.best_depth)
        out[fast] = (time.time() - t0, d)
    dd = np.abs(out[True][1] - out[False][1])
    return {
        "shape": {"S": S, "V": V, "U": U, "D": D},
        "speedup": round(out[False][0] / out[True][0], 3),
        "depth_exact_match": float((dd == 0).mean()),
        "depth_rmse_px": float(np.sqrt((dd ** 2).mean())),
        "pass": bool((dd == 0).mean() > 0.95),
    }


def main():
    import jax

    import prop_kernel_check
    from remotesensingproject_tpu.utils.profiling import (
        enable_compilation_cache)

    enable_compilation_cache()
    summary = {"backend": jax.default_backend()}

    print("1/9 sweep kernel one-pass A/B at production shape", flush=True)
    summary["sweep_production"] = sweep_one_pass_ab()
    print(json.dumps(summary["sweep_production"]), flush=True)

    print("2/9 propagation kernel bitwise A/B", flush=True)
    prop_ok = (prop_kernel_check.check(S=100, V=540, U=960, seed=0)
               and prop_kernel_check.check(seed=1, slope=0.5))
    summary["prop_bitwise_ab"] = bool(prop_ok)

    print("3/9 selective-median kernel bitwise A/B", flush=True)
    summary["median_bitwise_ab"] = median_ab()
    print(f"  median A/B: {summary['median_bitwise_ab']}", flush=True)

    print("4/9 v-slab pipeline bitwise A/B", flush=True)
    summary["slab_bitwise_ab"] = slab_ab()
    print(f"  slab A/B: {summary['slab_bitwise_ab']}", flush=True)

    print("5/9 mesh(1) shard_map pipeline bitwise A/B", flush=True)
    summary["sharded_ab"] = sharded_ab()
    print(json.dumps(summary["sharded_ab"]), flush=True)

    print("6/9 (1,1) 2-D mesh Pallas-route bitwise A/B", flush=True)
    summary["sharded2d_ab"] = sharded2d_ab()
    print(json.dumps(summary["sharded2d_ab"]), flush=True)

    print("7/9 line-mode k_best kernel A/B", flush=True)
    summary["line_kernel_ab"] = line_kernel_ab()
    print(json.dumps(summary["line_kernel_ab"]), flush=True)

    print("8/9 fast-mode A/B", flush=True)
    summary["fast_ab"] = fast_ab()
    print(json.dumps(summary["fast_ab"]), flush=True)

    print("9/9 full-pipeline A/B at V=64", flush=True)
    summary["pipeline_v64"] = pipeline_ab()
    print(json.dumps(summary["pipeline_v64"]), flush=True)

    summary["pass"] = bool(summary["sweep_production"]["pass"]
                           and prop_ok
                           and summary["median_bitwise_ab"]
                           and summary["slab_bitwise_ab"]
                           and summary["sharded_ab"]["pass"]
                           and summary["sharded2d_ab"]["pass"]
                           and summary["line_kernel_ab"]["pass"]
                           and summary["fast_ab"]["pass"]
                           and summary["pipeline_v64"]["pass"])
    with open("ACCEPTANCE_TPU.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"ACCEPTANCE: {'PASS' if summary['pass'] else 'FAIL'}")
    sys.exit(0 if summary["pass"] else 1)


if __name__ == "__main__":
    main()
