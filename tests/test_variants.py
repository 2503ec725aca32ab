"""Oracle parity for the reference's optional variants (VERDICT r1 #6):

* score_version="disp" (_USE_DISP_CONFIDENCE_SCORE, core.hpp:35-37);
* score_version="line" (_USE_LINE_CONFIDENCE_SCORE, core.hpp:1032-1081);
* interpolation="nearest" (rslf_interpolation.hpp:81-131);
* the morphological opening of the edge mask vs cv2 (core.hpp:759-769).

Note on "line": the reference's propagation gate never actually compiles
to the line branch (the `#elseif` typo at core.hpp:1099 is not a
preprocessor directive, so the `#else` edge branch wins), and its K
buffer holds stale values at unswept pixels.  The engine implements the
INTENDED semantics — C_l = sum_s C_e K / sum_s K along the winning line,
refreshed at successfully swept pixels, painted by propagation — and the
oracle here mirrors that specification.
"""

import numpy as np
import pytest

import oracle

import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.models.depth2d import (
    Depth2DComputer, center_outward_schedule)


def depth2d_oracle_v(vol_v_s_u_c, dmin, dmax, dim_d, params: DepthParams):
    """Sequential oracle with score_version + interpolation support."""
    vol = np.asarray(vol_v_s_u_c, np.float32)
    epis = vol / vol.max()
    V, S, U, C = epis.shape
    frames = np.transpose(epis, (1, 0, 2, 3))

    ce = np.zeros((S, V, U), np.float32)
    mask = np.zeros((S, V, U), bool)
    for s in range(S):
        for v in range(V):
            ce[s, v], mask[s, v] = oracle.edge_confidence_row(
                epis[v, s], params.edge_confidence_filter_size,
                params.shadow_level, params.cut_shadows,
                params.edge_score_threshold)
    claim = mask.copy()
    best_depth = np.zeros((S, V, U), np.float32)
    disp_conf = np.zeros((S, V, U), np.float32)
    line_conf = np.zeros((S, V, U), np.float32)
    rbar = np.zeros((S, V, U, C), np.float32)

    for s_hat in center_outward_schedule(S):
        claim[s_hat] &= mask[s_hat]
        active = claim[s_hat].copy()
        k_best = np.zeros((V, S, U), np.float32)
        good = np.zeros((V, U), bool)
        for v in range(V):
            for u in range(U):
                if not active[v, u]:
                    continue
                scores, best, depth, rb, k, _ = oracle.sweep_pixel(
                    epis[v], u, dmin, dmax, dim_d, s_hat,
                    h=params.kernel_h,
                    slope_factor=params.slope_factor,
                    n_iter=params.mean_shift_max_iter,
                    interpolation=params.interpolation)
                if scores[best] > params.raw_score_threshold:
                    best_depth[s_hat, v, u] = depth
                    disp_conf[s_hat, v, u] = ce[s_hat, v, u] * abs(
                        scores[best] - scores.mean())
                    rbar[s_hat, v, u] = rb
                    k_best[v, :, u] = k[:, best]
                    good[v, u] = True
                else:
                    ce[s_hat, v, u] = 0.0
                    mask[s_hat, v, u] = False
        filtered = oracle.selective_median(
            best_depth[s_hat], frames[s_hat], mask[s_hat],
            params.median_filter_size, params.median_filter_epsilon)

        if params.score_version == "line":
            # C_l = sum_s C_e(interp along the line) K / sum_s K,
            # refreshed at successfully swept pixels.  The index matrix
            # omits par_slope_factor (core.hpp:1058, replicated).
            for v in range(V):
                for u in range(U):
                    if not good[v, u]:
                        continue
                    num = den = 0.0
                    for s in range(S):
                        idx = (s_hat - s) * filtered[v, u] + u
                        cei, ok = oracle.interp_linear(
                            ce[s, v][:, None], idx)
                        cei = max(float(cei[0]), 0.0) if ok else 0.0
                        num += cei * k_best[v, s, u]
                        den += k_best[v, s, u]
                    line_conf[s_hat, v, u] = num / den

        if params.score_version == "disp":
            src = disp_conf[s_hat] > params.disp_score_threshold
        elif params.score_version == "line":
            src = line_conf[s_hat] > params.line_score_threshold
        else:
            src = mask[s_hat]

        extra = ()
        if params.score_version == "line":
            extra = ((line_conf, line_conf[s_hat].copy()),)
        oracle.propagate(best_depth, disp_conf, claim, frames, filtered,
                         rbar[s_hat], disp_conf[s_hat].copy(), src,
                         s_hat, params.slope_factor,
                         params.propagation_epsilon, extra)
    return dict(ce=ce, mask=mask, claim=claim, best_depth=best_depth,
                disp_conf=disp_conf, line_conf=line_conf, rbar=rbar)


def _run_engine(vol, dmin, dmax, dim_d, params):
    computer = Depth2DComputer(jnp.asarray(vol), dmin, dmax, dim_d,
                               params=params, use_pallas=False,
                               early_stop=False)
    return computer, computer.run()


def _assert_state(state, want, with_line=False):
    np.testing.assert_allclose(np.asarray(state.ce), want["ce"],
                               atol=3e-5)
    assert (np.asarray(state.ce_mask) == want["mask"]).all()
    assert (np.asarray(state.claim) == want["claim"]).all()
    np.testing.assert_allclose(np.asarray(state.best_depth),
                               want["best_depth"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(state.disp_conf),
                               want["disp_conf"], atol=3e-5)
    if with_line:
        np.testing.assert_allclose(np.asarray(state.line_conf),
                                   want["line_conf"], atol=3e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_disp_score_version(seed):
    vol, _ = oracle.make_synthetic_lf(S=6, V=4, U=20, C=1, n_objects=3,
                                      seed=seed, dmin=-1.0, dmax=1.5)
    params = DepthParams(score_version="disp")
    want = depth2d_oracle_v(vol, -1.0, 1.5, 7, params)
    computer, state = _run_engine(vol, -1.0, 1.5, 7, params)
    _assert_state(state, want)
    # validity getter thresholds C_d (rslf_depth_computation.hpp:899-901)
    got_valid = np.asarray(computer.get_valid_depths_mask_s_v_u())
    assert (got_valid
            == (want["disp_conf"] > params.disp_score_threshold)).all()


@pytest.mark.parametrize("seed", [0, 1])
def test_line_score_version(seed):
    vol, _ = oracle.make_synthetic_lf(S=6, V=4, U=20, C=1, n_objects=3,
                                      seed=seed, dmin=-1.0, dmax=1.5)
    params = DepthParams(score_version="line")
    want = depth2d_oracle_v(vol, -1.0, 1.5, 7, params)
    computer, state = _run_engine(vol, -1.0, 1.5, 7, params)
    _assert_state(state, want, with_line=True)
    got_valid = np.asarray(computer.get_valid_depths_mask_s_v_u())
    assert (got_valid
            == (want["line_conf"] > params.line_score_threshold)).all()


def test_disp_differs_from_edge():
    """The gate change must actually alter propagation coverage
    (otherwise the disp test is vacuous)."""
    vol, _ = oracle.make_synthetic_lf(S=6, V=4, U=24, C=1, n_objects=3,
                                      seed=4, dmin=-1.0, dmax=1.5)
    edge = depth2d_oracle_v(vol, -1.0, 1.5, 7, DepthParams())
    disp = depth2d_oracle_v(vol, -1.0, 1.5, 7,
                            DepthParams(score_version="disp",
                                        disp_score_threshold=0.5))
    assert (edge["claim"] != disp["claim"]).any()


@pytest.mark.parametrize("seed", [0, 1])
def test_nearest_interpolation(seed):
    vol, _ = oracle.make_synthetic_lf(S=6, V=4, U=20, C=1, n_objects=3,
                                      seed=seed, dmin=-1.0, dmax=1.5)
    params = DepthParams(interpolation="nearest")
    want = depth2d_oracle_v(vol, -1.0, 1.5, 7, params)
    _, state = _run_engine(vol, -1.0, 1.5, 7, params)
    _assert_state(state, want)


def test_nearest_differs_from_linear():
    vol, _ = oracle.make_synthetic_lf(S=6, V=4, U=20, C=1, n_objects=3,
                                      seed=0, dmin=-1.0, dmax=1.5)
    lin = depth2d_oracle_v(vol, -1.0, 1.5, 7, DepthParams())
    nn = depth2d_oracle_v(vol, -1.0, 1.5, 7,
                          DepthParams(interpolation="nearest"))
    assert (lin["best_depth"] != nn["best_depth"]).any()


def test_ellipse_element_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    from remotesensingproject_tpu.ops.edge_confidence import (
        _ellipse_element)
    for n in range(2, 16):
        ours = np.asarray(_ellipse_element(n)).astype(np.uint8)
        ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (n, n))
        assert (ours == ref).all(), f"ellipse element mismatch at n={n}"


@pytest.mark.parametrize("n", [3, 5, 4])
def test_morph_opening_matches_cv2(n, rng):
    cv2 = pytest.importorskip("cv2")
    from remotesensingproject_tpu.ops.edge_confidence import (
        _morph_open_vu)
    V, S, U = 17, 2, 23
    mask = rng.random((V, S, U)) < 0.55
    got = np.asarray(_morph_open_vu(jnp.asarray(mask), n))
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (n, n))
    for s in range(S):
        ref = cv2.morphologyEx(
            mask[:, s].astype(np.uint8), cv2.MORPH_OPEN, se)
        assert (got[:, s] == (ref > 0)).all(), f"opening mismatch n={n}"


def test_edge_confidence_opening_in_pipeline(rng):
    """The opening hook is wired through edge_confidence_volume
    (core.hpp:759-769: applied per (v,u) plane per s when size > 1)."""
    cv2 = pytest.importorskip("cv2")
    from remotesensingproject_tpu.ops.edge_confidence import (
        edge_confidence_volume)
    vol, _ = oracle.make_synthetic_lf(S=3, V=12, U=30, C=1, n_objects=3,
                                      seed=5)
    epis = jnp.asarray(vol / vol.max())
    p0 = DepthParams()
    p3 = DepthParams(edge_confidence_opening_size=3)
    ce0, m0 = edge_confidence_volume(epis, p0)
    ce3, m3 = edge_confidence_volume(epis, p3)
    np.testing.assert_allclose(np.asarray(ce0), np.asarray(ce3))
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    m0 = np.asarray(m0)  # [V, S, U]
    for s in range(m0.shape[1]):
        ref = cv2.morphologyEx(m0[:, s].astype(np.uint8),
                               cv2.MORPH_OPEN, se)
        assert (np.asarray(m3)[:, s] == (ref > 0)).all()


def test_dim_d_over_128_pixel_multi_lane_block_route():
    """dim_d in (128, 1024] rides the PIXEL kernel with kb > 1 candidate
    lane blocks per pixel (the reference's [240] rows); the driver's
    route must still match the XLA oracle path."""
    import numpy as np
    import jax.numpy as jnp

    import oracle
    from remotesensingproject_tpu.models.depth2d import Depth2DComputer

    vol, _ = oracle.make_synthetic_lf(S=5, V=6, U=48, C=1, n_objects=3,
                                      seed=3, dmin=-1.0, dmax=1.5)
    a = Depth2DComputer(jnp.asarray(vol), -1.0, 1.5, 130,
                        use_pallas=True, early_stop=False).run()
    b = Depth2DComputer(jnp.asarray(vol), -1.0, 1.5, 130,
                        use_pallas=False, early_stop=False).run()
    assert (np.asarray(a.claim) == np.asarray(b.claim)).all()
    assert np.allclose(np.asarray(a.best_depth),
                       np.asarray(b.best_depth), atol=1e-6)


def test_dim_d_over_1024_routes_to_dense_kernel():
    """dim_d > 1024 exceeds the pixel kernel's kb <= BATCH packing; the
    driver must fall back to the dense-row kernel and still match the
    XLA oracle path."""
    import numpy as np
    import jax.numpy as jnp

    import oracle
    from remotesensingproject_tpu.models.depth2d import Depth2DComputer

    vol, _ = oracle.make_synthetic_lf(S=3, V=4, U=32, C=1, n_objects=2,
                                      seed=4, dmin=-0.5, dmax=1.0)
    a = Depth2DComputer(jnp.asarray(vol), -0.5, 1.0, 1030,
                        use_pallas=True, early_stop=False).run()
    b = Depth2DComputer(jnp.asarray(vol), -0.5, 1.0, 1030,
                        use_pallas=False, early_stop=False).run()
    assert (np.asarray(a.claim) == np.asarray(b.claim)).all()
    # at D=1030 the grid step (~0.0015) sits inside the dense kernel's
    # last-ulp score jitter vs the jnp oracle, flipping a few EXACT-TIE
    # argmax picks to the neighboring candidate — bound flip rate and
    # step size (the same tolerance the per-pixel kernel tests use)
    ad, bd = np.asarray(a.best_depth), np.asarray(b.best_depth)
    step = 1.5 / 1029
    assert (ad != bd).mean() <= 0.02, (ad != bd).mean()
    assert (np.abs(ad - bd) <= step * 1.001).all()


def test_line_mode_pixel_kernel_matches_xla():
    """score_version="line" now rides the pixel-compacted kernel
    (with_k_best export, round-4 verdict #3): the full Pallas pipeline
    must match the XLA path, including the line-confidence planes."""
    import jax.numpy as jnp

    from remotesensingproject_tpu.models.depth2d import Depth2DComputer

    vol, _ = oracle.make_synthetic_lf(S=6, V=8, U=48, C=1, n_objects=3,
                                      seed=2, dmin=-1.0, dmax=1.5)
    params = DepthParams(score_version="line")
    a = Depth2DComputer(jnp.asarray(vol), -1.0, 1.5, 7, params=params,
                        use_pallas=True, early_stop=False).run()
    b = Depth2DComputer(jnp.asarray(vol), -1.0, 1.5, 7, params=params,
                        use_pallas=False, early_stop=False).run()
    assert (np.asarray(a.claim) == np.asarray(b.claim)).all()
    np.testing.assert_allclose(np.asarray(a.line_conf),
                               np.asarray(b.line_conf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.best_depth),
                               np.asarray(b.best_depth), atol=1e-6)


def test_line_mode_pixel_kernel_matches_xla_slabbed():
    """line mode through the v-slab scan (the production level-0 route)
    must carry k_best through the slab machinery identically."""
    import jax.numpy as jnp

    from remotesensingproject_tpu.models.depth2d import Depth2DComputer

    vol, _ = oracle.make_synthetic_lf(S=6, V=32, U=48, C=1, n_objects=3,
                                      seed=6, dmin=-1.0, dmax=1.5)
    params = DepthParams(score_version="line")
    a = Depth2DComputer(jnp.asarray(vol), -1.0, 1.5, 7, params=params,
                        use_pallas=True, early_stop=False,
                        v_slabs=2).run()
    b = Depth2DComputer(jnp.asarray(vol), -1.0, 1.5, 7, params=params,
                        use_pallas=True, early_stop=False,
                        v_slabs=1).run()
    assert (np.asarray(a.claim) == np.asarray(b.claim)).all()
    assert np.array_equal(np.asarray(a.line_conf),
                          np.asarray(b.line_conf))
    assert np.array_equal(np.asarray(a.best_depth),
                          np.asarray(b.best_depth))
