"""Independent NumPy oracle of the Kim'13 pipeline numerics.

A deliberately simple, loop-based transliteration of the algorithm SPEC
(as documented in SURVEY.md and the module docstrings) used to validate
the vectorized JAX implementation.  Written for clarity, not speed — use
tiny shapes.

Conventions: EPIs are [S, U] or [S, U, C] float32; volumes [V, S, U, C].
"""

from __future__ import annotations

import numpy as np

SQRT3 = 1.73205080757


def norm(x):
    x = np.atleast_1d(np.asarray(x, np.float64))
    if x.shape[-1] == 1 or x.ndim == 0:
        return float(np.abs(x).sum() * SQRT3) if x.size == 1 else None
    return float(np.sqrt(np.sum(x * x)))


def norm_vec(x):
    """norm of a channel vector (C,)"""
    x = np.asarray(x, np.float64)
    if x.shape[-1] == 1:
        return abs(float(x[0])) * SQRT3
    return float(np.sqrt(np.sum(x * x)))


def kernel_val(x, h):
    """Bandwidth kernel of a channel vector; NaN -> 0."""
    x = np.asarray(x, np.float64)
    if np.any(np.isnan(x)):
        return 0.0
    scale = 3.0 if x.shape[-1] == 1 else 1.0
    t = scale * np.sum((x / h) ** 2)
    return 0.0 if t > 1 else 1.0 - t


def edge_confidence_row(row_u_c, filter_size=9, shadow_level=0.05 * SQRT3,
                        cut_shadows=True, threshold=0.02):
    """C_e for one (s, v) line. row: [U, C]."""
    U, C = row_u_c.shape
    w = (filter_size - 1) // 2
    ce = np.zeros(U, np.float32)
    for o in range(-w, w + 1):
        if o == 0:
            continue
        for u in range(U):
            j = u + o
            # reflect-101
            if j < 0:
                j = -j
            elif j > U - 1:
                j = 2 * (U - 1) - j
            d = row_u_c[u].astype(np.float64) - row_u_c[j]
            ce[u] += np.sum(d * d)
    if cut_shadows:
        for u in range(U):
            if norm_vec(row_u_c[u]) < shadow_level:
                ce[u] = 0.0
    mask = ce > threshold
    return ce, mask


def interp_linear(row_u_c, idx):
    """Linear 1-D interpolation with the reference validity rule.
    row: [U, C]. Returns (val [C] or NaN, valid)."""
    U = row_u_c.shape[0]
    fi = int(np.floor(idx))
    ci = int(np.ceil(idx))
    if fi < 0 or ci > U - 1:
        return np.full(row_u_c.shape[1], np.nan, np.float32), False
    t = idx - fi
    return ((1 - t) * row_u_c[fi] + t * row_u_c[ci]).astype(np.float32), True


def interp_nearest(row_u_c, idx):
    """Nearest-neighbour 1-D interpolation (the intended semantics of
    Interpolation1DNearestNeighbour, rslf_interpolation.hpp:81-92:
    std::round = half away from zero, valid when in range)."""
    U = row_u_c.shape[0]
    ri = int(np.sign(idx) * np.floor(abs(idx) + 0.5))
    if ri < 0 or ri > U - 1:
        return np.full(row_u_c.shape[1], np.nan, np.float32), False
    return row_u_c[ri].astype(np.float32), True


def sweep_pixel(epi_s_u_c, u, dmin, dmax, dim_d, s_hat, h=0.2,
                slope_factor=1.0, n_iter=10, interpolation="linear"):
    """Full sweep at one pixel: returns (scores [D], best_d_index,
    best_depth, rbar_at_best [C], k_last [S, D], card_R [D])."""
    S, U, C = epi_s_u_c.shape
    interp = interp_linear if interpolation == "linear" else interp_nearest
    # float32 op order as in the C++ (core.hpp:548)
    f32 = np.float32
    D = np.array([f32(f32(dmin) + f32(f32(f32(d) * f32(f32(dmax) -
                  f32(dmin))) / f32(dim_d - 1))) for d in range(dim_d)],
                 np.float32)
    # radiances
    r = np.zeros((S, dim_d, C), np.float32)
    valid = np.zeros((S, dim_d), bool)
    for s in range(S):
        for d in range(dim_d):
            idx = (s_hat - s) * D[d] * slope_factor + u
            val, ok = interp(epi_s_u_c[s], idx)
            r[s, d] = val
            valid[s, d] = ok
    card = valid.sum(axis=0).astype(np.float32)
    r_unnan = np.where(np.isnan(r), 0.0, np.maximum(r, 0.0))

    rbar = r[s_hat].copy()  # [D, C]
    k = np.zeros((S, dim_d), np.float32)
    for _ in range(n_iter):
        for s in range(S):
            for d in range(dim_d):
                k[s, d] = kernel_val(r[s, d] - rbar[d], h)
        sum_k = k.sum(axis=0)  # [D]
        sum_rk = (r_unnan * k[..., None]).sum(axis=0)  # [D, C]
        with np.errstate(invalid="ignore", divide="ignore"):
            new = sum_rk / sum_k[:, None]
        rbar = np.where(np.isnan(new), 0.0, np.maximum(new, 0.0)
                        ).astype(np.float32)
    # final score from k of the LAST iteration (pre-final-rbar-update)
    sum_k = k.sum(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        scores = sum_k / card
    scores = np.where(np.isnan(scores), 0.0,
                      np.maximum(scores, 0.0)).astype(np.float32)
    best = int(np.argmax(scores))  # first max
    return scores, best, float(D[best]), rbar[best], k, card


def selective_median_px(src_v_u, frame_v_u_c, mask_v_u, v, u, size, eps):
    """Median at one pixel; assumes mask[v, u] set."""
    V, U = src_v_u.shape
    w = (size - 1) // 2
    buf = []
    for k in range(max(0, v - w), min(V, v + w + 1)):
        for l in range(max(0, u - w), min(U, u + w + 1)):
            if mask_v_u[k, l] and norm_vec(
                    frame_v_u_c[v, u].astype(np.float64)
                    - frame_v_u_c[k, l]) < eps:
                buf.append(src_v_u[k, l])
    buf.sort()
    return buf[len(buf) // 2]


def selective_median(src_v_u, frame_v_u_c, mask_v_u, size, eps):
    V, U = src_v_u.shape
    out = np.zeros_like(src_v_u)
    for v in range(V):
        for u in range(U):
            if mask_v_u[v, u]:
                out[v, u] = selective_median_px(
                    src_v_u, frame_v_u_c, mask_v_u, v, u, size, eps)
    return out


def propagate(best_depth_s_v_u, disp_conf_s_v_u, claim_s_v_u,
              frames_s_v_u_c, depth_f_v_u, rbar_v_u_c, conf_v_u,
              source_mask_v_u, s_hat, slope_factor, eps,
              extra_payloads=()):
    """Sequential reference propagation (core.hpp:1088-1129).
    Mutates the first three arrays (and extra payload targets) in place.

    extra_payloads: sequence of (target_s_v_u, source_v_u) painted under
    the same condition (the line-confidence write at core.hpp:1123).
    """
    S, V, U = best_depth_s_v_u.shape
    for v in range(V):
        for u in range(U):
            if not source_mask_v_u[v, u]:
                continue
            d = depth_f_v_u[v, u]
            for s in range(S):
                off = d * (s_hat - s) * slope_factor
                t = u + int(np.sign(off) * np.floor(abs(off) + 0.5))
                if (0 <= t < U and claim_s_v_u[s, v, t]
                        and norm_vec(
                            frames_s_v_u_c[s, v, t].astype(np.float64)
                            - rbar_v_u_c[v, u]) < eps):
                    best_depth_s_v_u[s, v, t] = d
                    claim_s_v_u[s, v, t] = False
                    disp_conf_s_v_u[s, v, t] = conf_v_u[v, u]
                    for tgt, srcp in extra_payloads:
                        tgt[s, v, t] = srcp[v, u]


def make_synthetic_lf(S=12, V=8, U=40, C=1, n_objects=4, seed=0,
                      dmin=-1.0, dmax=2.0):
    """Synthetic light field: textured fronto-parallel strips moving with
    per-strip disparity, rendered with proper occlusion (larger disparity
    = nearer = wins).  Returns (volume [V, S, U, C] float32 in (0, 1],
    gt_disparity [V, U] at s_hat = S//2)."""
    rng = np.random.default_rng(seed)
    s_hat = S // 2
    n_layers = n_objects
    # background (layer 0) covers everything; foreground strips nearer.
    disps = np.sort(rng.uniform(dmin, dmax, n_layers))
    # strip intervals at s_hat (in columns), background = whole width
    intervals = [(-10 * U, 10 * U)]
    for _ in range(1, n_layers):
        a = rng.integers(0, U - 4)
        b = a + rng.integers(3, max(4, U // 3))
        intervals.append((int(a), int(b)))
    tex = rng.uniform(0.15, 1.0, (n_layers, V, 5 * U, C)).astype(np.float32)
    for _ in range(2):  # smooth along u for interpolation-friendliness
        tex = 0.5 * tex + 0.25 * np.roll(tex, 1, axis=2) \
            + 0.25 * np.roll(tex, -1, axis=2)

    vol = np.zeros((V, S, U, C), np.float32)
    gt = np.zeros((V, U), np.float32)

    def render(s, u):
        # nearest covering layer wins (largest disparity index is last)
        for li in reversed(range(n_layers)):
            d = disps[li]
            shift = (s_hat - s) * d
            u0 = u - shift  # layer-local coordinate at s_hat
            a, b = intervals[li]
            if a <= u0 <= b:
                src = u0 + 2 * U
                f = int(np.floor(src))
                t = src - f
                return li, (1 - t) * tex[li, :, f] + t * tex[li, :, f + 1]
        raise AssertionError("background covers all")

    for s in range(S):
        for u in range(U):
            li, val = render(s, u)
            vol[:, s, u] = val
            if s == s_hat:
                gt[:, u] = disps[li]
    return vol, gt
