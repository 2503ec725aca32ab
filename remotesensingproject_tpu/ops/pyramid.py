"""Fine-to-coarse pyramid ops: downsample, disparity bounds, fusion.

TPU-native equivalents of downsample_EPIs / fuse_disp_maps
(src/rslf_fine_to_coarse_core.cpp:14-135) and the per-pixel disparity
bound derivation of FineToCoarse::run (rslf_fine_to_coarse.hpp:179-294).

OpenCV semantics mirrored:
* GaussianBlur(ksize=7, sigma=0) uses OpenCV's fixed small-kernel table
  (the 7-tap binomial-like kernel), BORDER_REFLECT (symmetric) padding;
* cv::resize(fx=fy=0.5, INTER_LINEAR): bilinear at half-pixel centers —
  no antialiasing filter (so jax.image.resize is NOT a match);
* upsampling INTER_LINEAR / INTER_NEAREST in the fusion likewise.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import DTYPE

#: OpenCV getGaussianKernel(7, sigma<=0) fixed table (smoothing path of
#: cv::GaussianBlur for small kernels).  Verified against cv2 in tests.
GAUSSIAN7 = np.array(
    [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
    dtype=np.float32,
)


def gaussian_blur_vu(frames, ksize: int = 7):
    """Separable Gaussian blur over the last two spatial axes (v, u).

    Args:
      frames: ``[..., V, U]`` or ``[..., V, U, C]`` handled by caller
        reshaping; this function expects spatial axes LAST TWO.
    """
    if ksize != 7:
        raise NotImplementedError("reference uses _GAUSSIAN_KSIZE 7")
    k = jnp.asarray(GAUSSIAN7)
    w = (ksize - 1) // 2

    def conv_axis(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (w, w)
        xp = jnp.pad(x, pad, mode="symmetric")  # BORDER_REFLECT
        n = x.shape[axis]
        out = jnp.zeros_like(x)
        for i in range(ksize):
            out = out + k[i] * jax.lax.slice_in_dim(xp, i, i + n, axis=axis)
        return out

    x = conv_axis(frames, -2)
    return conv_axis(x, -1)


def cv_resize_shape(dim: int, scale: float = 0.5) -> int:
    """cv::resize target size for a scale factor (saturate_cast/cvRound)."""
    return int(np.rint(dim * scale))


def resize_bilinear_cv(img, out_shape: Tuple[int, int],
                       scales: Optional[Tuple[float, float]] = None):
    """cv::resize INTER_LINEAR replica (half-pixel centers, clamped).

    When cv::resize is called with explicit fx/fy factors (as the
    reference's downsample does with 0.5, fine_to_coarse_core.cpp:41),
    OpenCV samples with THOSE scales even if the rounded output size
    implies a slightly different ratio — pass ``scales`` = (1/fy, 1/fx)
    to replicate; with an explicit dsize (the fusion upsamples) OpenCV
    derives scales from the sizes, the default here.

    Args:
      img: ``[..., V, U]``.
      out_shape: (V2, U2).
      scales: optional (src/dst) sampling scales per axis.
    """
    V, U = img.shape[-2:]
    V2, U2 = out_shape

    def axis_weights(n_in, n_out, scale):
        if scale is None:
            scale = n_in / n_out
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
        i0 = np.floor(src).astype(np.int64)
        t = (src - i0).astype(np.float32)
        # OpenCV clamps: sx<0 -> (0, t=0); sx>=n-1 -> (n-2, t=1) — both
        # equivalent to clipped gathers of i0 and i0+1 with t unchanged
        # only when t in [0,1]; normalize the edge cases explicitly.
        t = np.where(i0 < 0, 0.0, t)
        t = np.where(i0 >= n_in - 1, 1.0, t).astype(np.float32)
        i0c = np.clip(i0, 0, n_in - 1)
        i1c = np.clip(i0 + 1, 0, n_in - 1)
        return jnp.asarray(i0c), jnp.asarray(i1c), jnp.asarray(t)

    sv, su = scales if scales is not None else (None, None)
    v0, v1, tv = axis_weights(V, V2, sv)
    u0, u1, tu = axis_weights(U, U2, su)

    a = jnp.take(img, v0, axis=-2)
    b = jnp.take(img, v1, axis=-2)
    x = a * (1.0 - tv)[..., :, None] + b * tv[..., :, None]
    a = jnp.take(x, u0, axis=-1)
    b = jnp.take(x, u1, axis=-1)
    return a * (1.0 - tu) + b * tu


def resize_nearest_cv(img, out_shape: Tuple[int, int]):
    """cv::resize INTER_NEAREST replica (sx = floor(dx * scale))."""
    V, U = img.shape[-2:]
    V2, U2 = out_shape
    vi = np.clip(np.floor(np.arange(V2) * (V / V2)).astype(np.int64), 0, V - 1)
    ui = np.clip(np.floor(np.arange(U2) * (U / U2)).astype(np.int64), 0, U - 1)
    return jnp.take(jnp.take(img, jnp.asarray(vi), axis=-2),
                    jnp.asarray(ui), axis=-1)


def downsample_epis(epis_v_s_u_c):
    """One pyramid step: per-frame 7x7 Gaussian + 0.5x bilinear decimation.

    The reference blurs each (v, u) frame, then resizes by 0.5 with
    INTER_LINEAR (src/rslf_fine_to_coarse_core.cpp:28-46); s is untouched.

    Args:
      epis_v_s_u_c: ``[V, S, U, C]``.

    Returns:
      ``[V2, S, U2, C]`` with V2 = round(V/2), U2 = round(U/2).
    """
    V, S, U, C = epis_v_s_u_c.shape
    frames = jnp.transpose(epis_v_s_u_c, (1, 3, 0, 2))  # [S, C, V, U]
    blurred = gaussian_blur_vu(frames)
    V2, U2 = cv_resize_shape(V), cv_resize_shape(U)
    # fx=fy=0.5 given explicitly -> sampling scale exactly 2.0
    small = resize_bilinear_cv(blurred, (V2, U2), scales=(2.0, 2.0))
    return jnp.transpose(small, (2, 0, 3, 1))  # [V2, S, U2, C]


def bounds_from_parent(depth_up_s_v_u, mask_up_s_v_u, dmin_down_s_v_u,
                       dmax_down_s_v_u):
    """Derive per-pixel disparity bounds for the next (coarser) level.

    Mirrors the nearest-confident-left/right scan of FineToCoarse::run
    (rslf_fine_to_coarse.hpp:202-294): for each coarse pixel (s, v, u),
    look at parent rows v_up = min(2v, V_up-1) and v_up+1; on each row,
    scan left from u_up = min(2u, U_up-1) down to index 1 and right up to
    U_up-1 for the nearest masked-in parents.  A row contributes its
    (d_left, d_right) pair only if both exist; if at least one pair was
    found, dmin/dmax become the min/max over contributed candidates.

    The left/right while-walks become exclusive prefix/suffix cum-max/min.
    """
    S, Vu, Uu = depth_up_s_v_u.shape
    _, Vd, Ud = dmin_down_s_v_u.shape

    u_idx = jnp.arange(Uu, dtype=jnp.int32)
    big = jnp.int32(Uu)  # sentinel > any valid index

    # Nearest masked index strictly left of u (and >= 1): exclusive cummax.
    li = jnp.where(mask_up_s_v_u & (u_idx >= 1)[None, None, :], u_idx, -1)
    lcum = jax.lax.cummax(li, axis=2)
    left = jnp.concatenate(
        [jnp.full((S, Vu, 1), -1, jnp.int32), lcum[:, :, :-1]], axis=2)

    # Nearest masked index strictly right of u: exclusive suffix cummin.
    ri = jnp.where(mask_up_s_v_u, u_idx, big)
    rcum = jax.lax.cummin(ri, axis=2, reverse=True)
    right = jnp.concatenate(
        [rcum[:, :, 1:], jnp.full((S, Vu, 1), big, jnp.int32)], axis=2)

    lvalid = left >= 1
    rvalid = right < Uu
    dl = jnp.take_along_axis(depth_up_s_v_u,
                             jnp.clip(left, 0, Uu - 1), axis=2)
    dr = jnp.take_along_axis(depth_up_s_v_u,
                             jnp.clip(right, 0, Uu - 1), axis=2)
    pair_ok = lvalid & rvalid
    pmin = jnp.minimum(dl, dr)
    pmax = jnp.maximum(dl, dr)

    # Gather at (v_up, u_up) and (v_up + 1, u_up) for each coarse pixel.
    v_up = np.minimum(2 * np.arange(Vd), Vu - 1)
    u_up = np.minimum(2 * np.arange(Ud), Uu - 1)
    v_up2 = v_up + 1
    row2_exists = v_up2 < Vu
    v_up2c = np.minimum(v_up2, Vu - 1)

    def at(arr, rows):
        return arr[:, rows][:, :, u_up]

    ok1 = at(pair_ok, v_up)
    min1 = at(pmin, v_up)
    max1 = at(pmax, v_up)
    ok2 = at(pair_ok, v_up2c) & jnp.asarray(row2_exists)[None, :, None]
    min2 = at(pmin, v_up2c)
    max2 = at(pmax, v_up2c)

    any_pair = ok1 | ok2
    inf = jnp.asarray(np.inf, DTYPE)
    new_dmin = jnp.minimum(jnp.where(ok1, min1, inf),
                           jnp.where(ok2, min2, inf))
    new_dmax = jnp.maximum(jnp.where(ok1, max1, -inf),
                           jnp.where(ok2, max2, -inf))
    dmin_out = jnp.where(any_pair, new_dmin, dmin_down_s_v_u)
    dmax_out = jnp.where(any_pair, new_dmax, dmax_down_s_v_u)
    return dmin_out, dmax_out


def fuse_disp_maps(disp_pyr: List[jnp.ndarray],
                   validity_pyr: List[jnp.ndarray],
                   final_median_size: int = 3):
    """Coarse-to-fine fusion of the pyramid's disparity maps.

    Mirrors rslf::fuse_disp_maps (src/rslf_fine_to_coarse_core.cpp:69-135):
    starting from the coarsest map, repeatedly upsample (bilinear for the
    map, nearest for the mask), fill the finer level's invalid pixels from
    the upsampled map, OR the masks, and finally 3x3-median the result.

    Args:
      disp_pyr: per level ``[S, V_p, U_p]`` disparity maps (fine first).
      validity_pyr: per level ``[S, V_p, U_p]`` bool masks.

    Returns:
      (fused [S, V_0, U_0], validity [S, V_0, U_0] bool).
    """
    from .median import median_blur

    P = len(disp_pyr)
    map_down = disp_pyr[P - 1]
    mask_down = validity_pyr[P - 1]
    for p in range(P - 1, 0, -1):
        target_shape = disp_pyr[p - 1].shape[-2:]
        map_up = resize_bilinear_cv(map_down, target_shape)
        mask_up = resize_nearest_cv(mask_down, target_shape)
        fine = disp_pyr[p - 1]
        fine_mask = validity_pyr[p - 1]
        map_down = jnp.where(fine_mask, fine, map_up)
        mask_down = fine_mask | mask_up
    # lax.map (not vmap): a vmapped 9-tap sort materializes an
    # [S, 9, V, U] operand (~3 GB at the RGB MansionLR shape) — the
    # sequential map keeps the peak at one frame's window stack
    fused = jax.lax.map(lambda m: median_blur(m, final_median_size),
                        map_down)
    return fused, mask_down
