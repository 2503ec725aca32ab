"""Edge confidence C_e and its threshold mask.

TPU-native equivalent of compute_1D_edge_confidence / _pile /
compute_2D_edge_confidence (rslf_depth_computation_core.hpp:426-478,
728-770, 901-931).

The reference runs 8 separate cv::filter2D passes with (+1, -1) kernels and
accumulates squared differences; here the whole volume is computed in one
vectorized pass:

    C_e(s, v, u) = sum_{o in [-w, w], o != 0} sum_c (E(s,v,u) - E(s,v,u+o))^2

with reflect-101 border handling along u (the filter2D border mode at
core.hpp:458) and NO extra 1-channel scaling (the accumulation at
core.hpp:461 via _square_sum_channels_into is a plain square sum,
src/rslf_depth_computation_core.cpp:6-22).

Shadow cut (core.hpp:464-474): C_e is zeroed where the sqrt(3)-scaled pixel
norm falls below ``shadow_level``.  Mask (core.hpp:476): C_e > threshold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DepthParams
from ..types import norm


def edge_confidence_volume(epis_v_s_u_c, params: DepthParams):
    """Compute C_e and mask for every (v, s, u).

    Args:
      epis_v_s_u_c: ``[V, S, U, C]`` normalized EPI volume.
      params: algorithm parameters.

    Returns:
      (ce, mask): ``[V, S, U]`` float32 confidence and bool mask.
    """
    e = epis_v_s_u_c
    w = (params.edge_confidence_filter_size - 1) // 2
    u_axis = 2

    # reflect-101 pad along u (np.pad mode="reflect" semantics).
    pad_widths = [(0, 0)] * e.ndim
    pad_widths[u_axis] = (w, w)
    ep = jnp.pad(e, pad_widths, mode="reflect")

    U = e.shape[u_axis]
    ce = jnp.zeros(e.shape[:3], e.dtype)
    for o in range(-w, w + 1):
        if o == 0:
            continue
        shifted = jax.lax.slice_in_dim(ep, w + o, w + o + U, axis=u_axis)
        diff = e - shifted
        ce = ce + jnp.sum(jnp.square(diff), axis=-1)

    if params.cut_shadows:
        ce = jnp.where(norm(e) < params.shadow_level, 0.0, ce)

    mask = ce > params.edge_score_threshold
    if params.edge_confidence_opening_size > 1:
        mask = _morph_open_vu(mask, params.edge_confidence_opening_size)
    return ce, mask


def edge_confidence_frame(frame_v_u_c, params: DepthParams):
    """C_e and mask for one temporal line s over all (v, u).

    Equivalent of compute_1D_edge_confidence_pile (core.hpp:728-770):
    each v row is independent; the difference window runs along u only.

    Args:
      frame_v_u_c: ``[V, U, C]`` the light-field frame at a fixed s
        (i.e. all EPI rows sliced at that s).

    Returns:
      (ce, mask): ``[V, U]``.
    """
    ce3, mask3 = edge_confidence_volume(frame_v_u_c[:, None, :, :], params)
    return ce3[:, 0], mask3[:, 0]


def _morph_open_vu(mask_v_s_u, size: int):
    """Morphological opening of the (v, u) mask planes, per s.

    Mirrors the optional opening at core.hpp:759-769 (elliptical kernel);
    with the reference's MORPH_ELLIPSE structuring element of size n, which
    for small n is a plus/ellipse shape.  Disabled by default (size 1).
    """
    se = _ellipse_element(size)
    m = mask_v_s_u.astype(jnp.float32)
    eroded = _morph(m, se, erode=True)
    opened = _morph(eroded, se, erode=False)
    return opened > 0.5


def _ellipse_element(n: int):
    """cv::getStructuringElement(MORPH_ELLIPSE, (n, n)) exact replica.

    OpenCV (morph.cpp) uses integer half-axes r = c = n // 2 and fills,
    per row, columns [c - dx, c + dx] with
    dx = cvRound(c * sqrt(r*r - dy*dy) / r) — NOT an inscribed-ellipse
    membership test (verified bit-exact vs cv2 in tests/test_variants.py).
    """
    import numpy as np

    if n <= 1:
        return np.ones((max(n, 1), max(n, 1)), bool)
    r = c = n // 2
    inv_r2 = 1.0 / (r * r)
    el = np.zeros((n, n), bool)
    for i in range(n):
        dy = i - r
        if abs(dy) <= r:
            dx = int(np.rint(
                c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
            el[i, max(c - dx, 0):min(c + dx + 1, n)] = True
    return el


def _morph(m_v_s_u, se, erode: bool):
    n = se.shape[0]
    # OpenCV anchors the element at (n//2, n//2) and uses the SAME
    # offsets for erosion and dilation (its documented formula does not
    # reflect the kernel); the anchor choice matters for even n.
    a = n // 2
    V, S, U = m_v_s_u.shape
    pad = [(a, n - 1 - a), (0, 0), (a, n - 1 - a)]
    init = 1.0 if erode else 0.0
    mp = jnp.pad(m_v_s_u, pad, mode="constant", constant_values=init)
    out = jnp.full((V, S, U), init, m_v_s_u.dtype)
    for dy in range(n):
        for dx in range(n):
            if not se[dy, dx]:
                continue
            win = mp[dy : dy + V, :, dx : dx + U]
            out = jnp.minimum(out, win) if erode else jnp.maximum(out, win)
    return out
