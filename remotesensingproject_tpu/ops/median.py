"""Selective median filter and plain median blur.

TPU-native equivalent of selective_median_filter
(rslf_depth_computation_core.hpp:663-718) and the final 3x3 cv::medianBlur
of the pyramid fusion (src/rslf_fine_to_coarse_core.cpp:130).

The reference collects, per masked pixel (v, u), the window values whose
mask is set AND whose frame radiance at s_hat is within ``epsilon`` (in the
sqrt(3)-scaled norm) of the center pixel's, then takes
``nth_element(begin + n/2)`` — i.e. the 0-indexed element n//2 of the
sorted gathered values (the upper median).  Out-of-image window taps are
skipped.  Unmasked output pixels are 0 (the destination is zero-initialized
and only masked pixels are written, core.hpp:679,695).

Here: gather the size^2 window taps as a stacked axis, sort invalid taps to
+inf, and pick index n//2 per pixel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import DTYPE, norm


def _sort_taps(taps):
    """Sort a small stacked tap axis with an odd-even transposition
    min/max network instead of jnp.sort.

    XLA's variadic sort lowers to an expensive comparator loop on TPU
    (measured 30-70 ms/pass at the bench shape for the 25-tap stack —
    the last non-kernel stage inside the pass loop), and on the axon
    v5e it is also one of the constructs the platform's deferred
    first-execution compile pays heavily for.  K rounds of alternating
    compare-exchanges are plain elementwise minimum/maximum ops that
    XLA fuses; for K = 25 that is 300 vreg-cheap min/max pairs.
    Identical output ordering to jnp.sort for the float inputs used
    here (finite values and +inf; no NaNs).
    """
    k = len(taps)
    taps = list(taps)
    for rnd in range(k):
        start = rnd & 1
        for i in range(start, k - 1, 2):
            lo = jnp.minimum(taps[i], taps[i + 1])
            hi = jnp.maximum(taps[i], taps[i + 1])
            taps[i], taps[i + 1] = lo, hi
    return taps


def selective_median(src_v_u, frame_v_u_c, mask_v_u, size: int,
                     epsilon: float):
    """Confidence- and color-gated median over a (v, u) window.

    Args:
      src_v_u: ``[V, U]`` values to filter (disparities).
      frame_v_u_c: ``[V, U, C]`` radiances of the s_hat frame (the
        reference reads ``epis[k].at(s_hat, l)``, core.hpp:703-705).
      mask_v_u: ``[V, U]`` bool inclusion mask.
      size: window side (par_median_filter_size, default 5).
      epsilon: color gate (par_median_filter_epsilon, default 0.1).

    Returns:
      ``[V, U]`` filtered values; 0 where mask is unset.
    """
    V, U = src_v_u.shape
    w = (size - 1) // 2
    maskf = mask_v_u.astype(DTYPE)

    pad_vu = [(w, w), (w, w)]
    srcp = jnp.pad(src_v_u, pad_vu, mode="constant")
    maskp = jnp.pad(maskf, pad_vu, mode="constant")
    framep = jnp.pad(frame_v_u_c, pad_vu + [(0, 0)], mode="constant")

    vals = []
    includes = []
    for dy in range(size):
        for dx in range(size):
            sv = srcp[dy : dy + V, dx : dx + U]
            mv = maskp[dy : dy + V, dx : dx + U]
            fv = framep[dy : dy + V, dx : dx + U, :]
            # out-of-image taps: the zero-padded mask already excludes them
            inc = (mv > 0) & (norm(frame_v_u_c - fv) < epsilon)
            vals.append(sv)
            includes.append(inc)

    big = jnp.asarray(jnp.inf, DTYPE)
    sortable = [jnp.where(inc, v, big) for v, inc in zip(vals, includes)]
    ordered = _sort_taps(sortable)
    n = sum(inc.astype(jnp.int32) for inc in includes)  # [V, U]
    pick = jnp.clip(n // 2, 0, size * size - 1)
    # one-hot select instead of take_along_axis: a depth-25 gather
    # lowers to per-element dynamic indexing on TPU (slow); the masked
    # sum selects the identical element
    med = jnp.zeros_like(src_v_u)
    for i, o in enumerate(ordered):
        med = med + jnp.where(pick == i, o, 0.0)
    # center pixel is always included where mask_v_u is set (norm 0 < eps),
    # so n >= 1 there; unmasked outputs are 0 by the reference's contract.
    return jnp.where(mask_v_u, med, 0.0)


def median_blur(img_v_u, size: int = 3):
    """Plain square-window median with replicated borders.

    Matches cv::medianBlur (BORDER_REPLICATE) used at
    src/rslf_fine_to_coarse_core.cpp:130.
    """
    V, U = img_v_u.shape
    w = (size - 1) // 2
    p = jnp.pad(img_v_u, [(w, w), (w, w)], mode="edge")
    taps = [
        p[dy : dy + V, dx : dx + U]
        for dy in range(size)
        for dx in range(size)
    ]
    ordered = _sort_taps(taps)
    return ordered[(size * size) // 2]
