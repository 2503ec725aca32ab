"""Depth2DComputer pallas paths (interpret mode) vs the XLA path.

The driver picks pallas kernels on TPU; off-TPU they run in interpret
mode, which lets CI exercise the exact driver branches — including the
refined/unrefined split at coarse-pyramid bounds — bit-for-bit against
the pure-XLA path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from remotesensingproject_tpu.models.depth2d import Depth2DComputer
from tests.oracle import make_synthetic_lf


def _run(vol, edit_bounds, use_pallas, coarse_mode="pixel", dim_d=7):
    c = Depth2DComputer(jnp.asarray(vol), -1.0, 1.5, dim_d,
                        use_pallas=use_pallas, pass_chunk=3,
                        coarse_mode=coarse_mode)
    if edit_bounds:
        S, V, U = c.dmin_s_v_u.shape
        rng = np.random.default_rng(7)
        center = rng.uniform(-1.0, 1.5, (V, U)).astype(np.float32)
        dmin = np.clip(center - 0.3, -1.0, 1.5)
        dmax = np.clip(center + 0.3, -1.0, 1.5)
        unref = rng.random((V, U)) < 0.3
        dmin[unref], dmax[unref] = -1.0, 1.5
        c.set_bounds(jnp.broadcast_to(jnp.asarray(dmin), (S, V, U)),
                     jnp.broadcast_to(jnp.asarray(dmax), (S, V, U)))
    c.run()
    return c.state


@pytest.mark.parametrize("edit_bounds", [False, True])
def test_depth2d_pallas_matches_xla(edit_bounds):
    """coarse_mode="pixel" keeps the reference's exact per-pixel grids —
    the pallas pipeline must match the XLA pipeline bit-for-bit-ish."""
    vol, _ = make_synthetic_lf(S=8, V=6, U=160, C=1, seed=5,
                               dmin=-1.0, dmax=1.5)
    ref = _run(vol, edit_bounds, use_pallas=False)
    out = _run(vol, edit_bounds, use_pallas=True)
    for name in ("claim", "ce_mask"):
        r = np.asarray(getattr(ref, name))
        o = np.asarray(getattr(out, name))
        assert np.array_equal(r, o, equal_nan=True), name
    # engines agree on every candidate CHOICE; the stored candidate
    # VALUES can differ in the last ulp (XLA CPU division/fma codegen
    # varies per jit context, so dmin + d*range/(D-1) is not bit-stable
    # across separately-compiled programs)
    assert np.allclose(ref.best_depth, out.best_depth, atol=1e-4), \
        "best_depth"
    # disp_conf = C_e * |best - mean| differs in the last ulp: the
    # kernel accumulates score_sum sequentially over d then divides,
    # the XLA path takes jnp.mean over the d axis.
    assert np.allclose(ref.disp_conf, out.disp_conf, atol=2e-3), "disp_conf"


def test_depth2d_tile_mode_close_to_pixel_mode():
    """coarse_mode="tile" (tile-quantized candidate grids, the fast TPU
    default) must stay within one tile-grid step of the exact per-pixel
    pipeline wherever both are confident."""
    vol, _ = make_synthetic_lf(S=8, V=6, U=160, C=1, seed=5,
                               dmin=-1.0, dmax=1.5)
    ref = _run(vol, True, use_pallas=True, coarse_mode="pixel", dim_d=25)
    out = _run(vol, True, use_pallas=True, coarse_mode="tile", dim_d=25)
    both = np.asarray(ref.ce_mask & out.ce_mask & ~ref.claim & ~out.claim)
    assert both.sum() > 100  # enough commonly-claimed confident pixels
    diff = np.abs(np.asarray(ref.best_depth) - np.asarray(out.best_depth))
    step = (1.5 - (-1.0)) / 24  # worst-case tile grid step
    frac_close = float((diff[both] <= step + 1e-6).mean())
    assert frac_close > 0.9, frac_close
    # and the overall disparity error stays well inside the 0.5 px budget
    rmse = float(np.sqrt(np.mean(diff[both] ** 2)))
    assert rmse < 0.25, rmse


@pytest.mark.parametrize("edit_bounds", [False, True])
def test_depth2d_v_slabs_bitwise(edit_bounds):
    """v-slabbed pass (scan over v-slabs, halo'd median windows) is
    BITWISE identical to the unslabbed pallas pipeline: sweep and
    propagation are per-v independent, and every interior median row
    sees its full window (models.depth2d._sweep_slabbed docstring)."""
    vol, _ = make_synthetic_lf(S=8, V=24, U=160, C=1, seed=11,
                               dmin=-1.0, dmax=1.5)

    def run(v_slabs):
        c = Depth2DComputer(jnp.asarray(vol), -1.0, 1.5, 7,
                            use_pallas=True, pass_chunk=3,
                            coarse_mode="pixel", v_slabs=v_slabs)
        if edit_bounds:
            S, V, U = 8, 24, 160
            rng = np.random.default_rng(7)
            center = rng.uniform(-1.0, 1.5, (V, U)).astype(np.float32)
            dmin = np.clip(center - 0.3, -1.0, 1.5)
            dmax = np.clip(center + 0.3, -1.0, 1.5)
            unref = rng.random((V, U)) < 0.3
            dmin[unref], dmax[unref] = -1.0, 1.5
            c.set_bounds(jnp.broadcast_to(jnp.asarray(dmin), (S, V, U)),
                         jnp.broadcast_to(jnp.asarray(dmax), (S, V, U)))
        c.run()
        return c.state

    ref = run(1)
    out = run(3)  # Vs=8, median window 12 rows
    for name in ("claim", "ce_mask", "best_depth", "disp_conf", "rbar",
                 "ce"):
        r = np.asarray(getattr(ref, name))
        o = np.asarray(getattr(out, name))
        assert np.array_equal(r, o, equal_nan=True), name
