"""Checkpoint / resume for the fine-to-coarse pipeline.

The reference has no checkpointing (SURVEY §5) — a crash loses the run.
Here every pyramid level's full state (depth, confidences, masks, claims,
per-pixel bounds) can be saved after ``Depth2DComputer.run`` and restored
to resume mid-pyramid.  npz is the storage format (the analog of the
reference's YML matrix dumps, src/rslf_io.cpp:98-156).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def save_level(path_dir: str, level: int, computer) -> str:
    """Persist one pyramid level's results (after run())."""
    os.makedirs(path_dir, exist_ok=True)
    st = computer.state
    path = os.path.join(path_dir, f"level_{level:02d}.npz")
    # uniform-bounds levels keep their bound arrays LAZY (never
    # materialized on device); serialize the scalars instead of eagerly
    # allocating 2 x [S, V, U] — at the RGB MansionLR shape that
    # materialization is exactly the OOM the lazy arrays avoid
    if computer._bounds_edited:
        bounds = dict(dmin=np.asarray(computer.dmin_s_v_u),
                      dmax=np.asarray(computer.dmax_s_v_u))
    else:
        bounds = dict(dmin_scalar=np.float32(computer.dmin),
                      dmax_scalar=np.float32(computer.dmax))
    np.savez_compressed(
        path,
        ce=np.asarray(st.ce),
        ce_mask=np.asarray(st.ce_mask),
        disp_conf=np.asarray(st.disp_conf),
        line_conf=np.asarray(st.line_conf),
        best_depth=np.asarray(st.best_depth),
        rbar=np.asarray(st.rbar),
        claim=np.asarray(st.claim),
        accept_all=np.asarray(computer.accept_all),
        **bounds,
    )
    return path


def load_level(path_dir: str, level: int, computer) -> bool:
    """Restore a previously saved level into `computer`.

    Returns False when no checkpoint exists.
    """
    import jax.numpy as jnp

    from ..models.depth2d import Depth2DState

    path = os.path.join(path_dir, f"level_{level:02d}.npz")
    if not os.path.exists(path):
        return False
    z = np.load(path)
    computer.state = Depth2DState(
        ce=jnp.asarray(z["ce"]),
        ce_mask=jnp.asarray(z["ce_mask"]),
        disp_conf=jnp.asarray(z["disp_conf"]),
        line_conf=jnp.asarray(z["line_conf"]),
        best_depth=jnp.asarray(z["best_depth"]),
        rbar=jnp.asarray(z["rbar"]),
        claim=jnp.asarray(z["claim"]),
    )
    if "dmin" in z.files:
        computer.set_bounds(jnp.asarray(z["dmin"]), jnp.asarray(z["dmax"]))
    else:
        # uniform-bounds level: keep the arrays lazy (ctor scalars) —
        # and RESET any previously edited/materialized bound state so a
        # scalar checkpoint loaded into a reused computer doesn't leave
        # stale arrays or a wrong uniform_bounds flag
        computer.dmin = float(z["dmin_scalar"])
        computer.dmax = float(z["dmax_scalar"])
        if hasattr(computer, "rebuild_bounds"):
            # sharded driver keeps eagerly built per-shard bound arrays
            computer.rebuild_bounds()
        else:
            computer._dmin_arr = None
            computer._dmax_arr = None
            computer._bounds_edited = False
    computer.accept_all = bool(z["accept_all"])
    return True


def run_with_checkpoints(ftc, ckpt_dir: Optional[str]):
    """FineToCoarse.run with per-level save/resume.

    Levels found in ``ckpt_dir`` are loaded instead of recomputed; each
    freshly computed level is saved before moving on.
    """
    if not ckpt_dir:
        ftc.run()
        return
    import jax

    from ..ops.pyramid import bounds_from_parent

    import jax.numpy as jnp

    bounds_fn = jax.jit(bounds_from_parent)
    for p, computer in enumerate(ftc.computers):
        if not load_level(ckpt_dir, p, computer):
            computer.run()
            save_level(ckpt_dir, p, computer)
        if p < len(ftc.computers) - 1:
            nxt = ftc.computers[p + 1]
            dmin_new, dmax_new = bounds_fn(
                computer.get_depths_s_v_u(),
                computer.get_valid_depths_mask_s_v_u(),
                nxt.dmin_s_v_u, nxt.dmax_s_v_u)
            nxt.set_bounds(dmin_new, dmax_new)
        # r_bar is only read while the level's own passes paint; drop it
        # to free [S, V, U, C] of HBM per level (mirrors
        # FineToCoarse.run — ~1.3 GB across the RGB MansionLR pyramid)
        computer.state = computer.state._replace(
            rbar=jnp.zeros((1, 1, 1, 1), computer.state.rbar.dtype))
