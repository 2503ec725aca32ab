"""Compare propagation implementations on TPU at level-0 scale:
the o-loop (current), and a gather/scatter per-s formulation."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.ops.propagation import propagate
from remotesensingproject_tpu.types import DTYPE, normsq, round_half_away

V, S, U, C = 540, 100, 960, 1
gmin, gmax = -1.0, 4.0
params = DepthParams(slope_factor=1.0)
rng = np.random.default_rng(0)

frames = jnp.asarray(rng.random((S, V, U, C), dtype=np.float32))
claim = jnp.asarray(rng.random((S, V, U)) < 0.5)
rbar = jnp.asarray(rng.random((V, U, C), dtype=np.float32))
conf = jnp.asarray(rng.random((S, V, U), dtype=np.float32))
depth_vol = jnp.asarray(rng.random((S, V, U), dtype=np.float32))
smask = jnp.asarray(rng.random((V, U)) < 0.3)
depth_map = jnp.asarray(rng.uniform(gmin, gmax, (V, U)).astype(np.float32))


def _sync(outs):
    for leaf in jax.tree_util.tree_leaves(outs):
        np.asarray(jax.device_get(leaf.ravel()[-1:]))


def timeit(name, fn, *args, n=3):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        _sync(fn(*args))
    print(f"{name}: {(time.time() - t0) / n * 1e3:.0f} ms", flush=True)


# ---- current o-loop ---------------------------------------------------
cur = jax.jit(lambda c, dv, cf, dd, rb, sm, s: propagate(
    c, frames, dd, rb, sm, s, (gmin, gmax), params.slope_factor,
    params.propagation_epsilon, [(dv, dd), (cf, dd)]))
timeit("o-loop", cur, claim, depth_vol, conf, depth_map, rbar, smask,
       jnp.int32(50))


# ---- gather/scatter per-s --------------------------------------------
def prop_scatter(claim, depth_vol, conf_vol, depth_f, rbar, sm, s_hat):
    eps_sq = DTYPE(params.propagation_epsilon) ** 2
    u_idx = jnp.arange(U, dtype=jnp.int32)
    offs_num = depth_f * DTYPE(params.slope_factor)

    def per_s(s, carry):
        claim, depth_vol, conf_vol = carry
        ds = (s_hat - s).astype(DTYPE)
        off = round_half_away(offs_num * ds).astype(jnp.int32)  # [V, U]
        tgt = u_idx[None, :] + off
        ok = sm & (tgt >= 0) & (tgt < U)
        tgtc = jnp.clip(tgt, 0, U - 1)
        frame = jax.lax.dynamic_index_in_dim(frames, s, 0, False)
        claim_s = jax.lax.dynamic_index_in_dim(claim, s, 0, False)
        # radiance gate at the TARGET pixel
        f_t = jnp.take_along_axis(frame, tgtc[..., None], axis=1)
        rad_ok = normsq(f_t - rbar) < eps_sq
        claim_t = jnp.take_along_axis(claim_s, tgtc, axis=1)
        ok = ok & rad_ok & claim_t
        # first-writer-wins: smallest source u per target -> scatter-min
        key = jnp.where(ok, u_idx[None, :], jnp.int32(U))
        win = jnp.full((V, U), U, jnp.int32)
        win = win.at[jnp.arange(V)[:, None], tgtc].min(
            jnp.where(ok, key, U))
        # a target is painted iff win < U; source attrs via gather
        winc = jnp.clip(win, 0, U - 1)
        painted = win < U
        d_p = jnp.take_along_axis(depth_f, winc, axis=1)
        c_p = jnp.take_along_axis(depth_f, winc, axis=1)
        dplane = jax.lax.dynamic_index_in_dim(depth_vol, s, 0, False)
        cplane = jax.lax.dynamic_index_in_dim(conf_vol, s, 0, False)
        dplane = jnp.where(painted, d_p, dplane)
        cplane = jnp.where(painted, c_p, cplane)
        claim_s = claim_s & ~painted
        return (jax.lax.dynamic_update_index_in_dim(claim, claim_s, s, 0),
                jax.lax.dynamic_update_index_in_dim(depth_vol, dplane, s, 0),
                jax.lax.dynamic_update_index_in_dim(conf_vol, cplane, s, 0))

    return jax.lax.fori_loop(0, S, per_s,
                             (claim, depth_vol, conf_vol))


sc = jax.jit(prop_scatter)
timeit("scatter", sc, claim, depth_vol, conf, depth_map, rbar, smask,
       jnp.int32(50))
