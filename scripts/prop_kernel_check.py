"""On-chip A/B: propagate_pallas (compiled) vs propagate (XLA), bitwise.

The interpret-mode tests can miss hardware-lowering divergences (e.g.
rotate-amount semantics); this runs a mid-sized random case on the real
backend and diffs every output.  Used by scripts/tpu_acceptance.py.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.ops.propagation import propagate
from remotesensingproject_tpu.ops.propagation_pallas import propagate_pallas


def check(S=20, V=300, U=450, C=1, slope=1.0, seed=0, interpret=False):
    rng = np.random.default_rng(seed)
    s_hat = S // 2
    dmin, dmax = -1.0, 4.0
    frames = rng.uniform(0, 1, (S, V, U, C)).astype(np.float32)
    depth_f = (np.round(rng.uniform(dmin, dmax, (V, U)) * 8) / 8
               ).astype(np.float32)
    rbar = (frames[s_hat] + rng.normal(0, 0.04, (V, U, C))
            ).astype(np.float32)
    smask = rng.uniform(size=(V, U)) < 0.5
    claim0 = rng.uniform(size=(S, V, U)) < 0.7
    tgt0 = rng.uniform(0, 1, (S, V, U)).astype(np.float32)
    conf0 = rng.uniform(0, 1, (S, V, U)).astype(np.float32)
    payloads = ((jnp.asarray(tgt0), jnp.asarray(depth_f)),
                (jnp.asarray(conf0),
                 jnp.asarray(rng.uniform(0, 1, (V, U)).astype(np.float32))))
    args = (jnp.asarray(claim0), jnp.asarray(frames),
            jnp.asarray(depth_f), jnp.asarray(rbar), jnp.asarray(smask),
            jnp.int32(s_hat))
    kw = dict(d_bounds=(dmin, dmax), slope_factor=slope, epsilon=0.1)
    rc, rt = jax.jit(functools.partial(propagate, **kw))(
        *args, payloads=payloads)
    kc, kt = jax.jit(functools.partial(
        propagate_pallas, interpret=interpret, **kw))(
        *args, payloads=payloads)
    rc, kc = np.asarray(rc), np.asarray(kc)
    ok = (rc == kc).all()
    print(f"claim: ref painted {(~rc & claim0).sum()} px, "
          f"kernel painted {(~kc & claim0).sum()} px, "
          f"mismatch {(rc != kc).sum()}")
    for i, (r, k) in enumerate(zip(rt, kt)):
        r, k = np.asarray(r), np.asarray(k)
        n = (r != k).sum()
        ok = ok and n == 0
        print(f"payload {i}: mismatch {n}")
    return ok


if __name__ == "__main__":
    good = check(seed=0) and check(seed=1, slope=0.5, C=1)
    print("PASS" if good else "FAIL")
    sys.exit(0 if good else 1)
