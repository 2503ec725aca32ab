"""Measure raw Pallas grid-step overhead on this TPU (axon tunnel)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    np.asarray(jax.device_get(x.ravel()[-1:]))


def timeit(name, fn, *args, n=3):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        _sync(fn(*args))
    print(f"{name}: {(time.time() - t0) / n * 1e3:.1f} ms", flush=True)


def noop_kernel(flags_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(flags_ref[i] != 0)
    def _():
        out_ref[0:1, :] = jnp.ones((1, 128), jnp.float32)


for G in (64, 540, 2048):
    f = jnp.zeros((G,), jnp.int32)
    call = jax.jit(lambda fl, G=G: pl.pallas_call(
        noop_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[],
            out_specs=pl.BlockSpec((1, 128), lambda i, fl_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )(fl))
    timeit(f"noop grid={G} (VMEM out, const map)", call, f)

# same but output in ANY space (no auto pipeline at all)
def noop_any_kernel(flags_ref, out_ref):
    i = pl.program_id(0)


for G in (540, 2048):
    f = jnp.zeros((G,), jnp.int32)
    call = jax.jit(lambda fl, G=G: pl.pallas_call(
        noop_any_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(fl))
    timeit(f"noop grid={G} (ANY out)", call, f)

# dispatch-only floor: a trivial jitted op
x = jnp.ones((8, 128), jnp.float32)
timeit("plain jit add dispatch", jax.jit(lambda y: y + 1), x)
