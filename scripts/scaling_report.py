"""Scaling-efficiency report: sharded pipeline MPix/s at 1..N devices.

BASELINE config 5 scaffold.  Runs the full FineToCoarse pipeline on the
same synthetic light field over v-meshes of growing size and reports
throughput + efficiency vs the 1-device run.  On this machine the mesh
is 8 virtual CPU devices (no multi-chip TPU is attached); on a pod
slice the same script measures real ICI scaling.

Writes SCALING.json at the repo root:
  {"devices": [...], "seconds": [...], "mpix_per_s": [...],
   "efficiency": [...]}

Usage: python scripts/scaling_report.py [V U S D]
"""

import json
import os
import sys
import time

# force the virtual CPU mesh (the axon env presets JAX_PLATFORMS);
# override with SCALING_BACKEND=tpu on a real pod slice
os.environ["JAX_PLATFORMS"] = os.environ.get("SCALING_BACKEND", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

# sitecustomize imports jax at interpreter start (axon plugin), so the
# env vars above may be too late — force the platform via the config.
jax.config.update("jax_platforms",
                  os.environ.get("SCALING_BACKEND", "cpu"))
import jax.numpy as jnp  # noqa: E402

from bench import synthetic_sequence  # noqa: E402
from remotesensingproject_tpu.models.fine_to_coarse import (  # noqa: E402
    FineToCoarse)
from remotesensingproject_tpu.parallel.mesh import make_mesh  # noqa: E402


def run_once(vol, n_dev):
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    ftc = FineToCoarse(vol, -1.0, 1.5, 16, mesh=mesh, use_pallas=False)
    t0 = time.time()
    ftc.run()
    fused, _ = ftc.get_results()
    np.asarray(fused)  # host sync
    return time.time() - t0


def main():
    args = [int(a) for a in sys.argv[1:]]
    V, U, S, D = (args + [64, 128, 12, 16])[:4]
    vol, _ = synthetic_sequence(S, V, U, seed=0)
    vol = jnp.asarray(np.asarray(vol))  # materialize on host once
    mpix = S * V * U / 1e6

    sizes = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    out = {"devices": [], "seconds": [], "mpix_per_s": [],
           "efficiency": [], "shape": {"V": V, "U": U, "S": S, "D": D},
           "backend": jax.default_backend()}
    if out["backend"] == "cpu":
        out["note"] = ("virtual CPU devices share one host's cores: "
                       "this validates the sharded dispatch path, not "
                       "real scaling — run on a pod slice for ICI "
                       "numbers")
    base = None
    for n in sizes:
        run_once(vol, n)          # warm (compile)
        dt = run_once(vol, n)
        rate = mpix / dt
        if base is None:
            base = rate
        out["devices"].append(n)
        out["seconds"].append(round(dt, 3))
        out["mpix_per_s"].append(round(rate, 4))
        out["efficiency"].append(round(rate / (base * n), 3))
        print(f"devices={n}: {dt:.2f}s  {rate:.3f} MPix/s  "
              f"eff={rate / (base * n):.2f}", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
