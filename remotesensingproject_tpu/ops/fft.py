"""Sub-pixel horizontal translation via DFT phase shift.

TPU-native equivalent of rslf::fft_htranslate
(src/rslf_types.cpp:149-209) — implemented in the reference but unused in
its main path (only a commented-out "Shannon interpolation" sketch at
rslf_depth_computation_core.hpp:518-524 references it).  Provided for
API completeness; jnp.fft runs fine on TPU.

Note: the reference's inverse DFT omits DFT_SCALE, so its output is
scaled by N (src/rslf_types.cpp:208); this implementation is properly
normalized (a translate of a constant row is the same row).
"""

from __future__ import annotations

import jax.numpy as jnp


def fft_htranslate(rows, shift: float):
    """Translate each row by `shift` pixels (rightward positive) using
    the DFT shift theorem, matching the reference's phase convention
    (phase = -2*pi*shift*j/N applied to the forward DFT, then inverse).

    Args:
      rows: ``[..., N]`` real float32 rows.
      shift: translation in pixels (may be fractional; traced ok).
    """
    n = rows.shape[-1]
    spec = jnp.fft.fft(rows, axis=-1)
    # signed frequencies (the reference uses raw bin indices j=0..N-1,
    # src/rslf_types.cpp:170-174, which corrupts fractional shifts of
    # real signals; the symmetric convention is the correct Shannon
    # translate and agrees for integer shifts)
    freq = jnp.fft.fftfreq(n)
    ph = -2.0 * jnp.pi * shift * freq
    out = jnp.fft.ifft(spec * (jnp.cos(ph) + 1j * jnp.sin(ph)), axis=-1)
    return jnp.real(out).astype(rows.dtype)
