"""FIR filtering as overlap-save Toeplitz matmuls (MXU path).

A single-channel 1-D convolution never reaches the MXU through XLA's
conv op (C_in = 1: measured 260 ms for two 255-tap filters over a
batch-8 FlashSR chunk).  Overlap-save re-expresses the same filter as
a dense ``[block+taps-1, block]`` banded-Toeplitz matmul over strided
frames (gather-free, ops/stft.frame_strided): ~2 ms for the same work.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .stft import frame_strided

BLOCK = 1792  # output samples per frame; L = BLOCK + taps - 1 stays MXU-tiled


@functools.lru_cache(maxsize=16)
def _toeplitz(h_bytes: bytes, taps: int, block: int) -> np.ndarray:
    """``M[t, j] = h[t - j]`` for ``0 <= t - j < taps`` — [block+taps-1, block]."""
    h = np.frombuffer(h_bytes, dtype=np.float32)
    l = block + taps - 1
    m = np.zeros((l, block), dtype=np.float32)
    for k in range(taps):
        m[np.arange(block) + k, np.arange(block)] = h[k]
    return m


def fir_same(x: jnp.ndarray, h: np.ndarray, block: int = BLOCK) -> jnp.ndarray:
    """'same'-mode FIR along the last axis, centered like np.convolve.

    ``h`` must be a host-side float32 array (the filter is baked into
    the Toeplitz constant).  Zero-padded boundaries.
    """
    h = np.asarray(h, dtype=np.float32)
    taps = h.shape[0]
    # np.convolve flips the kernel; the Toeplitz below implements
    # correlation, so flip here and mirror the 'same' center
    c = taps - 1 - (taps - 1) // 2
    h = h[::-1].copy()
    t = x.shape[-1]
    n_blocks = -(-t // block)
    l = block + taps - 1

    # input for output block b starts at b*block - c
    lead = x.shape[:-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1)
                 + [(c, n_blocks * block + (taps - 1 - c) - t)])
    frames = frame_strided(xp, l, block)             # [..., n_blocks, L]
    m = jnp.asarray(_toeplitz(h.tobytes(), taps, block))
    y = jnp.einsum("...fl,lj->...fj", frames, m)     # [..., n_blocks, block]
    return y.reshape(lead + (n_blocks * block,))[..., :t]
