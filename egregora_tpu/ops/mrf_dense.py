"""Channel-major dense MRF — plain-XLA alternative to the Pallas kernel.

Same contract as ``ops.mrf_pallas.mrf_fused_cm`` (``[B, C, T] ->
[B, C, T]``, zero-padded boundaries, flax-Conv cast semantics,
``pack_resblock_weights`` weight list), built from static time-slices
and per-tap MXU contractions instead of a fused Mosaic kernel.

Why it exists (round 4): the Pallas kernel's 4x advantage was measured
at C=16 where XLA's NWC layout moved 8x the bytes in lane padding; at
the current channel floor of 64 the padding waste is only 2x and the
kernel's per-tap ``pltpu.roll`` dance (f32 cast -> rotate -> cast, the
Mosaic workaround for offset-0-only concat and 32-bit-only rotate) eats
the margin on the VPU.  In channel-major form XLA has no such
constraints: T stays on the minor axis (dense — traffic is logical
bytes), C sits on sublanes (C=64 is exactly 4 bf16 sublane tiles), each
tap is a static slice the fusion engine folds into the dot's operand.

Reference lineage: the MRF structure mirrors the HiFi-GAN generator
inside FlashSR's ``sr_vocoder.pth``
(reference ``egregora_audio_super_resolution.py:350-353``).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _leaky(v, slope=0.1):
    return jnp.maximum(v, slope * v)


def _conv_cm(a: jnp.ndarray, w_cat: jnp.ndarray, bias: jnp.ndarray,
             k: int, d: int) -> jnp.ndarray:
    """Dilated 1-D conv on ``[B, C, T]``: k static time-slices of the
    zero-padded activation, each contracted with its tap's ``[C, C]``
    block on the MXU (f32 accumulation, output cast to the activation
    dtype before the bias add — flax ``nn.Conv(dtype=...)`` semantics)."""
    c, t = a.shape[1], a.shape[2]
    p = (k - 1) // 2 * d
    ap = jnp.pad(a, ((0, 0), (0, 0), (p, p)))
    y = None
    for j in range(k):
        yj = jnp.einsum(
            "co,bct->bot", w_cat[j * c:(j + 1) * c, :],
            jax.lax.slice_in_dim(ap, j * d, j * d + t, axis=2),
            preferred_element_type=jnp.float32)
        y = yj if y is None else y + yj
    return y.astype(a.dtype) + bias[None, :, :]


def mrf_dense_cm(x_cm: jnp.ndarray,
                 weights: Sequence[Tuple[jnp.ndarray, ...]],
                 kernels: Sequence[int] = (3, 7, 11),
                 dilations: Sequence[int] = (1, 3, 5)) -> jnp.ndarray:
    """``[B, C, T] -> [B, C, T]`` multi-receptive-field stack; drop-in
    for ``mrf_fused_cm`` (same branch-major ``(w1_cat, b1, w2_cat, b2)``
    weight list from ``pack_resblock_weights``)."""
    acc = None
    wi = 0
    for k in kernels:
        cur = x_cm
        for d in dilations:
            w1, b1, w2, b2 = weights[wi]
            wi += 1
            c1 = _conv_cm(_leaky(cur), w1, b1, k, d)
            c2 = _conv_cm(_leaky(c1), w2, b2, k, 1)
            cur = cur + c2
        acc = cur if acc is None else acc + cur
    return acc / float(len(kernels))
