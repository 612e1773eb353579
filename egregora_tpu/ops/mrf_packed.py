"""Batch-packed NWC MRF — grouped-conv engine for narrow-channel stages.

At the HiFi-GAN generator's full-rate stage (C=64; reference lineage
``egregora_audio_super_resolution.py:350-353``) the NWC layout pads 2x
into the TPU's 128-wide vector lanes, so all 18 MRF convs move twice
their logical bytes.  This engine folds ``g`` batch items into the
channel axis (``[B, T, C] -> [B/g, T, g*C]``) and runs every conv with
``feature_group_count=g``: each group applies the SAME weights to its
own item (kernel tiled along the out axis), the packed tensor is
exactly lane-wide, and traffic drops to logical bytes.  Packing is one
relayout at stage rate; unpacking is free when the caller stays packed
through the 1-channel post-conv (the ``[B/g, T, g]`` output transposes
on g channels, not C).

Numerics are identical to the flax ``MRF`` module (SAME zero padding,
f32 accumulation, cast-to-activation-dtype before the bias add) —
pinned in tests/test_mrf_pallas.py.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def pack_batch(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """``[B, T, C] -> [B/g, T, g*C]``; item ``gi*m + mi`` lands in
    packed item ``mi``'s channel block ``gi`` (``m = B//g``)."""
    b, t, c = x.shape
    assert b % g == 0, (b, g)
    m = b // g
    return x.reshape(g, m, t, c).transpose(1, 2, 0, 3).reshape(m, t, g * c)


def unpack_batch(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """Inverse of :func:`pack_batch`: ``[B/g, T, g*C] -> [B, T, C]``."""
    m, t, gc = x.shape
    c = gc // g
    return x.reshape(m, t, g, c).transpose(2, 0, 1, 3).reshape(g * m, t, c)


def conv_packed(a: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                d: int, g: int) -> jnp.ndarray:
    """Grouped NWC conv applying one ``[k, C, C_out]`` kernel to every
    group of a ``[M, T, g*C]`` packed activation (flax ``nn.Conv``
    semantics: SAME zero padding, f32 accumulation, output cast to the
    activation dtype before the bias add)."""
    wg = jnp.concatenate([w.astype(a.dtype)] * g, axis=-1)
    y = jax.lax.conv_general_dilated(
        a, wg, window_strides=(1,), padding="SAME", rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=g,
        preferred_element_type=jnp.float32)
    return y.astype(a.dtype) + jnp.concatenate([bias.astype(a.dtype)] * g)


def _leaky(v, slope=0.1):
    return jnp.maximum(v, slope * v)


def mrf_packed(xp: jnp.ndarray, mrf_params: dict, g: int,
               kernels: Sequence[int] = (3, 7, 11),
               dilations: Sequence[int] = (1, 3, 5)) -> jnp.ndarray:
    """Packed-domain MRF stack ``[M, T, g*C] -> [M, T, g*C]``.

    ``mrf_params`` is the flax ``MRF`` module subtree
    (``ResBlock1D_{j}/Conv_{2m(+1)}``); every branch must share one
    dilation schedule (the caller checks, as for the other engines)."""
    acc = None
    for bi in range(len(kernels)):
        sub = mrf_params[f"ResBlock1D_{bi}"]
        cur = xp
        for mi, d in enumerate(dilations):
            c1 = conv_packed(_leaky(cur),
                             jnp.asarray(sub[f"Conv_{2*mi}"]["kernel"]),
                             jnp.asarray(sub[f"Conv_{2*mi}"]["bias"]), d, g)
            c2 = conv_packed(_leaky(c1),
                             jnp.asarray(sub[f"Conv_{2*mi+1}"]["kernel"]),
                             jnp.asarray(sub[f"Conv_{2*mi+1}"]["bias"]), 1, g)
            cur = cur + c2
        acc = cur if acc is None else acc + cur
    return acc / float(len(kernels))
