"""1-output-channel 3x3 conv as a Pallas stencil (the XLA trap case).

The VAE decoder ends in ``nn.Conv(1, (3, 3))`` on [B, F, M, 64]
(vae.py:140, mirroring the upstream AutoencoderKL ``decoder.conv_out``
the reference executes via egregora_audio_super_resolution.py:361-369).
XLA's TPU lowering of a C_out=1 2D conv runs ~20x off the bandwidth
roofline: 12.9-13.6 ms at the bench geometry ([26, 512, 256, 64] bf16,
436 MB) vs ~0.6 ms of unavoidable HBM traffic, and every pure-XLA
rewrite measured within 20% of it (tools/edge_conv_lab.py: padded
128-channel 35.3 ms, 9-tap dot accumulation 10.5 ms, three 1D convs
13.4 ms).  The repo's 1D analog of this trap is ops/fir.py.

This kernel reads each activation tile ONCE into VMEM and computes the
9-tap stencil there: grid over (batch row x F-tile), halo framing done
OUTSIDE by strided slicing on a padded copy (the mrf_rows pattern —
no overlapping BlockSpecs), taps as static 2D slices feeding
lane-contraction dots with f32 accumulation.  'SAME' zero-padding
comes from the outside jnp.pad, so results are exact (not
halo-approximate).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLOP_LOG: list = []


def _kernel(x_ref, w_ref, o_ref, *, ft: int, m: int, c: int):
    slab = x_ref[0]                                  # [ft+2, M+2, C]
    acc = jnp.zeros((ft, m), jnp.float32)
    for di in range(3):
        for dj in range(3):
            tap = jax.lax.slice(slab, (di, dj, 0), (di + ft, dj + m, c))
            acc = acc + jax.lax.dot_general(
                tap, w_ref[di, dj], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = acc


def conv3x3_out1(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                 f_tile: int = 64, interpret: bool = False) -> jnp.ndarray:
    """``[B, F, M, C] x [3, 3, C, 1] -> [B, F, M, 1]`` ('SAME', exact).

    Matches ``nn.Conv(1, (3, 3), padding='SAME')`` with the same flax
    kernel layout; f32 accumulation and output (the decoder's final
    astype).
    """
    b, f, m, c = x.shape
    assert kernel.shape == (3, 3, c, 1), kernel.shape
    ft = min(f_tile, f)
    if f % ft:
        raise ValueError(f"F={f} not a multiple of f_tile={ft}")
    s = f // ft
    FLOP_LOG.append(2 * 9 * b * f * m * c)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    frames = jnp.stack(
        [jax.lax.slice(xp, (0, i * ft, 0, 0), (b, i * ft + ft + 2, m + 2, c))
         for i in range(s)], axis=1)                 # [B, S, ft+2, M+2, C]
    frames = frames.reshape(b * s, ft + 2, m + 2, c)
    w = kernel[..., 0].astype(x.dtype)               # [3, 3, C]
    out = pl.pallas_call(
        functools.partial(_kernel, ft=ft, m=m, c=c),
        grid=(b * s,),
        in_specs=[
            pl.BlockSpec((1, ft + 2, m + 2, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ft, m), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * s, ft, m), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(frames, w)
    out = out.reshape(b, f, m) + bias.astype(jnp.float32)[0]
    return out[..., None]
