"""Fused-chain Pallas MRF: one branch's whole conv chain per tile, NWC.

The HiFi-GAN MRF (models/flashsr/vocoder.py:80, reference layout
``sr_vocoder.pth`` via egregora_audio_super_resolution.py:350-353) is
54 separate XLA convs; at the full-rate stage ([B, 245760, 64] bf16,
~818 MB activations) every conv round-trips HBM, and the stage measures
~165 ms over-null against a ~60 ms roofline (tools/voc_lab.py).

Round-4's channel-major Pallas engine lost at C=64 (per-tap f32
cast/roll dance); this kernel keeps the XLA-native NWC layout instead:

* time is tiled; each grid program owns one (batch row, time tile) and
  computes a branch's ENTIRE ResBlock chain (leaky -> dilated conv ->
  leaky -> unit conv -> residual, for each dilation) in VMEM;
* halo framing is done OUTSIDE the kernel by strided slicing on a
  padded copy (frame_strided pattern — no overlapping BlockSpecs, no
  manual DMA); edge contamination grows by each conv's span and stays
  inside the halo by construction, the central tile is exact;
* a k-tap dilated conv is k statically-shifted slices concatenated on
  the lane axis (operands full-width at lane offset 0 — Mosaic's
  concat constraint) feeding ONE [L, k*C] x [k*C, C] MXU dot with f32
  accumulation;
* leaky_relu is jnp.maximum(x, 0.1*x) — bf16 compare/select is
  unimplemented on Mosaic, max is fine.

The three kernel-size branches run as three pallas calls (their weight
shapes differ); XLA averages the results.  HBM traffic per stage drops
from ~36 GB to ~4 reads + 3 writes of the activation tensor.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# trace-time FLOP log (XLA cost_analysis reports zero for custom calls;
# bench adds this back — same contract as attn_pallas.FLOP_LOG)
FLOP_LOG: list = []


def _leaky(x):
    return jnp.maximum(x, 0.1 * x)


def _conv_rows(a, w, bias, k: int, d: int):
    """[L, C] x [k, C, C] dilated k-tap conv as k accumulated MXU dots.

    A single [L, k*C] lane-concat of the shifted taps would be the
    wider matmul, but Mosaic refuses to concatenate operands whose
    sublane offsets differ ("result/input offset mismatch on non-concat
    dimension" — the taps start at j*d mod 16), while elementwise adds
    relayout automatically; per-tap dots + f32 accumulation compile.
    Edge samples read zero-pads and are wrong; callers keep a halo."""
    ln, c = a.shape
    hw = (k - 1) // 2
    s = hw * d
    ap = jnp.pad(a, ((s, s), (0, 0)))
    out = jnp.broadcast_to(bias.astype(jnp.float32)[None, :], (ln, c))
    for j in range(k):
        tap = jax.lax.slice(ap, (j * d, 0), (j * d + ln, c))
        out = out + jax.lax.dot_general(tap, w[j],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    return out.astype(a.dtype)


def _branch_kernel(x_ref, wd_ref, bd_ref, wu_ref, bu_ref, o_ref, *,
                   k: int, dils: Sequence[int], halo: int, tt: int,
                   s: int, t_total: int):
    x = x_ref[0]                                    # [L, C] bf16
    ln = x.shape[0]
    # flax Conv('SAME') zero-pads EVERY conv at the signal boundary; the
    # fused chain must therefore re-zero intermediate halo rows that sit
    # outside the real signal [0, T) after each conv, or tile 0/S-1's
    # halos leak "infinite-signal" values into the next conv's taps.
    # int32 iota + compare (bf16 compare is unimplemented on Mosaic),
    # multiplicative mask.
    tile_i = pl.program_id(0) % s
    gpos = (jax.lax.broadcasted_iota(jnp.int32, (ln, 1), 0)
            + tile_i * tt - halo)
    mask = jnp.where((gpos >= 0) & (gpos < t_total), 1.0, 0.0
                     ).astype(x.dtype)              # [L, 1]
    h = x
    for i, d in enumerate(dils):
        a = _leaky(h)
        a = _conv_rows(a, wd_ref[i], bd_ref[i], k, d) * mask
        a = _leaky(a)
        a = _conv_rows(a, wu_ref[i], bu_ref[i], k, 1) * mask
        h = h + a
    o_ref[0] = jax.lax.slice(h, (halo, 0), (halo + o_ref.shape[1],
                                            h.shape[1]))


def branch_span(k: int, dils: Sequence[int]) -> int:
    """Halo needed on each side for one branch's full chain."""
    hw = (k - 1) // 2
    return sum(hw * d + hw for d in dils)


def mrf_branch_rows(x: jnp.ndarray, wd: jnp.ndarray, bd: jnp.ndarray,
                    wu: jnp.ndarray, bu: jnp.ndarray, k: int,
                    dils: Sequence[int] = (1, 3, 5), tile: int = 4096,
                    interpret: bool = False) -> jnp.ndarray:
    """One MRF branch (ResBlock1D chain) fused: ``[B, T, C] -> [B, T, C]``.

    ``wd``/``wu``: [n_dil, k, C, C] dilated / unit conv kernels (flax
    Conv layout [k, C_in, C_out] per stage); ``bd``/``bu``: [n_dil, C].
    """
    b, t, c = x.shape
    halo = branch_span(k, dils)
    tt = min(tile, t)
    if t % tt:
        raise ValueError(f"T={t} not a multiple of tile={tt}")
    s = t // tt
    FLOP_LOG.append(4 * b * t * k * c * c * len(dils))
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))
    # halo-overlapped frames by strided slicing (gather-free)
    frames = jnp.stack(
        [jax.lax.slice(xp, (0, i * tt, 0), (b, i * tt + tt + 2 * halo, c))
         for i in range(s)], axis=1)                # [B, S, L, C]
    lt = tt + 2 * halo
    frames = frames.reshape(b * s, lt, c)
    dt = x.dtype
    out = pl.pallas_call(
        functools.partial(_branch_kernel, k=k, dils=tuple(dils), halo=halo,
                          tt=tt, s=s, t_total=t),
        grid=(b * s,),
        in_specs=[
            pl.BlockSpec((1, lt, c), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tt, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * s, tt, c), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(frames, wd.astype(dt), bd.astype(jnp.float32),
      wu.astype(dt), bu.astype(jnp.float32))
    return out.reshape(b, s * tt, c)


def mrf_rows(x: jnp.ndarray, params: dict, kernels: Sequence[int],
             dilations: Sequence[Sequence[int]], tile: int = 4096,
             interpret: bool = False) -> jnp.ndarray:
    """Full MRF block via fused branch kernels; matches
    models.flashsr.vocoder.MRF.apply on the same flax param tree
    (``ResBlock1D_i/Conv_j`` with convs ordered dilated,unit per stage).
    """
    acc = None
    for bi, (k, dils) in enumerate(zip(kernels, dilations)):
        rb = params[f"ResBlock1D_{bi}"]
        wd = jnp.stack([rb[f"Conv_{2 * i}"]["kernel"]
                        for i in range(len(dils))])
        bd = jnp.stack([rb[f"Conv_{2 * i}"]["bias"]
                        for i in range(len(dils))])
        wu = jnp.stack([rb[f"Conv_{2 * i + 1}"]["kernel"]
                        for i in range(len(dils))])
        bu = jnp.stack([rb[f"Conv_{2 * i + 1}"]["bias"]
                        for i in range(len(dils))])
        h = mrf_branch_rows(x, wd, bd, wu, bu, k, dils, tile=tile,
                            interpret=interpret)
        acc = h if acc is None else acc + h
    return acc / len(kernels)
