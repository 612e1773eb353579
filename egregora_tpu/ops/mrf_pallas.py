"""Fused multi-receptive-field (MRF) residual stack — Pallas TPU kernel.

Why this exists: the HiFi-GAN-family vocoder (models/flashsr/vocoder.py)
runs 18 small 1-D convs per upsample stage at channel counts 16-64.  In
XLA's native NWC conv layout the channel axis is the lane (minor) axis,
and lanes are 128 wide — so a C=16 activation tensor moves through HBM
8x padded, and the full-rate stage reads/writes that padded tensor ~40
times.  Measured cost analysis: 22.4 GB accessed per 8-chunk vocoder
call against ~3.5 GB of logical traffic; the stage ran at 70% of HBM
peak moving mostly padding.

This kernel flips the layout to channel-major ``[C, T]`` — C lands on
sublanes (16 = exactly one bf16 sublane tile) and T on lanes (dense) —
and fuses one entire MRF block (3 parallel ResBlocks x 3 dilation
iterations x 2 convs + residuals + branch mean) into ONE VMEM-resident
pass: read the input tile once, write the output tile once.

Per-conv math: a dilated 1-D conv over a ``[C, L]`` tile is k static
lane-shifted slices stacked on sublanes (``[k*C, Lout]``) contracted
with the tap-major weight ``[k*C, C]`` on the MXU (f32 accumulation,
bf16 I/O — the same numerics as the flax ``nn.Conv(dtype=bf16)`` it
replaces; equivalence is test-pinned).

Halo handling: tiles are materialized host-side as OVERLAPPING frames
(ops/stft.frame_strided, pure strided slices) of the zero-padded
signal, so every grid program computes valid convs on its own tile and
block boundaries are exact — no inter-program communication.  The halo
is ``sum_d ((k-1)//2)(d+1)`` per branch (60 samples for k=11,
dilations 1/3/5), <1% of a 15360-sample tile.

Used by ``models/flashsr/vocoder.apply_fused`` on TPU backends; the
flax module path remains the semantic reference (and the CPU/training
path).  Single-device op: the flagship pipeline runs it inside the
per-chip program (chunk parallelism shards the batch axis above this
level).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stft import frame_strided


def _leaky(x, slope=0.1):
    # flax nn.leaky_relu semantics: where(x >= 0, x, s*x).  Written as
    # max(x, s*x) — identical for s < 1 — because Mosaic does not
    # implement bf16 comparisons ("Target does not support this
    # comparison"); bf16 maximum is supported.
    return jnp.maximum(x, slope * x)


def _roll_lanes(v, shift: int):
    """Lane-axis circular shift.  Mosaic's ``tpu.dynamic_rotate`` is
    only implemented for 32-bit element types ("Rotate with non-32-bit
    data"), so narrow dtypes rotate a f32 copy and cast back — both
    casts are elementwise and keep the offset-0 layout."""
    if v.dtype.itemsize == 4:
        return pltpu.roll(v, shift, axis=1)
    return pltpu.roll(v.astype(jnp.float32), shift, axis=1).astype(v.dtype)


def branch_halo(k: int, dilations: Sequence[int]) -> int:
    """Per-side receptive growth of one ResBlock chain: each dilation
    iteration is conv(k, d) + conv(k, 1) => ((k-1)//2)*(d+1)."""
    return sum(((k - 1) // 2) * (d + 1) for d in dilations)


def _conv_circ(a, w_cat, bias, k: int, d: int):
    """CIRCULAR dilated conv on a full-width ``[C, L]`` tile:
    ``y[:, t] = sum_j W_j @ a[:, (t + j*d) mod L]``.

    Every tap is a full-width ``pltpu.roll`` (offset-0 layout in, out),
    stacked on sublanes and contracted on the MXU over ``k*C``.  No
    slicing anywhere: Mosaic's concat/rotate paths require operands at
    lane offset 0, so the kernel keeps ALL tensors at the fixed tile
    width and tracks the valid (non-wrapped) coordinate window in the
    caller — the wrapped columns never reach the sliced output."""
    c, l = a.shape
    if c >= 128:
        # wide channels fill the MXU per tap on their own, and the
        # [k*C, L] concat would not fit VMEM (C=256, k=11 -> 12 MB);
        # accumulate k per-tap dots in f32 instead
        y = None
        for j in range(k):
            aj = _roll_lanes(a, l - j * d) if j else a
            yj = jax.lax.dot_general(
                w_cat[j * c:(j + 1) * c, :], aj, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = yj if y is None else y + yj
    else:
        cat = jnp.concatenate(
            [_roll_lanes(a, l - j * d) if j else a for j in range(k)],
            axis=0)                                       # [k*C, L]
        y = jax.lax.dot_general(w_cat, cat, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    # cast before bias add, matching flax Conv (conv output is cast to
    # the module dtype, then the bf16 bias is added); bias is [C, 1]
    return y.astype(a.dtype) + bias.astype(a.dtype)


def _mask_oob(v, g0, total):
    """Zero columns whose GLOBAL signal index falls outside [0, total).

    The flax 'SAME' convs zero-pad every layer's input at the signal
    boundary; a halo tile instead carries values *computed* past the
    edge from the zero-extended input, which differ from layer 2 on.
    Masking each layer output outside the true signal range reproduces
    the per-layer zero padding exactly (test-pinned at f32)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) + g0
    # int32 compares + a multiplicative mask: Mosaic lacks bf16
    # compare/select paths, and 0/1 * v is exact
    keep = ((idx >= 0) & (idx < total)).astype(v.dtype)
    return v * keep


def _mrf_kernel(kernels, dilations, halo, block_t, total, x_ref, *refs):
    out_ref = refs[-1]
    wrefs = refs[:-1]
    t0 = pl.program_id(1) * block_t                       # tile's global start
    xb = x_ref[0, 0, :, :]                                # [C, L]
    l = xb.shape[1]
    acc = None
    wi = 0
    for bi, k in enumerate(kernels):
        hb = branch_halo(k, dilations)
        cur = xb
        g = -halo                      # col t of cur <-> global t0 + g + t
        for d in dilations:
            w1, b1, w2, b2 = (wrefs[wi][...], wrefs[wi + 1][...],
                              wrefs[wi + 2][...], wrefs[wi + 3][...])
            wi += 4
            hd = ((k - 1) // 2) * d
            a = _leaky(cur)
            c1 = _conv_circ(a, w1, b1, k, d)              # <-> g + hd + t
            c1 = _mask_oob(c1, t0 + g + hd, total)
            a2 = _leaky(c1)
            c2 = _conv_circ(a2, w2, b2, k, 1)             # <-> g + s + t
            s = hd + (k - 1) // 2
            # realign the residual to c2's coordinates: cur[t + s]
            cur = _roll_lanes(cur, l - s) + c2
            g = g + s
            cur = _mask_oob(cur, t0 + g, total)
        # align branch output to col t <-> global t0 + t (g = hb - halo)
        if halo - hb:
            cur = _roll_lanes(cur, l - (halo - hb))
        acc = cur if acc is None else acc + cur
    out_ref[0, 0, :, :] = (acc / float(len(kernels)))[:, :block_t]


def mrf_fused_cm(x_cm: jnp.ndarray,
                 weights: Sequence[Tuple[jnp.ndarray, ...]],
                 kernels: Sequence[int] = (3, 7, 11),
                 dilations: Sequence[int] = (1, 3, 5),
                 block_t: int | None = None,
                 interpret: bool = False) -> jnp.ndarray:
    """``[B, C, T] -> [B, C, T]`` fused MRF (zero-padded boundaries,
    matching the flax 'SAME' convs).

    ``weights``: flat list over (branch, dilation-iteration) of
    ``(w1_cat [k*C, C], b1 [C], w2_cat [k*C, C], b2 [C])`` tuples in
    branch-major order, tap-major rows (``w[j*C + i, o] = kernel[j, i, o]``).
    """
    b, c, t = x_cm.shape
    # halo rounded up so the tile width L = block_t + 2*halo stays a
    # multiple of 128 lanes — every in-kernel tensor keeps the full
    # width and lane offset 0, the layouts Mosaic's rotate/concat
    # lowerings support
    halo = -(-max(branch_halo(k, dilations) for k in kernels) // 64) * 64
    if block_t is None:
        # keep the largest per-conv sublane stack (~max(k)*C x L) near
        # ~6 MB of VMEM
        block_t = max(2048, min(16384, (6_000_000 // (2 * max(kernels) * c))
                                // 1024 * 1024))
    block_t = -(-block_t // 128) * 128
    nt = -(-t // block_t)
    l = block_t + 2 * halo
    xp = jnp.pad(x_cm, ((0, 0), (0, 0), (halo, halo + nt * block_t - t)))
    # [B, nT, C, L]: the blocked (singleton) grid axes must not occupy
    # the last two block dims — Mosaic requires those to equal the
    # array dims (or tile-divide 8/128)
    tiles = jnp.swapaxes(frame_strided(xp, l, block_t)[:, :, :nt], 1, 2)

    flat_w = []
    for tup in weights:
        flat_w.extend(jnp.asarray(w, x_cm.dtype) for w in tup)

    in_specs = [pl.BlockSpec((1, 1, c, l), lambda bb, tt: (bb, tt, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(w.shape, functools.partial(
        lambda nd, bb, tt: (0,) * nd, w.ndim), memory_space=pltpu.VMEM)
        for w in flat_w]

    kernel = functools.partial(_mrf_kernel, tuple(kernels), tuple(dilations),
                               halo, block_t, t)
    flops, bytes_io = _mrf_cost(b, c, nt, block_t, l, kernels, dilations,
                                x_cm.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, c, block_t),
                               lambda bb, tt: (bb, tt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nt, c, block_t), x_cm.dtype),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_io,
                                      transcendentals=0),
        interpret=interpret,
    )(tiles, *flat_w)
    return jnp.swapaxes(out, 1, 2).reshape(b, c, nt * block_t)[:, :, :t]


def _mrf_cost(b, c, nt, block_t, l, kernels, dilations, dtype):
    """(flops, bytes_accessed) of the whole fused call — the per-conv
    matmuls on the shrinking valid tiles, and one tile read + one tile
    write of HBM traffic (the point of the kernel).  ``l`` is the
    caller's actual tile width so the estimate can't drift from the
    kernel geometry."""
    flops = sum(2 * 2 * k * c * c * l for k in kernels for _ in dilations)
    flops *= b * nt
    esize = jnp.dtype(dtype).itemsize
    bytes_io = b * nt * (l + block_t) * c * esize
    return flops, bytes_io


def pack_resblock_weights(params: dict, kernels: Sequence[int],
                          dilations: Sequence[int], dtype=jnp.bfloat16):
    """Flatten an ``MRF_i`` flax param subtree into the kernel's weight
    list.  ``ResBlock1D_{b}/Conv_{2m}`` is the dilated conv of iteration
    m, ``Conv_{2m+1}`` the plain one (vocoder.py:44-51); flax Conv
    kernels are ``[k, C_in, C_out]`` -> tap-major ``[k*C_in, C_out]``."""
    out = []
    for bi, k in enumerate(kernels):
        sub = params[f"ResBlock1D_{bi}"]
        for m in range(len(dilations)):
            w1 = jnp.asarray(sub[f"Conv_{2 * m}"]["kernel"], dtype)
            b1 = jnp.asarray(sub[f"Conv_{2 * m}"]["bias"], dtype)
            w2 = jnp.asarray(sub[f"Conv_{2 * m + 1}"]["kernel"], dtype)
            b2 = jnp.asarray(sub[f"Conv_{2 * m + 1}"]["bias"], dtype)
            kk, ci, co = w1.shape
            # biases as [C, 1] columns: 1-D refs sit awkwardly in
            # Mosaic's (sublane, lane) tiling; a column broadcasts
            # directly over the lane (time) axis
            out.append((w1.reshape(kk * ci, co), b1.reshape(-1, 1),
                        w2.reshape(kk * ci, co), b2.reshape(-1, 1)))
    return out
