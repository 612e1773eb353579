"""FFT as MXU matmuls — the TPU-native fast path for long transforms.

XLA's native TPU FFT lowers to a scalar-heavy implementation measured
at ~2 GFLOP/s effective on v5e (a 4M-point rfft costs ~10 ms), which
throttles the Fat-Llama IST loop (2 FFTs/iteration).  The MXU runs
f32 matmuls at tens of TFLOP/s, so a Cooley-Tukey 2-step decomposition

    x[n1*N2 + n2]  ->  X[k] :
      1. column DFTs of length N1 (a dense [N1, N1] matmul),
      2. twiddle multiply,
      3. row DFTs of length N2 (a dense [N2, N2] matmul)

turns an N-point FFT into two dense matmuls + elementwise twiddles —
exactly the shape the hardware wants.  For N = 4M with N1 = N2 = 2048
that is ~68 GFLOP of matmul per transform: ~2 ms at modest MXU
efficiency vs ~10 ms for the native FFT, and it improves further with
batching.

Complex tensors are carried as (real, imag) float32 pairs so every
operation is MXU/VPU-native (XLA complex support on TPU is partial).

Accuracy: |error| ~ sqrt(N1) * eps relative (~1e-5 for N1 = 2048),
ample for audio DSP; verified against numpy in tests.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _dft_mats(n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DFT matrix of size n as (cos, sin) float32 pair: X = x @ (C + jS).

    Built IN-GRAPH from int32 iota (exact modular phase, then one cos /
    sin over [n, n]) instead of a baked numpy literal: a fullchain
    program over a 120 s signal embeds >170 MB of these matrices, which
    the relay's /remote_compile endpoint rejects with HTTP 413
    (VERDICT r3 #9).  On the wire this is now a ~10-op recipe; XLA
    either constant-folds it at compile time or computes it once per
    call (~µs on the VPU) — both are free next to the matmuls it feeds.
    ``k*k`` needs n <= 46341 to stay in int32 (callers are capped at
    max_factor = 4096).
    """
    k = jax.lax.iota(jnp.int32, n)
    prod = (k[:, None] * k[None, :]) % n          # exact phase index
    ang = prod.astype(jnp.float32) * jnp.float32(-2.0 * np.pi / n)
    return jnp.cos(ang), jnp.sin(ang)


def _twiddles(n1: int, n2: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """W_N^{k1*n2} twiddle factors ``[n1, n2]`` as (cos, sin), traced.

    ``k1*nn2 < n1*n2`` so no modular reduction is needed; exact in f32
    up to 2^24 (n1, n2 <= 4096 by construction).  See ``_dft_mats`` for
    why this is built in-graph.
    """
    n = n1 * n2
    k1 = jax.lax.iota(jnp.int32, n1)[:, None]
    nn2 = jax.lax.iota(jnp.int32, n2)[None, :]
    ang = (k1 * nn2).astype(jnp.float32) * jnp.float32(-2.0 * np.pi / n)
    return jnp.cos(ang), jnp.sin(ang)


def _twiddles_t(n1: int, n2: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``_twiddles`` built directly in ``[n2, n1]`` orientation (no
    traced transpose — a >16 MB transpose is a slow constant-fold)."""
    n = n1 * n2
    nn2 = jax.lax.iota(jnp.int32, n2)[:, None]
    k1 = jax.lax.iota(jnp.int32, n1)[None, :]
    ang = (nn2 * k1).astype(jnp.float32) * jnp.float32(-2.0 * np.pi / n)
    return jnp.cos(ang), jnp.sin(ang)


def _split_factor(n: int) -> Tuple[int, int]:
    """n = n1 * n2 with both as close to sqrt(n) as possible (pow2 n)."""
    assert n & (n - 1) == 0, f"matmul FFT needs power-of-2 length, got {n}"
    p = n.bit_length() - 1
    p1 = p // 2
    return 1 << p1, 1 << (p - p1)


@functools.lru_cache(maxsize=64)
def balanced_factors(n: int, max_factor: int = 4096) -> Tuple[int, int] | None:
    """``n = n1 * n2`` with both <= max_factor minimizing n1 + n2, or None.

    Lets the permuted transform run MIXED-RADIX lengths directly (DFT
    matrices are dense, so any factor works): e.g. a 30 s 16 kHz mono
    input upscaled 6x is 2,880,000 samples = 1600 x 1800 — transforming
    it exactly instead of padding to 4,194,304 saves ~43% of the matmul
    work in the IST loop.
    """
    best = None
    i = int(math.isqrt(n))
    while i >= 2:
        if n % i == 0:
            j = n // i
            if i <= max_factor and j <= max_factor:
                return (i, j)
            if j > max_factor:
                return best
        i -= 1
    return best


@functools.lru_cache(maxsize=64)
def alias_factors(n: int, f: int, max_factor: int = 4096
                  ) -> Tuple[int, int] | None:
    """Balanced ``n = n1 * n2`` with ``f | n2`` (both <= max_factor).

    In the permuted layout ``[k1, k2]`` (bin ``k1 + n1*k2``), splitting
    the k2 axis as ``[f, n2/f]`` puts the aliasing-block index
    ``j = k // (n/f)`` on its own axis: bin ``k1 + n1*(j*(n2/f) + q)``
    = ``(k1 + n1*q) + j*(n/f)``.  The subsample-by-f data-consistency
    operator of the IST loop then becomes a mean over that axis, with
    ``m = k1 + n1*q`` exactly the (n1, n2/f)-permuted layout of the
    observation's (n/f)-point spectrum — no natural bin order needed
    anywhere (ops/spectral.ist_upscale fold-domain path)."""
    if f < 1 or n % f:
        return None
    i = int(math.isqrt(n))
    while i >= 2:
        if n % i == 0:
            j = n // i
            if j > max_factor:
                return None        # j only grows as i shrinks
            if i <= max_factor:
                if j % f == 0:
                    return (i, j)
                if i % f == 0:
                    return (j, i)  # swapped pair puts f on the n2 side
        i -= 1
    return None


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _dft_matmul(xr, xi, n, conj=False):
    """Direct DFT along the last axis via one matmul pair."""
    c, s = _dft_mats(n)
    cm = jnp.asarray(c)
    sm = jnp.asarray(-s if conj else s)
    prec = jax.lax.Precision.HIGHEST
    yr = jnp.matmul(xr, cm, precision=prec) - jnp.matmul(xi, sm, precision=prec)
    yi = jnp.matmul(xr, sm, precision=prec) + jnp.matmul(xi, cm, precision=prec)
    return yr, yi


def fft_mm(xr: jnp.ndarray, xi: jnp.ndarray, inverse: bool = False
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Complex FFT along the last axis (power-of-2 length) via matmuls.

    ``[..., N] x 2 -> [..., N] x 2``.  ``inverse=True`` computes the
    unscaled inverse (conjugate transform); divide by N for ifft.
    """
    n = xr.shape[-1]
    if n <= 4096:
        return _dft_matmul(xr, xi, n, conj=inverse)
    n1, n2 = _split_factor(n)
    lead = xr.shape[:-1]
    # x[n1*N2 + n2] -> view [..., N1, N2]; DFT over n1 (axis -2) first
    xr2 = xr.reshape(lead + (n1, n2))
    xi2 = xi.reshape(lead + (n1, n2))
    # column transform: move N1 last
    cr, ci = fft_mm(jnp.swapaxes(xr2, -1, -2), jnp.swapaxes(xi2, -1, -2),
                    inverse=inverse)
    cr = jnp.swapaxes(cr, -1, -2)  # [..., K1, N2]
    ci = jnp.swapaxes(ci, -1, -2)
    tw_r, tw_i = _twiddles(n1, n2)
    tw_r = jnp.asarray(tw_r)
    tw_i = jnp.asarray(-tw_i if inverse else tw_i)
    cr, ci = _cmul(cr, ci, tw_r, tw_i)
    # row transform over n2
    yr, yi = fft_mm(cr, ci, inverse=inverse)      # [..., K1, K2]
    # X[k2*N1 + k1] = Y[k1, k2] -> transpose then flatten
    yr = jnp.swapaxes(yr, -1, -2).reshape(lead + (n,))
    yi = jnp.swapaxes(yi, -1, -2).reshape(lead + (n,))
    return yr, yi


def _contract_m2(xr, xi, cm, sm):
    """Complex contraction over the SECOND-TO-LAST axis without any
    materialized transpose: ``x [..., n, k] (x) M [n, m] -> [..., k, m]``
    (dot_general orders output as lhs-free dims then rhs-free dims).
    """
    def dg(a, b):
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((a.ndim - 2,), (0,)), ((), ())),
            precision=None)
    yr = dg(xr, cm) - dg(xi, sm)
    yi = dg(xr, sm) + dg(xi, cm)
    return yr, yi


def permuted_fft_bases(n: int, factors: Tuple[int, int] | None = None) -> dict:
    """All six basis arrays for an ``(rfft_permuted, irfft_permuted)``
    pair, built once.  Pass the result as ``bases=`` when the transform
    sits inside a ``lax`` loop body: closure capture turns them into
    loop invariants, so the iota+cos construction runs once per program
    instead of once per iteration."""
    n1, n2 = factors or balanced_factors(n) or _split_factor(n)
    c1, s1 = _dft_mats(n1)
    c2, s2 = _dft_mats(n2)
    twr, twi = _twiddles(n1, n2)
    twr_t, twi_t = _twiddles_t(n1, n2)
    return {"factors": (n1, n2), "c1": c1, "s1": s1, "c2": c2, "s2": s2,
            "twr": twr, "twi": twi, "twr_t": twr_t, "twi_t": twi_t}


def rfft_permuted(x: jnp.ndarray, factors: Tuple[int, int] | None = None,
                  bases: dict | None = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[int, int]]:
    """Real-input FFT returning the spectrum in a PERMUTED block layout.

    Measured on v5e: the standard-order matmul FFT spends ~85% of its
    time in layout shuffles (even/odd packing, swapaxes, reverse
    gathers), not matmuls.  Iterative spectral algorithms whose
    per-bin operations are permutation-invariant (magnitude gating,
    global maxima — e.g. the Fat-Llama IST loop) don't need standard
    bin order, so this pair does Cooley-Tukey entirely with
    ``dot_general`` contractions and elementwise twiddles: ZERO
    gathers, ZERO transposes.

    Returns (re, im) shaped ``[..., n2, n1]`` — bin (k1, k2) lives at
    ``[..., n2_index=k2? — layout internal]`` — plus the factor pair.
    Use ONLY with ``irfft_permuted``.
    """
    n = x.shape[-1]
    if bases is None:
        bases = permuted_fft_bases(n, factors)
    n1, n2 = bases["factors"]
    assert n1 * n2 == n, (n1, n2, n)
    lead = x.shape[:-1]
    xv = x.reshape(lead + (n1, n2))
    c1, s1 = bases["c1"], bases["s1"]
    # contract over n1 (axis -2); real input -> 2 matmuls
    def dg(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((a.ndim - 2,), (0,)), ((), ())),
            precision=None)
    cr = dg(xv, c1)          # [..., n2, k1]
    ci = dg(xv, s1)
    # twiddle table is [k1, n2]; our layout is [..., n2, k1] -> use the
    # table built directly in [n2, k1] orientation
    cr, ci = _cmul(cr, ci, bases["twr_t"], bases["twi_t"])
    # contract over n2 (now axis -2): output [..., k1, k2]
    yr, yi = _contract_m2(cr, ci, bases["c2"], bases["s2"])
    return yr, yi, (n1, n2)


def irfft_permuted(yr: jnp.ndarray, yi: jnp.ndarray, n: int,
                   factors: Tuple[int, int] | None = None,
                   bases: dict | None = None) -> jnp.ndarray:
    """Inverse of ``rfft_permuted`` -> real ``[..., n]``.

    Conjugate transforms applied in reverse order, real part only on
    the final stage; same zero-shuffle property.  ``factors`` must
    match the forward call's.
    """
    if bases is None:
        bases = permuted_fft_bases(n, factors)
    n1, n2 = bases["factors"]
    assert n1 * n2 == n, (n1, n2, n)
    lead = yr.shape[:-2]
    c2, s2 = bases["c2"], bases["s2"]
    # inverse over k2 (axis -2 is k1; k2 is last) — contract last axis:
    def dg_last(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
            precision=None)
    # conj DFT: C - jS  => (ar + j ai)(C - jS): re = ar C + ai S ...
    ar = dg_last(yr, c2) + dg_last(yi, s2)        # [..., k1, n2]
    ai = dg_last(yi, c2) - dg_last(yr, s2)
    ar, ai = _cmul(ar, ai, bases["twr"], -bases["twi"])
    c1, s1 = bases["c1"], bases["s1"]
    # inverse over k1 (axis -2), REAL part only: re = ar C + ai S
    def dg_m2(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((a.ndim - 2,), (0,)), ((), ())),
            precision=None)
    xr = dg_m2(ar, c1) + dg_m2(ai, s1)            # [..., n2, n1]
    # forward consumed x.reshape(n1, n2) with n1 on axis -2; our result
    # is [..., n2(k? no: free), n1] — the free-dims ordering of the two
    # contractions round-trips to [..., n2, n1]; one transpose of the
    # OUTPUT is unavoidable here, but it fuses into the reshape epilogue.
    xr = jnp.swapaxes(xr, -1, -2).reshape(lead + (n,))
    return xr / n


def rfft_mm(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real-input FFT via the packed even/odd trick: one complex FFT of
    length N/2 + O(N) untangling.  Returns (re, im) of ``[..., N//2+1]``.
    """
    n = x.shape[-1]
    half = n // 2
    xe = x[..., 0::2]
    xo = x[..., 1::2]
    zr, zi = fft_mm(xe, xo)                                  # [..., half]
    # untangle: X[k] = (Z[k] + conj(Z[-k]))/2 - j/2 W^k (Z[k] - conj(Z[-k]))
    idx = (-jnp.arange(half)) % half
    zcr = jnp.take(zr, idx, axis=-1)
    zci = -jnp.take(zi, idx, axis=-1)
    er, ei = (zr + zcr) * 0.5, (zi + zci) * 0.5
    orr, ori = (zi - zci) * 0.5, -(zr - zcr) * 0.5           # -j/2 (Z - Zc)
    k = jax.lax.iota(jnp.float32, half)
    ang = k * jnp.float32(-2.0 * np.pi / n)
    wr, wi = jnp.cos(ang), jnp.sin(ang)
    tr, ti = _cmul(orr, ori, wr, wi)
    xr = er + tr                                             # k = 0..half-1
    xi = ei + ti
    # Nyquist bin: X[N/2] = E[0] - O[0]
    xr = jnp.concatenate([xr, er[..., 0:1] - orr[..., 0:1]], axis=-1)
    xi = jnp.concatenate([xi, ei[..., 0:1] - ori[..., 0:1]], axis=-1)
    return xr, xi


def irfft_mm(xr: jnp.ndarray, xi: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inverse of rfft_mm -> real ``[..., n]`` (n power of 2).

    Packed inverse: untangle the half-spectrum into even/odd parts and
    run ONE complex inverse FFT of length n/2 (half the cost of the
    conjugate-symmetric full-spectrum route).
    """
    half = n // 2
    # E[k] = (X[k] + conj(X[half-k]))/2 ; O[k] = (X[k]-conj(X[half-k]))/(2 W^k)
    idx = half - jnp.arange(half)
    xr_m = jnp.take(xr, idx, axis=-1)
    xi_m = jnp.take(xi, idx, axis=-1)
    xr_h = xr[..., :half]
    xi_h = xi[..., :half]
    er = 0.5 * (xr_h + xr_m)
    ei = 0.5 * (xi_h - xi_m)
    dr = 0.5 * (xr_h - xr_m)
    di = 0.5 * (xi_h + xi_m)
    k = jax.lax.iota(jnp.float32, half)
    ang = k * jnp.float32(2.0 * np.pi / n)  # conj(W^k) = e^{+j 2 pi k / n}
    wr = jnp.cos(ang)
    wi = jnp.sin(ang)
    orr, ori = _cmul(dr, di, wr, wi)
    # Z = E + j O ; z = IFFT_half(Z) ; x[2m] = Re z, x[2m+1] = Im z
    zr = er - ori
    zi = ei + orr
    br, bi = fft_mm(zr, zi, inverse=True)
    br = br / half
    bi = bi / half
    out = jnp.stack([br, bi], axis=-1)          # [..., half, 2]
    return out.reshape(out.shape[:-2] + (n,))
