"""GCC-PHAT alignment + fractional delay — on-device.

Reference semantics: ``_xcorr_delay`` / ``_apply_frac_delay_CN`` in
``egregora_null_test_suite.py:213-265``.  The FFT cross-correlation,
PHAT whitening, windowed argmax, and parabolic sub-sample refinement
are reproduced exactly; the integer+fractional delay application keeps
the reference's quirk that the fractional FIR always applies a
*positive* sub-sample delay (the reference takes ``frac = abs(d) -
floor(abs(d))`` and never negates it — :244-246), so outputs match
bit-for-bit semantics rather than an idealized resampler.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import hann_symmetric


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m <<= 1
    return m


def _gcc_phat(a: jnp.ndarray, b: jnp.ndarray, max_shift: int,
              bias_fix: bool):
    """Shared GCC-PHAT core: (refined delay, windowed correlation
    surface ``[2*max_shift+1]`` centered on lag 0)."""
    n = _next_pow2(a.shape[0] + b.shape[0])
    fa = jnp.fft.rfft(a, n=n)
    fb = jnp.fft.rfft(b, n=n)
    r = fb * jnp.conj(fa)
    r = r / (jnp.abs(r) + 1e-12)
    cc = jnp.fft.irfft(r, n=n)
    # reference rearrangement: concat(cc[-(n//2-1):], cc[:n//2+1]) -> length n
    cc = jnp.concatenate([cc[-(n // 2 - 1):], cc[: n // 2 + 1]])
    center = cc.shape[0] // 2
    lo = center - int(max_shift)
    hi = center + int(max_shift) + 1
    w = jax.lax.dynamic_slice(cc, (lo,), (hi - lo,))
    k = jnp.argmax(w)
    idx = lo + k

    y0 = cc[jnp.clip(idx - 1, 0, cc.shape[0] - 1)]
    y1 = cc[idx]
    y2 = cc[jnp.clip(idx + 1, 0, cc.shape[0] - 1)]
    denom = 2.0 * (y0 - 2.0 * y1 + y2)
    frac = jnp.where((idx >= 1) & (idx < cc.shape[0] - 1) & (jnp.abs(denom) >= 1e-12),
                     (y0 - y2) / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom),
                     0.0)
    d = (idx - center).astype(jnp.float32) + frac.astype(jnp.float32)
    return (d + 1.0 if bias_fix else d), w


@functools.partial(jax.jit, static_argnames=("max_shift", "bias_fix"))
def xcorr_delay(a: jnp.ndarray, b: jnp.ndarray, max_shift: int,
                bias_fix: bool = False) -> jnp.ndarray:
    """GCC-PHAT coarse delay + parabolic refine; >0 means b lags a.

    ``a``/``b`` are mono, equal length (the node truncates).  ``max_shift``
    is static.  Mirrors reference :213-237 bit-for-bit, INCLUDING its
    rearrangement bias: ``concat(cc[-(n//2-1):], cc[:n//2+1])`` places lag
    L at index ``L + n//2 - 1`` but the reference reads the center as
    ``n//2``, so reported delays are one sample low.  ``bias_fix=True``
    corrects that (+1); default False for exact reference parity.
    """
    return _gcc_phat(a, b, max_shift, bias_fix)[0]


@functools.partial(jax.jit, static_argnames=("max_shift", "bias_fix"))
def xcorr_delay_curve(a: jnp.ndarray, b: jnp.ndarray, max_shift: int,
                      bias_fix: bool = False):
    """(delay, GCC-PHAT surface over lags [-max_shift, +max_shift]) —
    the surface feeds the align node's debug figure."""
    return _gcc_phat(a, b, max_shift, bias_fix)


@functools.partial(jax.jit, static_argnames=())
def peak_correlation(a: jnp.ndarray, b: jnp.ndarray,
                     lag: jnp.ndarray) -> jnp.ndarray:
    """Normalized waveform correlation of ``a`` and ``b`` advanced by
    ``lag`` (the delay ``xcorr_delay`` found; >0 means b lags a), over
    their overlapping region.

    This is the actual peak Pearson correlation in [-1, 1] — the
    reference returns a constant 0.0 for ``peak_corr`` (null suite
    :321), and the GCC-PHAT surface is whitened so its peak height is
    meaningless; this exceeds the reference by reporting the real
    quantity.
    """
    n = a.shape[0]
    li = jnp.round(lag).astype(jnp.int32)
    src = jnp.arange(n, dtype=jnp.int32) + li
    valid = (src >= 0) & (src < n)
    b_al = jnp.take(b, jnp.clip(src, 0, n - 1)) * valid
    a_m = a * valid
    num = jnp.sum(a_m * b_al)
    den = jnp.sqrt(jnp.sum(a_m * a_m) * jnp.sum(b_al * b_al) + 1e-20)
    return num / den


@functools.partial(jax.jit, static_argnames=("taps",))
def apply_frac_delay(x_cn: jnp.ndarray, delay_samples: jnp.ndarray,
                     taps: int = 64) -> jnp.ndarray:
    """Shift ``[C, N]`` by a (possibly fractional, possibly traced) delay.

    Positive delay shifts right (adds latency), zero-filled; the
    fractional part is a Hann-windowed-sinc FIR (default 64 taps,
    normalized), convolved 'same' — reference :240-265 including its
    always-positive-frac quirk.
    """
    c, n = x_cn.shape
    d = delay_samples.astype(jnp.float32)
    mag = jnp.abs(d)
    int_d = jnp.floor(mag).astype(jnp.int32)
    frac = mag - int_d.astype(jnp.float32)
    sign = jnp.where(d >= 0, 1, -1)

    # integer shift via gather: y[i] = x[i - sign*int_d] (zero outside)
    src = jnp.arange(n, dtype=jnp.int32) - sign * int_d
    valid = (src >= 0) & (src < n)
    y = jnp.take(x_cn, jnp.clip(src, 0, n - 1), axis=1) * valid[None, :]

    # fractional windowed-sinc FIR (length m, normalized)
    m = max(16, int(taps))
    taps_i = jnp.arange(m, dtype=jnp.float32)
    mid = (m - 1) / 2.0
    h = jnp.sinc(taps_i - mid - frac) * jnp.asarray(hann_symmetric(m))
    h = h / jnp.sum(h)

    pad_l = (m - 1) // 2
    pad_r = m - 1 - pad_l
    # np.convolve(y, h, mode='same') == correlate with reversed kernel,
    # centered; emulate with conv_general_dilated on flipped h.
    lhs = y[:, None, :]
    rhs = h[::-1][None, None, :]
    conv = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,),
        padding=[(pad_r, pad_l)],
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0, :]

    do_frac = frac > 1e-6
    no_shift = jnp.abs(d) < 1e-6
    out = jnp.where(no_shift, x_cn, jnp.where(do_frac, conv, y))
    return out.astype(jnp.float32)


def pad_or_crop(x_cn: jnp.ndarray, n: int) -> jnp.ndarray:
    """Static-length pad/crop to ``n`` samples (null suite :202-210)."""
    m = x_cn.shape[1]
    if m == n:
        return x_cn
    if m > n:
        return x_cn[:, :n]
    return jnp.pad(x_cn, ((0, 0), (0, n - m)))
