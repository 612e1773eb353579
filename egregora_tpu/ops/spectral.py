"""Iterative spectral enhancement ("Fat Llama"-equivalent) — XLA FFT loop.

The reference delegates this workload to the ``fat_llama`` (CuPy/cuFFT)
and ``fat_llama_fftw`` (FFTW) packages through a file-based API
(``egregora_fat_llama_gpu.py:161-224``, ``egregora_fat_llama_cpu.py:77-134``),
which the reference only pins by its knobs (max_iterations,
threshold_value, target_bitrate_kbps, toggle_normalize,
toggle_autoscale) and its output-scaling behavior.  Here the algorithm
is defined precisely and runs as ONE array-in/array-out XLA program —
no temp-file round trips, one implementation for TPU and CPU backends
(replacing the reference's GPU/CPU node split).

Algorithm — iterative soft-thresholding (IST) sparse spectral recovery:

1. The input at rate ``sr`` is treated as a subsampled measurement of a
   signal at ``sr * factor`` where ``factor = round(target_bitrate_kbps
   / source_bitrate_kbps)`` (source bitrate assumes 16-bit PCM, the
   reference packages' convention).
2. The iterate is initialized with a polyphase lowpass interpolation of
   the observations (regular subsampling aliases coherently, so a
   zero-stuffed init leaves IST at a symmetric fixed point — the
   interpolated init breaks the image/true-peak tie, as the reference
   packages' scipy-interpolate preprocessing does).
3. Iterative hard-thresholding (IHT) steps with the subsampling
   operator A:
   ``z = x  with known sample positions clamped to the observations``
   (the gradient step ``x + A^T(y - A x)`` for a subsampling A),
   ``X = rfft(z) * (|rfft(z)| >= tau)`` with ``tau = threshold_value *
   max|X|`` — a magnitude *gate*, which (unlike soft shrinkage) leaves
   surviving peaks unbiased so tonal content keeps its amplitude,
   ``x = irfft(X)``.
   Strong spectral peaks survive and are extrapolated into the new band
   ("fattening"); weak content and imaging noise are gated away.
4. Post passes fused into the same program: ``normalize`` (peak-protect
   to <= ``peak_ceiling``) and ``autoscale`` (match output RMS to input
   RMS), mirroring the reference's always-on normalization node policy
   (gpu node :212, :232-233) and its write-patch rescale
   (gpu node :188-208).

Each iteration costs 2 real FFTs — this is the benchmark workload for
the driver's "Fat Llama FFT iters/s" metric (BASELINE.json configs[0]).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .fft import (alias_factors, balanced_factors, irfft_permuted,
                  permuted_fft_bases, rfft_permuted)
from .resample import resample_poly


def source_bitrate_kbps(sr: int, channels: int, bit_depth: int = 16) -> float:
    return sr * bit_depth * channels / 1000.0


def upscale_factor(sr: int, channels: int, target_bitrate_kbps: int,
                   bit_depth: int = 16) -> int:
    """Integer rate multiplier implied by the target bitrate (>= 1)."""
    src = source_bitrate_kbps(sr, channels, bit_depth)
    return max(1, int(round(target_bitrate_kbps / src)))


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m <<= 1
    return m


@functools.partial(jax.jit, static_argnames=("factor", "max_iterations",
                                             "use_matmul_fft"))
def ist_upscale(x_cs: jnp.ndarray, factor: int, max_iterations: int,
                threshold_value: jnp.ndarray | float,
                use_matmul_fft: bool = False) -> jnp.ndarray:
    """IST spectral recovery of ``[C, S]`` onto a ``factor``-times grid.

    Returns ``[C, S * factor]`` float32.  ``threshold_value`` may be a
    traced scalar; ``factor``/``max_iterations`` are static.

    ``use_matmul_fft`` selects the MXU Cooley-Tukey transform
    (ops/fft.py) — ~5x the throughput of XLA's native TPU FFT on long
    signals; the node layer enables it automatically on TPU backends.
    """
    c, s = x_cs.shape
    n_up = s * factor
    # transform exactly n_up when it factors into two <=4096 radices
    # (mixed-radix matmul FFT) — pow2 padding costs up to ~45% extra
    n_fft = n_up if balanced_factors(n_up) else _next_pow2(n_up)

    y_obs = x_cs.astype(jnp.float32)

    def clamp_observed(x):
        """x[:, k*factor] = y_obs[:, k] as a reshape + slice update —
        a regular strided scatter lowers poorly on TPU; this is a
        dynamic-update-slice on a [C, S, factor] view instead."""
        head = x[:, :n_up].reshape(c, s, factor)
        head = head.at[:, :, 0].set(y_obs)
        return jnp.concatenate([head.reshape(c, n_up), x[:, n_up:]], axis=-1)

    # lowpass-interpolated init (see module docstring, step 2)
    interp = resample_poly(y_obs, 1, factor) if factor > 1 else y_obs
    x0 = jnp.zeros((c, n_fft), jnp.float32).at[:, :n_up].set(interp[:, :n_up])
    thr = jnp.float32(threshold_value)

    def gate(re, im):
        mag2 = re * re + im * im
        # reduce over every spectral axis (the permuted layout is 2-D
        # per channel), keep the leading channel axis
        axes = tuple(range(1, mag2.ndim))
        tau2 = jnp.square(thr) * jnp.max(mag2, axis=axes, keepdims=True)
        keep = mag2 >= tau2
        return re * keep, im * keep

    fa = (alias_factors(n_up, factor)
          if use_matmul_fft and factor > 1 and n_fft == n_up else None)
    if fa is not None:
        # FOLD-DOMAIN loop: for a regular subsample-by-f operator A the
        # data-consistency step is pure aliasing algebra in the DFT
        # domain — (A z)^[m] = (1/f) sum_j Z[m + j*(N/f)] and zero-stuff
        # U replicates the observation spectrum — so the WHOLE loop runs
        # on the spectrum with NO per-iteration FFTs: two endpoint
        # transforms + O(N) fold/gate per iteration (was 2 FFTs/iter).
        # In the permuted layout with f | n2 the j blocks sit on their
        # own axis (ops/fft.alias_factors) and the observation spectrum
        # in (n1, n2/f)-permuted layout aligns bin-for-bin with m.
        n1, n2 = fa
        n2f = n2 // factor
        zr, zi, _ = rfft_permuted(x0, factors=(n1, n2))       # [C, n1, n2]
        zr = zr.reshape(c, n1, factor, n2f)
        zi = zi.reshape(c, n1, factor, n2f)
        yr, yi, _ = rfft_permuted(y_obs, factors=(n1, n2f))   # [C, n1, n2f]

        def body(_, zs):
            zr, zi = zs
            # clamp_observed in the fold domain
            zr = zr + (yr - jnp.mean(zr, axis=2))[:, :, None, :]
            zi = zi + (yi - jnp.mean(zi, axis=2))[:, :, None, :]
            return gate(zr, zi)

        zr, zi = jax.lax.fori_loop(0, max_iterations, body, (zr, zi))
        x = irfft_permuted(zr.reshape(c, n1, n2), zi.reshape(c, n1, n2),
                           n_fft, factors=(n1, n2)).astype(jnp.float32)
        return clamp_observed(x)[:, :n_up]

    if use_matmul_fft:
        # permuted-spectrum MXU transform: magnitude gating is
        # permutation-invariant, so bin order never needs fixing up
        # (see ops/fft.rfft_permuted).  Bases are built OUTSIDE the
        # loop body: the traced iota+cos construction (ops/fft) must be
        # a loop invariant, not a per-iteration recompute.
        bases = permuted_fft_bases(n_fft)

        def body(_, x):
            z = clamp_observed(x)
            re, im, _ = rfft_permuted(z, bases=bases)
            re, im = gate(re, im)
            return irfft_permuted(re, im, n_fft,
                                  bases=bases).astype(jnp.float32)
    else:
        def body(_, x):
            z = clamp_observed(x)
            spec = jnp.fft.rfft(z, axis=-1)
            re, im = gate(spec.real, spec.imag)
            return jnp.fft.irfft(re + 1j * im, n=n_fft, axis=-1).astype(jnp.float32)

    x = jax.lax.fori_loop(0, max_iterations, body, x0)
    # final data consistency, then crop padding
    return clamp_observed(x)[:, :n_up]


@functools.partial(jax.jit, static_argnames=("factor", "max_iterations",
                                             "toggle_normalize", "toggle_autoscale",
                                             "use_matmul_fft"))
def spectral_enhance(x_cs: jnp.ndarray, factor: int, max_iterations: int,
                     threshold_value: float, toggle_normalize: bool = True,
                     toggle_autoscale: bool = True,
                     peak_ceiling: float = 0.99,
                     use_matmul_fft: bool = False) -> jnp.ndarray:
    """Full enhance pass: IST upscale + fused normalize/autoscale.

    Mirrors the reference node contract (gpu node :234-250): returns
    ``[C, S*factor]`` at ``sr*factor``; callers resample/deliver.
    """
    in_rms = jnp.sqrt(jnp.mean(jnp.square(x_cs)) + 1e-20)
    y = ist_upscale(x_cs, factor, max_iterations, threshold_value,
                    use_matmul_fft=use_matmul_fft)
    if toggle_autoscale:
        out_rms = jnp.sqrt(jnp.mean(jnp.square(y)) + 1e-20)
        y = y * (in_rms / out_rms)
    if toggle_normalize:
        peak = jnp.max(jnp.abs(y))
        scale = jnp.where(peak > peak_ceiling, peak_ceiling / (peak + 1e-20), 1.0)
        y = y * scale
    return y.astype(jnp.float32)
