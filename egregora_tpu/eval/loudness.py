"""BS.1770-style loudness engine — batched XLA, no Python loops.

Numerical behavior matches the reference implementation
(``egregora_audio_eval_pack.py:128-214`` and its duplicate in the null
suite :125-164): the same K-weighting approximation (a practical
approximation, not certification-grade — reference :11-14), the same
400 ms / 100 ms momentary blocks with -0.691 offset and -10 LU relative
gate, the same 3 s / 1 s short-term series, the same LRA percentile
gating, and the same 4x-oversampled true peak.  The per-sample Python
IIR loop is replaced by an associative scan (ops/iir.py) and the
per-block Python loops by framed reductions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.iir import k_weight
from ..ops.resample import oversample as _oversample
from ..ops.stft import frame as _frame


def rms_db(x: jnp.ndarray) -> jnp.ndarray:
    """10*log10(mean(x^2) + 1e-20) — reference ``_rms_db``."""
    return 10.0 * jnp.log10(jnp.mean(jnp.square(x)) + 1e-20)


def _block_mean_squares(mono: jnp.ndarray, sr: int, window_s: float,
                        hop_s: float) -> jnp.ndarray:
    blk = max(1, int(round(window_s * sr)))
    hop = max(1, int(round(hop_s * sr)))
    n = mono.shape[-1]
    fr = _frame(mono, blk, hop)            # [frames, blk] (pads if N < blk)
    ms = jnp.mean(jnp.square(fr), axis=-1)
    if n < blk:
        # the reference averages only the real samples of a short signal
        # (seg = y[s:s+blk] is just N long); undo the zero-pad dilution
        ms = ms * (blk / float(max(n, 1)))
    return ms


@functools.partial(jax.jit, static_argnames=("sr",))
def integrated_lufs(samples_cn: jnp.ndarray, sr: int) -> jnp.ndarray:
    """Integrated loudness with -10 LU relative gating (reference :153-174)."""
    y = k_weight(sr, samples_cn)
    mono = jnp.mean(y, axis=0)
    ms = _block_mean_squares(mono, sr, 0.400, 0.100) + 1e-20
    lufs_ungated = -0.691 + 10.0 * jnp.log10(jnp.mean(ms))
    gate = lufs_ungated - 10.0
    mask = (-0.691 + 10.0 * jnp.log10(ms)) >= gate
    any_pass = jnp.any(mask)
    w = jnp.where(any_pass, mask.astype(ms.dtype), jnp.ones_like(ms))
    gated_mean = jnp.sum(ms * w) / jnp.sum(w)
    return -0.691 + 10.0 * jnp.log10(gated_mean)


@functools.partial(jax.jit, static_argnames=("sr", "window_s", "hop_s"))
def lufs_series(samples_cn: jnp.ndarray, sr: int, window_s: float,
                hop_s: float) -> jnp.ndarray:
    """Momentary/short-term loudness series (reference :177-188)."""
    y = jnp.mean(k_weight(sr, samples_cn), axis=0)
    ms = _block_mean_squares(y, sr, window_s, hop_s)
    return (-0.691 + 10.0 * jnp.log10(ms + 1e-20)).astype(jnp.float32)


def _percentile(x: jnp.ndarray, q: float) -> jnp.ndarray:
    return jnp.percentile(x, q, method="linear")


def _masked_percentile(x: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """Percentile of ``x[mask]`` with linear interpolation, static shapes."""
    big = jnp.finfo(x.dtype).max
    xs = jnp.sort(jnp.where(mask, x, big))
    n = jnp.sum(mask.astype(jnp.int32))
    pos = (q / 100.0) * (n.astype(x.dtype) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, x.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, jnp.maximum(n - 1, 0))
    frac = pos - lo.astype(x.dtype)
    return xs[lo] * (1.0 - frac) + xs[hi] * frac


@functools.partial(jax.jit, static_argnames=("sr",))
def lra_short_term(samples_cn: jnp.ndarray, sr: int) -> jnp.ndarray:
    """Loudness range from the 3 s / 1 s short-term series with the
    reference's percentile gating (reference :191-200): drop values at or
    below ``p10(st) - 20``; if nothing survives use the full series.
    """
    st = lufs_series(samples_cn, sr, 3.0, 1.0)
    gate = _percentile(st, 10.0) - 20.0
    mask = st > gate
    use_all = ~jnp.any(mask)
    m = jnp.where(use_all, jnp.ones_like(mask), mask)
    return _masked_percentile(st, m, 95.0) - _masked_percentile(st, m, 10.0)


@functools.partial(jax.jit, static_argnames=("sr", "oversample"))
def true_peak_dbfs(samples_cn: jnp.ndarray, sr: int, oversample: int = 4) -> jnp.ndarray:
    """Oversampled true peak of the channel-mean signal (reference :203-214)."""
    x = jnp.mean(samples_cn, axis=0)
    y = _oversample(x, int(oversample))
    peak = jnp.max(jnp.abs(y))
    return 20.0 * jnp.log10(peak + 1e-20)


@functools.partial(jax.jit, static_argnames=("sr", "compute_true_peak", "oversample"))
def loudness_report(samples_cn: jnp.ndarray, sr: int, compute_true_peak: bool = True,
                    oversample: int = 4):
    """One fused pass producing every Loudness Meter output (eval pack :324-333)."""
    out = {
        "lufs_integrated": integrated_lufs(samples_cn, sr),
        "lufs_momentary": jnp.mean(lufs_series(samples_cn, sr, 0.400, 0.100)),
        "lufs_short_term": jnp.mean(lufs_series(samples_cn, sr, 3.0, 1.0)),
        "lra": lra_short_term(samples_cn, sr),
    }
    if compute_true_peak:
        out["true_peak_dbfs"] = true_peak_dbfs(samples_cn, sr, oversample)
    return out
