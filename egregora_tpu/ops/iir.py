"""First-order IIR filters as parallel scans (K-weighting front-end).

The reference computes its BS.1770-style K-weighting with a per-sample
Python loop over the whole signal (``egregora_audio_eval_pack.py:132-151``
— its single hottest interpreted loop, O(C*N) Python bytecodes).  The
recurrence ``z[n] = (1-k)*x[n] + k*z[n-1]`` is a first-order linear
recurrence, which maps onto ``jax.lax.associative_scan`` — O(N) work at
O(log N) depth, fully vectorized on the VPU — instead of a sequential
loop.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def first_order_lowpass(x: jnp.ndarray, k: float) -> jnp.ndarray:
    """``z[n] = (1-k) x[n] + k z[n-1]`` along the last axis, z[-1] = 0.

    Uses an associative scan over (decay, value) pairs:
    combining (a1,b1) then (a2,b2) gives (a1*a2, a2*b1 + b2).
    """
    k = jnp.float32(k)
    a = jnp.full_like(x, k)
    b = (1.0 - k) * x

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    _, z = jax.lax.associative_scan(combine, (a, b), axis=-1)
    return z


def k_weight(sr: int, x_cn: jnp.ndarray) -> jnp.ndarray:
    """K-weighting approximation, numerically matching the reference
    ``_k_weight`` (eval pack :132-151): 1st-order ~60 Hz high-pass
    (x - lowpass(x)) plus a 0.02 first-difference HF tilt.

    On TPU backends the recurrence runs as the single-HBM-pass Pallas
    kernel (ops/pallas_iir.py, measured 2.5x the associative scan);
    elsewhere as ``lax.associative_scan``.
    """
    fc = 60.0 / (sr * 0.5)
    k = math.exp(-2.0 * math.pi * fc)
    x = x_cn.astype(jnp.float32)
    if jax.default_backend() != "cpu" and x.ndim == 2:
        from .pallas_iir import iir_lowpass_pallas
        z = iir_lowpass_pallas(x, k)
    else:
        z = first_order_lowpass(x, k)
    y = x - z
    # y[:,1:] += 0.02 * (y[:,1:] - y[:,:-1])
    tilt = y.at[..., 1:].add(0.02 * (y[..., 1:] - y[..., :-1]))
    return tilt.astype(jnp.float32)


def ema_smooth(probs: jnp.ndarray, smooth_ms: float, hop_ms: float = 10.0) -> jnp.ndarray:
    """Exponential smoothing of per-frame probabilities.

    Matches the reference VAD smoother (extras :207-219): seeded with
    probs[0], ``acc = alpha*acc + (1-alpha)*p`` per 10 ms frame.
    """
    if smooth_ms <= 0:
        return probs
    alpha = math.exp(-hop_ms / max(1e-3, float(smooth_ms)))
    # acc_0 = alpha*p0 + (1-alpha)*p0 = p0 after the first step in the
    # reference because acc is initialized to probs[0] *before* the loop.
    # Emulate by running the recurrence with init p0 on the same stream.
    a = jnp.full_like(probs, alpha)
    b = (1.0 - alpha) * probs
    # z[n] = alpha*z[n-1] + (1-alpha)*p[n], z[-1] = p[0]
    b = b.at[..., 0].add(alpha * probs[..., 0])

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    _, z = jax.lax.associative_scan(combine, (a, b), axis=-1)
    return z
