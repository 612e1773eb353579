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


def _first_order_recurrence(f: jnp.ndarray, p: float, block: int = 1024) -> jnp.ndarray:
    """``y[n] = f[n] + p y[n-1]``, y[-1] = 0, along the last axis.

    Blocked hybrid scan: within each ``block`` the recurrence runs as an
    associative scan (parallel, VPU-friendly); block boundary states are
    carried exactly by a short sequential ``lax.scan`` with f64-exact
    precomputed pole powers.  A single full-length f32 associative scan
    reassociates ~5e4 terms and loses ~4e-2 absolute for poles within
    1e-3 of +1 (measured); blocking bounds the reassociation error to
    the block length (~1e-5) at a cost of T/block sequential steps.
    """
    import numpy as _np

    t = f.shape[-1]
    nb = -(-t // block)
    fp = jnp.pad(f, [(0, 0)] * (f.ndim - 1) + [(0, nb * block - t)])
    fb = fp.reshape(f.shape[:-1] + (nb, block))
    a = jnp.full_like(fb, jnp.float32(p))

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    _, yfree = jax.lax.associative_scan(combine, (a, fb), axis=-1)

    pows = jnp.asarray((float(p) ** _np.arange(1, block + 1)).astype(_np.float32))

    def body(y0, yfree_blk):
        yb = yfree_blk + pows * y0[..., None]
        return yb[..., -1], yb

    _, ys = jax.lax.scan(body, jnp.zeros(f.shape[:-1], jnp.float32),
                         jnp.moveaxis(yfree, -2, 0))
    return jnp.moveaxis(ys, 0, -2).reshape(fp.shape)[..., :t]


def biquad(x: jnp.ndarray, b: tuple, a: tuple) -> jnp.ndarray:
    """Direct-form biquad along the last axis, zero initial state:

    ``y[n] = x[n] + b0 x[n-1] + b1 x[n-2] - a0 y[n-1] - a1 y[n-2]``

    (RNNoise's ``biquad()`` convention: leading coefficient 1, two
    feed-forward and two feedback taps).  Requires the denominator to
    have REAL poles (true for RNNoise's DC high-pass).  Runs as a
    cascade of two first-order sections, each a blocked associative
    scan: a single 2x2 matrix scan is numerically hopeless in f32 when
    both poles sit within 1e-2 of +1 (measured 3e-2 error over 500
    samples).  Residual f32 factorization error concentrates in the
    filter's own stopband (<50 Hz: ~0.5 rel; 200 Hz+: <3e-3; 1 kHz+:
    <5e-5) — irrelevant for a DC blocker, measured vs an f64 reference.
    """
    import numpy as _np

    roots = _np.roots([1.0, float(a[0]), float(a[1])])
    if _np.iscomplexobj(roots) and _np.abs(roots.imag).max() > 1e-9:
        raise ValueError("biquad: complex poles not supported (use two calls)")
    p1, p2 = (float(r.real) for r in roots)

    # numerator is a plain FIR — apply exactly (RNNoise's has COMPLEX
    # zeros; factoring it into real sections would corrupt the filter)
    x = x.astype(jnp.float32)
    xm1 = jnp.roll(x, 1, axis=-1).at[..., 0].set(0.0)
    xm2 = jnp.roll(x, 2, axis=-1).at[..., :2].set(0.0)
    f = x + jnp.float32(b[0]) * xm1 + jnp.float32(b[1]) * xm2

    return _first_order_recurrence(_first_order_recurrence(f, p1), p2)


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
