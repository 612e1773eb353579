"""Adaptive VAD-driven wet/dry mixing — shared, implemented once.

The reference duplicates this machinery in its RNNoise node
(``egregora_audio_enhance_extras.py:207-256``) and DeepFilterNet node
(:560-604); here it is a single batched implementation (SURVEY.md §7
step 5 calls for exactly this de-duplication).

Semantics match the reference:
* VAD smoothing: 10 ms-frame EMA with ``alpha = exp(-10/smooth_ms)``
  seeded at probs[0] (ops/iir.ema_smooth).
* strength-per-frame modes (:221-243): off / more_on_noise /
  more_on_speech / gate_on_noise.
* gains (:245-256): equal-power (sin/cos) or linear crossfade.
* per-frame strengths expand to per-sample via 480-sample repeat.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from .iir import ema_smooth


def strength_per_frame(base_s: float, vad_smooth: jnp.ndarray, adaptive_mode: str,
                       adaptive_amount: float, vad_threshold: float) -> jnp.ndarray:
    s0 = jnp.float32(base_s)
    a = jnp.float32(adaptive_amount)
    v = jnp.clip(vad_smooth, 0.0, 1.0)
    if adaptive_mode == "more_on_noise":
        s_eff = s0 + a * (1.0 - v) * (1.0 - s0)
    elif adaptive_mode == "more_on_speech":
        s_eff = s0 + a * v * (1.0 - s0)
    elif adaptive_mode == "gate_on_noise":
        s_noise = s0 + a * (1.0 - s0)
        s_speech = s0 * (1.0 - a)
        s_eff = jnp.where(v < vad_threshold, s_noise, s_speech)
    else:  # "off" or unknown
        s_eff = jnp.full_like(v, s0)
    return jnp.clip(s_eff, 0.0, 1.0).astype(jnp.float32)


def gains_from_strength(s_eff: jnp.ndarray, curve: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    s = jnp.clip(s_eff, 0.0, 1.0)
    if curve == "equal_power":
        g_wet = jnp.sin(0.5 * jnp.pi * s)
        g_dry = jnp.cos(0.5 * jnp.pi * s)
    else:
        g_wet = s
        g_dry = 1.0 - s
    return g_dry.astype(jnp.float32), g_wet.astype(jnp.float32)


def rms_vad_probs(x48: jnp.ndarray, hop: int = 480) -> jnp.ndarray:
    """Energy-proxy VAD on 10 ms frames, p95-normalized (reference DFN
    node ``_vad_probs_rms_48k``, :548-558).  Includes the ragged tail
    frame (ceil division), like the reference loop."""
    n = x48.shape[-1]
    n_frames = -(-n // hop)
    pad = n_frames * hop - n
    xp = jnp.pad(x48, [(0, 0)] * (x48.ndim - 1) + [(0, pad)])
    fr = xp.reshape(xp.shape[:-1] + (n_frames, hop))
    # reference computes mean over the *full* frame only for complete
    # frames; its last partial frame divides by its true length. With
    # zero-padding, rescale the tail frame's mean-square accordingly.
    ms = jnp.mean(jnp.square(fr), axis=-1)
    if pad:
        tail_scale = hop / float(hop - pad)
        ms = ms.at[..., -1].multiply(tail_scale)
    rms = jnp.sqrt(ms)
    p95 = jnp.percentile(rms, 95.0, method="linear")
    p95 = jnp.where(p95 <= 0.0, 1e-6, p95)
    return jnp.clip(rms / p95, 0.0, 1.0).astype(jnp.float32)


def adaptive_mix(dry: jnp.ndarray, wet: jnp.ndarray, vad_probs: Optional[jnp.ndarray],
                 *, strength: float, mix_curve: str, adaptive_mode: str,
                 adaptive_amount: float, vad_threshold: float, vad_smooth_ms: float,
                 frame_hop: int = 480) -> jnp.ndarray:
    """Blend dry/wet 1-D signals with per-sample adaptive gains.

    ``vad_probs`` is per-10 ms-frame (None => constant strength, the
    reference's fallback behavior when no probs exist, :224).
    """
    n = dry.shape[-1]
    if vad_probs is None:
        s_per = jnp.full((n,), jnp.float32(strength))
        if adaptive_mode != "off":
            pass  # reference: adaptive becomes effectively 'off' without probs
    else:
        v = ema_smooth(vad_probs, vad_smooth_ms)
        s_eff = strength_per_frame(strength, v, adaptive_mode, adaptive_amount,
                                   vad_threshold)
        s_per = jnp.repeat(s_eff, frame_hop)[:n]
        if s_per.shape[0] < n:
            s_per = jnp.pad(s_per, (0, n - s_per.shape[0]),
                            constant_values=float(strength))
    g_dry, g_wet = gains_from_strength(s_per, mix_curve)
    return jnp.clip(g_dry * dry + g_wet * wet, -1.0, 1.0)


def post_gain_limit(y: jnp.ndarray, post_gain_db: float, limit_ceiling: bool,
                    ceiling: float) -> jnp.ndarray:
    """Post-gain + peak-ceiling limiter + clamp (reference :336-346)."""
    if post_gain_db != 0.0:
        y = y * jnp.float32(10.0 ** (post_gain_db / 20.0))
    if limit_ceiling:
        peak = jnp.max(jnp.abs(y))
        scale = jnp.where((peak > ceiling) & (peak > 0), ceiling / peak, 1.0)
        y = y * scale
    return jnp.clip(y, -1.0, 1.0)
