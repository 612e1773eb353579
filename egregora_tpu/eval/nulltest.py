"""Gain match + null test engines — fused on-device passes.

Reference semantics: ``Audio_Gain_Match.execute``
(``egregora_null_test_suite.py:362-385`` / eval pack :358-382) and
``Audio_Null_Test.execute`` (null suite :420-470).  These are the
compute cores; the node layer handles coercion/resampling and composes
them with alignment for ``Null_Test_Full`` (null suite :616-657).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .loudness import integrated_lufs, rms_db
from .metrics import band_energy_hi_db, corr_coef, lsd
from ..ops.stft import stft_mag


@functools.partial(jax.jit, static_argnames=("sr", "mode", "max_gain_db"))
def gain_match(ref_cn: jnp.ndarray, in_cn: jnp.ndarray, sr: int,
               mode: str = "LUFS-I", max_gain_db: float = 12.0
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Match ``in`` level to ``ref`` by LUFS-I or RMS, gain clamped to
    +-|max_gain_db|.  Returns (matched, gain_db, ref_level, in_level).
    """
    if str(mode).upper().startswith("LUFS"):
        ref_level = integrated_lufs(ref_cn, sr)
        in_level = integrated_lufs(in_cn, sr)
    else:
        ref_level = rms_db(jnp.mean(ref_cn, axis=0))
        in_level = rms_db(jnp.mean(in_cn, axis=0))
    lim = abs(float(max_gain_db))
    gain_db = jnp.clip(ref_level - in_level, -lim, lim)
    gain = jnp.power(10.0, gain_db / 20.0)
    return (in_cn * gain).astype(jnp.float32), gain_db, ref_level, in_level


@functools.partial(jax.jit, static_argnames=(
    "sr", "invert_b", "least_squares_scale", "compute_corr", "compute_null_rms",
    "compute_null_lufs", "compute_lsd", "compute_hf_residual", "n_fft", "hop",
    "hf_band_hz"))
def null_test(a_cn: jnp.ndarray, b_cn: jnp.ndarray, sr: int, *,
              invert_b: bool = True, least_squares_scale: bool = False,
              compute_corr: bool = True, compute_null_rms: bool = True,
              compute_null_lufs: bool = True, compute_lsd: bool = True,
              compute_hf_residual: bool = False, n_fft: int = 2048,
              hop: int = 512, hf_band_hz: int = 8000
              ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Null = A + (-B), with optional least-squares scale ``k = <a,b>/<b,b>``
    on the channel means, plus the reference's metric set (null suite
    :420-470).  Inputs must be same-sr, length-matched [C, N].
    """
    k = jnp.float32(1.0)
    if least_squares_scale:
        a_m64 = jnp.mean(a_cn, axis=0)
        b_m64 = jnp.mean(b_cn, axis=0)
        k = jnp.vdot(a_m64, b_m64) / (jnp.vdot(b_m64, b_m64) + 1e-20)
        b_cn = (b_cn * k).astype(jnp.float32)
    b_signed = -b_cn if invert_b else b_cn
    null = (a_cn + b_signed).astype(jnp.float32)

    metrics: Dict[str, jnp.ndarray] = {}
    a_m = jnp.mean(a_cn, axis=0)
    b_m = jnp.mean(-b_signed, axis=0)  # reference: b_m = (-B).mean after inversion

    if compute_corr:
        metrics["corr_coef"] = corr_coef(a_m, b_m)
    if compute_null_rms:
        metrics["null_rms_dbfs"] = rms_db(jnp.mean(null, axis=0))
    if compute_null_lufs:
        metrics["null_lufs"] = integrated_lufs(null, sr)
    if compute_lsd:
        sa = stft_mag(a_m, n_fft, hop)
        sb = stft_mag(b_m, n_fft, hop)
        m, p95 = lsd(sa, sb)
        metrics["lsd_mean_db"] = m
        metrics["lsd_p95_db"] = p95
    if compute_hf_residual:
        metrics["hf_residual_db"] = band_energy_hi_db(null, sr, float(hf_band_hz))
    overs = jnp.sum(jnp.abs(null) > 1.0)
    metrics["overshoot_count"] = overs
    metrics["clipped_pct"] = 100.0 * overs / null.size
    metrics["scale_k"] = k
    return null, metrics
