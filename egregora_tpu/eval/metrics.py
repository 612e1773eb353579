"""Objective metrics: SI-SDR and log-spectral distance — batched XLA.

Reference semantics: ``_si_sdr`` / ``_lsd`` / ``_stft_mag`` in
``egregora_audio_eval_pack.py:389-429`` (duplicated in the null suite
:167-189).  Both metrics operate on the channel-mean mono signal,
length-matched by truncation.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.stft import stft_mag


def si_sdr(s: jnp.ndarray, s_hat: jnp.ndarray) -> jnp.ndarray:
    """Scale-invariant SDR in dB of mono signals (reference :414-429).

    ``alpha = <s_hat, s>/<s, s>``; SDR = 10 log10(|alpha s|^2 / |s_hat - alpha s|^2).
    Inputs must already be mono and length-matched (the node layer does
    the mean/truncate, as the reference does at :456-459).
    """
    s = s.astype(jnp.float32)
    s_hat = s_hat.astype(jnp.float32)
    alpha = jnp.vdot(s_hat, s) / (jnp.vdot(s, s) + 1e-20)
    s_target = alpha * s
    e_noise = s_hat - s_target
    num = jnp.vdot(s_target, s_target) + 1e-20
    den = jnp.vdot(e_noise, e_noise) + 1e-20
    return 10.0 * jnp.log10(num / den)


def lsd(mag_a: jnp.ndarray, mag_b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Log-spectral distance (mean, p95 over frames) of ``[freqs, frames]``
    magnitude spectra (reference :405-411)."""
    eps = 1e-12
    la = 20.0 * jnp.log10(mag_a + eps)
    lb = 20.0 * jnp.log10(mag_b + eps)
    d = jnp.square(la - lb)
    per = jnp.sqrt(jnp.mean(d, axis=0) + 1e-12)
    return jnp.mean(per), jnp.percentile(per, 95.0, method="linear")


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "compute_lsd", "compute_si_sdr"))
def lsd_sisdr_report(a_mono: jnp.ndarray, b_mono: jnp.ndarray, n_fft: int = 2048,
                     hop: int = 512, compute_lsd: bool = True,
                     compute_si_sdr: bool = True):
    """Fused metrics pass matching the Metrics node (eval pack :453-470)."""
    out = {}
    if compute_lsd:
        sa = stft_mag(a_mono, n_fft, hop)
        sb = stft_mag(b_mono, n_fft, hop)
        m, p95 = lsd(sa, sb)
        out["lsd_mean_db"] = m
        out["lsd_p95_db"] = p95
    if compute_si_sdr:
        out["si_sdr_db"] = si_sdr(a_mono, b_mono)
    return out


def corr_coef(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean correlation coefficient (null suite :447-450)."""
    am = a - jnp.mean(a)
    bm = b - jnp.mean(b)
    return jnp.vdot(am, bm) / (jnp.linalg.norm(am) * jnp.linalg.norm(bm) + 1e-20)


def band_energy_hi_db(x_cn: jnp.ndarray, sr: int, lo_hz: float) -> jnp.ndarray:
    """Fraction of spectral energy above ``lo_hz`` in dB (null suite :192-199)."""
    mono = jnp.mean(x_cn, axis=0)
    spec = jnp.fft.rfft(mono)
    freqs = jnp.fft.rfftfreq(mono.shape[0], d=1.0 / sr)
    p = jnp.square(jnp.abs(spec))
    e_hi = jnp.sum(jnp.where(freqs >= lo_hz, p, 0.0))
    e_all = jnp.sum(p) + 1e-20
    return 10.0 * jnp.log10(e_hi / e_all + 1e-20)
