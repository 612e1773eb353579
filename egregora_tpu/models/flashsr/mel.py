"""Mel-spectrogram front-end for the FlashSR stack — pure XLA.

The reference delegates its mel/STFT front-end to the downloaded
FlashSR_Inference torch code (reference
``egregora_audio_super_resolution.py:319-344`` imports it wholesale).
Here it is a first-class op: framed STFT (ops/stft.py) followed by a
mel filterbank matmul — which XLA fuses and maps onto the MXU, since
the filterbank is just a ``[freqs, mels]`` matrix.

Conventions follow the AudioSR/AudioLDM lineage FlashSR distills from
(48 kHz, n_fft 2048, hop 480 => 100 frames/s, 256 mel bands, Slaney
scale, natural-log dynamic compression).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 48000
N_FFT = 2048
HOP = 480
N_MELS = 256
FMIN = 20.0
FMAX = 24000.0


def _hz_to_mel(f: np.ndarray, htk: bool = False) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(m: np.ndarray, htk: bool = False) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(sr: int = SAMPLE_RATE, n_fft: int = N_FFT, n_mels: int = N_MELS,
                   fmin: float = FMIN, fmax: float = FMAX, htk: bool = False,
                   norm: bool = True) -> np.ndarray:
    """Triangular mel filterbank ``[n_fft//2+1, n_mels]`` (librosa-compatible)."""
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin), htk), _hz_to_mel(np.array(fmax), htk),
                          n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fb = np.zeros((n_freqs, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    if norm:  # Slaney area normalization
        enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def mel_band_peaks(sr: int = SAMPLE_RATE, n_fft: int = N_FFT,
                   n_mels: int = N_MELS, fmin: float = FMIN,
                   fmax: float = FMAX) -> np.ndarray:
    """``[n_mels]`` triangle-peak frequencies (Hz) of the filterbank."""
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)),
                          n_mels + 2)
    return _mel_to_hz(mel_pts)[1: n_mels + 1].astype(np.float32)


@functools.lru_cache(maxsize=8)
def _mel_unmix(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """``[n_mels, n_fft//2+1]`` bin-interpolation weights: column-
    normalized filterbank transpose, so a per-mel-band log-gain maps to
    a smooth per-bin log-gain (weighted average of the bands covering
    each bin; uncovered bins get weight 0 => gain 1 after exp)."""
    fb = mel_filterbank(sr, n_fft, n_mels)            # [bins, mels]
    cover = np.maximum(fb.sum(axis=1, keepdims=True), 1e-10)
    return (fb / cover).T.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _frame_interp(frames_out: int, hop_out: int, frames_in: int,
                  hop_in: int) -> np.ndarray:
    """``[frames_out, frames_in]`` linear time-interpolation matrix
    between two center-aligned frame grids (static — a tiny matmul
    instead of a gather, which lowers badly on TPU)."""
    pos = np.arange(frames_out) * (hop_out / hop_in)
    pos = np.clip(pos, 0.0, frames_in - 1.0)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, frames_in - 1)
    w = (pos - lo).astype(np.float32)
    m = np.zeros((frames_out, frames_in), np.float32)
    m[np.arange(frames_out), lo] += 1.0 - w
    m[np.arange(frames_out), hi] += w
    return m


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "hop",
                                             "max_log_gain", "replace"))
def mel_envelope_match(wav: jnp.ndarray, log_mel_tgt: jnp.ndarray,
                       sr: int = SAMPLE_RATE, n_fft: int = N_FFT,
                       hop: int = 512,
                       max_log_gain: float = 2.5,
                       replace: bool = False) -> jnp.ndarray:
    """Re-impose a predicted log-mel envelope on a waveform's STFT
    magnitude: ``[..., T], [..., mel_frames, n_mels] -> [..., T]``.

    The round-3 stage ablation showed the FlashSR pipeline's residual
    LSD lives entirely in the mel->waveform stage while the predicted
    mel is near-exact — so projecting the vocoder output back onto that
    mel envelope (per-band amplitude ratio in log domain, linearly
    interpolated over frames and bins, clamped to ``max_log_gain``
    nats) removes the vocoder's band-scale magnitude error at zero
    training cost.  All steps are static matmuls (analysis/synthesis
    DFT bases, filterbank, interpolation) — no gathers/scatters; the
    correction STFT runs at hop 512 so synthesis can use the
    scatter-free ``istft_dense`` (needs ``n_fft % hop == 0``; the mel
    grid's hop 480 does not divide 2048).

    ``replace=True`` goes further: the output magnitude becomes the
    smooth mel-implied envelope itself (vocoder phase kept) instead of
    the vocoder magnitude times band gains.  When the truth's high-band
    fine structure is unpredictable noise (the round-3 LSD floor), the
    smooth envelope is the log-L2-optimal magnitude (expected LSD sigma
    instead of sigma*sqrt(2) for an independent realization) — at the
    cost of smearing any true narrow partials across their mel band.
    """
    from ...ops.stft import istft_dense, stft_conv

    t = wav.shape[-1]
    pad = n_fft // 2
    xp = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    re, im = stft_conv(xp, n_fft, hop, window="hann_periodic")
    gain = envelope_gain(re, im, log_mel_tgt, sr=sr, n_fft=n_fft, hop=hop,
                         max_log_gain=max_log_gain, replace=replace)
    y = istft_dense(re * gain, im * gain, n_fft, hop)
    return y[..., pad: pad + t]


def envelope_gain(re: jnp.ndarray, im: jnp.ndarray, log_mel_tgt: jnp.ndarray,
                  sr: int = SAMPLE_RATE, n_fft: int = N_FFT, hop: int = 512,
                  max_log_gain: float = 2.5,
                  replace: bool = False) -> jnp.ndarray:
    """Per-bin magnitude gain ``[..., frames, n_fft//2+1]`` projecting
    an STFT onto a predicted log-mel envelope (the math of
    ``mel_envelope_match``, exposed on the spectrum so the pipeline can
    fuse it with the crossover merge in one analysis/synthesis pass)."""
    mel_frames, n_mels = log_mel_tgt.shape[-2:]
    mag = jnp.sqrt(re * re + im * im + 1e-20)
    fb_np = mel_filterbank(sr, n_fft, n_mels)
    ti = jnp.asarray(_frame_interp(re.shape[-2], hop, mel_frames, HOP))
    tgt = jnp.einsum("fj,...jm->...fm", ti, log_mel_tgt)
    unmix = jnp.asarray(_mel_unmix(sr, n_fft, n_mels))
    if replace:
        # mel values are filterbank-weighted SUMS over bins; dividing
        # each band by its weight-sum gives the flat-within-band
        # per-bin amplitude the band implies, then unmix interpolates
        # the log-envelope across bins (vocoder phase kept)
        s1 = np.maximum(fb_np.sum(axis=0), 1e-10)       # [mels]
        env_log = (tgt - jnp.asarray(np.log(s1, dtype=np.float32))) @ unmix
        dlog_bin = jnp.clip(env_log - jnp.log(jnp.clip(mag, 1e-5, None)),
                            -max_log_gain, max_log_gain)
        covered = jnp.asarray(fb_np.sum(axis=1) > 0)    # [bins]
        return jnp.where(covered, jnp.exp(dlog_bin), 1.0)
    cur = jnp.log(jnp.clip(mag @ jnp.asarray(fb_np), 1e-5, None))
    dlog = jnp.clip(tgt - cur, -max_log_gain, max_log_gain)
    return jnp.exp(dlog @ unmix)


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "hop", "n_mels"))
def log_mel(x: jnp.ndarray, sr: int = SAMPLE_RATE, n_fft: int = N_FFT,
            hop: int = HOP, n_mels: int = N_MELS) -> jnp.ndarray:
    """``[..., T] -> [..., frames, n_mels]`` natural-log mel spectrogram.

    Signal is center-padded by n_fft//2 (reflect) so frame count is
    ``T // hop + 1``.  The STFT runs as one strided windowed-DFT conv
    (ops/stft.stft_conv) and the mel projection as one matmul — both on
    the MXU; dynamic range compressed as ``log(clip(mel, 1e-5))``.
    """
    from ...ops.stft import stft_conv

    pad = n_fft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    re, im = stft_conv(xp, n_fft, hop, window="hann_periodic")
    mag = jnp.sqrt(re * re + im * im + 1e-20)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    mel = jnp.einsum("...fk,km->...fm", mag, fb,
                     precision=jax.lax.Precision.DEFAULT)
    return jnp.log(jnp.clip(mel, 1e-5, None))
