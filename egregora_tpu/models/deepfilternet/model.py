"""DeepFilterNet-class denoiser in JAX (SURVEY.md #30's TPU equivalent).

The reference drives the ``df`` package — Rust libDF DSP + a torch
model — through ``init_df``/``enhance``
(``egregora_audio_enhance_extras.py:509-517, 641-653``).  This module
implements the DeepFilterNet2/3 architecture natively:

* STFT: 48 kHz, 960-point FFT, 480 hop (DFN's 20 ms/10 ms framing),
  481 bins.
* ERB path: 32 triangular ERB-scale bands of log-power -> conv+GRU
  encoder -> conv decoder -> per-band sigmoid gains, expanded back to
  bins (libDF's band gain stage).
* Deep-filtering path: the first 96 bins' complex spectrum -> conv
  branch -> GRU -> per-bin complex FIR of order 5 over past frames
  (DFN's deep filter), replacing the gained low bins.
* Optional post-filter: gain sharpening (the ``--pf`` behavior the
  reference's ``use_postfilter`` toggle reserves, :649-651).

Streaming state (GRU carries + DF frame history) is explicit in a
``lax.scan``; weights are a seeded param tree convertible from public
checkpoints via utils/weights.convert_state_dict.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.stft import hann_periodic

SR = 48000
N_FFT = 960
HOP = 480
FREQ = N_FFT // 2 + 1       # 481
NB_ERB = 32
NB_DF = 96                  # deep-filtered low bins (0..9.6 kHz)
DF_ORDER = 5


@dataclasses.dataclass(frozen=True)
class DFNConfig:
    variant: str = "DeepFilterNet2"
    conv_ch: int = 64
    emb_dim: int = 256
    gru_dim: int = 256
    df_hidden: int = 256


@functools.lru_cache(maxsize=1)
def erb_filterbank() -> np.ndarray:
    """``[FREQ, NB_ERB]`` triangular ERB-scale filterbank (libDF's band
    layout: equal spacing on the ERB-rate scale 0..24 kHz)."""
    def hz_to_erb(f):
        return 21.4 * np.log10(1.0 + 0.00437 * f)

    def erb_to_hz(e):
        return (10.0 ** (e / 21.4) - 1.0) / 0.00437

    freqs = np.linspace(0, SR / 2, FREQ)
    pts = erb_to_hz(np.linspace(hz_to_erb(0.0), hz_to_erb(SR / 2), NB_ERB + 2))
    fb = np.zeros((FREQ, NB_ERB), dtype=np.float32)
    for b in range(NB_ERB):
        lo, ctr, hi = pts[b], pts[b + 1], pts[b + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-6)
        dn = (hi - freqs) / max(hi - ctr, 1e-6)
        fb[:, b] = np.maximum(0.0, np.minimum(up, dn))
    fb /= np.maximum(fb.sum(axis=1, keepdims=True), 1e-8)  # partition of unity
    return fb


def _dense_init(key, shapes: Dict[str, Tuple[int, ...]]) -> Dict:
    out = {}
    keys = jax.random.split(key, len(shapes))
    for k, (name, shp) in zip(keys, shapes.items()):
        if name.endswith("bias"):
            out[name] = jnp.zeros(shp)
        else:
            out[name] = jax.random.normal(k, shp) * (1.0 / np.sqrt(shp[0]))
    return out


def init_params(seed: int = 0, cfg: DFNConfig = DFNConfig()) -> Dict:
    k = jax.random.split(jax.random.PRNGKey(seed), 8)
    c = cfg
    return {
        # ERB encoder: 2 frame-conv layers then GRU
        "erb_enc": _dense_init(k[0], {
            "w1": (NB_ERB * 3, c.conv_ch), "b1": (c.conv_ch,),
            "w2": (c.conv_ch, c.emb_dim), "b2": (c.emb_dim,),
        }),
        # complex-spec encoder for the DF branch (re/im of NB_DF bins)
        "df_enc": _dense_init(k[1], {
            "w1": (NB_DF * 2, c.conv_ch), "b1": (c.conv_ch,),
            "w2": (c.conv_ch, c.emb_dim), "b2": (c.emb_dim,),
        }),
        "gru": _gru_init(k[2], 2 * c.emb_dim, c.gru_dim),
        "erb_dec": _dense_init(k[3], {
            "w1": (c.gru_dim, c.emb_dim), "b1": (c.emb_dim,),
            "w2": (c.emb_dim, NB_ERB), "b2": (NB_ERB,),
        }),
        "df_gru": _gru_init(k[4], c.gru_dim, c.df_hidden),
        "df_dec": _dense_init(k[5], {
            "w1": (c.df_hidden, NB_DF * DF_ORDER * 2),
            "b1": (NB_DF * DF_ORDER * 2,),
        }),
    }


def _gru_init(key, in_dim: int, units: int) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.normal(k1, (in_dim, 3 * units)) / np.sqrt(in_dim),
        "recurrent": jax.random.normal(k2, (units, 3 * units)) / np.sqrt(units),
        "bias": jnp.zeros((3 * units,)),
    }


def _gru_step(p, h, x):
    xw = x @ p["kernel"] + p["bias"]
    hw = h @ p["recurrent"]
    xz, xr, xn = jnp.split(xw, 3, -1)
    hz, hr, hn = jnp.split(hw, 3, -1)
    z = jax.nn.sigmoid(xz + hz)
    r = jax.nn.sigmoid(xr + hr)
    n = jnp.tanh(xn + r * hn)
    return z * h + (1 - z) * n


def _mlp(p, x, prefix=""):
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    if "w2" in p:
        return h @ p["w2"] + p["b2"]
    return h


@functools.partial(jax.jit, static_argnames=("post_filter",))
def enhance_mono(params: Dict, x: jnp.ndarray, post_filter: bool = False) -> jnp.ndarray:
    """Denoise mono 48 kHz ``[T] -> [T]`` (libDF ``enhance`` analog)."""
    t = x.shape[0]
    # fade padding: full window coverage at both edges — without it the
    # WOLA division by near-zero window sums amplifies any spectral
    # modification ~50x in the first hop of output
    lead = N_FFT
    n_frames = max(1, (t + lead) // HOP + 1)
    xp = jnp.pad(x, (lead, n_frames * HOP + N_FFT - t - lead))
    win = jnp.asarray(hann_periodic(N_FFT))
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = jnp.take(xp, idx, axis=0) * win
    spec = jnp.fft.rfft(frames, axis=-1)                # [F, 481]

    fb = jnp.asarray(erb_filterbank())
    erb_pow = jnp.log10((jnp.abs(spec) ** 2) @ fb + 1e-10)  # [F, 32]
    # 3-frame context for the "conv" layer (causal)
    ctx = jnp.concatenate([
        jnp.roll(erb_pow, 2, axis=0), jnp.roll(erb_pow, 1, axis=0), erb_pow],
        axis=-1)
    erb_emb = jnp.tanh(_mlp(params["erb_enc"], ctx))    # [F, emb]

    df_in = spec[:, :NB_DF]
    df_feat = jnp.concatenate([df_in.real, df_in.imag], axis=-1) # [F, 192]
    df_emb = jnp.tanh(_mlp(params["df_enc"], df_feat))

    emb = jnp.concatenate([erb_emb, df_emb], axis=-1)

    gru_dim = params["gru"]["recurrent"].shape[0]
    df_hidden = params["df_gru"]["recurrent"].shape[0]

    def step(carry, e):
        h, hdf = carry
        h = _gru_step(params["gru"], h, e)
        hdf = _gru_step(params["df_gru"], hdf, h)
        return (h, hdf), (h, hdf)

    (_, _), (hs, hdfs) = jax.lax.scan(
        step, (jnp.zeros(gru_dim), jnp.zeros(df_hidden)), emb)

    gains = jax.nn.sigmoid(_mlp(params["erb_dec"], hs))      # [F, 32]
    if post_filter:
        # gain sharpening: attenuate mid gains, keep extremes
        beta = 0.02
        gains = gains * (1.0 + beta) / (1.0 + beta * gains * gains)
    bin_gains = gains @ fb.T                                  # [F, 481]
    spec_g = spec * bin_gains

    coefs = _mlp(params["df_dec"], hdfs)                      # [F, 96*5*2]
    coefs = coefs.reshape(n_frames, NB_DF, DF_ORDER, 2) * 0.1
    cplx = coefs[..., 0] + 1j * coefs[..., 1]                 # [F, 96, 5]
    low = spec[:, :NB_DF]
    stacked = jnp.stack([jnp.roll(low, k, axis=0) for k in range(DF_ORDER)],
                        axis=-1)                              # [F, 96, 5]
    df_out = jnp.sum(stacked * cplx, axis=-1)
    # residual deep filter around the gained low band
    spec_out = spec_g.at[:, :NB_DF].set(spec_g[:, :NB_DF] + df_out)

    # iSTFT (square-window WOLA)
    yfr = jnp.fft.irfft(spec_out, n=N_FFT, axis=-1) * win
    pos = idx.reshape(-1)
    total = (n_frames - 1) * HOP + N_FFT
    acc = jnp.zeros(total).at[pos].add(yfr.reshape(-1))
    wsum = jnp.zeros(total).at[pos].add(jnp.tile(win * win, n_frames))
    floor = 1e-3 * jnp.max(wsum)
    acc = acc * (wsum >= floor)
    y = acc / jnp.where(wsum >= floor, wsum, 1.0)
    return y[lead: lead + t].astype(jnp.float32)


def enhance(params: Dict, x_cn: jnp.ndarray, cfg: DFNConfig = DFNConfig(),
            post_filter: bool = False) -> jnp.ndarray:
    """``[C, T] -> [C, T]`` per-channel enhancement (reference :645-653)."""
    return jax.vmap(lambda ch: enhance_mono(params, ch, post_filter))(x_cn)
