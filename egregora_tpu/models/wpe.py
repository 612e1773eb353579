"""WPE (weighted prediction error) dereverberation — batched over frequency.

TPU-native replacement for the reference's ``nara_wpe`` dependency
(``egregora_audio_enhance_extras.py:368-443``): the iterative per-
frequency MCLP solve becomes a ``vmap`` over frequency bins around a
``fori_loop`` over iterations — every bin's small Hermitian solve runs
in parallel on device instead of a Python loop over 513 bins.

Algorithm (standard WPE, as consumed by the reference at :413-427):
  given STFT Y [F, C, T], taps K, delay D, iterations I:
    Z = Y
    repeat I times:
      lambda[t] = mean_c |Z[:, c, t]|^2                (PSD estimate)
      Ytil[t] = stack of Y[t-D], ..., Y[t-D-K+1]       ([F, C*K, T])
      R = Ytil diag(1/lambda) Ytil^H ; P = Ytil diag(1/lambda) Y^H
      G = solve(R, P)                                  ([F, C*K, C])
      Z = Y - G^H Ytil
The reference's STFT wrapper (nara_wpe stft/istft) is replaced by the
framework's shared perfect-reconstruction STFT (ops/stft.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.stft import istft, stft


def _stack_taps(y_fct: jnp.ndarray, taps: int, delay: int) -> jnp.ndarray:
    """``[F, C, T] -> [F, C*taps, T]`` delayed tap stack (zero history)."""
    f, c, t = y_fct.shape
    outs = []
    for k in range(taps):
        shift = delay + k
        shifted = jnp.pad(y_fct, ((0, 0), (0, 0), (shift, 0)))[:, :, :t]
        outs.append(shifted)
    return jnp.concatenate(outs, axis=1)


@functools.partial(jax.jit, static_argnames=("taps", "delay", "iterations"))
def wpe(y_fct: jnp.ndarray, taps: int = 10, delay: int = 3,
        iterations: int = 3, eps: float = 1e-8) -> jnp.ndarray:
    """Dereverberate complex STFT ``[F, C, T]`` -> same shape."""
    f, c, t = y_fct.shape
    ytil = _stack_taps(y_fct, taps, delay)            # [F, CK, T]

    def per_freq(yf, ytf, zf):
        # yf [C, T], ytf [CK, T], zf [C, T]
        lam = jnp.mean(jnp.abs(zf) ** 2, axis=0)                 # [T]
        # floor lambda RELATIVE to the bin's power scale: an absolute
        # floor lets near-silent frames (e.g. fade padding) get huge
        # 1/lambda weights that dominate the solve and fit silence.
        lam = jnp.maximum(lam, 1e-4 * jnp.max(lam) + 1e-12)
        w = 1.0 / lam
        ytw = ytf * w[None, :]
        r = ytw @ ytf.conj().T                                   # [CK, CK]
        p = ytw @ yf.conj().T                                    # [CK, C]
        # Tikhonov regularization scaled to the matrix magnitude —
        # an absolute eps is meaningless across bins whose power spans
        # orders of magnitude and lets ill-conditioned bins blow up.
        tr = jnp.real(jnp.trace(r)) / r.shape[0]
        r = r + (1e-4 * tr + 1e-10) * jnp.eye(r.shape[0], dtype=r.dtype)
        g = jnp.linalg.solve(r, p)                               # [CK, C]
        return yf - g.conj().T @ ytf                             # [C, T]

    def body(_, z):
        return jax.vmap(per_freq)(y_fct, ytil, z)

    return jax.lax.fori_loop(0, iterations, body, y_fct)


@functools.partial(jax.jit, static_argnames=("taps", "delay", "iterations",
                                             "n_fft", "hop"))
def wpe_dereverb(x_cn: jnp.ndarray, taps: int = 10, delay: int = 3,
                 iterations: int = 3, n_fft: int = 1024, hop: int = 256) -> jnp.ndarray:
    """Waveform-in/waveform-out WPE: STFT -> wpe -> iSTFT (node core).

    Matches the reference node's data flow (extras :411-427) with the
    framework's own STFT pair.
    """
    c, n = x_cn.shape
    # fade padding (nara_wpe-style): full window coverage at the edges
    xp = jnp.pad(x_cn, ((0, 0), (n_fft, n_fft)))
    spec = stft(xp, n_fft, hop, window="hann_periodic")      # [C, F, K]
    y = jnp.transpose(spec, (2, 0, 1))                       # [K(freq), C, F(frames)]
    z = wpe(y, taps=taps, delay=delay, iterations=iterations)
    back = jnp.transpose(z, (1, 2, 0))                       # [C, frames, freqs]
    out = istft(back, n_fft, hop, n + 2 * n_fft)
    return out[:, n_fft: n_fft + n].astype(jnp.float32)
