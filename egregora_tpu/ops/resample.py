"""Sample-rate conversion as XLA convolutions.

TPU-native replacement for the reference's 4-stage resampler cascade
(soxr -> scipy.resample_poly -> torchaudio -> linear interp; reference
``egregora_audio_super_resolution.py:159-207``) and the HQ resampler
node (``egregora_audio_eval_pack.py:476-522``).  One implementation —
a Kaiser-windowed-sinc polyphase filter lowered to
``lax.conv_general_dilated`` (lhs_dilation = upsample factor,
window_strides = downsample factor) — replaces the whole cascade; the
CPU "fallback" is the same code on the CPU backend.

Output length convention: ``ceil(N * up / down)`` with the kernel
centered so output sample ``j`` sits at input time ``j * down / up``
(matches scipy.signal.resample_poly / torchaudio lengths).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_WIDTH = 64        # zero-crossings per side (torchaudio lowpass_filter_width)
DEFAULT_ROLLOFF = 0.945   # fraction of Nyquist retained (eval pack :514)
DEFAULT_BETA = 14.769     # Kaiser beta (eval pack :492)


@functools.lru_cache(maxsize=64)
def _design_kernel(up: int, down: int, width: int, rolloff: float, beta: float) -> np.ndarray:
    """Kaiser-windowed sinc lowpass at the upsampled rate, gain ``up``."""
    # Normalized cutoff at rate (src*up): keep rolloff * min(src,dst)/2.
    # In units of the upsampled rate: min(1/down', 1/up') where src ~ up ... use
    # cycles/sample: fc = rolloff * 0.5 * min(1/up, 1/down) * up ... derive:
    #   upsampled rate R = src*up ; cutoff_hz = rolloff * min(src, dst)/2
    #   w_c = cutoff_hz / R = rolloff * min(1, up/down) / (2*up)
    w_c = rolloff * min(1.0, up / down) / (2.0 * up)
    # `width` sinc zero-crossings per side: zeros at n = k / (2*w_c)
    half = int(math.ceil(width / (2.0 * w_c)))
    n = np.arange(-half, half + 1, dtype=np.float64)
    h = 2.0 * w_c * np.sinc(2.0 * w_c * n)
    h *= np.kaiser(2 * half + 1, beta)
    h /= h.sum()          # unit DC gain at the upsampled rate
    h *= up               # compensate zero-stuffing energy loss
    return h.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _block_matrix(up: int, down: int, width: int, rolloff: float, beta: float
                  ) -> "tuple[np.ndarray, int, int, int]":
    """(M [L+2m, Bout], L, Bout, m) for the blocked polyphase matmul.

    ``y[j] = sum_i x[i] * h[i*up - j*down + half]`` is block-shift-
    invariant when the input block length L is a multiple of ``down``
    (then L*up == Bout*down exactly), so ONE dense matrix maps every
    padded input block ``[b*L - m, b*L + L + m)`` to its Bout outputs.
    """
    h = _design_kernel(up, down, width, rolloff, beta)
    half = (h.shape[0] - 1) // 2
    m = half // up + 1                       # input-sample halo
    # target ~512-1024 input samples per block, multiple of `down`
    l = down * max(1, -(-512 // down))
    bout = l * up // down
    rows = l + 2 * m
    mat = np.zeros((rows, bout), dtype=np.float32)
    idx_i = np.arange(rows)[:, None] - m     # local input index (global-aligned)
    idx_j = np.arange(bout)[None, :]
    t = idx_i * up - idx_j * down + half     # tap index into h
    valid = (t >= 0) & (t < h.shape[0])
    mat[valid] = h[t[valid]]
    return mat, l, bout, m


def resampled_length(n: int, src_sr: int, dst_sr: int) -> int:
    """Output length of ``resample_poly`` for an ``n``-sample input."""
    if int(src_sr) == int(dst_sr):
        return int(n)
    g = math.gcd(int(src_sr), int(dst_sr))
    up, down = dst_sr // g, src_sr // g
    return -(-int(n) * up // down)


def resample_poly(x_cs: jnp.ndarray, src_sr: int, dst_sr: int, *,
                  width: int = DEFAULT_WIDTH, rolloff: float = DEFAULT_ROLLOFF,
                  beta: float = DEFAULT_BETA) -> jnp.ndarray:
    """Polyphase resample ``[C, S] -> [C, ceil(S*up/down)]`` (jittable).

    ``src_sr``/``dst_sr`` must be static ints (they select the compiled
    kernel).  Runs as a blocked Toeplitz MATMUL on overlapping input
    frames — a 1-channel ``conv_general_dilated`` never reaches the MXU
    (measured 3.5 s for 60 s of 16k->48k vs ~10 ms as a matmul), the
    same trap as ops/fir.fir_same.
    """
    src_sr, dst_sr = int(src_sr), int(dst_sr)
    if src_sr == dst_sr:
        return x_cs.astype(jnp.float32)
    g = math.gcd(src_sr, dst_sr)
    up, down = dst_sr // g, src_sr // g

    mat, l, bout, m = _block_matrix(up, down, width, rolloff, beta)
    c, s = x_cs.shape
    out_len = -(-s * up // down)  # ceil
    nb = -(-s // l)

    x = x_cs.astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (m, m + nb * l - s)))
    # overlapping frames [C, nb, L+2m]: pure strided slices (no gather)
    from .stft import frame_strided
    frames = frame_strided(xp, l + 2 * m, l)[:, :nb]
    y = jnp.einsum("cbi,io->cbo", frames, jnp.asarray(mat),
                   precision=jax.lax.Precision.HIGHEST)
    return y.reshape(c, nb * bout)[:, :out_len]


def resample_linear(x_cs: jnp.ndarray, src_sr: int, dst_sr: int) -> jnp.ndarray:
    """Linear-interp resample, matching the reference fallback exactly
    (sr node :201-207): both time grids are ``linspace(0, 1, N, endpoint=False)``.
    """
    src_sr, dst_sr = int(src_sr), int(dst_sr)
    if src_sr == dst_sr:
        return x_cs.astype(jnp.float32)
    s = x_cs.shape[-1]
    n_out = int(round(s * dst_sr / float(src_sr)))
    t_in = jnp.linspace(0.0, 1.0, s, endpoint=False)
    t_out = jnp.linspace(0.0, 1.0, n_out, endpoint=False)
    return jax.vmap(lambda ch: jnp.interp(t_out, t_in, ch))(x_cs).astype(jnp.float32)


def resample(x_cs: jnp.ndarray, src_sr: int, dst_sr: int, *,
             mode: str = "auto", width: int = DEFAULT_WIDTH,
             rolloff: float = DEFAULT_ROLLOFF, beta: float = DEFAULT_BETA) -> jnp.ndarray:
    """HQ resample dispatcher.

    ``mode`` accepts the reference node's vocabulary ("auto",
    "scipy_polyphase", "torchaudio", "linear"; eval pack :484) — the
    first three all map to the XLA polyphase kernel (the cascade
    collapsed to one implementation), "linear" keeps the cheap path.
    """
    if mode == "linear":
        return resample_linear(x_cs, src_sr, dst_sr)
    return resample_poly(x_cs, src_sr, dst_sr, width=width, rolloff=rolloff, beta=beta)


def oversample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Integer oversampling of a 1-D signal (true-peak measurement).

    Filter design matches scipy.signal.resample_poly's default
    (Kaiser beta 5.0, 10*factor taps per side, cutoff at Nyquist) so
    true-peak readings parity-match the reference's scipy path
    (eval pack :203-214).
    """
    if factor <= 1:
        return x.astype(jnp.float32)
    return resample_poly(x[None, :], 1, int(factor),
                         width=10, rolloff=1.0, beta=5.0)[0]
