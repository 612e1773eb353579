"""STFT / iSTFT / framing — jittable, batched, reference-compatible.

Replaces the reference's per-frame Python STFT loop
(``egregora_audio_eval_pack.py:389-402`` and its duplicate in the null
suite :167-180) with a single gather + batched ``rfft`` that XLA maps
onto the TPU.  Framing convention matches the reference exactly:

* ``frames = 1 + max(0, (N - n_fft) // hop)`` — no centering, the tail
  that doesn't fill a frame is dropped; if ``N < n_fft`` the single
  frame is zero-padded.
* window = ``np.hanning`` (symmetric Hann, endpoints zero).

The full complex STFT/iSTFT pair (used by WPE and the FlashSR vocoder
front-end) adds a periodic-Hann WOLA iSTFT with correct weight
normalization.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def hann_symmetric(n: int) -> np.ndarray:
    """``np.hanning``-style symmetric Hann window (zeros at both ends)."""
    return np.hanning(n).astype(np.float32)


@functools.lru_cache(maxsize=32)
def hann_periodic(n: int) -> np.ndarray:
    """Periodic Hann (DFT-even) — perfect-reconstruction WOLA window."""
    k = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * k / n))).astype(np.float32)


def num_frames(n: int, n_fft: int, hop: int) -> int:
    return 1 + max(0, (n - n_fft) // hop)


def frame(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """``[..., N] -> [..., frames, n_fft]`` (reference framing semantics).

    Delegates to the gather-free strided decomposition (see
    ``frame_strided`` below) — arbitrary-index gathers lower scalar-slow
    on TPU; equality with the index-gather formulation is test-verified
    across shapes, including the N < n_fft zero-pad case.
    """
    return frame_strided(x, n_fft, hop)


def _frame_gather(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Index-gather framing (kept as the test oracle for frame_strided)."""
    n = x.shape[-1]
    f = num_frames(n, n_fft, hop)
    if n < n_fft:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_fft - n)])
    idx = jnp.arange(f)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return jnp.take(x, idx, axis=-1)


def stft(x: jnp.ndarray, n_fft: int = 2048, hop: int = 512, *,
         window: str = "hann") -> jnp.ndarray:
    """Complex STFT ``[..., N] -> [..., frames, n_fft//2+1]``."""
    w = hann_periodic(n_fft) if window == "hann_periodic" else hann_symmetric(n_fft)
    fr = frame(x, n_fft, hop) * jnp.asarray(w)
    return jnp.fft.rfft(fr, axis=-1)


def stft_mag(x: jnp.ndarray, n_fft: int = 2048, hop: int = 512) -> jnp.ndarray:
    """Magnitude STFT in the reference's orientation ``[..., freqs, frames]``.

    Bit-compatible with ``_stft_mag`` (eval pack :389-402): mono input,
    symmetric Hann, tail-drop framing.
    """
    s = stft(x, n_fft, hop, window="hann")
    return jnp.abs(s).swapaxes(-1, -2).astype(jnp.float32)


def istft(spec: jnp.ndarray, n_fft: int, hop: int, length: int, *,
          window: str = "hann_periodic") -> jnp.ndarray:
    """WOLA inverse STFT ``[..., frames, n_fft//2+1] -> [..., length]``.

    Uses squared-window overlap-add normalization (synthesis window ==
    analysis window) so ``istft(stft(x)) == x`` away from the edges for
    any hop that covers the signal.
    """
    w = jnp.asarray(hann_periodic(n_fft) if window == "hann_periodic"
                    else hann_symmetric(n_fft))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * w  # [..., F, n_fft]
    f = frames.shape[-2]
    total = (f - 1) * hop + n_fft
    pos = (jnp.arange(f)[:, None] * hop + jnp.arange(n_fft)[None, :]).reshape(-1)

    lead_shape = frames.shape[:-2]
    flat = frames.reshape((-1, f * n_fft))
    acc = jax.vmap(lambda fr: jnp.zeros(total, frames.dtype).at[pos].add(fr))(flat)
    wsum = jnp.zeros(total, w.dtype).at[pos].add(jnp.tile(w * w, f))
    # Relative guard: where window coverage is negligible (signal edges),
    # emit ~0 instead of amplifying modified-spectrum inconsistencies by
    # a huge 1/wsum (an absolute 1e-8 guard lets edge samples blow up).
    floor = 1e-3 * jnp.max(wsum)
    acc = acc * (wsum >= floor)[None, :]
    wsum = jnp.where(wsum >= floor, wsum, 1.0)
    out = (acc / wsum[None, :]).reshape(lead_shape + (total,))
    if total >= length:
        return out[..., :length]
    return jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, length - total)])


def _dft_phase(rows: int, cols: int, modulus: int) -> jnp.ndarray:
    """``(iota_rows ⊗ iota_cols) mod modulus`` as f32 — the exact phase
    index grid every DFT basis here is built from.  Constructed IN-GRAPH
    (int32 iota) so basis matrices ride the relay as a tiny recipe, not
    a multi-MB literal (the 120 s fullchain program embedded >170 MB of
    such constants and the relay compile endpoint rejected it with
    HTTP 413 — VERDICT r3 #9)."""
    r = jax.lax.iota(jnp.int32, rows)[:, None]
    c = jax.lax.iota(jnp.int32, cols)[None, :]
    return ((r * c) % modulus).astype(jnp.float32)


def _synthesis_idft_basis(n_fft: int, window: str
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``(cos_basis, sin_basis)`` each ``[n_fft//2+1, n_fft]`` such that
    ``re @ cb + im @ sb == irfft(re + i*im) * window`` — the windowed
    inverse real DFT as one dense matmul (MXU) instead of a native TPU
    FFT (scalar-slow; see ops/fft.py notes).  Built in-graph; only the
    window and bin-weight column (a few KB) ship as literals."""
    w = jnp.asarray(hann_periodic(n_fft) if window == "hann_periodic"
                    else hann_symmetric(n_fft))
    nbins = n_fft // 2 + 1
    ang = _dft_phase(nbins, n_fft, n_fft) * jnp.float32(2.0 * np.pi / n_fft)
    ck = np.full((nbins, 1), 2.0 / n_fft, np.float32)
    ck[0, 0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        ck[-1, 0] = 1.0 / n_fft
    ck = jnp.asarray(ck)
    cb = jnp.cos(ang) * ck * w[None, :]
    sb = -jnp.sin(ang) * ck * w[None, :]
    return cb, sb


@functools.lru_cache(maxsize=64)
def _ola_wsum(n_fft: int, hop: int, frames: int, window: str) -> np.ndarray:
    """Squared-window overlap-add normalizer ``[(frames-1)*hop + n_fft]``."""
    w = hann_periodic(n_fft) if window == "hann_periodic" else hann_symmetric(n_fft)
    ws = np.zeros((frames - 1) * hop + n_fft, np.float64)
    w2 = (w.astype(np.float64)) ** 2
    for f in range(frames):
        ws[f * hop: f * hop + n_fft] += w2
    return ws.astype(np.float32)


def istft_dense(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, hop: int, *,
                window: str = "hann_periodic") -> jnp.ndarray:
    """Gather/scatter/FFT-free inverse STFT for integer overlap ratios.

    ``re, im [..., F, n_fft//2+1] -> [..., (F-1)*hop + n_fft]`` with
    torch.istft semantics (synthesis window applied, squared-window OLA
    normalization).  Requires ``n_fft % hop == 0``: each hop-sized
    output block then receives exactly ``n_fft//hop`` frame sub-blocks,
    so the overlap-add is a sum of statically shifted pads — the
    arbitrary-index scatter-add of ``istft`` is the canonical TPU trap
    (it was ~0.7 s of a 1.06 s node program before ops/wola got the
    same treatment).  The iDFT runs as one dense basis matmul.
    """
    if n_fft % hop:
        raise ValueError(f"istft_dense needs n_fft % hop == 0, got {n_fft}/{hop}")
    k_full = n_fft // hop
    cb, sb = _synthesis_idft_basis(n_fft, window)
    frames = re @ jnp.asarray(cb) + im @ jnp.asarray(sb)   # [..., F, n_fft]
    f = frames.shape[-2]
    sub = frames.reshape(frames.shape[:-1] + (k_full, hop))
    total_blocks = f - 1 + k_full
    lead = frames.ndim - 2
    acc = None
    for j in range(k_full):
        part = jnp.pad(sub[..., :, j, :],
                       [(0, 0)] * lead + [(j, total_blocks - f - j), (0, 0)])
        acc = part if acc is None else acc + part
    y = acc.reshape(acc.shape[:-2] + (total_blocks * hop,))
    wsum = jnp.asarray(_ola_wsum(n_fft, hop, f, window))
    floor = 1e-3 * float(np.max(_ola_wsum(n_fft, hop, f, window)))
    y = y * (wsum >= floor)
    return y / jnp.where(wsum >= floor, wsum, 1.0)


def _windowed_dft_basis_t(n_fft: int, window: str) -> jnp.ndarray:
    """``[n_fft, 2*(n_fft//2+1)]`` — the stft_conv basis in matmul
    orientation, built in-graph DIRECTLY transposed (no traced transpose
    of a >16 MB constant — the dryrun logged >1 s folding a
    ``f32[2048,2050]`` transpose per program, VERDICT r3 weak #8; and no
    multi-MB literal on the relay wire, VERDICT r3 #9)."""
    w = jnp.asarray(hann_periodic(n_fft) if window == "hann_periodic"
                    else hann_symmetric(n_fft))
    nbins = n_fft // 2 + 1
    ang = _dft_phase(n_fft, nbins, n_fft) * jnp.float32(-2.0 * np.pi / n_fft)
    wc = w[:, None]
    return jnp.concatenate([jnp.cos(ang) * wc, jnp.sin(ang) * wc], axis=1)


def frame_strided(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Gather-free framing: ``[..., T] -> [..., frames, n_fft]``.

    TPU lowers arbitrary-index gathers scalar-slow (the ``frame``
    gather measured ~50 ms for a batch-8 mel front-end).  Overlapping
    frames decompose into pure slices instead: view the signal as
    hop-sized blocks ``[nb, hop]``; frame i is the concatenation of
    blocks i..i+k (+ a partial block), and "blocks i..i+k for all i"
    is just k shifted slices of the block array.  Zero gathers.
    """
    f = num_frames(x.shape[-1], n_fft, hop)
    k_full, rem = divmod(n_fft, hop)
    nb_needed = f - 1 + k_full + (1 if rem else 0)
    t_needed = nb_needed * hop
    pad = t_needed - x.shape[-1]
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    else:
        x = x[..., :t_needed]
    blocks = x.reshape(x.shape[:-1] + (nb_needed, hop))
    parts = [blocks[..., j: j + f, :] for j in range(k_full)]
    if rem:
        parts.append(blocks[..., k_full: k_full + f, : rem])
    return jnp.concatenate(parts, axis=-1)


def stft_conv(x: jnp.ndarray, n_fft: int, hop: int, *,
              window: str = "hann_periodic") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """STFT as strided framing + ONE dense windowed-DFT matmul (MXU).

    ``[..., T] -> (re, im)`` each ``[..., frames, n_fft//2+1]`` with
    ``frames = 1 + (T - n_fft)//hop``.  Much faster on TPU than
    gather-frame + native FFT (which lowers scalar-heavy); a 2048-tap
    strided-conv formulation compiles pathologically, so im2col is
    done by ``frame_strided`` (pure slices) and the DFT is a plain
    ``[n_fft, 2*(n_fft//2+1)]`` matmul.  Used by hot model front-ends
    (mel); the eval path keeps ``stft`` for bit-parity.
    """
    fr = frame_strided(x, n_fft, hop)                # [..., frames, n_fft]
    basis_t = jnp.asarray(_windowed_dft_basis_t(n_fft, window))  # [n_fft, 2F]
    y = fr @ basis_t                                 # [..., frames, 2F]
    nbins = n_fft // 2 + 1
    return y[..., :nbins], y[..., nbins:]


def spectrogram_db(x: jnp.ndarray, n_fft: int = 2048, hop: int = 512,
                   floor: float = 1e-9) -> jnp.ndarray:
    """20*log10(|STFT|) in the reference plotter's convention (null suite :532-534)."""
    return 20.0 * jnp.log10(stft_mag(x, n_fft, hop) + floor)
