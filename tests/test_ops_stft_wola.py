import jax.numpy as jnp
import numpy as np
import pytest

from egregora_tpu.ops.stft import frame, hann_symmetric, istft, num_frames, stft, stft_mag
from egregora_tpu.ops.wola import chunk_batch, iter_chunks, wola_stitch


def ref_stft_mag(x, n_fft=2048, hop=512):
    """Reference _stft_mag (eval pack :389-402) re-stated as test oracle."""
    mono = x if x.ndim == 1 else x.mean(axis=0)
    n = mono.shape[0]
    win = np.hanning(n_fft).astype(np.float32)
    frames = 1 + max(0, (n - n_fft) // hop)
    s = np.empty((n_fft // 2 + 1, frames), dtype=np.float32)
    for i in range(frames):
        st = i * hop
        fr = mono[st: st + n_fft]
        if fr.shape[0] < n_fft:
            fr = np.pad(fr, (0, n_fft - fr.shape[0]))
        s[:, i] = np.abs(np.fft.rfft(fr * win)).astype(np.float32)
    return s


def test_stft_mag_matches_reference(rng):
    x = rng.standard_normal(48000).astype(np.float32)
    ours = np.asarray(stft_mag(jnp.asarray(x), 2048, 512))
    ref = ref_stft_mag(x)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_stft_short_signal_padded():
    x = jnp.ones(100)
    s = stft_mag(x, 2048, 512)
    assert s.shape == (1025, 1)


def test_frame_batched():
    x = jnp.arange(2 * 1000).reshape(2, 1000).astype(jnp.float32)
    fr = frame(x, 256, 128)
    assert fr.shape == (2, num_frames(1000, 256, 128), 256)
    np.testing.assert_allclose(np.asarray(fr[1, 2, :5]),
                               np.asarray(x[1, 256:261]))


def test_istft_perfect_reconstruction(rng):
    x = rng.standard_normal(8192).astype(np.float32)
    n_fft, hop = 512, 128
    spec = stft(jnp.asarray(x), n_fft, hop, window="hann_periodic")
    y = np.asarray(istft(spec, n_fft, hop, x.size))
    # interior perfect reconstruction (edges lack full overlap)
    np.testing.assert_allclose(y[n_fft:-n_fft], x[n_fft: x.size - n_fft], atol=1e-4)


# ---------------- WOLA ----------------

def test_iter_chunks_reference_semantics():
    # reference _iter_chunks (sr node :213-225)
    # the reference breaks as soon as i+L >= total, so (6,4) is last
    spans = iter_chunks(10, 4, 3)
    assert spans == [(0, 4), (3, 4), (6, 4)]
    assert iter_chunks(4, 4, 3) == [(0, 4)]
    assert iter_chunks(5, 4, 3) == [(0, 4), (3, 2)]


def test_chunk_batch_and_identity_stitch(rng):
    """Identity model => WOLA output == input (perfect reconstruction)."""
    x = rng.standard_normal((2, 245760 + 100000)).astype(np.float32)
    win, hop = 245760, 221760
    chunks, starts, lengths = chunk_batch(jnp.asarray(x), win, hop)
    assert chunks.shape[0] == len(iter_chunks(x.shape[1], win, hop))
    out = np.asarray(wola_stitch(chunks, starts, lengths, x.shape[1], win))
    # Hann endpoints are zero, so the very first/last output samples get
    # zero weight and are zeroed — exactly like the reference stitcher.
    np.testing.assert_allclose(out[:, 1:-1], x[:, 1:-1], atol=1e-5)


def test_chunk_batch_pad_to_multiple(rng):
    x = rng.standard_normal((1, 1000)).astype(np.float32)
    chunks, starts, lengths = chunk_batch(jnp.asarray(x), 400, 300, pad_to_multiple=8)
    assert chunks.shape[0] == 8  # 3 real chunks padded to 8
    assert (lengths[3:] == 0).all()
    # dummy rows must CONTINUE the i*hop grid so wola_stitch keeps the
    # dense two-track path (zero-filled starts used to demote the whole
    # mesh-padded fused pipeline to the scalar-slow scatter stitch)
    from egregora_tpu.ops.wola import _regular_hop
    assert _regular_hop(starts, 400) == 300
    out = np.asarray(wola_stitch(chunks, starts, lengths, 1000, 400))
    np.testing.assert_allclose(out[:, 1:-1], x[:, 1:-1], atol=1e-5)


def test_wola_matches_reference_stitch(rng):
    """Our scatter-add stitch == reference loop stitch on random 'predictions'."""
    total, win, hop = 2500, 1024, 900
    spans = iter_chunks(total, win, hop)
    c = 2
    preds_list = []
    rng2 = np.random.default_rng(7)
    for (s, l) in spans:
        preds_list.append(rng2.standard_normal((c, win)).astype(np.float32))

    # reference _wola_stitch (sr node :227-251)
    acc = np.zeros((c, total), np.float32)
    wsum = np.zeros(total, np.float32)
    w_full = np.hanning(win).astype(np.float32)
    for y_cs, (start, l_in) in zip(preds_list, spans):
        l = min(l_in, y_cs.shape[1])
        w = w_full[:l]
        acc[:, start:start + l] += y_cs[:, :l] * w[None, :]
        wsum[start:start + l] += w
    wsum[wsum == 0] = 1.0
    ref = (acc / wsum[None, :]).astype(np.float32)

    preds = jnp.asarray(np.stack(preds_list))
    starts = np.array([s for s, _ in spans], np.int32)
    lengths = np.array([l for _, l in spans], np.int32)
    ours = np.asarray(wola_stitch(preds, starts, lengths, total, win))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_wola_dense_matches_scatter_paths(rng):
    """The regular-grid two-track stitch == the scatter-add fallback,
    incl. zero-length dummy rows from pad_to_multiple; irregular starts
    take the scatter path and still match."""
    from egregora_tpu.ops.wola import (_regular_hop, wola_accumulate,
                                       wola_finalize)
    total, win, hop = 5000, 1024, 900
    k = len(iter_chunks(total, win, hop))
    k_pad = -(-k // 4) * 4
    rng2 = np.random.default_rng(13)
    preds = jnp.asarray(rng2.standard_normal((k_pad, 2, win)).astype(np.float32))
    starts = (np.arange(k_pad) * hop).astype(np.int32)
    lengths = np.zeros(k_pad, np.int32)
    for i, (s, l) in enumerate(iter_chunks(total, win, hop)):
        lengths[i] = l
    assert _regular_hop(starts, win) == hop

    dense = np.asarray(wola_stitch(preds, starts, lengths, total, win))
    acc = jnp.zeros((2, total), jnp.float32)
    wsum = jnp.zeros((total,), jnp.float32)
    acc, wsum = wola_accumulate(preds, starts, lengths, acc, wsum)
    scatter = np.asarray(wola_finalize(acc, wsum))
    np.testing.assert_allclose(dense, scatter, atol=1e-5)

    # irregular grid -> no dense hop; wola_stitch still correct
    irr = starts.copy()
    irr[1] += 3
    assert _regular_hop(irr, win) is None
    out = np.asarray(wola_stitch(preds, irr, lengths, total, win))
    assert np.isfinite(out).all()


def test_frame_strided_matches_gather(rng):
    """Gather-free framing (the TPU fast path) == reference framing."""
    from egregora_tpu.ops.stft import frame_strided
    for t, nfft, hop in [(48000, 2048, 480), (1000, 256, 128),
                         (500, 512, 100), (2048, 2048, 480), (100, 2048, 480)]:
        x = rng.standard_normal((2, t)).astype(np.float32)
        from egregora_tpu.ops.stft import _frame_gather
        a = np.asarray(_frame_gather(jnp.asarray(x), nfft, hop))
        b = np.asarray(frame_strided(jnp.asarray(x), nfft, hop))
        assert a.shape == b.shape, (t, nfft, hop)
        np.testing.assert_array_equal(a, b, err_msg=str((t, nfft, hop)))


def test_fir_same_matches_npconvolve(rng):
    from egregora_tpu.ops.fir import fir_same
    for taps in (255, 64, 17):
        x = rng.standard_normal((2, 5000)).astype(np.float32)
        h = rng.standard_normal(taps).astype(np.float32)
        ref = np.stack([np.convolve(x[c], h, mode="same") for c in range(2)])
        got = np.asarray(fir_same(jnp.asarray(x), h))
        np.testing.assert_allclose(got, ref, atol=5e-4)


# ---------------- dense (gather/scatter-free) iSTFT ----------------

def test_istft_dense_matches_scatter_istft(rng):
    from egregora_tpu.ops.stft import istft_dense
    n_fft, hop, f = 512, 128, 23
    spec = (rng.standard_normal((2, f, n_fft // 2 + 1))
            + 1j * rng.standard_normal((2, f, n_fft // 2 + 1))).astype(np.complex64)
    total = (f - 1) * hop + n_fft
    ref = np.asarray(istft(jnp.asarray(spec), n_fft, hop, total))
    got = np.asarray(istft_dense(jnp.asarray(spec.real), jnp.asarray(spec.imag),
                                 n_fft, hop))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_istft_dense_perfect_reconstruction(rng):
    from egregora_tpu.ops.stft import istft_dense
    x = rng.standard_normal(8192).astype(np.float32)
    n_fft, hop = 1920, 480
    spec = stft(jnp.asarray(x), n_fft, hop, window="hann_periodic")
    y = np.asarray(istft_dense(jnp.real(spec), jnp.imag(spec), n_fft, hop))
    np.testing.assert_allclose(y[n_fft:-n_fft], x[n_fft: y.size - n_fft], atol=1e-4)


def test_istft_dense_requires_integer_overlap():
    from egregora_tpu.ops.stft import istft_dense
    with pytest.raises(ValueError):
        istft_dense(jnp.zeros((1, 4, 257)), jnp.zeros((1, 4, 257)), 512, 100)
