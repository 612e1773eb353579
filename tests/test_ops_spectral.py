import jax.numpy as jnp
import numpy as np
import pytest

from egregora_tpu.ops.spectral import (ist_upscale, source_bitrate_kbps, spectral_enhance,
                                       upscale_factor)


def test_upscale_factor():
    # 16 kHz mono 16-bit = 256 kbps; CD bitrate 1411 -> factor 6
    assert upscale_factor(16000, 1, 1411) == 6
    # 44.1 kHz stereo = 1411.2 kbps -> factor 1
    assert upscale_factor(44100, 2, 1411) == 1
    assert source_bitrate_kbps(44100, 2) == pytest.approx(1411.2)


def test_ist_preserves_observations(rng):
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)).astype(np.float32)[None]
    y = np.asarray(ist_upscale(jnp.asarray(x), 3, 20, 0.6))
    assert y.shape == (1, 24000)
    # data consistency: every 3rd sample equals the input
    np.testing.assert_allclose(y[0, ::3], x[0], atol=1e-5)


def test_ist_zero_iterations_is_interpolation(rng):
    x = rng.standard_normal((1, 100)).astype(np.float32)
    y = np.asarray(ist_upscale(jnp.asarray(x), 2, 0, 0.6))
    # with 0 iterations only the final data-consistency clamp runs on the
    # lowpass-interpolated init
    np.testing.assert_allclose(y[0, ::2], x[0], atol=1e-6)
    assert np.sqrt(np.mean(y[0, 1::2] ** 2)) > 0.1  # interpolated, not zeros


def test_ist_fills_gaps_for_sparse_signal():
    """A pure tone is 1-sparse in frequency: IST must interpolate the
    missing samples close to the true continuous tone (compressed sensing
    recovery), i.e. the inter-sample values are non-zero and tone-like."""
    sr, f = 16000, 440.0
    n = 4096
    x = np.sin(2 * np.pi * f * np.arange(n) / sr).astype(np.float32)[None]
    y = np.asarray(ist_upscale(jnp.asarray(x), 2, 100, 0.1))[0]
    true = np.sin(2 * np.pi * f * np.arange(2 * n) / (2 * sr)).astype(np.float32)
    seg = slice(200, -200)
    err = y[seg] - true[seg]
    sdr = 10 * np.log10(np.sum(true[seg] ** 2) / (np.sum(err ** 2) + 1e-20))
    assert sdr > 20.0


def test_spectral_enhance_post_passes(rng):
    x = (2.0 * rng.standard_normal((1, 2000))).astype(np.float32)
    y = np.asarray(spectral_enhance(jnp.asarray(x), 2, 5, 0.6,
                                    toggle_normalize=True, toggle_autoscale=False))
    assert np.max(np.abs(y)) <= 0.9901
    y2 = np.asarray(spectral_enhance(jnp.asarray(x), 2, 5, 0.6,
                                     toggle_normalize=False, toggle_autoscale=True))
    in_rms = np.sqrt(np.mean(x ** 2))
    out_rms = np.sqrt(np.mean(y2 ** 2))
    assert abs(out_rms - in_rms) / in_rms < 1e-3


def test_no_nans(rng):
    x = np.zeros((2, 1000), np.float32)  # silence must not NaN
    y = np.asarray(spectral_enhance(jnp.asarray(x), 2, 10, 0.6))
    assert np.all(np.isfinite(y))
