import math

import jax.numpy as jnp
import numpy as np
import pytest

from egregora_tpu.eval.align import apply_frac_delay, pad_or_crop, xcorr_delay
from egregora_tpu.eval.metrics import band_energy_hi_db, corr_coef, lsd, si_sdr
from egregora_tpu.eval.nulltest import gain_match, null_test
from egregora_tpu.ops.stft import stft_mag


@pytest.fixture
def signal(rng):
    sr = 48000
    t = np.arange(sr * 2) / sr
    x = (0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    return x, sr


# ---------------- SI-SDR ----------------

def test_si_sdr_identity_is_huge(signal):
    x, _ = signal
    assert float(si_sdr(jnp.asarray(x), jnp.asarray(x))) > 80.0


def test_si_sdr_known_snr(signal, rng):
    x, _ = signal
    noise = rng.standard_normal(x.size).astype(np.float32)
    noise *= np.linalg.norm(x) / np.linalg.norm(noise) / 10 ** (20 / 20)  # 20 dB
    got = float(si_sdr(jnp.asarray(x), jnp.asarray(x + noise)))
    assert abs(got - 20.0) < 0.2


def test_si_sdr_scale_invariance(signal):
    x, _ = signal
    a = float(si_sdr(jnp.asarray(x), jnp.asarray(2.5 * x)))
    assert a > 80.0


# ---------------- LSD ----------------

def test_lsd_identical_is_zero(signal):
    x, _ = signal
    s = stft_mag(jnp.asarray(x))
    m, p95 = lsd(s, s)
    assert float(m) < 1e-3 and float(p95) < 1e-3


def test_lsd_matches_reference(signal, rng):
    x, _ = signal
    y = x + 0.01 * rng.standard_normal(x.size).astype(np.float32)
    sa = np.asarray(stft_mag(jnp.asarray(x)))
    sb = np.asarray(stft_mag(jnp.asarray(y)))
    eps = 1e-12
    la, lb = 20 * np.log10(sa + eps), 20 * np.log10(sb + eps)
    per = np.sqrt(np.mean((la - lb) ** 2, axis=0) + 1e-12)
    ref_m, ref_p = float(np.mean(per)), float(np.percentile(per, 95))
    m, p = lsd(jnp.asarray(sa), jnp.asarray(sb))
    assert abs(float(m) - ref_m) < 1e-3
    assert abs(float(p) - ref_p) < 1e-2


# ---------------- alignment ----------------

def test_xcorr_integer_delay_reference_parity(signal):
    """Matches the reference estimator exactly — including its -1 bias."""
    x, sr = signal
    d_true = 137
    b = np.zeros_like(x)
    b[d_true:] = x[:-d_true]
    d = float(xcorr_delay(jnp.asarray(x), jnp.asarray(b), 9600))
    assert abs(d - (d_true - 1)) < 0.05          # reference behavior
    d_fixed = float(xcorr_delay(jnp.asarray(x), jnp.asarray(b), 9600, bias_fix=True))
    assert abs(d_fixed - d_true) < 0.05


def test_xcorr_negative_delay(signal):
    x, sr = signal
    d_true = -200
    b = np.zeros_like(x)
    b[:d_true] = x[-d_true:]
    d = float(xcorr_delay(jnp.asarray(x), jnp.asarray(b), 9600, bias_fix=True))
    assert abs(d - d_true) < 0.1


def test_frac_delay_int_part(signal):
    x, _ = signal
    y = np.asarray(apply_frac_delay(jnp.asarray(x[None]), jnp.asarray(5.0)))
    np.testing.assert_allclose(y[0, 5:1000], x[:995], atol=1e-6)
    assert np.all(y[0, :5] == 0)


def test_frac_delay_matches_reference(signal):
    """Reference _apply_frac_delay_CN (null suite :240-265) as oracle."""
    x, _ = signal
    x_cn = x[None, :4096]

    def ref_apply(xa, delay_samples, taps=64):
        c, n = xa.shape
        int_d = int(math.floor(abs(delay_samples)))
        frac = abs(delay_samples) - int_d
        sign = 1 if delay_samples >= 0 else -1
        y = np.zeros((c, n), dtype=np.float32)
        if sign > 0:
            if int_d < n:
                y[:, int_d:] = xa[:, : n - int_d]
        else:
            if int_d < n:
                y[:, : n - int_d] = xa[:, int_d:]
        if frac > 1e-6:
            m = max(16, int(taps))
            nn = np.arange(m)
            mid = (m - 1) / 2.0
            h = np.sinc(nn - mid - frac)
            w = np.hanning(m)
            h = (h * w).astype(np.float32)
            h /= np.sum(h)
            for c_ in range(c):
                y[c_] = np.convolve(y[c_], h, mode="same").astype(np.float32)
        return y

    for d in (3.3, -7.8, 0.25, -0.6):
        ref = ref_apply(x_cn, d)
        ours = np.asarray(apply_frac_delay(jnp.asarray(x_cn), jnp.asarray(d)))
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_align_roundtrip_deep_null(signal):
    """Align+subtract on an integer-delayed copy nulls deeply (bias_fix)."""
    x, sr = signal
    d_true = 37
    b = np.zeros_like(x)
    b[d_true:] = x[:-d_true]
    d = xcorr_delay(jnp.asarray(x), jnp.asarray(b), 9600, bias_fix=True)
    # node's fractional=False semantics: round before applying
    aligned = np.asarray(apply_frac_delay(jnp.asarray(b[None]),
                                          jnp.round(-d), 64))[0]
    seg = slice(1000, x.size - 1000)
    err_db = 10 * np.log10(np.mean((x[seg] - aligned[seg]) ** 2)
                           / np.mean(x[seg] ** 2) + 1e-20)
    assert err_db < -60.0


def test_align_fractional_improves(signal):
    """Fractional alignment reduces the residual vs doing nothing, even
    with the reference's always-positive-frac FIR quirk (delay applied is
    -d, so use a leading b => -d positive => quirk-free path)."""
    x, sr = signal
    shift = -41.37  # b leads a
    spec = np.fft.rfft(x)
    f = np.fft.rfftfreq(x.size)
    b = np.fft.irfft(spec * np.exp(-2j * np.pi * f * shift), n=x.size).astype(np.float32)
    d = xcorr_delay(jnp.asarray(x), jnp.asarray(b), 9600, bias_fix=True)
    assert abs(float(d) - shift) < 0.5
    aligned = np.asarray(apply_frac_delay(jnp.asarray(b[None]), -d, 64))[0]
    seg = slice(1000, x.size - 1000)
    before = np.mean((x[seg] - b[seg]) ** 2)
    after = np.mean((x[seg] - aligned[seg]) ** 2)
    assert 10 * np.log10(after / before) < -10.0


def test_pad_or_crop():
    x = jnp.ones((2, 10))
    assert pad_or_crop(x, 10).shape == (2, 10)
    assert pad_or_crop(x, 5).shape == (2, 5)
    y = pad_or_crop(x, 15)
    assert y.shape == (2, 15) and float(y[0, -1]) == 0.0


# ---------------- gain match / null test ----------------

def test_gain_match_recovers_known_gain(signal):
    x, sr = signal
    quiet = (x * 10 ** (-6.0 / 20)).astype(np.float32)
    matched, gain_db, _, _ = gain_match(jnp.asarray(x[None]), jnp.asarray(quiet[None]),
                                        sr, mode="LUFS-I")
    assert abs(float(gain_db) - 6.0) < 0.05
    np.testing.assert_allclose(np.asarray(matched)[0], x, atol=2e-3)


def test_gain_match_clamp(signal):
    x, sr = signal
    quiet = (x * 10 ** (-30.0 / 20)).astype(np.float32)
    _, gain_db, _, _ = gain_match(jnp.asarray(x[None]), jnp.asarray(quiet[None]),
                                  sr, mode="RMS", max_gain_db=12.0)
    assert abs(float(gain_db) - 12.0) < 1e-4


def test_null_test_identical_inputs(signal):
    x, sr = signal
    null, metrics = null_test(jnp.asarray(x[None]), jnp.asarray(x[None]), sr,
                              compute_hf_residual=True)
    assert float(jnp.max(jnp.abs(null))) == 0.0
    assert float(metrics["null_rms_dbfs"]) < -190.0
    assert abs(float(metrics["corr_coef"]) - 1.0) < 1e-4
    assert float(metrics["overshoot_count"]) == 0
    assert float(metrics["scale_k"]) == 1.0


def test_null_test_least_squares_scale(signal):
    x, sr = signal
    b = (0.5 * x).astype(np.float32)
    null, metrics = null_test(jnp.asarray(x[None]), jnp.asarray(b[None]), sr,
                              least_squares_scale=True)
    assert abs(float(metrics["scale_k"]) - 2.0) < 1e-3
    assert float(metrics["null_rms_dbfs"]) < -60.0


def test_band_energy_hi(signal):
    x, sr = signal  # 440 Hz tone + small noise
    db = float(band_energy_hi_db(jnp.asarray(x[None]), sr, 8000.0))
    assert db < -10.0  # almost no HF energy
    hf = (0.3 * np.sin(2 * np.pi * 15000 * np.arange(sr) / sr)).astype(np.float32)
    db_hf = float(band_energy_hi_db(jnp.asarray(hf[None]), sr, 8000.0))
    assert db_hf > -1.0
