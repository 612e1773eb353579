"""Bit-parity tests against the ACTUAL reference implementation.

Imports the reference modules from /root/reference (read-only) and runs
their pure-NumPy DSP as oracles against our XLA implementations on
random signals.  Skipped wholesale if the reference tree or its imports
are unavailable (e.g. in a standalone checkout).
"""
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REF_PATH = "/root/reference"


def _ref_module(name):
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    return pytest.importorskip(name)


@pytest.fixture(scope="module")
def ref_eval():
    return _ref_module("egregora_audio_eval_pack")


@pytest.fixture(scope="module")
def ref_null():
    return _ref_module("egregora_null_test_suite")


@pytest.fixture(scope="module")
def sig(rng):
    sr = 48000
    t = np.arange(int(sr * 1.5)) / sr
    x = (0.25 * np.sin(2 * np.pi * 330 * t)
         + 0.1 * np.sin(2 * np.pi * 1700 * t + 0.7)
         + 0.04 * np.random.default_rng(42).standard_normal(t.size)
         ).astype(np.float32)
    return x, sr


def test_integrated_lufs_parity(ref_eval, sig):
    from egregora_tpu.eval.loudness import integrated_lufs
    x, sr = sig
    ref = ref_eval.integrated_lufs(ref_eval.make_audio(sr, x[None].copy()))
    ours = float(integrated_lufs(jnp.asarray(x[None]), sr))
    assert abs(ours - ref) < 0.01


def test_lufs_series_parity(ref_eval, sig):
    from egregora_tpu.eval.loudness import lufs_series
    x, sr = sig
    ref = ref_eval.lufs_series(ref_eval.make_audio(sr, x[None].copy()), 0.4, 0.1)
    ours = np.asarray(lufs_series(jnp.asarray(x[None]), sr, 0.4, 0.1))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=0.02)


def test_lra_parity(ref_eval, sig):
    from egregora_tpu.eval.loudness import lra_short_term
    x, sr = sig
    # amplitude-modulated so LRA is non-trivial
    mod = (0.2 + 0.8 * (np.arange(x.size) > x.size // 2)).astype(np.float32)
    xm = (x * mod)[None]
    ref = ref_eval.lra_short_term(ref_eval.make_audio(sr, xm.copy()))
    ours = float(lra_short_term(jnp.asarray(xm), sr))
    assert abs(ours - ref) < 0.05


def test_true_peak_parity(ref_eval, sig):
    from egregora_tpu.eval.loudness import true_peak_dbfs
    x, sr = sig
    ref = ref_eval.true_peak_dbfs(ref_eval.make_audio(sr, x[None].copy()), oversample=4)
    ours = float(true_peak_dbfs(jnp.asarray(x[None]), sr, 4))
    # different resampler kernels (soxr-class Kaiser vs scipy default);
    # true peak of a band-limited signal agrees to ~0.1 dB
    assert abs(ours - ref) < 0.1


def test_stft_mag_and_lsd_parity(ref_eval, sig, rng):
    from egregora_tpu.eval.metrics import lsd
    from egregora_tpu.ops.stft import stft_mag
    x, sr = sig
    y = x + 0.01 * np.random.default_rng(7).standard_normal(x.size).astype(np.float32)
    ref_sa = ref_eval._stft_mag(x)
    ref_sb = ref_eval._stft_mag(y)
    our_sa = np.asarray(stft_mag(jnp.asarray(x)))
    np.testing.assert_allclose(our_sa, ref_sa, atol=3e-4)
    ref_m, ref_p = ref_eval._lsd(ref_sa, ref_sb)
    m, p95 = lsd(jnp.asarray(ref_sa), jnp.asarray(ref_sb))
    assert abs(float(m) - ref_m) < 2e-3
    assert abs(float(p95) - ref_p) < 2e-2


def test_si_sdr_parity(ref_eval, sig):
    from egregora_tpu.eval.metrics import si_sdr
    x, sr = sig
    y = x + 0.02 * np.random.default_rng(3).standard_normal(x.size).astype(np.float32)
    ref = ref_eval._si_sdr(x, y)
    ours = float(si_sdr(jnp.asarray(x), jnp.asarray(y)))
    assert abs(ours - ref) < 0.05


def test_xcorr_delay_parity(ref_null, sig):
    from egregora_tpu.eval.align import xcorr_delay
    x, sr = sig
    for d_true in (0, 37, -211):
        b = np.roll(x, d_true)
        if d_true > 0:
            b[:d_true] = 0
        elif d_true < 0:
            b[d_true:] = 0
        ref = ref_null._xcorr_delay(x, b, sr, 9600)
        ours = float(xcorr_delay(jnp.asarray(x), jnp.asarray(b), 9600))
        assert abs(ours - ref) < 2e-3, f"d_true={d_true}"


def test_frac_delay_parity(ref_null, sig):
    from egregora_tpu.eval.align import apply_frac_delay
    x, sr = sig
    x_cn = x[None, :8192]
    for d in (4.6, -12.3, 0.15):
        ref = ref_null._apply_frac_delay_CN(x_cn.copy(), d, taps=64)
        ours = np.asarray(apply_frac_delay(jnp.asarray(x_cn), jnp.asarray(d), 64))
        np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_band_energy_parity(ref_null, sig):
    from egregora_tpu.eval.metrics import band_energy_hi_db
    x, sr = sig
    ref = ref_null._band_energy_hi_db(x[None], sr, 8000.0)
    ours = float(band_energy_hi_db(jnp.asarray(x[None]), sr, 8000.0))
    assert abs(ours - ref) < 0.05


def test_gain_match_node_parity(ref_null, sig):
    """Whole-node comparison: our Audio Gain Match vs the reference's."""
    import egregora_tpu
    from egregora_tpu.nodes.base import comfy_audio
    x, sr = sig
    quiet = (0.4 * x)[None]
    ref_node = ref_null.Audio_Gain_Match()
    r_out, r_gain, r_ref, r_in = ref_node.execute(
        ref_null.make_audio(sr, x[None].copy()),
        ref_null.make_audio(sr, quiet.copy()))
    our_node = egregora_tpu.NODE_CLASS_MAPPINGS["Audio Gain Match"]()
    o_out, o_gain, o_ref, o_in = our_node.execute(
        comfy_audio(sr, x[None]), comfy_audio(sr, quiet))
    assert abs(o_gain - r_gain) < 0.01
    assert abs(o_ref - r_ref) < 0.01
    np.testing.assert_allclose(o_out["samples"], r_out["samples"], atol=2e-4)


def test_null_test_node_parity(ref_null, sig):
    import egregora_tpu
    from egregora_tpu.nodes.base import comfy_audio
    x, sr = sig
    b = (0.9 * np.roll(x, 3)).astype(np.float32)
    b[:3] = 0
    r_audio, r_metrics = ref_null.Audio_Null_Test().execute(
        ref_null.make_audio(sr, x[None].copy()),
        ref_null.make_audio(sr, b[None].copy()),
        least_squares_scale=True, compute_hf_residual=True)
    o_audio, o_metrics = egregora_tpu.NODE_CLASS_MAPPINGS["Audio Null Test"]().execute(
        comfy_audio(sr, x[None]), comfy_audio(sr, b[None]),
        least_squares_scale=True, compute_hf_residual=True)
    for k in ("corr_coef", "null_rms_dbfs", "null_lufs", "lsd_mean_db",
              "scale_k", "hf_residual_db"):
        assert abs(o_metrics[k] - r_metrics[k]) < 0.05, k
    assert o_metrics["overshoot_count"] == r_metrics["overshoot_count"]
    np.testing.assert_allclose(o_audio["samples"], r_audio["samples"], atol=1e-4)


def test_normalize_cn_parity(ref_null, rng):
    from egregora_tpu.core.audio import normalize_cn
    shapes = [(100,), (100, 2), (2, 100), (1, 2, 100), (3, 2, 100)]
    for shp in shapes:
        a = np.random.default_rng(0).standard_normal(shp).astype(np.float32)
        np.testing.assert_array_equal(normalize_cn(a.copy()),
                                      ref_null._normalize_CN(a.copy()), err_msg=str(shp))
