"""Batched eval programs (eval/batch.py) == the per-pair engines."""
import jax.numpy as jnp
import numpy as np

from egregora_tpu.eval.align import apply_frac_delay, xcorr_delay
from egregora_tpu.eval.batch import evalpack_report_batch, nullsuite_batch
from egregora_tpu.eval.loudness import loudness_report
from egregora_tpu.eval.metrics import lsd_sisdr_report
from egregora_tpu.eval.nulltest import gain_match, null_test

SR = 48000


def _pairs(p=3, secs=2, seed=0):
    rng = np.random.default_rng(seed)
    a = (rng.standard_normal((p, SR * secs)) * 0.1).astype(np.float32)
    b = a + (rng.standard_normal((p, SR * secs)) * 0.01).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b)


def test_evalpack_batch_matches_per_pair():
    a, b = _pairs()
    rep = evalpack_report_batch(a, b, SR)
    assert all(v.shape == (a.shape[0],) for v in rep.values())
    for i in range(a.shape[0]):
        one = dict(lsd_sisdr_report(a[i], b[i]))
        one.update(loudness_report(b[i][None], SR))
        for k, v in one.items():
            np.testing.assert_allclose(float(rep[k][i]), float(v),
                                       rtol=1e-5, atol=1e-5, err_msg=k)


def test_nullsuite_batch_matches_per_pair():
    p = 3
    a, _ = _pairs(p)
    # distinct integer delays + gains per pair so vmap can't cheat
    b = jnp.stack([jnp.roll(a[i], 100 + 37 * i) * (0.8 + 0.05 * i)
                   for i in range(p)])
    nulls, metrics = nullsuite_batch(a, b, SR, max_shift=SR // 5)
    assert nulls.shape == a.shape
    for i in range(p):
        lag = xcorr_delay(a[i], b[i], max_shift=SR // 5)
        aligned = apply_frac_delay(b[i][None], -lag)
        matched, gain_db, _, _ = gain_match(a[i][None], aligned, SR, mode="RMS")
        null, m = null_test(a[i][None], matched, SR)
        np.testing.assert_allclose(np.asarray(nulls[i]), np.asarray(null[0]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(metrics["delay_samples"][i]),
                                   float(lag), rtol=1e-5)
        np.testing.assert_allclose(float(metrics["gain_db"][i]),
                                   float(gain_db), rtol=1e-4, atol=1e-5)
        for k, v in m.items():
            np.testing.assert_allclose(float(metrics[k][i]), float(v),
                                       rtol=1e-4, atol=1e-4, err_msg=k)
