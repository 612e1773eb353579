"""Matmul-FFT (ops/fft.py) correctness vs numpy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egregora_tpu.ops.fft import fft_mm, irfft_mm, rfft_mm

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.mark.parametrize("n", [64, 256, 4096, 65536, 1 << 20])
def test_rfft_matches_numpy(n, rng):
    x = rng.standard_normal(n).astype(np.float32)
    r, i = rfft_mm(jnp.asarray(x))
    got = np.asarray(r) + 1j * np.asarray(i)
    ref = np.fft.rfft(x)
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 5e-6


@pytest.mark.parametrize("n", [256, 32768])
def test_irfft_roundtrip(n, rng):
    x = rng.standard_normal((2, n)).astype(np.float32)
    r, i = rfft_mm(jnp.asarray(x))
    back = np.asarray(irfft_mm(r, i, n))
    np.testing.assert_allclose(back, x, atol=2e-5)


def test_complex_fft_and_inverse(rng):
    n = 8192
    xr = rng.standard_normal(n).astype(np.float32)
    xi = rng.standard_normal(n).astype(np.float32)
    fr, fi = fft_mm(jnp.asarray(xr), jnp.asarray(xi))
    ref = np.fft.fft(xr + 1j * xi)
    got = np.asarray(fr) + 1j * np.asarray(fi)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 5e-6
    br, bi = fft_mm(fr, fi, inverse=True)
    np.testing.assert_allclose(np.asarray(br) / n, xr, atol=2e-5)
    np.testing.assert_allclose(np.asarray(bi) / n, xi, atol=2e-5)


def test_ist_same_result_both_fft_paths(rng):
    from egregora_tpu.ops.spectral import ist_upscale
    x = (0.4 * np.sin(2 * np.pi * 440 * np.arange(4096) / 16000)
         ).astype(np.float32)[None]
    a = np.asarray(ist_upscale(jnp.asarray(x), 2, 10, 0.3, use_matmul_fft=False))
    b = np.asarray(ist_upscale(jnp.asarray(x), 2, 10, 0.3, use_matmul_fft=True))
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_alias_factors_contract():
    """n1*n2 == n, f | n2, both <= 4096 — the layout contract the
    fold-domain IST path relies on (ops/fft.alias_factors)."""
    from egregora_tpu.ops.fft import alias_factors
    for n, f in ((2880000, 6), (2880000, 2), (8192, 2), (3000, 6), (2400, 4)):
        n1, n2 = alias_factors(n, f)
        assert n1 * n2 == n and n2 % f == 0
        assert n1 <= 4096 and n2 <= 4096
    assert alias_factors(2400, 7) is None       # 7 divides no valid pair
    assert alias_factors(2401, 2) is None       # odd n, f=2


def test_ist_fold_domain_matches_native_mixed_radix(rng):
    """The fold-domain (no per-iteration FFT) IST path must match the
    native-FFT time-domain loop on a mixed-radix length and factor 6
    (the fat-llama bench shape family: aliasing fold + permuted-layout
    observation spectrum)."""
    from egregora_tpu.ops.fft import alias_factors, balanced_factors
    from egregora_tpu.ops.spectral import ist_upscale
    s, f = 500, 6                                # n_up = 3000 = 50 x 60
    assert balanced_factors(s * f) and alias_factors(s * f, f)
    t = np.arange(s) / 4000.0
    x = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 870 * t)
         ).astype(np.float32)[None]
    a = np.asarray(ist_upscale(jnp.asarray(x), f, 12, 0.3, use_matmul_fft=False))
    b = np.asarray(ist_upscale(jnp.asarray(x), f, 12, 0.3, use_matmul_fft=True))
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_permuted_bases_plumbing():
    """Explicit bases= (the loop-hoisting path in ops/spectral) must
    reproduce the default construction bit-for-bit."""
    import numpy as np
    from egregora_tpu.ops.fft import (irfft_permuted, permuted_fft_bases,
                                      rfft_permuted)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 1536)).astype(np.float32))
    bases = permuted_fft_bases(1536)
    r0, i0, f0 = rfft_permuted(x)
    r1, i1, f1 = rfft_permuted(x, bases=bases)
    assert f0 == f1 == tuple(bases["factors"])
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    y0 = irfft_permuted(r0, i0, 1536)
    y1 = irfft_permuted(r1, i1, 1536, bases=bases)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x), atol=2e-4)
