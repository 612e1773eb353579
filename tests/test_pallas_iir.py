"""Pallas IIR kernel vs associative-scan reference (interpret mode on CPU)."""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import egregora_tpu.ops.pallas_iir as P
from egregora_tpu.ops.iir import first_order_lowpass


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """CPU tests run the kernel through the Pallas interpreter."""
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    # the module captured pl.pallas_call at import; patch its reference too
    monkeypatch.setattr(P.pl, "pallas_call",
                        functools.partial(P.pl.pallas_call.__wrapped__
                                          if hasattr(P.pl.pallas_call, "__wrapped__")
                                          else pl.pallas_call, interpret=True),
                        raising=False)
    yield


@pytest.mark.parametrize("n", [100, P.BLOCK, P.BLOCK * 2 + 777])
def test_matches_associative_scan(n, rng):
    k = math.exp(-2 * math.pi * 60.0 / 24000)
    x = rng.standard_normal((2, n)).astype(np.float32)
    ref = np.asarray(first_order_lowpass(jnp.asarray(x), k))
    got = np.asarray(P.iir_lowpass_pallas(jnp.asarray(x), k))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_cross_block_carry(rng):
    """A unit impulse decays smoothly across the 32768-sample block
    boundary — the SMEM carry must survive grid steps."""
    k = 0.999
    n = P.BLOCK + 512
    x = np.zeros((1, n), np.float32)
    x[0, 10] = 1.0
    got = np.asarray(P.iir_lowpass_pallas(jnp.asarray(x), k))[0]
    # analytic: z[n] = (1-k) k^(n-10) for n >= 10
    idx = np.array([10, 1000, P.BLOCK - 1, P.BLOCK, P.BLOCK + 100])
    expect = (1 - k) * k ** (idx - 10)
    np.testing.assert_allclose(got[idx], expect, rtol=1e-3)
