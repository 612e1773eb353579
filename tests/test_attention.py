"""ops.attention: the chunked path must be exact (it is the numerics
reference every faster engine is pinned against; the UNet/VAE shipped
weights were trained through it)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egregora_tpu.ops import attention


def _naive(q, k, v):
    d = q.shape[-1]
    s = (q.astype(jnp.float32) * d ** -0.5) @ k.astype(jnp.float32).swapaxes(-1, -2)
    return (jax.nn.softmax(s, axis=-1) @ v.astype(jnp.float32)).astype(v.dtype)


@pytest.mark.parametrize("n", [64, 256, 300, 512])
def test_chunked_matches_naive(n):
    rng = np.random.default_rng(0)
    q, k, v = [jnp.asarray(rng.standard_normal((3, n, 16)).astype(np.float32))
               for _ in range(3)]
    out = attention.chunked_attention(q, k, v, block=128)
    ref = _naive(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mha_heads_are_independent():
    """mha on [B,H,N,D] must equal per-head chunked attention (the
    layout the LDM UNet's head split produces)."""
    rng = np.random.default_rng(1)
    b, h, n, d = 2, 4, 128, 8
    q, k, v = [jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
               for _ in range(3)]
    out = attention.mha(q, k, v)
    for bi in range(b):
        for hi in range(h):
            ref = _naive(q[bi, hi][None], k[bi, hi][None], v[bi, hi][None])[0]
            np.testing.assert_allclose(np.asarray(out[bi, hi]),
                                       np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_mha_bf16_close():
    rng = np.random.default_rng(2)
    q, k, v = [jnp.asarray(rng.standard_normal((2, 2, 256, 32))
                           .astype(np.float32)).astype(jnp.bfloat16)
               for _ in range(3)]
    out = attention.mha(q, k, v).astype(jnp.float32)
    ref = _naive(q.astype(jnp.float32), k.astype(jnp.float32),
                 v.astype(jnp.float32))
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-2
