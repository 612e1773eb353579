"""Nearest-neighbor 2x spatial upsampling as a broadcast-reshape.

``jax.image.resize(method="nearest")`` lowers to a gather on TPU; at
the FlashSR bench geometry the decoder's two upsamples alone cost
17.5 ms of a 98 ms stage and the LDM UNet's two cost more (round-5
tools/vae_lab.py / tools/unet_lab.py, quiet TPU, B=26).  For the
integer-factor nearest case the result is EXACTLY pixel duplication,
which XLA turns into a free layout change when expressed as
broadcast + reshape — zero FLOPs, no gather.

Reference parity: upstream uses torch ``F.interpolate(scale_factor=2,
mode="nearest")`` inside the AudioLDM VAE decoder and CompVis UNet
upsample blocks; for integer factors torch nearest == floor-index
duplication == this broadcast.
"""
import jax.numpy as jnp


def upsample2x_nearest(h: jnp.ndarray) -> jnp.ndarray:
    """[B, F, M, C] -> [B, 2F, 2M, C] by exact pixel duplication."""
    b, f, m, c = h.shape
    h = jnp.broadcast_to(h[:, :, None, :, None, :], (b, f, 2, m, 2, c))
    return h.reshape(b, f * 2, m * 2, c)
