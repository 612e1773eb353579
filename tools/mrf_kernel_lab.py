"""Standalone MRF stage-2 (C=64, T=245760, B=8) kernel shootout.

Variants:
  xla-nwc   : the flax MRF module (NWC convs, what apply_fused avoids)
  pallas    : ops/mrf_pallas.mrf_fused_cm (current fused path)
  xla-cm    : channel-major dense: static time-slices + per-tap einsums
              (no Mosaic constraints, traffic = logical bytes)

Cost floors at this geometry: conv FLOPs 2.03e12 -> ~10 ms at v5e bf16
peak with full 704-wide contractions, ~20 ms at per-tap C=64
contractions; dense HBM traffic (18 convs x rw) ~9 GB -> ~11 ms.
PYTHONPATH=/root/repo:/root/.axon_site python tools/mrf_kernel_lab.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from egregora_tpu.models.flashsr.vocoder import MRF
from egregora_tpu.ops.mrf_pallas import mrf_fused_cm

KERNELS = (3, 7, 11)
DILS = (1, 3, 5)
C, T, B = 64, 245760, 8
DT = jnp.bfloat16


def sync(a):
    a.block_until_ready()
    return float(np.asarray(a.reshape(-1)[:1])[0])


def timeit(fn, *args, n=6):
    sync(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        sync(fn(*args))
        best = min(best, time.time() - t0)
    return best


def mrf_cm_dense(x_cm, weights, kernels=KERNELS, dilations=DILS):
    """Channel-major dense MRF: ``[B, C, T] -> [B, C, T]``, same
    semantics as the flax module ('SAME' zero padding, bf16 casts,
    branch mean).  Each conv is k static time-slices of the padded
    activation contracted per tap on the MXU — T stays on the minor
    axis (dense), C on sublanes (C=64 = 4 bf16 tiles, no padding)."""
    def conv_cm(a, w_cat, bias, k, d):
        c, t = a.shape[1], a.shape[2]
        p = (k - 1) // 2 * d
        ap = jnp.pad(a, ((0, 0), (0, 0), (p, p)))
        y = None
        for j in range(k):
            yj = jnp.einsum(
                "co,bct->bot", w_cat[j * c:(j + 1) * c, :],
                jax.lax.slice_in_dim(ap, j * d, j * d + t, axis=2),
                preferred_element_type=jnp.float32)
            y = yj if y is None else y + yj
        return y.astype(a.dtype) + bias[None, :, :]

    def leaky(v):
        return jnp.maximum(v, 0.1 * v)

    acc = None
    wi = 0
    for k in kernels:
        cur = x_cm
        for d in dilations:
            w1, b1, w2, b2 = weights[wi]
            wi += 1
            c1 = conv_cm(leaky(cur), w1, b1, k, d)
            c2 = conv_cm(leaky(c1), w2, b2, k, 1)
            cur = cur + c2
        acc = cur if acc is None else acc + cur
    return acc / float(len(kernels))


def mrf_packed_nwc(x, p, g=2, kernels=KERNELS, dilations=DILS):
    """Batch-packed NWC MRF: fold ``g`` batch items into the channel
    axis ([B, T, C] -> [B/g, T, g*C]) and run every conv with
    ``feature_group_count=g`` (kernel tiled along the out axis — each
    group applies the SAME weights to its own item).  At C=64 the plain
    NWC layout pads 2x into the 128-wide lanes; packed, the tensor is
    exactly lane-wide and traffic is logical bytes.  Same math
    otherwise (SAME zero padding, bf16 casts, branch mean)."""
    b, t, c = x.shape
    m = b // g
    xp = x.reshape(g, m, t, c).transpose(1, 2, 0, 3).reshape(m, t, g * c)

    def conv(a, w, bias, d):
        wg = jnp.concatenate([w.astype(DT)] * g, axis=-1)   # [k, C, g*C]
        y = jax.lax.conv_general_dilated(
            a, wg, window_strides=(1,), padding="SAME",
            rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=g, preferred_element_type=jnp.float32)
        return y.astype(a.dtype) + jnp.concatenate([bias.astype(DT)] * g)

    def leaky(v):
        return jnp.maximum(v, 0.1 * v)

    acc = None
    for bi, k in enumerate(kernels):
        sub = p[f"ResBlock1D_{bi}"]
        cur = xp
        for mi, d in enumerate(dilations):
            c1 = conv(leaky(cur), jnp.asarray(sub[f"Conv_{2*mi}"]["kernel"]),
                      jnp.asarray(sub[f"Conv_{2*mi}"]["bias"]), d)
            c2 = conv(leaky(c1), jnp.asarray(sub[f"Conv_{2*mi+1}"]["kernel"]),
                      jnp.asarray(sub[f"Conv_{2*mi+1}"]["bias"]), 1)
            cur = cur + c2
        acc = cur if acc is None else acc + cur
    out = acc / float(len(kernels))
    return out.reshape(m, t, g, c).transpose(2, 0, 1, 3).reshape(b, t, c)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x_nwc = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 0.3,
                        DT)
    x_cm = jnp.swapaxes(x_nwc, -1, -2)
    mrf = MRF(C, KERNELS, (DILS,) * 3, DT)
    params = mrf.init(jax.random.PRNGKey(0), x_nwc[:1, :256])

    # pack weights like pack_resblock_weights does
    weights = []
    p = params["params"]
    for bi, k in enumerate(KERNELS):
        sub = p[f"ResBlock1D_{bi}"]
        for m in range(len(DILS)):
            w1 = jnp.asarray(sub[f"Conv_{2*m}"]["kernel"], DT)
            b1 = jnp.asarray(sub[f"Conv_{2*m}"]["bias"], DT)
            w2 = jnp.asarray(sub[f"Conv_{2*m+1}"]["kernel"], DT)
            b2 = jnp.asarray(sub[f"Conv_{2*m+1}"]["bias"], DT)
            kk, ci, co = w1.shape
            weights.append((w1.reshape(kk * ci, co), b1.reshape(-1, 1),
                            w2.reshape(kk * ci, co), b2.reshape(-1, 1)))

    f_nwc = jax.jit(lambda p, x: mrf.apply(p, x).sum())
    f_pal = jax.jit(lambda x: mrf_fused_cm(x, weights, KERNELS, DILS).sum())
    f_cm = jax.jit(lambda x: mrf_cm_dense(x, weights).sum())

    null = jax.jit(lambda v: v.sum())
    over = timeit(null, x_cm)
    print(f"null overhead: {over*1e3:.1f} ms", flush=True)

    # equivalence check on a small slice first (cheap compile)
    xs_nwc = x_nwc[:1, :2048]
    xs_cm = jnp.swapaxes(xs_nwc, -1, -2)
    r_ref = mrf.apply(params, xs_nwc)
    r_cm = jnp.swapaxes(mrf_cm_dense(xs_cm, weights), -1, -2)
    d = float(jnp.max(jnp.abs(r_ref.astype(jnp.float32) - r_cm.astype(jnp.float32))))
    print(f"xla-cm vs module max|delta| {d:.4f}", flush=True)
    xs2 = x_nwc[:2, :2048]
    r_pk = mrf_packed_nwc(xs2, p)
    d2 = float(jnp.max(jnp.abs(mrf.apply(params, xs2).astype(jnp.float32)
                               - r_pk.astype(jnp.float32))))
    print(f"packed vs module max|delta| {d2:.4f}", flush=True)

    f_pk = jax.jit(lambda x: mrf_packed_nwc(x, p).sum())
    for name, fn, arg in (("xla-nwc", f_nwc, None), ("pallas", f_pal, x_cm),
                          ("xla-cm", f_cm, x_cm), ("packed", f_pk, x_nwc)):
        dt = timeit(f_nwc, params, x_nwc) if arg is None else timeit(fn, arg)
        print(f"{name:8s} {dt*1e3:8.1f} ms wall  {(dt-over)*1e3:8.1f} over-null",
              flush=True)


if __name__ == "__main__":
    main()
