"""Measure host-fetch patterns through the remote-TPU relay.

The full-stitch host path is dominated by device->host transfers; this
times the candidate strategies so Stitcher.stitch can use the fastest:
  a) sequential np.asarray per image
  b) jax.device_get on the list (async copies first)
  c) one fused fp32 concat fetched as a single array
  d) same, cast to uint8 on device (4x fewer bytes)
  e) scalar fetch: float() x4 vs one stacked (4,) fetch

Usage: python tools/exp_fetch.py
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402


def timeit(name, fn, iters=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1000:9.1f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    n, H, W, C = 7, 512, 512, 3
    imgs = [jnp.asarray(rng.uniform(0, 255, (H, W, C)), jnp.float32)
            for _ in range(n)]
    for im in imgs:
        im.block_until_ready()

    @jax.jit
    def fuse(xs):
        return jnp.stack(xs)

    @jax.jit
    def fuse_u8(xs):
        return jnp.clip(jnp.stack(xs), 0, 255).astype(jnp.uint8)

    fused = fuse(imgs)
    fused_u8 = fuse_u8(imgs)
    _ = np.asarray(fused), np.asarray(fused_u8)

    timeit("a) np.asarray x7 sequential",
           lambda: [np.asarray(im) for im in imgs])
    timeit("b) jax.device_get(list of 7)",
           lambda: jax.device_get(imgs))
    timeit("c) stack-on-device + one fetch (fp32)",
           lambda: np.asarray(fuse(imgs)))
    timeit("d) stack-on-device + one fetch (uint8)",
           lambda: np.asarray(fuse_u8(imgs)))

    scalars = [jnp.float32(i) * imgs[0][0, 0, 0] for i in range(4)]

    @jax.jit
    def stack4(xs):
        return jnp.stack(xs)

    st = stack4(scalars)
    _ = np.asarray(st)
    timeit("e1) float() x4 sequential",
           lambda: [float(s) for s in scalars])
    timeit("e2) device_get(list of 4 scalars)",
           lambda: jax.device_get(scalars))
    timeit("e3) stacked (4,) one fetch",
           lambda: np.asarray(stack4(scalars)))


if __name__ == "__main__":
    main()
