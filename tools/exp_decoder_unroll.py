"""Experiment: decoder-scan unroll factor (cross-iteration fusion).

Round 3's perf campaign ended on "the remaining step time is dispatch/
fusion glue — further MFU needs fewer/bigger ops (fusion across layers)".
The cheapest such lever for the MemoryDecoder is lax.scan's `unroll`:
with unroll=u, XLA sees u consecutive iteration bodies as ONE program
region and can schedule/fuse across the iteration boundary (the carry
(net, coords1) no longer round-trips through the scan buffer between
fused pairs, and independent ops from adjacent iterations can overlap).
Semantics are identical for every u (reference decoder.py:262-344 runs a
Python loop, i.e. fully unrolled).

Measures the decoder standalone AND the full bidirectional align forward
at the bench operating point (4 pairs x 2 directions, 512², bf16) for
unroll in {1, 2, 3, 4, 6, 12}. Each distinct unroll is a fresh program
(remote compile ~5 min each on this relay — budget accordingly).

Usage: python tools/exp_decoder_unroll.py [unrolls...]
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1000:9.2f} ms", flush=True)
    return dt


def main():
    unrolls = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4]
    B = 4
    S = 512
    from stitchax.models import FlowFormer, FlowFormerConfig

    rng = np.random.default_rng(0)
    dt16 = jnp.bfloat16
    i1 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), dt16)
    i2 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), dt16)

    # init once with the base config; the param tree is unroll-invariant
    base = FlowFormer(FlowFormerConfig(upsample_all=False))
    k = jax.random.PRNGKey(0)
    img0 = jnp.zeros((1, S, S, 3), jnp.float32)
    fp = jax.jit(base.init)(k, img0, img0)
    fp = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, fp)

    # fixed decoder inputs for the standalone measurement
    H1 = W1 = S // 8
    Bd = 2 * B
    mem = jnp.asarray(rng.normal(size=(Bd * H1 * W1, 8, 128)), dt16)
    ctx = jnp.asarray(rng.normal(size=(Bd, H1, W1, 256)), dt16)
    cmaps = jnp.asarray(rng.normal(size=(Bd, H1, W1, H1, W1, 1)), dt16)

    results = {}
    ref_out = None
    for u in unrolls:
        cfg = FlowFormerConfig(upsample_all=False, scan_unroll=u)
        ff = FlowFormer(cfg)

        dec_fn = jax.jit(lambda p, m, c, cm: ff.apply(
            p, m, c, cm, (8, 8),
            method=lambda mod, *a: mod.memory_decoder(*a))[0][-1])
        t_dec = timed(f"decoder standalone (unroll={u})",
                      dec_fn, fp, mem, ctx, cmaps)

        bi_fn = jax.jit(lambda p, a, b: ff.apply(
            p, a, b, method=lambda m, x, y: m.bidirectional(x, y)
        )[0][0][-1])
        t_bi = timed(f"bidirectional forward (unroll={u})",
                     bi_fn, fp, i1, i2)
        out = bi_fn(fp, i1, i2)
        if ref_out is None:
            ref_out = out
        else:
            err = float(jnp.abs(out.astype(jnp.float32)
                                - ref_out.astype(jnp.float32)).max())
            print(f"  max |flow - unroll{unrolls[0]}| = {err:.2e}")
        results[u] = (t_dec, t_bi)

    print("\nunroll  decoder_ms  bidi_ms")
    for u, (td, tb) in results.items():
        print(f"{u:6d}  {td*1000:9.2f}  {tb*1000:8.2f}")


if __name__ == "__main__":
    main()
