"""Experiment: GMA attention formulations at the bench operating point
(B = 8 = 4 pairs x bidirectional, N = 64*64 tokens, d = 128, 12 decoder
iterations — reference gma.py:34-115).

The shipped form materializes attn = softmax(q k^T) ONCE per forward
(B, N, N — 268 MB bf16 at B=8) and the decoder scan reuses it every
iteration: per-iteration cost is one (N,N)@(N,d) matmul + a 268 MB HBM
read (~1 ms). VERDICT.md round 2 (weak #6) asked whether a blocked
softmax should remove the materialized matrix.

Paper arithmetic says no: recomputing softmax(q k^T) v per iteration
costs 2 x N^2 d = 137 GFLOP/iter (~2.5 ms at the chip's measured ~55
TFLOP/s effective) versus the ~0.7 ms read it saves, and the one-time
blocked build only avoids one transient (B,N,N) write+read (~1.3 ms of
a ~220 ms step). This tool measures all four variants end-to-end so the
call is recorded as data, not arithmetic.

Variants (bit-identical outputs up to bf16 reassociation):
  dense-once + reuse   attn materialized once, scan reads it
  blocked-once + reuse same attn built in row chunks (no full pre-softmax
                       fp32 sim tensor), scan reads it
  flash-every-iter     no (B,N,N) ever: each iteration recomputes
                       chunked softmax(q k^T) v
MEASURED (v5e, 2026-08-17, chunk 1024, B=8):
  attn build one-time:   dense 4.66 ms,  blocked 3.18 ms  <- blocked WINS
  dense-once + 12-iter reuse      8.61 ms
  blocked-once + 12-iter reuse    7.02 ms                 <- SHIPPED
  flash-every-iter               11.79 ms  (recompute FLOPs cost more
                                            than the attn read they save)
Verdict: the 12-iteration reuse of a materialized (B, N, N) attention is
right (flash recompute loses), but BUILDING it blocked saves ~1.6 ms per
forward by never materializing the fp32 pre-softmax sim — shipped in
GmaAttention (models/flowformer.py). Capacity was never the issue
(268 MB of 16 GB HBM).

Usage: python tools/exp_gma.py
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402

B, N, D, ITERS = 8, 64 * 64, 128, 12
CHUNK = 1024   # q-row block for the softmax: (CHUNK, N) transients only


def dense_attn(q, k):
    sim = jnp.einsum("bnd,bmd->bnm", q, k,
                     preferred_element_type=jnp.float32)
    return jax.nn.softmax(sim, axis=-1).astype(q.dtype)


def blocked_attn(q, k):
    """Same attn, built CHUNK query rows at a time (no full fp32 sim)."""
    qb = q.reshape(B, N // CHUNK, CHUNK, D)

    def row_block(qc):  # (B, CHUNK, D) -> (B, CHUNK, N)
        s = jnp.einsum("bcd,bmd->bcm", qc, k,
                       preferred_element_type=jnp.float32)
        return jax.nn.softmax(s, axis=-1).astype(q.dtype)

    out = jax.lax.map(row_block, qb.transpose(1, 0, 2, 3))
    return out.transpose(1, 0, 2, 3).reshape(B, N, N)


def flash_av(q, k, v):
    """softmax(q k^T) v without materializing (B, N, N): chunked rows,
    full-row softmax per chunk (N=4096 columns fit VMEM comfortably)."""
    qb = q.reshape(B, N // CHUNK, CHUNK, D)

    def row_block(qc):
        s = jnp.einsum("bcd,bmd->bcm", qc, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bcm,bmd->bcd", p, v,
                          preferred_element_type=jnp.float32).astype(v.dtype)

    out = jax.lax.map(row_block, qb.transpose(1, 0, 2, 3))
    return out.transpose(1, 0, 2, 3).reshape(B, N, D)


def scan_reuse(attn, v0, w):
    """12-iteration stand-in for the decoder scan: v evolves per step
    (motion features change), attn is the broadcast const."""
    def step(v, _):
        agg = jnp.einsum("bnm,bmd->bnd", attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        v = jnp.tanh(agg @ w + v)
        return v, ()
    v, _ = jax.lax.scan(step, v0, None, length=ITERS)
    return v


def scan_flash(q, k, v0, w):
    def step(v, _):
        agg = flash_av(q, k, v)
        v = jnp.tanh(agg @ w + v)
        return v, ()
    v, _ = jax.lax.scan(step, v0, None, length=ITERS)
    return v


def timed(name, fn, *args, iters=20):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1000:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((B, N, D)) * D ** -0.5, dt)
    k = jnp.asarray(rng.standard_normal((B, N, D)), dt)
    v0 = jnp.asarray(rng.standard_normal((B, N, D)), dt)
    w = jnp.asarray(rng.standard_normal((D, D)) * D ** -0.5, dt)

    f_dense = jax.jit(dense_attn)
    f_block = jax.jit(blocked_attn)
    f_reuse_d = jax.jit(lambda q, k, v0, w: scan_reuse(dense_attn(q, k), v0, w))
    f_reuse_b = jax.jit(lambda q, k, v0, w: scan_reuse(blocked_attn(q, k), v0, w))
    f_flash = jax.jit(scan_flash)

    a = timed("attn build: dense softmax (one-time)", f_dense, q, k)
    b = timed("attn build: blocked softmax (one-time)", f_block, q, k)
    err = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    print(f"  build max abs err: {err:.3e}")

    r1 = timed("dense-once + 12-iter reuse", f_reuse_d, q, k, v0, w)
    r2 = timed("blocked-once + 12-iter reuse (SHIPPED)", f_reuse_b, q, k, v0, w)
    r3 = timed("flash-every-iter (no (B,N,N))", f_flash, q, k, v0, w)
    e2 = float(jnp.abs(r1.astype(jnp.float32) - r2.astype(jnp.float32)).max())
    e3 = float(jnp.abs(r1.astype(jnp.float32) - r3.astype(jnp.float32)).max())
    print(f"  scan max abs err: blocked {e2:.3e}  flash {e3:.3e}")


if __name__ == "__main__":
    main()
