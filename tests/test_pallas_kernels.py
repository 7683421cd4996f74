"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stitchax.ops.pallas.tps_kernel import (tps_eval_grid_pallas,
                                            tps_eval_grid_ref)
from stitchax.ops.neighborhood_attention import neighborhood_attention


class TestTPSKernel:
    @pytest.mark.parametrize("variant", ["opencv", "kornia"])
    def test_matches_reference(self, rng, variant):
        N, H, W = 37, 40, 56
        ctrl = jnp.asarray(rng.uniform(0, 1, (N, 2)).astype(np.float32))
        kw = jnp.asarray(rng.standard_normal((N, 2)).astype(np.float32) * .05)
        aw = jnp.asarray(np.array([[0.01, -0.02], [1.0, 0.05], [0.02, 0.97]],
                                  np.float32))
        ref = tps_eval_grid_ref(ctrl, kw, aw, H, W, variant)
        got = tps_eval_grid_pallas(ctrl, kw, aw, H, W, variant,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_padding_neutral(self, rng):
        """Padded centers (zero weight) must not change the field."""
        N = 130  # forces 128-lane padding to 256
        ctrl = jnp.asarray(rng.uniform(0, 1, (N, 2)).astype(np.float32))
        kw = jnp.asarray(rng.standard_normal((N, 2)).astype(np.float32) * .05)
        aw = jnp.zeros((3, 2), jnp.float32)
        ref = tps_eval_grid_ref(ctrl, kw, aw, 16, 24)
        got = tps_eval_grid_pallas(ctrl, kw, aw, 16, 24, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)


def naive_na(q, k, v, rpb, ks):
    """Direct NATTEN-semantics loop (ground truth)."""
    B, H, W, heads, d = q.shape
    out = np.zeros_like(q)
    for i in range(H):
        si = min(max(i - ks // 2, 0), H - ks)
        for j in range(W):
            sj = min(max(j - ks // 2, 0), W - ks)
            kn = k[:, si:si + ks, sj:sj + ks]      # (B, ks, ks, heads, d)
            vn = v[:, si:si + ks, sj:sj + ks]
            logit = np.einsum("bnd,bxynd->bnxy", q[:, i, j], kn) * d ** -0.5
            ri = np.arange(si, si + ks) - i + ks - 1
            rj = np.arange(sj, sj + ks) - j + ks - 1
            logit = logit + rpb[None, :, ri[:, None], rj[None, :]]
            a = np.exp(logit - logit.max(axis=(-1, -2), keepdims=True))
            a /= a.sum(axis=(-1, -2), keepdims=True)
            out[:, i, j] = np.einsum("bnxy,bxynd->bnd", a, vn)
    return out


class TestNeighborhoodAttention:
    def test_matches_naive(self, rng):
        B, H, W, heads, d, ks = 1, 9, 11, 2, 8, 5
        q = rng.standard_normal((B, H, W, heads, d)).astype(np.float32)
        k = rng.standard_normal((B, H, W, heads, d)).astype(np.float32)
        v = rng.standard_normal((B, H, W, heads, d)).astype(np.float32)
        rpb = rng.standard_normal((heads, 2 * ks - 1,
                                   2 * ks - 1)).astype(np.float32) * 0.1
        want = naive_na(q, k, v, rpb, ks)
        got = neighborhood_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), jnp.asarray(rpb), ks)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestNASmallMaps:
    def test_small_map_full_window(self, rng):
        """Maps smaller than the kernel attend over the whole (odd) extent —
        matches the naive oracle run with the shrunken kernel."""
        B, H, W, heads, d, ks = 1, 5, 7, 2, 8, 11
        q = rng.standard_normal((B, H, W, heads, d)).astype(np.float32)
        k = rng.standard_normal((B, H, W, heads, d)).astype(np.float32)
        v = rng.standard_normal((B, H, W, heads, d)).astype(np.float32)
        rpb = rng.standard_normal((heads, 2 * ks - 1,
                                   2 * ks - 1)).astype(np.float32) * 0.1
        got = neighborhood_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), jnp.asarray(rpb), ks)
        # oracle: full-extent attention (window = whole map) with rpb indexed
        # by true relative offsets
        logits = np.einsum("bijnd,bklnd->bnijkl", q, k) * d ** -0.5
        ri = np.arange(H)[None, :] - np.arange(H)[:, None] + ks - 1  # [i, k]
        rj = np.arange(W)[None, :] - np.arange(W)[:, None] + ks - 1
        bias = rpb[:, ri[:, None, :, None], rj[None, :, None, :]]
        logits = logits + bias[None]
        flat = logits.reshape(B, heads, H, W, H * W)
        a = np.exp(flat - flat.max(-1, keepdims=True))
        a /= a.sum(-1, keepdims=True)
        want = np.einsum("bnijm,bmnd->bijnd", a,
                         v.reshape(B, H * W, heads, d))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestWindowAttention:
    """XLA window-attention formulations (the Pallas kernel was retired —
    tools/exp_window_attn.py) and the bias-decomposed module vs the
    original inline formulation of LocallyGroupedAttnRPEContext."""

    def _make(self, rng, B, H, W, C, T):
        mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
        return (mk(B, H, W, C), mk(B, H, W, C), mk(B, H, W, C),
                mk(T, C) * 0.3, mk(T, C) * 0.3, mk(1, C) * 0.3)

    @pytest.mark.parametrize("H,W,heads", [(14, 21, 4), (16, 20, 8),
                                           (9, 7, 2)])
    def test_headstack_matches_split(self, rng, H, W, heads):
        from stitchax.ops.window_attention import (
            window_attention_headstack, window_attention_split)
        B, C, ws = 2, 32, 7
        args = self._make(rng, B, H, W, C, ws * ws)
        ref = window_attention_split(*args, heads=heads, ws=ws)
        got = window_attention_headstack(*args, heads=heads, ws=ws)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_module_matches_original_formulation(self, rng):
        """The bias-decomposed module must equal the reference formulation
        (zero-pad -> +RPE -> dense q/k on windows) leaf-for-leaf."""
        from stitchax.models.twins import LocallyGroupedAttnRPEContext
        from stitchax.models.layers import (linear_position_embedding_sine,
                                            pad_to_multiple, window_merge,
                                            window_partition)
        dim, heads, ws, cdim = 32, 4, 7, 16
        B, H, W = 2, 16, 20
        x = jnp.asarray(rng.standard_normal((B, H, W, dim)),
                        jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((B, H, W, 24)), jnp.float32)
        mod = LocallyGroupedAttnRPEContext(dim, heads, ws, cdim)
        params = jax.jit(mod.init)(jax.random.PRNGKey(0), x, ctx)
        got = jax.jit(mod.apply)(params, x, ctx)

        # original formulation, replayed on the same param tree
        p = params["params"]
        dense = lambda t, n: t @ p[n]["kernel"] + p[n]["bias"]
        x_qk = jnp.concatenate([x, dense(ctx, "context_proj")], -1)
        xp, (h0, w0) = pad_to_multiple(x, ws)
        x_qk, _ = pad_to_multiple(x_qk, ws)
        Hp, Wp = xp.shape[1], xp.shape[2]
        gy, gx = jnp.meshgrid(jnp.arange(ws, dtype=x.dtype),
                              jnp.arange(ws, dtype=x.dtype), indexing="ij")
        enc = linear_position_embedding_sine(
            jnp.stack([gx, gy], -1), dim=dim + cdim)
        vw = window_partition(dense(xp, "v"), ws)
        x_qk = window_partition(x_qk, ws) + enc.reshape(1, 1, ws * ws,
                                                        dim + cdim)
        q, k = dense(x_qk, "q"), dense(x_qk, "k")
        d = dim // heads

        def heads_t(t):
            Bn, Nw, T, _ = t.shape
            return t.reshape(Bn, Nw, T, heads, d).transpose(0, 1, 3, 2, 4)

        attn = jax.nn.softmax(
            jnp.einsum("bnhid,bnhjd->bnhij", heads_t(q), heads_t(k))
            * d ** -0.5, -1)
        out = jnp.einsum("bnhij,bnhjd->bnhid", attn, heads_t(vw))
        out = out.transpose(0, 1, 3, 2, 4).reshape(B, -1, ws * ws, dim)
        out = window_merge(out, ws, Hp, Wp)[:, :h0, :w0]
        want = dense(out, "proj")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)


class TestGSAAttention:
    @pytest.mark.parametrize("B,N,M,C,heads,tile",
                             [(2, 100, 16, 32, 4, 64),   # pad + 2 tiles
                              (1, 64, 9, 16, 2, 64)])
    def test_matches_oracle(self, rng, B, N, M, C, heads, tile):
        from stitchax.ops.pallas.gsa_attention import (gsa_attention_pallas,
                                                       gsa_attention_ref)
        mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
        q, k, v = mk(B, N, C), mk(B, M, C), mk(B, M, C)
        ref = gsa_attention_ref(q, k, v, heads=heads)
        got = gsa_attention_pallas(q, k, v, heads=heads, tile=tile,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)


class TestCostLookup:
    """Pallas barrel-select cost lookup vs the XLA selector-matmul form
    (flowformer.encode_flow_token) — bit-compatible by construction."""

    def _mk(self, rng, B, H1, W1, H2, W2, dtype, lo, hi):
        cm = jnp.asarray(
            rng.standard_normal((B, H1, W1, H2, W2, 1)), dtype)
        coords = jnp.asarray(
            rng.uniform(lo, hi, (B, H1, W1, 2)), jnp.float32)
        return cm, coords

    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
    @pytest.mark.parametrize("lo,hi", [(5.0, 58.0),     # interior
                                       (-80.0, 140.0)])  # incl. full OOB
    def test_matches_selector(self, rng, dtype, lo, hi):
        from stitchax.models.flowformer import encode_flow_token
        from stitchax.ops.pallas.cost_lookup import encode_flow_token_pallas
        cm, coords = self._mk(rng, 2, 8, 8, 64, 64, dtype, lo, hi)
        ref = np.asarray(encode_flow_token(cm, coords), np.float32)
        got = np.asarray(encode_flow_token_pallas(cm, coords,
                                                  interpret=True),
                         np.float32)
        if dtype == jnp.bfloat16:
            # bf16 products are exact in fp32: bit-equal by construction
            np.testing.assert_array_equal(ref, got)
        else:
            # fp32 weights: the two-term lerp rounds once per fma vs the
            # einsum's accumulate — 1 ULP
            np.testing.assert_allclose(ref, got, rtol=3e-7, atol=1e-6)

    def test_non_square_map_and_ragged_p(self, rng):
        # H2 != W2 and P not a multiple of the 128-pixel block
        from stitchax.models.flowformer import encode_flow_token
        from stitchax.ops.pallas.cost_lookup import encode_flow_token_pallas
        cm, coords = self._mk(rng, 1, 6, 7, 40, 56, jnp.bfloat16,
                              -10.0, 70.0)
        ref = encode_flow_token(cm, coords)
        got = encode_flow_token_pallas(cm, coords, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                      np.asarray(got, np.float32))

    def test_integer_coords_and_edges(self, rng):
        # exact-integer coords exercise the f==0 weight path; bases
        # pinned at the clamp boundaries exercise every select branch
        from stitchax.models.flowformer import encode_flow_token
        from stitchax.ops.pallas.cost_lookup import encode_flow_token_pallas
        cm = jnp.asarray(rng.standard_normal((1, 4, 8, 64, 64, 1)),
                         jnp.bfloat16)
        vals = np.array([-13.0, -12.0, -9.0, -4.0, 0.0, 4.0, 31.0, 59.0,
                         63.0, 66.0, 67.0, 76.0, 77.0, 100.0])
        coords = jnp.asarray(
            np.stack(np.meshgrid(vals[:8], vals[6:10]), -1)
            .reshape(1, 4, 8, 2), jnp.float32)
        ref = encode_flow_token(cm, coords)
        got = encode_flow_token_pallas(cm, coords, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                      np.asarray(got, np.float32))

    def test_custom_vjp_matches_oracle_grads(self, rng):
        from stitchax.models.flowformer import (encode_flow_token,
                                                encode_flow_token_t)
        from stitchax.ops.pallas.cost_lookup import transpose_cost_maps
        cm, coords = self._mk(rng, 1, 4, 4, 16, 16, jnp.float32, -2.0, 18.0)
        cm_t = transpose_cost_maps(cm)

        def loss_pallas(c_):
            return encode_flow_token_t(c_, coords, 4, True).sum()

        def loss_ref(c6_):
            return encode_flow_token(c6_, coords).sum()

        g_t = jax.grad(loss_pallas)(cm_t)
        g6 = jax.grad(loss_ref)(cm)
        g6_t = transpose_cost_maps(g6)
        np.testing.assert_allclose(np.asarray(g_t), np.asarray(g6_t),
                                   rtol=0, atol=0)

    def test_decoder_dispatch_parity(self, rng, monkeypatch):
        # the full MemoryDecoder under STITCHAX_COST_LOOKUP=pallas_interpret
        # must match the selector build exactly
        from stitchax.models.flowformer import FlowFormerConfig, MemoryDecoder
        cfg = FlowFormerConfig(decoder_depth=2)
        B, H1, W1 = 1, 8, 8
        dec = MemoryDecoder(cfg)
        mem = jnp.asarray(rng.standard_normal(
            (B * H1 * W1, cfg.cost_latent_token_num, cfg.cost_latent_dim)),
            jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((B, H1, W1, 256)), jnp.float32)
        cm = jnp.asarray(rng.standard_normal((B, H1, W1, H1, W1, 1)),
                         jnp.float32)
        params = dec.init(jax.random.PRNGKey(0), mem, ctx, cm, (H1, W1))
        ref = dec.apply(params, mem, ctx, cm, (H1, W1))
        monkeypatch.setenv("STITCHAX_COST_LOOKUP", "pallas_interpret")
        got = dec.apply(params, mem, ctx, cm, (H1, W1))
        for a, b in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=0, atol=1e-5)
