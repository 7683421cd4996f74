"""Committed golden forward vectors for the SD stack (VERDICT r3 ask #7).

UNet/ControlNet/VAE numerics are pinned to nothing external in this
environment (no diffusers, no weights), so refactors could silently drift
them. These goldens freeze tiny-config fixed-seed forwards: any change to
the compute graph (resnet/attention/timestep-embedding math, VAE scaling,
DDIM loop wiring) fails here and must be a conscious regeneration.

Regenerate after an INTENTIONAL model-semantics change with:
    python tests/test_sd_goldens.py --regen
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stitchax.models import diffusion as sdm
from stitchax.models import vae as sdv
from stitchax.models.sd_pipeline import make_sd_inpaint_fn

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "sd_tiny_forward.npz")

TINY = sdm.UNetConfig(in_channels=9, out_channels=4,
                      block_channels=(8, 16), layers_per_block=1,
                      attention_resolutions=(0, 1), context_dim=8,
                      num_heads=2, num_train_timesteps=1000, norm_groups=4)


def _build():
    k = jax.random.PRNGKey(42)
    rng = np.random.default_rng(42)
    lat = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    lat9 = jnp.asarray(rng.standard_normal((1, 8, 8, 9)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 5, TINY.context_dim)),
                      jnp.float32)
    ctrl = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    t = jnp.asarray([321.0])

    unet = sdm.UNet2DCondition(TINY)
    cnet = sdm.ControlNet(TINY)
    vae = sdv.AutoencoderKL((8, 8, 8, 8), groups=4)
    uv = jax.jit(unet.init)(k, lat9, t, ctx)
    cv = jax.jit(cnet.init)(k, lat, t, ctx, ctrl)
    vv = jax.jit(vae.init)(k, img)

    res, mid = cnet.apply(cv, lat, t, ctx, ctrl)
    out = {
        "temb": sdm.timestep_embedding(t, 32),
        "unet": unet.apply(uv, lat9, t, ctx),
        "unet_ctrl": unet.apply(uv, lat9, t, ctx, res, mid),
        "cnet_mid": mid,
        "vae_encode": vae.apply(vv, img, method=sdv.AutoencoderKL.encode_mode),
        "vae_decode": vae.apply(vv, lat, method=sdv.AutoencoderKL.decode),
    }
    for i, r in enumerate(res):
        out[f"cnet_res{i}"] = r

    # the full inpaint fn (CLIP-free: precomputed context), 2 DDIM steps
    fn = make_sd_inpaint_fn(uv, cv, vv, ctx, cfg=TINY, vae=vae,
                            num_steps=2, seed=0)
    pimg = jnp.asarray(rng.uniform(0, 255, (64, 64, 3)), jnp.float32)
    pmask = jnp.zeros((64, 64, 1)).at[16:32, 16:32].set(1.0)
    out["inpaint"] = fn(pimg, pmask)
    return {kk: np.asarray(vvv) for kk, vvv in out.items()}


def test_sd_tiny_forwards_match_goldens():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden missing — run: python tests/test_sd_goldens.py "
                    "--regen")
    want = np.load(GOLDEN)
    got = _build()
    assert set(want.files) == set(got)
    for key in want.files:
        np.testing.assert_allclose(
            got[key], want[key], rtol=2e-4, atol=2e-4,
            err_msg=f"SD golden drifted: {key}")


if __name__ == "__main__":
    import sys
    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, **_build())
        print(f"wrote {GOLDEN}")
    else:
        print("usage: python tests/test_sd_goldens.py --regen")
