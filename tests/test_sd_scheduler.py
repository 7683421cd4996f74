"""SD scheduler numerics pinned to the published SD-1.5 constants
(VERDICT r3 ask #7).

The reference inpainter loads runwayml/stable-diffusion-inpainting
(core/inference/mix_methods/utils/inpainter.py:12-19), whose published
scheduler config is: beta_schedule='scaled_linear', beta_start=0.00085,
beta_end=0.012, num_train_timesteps=1000, steps_offset=1,
set_alpha_to_one=False, prediction_type='epsilon'. These tests assert
stitchax's ddim_schedule and the scanned DDIM update against float64
re-derivations of those documented formulas plus hard-coded spot goldens —
no diffusers needed.
"""

import numpy as np

import jax
import jax.numpy as jnp

from stitchax.models.diffusion import ddim_schedule, make_inpaint_denoiser

T = 1000


def _betas64():
    return np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, T, dtype=np.float64) ** 2


class TestScheduleConstants:
    def test_betas_and_alphas_cumprod_vs_float64(self):
        _, acp = ddim_schedule(T, 50)
        acp64 = np.cumprod(1.0 - _betas64())
        np.testing.assert_allclose(np.asarray(acp), acp64, rtol=2e-5)

    def test_documented_spot_values(self):
        """Hard goldens computed in float64 from the published config; a
        silent change to the formula (e.g. linear instead of scaled_linear)
        fails these immediately."""
        _, acp = ddim_schedule(T, 50)
        acp = np.asarray(acp)
        betas = _betas64()
        assert abs(betas[0] - 0.00085) < 1e-12
        assert abs(betas[-1] - 0.012) < 1e-12
        np.testing.assert_allclose(
            acp[[0, 1, 499, 998, 999]],
            [0.999150000000, 0.998296027838, 0.277669650456,
             0.004716698900, 0.004660098513], rtol=2e-5)

    def test_timestep_spacing_leading_with_offset(self):
        """'leading' spacing + steps_offset=1: t_i = i*(T//S) + 1, high to
        low — DDIMScheduler.set_timesteps semantics for SD-1.5."""
        for steps in (50, 20, 10):
            ts, _ = ddim_schedule(T, steps)
            want = (np.arange(steps) * (T // steps) + 1)[::-1]
            np.testing.assert_array_equal(np.asarray(ts), want)
        assert int(ts[0]) == T - T // steps + 1  # first (highest) timestep
        assert int(ts[-1]) == 1                  # last timestep


class TestDdimUpdateRule:
    def test_scan_matches_float64_ddim_step(self):
        """Run the real scanned loop with stub eps-models and compare the
        latent trajectory to an independent float64 DDIM (eta=0, epsilon
        prediction, final_alpha_cumprod = alphas_cumprod[0] because SD-1.5
        sets set_alpha_to_one=False)."""
        steps, shape = 10, (1, 4, 4, 4)
        rng = np.random.default_rng(0)
        noise = rng.standard_normal(shape).astype(np.float32)
        # deterministic "model": eps depends on latents so errors compound
        unet_apply = lambda inp, t, ctx, res, mid: 0.3 * inp[..., :4] + 0.01 * t[0]
        controlnet_apply = lambda lat, t, ctx, img: (None, None)

        denoise = make_inpaint_denoiser(unet_apply, controlnet_apply,
                                        context=None, num_steps=steps,
                                        num_train_steps=T)
        mask_l = np.zeros(shape[:-1] + (1,), np.float32)
        masked_l = np.zeros(shape, np.float32)
        got = np.asarray(jax.jit(denoise)(jnp.asarray(mask_l),
                                          jnp.asarray(masked_l),
                                          jnp.zeros((1, 32, 32, 3)),
                                          jnp.asarray(noise)))

        acp = np.cumprod(1.0 - _betas64())
        lat = noise.astype(np.float64)
        for t in (np.arange(steps) * (T // steps) + 1)[::-1]:
            inp = np.concatenate([lat, mask_l, masked_l], -1)
            eps = 0.3 * inp[..., :4] + 0.01 * float(t)
            a_t = acp[t]
            prev_t = t - T // steps
            a_prev = acp[prev_t] if prev_t >= 0 else acp[0]
            x0 = (lat - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
            lat = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
        np.testing.assert_allclose(got, lat, rtol=3e-4, atol=3e-4)
