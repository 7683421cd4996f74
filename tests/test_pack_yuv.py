"""YUV 4:2:0 canvas pack roundtrip bounds (run/pack.py, VERDICT r4 #6).

Every packed image is materialized as a JPEG (reference out.py:266-308),
whose encoder 4:2:0-subsamples chroma itself — the device-side pack moves
that loss ahead of the ~13 MB/s relay link. These tests pin the decode
error on the bundled demo photos and the exactness of the rgb mode."""

import numpy as np
import jax.numpy as jnp
import pytest

from stitchax.run.pack import (pack_canvas_uint8, packed_channels,
                               unpack_canvas_uint8)


def _demo(size=128):
    import os

    from PIL import Image
    base = os.path.join(os.path.dirname(__file__), "..", "demo_data",
                        "demo1")
    return [np.asarray(Image.open(os.path.join(base, n)).convert("RGB")
                       .resize((size, size), Image.BILINEAR), np.float32)
            for n in ("input1.jpg", "input2.jpg")]


class TestPackYUV:
    def test_rgb_mode_exact(self, rng):
        imgs = [jnp.asarray(rng.uniform(0, 255, (64, 64, 3)), jnp.float32)]
        masks = [jnp.asarray(rng.uniform(0, 1, (64, 64, 1)), jnp.float32)]
        buf = pack_canvas_uint8(imgs, masks, "rgb")
        assert buf.shape[-1] == packed_channels(1, 1, "rgb") == 4
        out, m = unpack_canvas_uint8(np.asarray(buf), 1, 1, "rgb", 64, 64)
        np.testing.assert_allclose(out[0], np.rint(np.asarray(imgs[0])),
                                   atol=0)
        np.testing.assert_allclose(m[0] * 255,
                                   np.rint(np.asarray(masks[0]) * 255),
                                   atol=0)

    @pytest.mark.parametrize("n_img", [1, 2, 3])
    def test_yuv_roundtrip_bound_demo_images(self, rng, n_img):
        demo = _demo()
        imgs = [jnp.asarray(demo[i % 2], jnp.float32) for i in range(n_img)]
        masks = [jnp.asarray(rng.uniform(0, 1, (128, 128, 1)), jnp.float32)]
        buf = pack_canvas_uint8(imgs, masks, "yuv420")
        assert buf.shape[-1] == packed_channels(n_img, 1, "yuv420")
        out, m = unpack_canvas_uint8(np.asarray(buf), n_img, 1, "yuv420",
                                     128, 128)
        for a, b in zip(out, imgs):
            err = np.abs(a - np.asarray(b))
            psnr = 10 * np.log10(255.0 ** 2 / max(float((err ** 2).mean()),
                                                  1e-12))
            # demo_data is the worst case (chroma NOISE): the JPEG save
            # itself scores 26.5 dB on it (see test_end_to_end_jpeg below
            # for the bound that matters)
            assert psnr > 25.0, psnr
        # masks are quantized-exact (they bypass the chroma path)
        np.testing.assert_allclose(
            m[0] * 255, np.rint(np.asarray(masks[0]) * 255), atol=0)

    def test_yuv_roundtrip_natural_scene(self):
        import os

        from PIL import Image
        f = os.path.join(os.path.dirname(__file__), "..", "demo_scenes",
                         "scene1", "input1.jpg")
        img = jnp.asarray(np.asarray(
            Image.open(f).convert("RGB").resize((128, 128), Image.BILINEAR),
            np.float32))
        buf = np.asarray(pack_canvas_uint8([img], [], "yuv420"))
        out, _ = unpack_canvas_uint8(buf, 1, 0, "yuv420", 128, 128)
        err = np.asarray(out[0]) - np.asarray(img)
        psnr = 10 * np.log10(255.0 ** 2 / max(float((err ** 2).mean()),
                                              1e-12))
        assert psnr > 34.0, psnr   # structured photography: measured 36.4

    def test_end_to_end_jpeg_loss_is_the_encoders(self):
        """The bound that matters: these images exist only as saved JPEGs
        (reference out.py:266-308), and PIL's encoder 4:2:0-subsamples
        chroma itself — the device-side pack must not degrade the SAVED
        file by more than a hair vs packing exact RGB. Measured on the
        worst-case noise demo: 26.458 dB -> 26.418 dB."""
        import io

        from PIL import Image

        def save_load(a):
            buf = io.BytesIO()
            Image.fromarray(np.clip(a, 0, 255).astype(np.uint8)).save(
                buf, "JPEG")
            return np.asarray(Image.open(io.BytesIO(buf.getvalue()))
                              .convert("RGB"), np.float32)

        def psnr(a, b):
            return 10 * np.log10(
                255.0 ** 2 / max(float(((a - b) ** 2).mean()), 1e-12))

        for img_np in _demo():
            img = jnp.asarray(img_np)
            buf = np.asarray(pack_canvas_uint8([img], [], "yuv420"))
            out, _ = unpack_canvas_uint8(buf, 1, 0, "yuv420", 128, 128)
            direct = psnr(img_np, save_load(img_np))
            via_420 = psnr(img_np, save_load(out[0]))
            assert direct - via_420 < 0.3, (direct, via_420)

    def test_yuv_crop_after_decode(self, rng):
        # cropping happens after chroma decode: a true extent smaller than
        # the bucketed canvas must return the same pixels as full decode
        img = jnp.asarray(rng.uniform(0, 255, (64, 64, 3)), jnp.float32)
        buf = np.asarray(pack_canvas_uint8([img], [], "yuv420"))
        full, _ = unpack_canvas_uint8(buf, 1, 0, "yuv420", 64, 64)
        crop, _ = unpack_canvas_uint8(buf, 1, 0, "yuv420", 50, 37)
        np.testing.assert_array_equal(full[0][:50, :37], crop[0])

    def test_gray_images_near_exact(self):
        # chroma-free content: the only loss is Y quantization (<=0.5)
        g = np.linspace(0, 255, 64 * 64, dtype=np.float32).reshape(64, 64)
        img = jnp.asarray(np.stack([g, g, g], -1))
        buf = np.asarray(pack_canvas_uint8([img], [], "yuv420"))
        out, _ = unpack_canvas_uint8(buf, 1, 0, "yuv420", 64, 64)
        assert float(np.abs(out[0] - np.asarray(img)).max()) <= 1.0
