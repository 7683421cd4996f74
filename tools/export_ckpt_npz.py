"""Export an orbax eval-format checkpoint ({flow, homo}) as a committed
bf16 npz snapshot (convert.save_params_npz): half the bytes of the fp32
orbax tree and inference-lossless (device code runs bf16 anyway), loadable
by every CLI via --ckpt_path <file>.npz.

  python tools/export_ckpt_npz.py /tmp/train_r04/final_ckpt \
      results/ckpt_r04_bf16.npz
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    src, dst = sys.argv[1], sys.argv[2]
    from stitchax.utils.platform import setup_cli_jax
    os.environ.setdefault("STITCHAX_PLATFORM", "cpu")
    setup_cli_jax()

    import orbax.checkpoint as ocp

    from stitchax import convert

    ckpt = ocp.StandardCheckpointer()
    tree = ckpt.restore(os.path.abspath(src))
    if "params" in tree and set(tree) == {"params"}:  # trainer step ckpt
        tree = tree["params"]
    convert.save_params_npz(dst, tree)
    mb = os.path.getsize(dst) / 1e6
    print(f"wrote {dst} ({mb:.1f} MB) with top-level keys {sorted(tree)}")


if __name__ == "__main__":
    main()
