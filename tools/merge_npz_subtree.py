"""Merge one top-level param subtree from a donor npz into a base npz.

The flagship snapshot (results/ckpt_r04_bf16.npz) carries {flow, homo,
comp} subtrees that are trained by DIFFERENT runs (train.py for flow+homo,
tools/train_composition_learns.py for comp). When one run refreshes its
subtree, the others must carry over bit-exactly — this tool rebuilds the
container from a base npz plus a donor's subtree without ever
decoding/re-encoding the bf16 leaf payloads (a round-trip through float32
would be lossless for bf16 bit patterns, but copying the stored uint16
views verbatim makes bit-exactness true by construction).

  # refresh flow+homo from a new training run, keep the trained comp
  python tools/export_ckpt_npz.py /tmp/train_r04b/step_00024000 /tmp/new.npz
  python tools/merge_npz_subtree.py --base /tmp/new.npz \
      --donor results/ckpt_r04_bf16.npz --subtree comp \
      --out results/ckpt_r04_bf16.npz

Container format: convert.save_params_npz — keys are jax keystr paths like
"['flow']['encoder']...", float32 leaves stored as "bf16:"-prefixed uint16
bit patterns.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def subtree_of(key: str) -> str:
    """Top-level subtree name of a stored npz key ("bf16:['comp']... -> comp)."""
    k = key[len("bf16:"):] if key.startswith("bf16:") else key
    if not k.startswith("['"):
        raise ValueError(f"unexpected npz key format: {key!r}")
    return k[2:k.index("']")]


def merge(base_path: str, donor_path: str, subtree: str, out_path: str,
          replace: bool = False) -> dict:
    base = dict(np.load(base_path))
    donor = dict(np.load(donor_path))
    donor_keys = [k for k in donor if subtree_of(k) == subtree]
    if not donor_keys:
        raise SystemExit(f"donor {donor_path} has no '{subtree}' subtree")
    existing = [k for k in base if subtree_of(k) == subtree]
    if existing and not replace:
        raise SystemExit(
            f"base {base_path} already has {len(existing)} '{subtree}' "
            f"leaves; pass --replace to overwrite them")
    for k in existing:
        del base[k]
    for k in donor_keys:
        base[k] = donor[k]
    np.savez_compressed(out_path, **base)
    counts = {}
    for k in base:
        counts[subtree_of(k)] = counts.get(subtree_of(k), 0) + 1
    return dict(donor_leaves=len(donor_keys),
                replaced=len(existing), subtree_counts=counts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base", required=True,
                   help="npz providing every subtree EXCEPT --subtree")
    p.add_argument("--donor", required=True,
                   help="npz providing the --subtree leaves")
    p.add_argument("--subtree", required=True, help="e.g. comp")
    p.add_argument("--out", required=True)
    p.add_argument("--replace", action="store_true",
                   help="overwrite the subtree if the base already has one")
    args = p.parse_args()
    info = merge(args.base, args.donor, args.subtree, args.out,
                 replace=args.replace)
    mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({mb:.1f} MB): copied {info['donor_leaves']} "
          f"'{args.subtree}' leaves from {args.donor} "
          f"(replaced {info['replaced']}); "
          f"subtree leaf counts: {info['subtree_counts']}")


if __name__ == "__main__":
    main()


