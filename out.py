"""Stitch CLI — preserved public API of the reference's out.py.

Same flags, same inf_configs plugin mechanism, same per-pair output files
(reference: out.py:15-28,315-360; README.md:36-39). Runs the TPU-native
pipeline: align (jit) -> bucketed canvas render (jit) -> TPS breaking (jit)
-> mix/inpaint -> optional learned composition.
"""

import argparse
import os
import sys
import traceback


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", type=str, default="./checkpoints/final_ckpt")
    p.add_argument("--model_config_name", type=str, default="last_config")
    p.add_argument("--data_root_path", type=str, default="./demo/")
    p.add_argument("--txt_file", type=str, default="demo.txt")
    p.add_argument("--gpu", type=str, default="0",
                   help="kept for CLI compatibility; device selection is "
                        "JAX-managed on TPU")
    p.add_argument("--inf_cfg", type=str,
                   default="all_img1_with_inpaint_g12_transRef")
    p.add_argument("--result_dir", type=str, default="results")
    p.add_argument("--skip_if_avg_fusion_exists", action="store_true",
                   default=False)
    p.add_argument("--num_shards", type=int, default=1,
                   help="partition the pair list across N independent "
                        "processes/hosts (embarrassingly parallel sweep)")
    p.add_argument("--shard_id", type=int, default=0,
                   help="this process's shard index in [0, num_shards)")
    p.add_argument("--input_bucket", type=int, default=None,
                   help="round input dims up to this multiple (resize) so a "
                        "mixed-resolution sweep reuses a few compiled "
                        "programs instead of one set per distinct shape; "
                        "default: cfg.input_bucket or 0 (native)")
    p.add_argument("--align_batch", type=int, default=4,
                   help="consecutive same-shape pairs share one batched "
                        "align model step of this size (4 = the measured "
                        "single-chip operating point; 1 disables grouping)")
    p.add_argument("--transref_ckpt", type=str, default=None,
                   help="TransRef inpainter weights (flax-serialization "
                        "msgpack; fp32 or bf16). Sets STITCHAX_TRANSREF_CKPT "
                        "for the lazily-built inpainter. Trained weights "
                        "ship at results/transref_ckpt_r04_bf16.msgpack; "
                        "the reference's 400_Trans.pth converts via "
                        "stitchax/convert.py convert_transref. Unset = "
                        "random init (loud warning), matching the "
                        "reference's behavior without its downloaded ckpt")
    return p.parse_args()



def _setup_jax_cache():
    from stitchax.utils.platform import setup_cli_jax
    setup_cli_jax()


def main():
    args = get_args()
    if args.transref_ckpt:
        os.environ["STITCHAX_TRANSREF_CKPT"] = args.transref_ckpt
    _setup_jax_cache()

    from stitchax.align.adapter import AlignConfig
    from stitchax.run import Stitcher, StitchModels, load_pair_list
    from stitchax.run.config import build_out_config
    from stitchax.tps.pipeline import TPSConfig
    from stitchax.utils.logger import Logger

    cfg = build_out_config(args)
    tps_c = cfg.TPS_PIPELINE_CONFIG

    save_root = os.path.join(
        args.result_dir,
        f"{args.inf_cfg}_g{tps_c.grid_h}x{tps_c.grid_w}_{tps_c.tps_method}")
    os.makedirs(save_root, exist_ok=True)
    # dump the resolved config like the reference (out.py:337-338)
    with open(os.path.join(save_root, "config.txt"), "w") as f:
        f.write(cfg.dump())

    logger = Logger(log_dir=save_root, name="out")

    align_cfg = AlignConfig(
        use_fb_consistency_mask=cfg.get("use_fb_consistency_mask", True))
    tps_cfg = TPSConfig(
        grid_h=tps_c.grid_h, grid_w=tps_c.grid_w, pad_num=tps_c.pad_num,
        get_pt_method=tps_c.get_pt_methods[0],
        flow_limit=tps_c.flow_limit, add_corner=tps_c.add_corner,
        use_boundary_limit=tps_c.use_boundary_limit,
        residual_flow_use_forward=tps_c.residual_flow_use_forward,
        do_avg_pooling=tps_c.do_avg_pooling,
        use_occ_filter=tps_c.use_occ_filter,
        use_border_points_mask=tps_c.use_border_points_mask,
        use_valid_on_flow=tps_c.use_valid_on_flow,
        affine_scale=tps_c.affine_scale, kernel_scale=tps_c.kernel_scale,
        output2_is_only_tps=tps_c.output2_is_only_tps)

    models = StitchModels.build(cfg,
                                use_composition=cfg.get("use_composition",
                                                        True))
    # args are merged into cfg by build_out_config, so an unset CLI flag
    # shows up as an explicit None; an explicit --input_bucket 0 must still
    # win over a config default (0 = stitch at native resolution)
    b = args.input_bucket
    input_bucket = b if b is not None else (cfg.get("input_bucket") or 0)
    stitcher = Stitcher(models, cfg, align_cfg, tps_cfg,
                        inpainter_name=tps_c.inpainter,
                        mix_method=tps_c.mix_method,
                        input_bucket=input_bucket)

    pairs = load_pair_list(args.data_root_path, args.txt_file)
    # multi-host sweep sharding: the stitch sweep is embarrassingly
    # parallel over pairs (SURVEY.md §2.10 — DCN-free; one chip per
    # process), so N processes each take a strided slice of the list.
    # Outputs/manifests land in the shared save_root per pair dir.
    if not (0 <= args.shard_id < args.num_shards):
        raise SystemExit(f"--shard_id {args.shard_id} outside "
                         f"[0, {args.num_shards})")
    if args.num_shards > 1:
        pairs = pairs[args.shard_id::args.num_shards]
        logger.info(f"shard {args.shard_id}/{args.num_shards}: "
                    f"{len(pairs)} pairs")
    jobs = []
    for data_dict in pairs:
        rel = os.path.relpath(data_dict["DATA_PATH"], args.data_root_path)
        result_path = os.path.join(save_root, rel)
        if (args.skip_if_avg_fusion_exists
                and os.path.exists(os.path.join(result_path,
                                                "ave_fusion.jpg"))):
            logger.info(f"skip {rel} (ave_fusion exists)")
            continue
        logger.info(f"queueing {rel}")
        jobs.append((data_dict, result_path))

    # pipelined sweep: pair k's output transfer + file writes overlap pair
    # k+1's device stages; per-pair failures are recorded, not fatal
    error_list = []  # per-pair failure manifest (SURVEY.md §5 rebuild item)
    for result_path, err in stitcher.stitch_and_save_many(
            jobs, align_batch=args.align_batch):
        rel = os.path.relpath(result_path, save_root)
        if err is None:
            logger.info(f"stitched {rel}")
        else:
            traceback.print_exception(type(err), err, err.__traceback__)
            error_list.append({"pair": rel, "error": repr(err)})

    if error_list:
        import json
        with open(os.path.join(save_root, "errors.json"), "w") as f:
            json.dump(error_list, f, indent=2)
        logger.info(f"{len(error_list)} pairs failed; see errors.json")
        sys.exit(1)
    logger.info(f"done: {len(pairs)} pairs -> {save_root}")


if __name__ == "__main__":
    main()
