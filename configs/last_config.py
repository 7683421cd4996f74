"""The shipped model config (rebuild of reference configs/last_config.py).

Same key surface as the reference's flat config dict so user overrides and
the CLI merge behave identically; values drive the stitchax model factories.
"""

config_dict = {
    "name": "udis",
    "stage": "udis_flowadapter",
    "gamma": 0.8,

    # model toggles (reference keys)
    "homo_backbone": "udis2",
    "flow_backbone": "flowformerpp",
    "transformer": "percostformer3",
    "use_fb_consistency_mask": True,
    "use_combine_h_flow": False,
    "mixed_precision": True,
    "only_homo": False,
    "detach_H": False,
    "detach_flow": False,
    "use_foward": False,

    # trainer block (reference 'trainer')
    "trainer": {
        "optimizer": "adamw",
        "scheduler": "OneCycleLR",
        "canonical_lr": 3.125e-6,
        "adamw_decay": 1e-4,
        "epsilon": 1e-8,
        "clip": 1.0,
        "num_steps": 31323,
        "anneal_strategy": "linear",
    },
    "batch_size": 1,
    "image_size": [512, 512],
    "no_gt_flow": True,
    "max_flow": 500,
    "use_rigid_motion_loss": True,
    "rigid_motion_loss_weight": 0.3,
    "border_loss_weight": 0.5,
    "weight_mask_type": "occlusion",
    "is_zero_flow_in_edge": True,
    "random_img12": True,

    # flow-model hyperparameters (reference 'percostformer3' subtree)
    "percostformer3": {
        "cost_heads_num": 1,
        "cost_latent_input_dim": 64,
        "cost_latent_token_num": 8,
        "cost_latent_dim": 128,
        "encoder_latent_dim": 256,
        "query_latent_dim": 64,
        "encoder_depth": 3,
        "decoder_depth": 12,
        "patch_size": 8,
        "vert_c_dim": 64,
        "cnet": "twins",
        "fnet": "twins",
        "gma": "GMA",
        "cost_encoder_res": True,
        "flow_or_pe": "and",
        "quater_refine": False,
    },

    # dataset
    "udis_dataset": {"data_dir": "./UDIS-D/", "return_depth": False},

    "restore_ckpt": None,
    "init_flow_ckpt": None,
    "init_homo_ckpt": None,
}
