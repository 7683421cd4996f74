"""Train state + jitted step for the alignment model.

Reconstructs the unshipped training loop from the reference's surviving
scaffolding (SURVEY.md §3.3: configs/last_config.py trainer block,
core/optimizer/, core/utils/logger.py, FlowHomoAdpater.train_eval_foward).
TPU-first: one jitted, shardable train step; data-parallel over a
jax.sharding.Mesh (stitchax.parallel); orbax for checkpoint/resume
(replacing torch.load/state_dict, SURVEY.md §5).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..align.adapter import AlignConfig, predict_homography_matrix, _normalized
from .. import ops
from .losses import LossConfig, sequence_alignment_loss
from .optim import OptimConfig, fetch_optimizer


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params, optim_cfg: OptimConfig
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = fetch_optimizer(optim_cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params)), tx


def align_train_forward(homo_apply: Callable, flow_apply: Callable,
                        params, img1: jnp.ndarray, img2: jnp.ndarray,
                        align_cfg: AlignConfig,
                        detach_H: bool = False) -> Dict[str, Any]:
    """Training forward (reference: flowHomoAdpater.py:83-191 with
    detach_H/detach_flow switches at :45-48): homography -> H-warp ->
    residual flow predictions."""
    B, H, W, _ = img1.shape
    offsets = homo_apply(params["homo"], img1 / 127.5 - 1.0,
                         img2 / 127.5 - 1.0)
    if detach_H:
        offsets = jax.lax.stop_gradient(offsets)
    Hm = predict_homography_matrix(offsets, H, W, scale_div=8.0)
    H_mat = jax.vmap(lambda h: _normalized(h, H / 8.0, W / 8.0))(Hm)
    ones3 = jnp.ones_like(img2)
    output_H = ops.homography_warp_b(
        jnp.concatenate([img2, ones3], -1), H_mat, H, W)
    flow_predictions, _ = flow_apply(params["flow"], img1,
                                     output_H[..., 0:3])
    return dict(output_H=output_H, flow_predictions=flow_predictions,
                H=Hm, offsets=offsets)


def make_train_step(homo_apply: Callable, flow_apply: Callable,
                    tx: optax.GradientTransformation,
                    align_cfg: AlignConfig, loss_cfg: LossConfig,
                    use_fb_consistency_mask: bool = True,
                    remat: bool = False):
    """Returns train_step(state, img1, img2) -> (state, metrics).

    Pure function of (state, batch): jit/pjit it with whatever shardings the
    caller chooses (stitchax.parallel shards the batch axis). `remat=True`
    rematerializes the backbone forwards in the backward pass — trades
    ~30% more FLOPs for activation memory, enabling larger per-chip batches
    at 512^2 (HBM is the constraint, SURVEY.md design notes)."""
    if remat:
        homo_apply = jax.checkpoint(homo_apply)
        flow_apply = jax.checkpoint(flow_apply)

    def loss_fn(params, img1, img2):
        fwd = align_train_forward(homo_apply, flow_apply, params,
                                  img1, img2, align_cfg)
        occ = None
        if use_fb_consistency_mask:
            back_preds, _ = flow_apply(params["flow"],
                                       fwd["output_H"][..., 0:3], img1)
            flow_ji = jax.lax.stop_gradient(back_preds[-1])
            occ = ops.compute_occlusion_b(
                jax.lax.stop_gradient(fwd["flow_predictions"][-1]), flow_ji,
                align_cfg.occlusion_estimation, occlusion_are_zeros=True,
                boundaries_occluded=True)
            occ = (occ >= 0.5).astype(img1.dtype)
        losses = sequence_alignment_loss(
            img1, fwd["output_H"], fwd["flow_predictions"], occ, loss_cfg)
        return losses["total"], losses

    def train_step(state: TrainState, img1: jnp.ndarray, img2: jnp.ndarray):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, img1, img2)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics,
                       grad_norm=optax.global_norm(grads))
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), metrics

    return train_step


# ------------------------------ checkpointing -------------------------------


def save_checkpoint(path: str, state: TrainState):
    """Orbax checkpoint (replaces torch.save state dicts, SURVEY.md §5)."""
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, dict(step=state.step, params=state.params,
                         opt_state=state.opt_state), force=True)
    ckpt.wait_until_finished()


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(path, dict(step=template.step,
                                       params=template.params,
                                       opt_state=template.opt_state))
    return TrainState(step=restored["step"], params=restored["params"],
                      opt_state=restored["opt_state"])
