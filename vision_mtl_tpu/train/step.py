"""Jitted train/eval/predict steps.

The reference's per-step pipeline (zero_grad -> forward -> postprocess ->
losses -> metrics -> backward -> step, lit_module.py:75-95 +
training_lit.py:81-98) collapses here into ONE compiled function
``train_step(state, batch, metrics) -> (state, metrics, losses)``: forward,
loss, backward, Adam update, sigmoid/argmax postprocess and streaming metric
accumulation all fuse into a single XLA program — no host round-trips inside
the hot loop.

Sharding: steps are jit-compiled against a Mesh with the batch sharded on
("data"[, "spatial"]) and state replicated; the SPMD partitioner inserts the
gradient/BN psum collectives over ICI. Optional per-sample ``valid`` weights
support padded final eval batches without recompilation.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_mtl_tpu.losses import mtl_loss
from vision_mtl_tpu.metrics import MetricState, update_metrics
from vision_mtl_tpu.train.state import TrainState

Batch = t.Dict[str, jax.Array]


def decode_batch(batch: Batch) -> Batch:
    """Device-side decode of the compact wire format (see
    data/loader.compress_batch): fused into the step, effectively free."""
    out = dict(batch)
    if batch["img"].dtype == jnp.uint8:
        out["img"] = batch["img"].astype(jnp.float32) / 255.0
    if "depth" in batch and batch["depth"].dtype == jnp.uint16:
        out["depth"] = batch["depth"].astype(jnp.float32) / 65535.0
    if "mask" in batch and batch["mask"].dtype != jnp.int32:
        out["mask"] = batch["mask"].astype(jnp.int32)
    return out


def postprocess_raw_out(out: t.Dict[str, jax.Array]) -> t.Dict[str, jax.Array]:
    """softmax/argmax for segm, sigmoid for depth (reference
    lit_module.py:133-144; NHWC makes the reference's permute a no-op)."""
    segm_logits = out["segm"]
    return {
        "segm_logits": segm_logits,
        "segm_predictions": jnp.argmax(segm_logits, axis=-1).astype(jnp.int32),
        "depth_predictions": jax.nn.sigmoid(out["depth"].astype(jnp.float32)),
    }


def _forward_and_losses(
    model: nn.Module,
    params: t.Any,
    batch_stats: t.Any,
    batch: Batch,
    train: bool,
    loss_segm_weight: float,
    loss_depth_weight: float,
):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mutated = model.apply(
            variables, batch["img"], train=True, mutable=["batch_stats"]
        )
        new_stats = mutated["batch_stats"]
    else:
        out = model.apply(variables, batch["img"], train=False)
        new_stats = batch_stats
    post = postprocess_raw_out(out)
    losses = mtl_loss(
        post["segm_logits"],
        post["depth_predictions"],
        batch["mask"],
        batch["depth"],
        loss_segm_weight,
        loss_depth_weight,
        valid=batch.get("valid"),
    )
    return losses, post, new_stats


def make_train_step(
    model: nn.Module,
    loss_segm_weight: float = 1.0,
    loss_depth_weight: float = 1.0,
    mesh=None,
    donate: bool = True,
    grad_accum_steps: int = 1,
):
    """One fused optimizer step.

    ``grad_accum_steps > 1`` splits the batch into that many microbatches
    inside the compiled program (lax.scan), averaging gradients/losses and
    accumulating metrics per microbatch — large effective batches without the
    activation memory (peak memory scales with the microbatch). BatchNorm
    batch statistics are per-microbatch (ghost-BN semantics); running stats
    chain through the scan. Note the SILog depth loss is nonlinear in the
    batch (sqrt of pixel-population variance), so the accumulated loss
    differs from the full-batch loss — in either direction, see
    docs/QUIRKS.md #12; CE is linear and unaffected.
    """

    def micro(params, batch_stats, batch):
        def loss_fn(params):
            losses, post, new_stats = _forward_and_losses(
                model,
                params,
                batch_stats,
                batch,
                True,
                loss_segm_weight,
                loss_depth_weight,
            )
            return losses["loss"], (losses, post, new_stats)

        grads, (losses, post, new_stats) = jax.grad(loss_fn, has_aux=True)(
            params
        )
        return grads, losses, post, new_stats

    def step(
        state: TrainState, batch: Batch, mstate: MetricState
    ) -> t.Tuple[TrainState, MetricState, t.Dict[str, jax.Array]]:
        batch = decode_batch(batch)

        if grad_accum_steps == 1:
            grads, losses, post, new_stats = micro(
                state.params, state.batch_stats, batch
            )
            mstate = update_metrics(
                mstate,
                post["segm_predictions"],
                batch["mask"],
                post["depth_predictions"],
                batch["depth"],
                losses,
                valid=batch.get("valid"),
            )
        else:
            bs = batch["img"].shape[0]
            assert bs % grad_accum_steps == 0, (bs, grad_accum_steps)
            micro_bs = bs // grad_accum_steps
            stacked = jax.tree.map(
                lambda x: x.reshape((grad_accum_steps, micro_bs) + x.shape[1:]),
                batch,
            )

            def body(carry, mb):
                stats, grad_acc, loss_acc, ms = carry
                grads, losses, post, new_stats = micro(state.params, stats, mb)
                grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
                loss_acc = jax.tree.map(jnp.add, loss_acc, losses)
                ms = update_metrics(
                    ms,
                    post["segm_predictions"],
                    mb["mask"],
                    post["depth_predictions"],
                    mb["depth"],
                    losses,
                    valid=mb.get("valid"),
                )
                return (new_stats, grad_acc, loss_acc, ms), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            zero_losses = {
                k: jnp.zeros((), jnp.float32)
                for k in ("loss", "loss_segm", "loss_depth")
            }
            (new_stats, grads, losses, mstate), _ = jax.lax.scan(
                body,
                (state.batch_stats, zero_grads, zero_losses, mstate),
                stacked,
            )
            inv = 1.0 / grad_accum_steps
            grads = jax.tree.map(lambda g: g * inv, grads)
            losses = jax.tree.map(lambda v: v * inv, losses)
            # the scan counted each microbatch as a step; collapse to one.
            # INVARIANT: sum_i(loss_i) - (k-1)*avg == avg holds only for the
            # three loss fields corrected below — any NEW loss key added to
            # mtl_loss must be added here too, or its epoch aggregate is
            # silently inflated k-fold under grad accumulation.
            mstate = mstate.replace(
                num_steps=mstate.num_steps - (grad_accum_steps - 1),
                loss_sum=mstate.loss_sum
                - (losses["loss"] * (grad_accum_steps - 1)),
                loss_segm_sum=mstate.loss_segm_sum
                - (losses["loss_segm"] * (grad_accum_steps - 1)),
                loss_depth_sum=mstate.loss_depth_sum
                - (losses["loss_depth"] * (grad_accum_steps - 1)),
            )

        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return new_state, mstate, losses

    return _jit_step(step, mesh, donate)


def make_eval_step(
    model: nn.Module,
    loss_segm_weight: float = 1.0,
    loss_depth_weight: float = 1.0,
    mesh=None,
):
    def step(
        state: TrainState, batch: Batch, mstate: MetricState
    ) -> t.Tuple[MetricState, t.Dict[str, jax.Array]]:
        batch = decode_batch(batch)
        losses, post, _ = _forward_and_losses(
            model,
            state.params,
            state.batch_stats,
            batch,
            False,
            loss_segm_weight,
            loss_depth_weight,
        )
        mstate = update_metrics(
            mstate,
            post["segm_predictions"],
            batch["mask"],
            post["depth_predictions"],
            batch["depth"],
            losses,
            valid=batch.get("valid"),
        )
        return mstate, losses

    return _jit_step(step, mesh, donate=True, donate_argnums=(2,))


def make_predict_step(model: nn.Module, mesh=None):
    """Returns {"segm": argmax ids, "depth": sigmoid depths}
    (reference lit_module.py:155-169)."""

    def step(state: TrainState, img: jax.Array) -> t.Dict[str, jax.Array]:
        img = _constrain_to_mesh(img, mesh)
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            img,
            train=False,
        )
        post = postprocess_raw_out(out)
        return {
            "segm": post["segm_predictions"],
            "depth": post["depth_predictions"],
        }

    return jax.jit(step)


def make_predict_eval_step(
    model: nn.Module,
    loss_segm_weight: float = 1.0,
    loss_depth_weight: float = 1.0,
    mesh=None,
):
    """Single compiled pass returning preds AND accumulating predict-stage
    metrics when ground truth is present (reference predict_step,
    lit_module.py:155-169)."""

    def step(
        state: TrainState, batch: Batch, mstate: MetricState
    ) -> t.Tuple[t.Dict[str, jax.Array], MetricState, t.Dict[str, jax.Array]]:
        batch = decode_batch(batch)
        if "mask" not in batch or "depth" not in batch:
            # GT-less inference: dict keys are static under jit, so this is
            # a trace-time branch — preds only, metric state untouched
            # (reference predict_step's "if GT present" guard,
            # lit_module.py:155-169)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["img"],
                train=False,
            )
            post = postprocess_raw_out(out)
            preds = {
                "segm": post["segm_predictions"],
                "depth": post["depth_predictions"],
            }
            return preds, mstate, {}
        losses, post, _ = _forward_and_losses(
            model,
            state.params,
            state.batch_stats,
            batch,
            False,
            loss_segm_weight,
            loss_depth_weight,
        )
        mstate = update_metrics(
            mstate,
            post["segm_predictions"],
            batch["mask"],
            post["depth_predictions"],
            batch["depth"],
            losses,
            valid=batch.get("valid"),
        )
        preds = {
            "segm": post["segm_predictions"],
            "depth": post["depth_predictions"],
        }
        return preds, mstate, losses

    return _jit_step(step, mesh, donate=True, donate_argnums=(2,))


def _constrain_to_mesh(batch, mesh):
    """Pin the batch's layout inside the compiled program: dim0 on 'data',
    H on 'spatial'. With a mesh this guarantees the step computes sharded
    even when the caller hands over an unsharded (e.g. fully replicated)
    batch — GSPMD then inserts the conv halo exchanges / gradient psums.
    No-op without a mesh."""
    if mesh is None:
        return batch
    from vision_mtl_tpu.parallel.mesh import batch_sharding

    return jax.lax.with_sharding_constraint(batch, batch_sharding(mesh, batch))


def _compiler_options() -> t.Optional[t.Dict[str, str]]:
    """Optional XLA compiler options for the jitted steps from
    ``VMTL_COMPILER_OPTIONS="k=v,k=v"`` — deployment-side TPU tuning
    (e.g. ``xla_tpu_scoped_vmem_limit_kib=98304``) without code changes.
    Needed because backend flags in XLA_FLAGS cannot reach a
    remote/relay-attached compiler; per-jit compiler_options can
    (measured sweep: docs/BENCH_NOTES.md round 5)."""
    import os

    spec = os.environ.get("VMTL_COMPILER_OPTIONS")
    if not spec:
        return None
    return dict(kv.split("=", 1) for kv in spec.split(",") if "=" in kv)


def _jit_step(step, mesh, donate, donate_argnums=(0, 2)):
    if mesh is not None:
        inner = step

        def step(state, batch, mstate):
            return inner(state, _constrain_to_mesh(batch, mesh), mstate)

    kw: t.Dict[str, t.Any] = {}
    opts = _compiler_options()
    if opts:
        kw["compiler_options"] = opts
    if donate:
        return jax.jit(step, donate_argnums=donate_argnums, **kw)
    return jax.jit(step, **kw)
