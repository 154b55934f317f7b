"""Inference/eval sweep — the reference's ``predict`` entry
(training_lit.py:186-216): iterate the predict loader, collect per-batch
{"segm","depth"} predictions, accumulate predict-stage metrics when ground
truth is present, optionally plot grids to the experiment tracker.
"""

from __future__ import annotations

import typing as t

import jax
import numpy as np

from vision_mtl_tpu.data.loader import DataLoader, prefetch_to_device
from vision_mtl_tpu.metrics import compute_metrics, init_metrics
from vision_mtl_tpu.train.state import TrainState
from vision_mtl_tpu.train.step import make_predict_eval_step


def predict(
    predict_dataloader: DataLoader,
    model: t.Any,
    state: TrainState,
    num_classes: int,
    mesh: t.Any = None,
    do_plot_preds: bool = False,
    exp: t.Any = None,
    do_show_preds: bool = False,
    loss_segm_weight: float = 1.0,
    loss_depth_weight: float = 1.0,
) -> t.Tuple[t.List[t.Dict[str, np.ndarray]], t.Dict[str, float]]:
    """Returns (list of per-batch pred dicts, predict-stage metrics)."""
    step = make_predict_eval_step(
        model,
        loss_segm_weight=loss_segm_weight,
        loss_depth_weight=loss_depth_weight,
        mesh=mesh,
    )
    replicate = None
    if mesh is not None and jax.process_count() > 1:
        # multi-process: step outputs stay sharded over the global mesh and
        # a host cannot device_get non-addressable shards. The compiled
        # all-gather makes every output locally fetchable — and being
        # collective, EVERY process must run it on the same arrays (which
        # they do: this loop is SPMD-uniform).
        from vision_mtl_tpu.parallel.mesh import replicate_gather

        replicate = replicate_gather(mesh)
    mstate = init_metrics(num_classes)
    preds: t.List[t.Dict[str, np.ndarray]] = []
    for batch in prefetch_to_device(predict_dataloader, mesh, size=2):
        batch_preds, mstate, _ = step(state, batch, mstate)
        host_preds = jax.device_get(
            replicate(batch_preds) if replicate else batch_preds
        )
        valid = batch.get("valid")
        if valid is not None:
            valid = replicate(valid) if replicate else valid
            n_valid = int(np.sum(np.asarray(jax.device_get(valid))))
            host_preds = {k: v[:n_valid] for k, v in host_preds.items()}
        preds.append(host_preds)
        if do_plot_preds:
            try:
                # the batch gather is collective — run it on every process;
                # only process 0 pays the host fetch and renders/logs
                gathered = replicate(batch) if replicate else batch
                if jax.process_index() != 0:
                    continue
                host_batch = jax.device_get(gathered)
                from vision_mtl_tpu.vis import plot_preds

                import matplotlib.pyplot as plt

                fig = plot_preds(
                    batch_size=host_preds["segm"].shape[0],
                    inputs_batch=host_batch,
                    preds_batch=host_preds,
                )
                if exp:
                    exp.log_figure("preds", fig)
                if do_show_preds:
                    plt.show()
                plt.close(fig)
            except Exception as e:
                print("plot failed:", e)
    if float(mstate.num_steps) == 0.0:
        # GT-less sweep: no metrics were accumulated (reference
        # predict_step only computes metrics "when GT present")
        return preds, {}
    predict_metrics = {
        f"predict/{k}": float(v) for k, v in compute_metrics(mstate).items()
    }
    return preds, predict_metrics


def save_preds(preds: t.List[t.Dict[str, np.ndarray]], path: str) -> None:
    """Persist concatenated predictions (.npz — the reference saves a torch
    pickle ``preds.pt``, training_lit.py:261)."""
    if not preds:
        return
    np.savez_compressed(
        path,
        segm=np.concatenate([p["segm"] for p in preds], axis=0),
        depth=np.concatenate([p["depth"] for p in preds], axis=0),
    )
