"""Train/eval step machinery: overfit convergence, metric exactness with
padded batches, plateau scheduler parity vs torch, sharded execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.metrics import compute_metrics, init_metrics
from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.parallel.mesh import (
    create_mesh,
    parse_mesh_shape,
    put_batch,
    shard_state,
)
from vision_mtl_tpu.train.plateau import ReduceLROnPlateau
from vision_mtl_tpu.train.state import (
    create_train_state,
    get_lr,
    param_count,
    set_lr,
)
from vision_mtl_tpu.train.step import make_eval_step, make_train_step


def _tiny_model(num_classes=5):
    return MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": num_classes},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )


def _batch(rng, bs=4, hw=16, num_classes=5):
    img = rng.uniform(size=(bs, hw, hw, 3)).astype(np.float32)
    mask = rng.integers(0, num_classes, size=(bs, hw, hw)).astype(np.int32)
    depth = rng.uniform(0.05, 1.0, size=(bs, hw, hw, 1)).astype(np.float32)
    return {
        "img": jnp.asarray(img),
        "mask": jnp.asarray(mask),
        "depth": jnp.asarray(depth),
    }


def test_overfit_single_batch(rng):
    model = _tiny_model()
    batch = _batch(rng)
    state = create_train_state(model, jax.random.key(0), batch["img"], lr=3e-3)
    step = make_train_step(model)
    mstate = init_metrics(5)
    first_loss = None
    for i in range(60):
        state, mstate, losses = step(state, batch, mstate)
        if i == 0:
            first_loss = float(losses["loss"])
    final_loss = float(losses["loss"])
    assert final_loss < 0.5 * first_loss, (first_loss, final_loss)


def test_param_count_and_lr_roundtrip(rng):
    model = _tiny_model()
    batch = _batch(rng, bs=1)
    state = create_train_state(model, jax.random.key(0), batch["img"], lr=1e-3)
    assert param_count(state) > 1000
    assert get_lr(state) == pytest.approx(1e-3)
    state = set_lr(state, 5e-4)
    assert get_lr(state) == pytest.approx(5e-4)
    # the new lr must actually drive updates
    step = make_train_step(model)
    state2, _, _ = step(state, batch, init_metrics(5))
    assert get_lr(state2) == pytest.approx(5e-4)


def test_eval_padded_batch_matches_unpadded(rng):
    model = _tiny_model()
    full = _batch(rng, bs=4)
    state = create_train_state(model, jax.random.key(0), full["img"], lr=1e-3)
    eval_step = make_eval_step(model)

    # unpadded 3-sample batch
    small = {k: v[:3] for k, v in full.items()}
    m_small, losses_small = eval_step(state, small, init_metrics(5))

    # same 3 samples padded to 4 with a junk duplicate + valid mask
    padded = {
        k: jnp.concatenate([v[:3], v[3:4]], axis=0) for k, v in full.items()
    }
    padded["valid"] = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    m_pad, losses_pad = eval_step(state, padded, init_metrics(5))

    r_small, r_pad = compute_metrics(m_small), compute_metrics(m_pad)
    for k in ("accuracy", "jaccard_index", "fbeta_score", "mae", "loss"):
        assert float(r_small[k]) == pytest.approx(float(r_pad[k]), rel=1e-5), k
    assert float(losses_small["loss"]) == pytest.approx(
        float(losses_pad["loss"]), rel=1e-5
    )


def test_sharded_step_matches_single_device(rng):
    model = _tiny_model()
    batch = _batch(rng, bs=8)
    state = create_train_state(model, jax.random.key(0), batch["img"], lr=1e-3)

    step_single = make_train_step(model, donate=False)
    s1, m1, l1 = step_single(state, batch, init_metrics(5))

    mesh = create_mesh("data:8")
    sharded_batch = put_batch(batch, mesh)
    step_sharded = make_train_step(model, mesh=mesh, donate=False)
    s2, m2, l2 = step_sharded(state, sharded_batch, init_metrics(5))

    assert float(l1["loss"]) == pytest.approx(float(l2["loss"]), rel=1e-4)
    r1, r2 = compute_metrics(m1), compute_metrics(m2)
    assert float(r1["accuracy"]) == pytest.approx(float(r2["accuracy"]), rel=1e-5)
    # params after one update agree across layouts
    p1 = jax.tree.leaves(s1.params)[0]
    p2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-4, atol=2e-6)


def test_tp_mesh_step_matches_single_device(rng):
    """data:2,model:2 tensor-parallel training == single-device training.

    Exercises the real CLI path's sharding (run_pipe -> shard_state): params
    and Adam moments laid out with the model-axis TP sharding, then one full
    train step compared leaf-for-leaf against the unsharded run."""
    model = _tiny_model()
    batch = _batch(rng, bs=4)
    state = create_train_state(model, jax.random.key(0), batch["img"], lr=1e-3)

    step_single = make_train_step(model, donate=False)
    s1, m1, l1 = step_single(state, batch, init_metrics(5))

    mesh = create_mesh("data:2,model:2", devices=jax.devices()[:4])
    # min_size=0 forces TP sharding even on this tiny model's kernels so the
    # collective path is genuinely exercised (default 2**16 only shards
    # production-sized kernels)
    tp_state = shard_state(state, mesh, min_size=0)
    # at least one param leaf must actually be sharded on the model axis
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(tp_state.params)
        if hasattr(leaf, "sharding")
    ]
    assert any("model" in (s or ()) for s in specs), specs

    step_tp = make_train_step(model, mesh=mesh, donate=False)
    tp_batch = put_batch(batch, mesh)
    s2, m2, l2 = step_tp(tp_state, tp_batch, init_metrics(5))

    assert float(l1["loss"]) == pytest.approx(float(l2["loss"]), rel=1e-4)
    r1, r2 = compute_metrics(m1), compute_metrics(m2)
    for k in ("accuracy", "jaccard_index", "mae"):
        assert float(r1[k]) == pytest.approx(float(r2[k]), rel=1e-5), k
    # Gradients agree across layouts to ~2e-6 absolute (measured), but
    # Adam's g/sqrt(v) normalization turns that noise into full sign flips
    # on near-zero gradients — two opposite lr-sized steps = 2*lr param
    # drift. Bound params by that; the multi-step loss check below carries
    # the actual parity signal.
    for p1, p2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=5e-3, atol=2.2e-3
        )
    # and the training trajectories stay together over several steps
    for _ in range(3):
        s1, m1, l1 = step_single(s1, batch, m1)
        s2, m2, l2 = step_tp(s2, tp_batch, m2)
    assert float(l1["loss"]) == pytest.approx(float(l2["loss"]), rel=5e-3)


def test_mesh_spec_rejects_unknown_axes():
    with pytest.raises(ValueError, match="Unknown mesh axis"):
        parse_mesh_shape("data:2,pipeline:2", num_devices=4)
    with pytest.raises(ValueError, match="Duplicate mesh axis"):
        parse_mesh_shape("data:2,data:2", num_devices=4)
    assert parse_mesh_shape("data:2,model:2", num_devices=4) == {
        "data": 2,
        "model": 2,
    }


def test_plateau_matches_torch():
    torch = pytest.importorskip("torch")
    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.Adam(lin.parameters(), lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, patience=2, factor=0.9
    )
    ours = ReduceLROnPlateau(patience=2, factor=0.9)
    lr = 1.0
    values = [5.0, 4.0, 4.2, 4.1, 4.05, 4.0, 3.0, 3.5, 3.4, 3.45, 3.44, 3.43]
    for v in values:
        sched.step(v)
        lr = ours.step(v, lr)
        torch_lr = opt.param_groups[0]["lr"]
        assert lr == pytest.approx(torch_lr, rel=1e-9), (v, lr, torch_lr)


def test_predict_step_without_ground_truth(rng):
    """GT-less batches (img only) produce preds and leave metrics untouched
    (reference predict_step's 'if GT present' guard, lit_module.py:155-169)."""
    import jax.numpy as jnp

    from vision_mtl_tpu.metrics import init_metrics
    from vision_mtl_tpu.models.mtan import MTANMiniUnet
    from vision_mtl_tpu.train.state import create_train_state
    from vision_mtl_tpu.train.step import make_predict_eval_step

    model = MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": 5},
        task_subnets_hidden_channels=4,
        encoder_first_channel=4,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 16, 16, 3)), lr=1e-3
    )
    step = make_predict_eval_step(model)
    m0 = init_metrics(5)
    batch = {"img": jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))}
    preds, m1, losses = step(state, batch, m0)
    assert preds["segm"].shape == (2, 16, 16)
    assert preds["depth"].shape == (2, 16, 16, 1)
    assert losses == {}
    assert float(m1.num_steps) == 0.0


def test_compiler_options_env(monkeypatch):
    """VMTL_COMPILER_OPTIONS="k=v,k=v" parses into jit compiler options;
    unset/malformed entries are ignored (train/step.py; the knob exists
    because XLA_FLAGS cannot reach a remote/relay-attached compiler)."""
    from vision_mtl_tpu.train.step import _compiler_options

    monkeypatch.delenv("VMTL_COMPILER_OPTIONS", raising=False)
    assert _compiler_options() is None
    monkeypatch.setenv(
        "VMTL_COMPILER_OPTIONS",
        "xla_tpu_scoped_vmem_limit_kib=98304,a=b=c,junk",
    )
    assert _compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "98304",
        "a": "b=c",
    }
