"""Optional exact-torch BatchNorm (unbiased running-var update).

docs/QUIRKS.md #11: flax nn.BatchNorm updates running_var with the BIASED
batch variance; torch uses the UNBIASED (N/(N-1)) estimator for the running
update (torch _BatchNorm.forward). The --torch_bn_var switch
(blocks.set_torch_bn_running_var) makes our BN torch-exact; these tests
prove the switch and the checkpoint compatibility claim.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.models import blocks
from vision_mtl_tpu.models.blocks import (
    BatchNorm,
    ConvBNAct,
    TorchVarBatchNorm,
    set_torch_bn_running_var,
)


@pytest.fixture
def torch_bn_flag():
    """Restore the global switch after each test."""
    before = blocks.torch_bn_running_var()
    yield set_torch_bn_running_var
    set_torch_bn_running_var(before)


def _train_updates(module, x_batches, variables):
    """Run train-mode forward passes, threading batch_stats."""
    outs = []
    for x in x_batches:
        out, updates = module.apply(
            variables, x, mutable=["batch_stats"]
        )
        variables = {**variables, "batch_stats": updates["batch_stats"]}
        outs.append(out)
    return outs, variables


def test_param_tree_identical_across_switch(torch_bn_flag):
    """Same param/stat paths, shapes, AND initial values either way —
    checkpoints are interchangeable across the switch."""
    x = jnp.zeros((2, 8, 8, 3))
    module = ConvBNAct(16, dtype=jnp.float32)
    torch_bn_flag(False)
    v_off = module.init(jax.random.key(0), x, True)
    torch_bn_flag(True)
    v_on = module.init(jax.random.key(0), x, True)
    flat_off = jax.tree_util.tree_flatten_with_path(v_off)
    flat_on = jax.tree_util.tree_flatten_with_path(v_on)
    assert [p for p, _ in flat_off[0]] == [p for p, _ in flat_on[0]]
    for (_, a), (_, b) in zip(flat_off[0], flat_on[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unbiased_running_stats_match_torch(torch_bn_flag):
    """With the switch ON, running mean/var and eval-mode outputs track
    torch.nn.BatchNorm2d exactly through several train-mode updates."""
    torch = pytest.importorskip("torch")
    torch_bn_flag(True)

    rng = np.random.default_rng(0)
    batches = [
        rng.normal(size=(4, 6, 5, 3)).astype(np.float32) * (i + 1)
        for i in range(3)
    ]

    bn = BatchNorm(use_running_average=False)
    variables = bn.init(jax.random.key(0), jnp.asarray(batches[0]))
    # give scale/bias non-trivial values so the affine path is exercised
    inner = variables["params"]["BatchNorm_0"]
    inner["scale"] = jnp.asarray(
        rng.normal(size=inner["scale"].shape).astype(np.float32)
    )
    inner["bias"] = jnp.asarray(
        rng.normal(size=inner["bias"].shape).astype(np.float32)
    )

    tbn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(np.asarray(inner["scale"])))
        tbn.bias.copy_(torch.from_numpy(np.asarray(inner["bias"])))
    tbn.train()

    train_outs, variables = _train_updates(
        bn, [jnp.asarray(b) for b in batches], variables
    )
    t_train_outs = [
        tbn(torch.from_numpy(b.transpose(0, 3, 1, 2))) for b in batches
    ]

    stats = variables["batch_stats"]["BatchNorm_0"]
    np.testing.assert_allclose(
        np.asarray(stats["mean"]),
        tbn.running_mean.detach().numpy(),
        rtol=1e-6,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]),
        tbn.running_var.detach().numpy(),
        rtol=1e-6,
        atol=1e-7,
    )
    for got, want in zip(train_outs, t_train_outs):
        np.testing.assert_allclose(
            np.asarray(got),
            want.detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-5,
            atol=1e-5,
        )

    # eval-mode activations through the trained running stats
    tbn.eval()
    ebn = BatchNorm(use_running_average=True)
    x = jnp.asarray(batches[0])
    got = ebn.apply(variables, x)
    want = tbn(torch.from_numpy(batches[0].transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(got),
        want.detach().numpy().transpose(0, 2, 3, 1),
        rtol=1e-5,
        atol=1e-6,
    )


def test_biased_default_shows_the_quirk(torch_bn_flag):
    """With the switch OFF (flax default), the running var differs from
    torch by exactly the n/(n-1) factor after one update from ones-init —
    the quirk the switch eliminates."""
    torch_bn_flag(False)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    bn = BatchNorm(use_running_average=False)
    variables = bn.init(jax.random.key(0), jnp.asarray(x))
    _, variables = _train_updates(bn, [jnp.asarray(x)], variables)
    biased_var = np.asarray(variables["batch_stats"]["BatchNorm_0"]["var"])

    torch_bn_flag(True)
    v_on = bn.init(jax.random.key(0), jnp.asarray(x))
    _, v_on = _train_updates(bn, [jnp.asarray(x)], v_on)
    unbiased_var = np.asarray(v_on["batch_stats"]["BatchNorm_0"]["var"])

    n = x.shape[0] * x.shape[1] * x.shape[2]
    batch_v = np.var(x, axis=(0, 1, 2))
    np.testing.assert_allclose(
        unbiased_var - biased_var,
        0.1 * batch_v * (n / (n - 1) - 1.0),
        rtol=1e-4,
        atol=1e-7,
    )


def test_folded_bn_matches_unfolded_under_switch(torch_bn_flag):
    """FoldedBatchNorm's tied-stats running update applies the same
    unbiased correction — fold on/off stays numerically identical with the
    switch on."""
    from vision_mtl_tpu.ops.fold import space_to_depth

    torch_bn_flag(True)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)

    bn = BatchNorm(use_running_average=False)
    v = bn.init(jax.random.key(0), jnp.asarray(x))
    _, v = _train_updates(bn, [jnp.asarray(x)], v)

    fbn = blocks.FoldedBatchNorm(use_running_average=False)
    xf = space_to_depth(jnp.asarray(x))
    vf = fbn.init(jax.random.key(0), xf)
    _, vf = _train_updates(fbn, [xf], vf)

    np.testing.assert_allclose(
        np.asarray(vf["batch_stats"]["BatchNorm_0"]["var"]),
        np.asarray(v["batch_stats"]["BatchNorm_0"]["var"]),
        rtol=1e-5,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(vf["batch_stats"]["BatchNorm_0"]["mean"]),
        np.asarray(v["batch_stats"]["BatchNorm_0"]["mean"]),
        rtol=1e-5,
        atol=1e-7,
    )


def test_gatechain_honors_switch(torch_bn_flag):
    """MTAN's GateChain BNs must also use the unbiased running-var update
    under the switch (round-4 advisor: the reference MTAN attention BNs are
    torch BatchNorm2d). With the switch on, var1/var2 running values equal
    momentum*1 + (1-momentum)*batch_var*N/(N-1); off, the biased update."""
    from vision_mtl_tpu.models.mtan import GateChain

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
    shared = jnp.asarray(rng.normal(size=(2, 4, 4, 5)).astype(np.float32))
    module = GateChain(hidden=6, gate_features=5, dtype=jnp.float32)

    def run(flag):
        torch_bn_flag(flag)
        variables = module.init(jax.random.key(0), x, shared, True)
        _, updates = module.apply(
            variables, x, shared, True, mutable=["batch_stats"]
        )
        return updates["batch_stats"]

    stats_off = run(False)
    stats_on = run(True)
    n = 2 * 4 * 4  # reduction count per channel
    corr = n / (n - 1)
    for key in ("var1", "var2"):
        off = np.asarray(stats_off[key])
        on = np.asarray(stats_on[key])
        # running = 0.9*init(1) + 0.1*batch_var[*corr]
        batch_var = (off - 0.9) / 0.1
        expect_on = 0.9 + 0.1 * batch_var * corr
        np.testing.assert_allclose(on, expect_on, rtol=1e-5)
        assert not np.allclose(on, off)
    # means unaffected by the switch
    for key in ("mean1", "mean2"):
        np.testing.assert_allclose(
            np.asarray(stats_off[key]), np.asarray(stats_on[key]), rtol=1e-6
        )
