"""Multi-epoch training-TRAJECTORY parity for MTAN vs the eager torch twin.

test_trajectory_parity.py pins the hard-sharing model's dynamics; this does
the same for the flagship Cityscapes architecture (reference
scripts/train_cityscapes.sh trains MTAN): identical init, identical batch
stream, fused flax train step (train-mode BN, Adam) vs the eager torch twin
of tests/test_mtan_csnet_parity.py run with train-mode BN — per-step loss /
accuracy / depth-MAE trajectories must match.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tests.test_mtan_csnet_parity as twin
from vision_mtl_tpu.metrics import compute_metrics, init_metrics
from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.train.state import create_train_state
from vision_mtl_tpu.train.step import make_train_step

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

NC = 5
LR = 2e-3
N_LEVELS = 2
STEPS = 24  # 3-batch stream cycled 8 times = 8 epochs


def _torch_step_fn(tparams, batches):
    opt = torch.optim.Adam(jax.tree.leaves(tparams), lr=LR)

    def step(bi):
        x, mask, depth = batches[bi]
        opt.zero_grad()
        out = twin._torch_mtan(
            x, tparams, None, n_levels=N_LEVELS, task_names=["depth", "segm"]
        )
        loss_segm = F.cross_entropy(out["segm"], mask)
        dp = torch.sigmoid(out["depth"]).permute(0, 2, 3, 1)
        m = depth > 1e-3
        g = torch.log(dp[m]) - torch.log(depth[m])
        loss = loss_segm + 10 * torch.sqrt(
            torch.var(g) + 0.15 * torch.mean(g) ** 2
        )
        loss.backward()
        opt.step()
        with torch.no_grad():
            acc = float((out["segm"].argmax(1) == mask).float().mean())
            mae = float((dp - depth).abs().mean())
        return float(loss.detach()), acc, mae

    return step


def test_mtan_training_trajectories_match():
    from vision_mtl_tpu.data.synthetic import SyntheticConfig, SyntheticMTLDataset

    cfg = SyntheticConfig(height=16, width=24, num_classes=NC, num_train=6)
    ds = SyntheticMTLDataset(stage="train", cfg=cfg)
    n_batches, bs = 3, 2
    batches_np = []
    for bi in range(n_batches):
        samples = [ds[bi * bs + k] for k in range(bs)]
        batches_np.append((
            np.stack([s["img"] for s in samples]).astype(np.float32),
            np.stack([s["mask"] for s in samples]).astype(np.int32),
            np.stack([s["depth"] for s in samples]).astype(np.float32),
        ))

    model = MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": NC},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=N_LEVELS,
        dtype=jnp.float32,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(batches_np[0][0]), lr=LR
    )
    params0 = jax.device_get(state.params)

    step = make_train_step(model, donate=False)
    jbatches = [
        {"img": jnp.asarray(x), "mask": jnp.asarray(m), "depth": jnp.asarray(d)}
        for x, m, d in batches_np
    ]
    flax_traj = []
    for i in range(STEPS):
        mstate = init_metrics(NC)
        state, mstate, losses = step(state, jbatches[i % n_batches], mstate)
        met = compute_metrics(mstate)
        flax_traj.append(
            (float(losses["loss"]), float(met["accuracy"]), float(met["mae"]))
        )

    # torch side: identical init (the flax param tree IS the twin's weight
    # format), identical batches, train-mode BN
    tparams = jax.tree.map(
        lambda a: torch.tensor(np.asarray(a), requires_grad=True), params0
    )
    tbatches = [
        (
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(m).long(),
            torch.from_numpy(d),
        )
        for x, m, d in batches_np
    ]
    twin.BN_TRAIN = True
    try:
        tstep = _torch_step_fn(tparams, tbatches)
        torch_traj = [tstep(i % n_batches) for i in range(STEPS)]
    finally:
        twin.BN_TRAIN = False

    for i, ((fl, fa, fm), (tl, ta, tm)) in enumerate(zip(flax_traj, torch_traj)):
        rel = 5e-3 if i < 8 else (2e-2 if i < 16 else 6e-2)
        assert fl == pytest.approx(tl, rel=rel), (i, flax_traj, torch_traj)
        assert fm == pytest.approx(tm, rel=max(rel * 4, 2e-2), abs=5e-3), i
        # pixel accuracy is a discrete statistic on 768 pixels
        assert fa == pytest.approx(ta, abs=0.08), i

    # both sides must actually learn (training dynamics, not noise)
    assert flax_traj[-1][0] < flax_traj[0][0] * 0.95
