"""Multi-epoch training-TRAJECTORY parity for CSNet vs the eager torch twin.

Completes the dynamics-level evidence across all three architectures
(basic: test_trajectory_parity.py, MTAN: test_mtan_trajectory.py): identical
init — two independent timm-layout encoders grafted into both frameworks —
identical batch stream, fused flax train step vs the eager CSNet twin of
tests/test_mtan_csnet_parity.py with train-mode BN; per-step loss/accuracy/
MAE trajectories must match. Exercises the gradient flow through the
diagonal cross-stitch einsum (quirk #1) under real optimization.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tests.test_mtan_csnet_parity as twin
from tests.test_torch_port import _rand_sd
from vision_mtl_tpu.metrics import compute_metrics, init_metrics
from vision_mtl_tpu.models.cross_stitch import CSNet
from vision_mtl_tpu.train.state import create_train_state
from vision_mtl_tpu.train.step import make_train_step
from vision_mtl_tpu.utils.torch_port import convert_encoder_state_dict

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

NC = 5
LR = 2e-3
STEPS = 12  # 2-batch stream cycled 6 times = 6 epochs


def test_csnet_training_trajectories_match():
    from vision_mtl_tpu.data.synthetic import SyntheticConfig, SyntheticMTLDataset

    rng = np.random.default_rng(23)
    cfg = SyntheticConfig(height=64, width=96, num_classes=NC, num_train=4)
    ds = SyntheticMTLDataset(stage="train", cfg=cfg)
    n_batches, bs = 2, 1
    batches_np = []
    for bi in range(n_batches):
        samples = [ds[bi * bs + k] for k in range(bs)]
        batches_np.append((
            np.stack([s["img"] for s in samples]).astype(np.float32),
            np.stack([s["mask"] for s in samples]).astype(np.int32),
            np.stack([s["depth"] for s in samples]).astype(np.float32),
        ))

    model = CSNet(
        task_channels={"depth": 1, "segm": NC},
        decoder_first_channel=32,
        channel_wise_stitching=True,
        dtype=jnp.float32,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(batches_np[0][0]), lr=LR
    )
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    sds_np = [_rand_sd(rng), _rand_sd(rng)]
    for ti in range(2):
        enc_p, enc_s = convert_encoder_state_dict(sds_np[ti])
        params[f"encoders_{ti}"] = enc_p
        stats[f"encoders_{ti}"] = enc_s
    # grafted encoders keep the init shapes, so the existing Adam state fits
    state = state.replace(params=params, batch_stats=stats)

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

    # torch side: encoders live in their timm layout (sds), everything else
    # (stitches/decoders/heads) in the flax layout the twin reads directly
    sds_t = [
        {k: torch.tensor(v, requires_grad=True) for k, v in sd.items()}
        for sd in sds_np
    ]
    rest = {k: v for k, v in params.items() if not k.startswith("encoders_")}
    tparams = jax.tree.map(
        lambda a: torch.tensor(np.asarray(a), requires_grad=True), rest
    )
    leaves = jax.tree.leaves(tparams) + [
        v for sd in sds_t for v in sd.values()
    ]
    opt = torch.optim.Adam(leaves, lr=LR)
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
        torch_traj = []
        for i in range(STEPS):
            x, mask, depth = tbatches[i % n_batches]
            opt.zero_grad()
            out = twin._torch_csnet(x, sds_t, tparams, None, ["depth", "segm"])
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
            torch_traj.append((float(loss.detach()), acc, mae))
    finally:
        twin.BN_TRAIN = False

    for i, ((fl, fa, fm), (tl, ta, tm)) in enumerate(zip(flax_traj, torch_traj)):
        rel = 5e-3 if i < 4 else (2e-2 if i < 8 else 6e-2)
        assert fl == pytest.approx(tl, rel=rel), (i, flax_traj, torch_traj)
        assert fm == pytest.approx(tm, rel=max(rel * 4, 2e-2), abs=5e-3), i
        assert fa == pytest.approx(ta, abs=0.08), i

    assert flax_traj[-1][0] < flax_traj[0][0] * 0.98
