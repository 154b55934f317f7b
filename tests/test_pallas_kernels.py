"""Pallas kernels in interpret mode (CPU) vs reference numpy computations."""

import numpy as np

import jax.numpy as jnp

from vision_mtl_tpu.ops.pallas.confmat import confusion_matrix


def _np_confmat(t, p, c, w=None):
    cm = np.zeros((c, c), np.float32)
    w = np.ones_like(t, np.float32) if w is None else w
    for ti, pi, wi in zip(t.ravel(), p.ravel(), np.asarray(w).ravel()):
        cm[ti, pi] += wi
    return cm


def test_confmat_matches_numpy(rng):
    c = 19
    t = rng.integers(0, c, size=(3, 64, 64))
    p = rng.integers(0, c, size=(3, 64, 64))
    got = np.asarray(
        confusion_matrix(jnp.asarray(t), jnp.asarray(p), c, interpret=True)
    )
    np.testing.assert_allclose(got, _np_confmat(t, p, c))


def test_confmat_weighted_and_padded(rng):
    c = 7
    n = 5000  # not a multiple of the kernel tile
    t = rng.integers(0, c, size=n)
    p = rng.integers(0, c, size=n)
    w = rng.uniform(0, 1, size=n).astype(np.float32)
    got = np.asarray(
        confusion_matrix(
            jnp.asarray(t), jnp.asarray(p), c, jnp.asarray(w), interpret=True
        )
    )
    np.testing.assert_allclose(got, _np_confmat(t, p, c, w), rtol=1e-5)


def test_confmat_total_count(rng):
    c = 5
    t = rng.integers(0, c, size=(2, 33, 17))
    p = rng.integers(0, c, size=(2, 33, 17))
    got = confusion_matrix(jnp.asarray(t), jnp.asarray(p), c, interpret=True)
    assert float(jnp.sum(got)) == t.size
