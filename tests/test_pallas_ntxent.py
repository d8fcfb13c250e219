"""Fused Pallas NT-Xent vs the XLA reference implementation (interpreter
mode on CPU): forward values and gradients must match."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molclr_tpu.losses import nt_xent_loss
from molclr_tpu.ops.pallas_ntxent import nt_xent_pallas


@pytest.mark.parametrize("b,d", [(64, 128), (128, 256), (192, 128)])
@pytest.mark.parametrize("use_cosine", [True, False])
def test_forward_matches(b, d, use_cosine):
    rng = np.random.RandomState(b + d)
    zis = jnp.array(rng.randn(b, d), jnp.float32)
    zjs = jnp.array(rng.randn(b, d), jnp.float32)
    ref = float(nt_xent_loss(zis, zjs, 0.1, use_cosine))
    got = float(nt_xent_pallas(zis, zjs, 0.1, use_cosine, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


@pytest.mark.parametrize("b,d", [(64, 128), (128, 256)])
def test_grads_match(b, d):
    rng = np.random.RandomState(b)
    zis = jnp.array(rng.randn(b, d), jnp.float32)
    zjs = jnp.array(rng.randn(b, d), jnp.float32)

    g_ref = jax.grad(
        lambda a, c: nt_xent_loss(a, c, 0.1, True), argnums=(0, 1))(
        zis, zjs)
    g_pal = jax.grad(
        lambda a, c: nt_xent_pallas(a, c, 0.1, True, interpret=True),
        argnums=(0, 1))(zis, zjs)
    for r, p in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=2e-4, atol=2e-5)


def test_loss_scale_grad():
    """Custom VJP must respect an outer cotangent scale."""
    rng = np.random.RandomState(0)
    zis = jnp.array(rng.randn(64, 128), jnp.float32)
    zjs = jnp.array(rng.randn(64, 128), jnp.float32)
    g1 = jax.grad(lambda a: 3.0 * nt_xent_pallas(a, zjs, 0.1,
                                                 interpret=True))(zis)
    g2 = jax.grad(lambda a: nt_xent_pallas(a, zjs, 0.1,
                                           interpret=True))(zis)
    np.testing.assert_allclose(np.asarray(g1), 3 * np.asarray(g2),
                               rtol=1e-4, atol=1e-8)


def test_bad_batch_size():
    zis = jnp.ones((50, 128))
    with pytest.raises(ValueError, match="multiple of 128"):
        nt_xent_pallas(zis, zis, 0.1, interpret=True)


@pytest.mark.parametrize("n_real", [40, 64])
def test_pair_mask_matches_xla(n_real):
    """Masked pairs contribute neither positives nor negatives; loss and
    gradients must match the masked XLA loss (the form the trainers call,
    train/pretrain.py loss_fn)."""
    b, d = 64, 128
    rng = np.random.RandomState(7)
    zis = jnp.array(rng.randn(b, d), jnp.float32)
    zjs = jnp.array(rng.randn(b, d), jnp.float32)
    mask = jnp.arange(b) < n_real

    ref = float(nt_xent_loss(zis, zjs, 0.1, True, pair_mask=mask))
    got = float(nt_xent_pallas(zis, zjs, 0.1, True, pair_mask=mask,
                               interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    g_ref = jax.grad(
        lambda a, c: nt_xent_loss(a, c, 0.1, True, pair_mask=mask),
        argnums=(0, 1))(zis, zjs)
    g_pal = jax.grad(
        lambda a, c: nt_xent_pallas(a, c, 0.1, True, pair_mask=mask,
                                    interpret=True),
        argnums=(0, 1))(zis, zjs)
    for r, p in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=2e-4, atol=2e-5)
    # padded rows receive zero gradient
    if n_real < b:
        assert np.abs(np.asarray(g_pal[0])[n_real:]).max() == 0.0
