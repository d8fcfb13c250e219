"""adam_torch_fused must reproduce adam_torch (optax chain) exactly:
same updates, same trajectories, schedule + weight decay included."""

import jax
import jax.numpy as jnp
import numpy as np

from molclr_tpu.train.optim import (
    adam_torch,
    adam_torch_fused,
    warmup_then_cosine,
)


def _tree(seed=0):
    r = np.random.RandomState(seed)
    return {
        "a": {"kernel": jnp.asarray(r.randn(37, 53), jnp.float32),
              "bias": jnp.asarray(r.randn(53), jnp.float32)},
        "emb": jnp.asarray(r.randn(119, 16), jnp.float32),
        "scalar": jnp.asarray(r.randn(7), jnp.float32),
    }


def _run(tx, params, n_steps, seed=1):
    state = tx.init(params)
    r = np.random.RandomState(seed)
    for _ in range(n_steps):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(r.randn(*p.shape), jnp.float32), params)
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                        updates)
    return params


def test_matches_optax_chain_constant_lr():
    p0 = _tree()
    a = _run(adam_torch(1e-3, 1e-5), p0, 5)
    b = _run(adam_torch_fused(1e-3, 1e-5), p0, 5)
    for (ka, x), (_, y) in zip(jax.tree_util.tree_leaves_with_path(a),
                               jax.tree_util.tree_leaves_with_path(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(ka))


def test_matches_optax_chain_schedule_no_wd():
    sched = warmup_then_cosine(5e-4, steps_per_epoch=2, epochs=4, warm_up=1)
    p0 = _tree(3)
    a = _run(adam_torch(sched, 0.0), p0, 8)
    b = _run(adam_torch_fused(sched, 0.0), p0, 8)
    for (ka, x), (_, y) in zip(jax.tree_util.tree_leaves_with_path(a),
                               jax.tree_util.tree_leaves_with_path(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(ka))


def test_schedule_step_alignment():
    """optax.scale_by_learning_rate with a schedule uses the inner step
    count BEFORE increment... pin that both impls consume the same step
    index by using a schedule with a hard break."""
    def sched(step):
        return jnp.where(step < 2, 1.0, 0.0) * 1e-3

    p0 = _tree(5)
    a = _run(adam_torch(sched, 0.0), p0, 4)
    b = _run(adam_torch_fused(sched, 0.0), p0, 4)
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-8)
