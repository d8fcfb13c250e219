"""NT-Xent (normalized temperature-scaled cross-entropy) contrastive loss.

Matches the reference loss (ref utils/nt_xent.py:47-65) in closed form: with
representations r = [zjs; zis] (2B rows) and pairwise similarity s,

    loss_i = -s(i, partner(i))/T + logsumexp_{j != i} s(i, j)/T
    loss   = mean_i loss_i

which is identical to the reference's [positive | negatives] cross-entropy
against class 0 (the denominator there is {partner} + (all except self and
partner) = all except self), without materializing the boolean mask — and so
without the static-batch-size mask table the reference precomputes
(nt_xent.py:24-30, quirk Q9). drop_last stays required only for batch-shape
staticness, not correctness.

Under data parallelism the reference semantics require GLOBAL in-batch
negatives, so projections are all-gathered over the mesh axis before the
similarity matrix (SURVEY §2.5); every replica computes the identical global
loss, keeping gradients consistent without extra communication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nt_xent_loss(zis, zjs, temperature: float = 0.1,
                 use_cosine: bool = True, axis_name: str | None = None,
                 pair_mask=None):
    """zis, zjs: [B, D] projections of the two augmented views.

    axis_name: mesh axis to all-gather over for global negatives (None for
    single-device).
    pair_mask: optional [B] bool of real (non-padding) pairs. With a mask,
    padded rows contribute neither positives nor negatives — this removes
    the reference's drop_last correctness requirement (quirk Q9) for
    partially-filled batches."""
    if axis_name is not None:
        # [n_dev, B, D] -> [n_dev*B, D]; row order is consistent across
        # replicas so the loss is identical everywhere.
        zis = jax.lax.all_gather(zis, axis_name).reshape(-1, zis.shape[-1])
        zjs = jax.lax.all_gather(zjs, axis_name).reshape(-1, zjs.shape[-1])
        if pair_mask is not None:
            pair_mask = jax.lax.all_gather(pair_mask, axis_name).reshape(-1)

    b = zis.shape[0]
    reps = jnp.concatenate([zjs, zis], axis=0)  # [2B, D] (order per reference)
    if use_cosine:
        reps = reps / jnp.maximum(
            jnp.linalg.norm(reps, axis=-1, keepdims=True), 1e-12)
    sim = (reps @ reps.T) / temperature          # [2B, 2B]

    n = 2 * b
    idx = jnp.arange(n)
    partner = jnp.where(idx < b, idx + b, idx - b)
    pos = sim[idx, partner]
    # denominator: all j except the diagonal (and padded columns)
    dead = jnp.eye(n, dtype=bool)
    if pair_mask is not None:
        row_mask = jnp.concatenate([pair_mask, pair_mask])
        dead = dead | ~row_mask[None, :]
    sim_no_diag = jnp.where(dead, -jnp.inf, sim)
    denom = jax.nn.logsumexp(sim_no_diag, axis=-1)
    per_row = denom - pos
    if pair_mask is None:
        return jnp.mean(per_row)
    row_mask = jnp.concatenate([pair_mask, pair_mask]).astype(per_row.dtype)
    return (per_row * row_mask).sum() / jnp.maximum(row_mask.sum(), 1.0)
