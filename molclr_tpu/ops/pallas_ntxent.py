"""Fused NT-Xent contrastive loss as Pallas TPU kernels.

Flash-attention-style formulation: the [2B, 2B] similarity matrix is never
materialized in HBM. The forward kernel streams column blocks through VMEM,
maintaining an online (max, sumexp) pair per row plus the positive-pair
similarity; the backward kernel recomputes similarity blocks and accumulates

    d reps = (P + P^T) @ reps / temperature,
    P_ij   = valid_i * (softmax_row_i(S masked)_j - onehot_partner(i)_j)
             / n_valid

in the same column sweep (the P^T term reuses the transposed block with the
other rows' saved softmax statistics). Cosine normalization happens outside
in JAX, so its chain rule composes via standard autodiff.

pair_mask semantics match losses/nt_xent_loss: masked pairs contribute
neither positives nor negatives (their rows AND columns are dead) and the
loss is the mean over valid rows — so the kernel is a drop-in for the
masked loss the trainers actually call (PretrainConfig.ntxent_impl =
'pallas' wires it through train/pretrain.py).

Semantics are pinned to losses/nt_xent.py (the closed form of the
reference utils/nt_xent.py:47-65); parity + gradient tests run the kernels
in interpreter mode on CPU (tests/test_pallas_ntxent.py), and
runs/bench_ntxent.py compares against the XLA path on hardware (numbers in
docs/DESIGN.md "Fused NT-Xent"). For small batches the XLA path is already
fast — this kernel exists for large-B global batches (the [2B, 2B] matrix
at B=8192 is 1 GiB in fp32; the fused kernel needs O(block) memory).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _fwd_kernel(reps_ref, valid_ref, inv_t_ref, m_ref, l_ref, pos_ref, *,
                blk: int):
    # reps fully VMEM-resident (compiled Mosaic only loads from VMEM/SMEM);
    # per-row stats are [n_blocks, blk] so stores are 2-D rows.
    n, d = reps_ref.shape
    n_blocks = n // blk
    i = pl.program_id(0)
    rows = reps_ref[pl.ds(i * blk, blk), :]               # [blk, d]
    inv_t = inv_t_ref[0, 0]
    b = n // 2

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)[:, 0] \
        + i * blk
    partner = jnp.where(row_ids < b, row_ids + b, row_ids - b)

    m = jnp.full((blk,), NEG, jnp.float32)
    l = jnp.zeros((blk,), jnp.float32)
    pos = jnp.zeros((blk,), jnp.float32)

    def body(j, carry):
        m, l, pos = carry
        cols = reps_ref[pl.ds(j * blk, blk), :]
        v_cols = valid_ref[j, :]                          # [blk] float 0/1
        s = jax.lax.dot_general(
            rows, cols, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_t   # [blk, blk]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1) \
            + j * blk
        dead = (col_ids == row_ids[:, None]) | (v_cols[None, :] == 0.0)
        s = jnp.where(dead, NEG, s)
        is_pos = col_ids == partner[:, None]
        pos = pos + jnp.where(is_pos, s, 0.0).sum(axis=1)
        m_new = jnp.maximum(m, s.max(axis=1))
        l = l * jnp.exp(m - m_new) + jnp.exp(
            s - m_new[:, None]).sum(axis=1)
        return m_new, l, pos

    m, l, pos = jax.lax.fori_loop(0, n_blocks, body, (m, l, pos))
    m_ref[i, :] = m
    l_ref[i, :] = l
    pos_ref[i, :] = pos


def _bwd_kernel(reps_ref, valid_ref, inv_t_ref, inv_n_ref, m_ref, l_ref,
                dreps_ref, *, blk: int):
    n, d = reps_ref.shape
    n_blocks = n // blk
    i = pl.program_id(0)
    rows = reps_ref[pl.ds(i * blk, blk), :]
    inv_t = inv_t_ref[0, 0]
    scale = inv_n_ref[0, 0]           # 1 / n_valid
    b = n // 2

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)[:, 0] \
        + i * blk
    partner = jnp.where(row_ids < b, row_ids + b, row_ids - b)
    m_rows = m_ref[i, :]
    l_rows = l_ref[i, :]
    v_rows = valid_ref[i, :]

    acc = jnp.zeros((blk, d), jnp.float32)

    def body(j, acc):
        cols = reps_ref[pl.ds(j * blk, blk), :]
        v_cols = valid_ref[j, :]
        s = jax.lax.dot_general(
            rows, cols, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_t
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1) \
            + j * blk
        diag = col_ids == row_ids[:, None]
        # P block for my rows: columns dead when padded or diagonal
        s_mine = jnp.where(diag | (v_cols[None, :] == 0.0), NEG, s)
        p = jnp.exp(s_mine - m_rows[:, None]) / l_rows[:, None]
        p = p - jnp.where(col_ids == partner[:, None], 1.0, 0.0)
        p = p * (scale * v_rows[:, None])
        acc = acc + jax.lax.dot_general(
            p, cols, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # P^T block: the cols' softmax evaluated at MY rows — those
        # entries are dead when MY row is padded
        m_cols = m_ref[j, :]
        l_cols = l_ref[j, :]
        col_partner = jnp.where(col_ids < b, col_ids + b, col_ids - b)
        s_theirs = jnp.where(diag | (v_rows[:, None] == 0.0), NEG, s)
        pt = jnp.exp(s_theirs - m_cols[None, :]) / l_cols[None, :]
        pt = pt - jnp.where(col_partner == row_ids[:, None], 1.0, 0.0)
        pt = pt * (scale * v_cols[None, :])
        acc = acc + jax.lax.dot_general(
            pt, cols, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, n_blocks, body, acc)
    dreps_ref[pl.ds(i * blk, blk), :] = acc * inv_t


def _choose_blk(n: int) -> int:
    for blk in (512, 256, 128):
        if n % blk == 0:
            return blk
    raise ValueError(f"2B={n} must be a multiple of 128 for the fused "
                     f"NT-Xent kernel")


def _run_fwd(reps, valid, inv_t, blk, interpret):
    n, d = reps.shape
    nb = n // blk
    m, l, pos = pl.pallas_call(
        functools.partial(_fwd_kernel, blk=blk),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((nb, blk), jnp.float32)] * 3,
        interpret=interpret,
    )(reps, valid.reshape(nb, blk), inv_t)
    return m.reshape(n), l.reshape(n), pos.reshape(n)


def _run_bwd(reps, valid, inv_t, inv_n, m, l, blk, interpret):
    n, d = reps.shape
    nb = n // blk
    return pl.pallas_call(
        functools.partial(_bwd_kernel, blk=blk),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(reps, valid.reshape(nb, blk), inv_t, inv_n,
      m.reshape(nb, blk), l.reshape(nb, blk))


def _masked_mean(m, l, pos, valid):
    per_row = m + jnp.log(l) - pos            # garbage-but-finite on dead
    n_valid = jnp.maximum(valid.sum(), 1.0)
    return jnp.where(valid > 0, per_row, 0.0).sum() / n_valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _ntxent_core(reps, valid, temperature, interpret):
    """loss for pre-normalized reps [2B, D] (fp32); valid [2B] float 0/1."""
    n = reps.shape[0]
    blk = _choose_blk(n)
    inv_t = jnp.full((1, 1), 1.0 / temperature, jnp.float32)
    m, l, pos = _run_fwd(reps, valid, inv_t, blk, interpret)
    return _masked_mean(m, l, pos, valid)


def _core_fwd(reps, valid, temperature, interpret):
    n = reps.shape[0]
    blk = _choose_blk(n)
    inv_t = jnp.full((1, 1), 1.0 / temperature, jnp.float32)
    m, l, pos = _run_fwd(reps, valid, inv_t, blk, interpret)
    loss = _masked_mean(m, l, pos, valid)
    return loss, (reps, valid, m, l)


def _core_bwd(temperature, interpret, res, g):
    reps, valid, m, l = res
    n = reps.shape[0]
    blk = _choose_blk(n)
    inv_t = jnp.full((1, 1), 1.0 / temperature, jnp.float32)
    inv_n = (1.0 / jnp.maximum(valid.sum(), 1.0)).reshape(1, 1)
    dreps = _run_bwd(reps, valid, inv_t, inv_n, m, l, blk, interpret)
    return (dreps * g, None)


_ntxent_core.defvjp(_core_fwd, _core_bwd)


def nt_xent_pallas(zis, zjs, temperature: float = 0.1,
                   use_cosine: bool = True, axis_name: str | None = None,
                   pair_mask=None, interpret: bool = False):
    """Drop-in fused replacement for losses.nt_xent_loss.

    Any B is legal: when the (globally gathered) pair count is not a
    multiple of 64 — e.g. the fresh-compositions units path trains on
    t*G_t graph slots, a data-dependent count — both halves are padded
    with dead pairs (pair_mask=0) up to the next multiple of 64, so the
    kernel's 2B is always a multiple of 128. Dead pairs contribute
    neither positives nor negatives and the loss is the mean over valid
    rows, so padding is exact (pinned vs the XLA loss in
    tests/test_pallas_ntxent.py). Cosine normalization runs in JAX so
    its gradient composes with the kernel's custom VJP. pair_mask [B]
    marks real (non-padding) pairs, same semantics as the XLA loss."""
    if axis_name is not None:
        zis = jax.lax.all_gather(zis, axis_name).reshape(-1, zis.shape[-1])
        zjs = jax.lax.all_gather(zjs, axis_name).reshape(-1, zjs.shape[-1])
        if pair_mask is not None:
            pair_mask = jax.lax.all_gather(pair_mask,
                                           axis_name).reshape(-1)
    b = zis.shape[0]
    pad = (-b) % 64
    if pad:
        # pad PER HALF (not after the concat) so the +-B partner offsets
        # of the [zjs; zis] stacking stay aligned
        zpad = jnp.zeros((pad, zis.shape[-1]), zis.dtype)
        zis = jnp.concatenate([zis, zpad], axis=0)
        zjs = jnp.concatenate([zjs, zpad.astype(zjs.dtype)], axis=0)
        if pair_mask is None:
            pair_mask = jnp.arange(b + pad) < b
        else:
            pair_mask = jnp.concatenate(
                [pair_mask.astype(jnp.bool_),
                 jnp.zeros((pad,), jnp.bool_)])
    reps = jnp.concatenate([zjs, zis], axis=0).astype(jnp.float32)
    if use_cosine:
        reps = reps / jnp.maximum(
            jnp.linalg.norm(reps, axis=-1, keepdims=True), 1e-12)
    if pair_mask is None:
        valid = jnp.ones(reps.shape[0], jnp.float32)
    else:
        valid = jnp.concatenate(
            [pair_mask, pair_mask]).astype(jnp.float32)
    return _ntxent_core(reps, valid, float(temperature), interpret)
