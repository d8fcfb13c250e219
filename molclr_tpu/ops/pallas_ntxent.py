"""Fused NT-Xent contrastive loss as Pallas TPU kernels.

Flash-attention-style formulation: the [2B, 2B] similarity matrix is never
materialized in HBM. The forward kernel streams column blocks through VMEM,
maintaining an online (max, sumexp) pair per row plus the positive-pair
similarity; the backward kernel recomputes similarity blocks and accumulates

    d reps = (P + P^T) @ reps / temperature,
    P_ij   = softmax_row_i(S masked)_j / n - onehot_partner(i)_j / n

in the same column sweep (the P^T term reuses the transposed block with the
other rows' saved softmax statistics). Cosine normalization happens outside
in JAX, so its chain rule composes via standard autodiff.

Semantics match losses/nt_xent.py exactly (same closed form as the
reference utils/nt_xent.py:47-65); parity + gradient tests run the kernels
in interpreter mode on CPU, and bench_ntxent.py compares against the XLA
path on hardware. For small batches the XLA path is already fast — this
kernel exists for large-B global batches (the [2B,2B] matrix at B=8192 is
1 GiB in fp32; the fused kernel needs O(block) memory).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _fwd_kernel(reps_ref, inv_t_ref, m_ref, l_ref, pos_ref, *, blk: int):
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
        s = jax.lax.dot_general(
            rows, cols, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_t   # [blk, blk]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1) \
            + j * blk
        diag = col_ids == row_ids[:, None]
        s = jnp.where(diag, NEG, s)
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


def _bwd_kernel(reps_ref, inv_t_ref, m_ref, l_ref, dreps_ref, *, blk: int):
    n, d = reps_ref.shape
    n_blocks = n // blk
    i = pl.program_id(0)
    rows = reps_ref[pl.ds(i * blk, blk), :]
    inv_t = inv_t_ref[0, 0]
    b = n // 2
    scale = 1.0 / n

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)[:, 0] \
        + i * blk
    partner = jnp.where(row_ids < b, row_ids + b, row_ids - b)
    m_rows = m_ref[i, :]
    l_rows = l_ref[i, :]

    acc = jnp.zeros((blk, d), jnp.float32)

    def body(j, acc):
        cols = reps_ref[pl.ds(j * blk, blk), :]
        s = jax.lax.dot_general(
            rows, cols, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_t
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1) \
            + j * blk
        diag = col_ids == row_ids[:, None]
        s_masked = jnp.where(diag, NEG, s)
        # P block for my rows
        p = jnp.exp(s_masked - m_rows[:, None]) / l_rows[:, None] * scale
        p = p - jnp.where(col_ids == partner[:, None], scale, 0.0)
        acc = acc + jax.lax.dot_general(
            p, cols, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # P^T block: other rows' (cols' row-statistics) softmax over my rows
        m_cols = m_ref[j, :]
        l_cols = l_ref[j, :]
        col_partner = jnp.where(col_ids < b, col_ids + b, col_ids - b)
        pt = jnp.exp(jnp.where(diag, NEG, s)
                     - m_cols[None, :]) / l_cols[None, :] * scale
        pt = pt - jnp.where(col_partner == row_ids[:, None], scale, 0.0)
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


def _run_fwd(reps, inv_t, blk, interpret):
    n, d = reps.shape
    nb = n // blk
    m, l, pos = pl.pallas_call(
        functools.partial(_fwd_kernel, blk=blk),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((nb, blk), jnp.float32)] * 3,
        interpret=interpret,
    )(reps, inv_t)
    return m.reshape(n), l.reshape(n), pos.reshape(n)


def _run_bwd(reps, inv_t, m, l, blk, interpret):
    n, d = reps.shape
    nb = n // blk
    return pl.pallas_call(
        functools.partial(_bwd_kernel, blk=blk),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(reps, inv_t, m.reshape(nb, blk), l.reshape(nb, blk))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _ntxent_core(reps, temperature, interpret):
    """loss for pre-normalized reps [2B, D] (fp32)."""
    n = reps.shape[0]
    blk = _choose_blk(n)
    inv_t = jnp.full((1, 1), 1.0 / temperature, jnp.float32)
    m, l, pos = _run_fwd(reps, inv_t, blk, interpret)
    return jnp.mean(m + jnp.log(l) - pos)


def _core_fwd(reps, temperature, interpret):
    n = reps.shape[0]
    blk = _choose_blk(n)
    inv_t = jnp.full((1, 1), 1.0 / temperature, jnp.float32)
    m, l, pos = _run_fwd(reps, inv_t, blk, interpret)
    loss = jnp.mean(m + jnp.log(l) - pos)
    return loss, (reps, m, l)


def _core_bwd(temperature, interpret, res, g):
    reps, m, l = res
    n = reps.shape[0]
    blk = _choose_blk(n)
    inv_t = jnp.full((1, 1), 1.0 / temperature, jnp.float32)
    dreps = _run_bwd(reps, inv_t, m, l, blk, interpret)
    return (dreps * g,)


_ntxent_core.defvjp(_core_fwd, _core_bwd)


def nt_xent_pallas(zis, zjs, temperature: float = 0.1,
                   use_cosine: bool = True, axis_name: str | None = None,
                   interpret: bool = False):
    """Drop-in fused replacement for losses.nt_xent_loss (full batches).

    2B must be a multiple of 128. Cosine normalization runs in JAX so its
    gradient composes with the kernel's custom VJP."""
    if axis_name is not None:
        zis = jax.lax.all_gather(zis, axis_name).reshape(-1, zis.shape[-1])
        zjs = jax.lax.all_gather(zjs, axis_name).reshape(-1, zjs.shape[-1])
    reps = jnp.concatenate([zjs, zis], axis=0).astype(jnp.float32)
    if use_cosine:
        reps = reps / jnp.maximum(
            jnp.linalg.norm(reps, axis=-1, keepdims=True), 1e-12)
    return _ntxent_core(reps, float(temperature), interpret)
