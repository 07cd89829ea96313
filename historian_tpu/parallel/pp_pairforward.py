"""Pipeline-parallel (PP) pair-transducer Forward DP over a device mesh.

The PP axis of the parallelism plan (SURVEY.md 2.7): the DP grid's row
range is split into contiguous blocks, one per pipeline stage (device),
and a batch of pairs streams through as microbatches -- stage k fills
its row block for pair p at pipeline step s = k + p, then ppermutes the
5-state boundary row to stage k+1.  After the pipeline drains
(P + n - 1 steps), every stage has processed every pair exactly once and
the bubble fraction is (n-1)/(P+n-1) -- the same schedule tree-level
profile merges use, with profiles streaming into their parents' stages.

Exact: each stage runs the identical recurrence as the single-device
kernel (ops/pairforward.py) over its rows, with row padding made a
pass-through (carry preserved) so uneven blocks stay correct.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from historian_tpu.ops.semiring import affine_scan as _affine_scan, lse as _lse
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG = -1e30


def pp_pair_forward_lp(absorb, rootsub_x, rootsub_y, ins_x, ins_y, trans,
                       mesh: Mesh, axis: str = "pp"):
    """Batched lp_end with rows pipelined over mesh stages.

    absorb: [PAIRS, X+1, Y+1]; rootsub_x/ins_x: [PAIRS, X+1];
    rootsub_y/ins_y: [PAIRS, Y+1]; trans: [23].  Returns lp_end [PAIRS].
    """
    PAIRS, X1, Y1 = absorb.shape
    n = mesh.shape[axis]
    xb = -(-X1 // n)
    pad = n * xb - X1
    if pad:
        dtype = absorb.dtype
        absorb = jnp.concatenate([absorb, jnp.full((PAIRS, pad, Y1), NEG, dtype)], axis=1)
        rootsub_x = jnp.concatenate([rootsub_x, jnp.full((PAIRS, pad), NEG, dtype)], axis=1)
        ins_x = jnp.concatenate([ins_x, jnp.full((PAIRS, pad), NEG, dtype)], axis=1)

    fn = shard_map(
        partial(_pp_kernel, axis_name=axis, n_dev=n, X1=X1, Y1=Y1, xb=xb, n_pairs=PAIRS),
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None), P(None, axis), P(None), P(None)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(absorb, rootsub_x, rootsub_y, ins_x, ins_y, trans)


def _pp_kernel(absorb, rootsub_x, rootsub_y, ins_x, ins_y, trans,
               *, axis_name, n_dev, X1, Y1, xb, n_pairs):
    (imm_imm, imm_imd, imm_idm, imm_imi, imm_iiw, imm_eee,
     imd_imm, imd_imd, imd_idm, imd_eee,
     idm_imm, idm_imd, idm_idm, idm_eee,
     imi_imm, imi_imd, imi_imi, imi_iiw, imi_eee,
     iiw_imm, iiw_idm, iiw_iiw, iiw_eee) = (trans[k] for k in range(23))

    dtype = absorb.dtype
    neg = jnp.array(NEG, dtype)
    neg_row = jnp.full((Y1,), neg, dtype)
    stage = jax.lax.axis_index(axis_name)
    col = jnp.arange(Y1)
    y_ready = (col < Y1 - 1) | (Y1 == 1)
    x_empty = X1 == 1
    init_carry = jnp.stack([neg_row] * 5)  # [5, Y1]

    def shift_right(v):
        return jnp.concatenate([jnp.full((1,), neg, dtype), v[:-1]])

    def fill_block(p, carry_in):
        """Run this stage's rows for pair p from the incoming boundary row."""
        a_blk = jax.lax.dynamic_index_in_dim(absorb, p, 0, keepdims=False)      # [xb, Y1]
        rsx_blk = jax.lax.dynamic_index_in_dim(rootsub_x, p, 0, keepdims=False)  # [xb]
        ix_blk = jax.lax.dynamic_index_in_dim(ins_x, p, 0, keepdims=False)
        rsy = jax.lax.dynamic_index_in_dim(rootsub_y, p, 0, keepdims=False)      # [Y1]
        iy = jax.lax.dynamic_index_in_dim(ins_y, p, 0, keepdims=False)

        def row_step(carry, r):
            imm_p_, imd_p_, idm_p_, imi_p_, iiw_p_ = carry
            i = stage * xb + r  # global row index
            valid = i < X1
            is_first = i == 0
            x_ready = (i < X1 - 1) | x_empty

            imd = _lse(imm_p_ + imm_imd, imd_p_ + imd_imd, idm_p_ + idm_imd, imi_p_ + imi_imd) + rsx_blk[r]
            iiw = _lse(imm_p_ + imm_iiw, imi_p_ + imi_iiw, iiw_p_ + iiw_iiw) + ix_blk[r]
            imd = jnp.where(y_ready, imd, neg)
            iiw = jnp.where(y_ready, iiw, neg)

            imm_src = _lse(
                imm_p_ + imm_imm, imd_p_ + imd_imm, idm_p_ + idm_imm,
                imi_p_ + imi_imm, iiw_p_ + iiw_imm,
            )
            imm = shift_right(imm_src) + a_blk[r]
            imm = jnp.where(is_first & (col == 0), 0.0, imm)
            imd = jnp.where(is_first, neg_row, imd)
            iiw = jnp.where(is_first, neg_row, iiw)

            idm_other = _lse(imm + imm_idm, imd + imd_idm, iiw + iiw_idm)
            a_idm = jnp.where(x_ready, shift_right(idm_other) + rsy, neg)
            idm = _affine_scan(a_idm, jnp.where(x_ready, idm_idm + rsy, neg))
            idm = jnp.where(x_ready, idm, neg)

            imi_other = imm + imm_imi
            a_imi = jnp.where(x_ready, shift_right(imi_other) + iy, neg)
            imi = _affine_scan(a_imi, jnp.where(x_ready, imi_imi + iy, neg))
            imi = jnp.where(x_ready, imi, neg)

            new = (imm, imd, idm, imi, iiw)
            # padded rows (beyond the real X) pass the carry through
            out = tuple(jnp.where(valid, nv, ov) for nv, ov in zip(new, carry))
            return out, None

        carry0 = tuple(carry_in[s] for s in range(5))
        carry_out, _ = jax.lax.scan(row_step, carry0, jnp.arange(xb))
        return jnp.stack(list(carry_out))  # [5, Y1]

    n_steps = n_pairs + n_dev - 1
    perm = [(s, (s + 1) % n_dev) for s in range(n_dev)]

    def pipe_step(state, s):
        incoming, lp_acc = state
        p = s - stage
        active = (p >= 0) & (p < n_pairs)
        p_c = jnp.clip(p, 0, n_pairs - 1)
        carry_in = jnp.where(stage == 0, init_carry, incoming)
        carry_out = fill_block(p_c, carry_in)

        # final stage owns the last real row: record lp_end for pair p
        final = carry_out[:, Y1 - 1]
        lp = _lse(final[0] + imm_eee, final[1] + imd_eee, final[2] + idm_eee,
                  final[3] + imi_eee, final[4] + iiw_eee)
        record = active & (stage == n_dev - 1)
        lp_acc = jnp.where(
            record & (jnp.arange(n_pairs) == p_c), lp, lp_acc
        )

        outgoing = jnp.where(active, carry_out, jnp.broadcast_to(init_carry, carry_out.shape))
        incoming = jax.lax.ppermute(outgoing, axis_name, perm)
        return (incoming, lp_acc), None

    state0 = (init_carry, jnp.full((n_pairs,), neg, dtype))
    (_, lp_acc), _ = jax.lax.scan(pipe_step, state0, jnp.arange(n_steps))
    # only the last stage recorded lp values; replicate via max (others hold -inf)
    return jax.lax.pmax(lp_acc, axis_name)
