"""Distributed EM count accumulation.

The reference's scaling story is an offline file MapReduce: run
`historian count` per file, `historian sum` to merge JSON counts,
`historian fit -counts` to re-estimate (README.md:201-208); the
EventCounts +-algebra is the reduction operator.  Here the same algebra
runs in memory across a device mesh: each dp shard accumulates counts
for its slice of datasets/columns, and one psum merges them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from historian_tpu.models.counts import EventCounts


def counts_to_arrays(c: EventCounts):
    """Flatten EventCounts into a pytree of arrays (psum-able)."""
    ic = c.indel
    return {
        "root": jnp.asarray(c.root_count),
        "sub": jnp.asarray(c.sub_count),
        "indel": jnp.asarray(
            [ic.ins, ic.del_, ic.ins_ext, ic.del_ext, ic.ins_time, ic.del_time, ic.lp]
        ),
    }


def arrays_to_counts(tree, alphabet) -> EventCounts:
    root = np.asarray(tree["root"])
    out = EventCounts(alphabet, root.shape[0])
    out.root_count = root
    out.sub_count = np.asarray(tree["sub"])
    ind = np.asarray(tree["indel"])
    ic = out.indel
    ic.ins, ic.del_, ic.ins_ext, ic.del_ext, ic.ins_time, ic.del_time, ic.lp = (
        float(v) for v in ind
    )
    return out


def column_sharded_eigen_counts(model, tree, gapped_rows: list[str], n_shards: int):
    """E-step eigencounts with alignment columns sharded dp-ways.

    Columns are split into n_shards equal blocks (padded with all-gap
    columns, which contribute exactly zero likelihood and zero counts);
    each shard runs its own batched fill and accumulates its block's
    eigencounts; shards reduce with the EventCounts/EigenCounts algebra.
    This is the in-memory form of the reference's count/sum MapReduce and
    must be invariant to n_shards (tested in tests/test_parallel.py).
    """
    import math

    from historian_tpu.engine.sumprod import SumProductEngine
    from historian_tpu.models.counts import EigenCounts

    engine = SumProductEngine(model, tree)
    n_cols = len(gapped_rows[0])
    block = math.ceil(n_cols / n_shards)
    total = EigenCounts(model.components, model.alphabet_size)
    for s in range(n_shards):
        cols = [row[s * block : (s + 1) * block] for row in gapped_rows]
        pad = block - len(cols[0])
        if pad:
            cols = [c + "-" * pad for c in cols]
        if not cols[0]:
            continue
        fill = engine.fill(cols)
        shard = EigenCounts(model.components, model.alphabet_size)
        fill.accumulate_eigen_counts(shard.root_count, shard.eigen_count)
        shard.indel.lp = float(fill.col_ll.sum())
        total += shard
    return total


def psum_counts(shard_counts: list[EventCounts], alphabet) -> EventCounts:
    """Tree-reduce per-shard EventCounts (host-side fallback when no mesh).

    On a live mesh the same pytrees ride jax.lax.psum inside the
    sharded E-step (see __graft_entry__.dryrun_multichip for the wired
    version)."""
    total = shard_counts[0].copy()
    for c in shard_counts[1:]:
        total += c
    return total
