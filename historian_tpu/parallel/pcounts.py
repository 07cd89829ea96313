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


def psum_counts(shard_counts: list[EventCounts], alphabet) -> EventCounts:
    """Tree-reduce per-shard EventCounts (host-side fallback when no mesh).

    On a live mesh the same pytrees ride jax.lax.psum inside the
    sharded E-step (see __graft_entry__.dryrun_multichip for the wired
    version)."""
    total = shard_counts[0].copy()
    for c in shard_counts[1:]:
        total += c
    return total
