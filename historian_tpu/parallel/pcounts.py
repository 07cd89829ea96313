"""Distributed EM count accumulation.

The reference's scaling story is an offline file MapReduce: run
`historian count` per file, `historian sum` to merge JSON counts,
`historian fit -counts` to re-estimate (README.md:201-208); the
EventCounts +-algebra is the reduction operator.  Here the same algebra
runs in memory across a device mesh: alignment columns shard over the dp
axis, every shard runs the Felsenstein up/down fill plus the eigencount
contraction on its column block inside ONE jitted shard_map, and a
lax.psum merges the [C, A, A] partials -- the in-memory psum form of
count/sum.  `historian-tpu count|fit -mesh N` turns it on.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from historian_tpu.models.counts import EigenCounts, EventCounts

# ----------------------------------------------------------- mesh config
# Set by the CLI's -mesh flag (or HISTORIAN_MESH); consulted by the
# production count path (engine/sumprod.accumulate_alignment_eigen_counts).
_ACTIVE_MESH: Mesh | None = None


def set_mesh(spec) -> Mesh:
    """Build and activate the count/fit mesh over the first devices.

    spec is an int ("-mesh 8": dp only) or "DxE" ("-mesh 4x2": a (dp, ep)
    mesh -- alignment columns shard over dp, mixture/gamma components
    over ep; the model's component count must be divisible by E)."""
    global _ACTIVE_MESH
    devices = jax.devices()
    dp, ep = (int(spec), 1) if not (isinstance(spec, str) and "x" in spec) else (
        int(spec.split("x")[0]), int(spec.split("x")[1])
    )
    if dp * ep > len(devices):
        raise ValueError(
            f"-mesh {spec} requests {dp * ep} devices but only {len(devices)} are visible"
        )
    if ep > 1:
        _ACTIVE_MESH = Mesh(
            np.array(devices[: dp * ep]).reshape(dp, ep), ("dp", "ep")
        )
    else:
        _ACTIVE_MESH = Mesh(np.array(devices[:dp]), ("dp",))
    return _ACTIVE_MESH


def _mesh_dp(mesh: Mesh) -> int:
    return mesh.shape["dp"] if "dp" in mesh.axis_names else mesh.devices.size


def _mesh_ep(mesh: Mesh) -> int:
    return mesh.shape["ep"] if "ep" in mesh.axis_names else 1


def clear_mesh() -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = None


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH


# ------------------------------------------------- sharded E-step counts
@partial(jax.jit, static_argnames=("mesh", "n_nodes", "alphabet_size"))
def _sharded_count_step(
    tokens,  # [N, L] int32, L divisible by mesh dp size
    parent, left, right, sibling,  # [N] int32
    sub,  # [N, C, A, A] branch substitution probs
    ins,  # [C, A]
    lcw,  # [C] log component weights
    evr, evi,  # [C, A, A] eigenvector real/imag
    eir, eii,  # [C, A, A] inverse-eigenvector real/imag
    jr, ji,  # [N, C, A, A] per-branch J integral real/imag
    *, mesh: Mesh, n_nodes: int, alphabet_size: int,
):
    """One fused multi-device E-step over an alignment: each dp shard
    fills its column block (up + down passes) and contracts its
    eigencount partials; a psum inside the jit reduces them.  On a 2-D
    (dp, ep) mesh the mixture/gamma component axis C additionally shards
    over ep -- the per-component fills are independent, and the single
    cross-component coupling (col_ll = logsumexp_c(lcw + cpt_ll)) becomes
    a pmax + psum over the ep axis.  Returns (root [C, A], eigen_r,
    eigen_i [C, A, A], logLik), replicated over dp and gathered over ep."""
    from historian_tpu.ops.felsenstein import (
        _eigen_counts_core_cplx,
        _fill_down_batch,
        _fill_up_batch_tokens,
    )

    has_ep = "ep" in mesh.axis_names and mesh.shape["ep"] > 1

    def shard(tokens_s, sub_s, ins_s, lcw_s, evr_s, evi_s, eir_s, eii_s, jr_s, ji_s):
        (F, logF, E, logE, cpt_ll, col_ll), is_gap = _fill_up_batch_tokens(
            tokens_s, parent, left, right, sub_s, ins_s, lcw_s, n_nodes, alphabet_size
        )
        if has_ep:
            # the local fill normalized over this shard's components only;
            # rebuild the global column likelihood across the ep axis
            scores = lcw_s[None, :] + cpt_ll  # [L, C_local]
            lmax = jnp.max(scores, axis=1)
            gmax = jax.lax.pmax(lmax, "ep")
            sums = jax.lax.psum(
                jnp.sum(jnp.exp(scores - gmax[:, None]), axis=1), "ep"
            )
            col_ll = jnp.where(jnp.all(is_gap, axis=1), 0.0, gmax + jnp.log(sums))
        G, logG = _fill_down_batch(E, logE, is_gap, parent, sibling, sub_s, ins_s, n_nodes)
        parent_safe = jnp.maximum(parent, 0)
        sib_safe = jnp.maximum(sibling, 0)
        has_parent = parent >= 0
        gap_parent = jnp.where(has_parent[None, :], is_gap[:, parent_safe], True)
        mask = (~is_gap) & has_parent[None, :] & ~gap_parent  # branch-count sites
        w_col = jnp.ones(tokens_s.shape[1], sub_s.dtype)
        eig_r, eig_i = _eigen_counts_core_cplx(
            F, logF, E, logE, G, logG, col_ll, parent_safe, sib_safe,
            mask, w_col, lcw_s, evr_s, evi_s, eir_s, eii_s, jr_s, ji_s,
        )
        # root counts (sumprod.cpp:264-271): every ungapped node whose
        # parent is gapped/absent contributes insProb * F * exp(lcw +
        # logF - colLL); all-gap padding columns contribute nothing
        is_root = (~is_gap) & gap_parent  # [L, N]
        norm = jnp.where(
            is_root[:, :, None],
            jnp.exp(lcw_s[None, None, :] + logF - col_ll[:, None, None]),
            0.0,
        )  # [L, N, C_local]
        root = jnp.einsum("lnc,ci,lnci->ci", norm, ins_s, F)
        lp = jnp.sum(col_ll)
        return jax.lax.psum((root, eig_r, eig_i, lp), "dp")

    ep = "ep" if has_ep else None
    # check_vma=False: the fill's lax.scan seeds its carry with replicated
    # constants while the scanned tokens vary over dp, which the static
    # varying-axes checker rejects; the computation itself is per-shard
    return jax.shard_map(
        shard, mesh=mesh,
        in_specs=(
            P(None, "dp"),          # tokens: columns over dp
            P(None, ep), P(ep), P(ep),   # sub, ins, lcw: components over ep
            P(ep), P(ep), P(ep), P(ep),  # evr, evi, eir, eii
            P(None, ep), P(None, ep),    # jr, ji
        ),
        out_specs=(P(ep), P(ep), P(ep), P()),
        check_vma=False,
    )(tokens, sub, ins, lcw, evr, evi, eir, eii, jr, ji)


def sharded_alignment_eigen_counts(model, tree, gapped_rows: list[str], mesh: Mesh, weight: float = 1.0) -> EigenCounts:
    """Multi-device counterpart of
    engine.sumprod.accumulate_alignment_eigen_counts: one sharded E-step
    over the alignment's columns.  Shard-count invariant (up to float
    reassociation) because the count algebra is associative -- asserted
    by tests/test_parallel.py on a virtual 8-device mesh."""
    from historian_tpu.engine.sumprod import SumProductEngine
    from historian_tpu.ops.felsenstein import GAP_TOK, tokenize_alignment

    engine = SumProductEngine(model, tree)
    arr = engine.arrays
    tokens = tokenize_alignment(model.alphabet, gapped_rows)  # [N, L]
    n_ep = _mesh_ep(mesh)
    if model.components % n_ep:
        raise ValueError(
            f"-mesh ep={n_ep} requires the model's component count "
            f"({model.components}) to be divisible by it"
        )
    n_dp = _mesh_dp(mesh)
    pad = (-tokens.shape[1]) % n_dp
    if pad:
        tokens = np.concatenate(
            [tokens, np.full((tokens.shape[0], pad), GAP_TOK, tokens.dtype)], axis=1
        )
    e = engine.eigen
    j = engine.branch_eigen_sub_count
    # Inputs stay host numpy: multi-process meshes reject arrays committed
    # to one process's local device (jnp.asarray), while numpy inputs are
    # treated as fully replicated -- every process loads the same files,
    # so replication holds by construction and shard_map's in_specs slice
    # each process's dp block locally.
    root, eig_r, eig_i, lp = _sharded_count_step(
        tokens,
        arr.parent, arr.left, arr.right, arr.sibling,
        engine.branch_sub, engine.ins_prob,
        engine.log_cpt_weight,
        np.ascontiguousarray(e.evec.real),
        np.ascontiguousarray(e.evec.imag),
        np.ascontiguousarray(e.evec_inv.real),
        np.ascontiguousarray(e.evec_inv.imag),
        np.ascontiguousarray(j.real),
        np.ascontiguousarray(j.imag),
        mesh=mesh, n_nodes=arr.n_nodes, alphabet_size=model.alphabet_size,
    )
    out = EigenCounts(model.components, model.alphabet_size)
    out.root_count += np.asarray(root) * weight
    out.eigen_count += (np.asarray(eig_r) + 1j * np.asarray(eig_i)) * weight
    out.indel.lp = float(lp) * weight
    return out


# ------------------------------------------------ EventCounts pytree psum
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


def psum_counts(shard_counts: list[EventCounts], alphabet, mesh: Mesh | None = None) -> EventCounts:
    """Reduce per-shard EventCounts.

    With a mesh: each shard's pytree rides one device of the dp axis and
    a jitted shard_map + lax.psum performs the reduction (pads with zero
    counts when fewer shards than devices).  Without: host-side algebra
    (the `sum` command's file reducer)."""
    if mesh is None:
        total = shard_counts[0].copy()
        for c in shard_counts[1:]:
            total += c
        return total
    n_dp = _mesh_dp(mesh)
    if len(shard_counts) > n_dp:
        # fold the tail onto the first shards so one psum suffices
        folded = [c.copy() for c in shard_counts[:n_dp]]
        for i, c in enumerate(shard_counts[n_dp:]):
            folded[i % n_dp] += c
        shard_counts = folded
    components = shard_counts[0].components
    while len(shard_counts) < n_dp:
        shard_counts = shard_counts + [EventCounts(alphabet, components)]
    trees = [counts_to_arrays(c) for c in shard_counts]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    reduced = jax.jit(
        jax.shard_map(
            lambda t: jax.lax.psum(jax.tree.map(lambda x: x[0], t), "dp"),
            mesh=mesh, in_specs=P("dp"), out_specs=P(), check_vma=False,
        )
    )(stacked)
    return arrays_to_counts(reduced, alphabet)


def allgather_bytes(data: bytes) -> list[bytes]:
    """Gather one byte payload per process across a multi-process launch
    (jax.distributed); every process returns the same ordered list.
    Rides process_allgather over length-padded uint8 arrays."""
    from jax.experimental import multihost_utils

    lens = multihost_utils.process_allgather(
        np.array([len(data)], np.int32)
    ).reshape(-1)
    m = max(int(lens.max()), 1)
    buf = np.zeros(m, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    return [bytes(gathered[p, : int(lens[p])].tobytes()) for p in range(len(lens))]


def allreduce_counts(partial: EventCounts, alphabet) -> EventCounts:
    """Sum per-PROCESS partial EventCounts across a multi-process launch
    (each process counted its round-robin dataset shard).  Rides the
    jax.distributed coordination channel; every process returns the same
    global totals."""
    from jax.experimental import multihost_utils

    arrs = counts_to_arrays(partial)
    gathered = multihost_utils.process_allgather(
        jax.tree.map(np.asarray, arrs)
    )
    summed = jax.tree.map(lambda x: np.asarray(x).sum(axis=0), gathered)
    return arrays_to_counts(summed, alphabet)


def column_sharded_eigen_counts(model, tree, gapped_rows: list[str], n_shards: int):
    """Host-loop reference implementation of the column-sharded E-step:
    used by tests as the algebra oracle for the shard_map path above
    (shard results must be invariant to n_shards AND match the fused
    device reduction)."""
    import math

    from historian_tpu.engine.sumprod import SumProductEngine

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
