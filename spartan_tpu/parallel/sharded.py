"""Sharded prover kernels: hypercube-partitioned sumcheck + point-range MSM.

Scale-out design (SURVEY.md §2.3/§5 — absent from the single-threaded
reference, introduced here):

- **Sumcheck / MLE tables** are sharded over the evaluation (hypercube) axis
  by high-order index bits: a (16, N) table becomes (16, N/D) per device.
  Because the protocol folds variable 0 (the LSB), every fold pairs adjacent
  *local* entries — folding is fully local, shard boundaries never move, and
  the only cross-chip traffic per sumcheck round is a psum of the 3 round-
  polynomial evaluations (a few hundred bytes over ICI per round).
- **MSMs** are sharded by point range: each device runs the full Pippenger
  pipeline on its slice, then the D partial results (single points) are
  all-gathered and tree-reduced. Traffic: D Jacobian points per MSM.

All entry points take a mesh and use shard_map; they are shape-polymorphic
over the device count and run unchanged on a CPU host-device mesh (tests) or
a real TPU slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spartan_tpu.ops import curve as cv
from spartan_tpu.ops import field as fo
from spartan_tpu.ops import mle
from spartan_tpu.ops import msm as msm_mod
from spartan_tpu.ops.field import FR
from spartan_tpu.ops.limb import U32

HC_AXIS = "hc"  # hypercube / point-range axis


def make_mesh(n_devices: int | None = None, axis: str = HC_AXIS) -> Mesh:
    """Mesh over the first n devices of a platform that HAS n devices.

    The default platform can have fewer devices than requested (one tunnel
    TPU chip while 8 virtual CPU devices exist) — silently building a
    smaller mesh would skip the sharded code paths a caller asked to
    exercise, so fall back to the CPU host platform before giving up.
    """
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            try:
                cpu = jax.devices("cpu")
            except RuntimeError:
                cpu = []
            if len(cpu) >= n_devices:
                devs = cpu
        if len(devs) < n_devices:
            raise ValueError(
                f"requested {n_devices}-device mesh but only {len(devs)} "
                "devices exist on any platform"
            )
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def shard_table(mesh: Mesh, table):
    """Place a (16, N) MLE table sharded over the hypercube axis."""
    return jax.device_put(table, NamedSharding(mesh, P(None, HC_AXIS)))


def shard_points(mesh: Mesh, points: cv.PointBatch) -> cv.PointBatch:
    sh = NamedSharding(mesh, P(None, HC_AXIS))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), points)


# ---------------------------------------------------------------------------
# Sharded sumcheck-1 round kernel
# ---------------------------------------------------------------------------


def sc1_round_kernel(az, bz, cz, s_table):
    """Local part of a sumcheck-1 round: inner quadratic at t=0,1,2.

    Returns a (16, 3) stack of *local partial* sums (still needs cross-shard
    reduction + modular reduction). Shard-local: tables (16, M) contiguous.
    """
    k, n = az.shape

    def halves(tab):
        p = tab.reshape(k, n // 2, 2)
        return p[:, :, 0], p[:, :, 1]

    az_e, az_o = halves(az)
    bz_e, bz_o = halves(bz)
    cz_e, cz_o = halves(cz)
    az_d = fo.sub(FR, az_o, az_e)
    bz_d = fo.sub(FR, bz_o, bz_e)
    cz_d = fo.sub(FR, cz_o, cz_e)

    out = []
    az_t, bz_t, cz_t = az_e, bz_e, cz_e
    for t in range(3):
        if t > 0:
            az_t = fo.add(FR, az_t, az_d)
            bz_t = fo.add(FR, bz_t, bz_d)
            cz_t = fo.add(FR, cz_t, cz_d)
        val = fo.sub(FR, fo.mont_mul(FR, az_t, bz_t), cz_t)
        val = fo.mont_mul(FR, val, s_table)
        # local partial sum in redundant limb form (chunked, no overflow)
        out.append(mle.sum_mod(val))
    return jnp.stack(out, axis=1).reshape(k, 3)


def make_sharded_sc1_round(mesh: Mesh, do_fold: bool = True):
    """Build the jitted sharded round: (fold +) evaluate, psum across shards.

    Input tables sharded P(None, 'hc'); returns ((16,3) evals replicated,
    tables still sharded). do_fold=False builds the first-round variant
    (round 0 takes no verifier randomness — reference prover.rs:199-207).
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, HC_AXIS),) * 4 + (P(None),),
        out_specs=(P(None), P(None, HC_AXIS), P(None, HC_AXIS), P(None, HC_AXIS)),
        # pallas_call outputs carry no vma annotation, so jax>=0.9's static
        # varying-axis checker cannot type them; the psum makes the evals
        # replicated by construction.
        check_vma=False,
    )
    def round_fn(az, bz, cz, s_table, r):
        if do_fold:
            az = mle.fold(az, r)
            bz = mle.fold(bz, r)
            cz = mle.fold(cz, r)
        local = sc1_round_kernel(az, bz, cz, s_table)
        # cross-shard reduction: limb-wise u32 sum then one wide reduction.
        total = jax.lax.psum(local, HC_AXIS)
        total = fo.reduce_wide(FR, total)
        return total, az, bz, cz

    return jax.jit(round_fn)


def make_sharded_prod2_round(mesh: Mesh, do_fold: bool = True):
    """Sharded degree-2 sumcheck round (sumcheck 2): fold + evals + psum."""
    from spartan_tpu.ops import sumcheck as sck

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, HC_AXIS),) * 2 + (P(None),),
        out_specs=(P(None), P(None, HC_AXIS), P(None, HC_AXIS)),
        check_vma=False,  # same: pallas outputs lack vma under jax>=0.9
    )
    def round_fn(w, z, r):
        if do_fold:
            w = mle.fold(w, r)
            z = mle.fold(z, r)
        k, n = w.shape

        def halves(tab):
            p = tab.reshape(k, n // 2, 2)
            return p[:, :, 0], p[:, :, 1]

        w_e, w_o = halves(w)
        z_e, z_o = halves(z)
        w_d = fo.sub(FR, w_o, w_e)
        z_d = fo.sub(FR, z_o, z_e)
        out = []
        w_t, z_t = w_e, z_e
        for t in range(3):
            if t > 0:
                w_t = fo.add(FR, w_t, w_d)
                z_t = fo.add(FR, z_t, z_d)
            out.append(mle.sum_mod(fo.mont_mul(FR, w_t, z_t)))
        local = jnp.stack(out, axis=1).reshape(k, 3)
        total = jax.lax.psum(local, HC_AXIS)
        total = fo.reduce_wide(FR, total)
        return total, w, z

    return jax.jit(round_fn)


# ---------------------------------------------------------------------------
# Sharded MSM
# ---------------------------------------------------------------------------


def make_sharded_msm(mesh: Mesh, fname: str = "fp", c: int = 8):
    """Point-range-sharded Pippenger: local MSM per device, all-gather the
    D partial points, tree-reduce locally (replicated result)."""
    f = cv.G1_FIELD if fname == "fp" else cv.G2_FIELD

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(None, HC_AXIS), cv.PointBatch(0, 0, 0)),
            P(None, HC_AXIS),
        ),
        out_specs=jax.tree_util.tree_map(lambda _: P(None), cv.PointBatch(0, 0, 0)),
        # the post-all_gather tree reduction is identical on every device, so
        # the output is replicated; the static checker can't see that.
        check_vma=False,
    )
    def msm_fn(points, scalars):
        local = msm_mod.msm(points, scalars, fname, c)  # batch-1 point
        gathered = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, HC_AXIS, axis=1, tiled=True), local
        )  # batch-D points
        d = gathered.x.shape[-1] if fname == "fp" else gathered.x[0].shape[-1]
        # tree-reduce D partials by repeated halving
        acc = gathered
        while d > 1:
            half = d // 2
            left = jax.tree_util.tree_map(lambda a: a[..., :half], acc)
            right = jax.tree_util.tree_map(lambda a: a[..., half : 2 * half], acc)
            summed = cv.add(f, left, right)
            if d % 2:
                extra = jax.tree_util.tree_map(lambda a: a[..., -1:], acc)
                first = jax.tree_util.tree_map(lambda a: a[..., :1], summed)
                patched = cv.add(f, first, extra)
                summed = jax.tree_util.tree_map(
                    lambda s, p: jnp.concatenate([p, s[..., 1:]], axis=-1),
                    summed,
                    patched,
                )
            acc = summed
            d = half
        return acc

    return jax.jit(msm_fn)
