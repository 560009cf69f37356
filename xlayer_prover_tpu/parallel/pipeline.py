"""Multi-chip sharded proof pipeline (GSPMD/pjit style).

The reference's only intra-proof parallelism is OpenMP loops over rows and a
single 51 GB shared buffer (SURVEY §2.7 P2/P7).  The TPU-native replacement
shards the row axis of every polynomial section over a device mesh:

  * elementwise stages (constraint eval, coset scaling) stay row-sharded;
    jnp.roll across the sharded axis becomes an ICI collective permute
    inserted by XLA;
  * NTT stages reshard to column-parallel (all_to_all over ICI) so each
    device runs full-length transforms on its column block — communication
    happens once per direction instead of per butterfly stage;
  * the grand-product prefix scan is a shard_map distributed scan: local
    associative scans + an all-gathered carry exchange (the SPMD partitioner
    shards a global associative_scan's strided slices catastrophically);
  * Merkle leaf hashing is row-sharded; the level reduction collapses to the
    replicated root.

``build_prove_core_step`` returns the jittable "training step" equivalent:
rounds 1-4 core of the prover (LDE, Merkle root, constraint eval, grand
product) with challenges passed as arrays (transcript scalars stay on host
between jit calls in the real pipeline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..fields import gl, gl3
from ..ops import ntt, poseidon_gl

AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (AXIS,))


def row_sharding(mesh):
    return NamedSharding(mesh, P(AXIS, None))


def col_sharding(mesh):
    return NamedSharding(mesh, P(None, AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def lde_sharded(section, n_bits_ext: int, mesh):
    """Row-sharded (N, C) -> row-sharded (N_ext, C) low-degree extension.

    Internally resharded column-parallel so each device runs the full-length
    NTT on C/d columns with zero per-stage communication; the two reshards
    are single all_to_alls over ICI.
    """
    n_dev = mesh.devices.size
    if section.shape[1] % n_dev == 0:
        section = jax.lax.with_sharding_constraint(section,
                                                   col_sharding(mesh))
    ext = ntt.extend_pol(section, n_bits_ext)
    return jax.lax.with_sharding_constraint(ext, row_sharding(mesh))


def merkle_root_sharded(rows, width: int, mesh):
    """Row-sharded source -> replicated 4-element root."""
    cur = poseidon_gl.linear_hash(rows, width)
    while cur.shape[0] > 1:
        cur = poseidon_gl.hash_node(cur[0::2], cur[1::2])
    return jax.lax.with_sharding_constraint(cur[0], replicated(mesh))


def build_grand_product_sharded(mesh):
    """Z column as a distributed scan: local prefix products per shard plus
    an all-gathered carry exchange — the inner program is single-device, so
    the SPMD partitioner never sees the scan's strided slices."""
    from jax.experimental.shard_map import shard_map

    n_dev = mesh.devices.size

    def local(num3, den3):
        ratios = gl3.mul(num3, gl3.batch_inv(den3))
        pre = jax.lax.associative_scan(gl3.mul, ratios, axis=0)
        totals = tuple(jax.lax.all_gather(c[-1:], AXIS).reshape(n_dev)
                       for c in pre)
        my = jax.lax.axis_index(AXIS)
        carry = gl3.ones(())
        for j in range(n_dev - 1):
            t_j = tuple(c[j] for c in totals)
            carry = gl3.select(j < my, gl3.mul(carry, t_j), carry)
        one = gl3.ones((1,))
        excl = tuple(jnp.concatenate([one[k], pre[k][:-1]]) for k in range(3))
        return gl3.mul(excl, carry)

    spec3 = tuple(P(AXIS) for _ in range(3))
    return shard_map(local, mesh=mesh, in_specs=(spec3, spec3),
                     out_specs=spec3)


def build_prove_core_step(n_bits: int, n_bits_ext: int, n_cols: int, mesh):
    """Jitted rounds-1..4 core: LDE + Merkle root + constraint + Z scan."""
    n_ext = 1 << n_bits_ext
    blowup = n_ext // (1 << n_bits)
    gp = build_grand_product_sharded(mesh)

    def step(cm1, challenge):
        # round 1: LDE + merkle
        cm1_ext = lde_sharded(cm1, n_bits_ext, mesh)
        root = merkle_root_sharded(cm1_ext, n_cols, mesh)

        # toy transition constraint: c0' - c1 (row roll crosses shards)
        con = gl.sub(jnp.roll(cm1_ext[:, 0], -blowup), cm1_ext[:, 1])

        # combine with extension-field challenge, grand product scan
        ch3 = tuple(challenge[k] for k in range(3))
        num = gl3.mul_base(ch3, con)
        den = gl3.add_base(num, gl.ones(con.shape))
        num = jax.lax.with_sharding_constraint(
            num, tuple(NamedSharding(mesh, P(AXIS)) for _ in range(3)))
        den = jax.lax.with_sharding_constraint(
            den, tuple(NamedSharding(mesh, P(AXIS)) for _ in range(3)))
        z = gp(num, den)
        return root, z[0][-1]

    return jax.jit(step,
                   in_shardings=(row_sharding(mesh), replicated(mesh)))
