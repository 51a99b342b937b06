"""Explicit shard_map collectives (SURVEY §5.8).

Most sharding in this framework is jit-automatic (NamedSharding inputs,
XLA-inserted collectives).  These helpers are the explicit form for when
per-shard control matters: distributed metric/loss reduction via psum over
the dp axis, riding ICI.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map


def distributed_mean(mesh, values, axis_name="dp"):
    """Mean of per-example scalars sharded over `axis_name`.

    values: (N,) sharded along the dp axis; returns a replicated scalar —
    one psum over ICI, no host gathers.
    """

    @partial(shard_map, mesh=mesh, in_specs=P(axis_name),
             out_specs=P())
    def _mean(v):
        local = jnp.sum(v)
        total = jax.lax.psum(local, axis_name)
        count = jax.lax.psum(jnp.float32(v.shape[0]), axis_name)
        return (total / count)[None]

    return _mean(values)[0]


def distributed_psnr(mesh, sq_errors, pixel_counts, axis_name="dp"):
    """PSNR over a dp-sharded eval: psum the per-shard squared-error and
    pixel-count partial sums, then one log on replicated values."""

    @partial(shard_map, mesh=mesh, in_specs=(P(axis_name), P(axis_name)),
             out_specs=P())
    def _psnr(se, n):
        tot_se = jax.lax.psum(jnp.sum(se), axis_name)
        tot_n = jax.lax.psum(jnp.sum(n), axis_name)
        return (-10.0 * jnp.log10(tot_se / tot_n))[None]

    return _psnr(sq_errors, pixel_counts)[0]
