"""Collective helpers: sequence/data-sharded calibration reductions.

SURVEY.md §5.7/§5.8: the Hessian accumulation H = X^T X is associative over the
token axis, so long-context / multi-chip calibration shards tokens over the
'data' mesh axis and reduces with one psum — no ring attention needed for the
stats path. These helpers are the shard_map building blocks the calibration
engine uses when a mesh is provided; XLA lowers the psum onto ICI.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_xtx(x: jnp.ndarray, mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """X^T X with the token axis sharded over `axis`; result replicated.

    x: [tokens, features] (tokens divisible by the axis size).
    """
    def local(xs):
        return jax.lax.psum(xs.astype(jnp.float32).T @ xs.astype(jnp.float32),
                            axis_name=axis)

    f = shard_map(local, mesh=mesh, in_specs=P(axis, None), out_specs=P())
    return f(x)


def sharded_absmax(x: jnp.ndarray, mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """Per-feature max|x| over a token-sharded activation (SmoothQuant stats)."""
    def local(xs):
        return jax.lax.pmax(jnp.abs(xs.astype(jnp.float32)).max(axis=0), axis_name=axis)

    f = shard_map(local, mesh=mesh, in_specs=P(axis, None), out_specs=P())
    return f(x)


def row_parallel_matmul(x: jnp.ndarray, w: jnp.ndarray, mesh: Mesh,
                        axis: str = "model") -> jnp.ndarray:
    """y = x @ w^T with w row-sharded (in-features over `axis`): each shard
    computes a partial product over its K-slice, then one psum.

    This is the explicit shard_map form of the GSPMD pattern the TP rules
    produce for o_proj/down_proj — exposed for kernels that want to interleave
    the psum with compute manually.
    """
    def local(xs, ws):
        part = jax.lax.dot_general(
            xs, ws, (((xs.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.psum(part, axis_name=axis)

    f = shard_map(local, mesh=mesh,
                  in_specs=(P(None, axis), P(None, axis)), out_specs=P())
    return f(x, w).astype(x.dtype)
