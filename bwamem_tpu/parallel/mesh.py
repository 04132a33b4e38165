"""Multi-chip execution: data-parallel sharding of the production pipeline.

Model (SURVEY.md §5.8; reference analog: one aligner instance per GPU with
its own streams, cuda/streams.cu:307-352):

  * ONE host process drives a `jax.sharding.Mesh` over N chips, axis
    "data".  N must be a power of two (every lane count in the pipeline is
    a power-of-two bucket, so shards always divide evenly).
  * The FM-index pytree is REPLICATED on every chip (index upload happens
    once, like the reference's per-GPU index copy, fastmap.c:309).
  * Every device program runs shard-local under `jax.shard_map`: the whole
    alignment pipeline is embarrassingly data-parallel over reads/lanes —
    seeding arenas, chaining grids and SW lanes never cross shards.
  * The ONE global reduction is PE insert-size inference (reference
    bwamem.c:1236-1239): the driving host computes pestat once over the
    regs gathered from every shard, so all shards pair against the same
    stats.  (A true `all_gather` collective replaces this only in the
    multi-host path, where no single host sees all regs.)
  * Per-shard SAM is merged on host in read order — deterministic output
    (reference's ordered superbatch writer, cuda/minibatch_process.cpp:
    160-162).
"""
from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    """Data-parallel mesh over `devices` (default: all local devices)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n & (n - 1) == 0, f"mesh size must be a power of two, got {n}"
    return Mesh(devices, (AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def rowmap(mesh: Mesh, func, statics: tuple, repl_mask: tuple,
           stacked_out: bool = False, out_mask: tuple = None):
    """shard_map+jit of `func(*arrays, **dict(statics))` over the mesh.

    repl_mask[i] True → argument i is replicated (index tables, packed
    reference); False → sharded on its leading axis; "ax1" → sharded on
    axis 1 (a [k, lanes] packed-transport array).  Outputs are sharded
    on axis 0, or axis 1 when `stacked_out` (programs returning one
    [k, lanes] stacked array — the transport-friendly convention of this
    codebase).  `out_mask` (overrides stacked_out) gives one False/"ax1"
    entry per output leaf for programs returning a mix of row-sharded and
    stacked arrays.  Cached per (mesh, func, statics, mask) so each shape
    compiles once."""
    return _rowmap_cached(mesh, func, tuple(statics), tuple(repl_mask),
                          bool(stacked_out),
                          None if out_mask is None else tuple(out_mask))


@functools.lru_cache(maxsize=512)
def _rowmap_cached(mesh, func, statics, repl_mask, stacked_out,
                   out_mask=None):
    body = functools.partial(func, **dict(statics)) if statics else func
    in_specs = tuple(P() if r is True else
                     (P(None, AXIS) if r == "ax1" else P(AXIS))
                     for r in repl_mask)
    if out_mask is not None:
        out_specs = tuple(P(None, AXIS) if m == "ax1" else P(AXIS)
                          for m in out_mask)
    else:
        out_specs = P(None, AXIS) if stacked_out else P(AXIS)
    return jax.jit(jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False))
