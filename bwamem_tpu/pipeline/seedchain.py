"""Jitted seeding+chaining front half of the alignment pipeline.

One compiled XLA program per (batch shape, option set): seq batch →
intervals → seeds → chains → filtered chains.  Mirrors stages 1-7 of the
reference GPU driver (mem_align_GPU, cuda/bwamem_GPU.cu:3506-3717) and the
CPU mem_chain/mem_chain_flt path it must agree with.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bwamem_tpu.config import MemOptions
from bwamem_tpu.ops import fm as fmops
from bwamem_tpu.ops import smem as smemops
from bwamem_tpu.ops import chain as chainops


class SeedChainResult(NamedTuple):
    intervals: smemops.Intervals
    seeds: chainops.Seeds
    chains: chainops.Chains
    weights: jax.Array
    filtered: chainops.FilteredChains


@functools.partial(
    jax.jit,
    static_argnames=("min_seed_len", "split_len", "split_width",
                     "max_mem_intv", "max_occ", "w", "max_chain_gap",
                     "mask_level", "drop_ratio", "min_chain_weight",
                     "max_chain_extend", "seed_cap", "chain_cap", "caps"))
def seed_and_chain(fm: fmops.FM, ctg_offsets, ctg_is_alt, seq, l_seq, *,
                   min_seed_len: int, split_len: int, split_width: int,
                   max_mem_intv: int, max_occ: int, w: int,
                   max_chain_gap: int, mask_level: float, drop_ratio: float,
                   min_chain_weight: int, max_chain_extend: int,
                   seed_cap: int = 256, chain_cap: int = 64,
                   caps: smemops.SeedingCaps = smemops.SeedingCaps()
                   ) -> SeedChainResult:
    iv = smemops.collect_intervals(
        fm, seq, l_seq, min_seed_len=min_seed_len, split_len=split_len,
        split_width=split_width, max_mem_intv=max_mem_intv, caps=caps)
    sd = chainops.expand_seeds(fm, ctg_offsets, iv, max_occ=max_occ,
                               seed_cap=seed_cap)
    ch = chainops.chain_seeds(sd, ctg_is_alt, fm.l_pac, w=w,
                              max_chain_gap=max_chain_gap,
                              chain_cap=chain_cap)
    wt = chainops.chain_weights(sd, ch)
    fl = chainops.filter_chains(
        ch, wt, sd, mask_level=mask_level, drop_ratio=drop_ratio,
        min_seed_len=min_seed_len, max_chain_gap=max_chain_gap,
        min_chain_weight=min_chain_weight, max_chain_extend=max_chain_extend)
    return SeedChainResult(iv, sd, ch, wt, fl)


@functools.partial(
    jax.jit,
    static_argnames=("min_seed_len", "split_len", "split_width",
                     "max_mem_intv", "max_occ", "w", "max_chain_gap",
                     "mask_level", "drop_ratio", "min_chain_weight",
                     "max_chain_extend", "seed_cap", "chain_cap", "caps",
                     "a", "o_del", "e_del", "o_ins", "e_ins", "zdrop",
                     "pen_clip5", "pen_clip3", "reg_cap", "mat_ab"))
def align_regs_jit(fm, ctg_offsets, ctg_is_alt, seq, l_seq, *,
                   min_seed_len, split_len, split_width, max_mem_intv,
                   max_occ, w, max_chain_gap, mask_level, drop_ratio,
                   min_chain_weight, max_chain_extend, a, o_del, e_del,
                   o_ins, e_ins, zdrop, pen_clip5, pen_clip3, mat_ab,
                   seed_cap=256, chain_cap=64, reg_cap=16,
                   caps=smemops.SeedingCaps()):
    """Single-program device front half: reads → alignment regions
    (pre-dedup).  NOT the production path — kept only for the driver's
    one-jittable-fn compile check (__graft_entry__.entry) and the
    test_align_ext oracle cross-check; production runs
    seeding_host.front_half + extend_host.extend_regions (host-compacted
    lanes, fewer/bigger dispatches)."""
    from bwamem_tpu.ops import align_ext
    from bwamem_tpu.config import fill_scmat
    res = seed_and_chain(
        fm, ctg_offsets, ctg_is_alt, seq, l_seq,
        min_seed_len=min_seed_len, split_len=split_len,
        split_width=split_width, max_mem_intv=max_mem_intv, max_occ=max_occ,
        w=w, max_chain_gap=max_chain_gap, mask_level=mask_level,
        drop_ratio=drop_ratio, min_chain_weight=min_chain_weight,
        max_chain_extend=max_chain_extend, seed_cap=seed_cap,
        chain_cap=chain_cap, caps=caps)
    regs = align_ext.extend_all(
        fm, ctg_offsets, ctg_is_alt, seq, l_seq, res.seeds, res.chains,
        res.filtered, a=a, o_del=o_del, e_del=e_del, o_ins=o_ins,
        e_ins=e_ins, w=w, zdrop=zdrop, pen_clip5=pen_clip5,
        pen_clip3=pen_clip3, mat=fill_scmat(*mat_ab), reg_cap=reg_cap)
    return res, regs


def align_regs(fm, ctg_offsets, ctg_is_alt, seq, l_seq, opt: MemOptions,
               **caps):
    return align_regs_jit(
        fm, ctg_offsets, ctg_is_alt, seq, l_seq,
        min_seed_len=opt.min_seed_len, split_len=opt.split_len,
        split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
        max_occ=opt.max_occ, w=opt.w, max_chain_gap=opt.max_chain_gap,
        mask_level=opt.mask_level, drop_ratio=opt.drop_ratio,
        min_chain_weight=opt.min_chain_weight,
        max_chain_extend=opt.max_chain_extend, a=opt.a, o_del=opt.o_del,
        e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins, zdrop=opt.zdrop,
        pen_clip5=opt.pen_clip5, pen_clip3=opt.pen_clip3,
        mat_ab=(opt.a, opt.b), **caps)


def seed_and_chain_opts(fm, ctg_offsets, ctg_is_alt, seq, l_seq,
                        opt: MemOptions, **caps) -> SeedChainResult:
    return seed_and_chain(
        fm, ctg_offsets, ctg_is_alt, seq, l_seq,
        min_seed_len=opt.min_seed_len, split_len=opt.split_len,
        split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
        max_occ=opt.max_occ, w=opt.w, max_chain_gap=opt.max_chain_gap,
        mask_level=opt.mask_level, drop_ratio=opt.drop_ratio,
        min_chain_weight=opt.min_chain_weight,
        max_chain_extend=opt.max_chain_extend, **caps)


class WorklistResult(NamedTuple):
    seeds: "chainops.Seeds"
    seed_chain: jax.Array   # [N, S] chain of each seed slot (-1 none)
    wl_slot: jax.Array      # [N, S] work order → seed slot
    wl_chain: jax.Array     # [N, S] chain per work item (-1 none)
    wl_n: jax.Array         # [N]
    rmax0: jax.Array        # [N, C]
    rmax1: jax.Array        # [N, C]
    chain_rid: jax.Array    # [N, C]
    overflow: jax.Array     # [N]


@functools.partial(
    jax.jit,
    static_argnames=("min_seed_len", "split_len", "split_width",
                     "max_mem_intv", "max_occ", "w", "max_chain_gap",
                     "mask_level", "drop_ratio", "min_chain_weight",
                     "max_chain_extend", "seed_cap", "chain_cap", "caps",
                     "a", "o_del", "e_del", "o_ins", "e_ins"))
def seed_chain_worklist_jit(fm, ctg_offsets, ctg_is_alt, seq, l_seq, *,
                            min_seed_len, split_len, split_width,
                            max_mem_intv, max_occ, w, max_chain_gap,
                            mask_level, drop_ratio, min_chain_weight,
                            max_chain_extend, a, o_del, e_del, o_ins,
                            e_ins, seed_cap=256, chain_cap=64,
                            caps=smemops.SeedingCaps()) -> WorklistResult:
    """Device front half WITHOUT extension: everything the host-side flat
    extension driver (pipeline.align) needs — the exact work order of
    mem_chain2aln, per-chain reference windows, and the seed tables."""
    from bwamem_tpu.ops import align_ext
    res = seed_and_chain(
        fm, ctg_offsets, ctg_is_alt, seq, l_seq,
        min_seed_len=min_seed_len, split_len=split_len,
        split_width=split_width, max_mem_intv=max_mem_intv, max_occ=max_occ,
        w=w, max_chain_gap=max_chain_gap, mask_level=mask_level,
        drop_ratio=drop_ratio, min_chain_weight=min_chain_weight,
        max_chain_extend=max_chain_extend, seed_cap=seed_cap,
        chain_cap=chain_cap, caps=caps)
    wl = align_ext.build_worklist(res.seeds, res.chains, res.filtered)
    rmax0, rmax1 = align_ext.chain_rmax(
        res.seeds, res.chains, l_seq, fm, ctg_offsets,
        a=a, o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins, w=w)
    overflow = (res.intervals.overflow | res.seeds.overflow
                | res.chains.overflow)
    return WorklistResult(seeds=res.seeds, seed_chain=res.chains.seed_chain,
                          wl_slot=wl.seed_slot, wl_chain=wl.chain,
                          wl_n=wl.n, rmax0=rmax0, rmax1=rmax1,
                          chain_rid=res.chains.rid, overflow=overflow)


def seed_chain_worklist(fm, ctg_offsets, ctg_is_alt, seq, l_seq,
                        opt: MemOptions, **caps) -> WorklistResult:
    return seed_chain_worklist_jit(
        fm, ctg_offsets, ctg_is_alt, seq, l_seq,
        min_seed_len=opt.min_seed_len, split_len=opt.split_len,
        split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
        max_occ=opt.max_occ, w=opt.w, max_chain_gap=opt.max_chain_gap,
        mask_level=opt.mask_level, drop_ratio=opt.drop_ratio,
        min_chain_weight=opt.min_chain_weight,
        max_chain_extend=opt.max_chain_extend, a=opt.a, o_del=opt.o_del,
        e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins, **caps)
