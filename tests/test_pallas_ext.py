"""Pallas extension-kernel parity: extend_batch_pl (the Mosaic kernel used
on TPU, ops/pallas_ext.py) must return exactly what the XLA reference
implementation extend_batch returns — which test_extend.py pins to the
C ksw_extend2 oracle — across the same case corpus.

Runs the kernel in Pallas interpret mode (tests force the CPU backend);
on-chip execution is exercised by tools/pl_vs_xla.py and the bench.
"""
import numpy as np
import pytest

import bwamem_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from bwamem_tpu.config import fill_scmat
from bwamem_tpu.ops import pallas_ext

from test_extend import gen_cases, run_batch, NT4


def run_batch_pl(cases, interpret=True):
    B = len(cases)
    Bp = (B + pallas_ext.TB - 1) // pallas_ext.TB * pallas_ext.TB
    LQ = max(len(q) for _, _, _, q, _ in cases)
    T = max(len(t) for *_, t in cases)
    qT = np.full((LQ, Bp), 4, np.int32)
    tT = np.full((T, Bp), 4, np.int32)
    qlen = np.zeros(Bp, np.int32)
    tlen = np.zeros(Bp, np.int32)
    h0 = np.ones(Bp, np.int32)
    w = np.full(Bp, 100, np.int32)
    eb = np.zeros(Bp, np.int32)
    for b, (h, ww, e, q, t) in enumerate(cases):
        qT[: len(q), b] = [NT4[c] for c in q]
        tT[: len(t), b] = [NT4[c] for c in t]
        qlen[b], tlen[b], h0[b], w[b], eb[b] = len(q), len(t), h, ww, e
    mat = np.asarray(fill_scmat(1, 4), np.int8)
    res = pallas_ext.extend_batch_pl(
        jnp.asarray(qT), jnp.asarray(qlen), jnp.asarray(tT),
        jnp.asarray(tlen), jnp.asarray(h0), jnp.asarray(w),
        jnp.asarray(eb), lq_max=LQ, t_max=T, mat_bytes=mat.tobytes(),
        o_del=6, e_del=1, o_ins=6, e_ins=1, zdrop=100,
        interpret=interpret)
    return [tuple(int(x[b]) for x in res) for b in range(B)]


@pytest.mark.parametrize("seed,n", [(0, 200), (7, 100)])
def test_pallas_matches_xla(seed, n):
    cases = gen_cases(seed, n)
    want = run_batch(cases)
    got = run_batch_pl(cases)
    bad = [(i, cases[i][:3], want[i], got[i])
           for i in range(len(cases)) if want[i] != got[i]]
    assert not bad, f"{len(bad)}/{len(cases)} mismatch; first 3: {bad[:3]}"
