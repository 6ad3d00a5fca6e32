"""Pallas broadcast-probe correctness (interpret mode on CPU).

The kernel is an experimental reference implementation quarantined
outside the shipped package (docs/experimental/probe_pallas.py,
PERF.md §3) — this test loads it from the docs tree.
"""

import importlib.util
import pathlib

import numpy as np
import jax.numpy as jnp

from hast_tpu.ops import encode as E
from hast_tpu.ops import hashtable as H

_SPEC = importlib.util.spec_from_file_location(
    "probe_pallas_experimental",
    pathlib.Path(__file__).parent.parent / "docs" / "experimental"
    / "probe_pallas.py")
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)
pallas_broadcast_probe = _MOD.pallas_broadcast_probe
table_key_arrays = _MOD.table_key_arrays


def test_pallas_probe_matches_hashtable():
    rng = np.random.default_rng(0)
    seqs = rng.integers(0, 4, size=(3000, 21), dtype=np.int32)
    hi, lo = E.canonical_kmers_np(seqs, 21)
    pay = rng.integers(1, 4, 3000).astype(np.uint32)
    t = H.build_table(hi[:, 0], lo[:, 0], pay, 21)
    thi, tlo = table_key_arrays(t)

    q2 = rng.integers(0, 4, (500, 21), dtype=np.int32)
    q2hi, q2lo = E.canonical_kmers_np(q2, 21)
    qhi = np.concatenate([hi[:500, 0], q2hi[:, 0]])
    qlo = np.concatenate([lo[:500, 0], q2lo[:, 0]])

    want = H.probe_np(t, qhi, qlo)
    got = np.asarray(pallas_broadcast_probe(
        jnp.asarray(thi), jnp.asarray(tlo), jnp.asarray(qhi),
        jnp.asarray(qlo), interpret=True))
    np.testing.assert_array_equal(got, want)
    assert (want > 0).sum() == 500
