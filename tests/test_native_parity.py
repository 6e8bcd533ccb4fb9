"""Native kernels pinned against their python/numpy oracles.

Round 5 moved three hot host paths into C++ (`native/ava.cpp` all-vs-all
overlap discovery, `native/soup.cpp` inversion-rescue soup scan, and the
primary/supplementary chain selection inside `native/seedchain.cpp`).
Each keeps its python oracle for the no-toolchain fallback; these tests
hold the two implementations byte-identical so a drift in either is loud.
"""
import numpy as np
import pytest

import volcanosv_tpu.native as native
from volcanosv_tpu import sim
from volcanosv_tpu.config import AlignConfig, AssemblyConfig


@pytest.fixture
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    return lib


class _Hide:
    """Proxy that hides selected symbols from the native lib."""

    def __init__(self, lib, hidden):
        self._lib = lib
        self._hidden = set(hidden)

    def __getattr__(self, name):
        if name in self._hidden:
            raise AttributeError(name)
        return getattr(self._lib, name)


def _reads(rng, length=60_000, n_inv=0, coverage=8.0, read_len=6000):
    ref = sim.random_genome(rng, length, n_chroms=1)
    hap1, hap2, _t = sim.implant_svs(rng, ref, n_del=2, n_ins=2,
                                     n_inv=n_inv)
    reads = sim.simulate_reads(rng, {1: hap1, 2: hap2}, coverage=coverage,
                               read_len=read_len, sub_rate=0.002,
                               indel_rate=0.001)
    return ref, [(n, s) for n, s, *_ in reads]


def test_ava_overlaps_matches_numpy_oracle(lib, monkeypatch):
    from volcanosv_tpu.assembly import olc
    rng = np.random.default_rng(11)
    _ref, reads = _reads(rng, length=50_000)
    seqs = [s for _n, s in reads]
    cfg, acfg = AssemblyConfig(), AlignConfig.preset("ava")
    ov_native = olc._find_overlaps(seqs, cfg, acfg)
    monkeypatch.setattr(native, "get_lib",
                        lambda: _Hide(lib, {"ava_overlaps"}))
    ov_numpy = olc._find_overlaps(seqs, cfg, acfg)

    def key(o):
        return (o.a, o.b, o.strand, o.a_start, o.a_end, o.b_start,
                o.b_end, round(o.score, 2))

    assert len(ov_native) > 10
    assert sorted(map(key, ov_native)) == sorted(map(key, ov_numpy))


def test_soup_runs_matches_python_oracle(lib, monkeypatch):
    from volcanosv_tpu.aligner import Aligner
    rng = np.random.default_rng(7)
    ref, reads = _reads(rng, length=80_000, n_inv=3)
    al = Aligner(ref, AlignConfig.preset("map-hifi"))
    a_native = al.align(reads)
    monkeypatch.setattr(native, "get_lib",
                        lambda: _Hide(lib, {"soup_runs"}))
    a_python = al.align(reads)

    def key(a):
        return (a.qname, a.ref_id, a.pos, a.strand, a.is_supplementary,
                tuple(map(tuple, a.cigar)))

    assert any(a.is_supplementary for a in a_native)   # rescue fired
    assert sorted(map(key, a_native)) == sorted(map(key, a_python))


def test_native_chain_selection_matches_python_select(lib, monkeypatch):
    from volcanosv_tpu.aligner import Aligner
    rng = np.random.default_rng(3)
    ref, reads = _reads(rng, length=50_000)
    al = Aligner(ref, AlignConfig.preset("map-hifi"))
    a_native = al.align(reads)
    # full python fallback path (per-query sketch/chain + python _select)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    a_python = al.align(reads)

    def key(a):
        return (a.qname, a.ref_id, a.pos, a.strand, a.is_supplementary,
                tuple(map(tuple, a.cigar)))

    assert len(a_native) == len(reads) > 0
    assert sorted(map(key, a_native)) == sorted(map(key, a_python))
