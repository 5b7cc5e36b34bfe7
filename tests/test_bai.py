"""BAI index write/read and region fetch (the samtools-index equivalent)."""
import numpy as np
import pytest

from degnorm_tpu.io import bam as bamio
from degnorm_tpu.io.bai import read_bai, reg2bin, reg2bins
from degnorm_tpu.io.simulate import make_genes, simulate_sample


def test_reg2bin_spec_cases():
    # bin 0 covers the whole reference; small windows land in leaf bins
    assert reg2bin(0, 1 << 29) == 0
    leaf = reg2bin(0, 100)
    assert 4681 <= leaf <= 4681 + (1 << 15) - 1
    assert reg2bin(16384, 16484) == 4681 + 1
    # reg2bins always includes every level's covering bin
    bins = reg2bins(20000, 30000)
    assert 0 in bins and reg2bin(20000, 30000) in bins


@pytest.fixture(scope="module")
def indexed_bam(tmp_path_factory):
    d = tmp_path_factory.mktemp("bai")
    rng = np.random.default_rng(9)
    g1 = make_genes(rng, chrom="c1", n_genes=5, name_prefix="a.")
    g2 = make_genes(rng, chrom="c2", n_genes=4, name_prefix="b.")
    recs = []
    for tid, genes in enumerate((g1, g2)):
        sub = simulate_sample(np.random.default_rng(50 + tid), genes,
                              80_000, mean_reads_per_gene=120)
        recs.extend((r[0], tid, *r[2:]) for r in sub)
    bam = str(d / "x.bam")
    bai = bam + ".bai"
    bamio.write_bam(bam, ["c1", "c2"], [80_000, 80_000], recs,
                    index_path=bai)
    return bam, bai


def test_bai_roundtrip(indexed_bam):
    bam, bai = indexed_bam
    idx = read_bai(bai)
    assert len(idx.bins) == 2
    assert all(idx.bins[t] for t in (0, 1))
    # chunks are sorted, non-overlapping after merge
    ch = idx.chunks_for(0)
    assert ch == sorted(ch)
    for (s1, e1), (s2, e2) in zip(ch, ch[1:]):
        assert e1 <= s2


def test_region_fetch_matches_streaming(indexed_bam):
    bam, bai = indexed_bam
    for tid in (0, 1):
        hdr_s, cols_s = bamio.read_bam(bam, tid=tid, native=False)
        hdr_r, cols_r = bamio.read_bam_region(bam, bai, tid=tid)
        assert list(cols_r.qnames) == list(cols_s.qnames)
        np.testing.assert_array_equal(cols_r.pos, cols_s.pos)
        np.testing.assert_array_equal(cols_r.cigar_lens, cols_s.cigar_lens)


def test_region_fetch_window(indexed_bam):
    bam, bai = indexed_bam
    hdr, all_cols = bamio.read_bam(bam, tid=0, native=False)
    beg, end = 3000, 9000
    _, win = bamio.read_bam_region(bam, bai, tid=0, beg=beg, end=end)
    expect = {q for q, p in zip(all_cols.qnames, all_cols.pos)
              if beg <= p < end}
    assert set(win.qnames) == expect
