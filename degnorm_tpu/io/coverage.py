"""Per-(sample, chromosome) coverage + read counting, vectorized.

Re-design of the reference ETL hot loop
(``reads.py:314-818``, SURVEY.md §3.4): the reference walks reads in pure
Python, regex-parsing each CIGAR and filling chromosome-length indicator
vectors per read.  Here the columnar arrays from io/bam.py flow through
numpy primitives — flattened-CIGAR cumulative sums for segment bounds,
prefix sums for exon-membership tests, key-dedup + bincount for coverage.

Two CIGAR conventions are supported (``compat``):

* "reference" (default): replicates the reference parser's behavior in
  which EVERY cigar op consumes reference bases (reads.py:9-66 advances
  ``start`` for I/S/H too) and paired-mate disjoint-ification can emit
  1-base phantom segments (reads.py:463-467).  The reference's own unit
  tests pin this behavior (tests/test_reads.py:151-189); coverage parity
  requires it.
* "strict": SAM-spec semantics (M/=/X consume query+reference and count as
  match; D/N consume reference only; I/S/H consume none) and true interval-
  union mate merging.

Further reference quirks preserved in compat mode (flagged here per
SURVEY.md §7.2 so they're deliberate, not accidental):
  * overlap-gene coverage positions are shifted by -1 relative to the gene
    start, index -1 wrapping to the vector end (reads.py:615-617);
  * a read's exonic containment test for overlap genes allows the segment
    end to exceed the exon end by one base (reads.py:575-576,299);
  * the isolated-gene span test checks one base past the read's end
    (reads.py:697) using an end position that includes ALL cigar ops
    (reads.py:404-405);
  * duplicate positions within one read's fill increment coverage once
    (fancy-index assignment semantics, reads.py:617,773).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from degnorm_tpu.io.bam import (MATCH_OP, REF_CONSUMING, ReadColumns)


@dataclasses.dataclass
class ChromCoverage:
    """One (sample, chromosome)'s ETL output."""
    chrom: str
    isolated_coverage: Optional[np.ndarray]      # (chrom_len,) int or None
    overlap_coverage: Dict[str, np.ndarray]      # gene -> exon-union vector
    read_counts: Dict[str, int]                  # gene -> count


# ---------------------------------------------------------------------------
# segment extraction
# ---------------------------------------------------------------------------

def read_match_segments(cols: ReadColumns, compat: str = "reference"
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                   np.ndarray]:
    """Vectorized CIGAR walk over all reads at once.

    Returns (seg_read, seg_start, seg_end, end_pos):
      seg_read: read index per match segment,
      seg_start/seg_end: 0-based inclusive reference bounds per segment
        (reference cigar_segment_bounds, reads.py:9-66),
      end_pos: per-read 'end' as the reference computes it — pos + the sum
        of ALL cigar run lengths (reads.py:404-405) in compat mode, pos +
        reference-consumed length in strict mode.
    """
    n_reads = len(cols)
    ops = cols.cigar_ops.astype(np.int64)
    lens = cols.cigar_lens.astype(np.int64)
    counts = np.diff(cols.cigar_offsets)
    op_read = np.repeat(np.arange(n_reads), counts)

    if compat == "reference":
        consumed = lens                              # every op advances
        is_match = ops == 0                          # only literal 'M'
        end_adv = lens
    else:
        consumed = lens * REF_CONSUMING[ops]
        is_match = MATCH_OP[ops].astype(bool)
        end_adv = consumed

    # within-read exclusive prefix of consumed lengths
    cum = np.cumsum(consumed)
    base = np.zeros(n_reads + 1, dtype=np.int64)
    np.add.at(base, op_read + 1, consumed)
    read_start_cum = np.cumsum(base)[:-1]            # total before each read
    within = (cum - consumed) - read_start_cum[op_read]

    seg_read = op_read[is_match]
    seg_start = cols.pos.astype(np.int64)[seg_read] + within[is_match]
    seg_end = seg_start + lens[is_match] - 1         # inclusive

    totals = np.zeros(n_reads, dtype=np.int64)
    np.add.at(totals, op_read, end_adv)
    end_pos = cols.pos.astype(np.int64) + totals
    return seg_read, seg_start, seg_end, end_pos


def _segments_by_read(seg_read, seg_start, seg_end, n_reads):
    """Group flat segments into per-read (starts, ends) via offsets."""
    counts = np.bincount(seg_read, minlength=n_reads)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return counts, offsets


def unpaired_qnames(qnames: np.ndarray) -> np.ndarray:
    """Strip the trailing '.1'/'.2' mate token (reads.py:258)."""
    return np.array(["." .join(q.split(".")[:-1]) for q in qnames],
                    dtype=object)


def pair_and_merge_bounds(
    seg_read: np.ndarray, seg_start: np.ndarray, seg_end: np.ndarray,
    order: np.ndarray, compat: str = "reference",
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Merge mate bounds for consecutive read pairs.

    ``order`` lists read indices sorted by unpaired qname (stable), taken
    two at a time (reads.py:450-470).  Returns (kept read index of each
    pair = the SECOND mate, list of merged flat bounds arrays
    [s1,e1,s2,e2,...] per pair).

    compat="reference" replicates the clip-to-scalar disjointification
    (including phantom 1-base segments); "strict" computes the true union.
    """
    n_reads = int(seg_read.max()) + 1 if len(seg_read) else 0
    counts, offsets = _segments_by_read(seg_read, seg_start, seg_end,
                                        max(n_reads, (order.max() + 1) if order.size else 0))
    merged: List[np.ndarray] = []
    kept: List[int] = []
    for k in range(0, len(order) - 1, 2):
        r1, r2 = order[k], order[k + 1]
        s1 = seg_start[offsets[r1]:offsets[r1 + 1]]
        e1 = seg_end[offsets[r1]:offsets[r1 + 1]]
        s2 = seg_start[offsets[r2]:offsets[r2 + 1]]
        e2 = seg_end[offsets[r2]:offsets[r2 + 1]]
        b1 = np.empty(2 * len(s1), np.int64)
        b1[0::2], b1[1::2] = s1, e1
        b2 = np.empty(2 * len(s2), np.int64)
        b2[0::2], b2[1::2] = s2, e2
        if compat == "reference":
            if len(b1) and len(b2):
                max1, min1 = b1.max(), b1.min()
                if b2.max() >= max1:
                    b2 = np.where(b2 <= max1, max1 + 1, b2)
                else:
                    b2 = np.sort(np.where(b2 >= min1, min1 - 1, b2))
            bounds = np.concatenate([b1, b2])
        else:
            iv = sorted(zip(
                np.concatenate([s1, s2]), np.concatenate([e1, e2])))
            out = []
            for s, e in iv:
                if out and s <= out[-1][1] + 1:
                    out[-1][1] = max(out[-1][1], e)
                else:
                    out.append([s, e])
            bounds = np.array([v for se in out for v in se], np.int64)
        merged.append(bounds)
        kept.append(r2)
    return np.array(kept, dtype=np.int64), merged


# ---------------------------------------------------------------------------
# membership tests (prefix sums replace per-read indicator vectors)
# ---------------------------------------------------------------------------

def interval_indicator_prefix(chrom_len: int, starts0: np.ndarray,
                              ends_excl: np.ndarray) -> np.ndarray:
    """Prefix-sum P of a 0/1 "inside some interval" vector: bases in
    [start0, end_excl) are inside.  P has length chrom_len+1;
    count inside [a, b] inclusive = P[b+1] - P[a]."""
    diff = np.zeros(chrom_len + 1, dtype=np.int64)
    np.add.at(diff, np.clip(starts0, 0, chrom_len), 1)
    np.add.at(diff, np.clip(ends_excl, 0, chrom_len), -1)
    ind = np.cumsum(diff)[:-1] > 0
    return np.concatenate([[0], np.cumsum(ind)])


def segments_fully_inside(P: np.ndarray, seg_start: np.ndarray,
                          seg_end: np.ndarray) -> np.ndarray:
    """True per segment iff every base of [start, end] lies inside."""
    seg_start = np.clip(seg_start, 0, len(P) - 2)
    seg_end = np.clip(seg_end, seg_start, len(P) - 2)
    covered = P[seg_end + 1] - P[seg_start]
    return covered == (seg_end - seg_start + 1)


# ---------------------------------------------------------------------------
# per-gene containment for overlap groups
# ---------------------------------------------------------------------------

def gene_exon_containment(exon_starts0: np.ndarray, exon_ends: np.ndarray,
                          seg_start: np.ndarray, seg_end: np.ndarray,
                          compat: str = "reference") -> np.ndarray:
    """Per segment: is [start, end] inside some single exon of this gene?

    In compat mode, exon bounds follow the reference convention
    (reads.py:575-576): starts 0-indexed, ends left 1-indexed — i.e. one
    base beyond the true 0-indexed inclusive end — and the containment
    test is start >= e_start and end <= e_end (reads.py:299), so a read
    may overhang an exon's true end by one base.  Note the reference also
    pairs separately-sorted starts and ends; sorting + a running end max
    reproduces that exactly.  Strict mode uses true inclusive ends.
    """
    if compat != "reference":
        exon_ends = exon_ends - 1
    order = np.argsort(exon_starts0, kind="stable")
    s = exon_starts0[order]
    e_cummax = np.maximum.accumulate(exon_ends[order])
    idx = np.searchsorted(s, seg_start, side="right") - 1
    ok = idx >= 0
    ok &= e_cummax[np.clip(idx, 0, len(s) - 1)] >= seg_end
    return ok


def coverage_increment(cov: np.ndarray, positions: np.ndarray,
                       read_ids: np.ndarray, modulus: int) -> None:
    """cov[positions] += 1 per read with fancy-assignment dedup semantics:
    duplicate positions within one read count once (reads.py:617,773).
    ``positions`` may contain negative indices (compat -1 wrap)."""
    wrapped = np.where(positions < 0, positions + modulus, positions)
    key = read_ids.astype(np.int64) * modulus + wrapped
    uniq = np.unique(key)
    np.add.at(cov, (uniq % modulus).astype(np.int64), 1)


# ---------------------------------------------------------------------------
# the full per-(sample, chromosome) pipeline
# ---------------------------------------------------------------------------

def chromosome_coverage_read_counts(
    cols: ReadColumns,
    chrom: str,
    chrom_len: int,
    chrom_gene_df: pd.DataFrame,
    chrom_exon_df: pd.DataFrame,
    overlap_dat: Dict[str, list],
    *,
    paired: bool,
    unique_alignment: bool = True,
    compat: str = "reference",
) -> ChromCoverage:
    """Coverage + read counts for one sample on one chromosome
    (reference reads.py:314-818; see module docstring for conventions)."""
    genes = chrom_gene_df.gene.values
    gene_start0 = chrom_gene_df.gene_start.values.astype(np.int64) - 1
    gene_end0 = chrom_gene_df.gene_end.values.astype(np.int64) - 1
    read_counts: Dict[str, int] = {g: 0 for g in genes}

    # ---- step 0: alignment-level filters (reads.py:225-242) ----
    keep = np.ones(len(cols), dtype=bool)
    if unique_alignment:
        keep &= ~(cols.nh > 1)
    if paired:
        keep &= cols.rnext != -1
    idx_all = np.flatnonzero(keep)

    # ---- step 1: match segments, span filter (reads.py:404-420) ----
    seg_read, seg_start, seg_end, end_pos = read_match_segments(
        cols, compat=compat)
    span_ok = ((cols.pos >= gene_start0.min())
               & (end_pos <= gene_end0.max()))
    keep &= span_ok

    if paired:
        uq = unpaired_qnames(cols.qnames)
        uq_keep = uq[keep]
        vals, cnts = np.unique(uq_keep, return_counts=True)
        twice = set(vals[cnts == 2])
        keep &= np.array([q in twice for q in uq], dtype=bool)

    # ---- step 2: exon-union membership (reads.py:425-511) ----
    P_exon = interval_indicator_prefix(
        chrom_len,
        chrom_exon_df.start.values.astype(np.int64) - 1,
        chrom_exon_df.end.values.astype(np.int64))

    # per-"unit" bounds: a unit is a single read (single-end) or a merged
    # pair; unit_bounds[i] is the flat [s,e,s,e,...] array.
    if paired:
        live = np.flatnonzero(keep)
        uq_live = uq[live]
        order_local = np.argsort(uq_live, kind="stable")
        order = live[order_local]
        kept_reads, unit_bounds = pair_and_merge_bounds(
            seg_read, seg_start, seg_end, order, compat=compat)
    else:
        kept_reads = np.flatnonzero(keep)
        counts_r, offsets_r = _segments_by_read(
            seg_read, seg_start, seg_end, len(cols))
        unit_bounds = []
        for r in kept_reads:
            b = np.empty(2 * counts_r[r], np.int64)
            b[0::2] = seg_start[offsets_r[r]:offsets_r[r + 1]]
            b[1::2] = seg_end[offsets_r[r]:offsets_r[r + 1]]
            unit_bounds.append(b)

    # drop units with any match base outside the exon union
    flat_s = np.concatenate([b[0::2] for b in unit_bounds]) if unit_bounds \
        else np.empty(0, np.int64)
    flat_e = np.concatenate([b[1::2] for b in unit_bounds]) if unit_bounds \
        else np.empty(0, np.int64)
    flat_unit = np.repeat(np.arange(len(unit_bounds)),
                          [len(b) // 2 for b in unit_bounds])
    seg_ok = segments_fully_inside(P_exon, flat_s, flat_e)
    unit_ok = np.ones(len(unit_bounds), dtype=bool)
    np.logical_and.at(unit_ok, flat_unit, seg_ok)

    kept_reads = kept_reads[unit_ok]
    unit_bounds = [b for b, ok in zip(unit_bounds, unit_ok) if ok]
    unit_end = end_pos[kept_reads] if len(kept_reads) else np.empty(0, np.int64)
    unit_pos = cols.pos[kept_reads].astype(np.int64) if len(kept_reads) \
        else np.empty(0, np.int64)
    active = np.ones(len(unit_bounds), dtype=bool)

    # ---- step 3: overlap gene groups (reads.py:543-656) ----
    overlap_cov: Dict[str, np.ndarray] = {}
    for ol_genes in overlap_dat.get("overlap_genes", []):
        gsel = chrom_gene_df[chrom_gene_df.gene.isin(ol_genes)]
        grp_start0 = gsel.gene_start.min() - 1
        grp_end0 = gsel.gene_end.max() - 1

        gene_info = []
        for g in ol_genes:
            gex = chrom_exon_df[chrom_exon_df.gene == g]
            gstart0 = int(gex.gene_start.iloc[0]) - 1
            gend0 = int(gex.gene_end.iloc[0]) - 1
            e_starts0 = np.sort(gex.start.values.astype(np.int64)) - 1
            e_ends = np.sort(gex.end.values.astype(np.int64))
            tx_idx = np.unique(np.concatenate(
                [np.arange(s, e) for s, e in zip(e_starts0, e_ends)]))
            gene_info.append((g, gstart0, gend0, e_starts0, e_ends, tx_idx))
            overlap_cov[g] = np.zeros(gend0 - gstart0 + 1, dtype=np.int64)

        in_grp = active & (unit_pos >= grp_start0) & (unit_end <= grp_end0)
        grp_units = np.flatnonzero(in_grp)
        if len(grp_units):
            gs = np.concatenate([unit_bounds[u][0::2] for u in grp_units])
            ge = np.concatenate([unit_bounds[u][1::2] for u in grp_units])
            gu = np.repeat(np.arange(len(grp_units)),
                           [len(unit_bounds[u]) // 2 for u in grp_units])
            n_caught = np.zeros(len(grp_units), dtype=np.int64)
            caught_gene = np.full(len(grp_units), -1, dtype=np.int64)
            for gi, (g, gstart0, gend0, es0, ee, tx) in enumerate(gene_info):
                seg_in = gene_exon_containment(es0, ee, gs, ge, compat=compat)
                unit_in = np.ones(len(grp_units), dtype=bool)
                np.logical_and.at(unit_in, gu, seg_in)
                n_caught += unit_in
                caught_gene = np.where(unit_in & (n_caught == 1),
                                       gi, caught_gene)
            single = n_caught == 1
            for j in np.flatnonzero(single):
                g, gstart0, gend0, es0, ee, tx = gene_info[caught_gene[j]]
                b = unit_bounds[grp_units[j]]
                pos_fill = np.concatenate(
                    [np.arange(b[i], b[i + 1] + 1)
                     for i in range(0, len(b), 2)])
                L = len(overlap_cov[g])
                # compat: -1 shift with wraparound (reads.py:615-617)
                shift = 1 if compat == "reference" else 0
                coverage_increment(
                    overlap_cov[g], pos_fill - gstart0 - shift,
                    np.zeros(len(pos_fill), np.int64), L)
                read_counts[g] += 1
            # drop units caught by exactly one gene or by 2+ genes
            drop = single | (n_caught >= 2)
            active[grp_units[drop]] = False

        for g, gstart0, gend0, es0, ee, tx in gene_info:
            overlap_cov[g] = overlap_cov[g][tx - gstart0]

    # ---- step 4: isolated genes (reads.py:669-797) ----
    isolated = overlap_dat.get("isolated_genes", [])
    iso_cov = None
    if isolated:
        isel = chrom_gene_df[chrom_gene_df.gene.isin(isolated)]
        iso_start0 = isel.gene_start.values.astype(np.int64) - 1
        iso_end1 = isel.gene_end.values.astype(np.int64)   # end-exclusive 0idx
        iso_genes = isel.gene.values

        P_iso = interval_indicator_prefix(chrom_len, iso_start0, iso_end1)
        # read must lie fully in isolated-gene territory, checking one base
        # past its end (reads.py:697): [pos, end_pos] inclusive.
        u_ok = active & segments_fully_inside(
            P_iso, unit_pos, np.minimum(unit_end, chrom_len - 1))
        live_units = np.flatnonzero(u_ok)

        iso_cov = np.zeros(chrom_len, dtype=np.int64)
        if len(live_units):
            so = np.argsort(iso_start0, kind="stable")
            st_sorted = iso_start0[so]
            en_sorted = (iso_end1 - 1)[so]
            gn_sorted = iso_genes[so]
            gi = np.searchsorted(st_sorted, unit_pos[live_units],
                                 side="right") - 1
            valid = (gi >= 0) & (unit_pos[live_units]
                                 <= en_sorted[np.clip(gi, 0, None)])
            live_units = live_units[valid]
            gi = gi[valid]

            fills = [np.concatenate(
                [np.arange(unit_bounds[u][i], unit_bounds[u][i + 1] + 1)
                 for i in range(0, len(unit_bounds[u]), 2)])
                for u in live_units]
            if fills:
                pos_all = np.concatenate(fills)
                rid_all = np.repeat(np.arange(len(fills)),
                                    [len(f) for f in fills])
                coverage_increment(iso_cov, pos_all, rid_all, chrom_len)
            for g_idx in gi:
                read_counts[gn_sorted[g_idx]] += 1

    return ChromCoverage(chrom=chrom, isolated_coverage=iso_cov,
                         overlap_coverage=overlap_cov,
                         read_counts=read_counts)
