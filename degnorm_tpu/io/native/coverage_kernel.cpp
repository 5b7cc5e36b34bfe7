// Native coverage + read-count kernel: the per-(sample, chromosome) ETL
// hot path (reference reads.py:314-818) in C++.
//
// Mirrors io/coverage.py's reference-compat semantics exactly (every CIGAR
// op consumes reference bases, mate clip-to-scalar disjointification with
// phantom segments, -1 overlap coverage shift with wraparound, one-past
// exon-end containment, per-unit duplicate-position dedup).  The numpy
// implementation remains the source of truth for the "strict" mode and as
// the portable fallback; this kernel is the production fast path.
//
// C ABI via ctypes; all buffers are caller-allocated numpy arrays.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Unit {
    // flat segment list [s0,e0,s1,e1,...] inclusive 0-based
    std::vector<int64_t> bounds;
    int64_t pos;        // anchor read position
    int64_t end_pos;    // pos + total cigar length
    bool dirty;         // mate clipping may have produced duplicates
    bool active;
};

inline void fill_unit(const Unit& u, int64_t base_shift, int64_t* cov,
                      int64_t cov_len, std::vector<int64_t>& scratch) {
    // cov[p - base_shift] += 1 per unique covered position p (python
    // fancy-assignment semantics: duplicates within a unit count once);
    // negative indices wrap (compat -1 shift, reads.py:615-617).
    if (!u.dirty) {
        for (size_t i = 0; i + 1 < u.bounds.size(); i += 2)
            for (int64_t p = u.bounds[i]; p <= u.bounds[i + 1]; p++) {
                int64_t idx = p - base_shift;
                if (idx < 0) idx += cov_len;
                if (idx >= 0 && idx < cov_len) cov[idx]++;
            }
        return;
    }
    scratch.clear();
    for (size_t i = 0; i + 1 < u.bounds.size(); i += 2)
        for (int64_t p = u.bounds[i]; p <= u.bounds[i + 1]; p++)
            scratch.push_back(p);
    std::sort(scratch.begin(), scratch.end());
    scratch.erase(std::unique(scratch.begin(), scratch.end()),
                  scratch.end());
    for (int64_t p : scratch) {
        int64_t idx = p - base_shift;
        if (idx < 0) idx += cov_len;
        if (idx >= 0 && idx < cov_len) cov[idx]++;
    }
}

}  // namespace

extern "C" {

// Returns 0 on success.
int dn_chrom_coverage(
    // ---- reads (columnar, post tid-filter) ----
    int64_t n_reads,
    const int32_t* pos,
    const int8_t* cigar_ops,
    const int32_t* cigar_lens,
    const int64_t* cigar_offsets,   // n_reads + 1
    const int32_t* nh,
    const int32_t* rnext,
    const uint64_t* pair_hash,      // may be null when !paired
    int paired,
    int unique_alignment,
    // ---- annotation ----
    int64_t chrom_len,
    int64_t n_genes,
    const int64_t* gene_start0,     // 0-indexed inclusive
    const int64_t* gene_end0,       // 0-indexed inclusive
    const int32_t* gene_group,      // group id per gene; -1 = isolated
    int64_t n_groups,
    const int64_t* exon_offsets,    // n_genes + 1 into exon arrays
    const int64_t* exon_starts0,    // per gene: sorted, 0-indexed
    const int64_t* exon_ends1,      // per gene: sorted, 1-indexed (quirk)
    // ---- exon union (all genes) ----
    int64_t n_union,
    const int64_t* union_starts0,
    const int64_t* union_ends1,
    // ---- outputs (caller-allocated, zeroed) ----
    int64_t* iso_coverage,          // chrom_len (may be null if no isolated)
    int64_t* overlap_cov,           // concatenated per-overlap-gene spans
    const int64_t* overlap_cov_offsets,  // n_genes + 1 (0-width for isolated)
    int64_t* read_counts)           // n_genes
{
    if (n_reads == 0 || n_genes == 0) return 0;

    // ---- span bounds + step-0/1 filters (reads.py:225-242,404-420) ----
    int64_t min_gene_start = gene_start0[0], max_gene_end = gene_end0[0];
    for (int64_t g = 1; g < n_genes; g++) {
        min_gene_start = std::min(min_gene_start, gene_start0[g]);
        max_gene_end = std::max(max_gene_end, gene_end0[g]);
    }

    std::vector<uint8_t> keep(n_reads, 1);
    std::vector<int64_t> end_pos(n_reads);
    for (int64_t r = 0; r < n_reads; r++) {
        if (unique_alignment && nh[r] > 1) keep[r] = 0;
        if (paired && rnext[r] == -1) keep[r] = 0;
        int64_t total = 0;
        for (int64_t c = cigar_offsets[r]; c < cigar_offsets[r + 1]; c++)
            total += cigar_lens[c];
        end_pos[r] = (int64_t)pos[r] + total;
        if (pos[r] < min_gene_start || end_pos[r] > max_gene_end)
            keep[r] = 0;
    }

    // paired: keep only hashes occurring exactly twice among kept reads
    std::vector<int64_t> order;
    if (paired) {
        order.reserve(n_reads);
        for (int64_t r = 0; r < n_reads; r++)
            if (keep[r]) order.push_back(r);
        std::stable_sort(order.begin(), order.end(),
                         [&](int64_t a, int64_t b) {
                             return pair_hash[a] < pair_hash[b];
                         });
        std::vector<int64_t> filtered;
        for (size_t i = 0; i < order.size();) {
            size_t j = i;
            while (j < order.size()
                   && pair_hash[order[j]] == pair_hash[order[i]]) j++;
            if (j - i == 2) {
                filtered.push_back(order[i]);
                filtered.push_back(order[i + 1]);
            }
            i = j;
        }
        order.swap(filtered);
    }

    // ---- per-read match segments (compat: every op consumes ref) ----
    auto segments_of = [&](int64_t r, std::vector<int64_t>& out) {
        out.clear();
        int64_t cur = pos[r];
        for (int64_t c = cigar_offsets[r]; c < cigar_offsets[r + 1]; c++) {
            if (cigar_ops[c] == 0) {                    // literal 'M'
                out.push_back(cur);
                out.push_back(cur + cigar_lens[c] - 1);
            }
            cur += cigar_lens[c];
        }
    };

    // ---- exon-union bitmap (reads.py:425-435) ----
    std::vector<uint8_t> in_exon(chrom_len, 0);
    for (int64_t i = 0; i < n_union; i++) {
        int64_t a = std::max<int64_t>(union_starts0[i], 0);
        int64_t b = std::min<int64_t>(union_ends1[i], chrom_len);
        if (a < b) memset(in_exon.data() + a, 1, (size_t)(b - a));
    }
    auto seg_in_exons = [&](int64_t s, int64_t e) {
        s = std::max<int64_t>(s, 0);
        e = std::min<int64_t>(e, chrom_len - 1);
        for (int64_t p = s; p <= e; p++)
            if (!in_exon[p]) return false;
        return true;
    };

    // ---- build units (reads.py:450-523) ----
    std::vector<Unit> units;
    std::vector<int64_t> b1, b2;
    if (paired) {
        units.reserve(order.size() / 2);
        for (size_t k = 0; k + 1 < order.size(); k += 2) {
            int64_t r1 = order[k], r2 = order[k + 1];
            segments_of(r1, b1);
            segments_of(r2, b2);
            Unit u;
            u.dirty = false;
            if (!b1.empty() && !b2.empty()) {
                int64_t min1 = b1.front(), max1 = b1.back();
                int64_t max2 = b2.back();
                std::vector<int64_t> nb2(b2);
                if (max2 >= max1) {
                    for (auto& v : nb2)
                        if (v <= max1) { v = max1 + 1; u.dirty = true; }
                } else {
                    bool clipped = false;
                    for (auto& v : nb2)
                        if (v >= min1) { v = min1 - 1; clipped = true; }
                    if (clipped) {
                        std::sort(nb2.begin(), nb2.end());
                        u.dirty = true;
                    }
                }
                b2.swap(nb2);
            }
            u.bounds = b1;
            u.bounds.insert(u.bounds.end(), b2.begin(), b2.end());
            u.pos = pos[r2];
            u.end_pos = end_pos[r2];
            u.active = true;
            // exon-union membership of every merged segment
            bool ok = true;
            for (size_t i = 0; ok && i + 1 < u.bounds.size(); i += 2)
                ok = seg_in_exons(u.bounds[i], u.bounds[i + 1]);
            if (ok) units.push_back(std::move(u));
        }
    } else {
        for (int64_t r = 0; r < n_reads; r++) {
            if (!keep[r]) continue;
            Unit u;
            segments_of(r, u.bounds);
            u.pos = pos[r];
            u.end_pos = end_pos[r];
            u.dirty = false;
            u.active = true;
            bool ok = true;
            for (size_t i = 0; ok && i + 1 < u.bounds.size(); i += 2)
                ok = seg_in_exons(u.bounds[i], u.bounds[i + 1]);
            if (ok) units.push_back(std::move(u));
        }
    }

    // ---- overlap gene groups (reads.py:543-656) ----
    std::vector<int64_t> scratch;
    for (int64_t grp = 0; grp < n_groups; grp++) {
        std::vector<int64_t> members;
        int64_t grp_start = INT64_MAX, grp_end = INT64_MIN;
        for (int64_t g = 0; g < n_genes; g++)
            if (gene_group[g] == grp) {
                members.push_back(g);
                grp_start = std::min(grp_start, gene_start0[g]);
                grp_end = std::max(grp_end, gene_end0[g]);
            }
        if (members.empty()) continue;

        for (auto& u : units) {
            if (!u.active || u.pos < grp_start || u.end_pos > grp_end)
                continue;
            int n_caught = 0;
            int64_t caught = -1;
            for (int64_t g : members) {
                bool all_in = true;
                const int64_t* es = exon_starts0 + exon_offsets[g];
                const int64_t* ee = exon_ends1 + exon_offsets[g];
                int64_t n_ex = exon_offsets[g + 1] - exon_offsets[g];
                for (size_t i = 0; all_in && i + 1 < u.bounds.size();
                     i += 2) {
                    int64_t s = u.bounds[i], e = u.bounds[i + 1];
                    // last exon with start <= s; running end max equals
                    // the sorted-ends pairing quirk (reads.py:575-576,299)
                    int64_t lo = 0, hi = n_ex;
                    while (lo < hi) {
                        int64_t mid = (lo + hi) / 2;
                        if (es[mid] <= s) lo = mid + 1; else hi = mid;
                    }
                    all_in = lo > 0 && ee[lo - 1] >= e;
                }
                if (all_in) {
                    n_caught++;
                    if (n_caught == 1) caught = g;
                    if (n_caught >= 2) break;
                }
            }
            if (n_caught == 1) {
                int64_t span = overlap_cov_offsets[caught + 1]
                               - overlap_cov_offsets[caught];
                fill_unit(u, gene_start0[caught] + 1,   // compat -1 shift
                          overlap_cov + overlap_cov_offsets[caught],
                          span, scratch);
                read_counts[caught]++;
                u.active = false;
            } else if (n_caught >= 2) {
                u.active = false;
            }
        }
    }

    // ---- isolated genes (reads.py:669-797) ----
    std::vector<int64_t> iso_idx;
    for (int64_t g = 0; g < n_genes; g++)
        if (gene_group[g] < 0) iso_idx.push_back(g);
    if (!iso_idx.empty() && iso_coverage) {
        std::sort(iso_idx.begin(), iso_idx.end(),
                  [&](int64_t a, int64_t b) {
                      return gene_start0[a] < gene_start0[b];
                  });
        std::vector<uint8_t> in_iso(chrom_len, 0);
        for (int64_t g : iso_idx) {
            int64_t a = std::max<int64_t>(gene_start0[g], 0);
            int64_t b = std::min<int64_t>(gene_end0[g] + 1, chrom_len);
            if (a < b) memset(in_iso.data() + a, 1, (size_t)(b - a));
        }
        std::vector<int64_t> starts;
        for (int64_t g : iso_idx) starts.push_back(gene_start0[g]);

        for (auto& u : units) {
            if (!u.active) continue;
            // whole [pos, end_pos] inclusive must sit in isolated spans
            int64_t s = std::max<int64_t>(u.pos, 0);
            int64_t e = std::min<int64_t>(u.end_pos, chrom_len - 1);
            bool ok = true;
            for (int64_t p = s; ok && p <= e; p++) ok = in_iso[p];
            if (!ok) continue;
            // gene by anchor position (spans are disjoint)
            auto it = std::upper_bound(starts.begin(), starts.end(), u.pos);
            if (it == starts.begin()) continue;
            int64_t g = iso_idx[(it - starts.begin()) - 1];
            if (u.pos > gene_end0[g]) continue;
            fill_unit(u, 0, iso_coverage, chrom_len, scratch);
            read_counts[g]++;
        }
    }
    return 0;
}

}  // extern "C"
