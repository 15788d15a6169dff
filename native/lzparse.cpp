// Native LZ-parse alignment engine.
//
// C++ twin of vclust_tpu/ops/lz_parse_py.py (the Python reference
// implementation is the semantic oracle; this engine must produce
// bit-identical alignments). It fills the role lz-ani's C++ core plays in
// the reference pipeline (contract: reference vclust.py:1058-1181) for the
// host path; the TPU Pallas kernel covers the batched accelerator path.
//
// Performance notes (the align stage is the hot loop of the whole system,
// SURVEY.md section 2.5.5):
//  - k-mer indexes are flat CSR over 4^k buckets for small k (seeds) and an
//    open-addressing hash CSR for large k (anchors) — no per-bucket heap
//    vectors, positions contiguous and ascending.
//  - factor extension is allocation-free: the mismatch window is a uint64
//    bitmask (popcount), the ar-run trim is tracked forward in O(1), and the
//    exact part compares 8 bases per step via word loads.
//  - query anchor/seed window values are computed once per genome and shared
//    by every pair that uses that genome as query.
//
// Exposed via a C ABI consumed with ctypes (vclust_tpu/ops/lz_native.py).

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

struct Params {
    int32_t mal, msl, mrd, mqd, reg, aw, am, ar;
    int32_t gap_policy;        // 0=mismatch 1=prev 2=next 3=split
    int32_t seed_back;
    int32_t region_back_ext;   // bool
    int32_t anchor_in_region;  // bool
    int32_t anchor_preempt_len;
    int32_t seed_window_qscale; // bool
};

struct Alignment {
    int32_t qstart, qend, rstart, rend, nt_match, nt_mismatch, strand;
};

struct Factor { int32_t qs, qe, rs, re; };

struct PosSlice { const int32_t* begin; const int32_t* end; };

static inline uint64_t mix64(uint64_t x) {
    x += 0x9e3779b97f4a7c15ull;
    x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
    x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
    return x ^ (x >> 31);
}

// k-mer index over one strand: value -> ascending positions (CSR).
// Small k (2k <= 20): direct-mapped buckets. Larger k: open-addressing hash
// of (value -> bucket), linear probing, power-of-2 capacity.
struct KmerIndex {
    int k = 0;
    bool flat = false;
    // flat mode
    std::vector<int32_t> flat_off;       // 4^k + 1
    // hash mode
    std::vector<uint64_t> hvals;         // capacity, EMPTY = ~0ull
    std::vector<int32_t> hoff;           // capacity + 1 used as bucket start
    std::vector<int32_t> hcnt;           // capacity (during build)
    uint64_t hmask = 0;
    // presence bitmap (Bloom, 1 probe): most lookups in a dissimilar pair
    // miss, and this keeps a miss to one L1/L2 bit test instead of a probe
    // chain through the (much larger) hash table.
    std::vector<uint64_t> bloom;
    uint64_t bloom_mask = 0;
    // shared
    std::vector<int32_t> pos;

    static constexpr uint64_t EMPTY = ~0ull;

    void build(const int8_t* seq, int n, int kk) {
        k = kk;
        int n_win = n - k + 1;
        flat = (2 * k <= 20);
        pos.clear();
        if (n_win <= 0) { flat_off.assign(flat ? (1u << (2 * k)) + 1 : 1, 0);
                          hvals.clear(); return; }
        const uint64_t mask = (2 * k >= 64) ? ~0ull : ((1ull << (2 * k)) - 1);
        if (flat) {
            size_t nb = 1u << (2 * k);
            flat_off.assign(nb + 1, 0);
            bloom.assign((nb + 63) / 64, 0);   // exact presence bits (L1)
            // pass 1: counts
            uint64_t val = 0; int run_valid = 0;
            for (int i = 0; i < n; ++i) {
                int8_t c = seq[i];
                val = ((val << 2) | (uint64_t)(c >= 4 ? 0 : c)) & mask;
                run_valid = (c >= 4) ? 0 : run_valid + 1;
                if (i >= k - 1 && run_valid >= k) {
                    ++flat_off[val + 1];
                    bloom[val >> 6] |= 1ull << (val & 63);
                }
            }
            for (size_t b = 0; b < nb; ++b) flat_off[b + 1] += flat_off[b];
            pos.resize(flat_off[nb]);
            std::vector<int32_t> cursor(flat_off.begin(), flat_off.end() - 1);
            val = 0; run_valid = 0;
            for (int i = 0; i < n; ++i) {
                int8_t c = seq[i];
                val = ((val << 2) | (uint64_t)(c >= 4 ? 0 : c)) & mask;
                run_valid = (c >= 4) ? 0 : run_valid + 1;
                if (i >= k - 1 && run_valid >= k)
                    pos[cursor[val]++] = i - k + 1;
            }
        } else {
            // open addressing: capacity = next pow2 >= 2 * n_win
            size_t cap = 16;
            while (cap < (size_t)n_win * 2) cap <<= 1;
            hmask = cap - 1;
            hvals.assign(cap, EMPTY);
            hcnt.assign(cap, 0);
            // ~4 bits per k-mer -> FPR ~ 1 - e^-0.25 ~ 22%
            size_t bloom_bits = cap * 2;
            bloom.assign(bloom_bits / 64, 0);
            bloom_mask = bloom_bits - 1;
            uint64_t val = 0; int run_valid = 0;
            for (int i = 0; i < n; ++i) {
                int8_t c = seq[i];
                val = ((val << 2) | (uint64_t)(c >= 4 ? 0 : c)) & mask;
                run_valid = (c >= 4) ? 0 : run_valid + 1;
                if (i >= k - 1 && run_valid >= k) {
                    uint64_t hv = mix64(val);
                    size_t h = hv & hmask;
                    while (hvals[h] != EMPTY && hvals[h] != val)
                        h = (h + 1) & hmask;
                    hvals[h] = val;
                    ++hcnt[h];
                    uint64_t b = (hv >> 17) & bloom_mask;
                    bloom[b >> 6] |= 1ull << (b & 63);
                }
            }
            hoff.assign(cap + 1, 0);
            for (size_t b = 0; b < cap; ++b) hoff[b + 1] = hoff[b] + hcnt[b];
            pos.resize(hoff[cap]);
            std::vector<int32_t> cursor(hoff.begin(), hoff.end() - 1);
            val = 0; run_valid = 0;
            for (int i = 0; i < n; ++i) {
                int8_t c = seq[i];
                val = ((val << 2) | (uint64_t)(c >= 4 ? 0 : c)) & mask;
                run_valid = (c >= 4) ? 0 : run_valid + 1;
                if (i >= k - 1 && run_valid >= k) {
                    size_t h = mix64(val) & hmask;
                    while (hvals[h] != val) h = (h + 1) & hmask;
                    pos[cursor[h]++] = i - k + 1;
                }
            }
            hcnt.clear();
            hcnt.shrink_to_fit();
        }
    }

    inline PosSlice find(uint64_t v) const {
        if (flat) {
            if (pos.empty() ||
                !(bloom[v >> 6] & (1ull << (v & 63))))
                return {nullptr, nullptr};
            return {pos.data() + flat_off[v], pos.data() + flat_off[v + 1]};
        }
        if (hvals.empty()) return {nullptr, nullptr};
        uint64_t hv = mix64(v);
        uint64_t b = (hv >> 17) & bloom_mask;
        if (!(bloom[b >> 6] & (1ull << (b & 63)))) return {nullptr, nullptr};
        return find_nobloom(v, hv);
    }

    // Hash-mode probe without the bloom test (caller already screened).
    inline PosSlice find_nobloom(uint64_t v, uint64_t hv) const {
        if (hvals.empty()) return {nullptr, nullptr};
        size_t h = hv & hmask;
        while (hvals[h] != EMPTY) {
            if (hvals[h] == v)
                return {pos.data() + hoff[h], pos.data() + hoff[h + 1]};
            h = (h + 1) & hmask;
        }
        return {nullptr, nullptr};
    }
};

// Anchor/seed window values + validity of one genome as QUERY; computed once
// and shared by every pair using that genome as query.
struct QueryWindows {
    std::vector<uint64_t> aval, sval;
    std::vector<uint64_t> ahash;    // mix64(aval[i]), ref-independent
    std::vector<uint8_t> avalid, svalid;

    static void compute(const int8_t* q, int nq, int k,
                        std::vector<uint64_t>* vals,
                        std::vector<uint8_t>* valid) {
        int n = nq - k + 1;
        vals->assign(n > 0 ? n : 0, 0);
        valid->assign(n > 0 ? n : 0, 0);
        if (n <= 0) return;
        uint64_t val = 0;
        const uint64_t mask = (2 * k >= 64) ? ~0ull : ((1ull << (2 * k)) - 1);
        int run_valid = 0;
        for (int i = 0; i < nq; ++i) {
            int8_t c = q[i];
            val = ((val << 2) | (uint64_t)(c >= 4 ? 0 : c)) & mask;
            run_valid = (c >= 4) ? 0 : run_valid + 1;
            if (i >= k - 1) {
                (*vals)[i - k + 1] = val;
                (*valid)[i - k + 1] = run_valid >= k ? 1 : 0;
            }
        }
    }
    void build(const int8_t* q, int nq, const Params& p) {
        compute(q, nq, p.mal, &aval, &avalid);
        compute(q, nq, p.msl, &sval, &svalid);
        ahash.resize(aval.size());
        for (size_t t = 0; t < aval.size(); ++t)
            ahash[t] = mix64(aval[t]);
    }
};

struct RefIndex {
    int n;
    std::vector<int8_t> fwd, rc;
    KmerIndex anchors[2];
    // Seed window values per strand position: the in-region seed search is
    // window-constrained to ~mrd+mqd reference positions, so a sequential
    // (SIMD) compare over this contiguous array beats any hash/CSR lookup
    // (and the CSR seed index is not needed at all). Invalid windows (N
    // runs) are stored as the sentinel ~0ull, impossible for 2*msl < 64.
    std::vector<uint64_t> svals[2];
    // Non-empty only when 2*msl >= 64 (sentinel ambiguous): explicit
    // validity mask checked during candidate collection.
    std::vector<uint8_t> svalid_wide[2];
    // Union of both strands' anchor blooms (hash mode): the common case in a
    // dissimilar pair is "anchor on neither strand" — screen it with one
    // probe instead of two.
    std::vector<uint64_t> anchor_bloom2;
    uint64_t anchor_bloom2_mask = 0;
    bool anchors_hashed = false;

    void build(const int8_t* seq, int len, const Params& p) {
        n = len;
        fwd.assign(seq, seq + len);
        rc.resize(len);
        for (int i = 0; i < len; ++i) {
            int8_t c = seq[len - 1 - i];
            rc[i] = c >= 4 ? 4 : (int8_t)(3 - c);
        }
        anchors[0].build(fwd.data(), len, p.mal);
        anchors[1].build(rc.data(), len, p.mal);
        for (int s = 0; s < 2; ++s) {
            std::vector<uint8_t> ok;
            QueryWindows::compute(s == 0 ? fwd.data() : rc.data(), len,
                                  p.msl, &svals[s], &ok);
            if (2 * p.msl < 64) {
                for (size_t t = 0; t < ok.size(); ++t)
                    if (!ok[t]) svals[s][t] = ~0ull;
                svalid_wide[s].clear();
            } else {
                svalid_wide[s] = std::move(ok);
            }
        }
        anchors_hashed = !anchors[0].flat;
        if (anchors_hashed &&
            anchors[0].bloom_mask == anchors[1].bloom_mask &&
            !anchors[0].bloom.empty()) {
            anchor_bloom2_mask = anchors[0].bloom_mask;
            anchor_bloom2.resize(anchors[0].bloom.size());
            for (size_t t = 0; t < anchor_bloom2.size(); ++t)
                anchor_bloom2[t] = anchors[0].bloom[t] | anchors[1].bloom[t];
        } else {
            anchor_bloom2.clear();
        }
    }

    // Anchor candidate slices on both strands with a single merged-bloom
    // screen; bit-equivalent to anchors[s].find(v).
    inline void find_anchors(uint64_t v, uint64_t hv,
                             PosSlice out[2]) const {
        if (!anchor_bloom2.empty()) {
            uint64_t b = (hv >> 17) & anchor_bloom2_mask;
            if (!(anchor_bloom2[b >> 6] & (1ull << (b & 63)))) {
                out[0] = out[1] = {nullptr, nullptr};
                return;
            }
            out[0] = anchors[0].find_nobloom(v, hv);
            out[1] = anchors[1].find_nobloom(v, hv);
            return;
        }
        out[0] = anchors[0].find(v);
        out[1] = anchors[1].find(v);
    }
    const int8_t* strand(int s) const { return s == 0 ? fwd.data()
                                                     : rc.data(); }
};


// Forward extension from an exact match of length klen at (qs, rs):
// exact part, then approximate with a sliding mismatch window of length aw
// (<= am mismatches), trimmed so the extension ends with a run of >= ar
// matches. Mirrors lz_parse_py._extend bit-for-bit.
static inline void extend(const int8_t* q, int nq, const int8_t* r, int nr,
                          int qs, int rs, int klen, const Params& p,
                          int32_t* total_len, int32_t* nt_match) {
    int i = qs + klen, j = rs + klen;
    // Exact part: 8 bases per word-compare; bit2 set <=> code 4 ('N').
    int lim = std::min(nq - i, nr - j);
    int t = 0;
    while (t + 8 <= lim) {
        uint64_t a, b;
        std::memcpy(&a, q + i + t, 8);
        std::memcpy(&b, r + j + t, 8);
        if (a == b && !(a & 0x0404040404040404ull)) { t += 8; continue; }
        break;
    }
    while (t < lim && q[i + t] == r[j + t] && q[i + t] < 4) ++t;
    i += t; j += t;
    int exact_len = i - qs;

    // Approximate part. Window = last aw mismatch flags as a bitmask; the
    // ar-run trim is tracked forward: cut = one past the end of the
    // rightmost run of >= ar consecutive matches.
    int run = 0, cut = 0, match_at_cut = 0, matches = 0, consumed = 0;
    if (p.aw < 64) {
        const uint64_t wmask = (p.aw <= 0) ? 0ull : ((1ull << p.aw) - 1);
        uint64_t w = 0;
        while (i < nq && j < nr) {
            bool is_match = (q[i] == r[j]) && q[i] < 4;
            w = ((w << 1) | (is_match ? 0ull : 1ull)) & wmask;
            if ((int)__builtin_popcountll(w) > p.am) break;
            ++consumed;
            if (is_match) {
                ++matches;
                if (++run >= p.ar) { cut = consumed; match_at_cut = matches; }
            } else run = 0;
            ++i; ++j;
        }
    } else {
        // aw does not fit a word: explicit flag deque.
        static thread_local std::vector<uint8_t> win;
        win.clear();
        int head = 0, mism = 0;
        while (i < nq && j < nr) {
            bool is_match = (q[i] == r[j]) && q[i] < 4;
            win.push_back(is_match ? 0 : 1);
            mism += win.back();
            if ((int)win.size() - head > p.aw) { mism -= win[head]; ++head; }
            if (mism > p.am) break;
            ++consumed;
            if (is_match) {
                ++matches;
                if (++run >= p.ar) { cut = consumed; match_at_cut = matches; }
            } else run = 0;
            ++i; ++j;
        }
    }
    *total_len = exact_len + cut;
    *nt_match = exact_len + match_at_cut;
}

// Mirrors lz_parse_py._best_candidate: longest factor; ties by
// |j - expected| when expected >= 0, else by smallest j.
static bool best_candidate(const int8_t* q, int nq, const int8_t* r, int nr,
                           int i, const int32_t* positions, int n_pos,
                           int klen, const Params& p, int64_t expected,
                           int32_t* out_j, int32_t* out_len,
                           int32_t* out_match) {
    bool have = false;
    int64_t best_len = -1, best_tie = 0;
    int32_t bj = 0, blen = 0, bmatch = 0;
    for (int t = 0; t < n_pos; ++t) {
        int32_t j = positions[t];
        int32_t total_len, nt_match;
        extend(q, nq, r, nr, i, j, klen, p, &total_len, &nt_match);
        int64_t tie = expected >= 0 ? std::llabs((int64_t)j - expected)
                                    : (int64_t)j;
        if (!have || total_len > best_len ||
            (total_len == best_len && tie < best_tie)) {
            have = true;
            best_len = total_len; best_tie = tie;
            bj = j; blen = total_len; bmatch = nt_match;
        }
    }
    if (!have) return false;
    *out_j = bj; *out_len = blen; *out_match = bmatch;
    return true;
}

struct Region {
    int strand = -1;
    std::vector<Factor> factors;
    int64_t nt_match = 0;
    int32_t qlimit = -1;
};

class Parser {
public:
    Parser(const RefIndex* ri, const Params& p) : ri_(ri), p_(p) {}

    // qw: precomputed window values of q (may be null -> computed locally).
    void parse(const int8_t* q, int nq, const QueryWindows* qw,
               std::vector<Alignment>* out) {
        q_ = q; nq_ = nq;
        out_ = out;
        prev_factor_end_ = -1;
        region_.strand = -1;
        QueryWindows local;
        if (!qw) { local.build(q, nq, p_); qw = &local; }
        const uint64_t* aval = qw->aval.data();
        const uint64_t* ahash = qw->ahash.data();
        const uint64_t* sval = qw->sval.data();
        const uint8_t* avalid = qw->avalid.data();
        const uint8_t* svalid = qw->svalid.data();
        const int n_aw = (int)qw->aval.size();
        const int n_sw = (int)qw->sval.size();

        int i = 0;
        while (i < nq_) {
            bool have_factor = false;
            int f_strand = 0; int32_t f_j = 0, f_len = 0, f_match = 0;
            if (region_.strand >= 0) {
                int strand = region_.strand;
                const Factor& last = region_.factors.back();
                if (i - last.qe - 1 > p_.mqd) {
                    close_region();
                } else if (i < n_sw && svalid[i]) {
                    // Window-constrained seed search: scan the contiguous
                    // per-position seed-value array of the reference strand
                    // over [lo_v, hi_v) — candidates ascending, exactly the
                    // set the CSR lookup + lower_bound used to produce.
                    int64_t expected = last.re + (i - last.qe);
                    int64_t lo_v = last.re + 1 - p_.seed_back;
                    int64_t width = p_.mrd +
                        (p_.seed_window_qscale ? (i - last.qe) : 0);
                    int64_t hi_v = last.re + 1 + width;
                    const auto& rsv = ri_->svals[strand];
                    const auto& rsok = ri_->svalid_wide[strand];
                    int64_t lo = std::max<int64_t>(lo_v, 0);
                    int64_t hi = std::min<int64_t>(hi_v,
                                                   (int64_t)rsv.size());
                    const uint64_t want = sval[i];
                    // Vectorizable any-hit scan first; collect only on hit.
                    const uint64_t* base = rsv.data();
                    uint64_t any = 0;
                    for (int64_t t = lo; t < hi; ++t)
                        any |= (uint64_t)(base[t] == want);
                    cand_.clear();
                    if (any) {
                        for (int64_t t = lo; t < hi; ++t)
                            if (base[t] == want &&
                                (rsok.empty() || rsok[t]))
                                cand_.push_back((int32_t)t);
                    }
                    if (!cand_.empty()) {
                        if (best_candidate(
                                q_, nq_, ri_->strand(strand), ri_->n,
                                i, cand_.data(), (int)cand_.size(),
                                p_.msl, p_,
                                expected, &f_j, &f_len, &f_match)) {
                            have_factor = true;
                            f_strand = strand;
                        }
                    }
                }
            }
            if (!have_factor && i < n_aw && avalid[i] &&
                (region_.strand < 0 || p_.anchor_in_region)) {
                // Anchor: consider both strands, longest extension wins.
                bool have = false;
                int b_strand = 0; int32_t b_j = 0, b_len = 0, b_match = 0;
                PosSlice slices[2];
                ri_->find_anchors(aval[i], ahash[i], slices);
                for (int strand = 0; strand < 2; ++strand) {
                    PosSlice s = slices[strand];
                    if (s.begin == s.end) continue;
                    int32_t j, len, match;
                    if (best_candidate(q_, nq_, ri_->strand(strand),
                                       ri_->n, i, s.begin,
                                       (int)(s.end - s.begin), p_.mal, p_,
                                       -1, &j, &len, &match)) {
                        if (!have || len > b_len) {
                            have = true;
                            b_strand = strand; b_j = j; b_len = len;
                            b_match = match;
                        }
                    }
                }
                if (have) {
                    if (region_.strand < 0) {
                        have_factor = true;
                    } else {
                        bool reachable = false;
                        if (b_strand == region_.strand) {
                            const Factor& last = region_.factors.back();
                            int64_t gap_r = (int64_t)b_j - last.re - 1;
                            int64_t width = p_.mrd +
                                (p_.seed_window_qscale ? (i - last.qe) : 0);
                            reachable = -(int64_t)p_.seed_back <= gap_r &&
                                        gap_r <= width;
                        }
                        if (reachable) {
                            have_factor = true;
                        } else if (p_.anchor_in_region &&
                                   b_len >= p_.anchor_preempt_len) {
                            close_region();
                            have_factor = true;
                        }
                    }
                    if (have_factor) {
                        f_strand = b_strand; f_j = b_j; f_len = b_len;
                        f_match = b_match;
                    }
                }
            }
            if (!have_factor) {
                if (region_.strand >= 0 &&
                    i - region_.factors.back().qe - 1 >= p_.mqd)
                    close_region();
                ++i;
                continue;
            }
            if (region_.strand < 0) {
                region_.strand = f_strand;
                region_.factors.clear();
                region_.nt_match = 0;
                region_.qlimit = prev_factor_end_;
            }
            Factor f{i, i + f_len - 1, f_j, f_j + f_len - 1};
            region_.factors.push_back(f);
            region_.nt_match += f_match;
            i = f.qe + 1;
        }
        close_region();
    }

private:
    int gap_matches(const int8_t* r, int nr, int qe1, int re1, int qs2,
                    int rs2) {
        int gap = qs2 - qe1 - 1;
        if (gap <= 0 || p_.gap_policy == 0) return 0;
        if (p_.gap_policy == 1) {             // prev diagonal
            int cnt = 0;
            for (int t = 0; t < gap; ++t) {
                int rj = re1 + 1 + t;
                if (rj >= nr) break;
                int8_t qc = q_[qe1 + 1 + t];
                cnt += (qc == r[rj]) && qc < 4;
            }
            return cnt;
        }
        if (p_.gap_policy == 2) {             // next diagonal
            int cnt = 0;
            for (int t = 0; t < gap; ++t) {
                int rj = rs2 - gap + t;
                if (rj < 0) continue;
                int8_t qc = q_[qe1 + 1 + t];
                cnt += (qc == r[rj]) && qc < 4;
            }
            return cnt;
        }
        // split: best prefix on prev diagonal + suffix on next diagonal.
        static thread_local std::vector<uint8_t> prev_cmp, next_cmp;
        prev_cmp.assign(gap, 0);
        next_cmp.assign(gap, 0);
        for (int t = 0; t < gap; ++t) {
            int qi = qe1 + 1 + t, rj = re1 + 1 + t;
            if (rj < nr && q_[qi] == r[rj] && q_[qi] < 4) prev_cmp[t] = 1;
        }
        for (int t = 0; t < gap; ++t) {
            int qi = qe1 + 1 + t, rj = rs2 - gap + t;
            if (rj >= 0 && q_[qi] == r[rj] && q_[qi] < 4) next_cmp[t] = 1;
        }
        static thread_local std::vector<int> suffix;
        suffix.assign(gap + 1, 0);
        for (int t = gap - 1; t >= 0; --t)
            suffix[t] = suffix[t + 1] + next_cmp[t];
        int best = suffix[0], pc = 0;
        for (int s = 1; s <= gap; ++s) {
            pc += prev_cmp[s - 1];
            if (pc + suffix[s] > best) best = pc + suffix[s];
        }
        return best;
    }

    // Backward approximate extension from (qs-1, rs-1) down to qlimit
    // (exclusive); same window + ar-run trim rules as forward.
    void back_extend(const int8_t* r, int qs, int rs, int qlimit,
                     int32_t* ext_len, int32_t* ext_match) {
        int run = 0, cut = 0, match_at_cut = 0, matches = 0, consumed = 0;
        int i = qs - 1, j = rs - 1;
        if (p_.aw < 64) {
            const uint64_t wmask = (p_.aw <= 0) ? 0ull
                                                : ((1ull << p_.aw) - 1);
            uint64_t w = 0;
            while (i > qlimit && j >= 0) {
                bool is_match = (q_[i] == r[j]) && q_[i] < 4;
                w = ((w << 1) | (is_match ? 0ull : 1ull)) & wmask;
                if ((int)__builtin_popcountll(w) > p_.am) break;
                ++consumed;
                if (is_match) {
                    ++matches;
                    if (++run >= p_.ar) { cut = consumed;
                                          match_at_cut = matches; }
                } else run = 0;
                --i; --j;
            }
        } else {
            static thread_local std::vector<uint8_t> win;
            win.clear();
            int head = 0, mism = 0;
            while (i > qlimit && j >= 0) {
                bool is_match = (q_[i] == r[j]) && q_[i] < 4;
                win.push_back(is_match ? 0 : 1);
                mism += win.back();
                if ((int)win.size() - head > p_.aw) { mism -= win[head];
                                                      ++head; }
                if (mism > p_.am) break;
                ++consumed;
                if (is_match) {
                    ++matches;
                    if (++run >= p_.ar) { cut = consumed;
                                          match_at_cut = matches; }
                } else run = 0;
                --i; --j;
            }
        }
        *ext_len = cut;
        *ext_match = match_at_cut;
    }

    void close_region() {
        if (region_.strand < 0) return;
        const int strand = region_.strand;
        const int8_t* r = ri_->strand(strand);
        const int nr = ri_->n;
        auto& factors = region_.factors;
        int qs = factors.front().qs;
        int rs = factors.front().rs;
        int64_t nt_match = region_.nt_match;
        for (size_t k = 0; k + 1 < factors.size(); ++k)
            nt_match += gap_matches(r, nr, factors[k].qe, factors[k].re,
                                    factors[k + 1].qs, factors[k + 1].rs);
        if (p_.region_back_ext) {
            int32_t ext_len, ext_match;
            back_extend(r, qs, rs, region_.qlimit, &ext_len, &ext_match);
            qs -= ext_len;
            rs -= ext_len;
            nt_match += ext_match;
        }
        int qe = factors.back().qe;
        int re = factors.back().re;
        int alnlen = qe - qs + 1;
        if (alnlen >= p_.reg) {
            int32_t rstart, rend;
            if (strand == 0) { rstart = rs; rend = re; }
            else { rstart = nr - 1 - rs; rend = nr - 1 - re; }
            out_->push_back(Alignment{qs, qe, rstart, rend,
                                      (int32_t)nt_match,
                                      (int32_t)(alnlen - nt_match),
                                      strand == 0 ? 1 : -1});
            prev_factor_end_ = factors.back().qe;
        }
        region_.strand = -1;
    }

    const RefIndex* ri_;
    Params p_;
    const int8_t* q_ = nullptr;
    int nq_ = 0;
    std::vector<Alignment>* out_ = nullptr;
    int prev_factor_end_ = -1;
    Region region_;
    std::vector<int32_t> cand_;   // seed-candidate scratch (reused)
};

}  // namespace

extern "C" {

void* lz_index_build(const int8_t* seq, int32_t len, const Params* p) {
    auto* ri = new RefIndex();
    ri->build(seq, len, *p);
    return ri;
}

void lz_index_free(void* handle) {
    delete static_cast<RefIndex*>(handle);
}

// Parse query against an indexed reference. Returns number of alignments;
// writes up to max_out alignments (7 int32 each: qs,qe,rs,re,match,mism,
// strand) into out.
int32_t lz_parse(void* index_handle, const int8_t* q, int32_t nq,
                 const Params* p, int32_t* out, int32_t max_out) {
    auto* ri = static_cast<RefIndex*>(index_handle);
    std::vector<Alignment> alns;
    Parser parser(ri, *p);
    parser.parse(q, nq, nullptr, &alns);
    int32_t n = (int32_t)alns.size();
    int32_t n_write = std::min(n, max_out);
    for (int32_t k = 0; k < n_write; ++k) {
        out[k * 7 + 0] = alns[k].qstart;
        out[k * 7 + 1] = alns[k].qend;
        out[k * 7 + 2] = alns[k].rstart;
        out[k * 7 + 3] = alns[k].rend;
        out[k * 7 + 4] = alns[k].nt_match;
        out[k * 7 + 5] = alns[k].nt_mismatch;
        out[k * 7 + 6] = alns[k].strand;
    }
    return n;
}

// ---------------------------------------------------------------------------
// Batch all-vs-all API: thread pool over candidate pairs.
//
// This is the lz-ani analog of the reference's `-t` multithreading
// (reference vclust.py:1058-1181): references are indexed once (and query
// window values precomputed once per genome), then a pool of workers pulls
// pair indices from an atomic counter. Results are stored by pair index, so
// the output is bit-deterministic regardless of thread scheduling (the
// md5-stability property pinned by the reference's large-data CI,
// SURVEY.md section 4.3).
// ---------------------------------------------------------------------------

struct BatchResult {
    int64_t n_pairs = 0;
    // Per pair: n_alns(q=j,r=i), match_ji, alnlen_ji,
    //           n_alns(q=i,r=j), match_ij, alnlen_ij.
    std::vector<int64_t> agg;
    // Alignment lists, 2 slots per pair (direction ji then ij); empty when
    // keep_alignments was false.
    std::vector<std::vector<Alignment>> alns;
    bool kept = false;
};

static void sum_alns(const std::vector<Alignment>& v, int64_t* n,
                     int64_t* match, int64_t* alnlen) {
    *n = (int64_t)v.size();
    int64_t m = 0, l = 0;
    for (const auto& a : v) {
        m += a.nt_match;
        l += a.nt_match + a.nt_mismatch;
    }
    *match = m;
    *alnlen = l;
}

void* lz_all2all(const int8_t* codes, const int64_t* offsets,
                 int32_t n_genomes, const int32_t* pairs, int64_t n_pairs,
                 const Params* p, int32_t n_threads,
                 int32_t keep_alignments) {
    auto* res = new BatchResult();
    res->n_pairs = n_pairs;
    res->agg.assign((size_t)n_pairs * 6, 0);
    res->kept = keep_alignments != 0;
    res->alns.resize((size_t)n_pairs * 2);

    if (n_threads < 1) n_threads = 1;
    int hw = (int)std::thread::hardware_concurrency();
    if (hw > 0 && n_threads > hw) n_threads = hw;

    // Index every genome that appears in some pair (both directions use
    // both genomes as reference) and precompute its query windows.
    std::vector<uint8_t> needed(n_genomes, 0);
    std::vector<int32_t> to_index;
    for (int64_t k = 0; k < n_pairs; ++k) {
        for (int s = 0; s < 2; ++s) {
            int32_t g = pairs[2 * k + s];
            if (!needed[g]) { needed[g] = 1; to_index.push_back(g); }
        }
    }
    std::vector<std::unique_ptr<RefIndex>> idx(n_genomes);
    std::vector<std::unique_ptr<QueryWindows>> qwin(n_genomes);
    {
        std::atomic<size_t> next(0);
        auto worker = [&]() {
            for (;;) {
                size_t t = next.fetch_add(1);
                if (t >= to_index.size()) break;
                int32_t g = to_index[t];
                const int8_t* seq = codes + offsets[g];
                int len = (int)(offsets[g + 1] - offsets[g]);
                auto ri = std::make_unique<RefIndex>();
                ri->build(seq, len, *p);
                idx[g] = std::move(ri);
                auto qw = std::make_unique<QueryWindows>();
                qw->build(seq, len, *p);
                qwin[g] = std::move(qw);
            }
        };
        std::vector<std::thread> pool;
        for (int t = 1; t < n_threads; ++t) pool.emplace_back(worker);
        worker();
        for (auto& th : pool) th.join();
    }

    {
        // Directed parse tasks ordered by REFERENCE genome, so consecutive
        // tasks reuse a hot index (the parse streams the whole anchor table;
        // switching references every task thrashes LLC). Each task writes
        // only its own slot, so the output stays bit-deterministic at any
        // thread count.
        struct Task { int32_t ref, query; int64_t slot; };
        std::vector<Task> tasks;
        tasks.reserve((size_t)n_pairs * 2);
        for (int64_t k = 0; k < n_pairs; ++k) {
            int32_t i = pairs[2 * k], j = pairs[2 * k + 1];
            tasks.push_back(Task{i, j, 2 * k});        // direction q=j, r=i
            tasks.push_back(Task{j, i, 2 * k + 1});    // direction q=i, r=j
        }
        std::stable_sort(tasks.begin(), tasks.end(),
                         [](const Task& a, const Task& b) {
                             return a.ref < b.ref;
                         });
        std::vector<std::vector<Alignment>>& out = res->alns;
        std::atomic<int64_t> next(0);
        const int64_t n_tasks = (int64_t)tasks.size();
        auto worker = [&]() {
            std::vector<Alignment> a;
            std::unique_ptr<Parser> parser;
            int32_t cur_ref = -1;
            for (;;) {
                int64_t t = next.fetch_add(1);
                if (t >= n_tasks) break;
                const Task& tk = tasks[t];
                if (tk.ref != cur_ref) {
                    parser = std::make_unique<Parser>(idx[tk.ref].get(), *p);
                    cur_ref = tk.ref;
                }
                a.clear();
                parser->parse(codes + offsets[tk.query],
                              (int)(offsets[tk.query + 1]
                                    - offsets[tk.query]),
                              qwin[tk.query].get(), &a);
                int64_t* agg = &res->agg[(size_t)(tk.slot / 2) * 6
                                         + (tk.slot % 2) * 3];
                sum_alns(a, agg, agg + 1, agg + 2);
                if (res->kept) out[(size_t)tk.slot] = a;
            }
        };
        std::vector<std::thread> pool;
        for (int t = 1; t < n_threads; ++t) pool.emplace_back(worker);
        worker();
        for (auto& th : pool) th.join();
    }
    return res;
}

void lz_all2all_aggregates(void* handle, int64_t* out) {
    auto* res = static_cast<BatchResult*>(handle);
    std::memcpy(out, res->agg.data(), res->agg.size() * sizeof(int64_t));
}

// Total alignments kept across all pairs/directions.
int64_t lz_all2all_total_alns(void* handle) {
    auto* res = static_cast<BatchResult*>(handle);
    int64_t n = 0;
    for (const auto& v : res->alns) n += (int64_t)v.size();
    return n;
}

// Copy all alignments, concatenated in (pair, direction ji, direction ij)
// order, 7 int32 per alignment (qs,qe,rs,re,match,mism,strand).
void lz_all2all_copy_alns(void* handle, int32_t* out) {
    auto* res = static_cast<BatchResult*>(handle);
    size_t w = 0;
    for (const auto& v : res->alns) {
        for (const auto& a : v) {
            out[w + 0] = a.qstart; out[w + 1] = a.qend;
            out[w + 2] = a.rstart; out[w + 3] = a.rend;
            out[w + 4] = a.nt_match; out[w + 5] = a.nt_mismatch;
            out[w + 6] = a.strand;
            w += 7;
        }
    }
}

void lz_all2all_free(void* handle) {
    delete static_cast<BatchResult*>(handle);
}

}  // extern "C"
