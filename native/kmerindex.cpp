// Native index-build engine for the prefilter stage.
//
// The kmer-db `build` analog (reference contract vclust.py:953-964;
// SURVEY.md section 2.4.1): turns per-genome sorted distinct k-mer arrays
// into the pattern-compressed (pattern x genome) COO consumed by the MXU
// all2all matmul (vclust_tpu/ops/prefilter.py). A "pattern" is a distinct
// set of genomes sharing a k-mer; counting each pattern once with a
// multiplicity weight is the trick that makes all-vs-all counting cheap.
//
// Pipeline (multithreaded, deterministic):
//   1. Partition all (k-mer, genome) incidence entries by the k-mer's top
//      PART_BITS bits into buckets, stable in genome order (per-thread
//      histogram counting sort over contiguous genome ranges).
//   2. Per bucket: LSD radix sort by the remaining low k-mer bytes (stable,
//      so genome order inside each k-mer group is preserved).
//   3. Scan groups (same k-mer, >= 2 genomes); hash each group's genome-id
//      sequence with two independent position-mixed 64-bit hashes.
//   4. Serial bucket-order dedup into a 128-bit-keyed hash map: first
//      occurrence defines the pattern's id and representative genome list;
//      later occurrences only bump the weight. Bucket order is the global
//      k-mer sort order, so output is independent of thread count.
//
// Exposed via ctypes (vclust_tpu/ops/kmer_native.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr int PART_BITS = 16;
constexpr int N_BUCKETS = 1 << PART_BITS;

struct Entry {
    uint64_t k;
    int32_t g;
};

static inline uint64_t mix64(uint64_t x) {
    x ^= x >> 30;
    x *= 0xBF58476D1CE4E5B9ULL;
    x ^= x >> 27;
    x *= 0x94D049BB133111EBULL;
    x ^= x >> 31;
    return x;
}

struct Key128 {
    uint64_t h1, h2;
    bool operator==(const Key128& o) const {
        return h1 == o.h1 && h2 == o.h2;
    }
};

struct Key128Hash {
    size_t operator()(const Key128& k) const {
        return static_cast<size_t>(k.h1 ^ (k.h2 * 0x9E3779B97F4A7C15ULL));
    }
};

struct GroupRef {           // locally-distinct pattern inside a bucket
    int64_t start;          // offset into the bucket's sorted entries
    int32_t len;
    uint64_t h1, h2;
    int64_t weight;         // in-bucket multiplicity
};

struct Handle {
    std::vector<int32_t> gids;      // deduplicated pattern gid sequences
    std::vector<int32_t> lens;      // per-pattern group length
    std::vector<int64_t> weights;   // per-pattern multiplicity
    int64_t n_groups = 0;           // shared groups before dedup
};

static void radix_sort_bucket(Entry* data, int64_t n, Entry* tmp,
                              int low_bytes) {
    // LSD byte-radix over the low `low_bytes` bytes of k. Stable.
    int64_t hist[256];
    Entry* src = data;
    Entry* dst = tmp;
    for (int b = 0; b < low_bytes; ++b) {
        std::memset(hist, 0, sizeof(hist));
        const int shift = 8 * b;
        for (int64_t i = 0; i < n; ++i)
            ++hist[(src[i].k >> shift) & 0xFF];
        if (hist[(src[0].k >> shift) & 0xFF] == n) continue;  // all equal
        int64_t sum = 0;
        for (int d = 0; d < 256; ++d) {
            int64_t c = hist[d];
            hist[d] = sum;
            sum += c;
        }
        for (int64_t i = 0; i < n; ++i)
            dst[hist[(src[i].k >> shift) & 0xFF]++] = src[i];
        std::swap(src, dst);
    }
    if (src != data) std::memcpy(data, src, n * sizeof(Entry));
}

}  // namespace

extern "C" {

// Build the pattern-compressed index.
//   kmer_ptrs[g] : sorted distinct uint64 k-mers of genome g
//   set_lens[g]  : their count
// Outputs (via out_*): #shared groups, #distinct patterns, total entries of
// the deduplicated COO. Returns an opaque handle for kidx_fill/kidx_free,
// or nullptr on allocation failure.
void* kidx_build(const uint64_t** kmer_ptrs, const int64_t* set_lens,
                 int32_t n_genomes, int32_t n_threads,
                 int64_t* out_n_groups, int64_t* out_n_patterns,
                 int64_t* out_nnz_d) {
    if (n_threads < 1) n_threads = 1;
    int64_t nnz = 0;
    for (int32_t g = 0; g < n_genomes; ++g) nnz += set_lens[g];

    auto* h = new Handle();
    if (nnz == 0) {
        *out_n_groups = 0;
        *out_n_patterns = 0;
        *out_nnz_d = 0;
        return h;
    }

    // ---- 1. stable partition by the top PART_BITS *occupied* bits ----
    // K-mer values are 2k-bit packed integers (e.g. 50 bits for k=25), so
    // partitioning by the top bits of the full 64-bit word would leave
    // nearly every entry in a handful of buckets and collapse the sort
    // parallelism; the shift adapts to the data's actual bit width (the
    // per-genome arrays are sorted, so the global max is O(n_genomes)).
    // Thread t owns a contiguous genome range; per-(bucket, thread) offsets
    // keep entries within a bucket ordered by genome then position.
    std::vector<int64_t> g_start(n_genomes + 1, 0);
    for (int32_t g = 0; g < n_genomes; ++g)
        g_start[g + 1] = g_start[g] + set_lens[g];
    std::vector<int32_t> t_lo(n_threads + 1, n_genomes);
    t_lo[0] = 0;
    for (int t = 1; t < n_threads; ++t) {
        int64_t target = nnz * t / n_threads;
        int32_t g = t_lo[t - 1];
        while (g < n_genomes && g_start[g + 1] < target) ++g;
        t_lo[t] = g;
    }
    uint64_t kmax = 0;
    for (int32_t g = 0; g < n_genomes; ++g)
        if (set_lens[g] > 0 && kmer_ptrs[g][set_lens[g] - 1] > kmax)
            kmax = kmer_ptrs[g][set_lens[g] - 1];
    int kbits = 1;
    while (kbits < 64 && (kmax >> kbits) != 0) ++kbits;
    const int shift = kbits > PART_BITS ? kbits - PART_BITS : 0;
    std::vector<int64_t> hist(static_cast<int64_t>(N_BUCKETS) * n_threads, 0);
    auto count_fn = [&](int t) {
        int64_t* hh = hist.data() + static_cast<int64_t>(t) * N_BUCKETS;
        for (int32_t g = t_lo[t]; g < t_lo[t + 1]; ++g) {
            const uint64_t* ks = kmer_ptrs[g];
            const int64_t m = set_lens[g];
            for (int64_t i = 0; i < m; ++i) ++hh[ks[i] >> shift];
        }
    };
    {
        std::vector<std::thread> ths;
        for (int t = 1; t < n_threads; ++t) ths.emplace_back(count_fn, t);
        count_fn(0);
        for (auto& th : ths) th.join();
    }
    // offsets in (bucket, thread) order; bucket_start for the scan phase
    std::vector<int64_t> bucket_start(N_BUCKETS + 1, 0);
    {
        int64_t sum = 0;
        for (int b = 0; b < N_BUCKETS; ++b) {
            bucket_start[b] = sum;
            for (int t = 0; t < n_threads; ++t) {
                int64_t c = hist[static_cast<int64_t>(t) * N_BUCKETS + b];
                hist[static_cast<int64_t>(t) * N_BUCKETS + b] = sum;
                sum += c;
            }
        }
        bucket_start[N_BUCKETS] = sum;
    }
    std::vector<Entry> arena;
    try {
        arena.resize(nnz);
    } catch (...) {
        delete h;
        return nullptr;
    }
    auto scatter_fn = [&](int t) {
        int64_t* off = hist.data() + static_cast<int64_t>(t) * N_BUCKETS;
        for (int32_t g = t_lo[t]; g < t_lo[t + 1]; ++g) {
            const uint64_t* ks = kmer_ptrs[g];
            const int64_t m = set_lens[g];
            for (int64_t i = 0; i < m; ++i) {
                Entry& e = arena[off[ks[i] >> shift]++];
                e.k = ks[i];
                e.g = g;
            }
        }
    };
    {
        std::vector<std::thread> ths;
        for (int t = 1; t < n_threads; ++t) ths.emplace_back(scatter_fn, t);
        scatter_fn(0);
        for (auto& th : ths) th.join();
    }

    // ---- 2+3. per-bucket radix sort + group scan + LOCAL dedup ----
    // Each bucket deduplicates its own patterns into a local table while
    // sorted entries are cache-hot; the serial global merge then only sees
    // per-bucket *distinct* patterns (orders of magnitude fewer at real
    // dedup ratios). First-occurrence order inside buckets + bucket order
    // keep the output independent of thread count.
    const int low_bytes = (shift + 7) / 8;
    std::vector<std::vector<GroupRef>> bucket_groups(N_BUCKETS);
    std::vector<int64_t> bucket_ngroups(N_BUCKETS, 0);
    std::atomic<int> next_bucket{0};
    auto sort_fn = [&]() {
        std::vector<Entry> tmp;
        std::unordered_map<Key128, int64_t, Key128Hash> local;
        for (;;) {
            int b = next_bucket.fetch_add(1);
            if (b >= N_BUCKETS) break;
            int64_t lo = bucket_start[b], hi = bucket_start[b + 1];
            int64_t n = hi - lo;
            if (n <= 0) continue;
            if (static_cast<int64_t>(tmp.size()) < n) tmp.resize(n);
            radix_sort_bucket(arena.data() + lo, n, tmp.data(), low_bytes);
            // group scan with in-bucket dedup
            local.clear();
            auto& out = bucket_groups[b];
            int64_t s = lo;
            int64_t ngroups = 0;
            for (int64_t i = lo + 1; i <= hi; ++i) {
                if (i == hi || arena[i].k != arena[s].k) {
                    int64_t len = i - s;
                    if (len >= 2) {
                        ++ngroups;
                        uint64_t h1 = 0, h2 = 0;
                        for (int64_t j = 0; j < len; ++j) {
                            uint64_t gv =
                                static_cast<uint64_t>(arena[s + j].g);
                            uint64_t pos = static_cast<uint64_t>(j);
                            h1 += mix64(gv + (pos + 1) *
                                        0x9E3779B97F4A7C15ULL);
                            h2 += mix64(gv ^ ((pos + 7) *
                                        0xC2B2AE3D27D4EB4FULL));
                        }
                        Key128 key{h1 ^ static_cast<uint64_t>(len), h2};
                        auto it = local.find(key);
                        if (it == local.end()) {
                            local.emplace(
                                key, static_cast<int64_t>(out.size()));
                            out.push_back(GroupRef{
                                s, static_cast<int32_t>(len), h1, h2, 1});
                        } else {
                            ++out[it->second].weight;
                        }
                    }
                    s = i;
                }
            }
            bucket_ngroups[b] = ngroups;
        }
    };
    {
        std::vector<std::thread> ths;
        for (int t = 1; t < n_threads; ++t) ths.emplace_back(sort_fn);
        sort_fn();
        for (auto& th : ths) th.join();
    }

    // ---- 4. serial bucket-order global merge (deterministic) ----
    std::unordered_map<Key128, int64_t, Key128Hash> pat;
    int64_t n_groups = 0;
    for (int b = 0; b < N_BUCKETS; ++b) {
        n_groups += bucket_ngroups[b];
        for (const GroupRef& gr : bucket_groups[b]) {
            Key128 key{gr.h1 ^ static_cast<uint64_t>(gr.len), gr.h2};
            auto it = pat.find(key);
            if (it == pat.end()) {
                pat.emplace(key, static_cast<int64_t>(h->lens.size()));
                h->lens.push_back(gr.len);
                h->weights.push_back(gr.weight);
                const Entry* e = arena.data() + gr.start;
                for (int32_t j = 0; j < gr.len; ++j)
                    h->gids.push_back(e[j].g);
            } else {
                h->weights[it->second] += gr.weight;
            }
        }
    }
    h->n_groups = n_groups;
    *out_n_groups = n_groups;
    *out_n_patterns = static_cast<int64_t>(h->lens.size());
    *out_nnz_d = static_cast<int64_t>(h->gids.size());
    return h;
}

void kidx_fill(void* handle, int32_t* gids, int32_t* lens, int64_t* weights) {
    auto* h = static_cast<Handle*>(handle);
    std::memcpy(gids, h->gids.data(), h->gids.size() * sizeof(int32_t));
    std::memcpy(lens, h->lens.data(), h->lens.size() * sizeof(int32_t));
    std::memcpy(weights, h->weights.data(),
                h->weights.size() * sizeof(int64_t));
}

void kidx_free(void* handle) {
    delete static_cast<Handle*>(handle);
}

}  // extern "C"
