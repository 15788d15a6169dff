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
//      PART_BITS occupied bits into buckets, stable in genome order
//      (per-thread histogram counting sort over contiguous genome ranges).
//      When the remaining low bits fit in 32 (k <= 25 with the default
//      2-bit packing), entries are packed ((klow << 32) | gid) into one
//      uint64 — half the arena traffic of the struct path.
//   2. Per bucket: LSD radix sort by the remaining low k-mer bytes (stable,
//      so genome order inside each k-mer group is preserved).
//   3. Scan groups (same k-mer, >= 2 genomes); hash each group's genome-id
//      sequence with a chained 128-bit mix (one mix per two entries).
//   4. In-bucket dedup through an epoch-stamped open-addressing table;
//      serial bucket-order global merge. First-occurrence order inside
//      buckets + bucket order keep the output independent of thread count.
//
// Exposed via ctypes (vclust_tpu/ops/kmer_native.py).

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr int PART_BITS = 16;
constexpr int N_BUCKETS = 1 << PART_BITS;

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

static double now_s() {
    return std::chrono::duration<double>(
        std::chrono::steady_clock::now().time_since_epoch()).count();
}

static bool profile_on() {
    const char* e = std::getenv("VCLUST_KIDX_PROFILE");
    return e && e[0] == '1';
}

// Entry representations: packed uint64 ((klow << 32) | gid) when the
// low key bits fit 32; 16-byte struct otherwise. Radix passes sort by the
// key bytes only, so the packed form starts its digits at byte 4.
struct EntryPacked {
    uint64_t v;
    static EntryPacked make(uint64_t klow, int32_t g) {
        return EntryPacked{(klow << 32) |
                           static_cast<uint32_t>(g)};
    }
    uint64_t key() const { return v >> 32; }
    int32_t gid() const { return static_cast<int32_t>(
        static_cast<uint32_t>(v)); }
};

struct EntryWide {
    uint64_t k;
    int32_t g;
    static EntryWide make(uint64_t klow, int32_t g) {
        return EntryWide{klow, g};
    }
    uint64_t key() const { return k; }
    int32_t gid() const { return g; }
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

template <typename E>
static void radix_sort_bucket(E* data, int64_t n, E* tmp, int low_bytes) {
    // LSD byte-radix over the low `low_bytes` key bytes. Stable.
    int64_t hist[256];
    E* src = data;
    E* dst = tmp;
    for (int b = 0; b < low_bytes; ++b) {
        std::memset(hist, 0, sizeof(hist));
        const int shift = 8 * b;
        auto digit = [shift](const E& e) {
            return (e.key() >> shift) & 0xFF;
        };
        for (int64_t i = 0; i < n; ++i) ++hist[digit(src[i])];
        if (hist[digit(src[0])] == n) continue;  // all equal
        int64_t sum = 0;
        for (int d = 0; d < 256; ++d) {
            int64_t c = hist[d];
            hist[d] = sum;
            sum += c;
        }
        for (int64_t i = 0; i < n; ++i) dst[hist[digit(src[i])]++] = src[i];
        std::swap(src, dst);
    }
    if (src != data) std::memcpy(data, src, n * sizeof(E));
}

template <typename E>
static bool build_impl(const uint64_t** kmer_ptrs, const int64_t* set_lens,
                       int32_t n_genomes, int n_threads, int shift,
                       int64_t nnz, const std::vector<int32_t>& t_lo,
                       Handle* h) {
    const bool prof = profile_on();
    double t0 = now_s();
    const uint64_t low_mask = shift >= 64 ? ~0ULL : ((1ULL << shift) - 1);
    std::vector<int64_t> hist(static_cast<int64_t>(N_BUCKETS) * n_threads,
                              0);
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
    std::vector<E> arena;
    try {
        arena.resize(nnz);
    } catch (...) {
        return false;
    }
    auto scatter_fn = [&](int t) {
        int64_t* off = hist.data() + static_cast<int64_t>(t) * N_BUCKETS;
        for (int32_t g = t_lo[t]; g < t_lo[t + 1]; ++g) {
            const uint64_t* ks = kmer_ptrs[g];
            const int64_t m = set_lens[g];
            for (int64_t i = 0; i < m; ++i)
                arena[off[ks[i] >> shift]++] =
                    E::make(ks[i] & low_mask, g);
        }
    };
    {
        std::vector<std::thread> ths;
        for (int t = 1; t < n_threads; ++t) ths.emplace_back(scatter_fn, t);
        scatter_fn(0);
        for (auto& th : ths) th.join();
    }
    if (prof) {
        std::fprintf(stderr, "[kidx] partition %.2fs\n", now_s() - t0);
        t0 = now_s();
    }

    const int low_bytes = (shift + 7) / 8;
    std::vector<std::vector<GroupRef>> bucket_groups(N_BUCKETS);
    std::vector<int64_t> bucket_ngroups(N_BUCKETS, 0);
    std::atomic<int> next_bucket{0};
    std::atomic<long> sort_ns{0}, scan_ns{0};
    auto sort_fn = [&]() {
        std::vector<E> tmp;
        // Epoch-stamped open-addressing table for in-bucket pattern dedup:
        // no per-bucket clear (the epoch invalidates old entries) and no
        // node allocation.
        struct Slot { uint64_t h1, h2; int32_t idx; uint32_t epoch; };
        std::vector<Slot> table(1 << 13);
        uint32_t epoch = 0;
        for (;;) {
            int b = next_bucket.fetch_add(1);
            if (b >= N_BUCKETS) break;
            int64_t lo = bucket_start[b], hi = bucket_start[b + 1];
            int64_t n = hi - lo;
            if (n <= 0) continue;
            double ts = prof ? now_s() : 0;
            if (static_cast<int64_t>(tmp.size()) < n) tmp.resize(n);
            radix_sort_bucket(arena.data() + lo, n, tmp.data(), low_bytes);
            if (prof) {
                double tm = now_s();
                sort_ns += long((tm - ts) * 1e9);
                ts = tm;
            }
            ++epoch;
            if (static_cast<int64_t>(table.size()) < n) {
                size_t want = 1;
                while (static_cast<int64_t>(want) < 2 * n) want <<= 1;
                table.assign(want, Slot{});
                epoch = 1;
            }
            const uint64_t mask = table.size() - 1;
            auto& out = bucket_groups[b];
            int64_t s = lo;
            int64_t ngroups = 0;
            for (int64_t i = lo + 1; i <= hi; ++i) {
                if (i == hi || arena[i].key() != arena[s].key()) {
                    int64_t len = i - s;
                    if (len >= 2) {
                        ++ngroups;
                        // Chained 128-bit hash over the gid sequence
                        // (order- and length-sensitive); one mix per two
                        // entries.
                        uint64_t h1 = 0x9E3779B97F4A7C15ULL ^
                            static_cast<uint64_t>(len);
                        uint64_t h2 = 0xC2B2AE3D27D4EB4FULL;
                        const E* e = arena.data() + s;
                        int64_t j = 0;
                        for (; j + 2 <= len; j += 2) {
                            uint64_t w =
                                static_cast<uint64_t>(static_cast<uint32_t>(
                                    e[j].gid())) |
                                (static_cast<uint64_t>(static_cast<uint32_t>(
                                    e[j + 1].gid())) << 32);
                            h1 = mix64(h1 ^ w);
                            h2 = mix64(h2 + w * 0xD6E8FEB86659FD93ULL);
                        }
                        if (j < len) {
                            uint64_t w = static_cast<uint64_t>(
                                static_cast<uint32_t>(e[j].gid()));
                            h1 = mix64(h1 ^ (w | (1ULL << 63)));
                            h2 = mix64(h2 + w * 0x2545F4914F6CDD1DULL);
                        }
                        uint64_t pslot = h1 & mask;
                        for (;;) {
                            Slot& sl = table[pslot];
                            if (sl.epoch != epoch) {
                                sl = Slot{h1, h2,
                                          static_cast<int32_t>(out.size()),
                                          epoch};
                                out.push_back(GroupRef{
                                    s, static_cast<int32_t>(len), h1, h2,
                                    1});
                                break;
                            }
                            if (sl.h1 == h1 && sl.h2 == h2) {
                                ++out[sl.idx].weight;
                                break;
                            }
                            pslot = (pslot + 1) & mask;
                        }
                    }
                    s = i;
                }
            }
            bucket_ngroups[b] = ngroups;
            if (prof) scan_ns += long((now_s() - ts) * 1e9);
        }
    };
    {
        std::vector<std::thread> ths;
        for (int t = 1; t < n_threads; ++t) ths.emplace_back(sort_fn);
        sort_fn();
        for (auto& th : ths) th.join();
    }
    if (prof) {
        std::fprintf(stderr,
                     "[kidx] sort+scan %.2fs (sort %.2fs scan %.2fs, "
                     "thread-summed)\n",
                     now_s() - t0, sort_ns.load() / 1e9,
                     scan_ns.load() / 1e9);
        t0 = now_s();
    }

    // ---- serial bucket-order global merge (deterministic) ----
    std::unordered_map<Key128, int64_t, Key128Hash> pat;
    int64_t n_groups = 0;
    for (int b = 0; b < N_BUCKETS; ++b) {
        n_groups += bucket_ngroups[b];
        for (const GroupRef& gr : bucket_groups[b]) {
            Key128 key{gr.h1, gr.h2};
            auto it = pat.find(key);
            if (it == pat.end()) {
                pat.emplace(key, static_cast<int64_t>(h->lens.size()));
                h->lens.push_back(gr.len);
                h->weights.push_back(gr.weight);
                const E* e = arena.data() + gr.start;
                for (int32_t j = 0; j < gr.len; ++j)
                    h->gids.push_back(e[j].gid());
            } else {
                h->weights[it->second] += gr.weight;
            }
        }
    }
    if (prof) {
        std::fprintf(stderr, "[kidx] global merge %.2fs\n", now_s() - t0);
    }
    h->n_groups = n_groups;
    return true;
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

    // Thread t owns a contiguous genome range (stable partition).
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
    // Partition shift adapts to the data's occupied bit width (k-mers are
    // 2k-bit packed, e.g. 50 bits for k=25).
    uint64_t kmax = 0;
    for (int32_t g = 0; g < n_genomes; ++g)
        if (set_lens[g] > 0 && kmer_ptrs[g][set_lens[g] - 1] > kmax)
            kmax = kmer_ptrs[g][set_lens[g] - 1];
    int kbits = 1;
    while (kbits < 64 && (kmax >> kbits) != 0) ++kbits;
    const int shift = kbits > PART_BITS ? kbits - PART_BITS : 0;

    bool ok = shift <= 32
        ? build_impl<EntryPacked>(kmer_ptrs, set_lens, n_genomes, n_threads,
                                  shift, nnz, t_lo, h)
        : build_impl<EntryWide>(kmer_ptrs, set_lens, n_genomes, n_threads,
                                shift, nnz, t_lo, h);
    if (!ok) {
        delete h;
        return nullptr;
    }
    *out_n_groups = h->n_groups;
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
