// tpu3dm native runtime tier — host-side C++ kernels.
//
// TPU-native framework layering: device compute (NN, RANSAC, ICP, FPFH) is
// JAX/XLA/Pallas; the *host* runtime around it — file ingest, voxel hashing
// at the IO boundary — is native C++, mirroring the role Open3D's C++ core
// plays for the reference (reference: src/ply/ply.py:80 read_point_cloud,
// ply.py:106 voxel_down_sample both dispatch into Open3D C++).
//
// Exposed as a flat C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libtpu3dm_native.so next to this file)

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <vector>
#include <thread>
#include <atomic>

extern "C" {

// ---------------------------------------------------------------------------
// Fast ASCII float parsing
// ---------------------------------------------------------------------------
// Parses up to `max_out` whitespace-separated numbers from buf[0..len).
// Returns the number parsed, or -1 on malformed input.  ~20x faster than
// Python str.split + np.array for large ASCII PLY payloads.
long t3n_parse_floats(const char* buf, long len, double* out, long max_out) {
    const char* p = buf;
    const char* end = buf + len;
    long n = 0;
    while (p < end && n < max_out) {
        // skip whitespace
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
            ++p;
        if (p >= end) break;
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) return -1;  // non-numeric token
        out[n++] = v;
        p = next;
    }
    // trailing whitespace only?
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
        ++p;
    return n;
}

// ---------------------------------------------------------------------------
// Voxel-hash downsample (mean of points per occupied voxel)
// ---------------------------------------------------------------------------
// Same semantics as the reference's voxel_down_sample (ply.py:106): voxel
// grid anchored at the cloud min-bound, output = per-voxel mean.  Output
// order is lexicographic in (i,j,k) to match the JAX/NumPy implementations
// (preprocess/voxel.py).  Open-addressing hash on the 3D integer key, then a
// sort of the (small) occupied set.
//
// Returns number of output points, or -1 if out capacity is insufficient.
long t3n_voxel_downsample(const double* pts, long n, double voxel,
                          double* out, long max_out) {
    if (n <= 0) return 0;
    double lo[3] = {pts[0], pts[1], pts[2]};
    for (long i = 1; i < n; ++i)
        for (int d = 0; d < 3; ++d)
            if (pts[3 * i + d] < lo[d]) lo[d] = pts[3 * i + d];

    const double inv = 1.0 / voxel;
    // Hash table: power-of-two size >= 2n.
    long cap = 1;
    int capbits = 0;
    while (cap < 2 * n) { cap <<= 1; ++capbits; }
    struct Slot {
        int64_t key;   // packed 21-bit i,j,k (+1 bias so 0 means empty)
        double sx, sy, sz;
        int64_t cnt;
    };
    std::vector<Slot> table((size_t)cap);
    memset(table.data(), 0, sizeof(Slot) * (size_t)cap);
    const int64_t mask = cap - 1;

    for (long i = 0; i < n; ++i) {
        int64_t ix = (int64_t)std::floor((pts[3 * i + 0] - lo[0]) * inv);
        int64_t iy = (int64_t)std::floor((pts[3 * i + 1] - lo[1]) * inv);
        int64_t iz = (int64_t)std::floor((pts[3 * i + 2] - lo[2]) * inv);
        // 21 bits per axis (non-negative by construction), +1 so key!=0.
        int64_t key = (((ix & 0x1FFFFF) << 42) | ((iy & 0x1FFFFF) << 21) |
                       (iz & 0x1FFFFF)) + 1;
        uint64_t h = (uint64_t)key * 0x9E3779B97F4A7C15ull;
        // Fibonacci hashing: the HIGH bits of the product mix all key bits;
        // the low bits depend only on the key's low bits (= iz, a handful
        // of distinct values), which degenerated every insert into ~1000-
        // probe linear chains (measured 1458 probes/insert at 220k voxels).
        long s = (long)(h >> (64 - capbits));
        for (;;) {
            if (table[s].key == 0) {
                table[s].key = key;
                table[s].sx = pts[3 * i];
                table[s].sy = pts[3 * i + 1];
                table[s].sz = pts[3 * i + 2];
                table[s].cnt = 1;
                break;
            }
            if (table[s].key == key) {
                table[s].sx += pts[3 * i];
                table[s].sy += pts[3 * i + 1];
                table[s].sz += pts[3 * i + 2];
                table[s].cnt += 1;
                break;
            }
            s = (s + 1) & mask;
        }
    }

    // Collect occupied slots as compact (key, slot) pairs BEFORE sorting:
    // comparator reads through the (tens-of-MB) table are a cache miss per
    // comparison — sorting the packed pairs instead is ~10x faster at high
    // voxel occupancy (measured 900 ms -> 90 ms at 220k occupied voxels).
    // Key order is lexicographic (i,j,k) for non-negative packed indices.
    std::vector<std::pair<int64_t, long>> occ;
    occ.reserve((size_t)n);
    for (long s = 0; s < cap; ++s)
        if (table[s].key != 0) occ.emplace_back(table[s].key, s);
    std::sort(occ.begin(), occ.end());

    long m = (long)occ.size();
    if (m > max_out) return -1;
    for (long o = 0; o < m; ++o) {
        const Slot& sl = table[occ[o].second];
        double k = (double)sl.cnt;
        out[3 * o + 0] = sl.sx / k;
        out[3 * o + 1] = sl.sy / k;
        out[3 * o + 2] = sl.sz / k;
    }
    return m;
}

// ---------------------------------------------------------------------------
// Binary PLY vertex extraction
// ---------------------------------------------------------------------------
// Strided gather of 3 float columns out of a fixed-stride binary vertex
// block: handles f4/f8 source types and little/big endian.  Covers the
// dominant read path (binary_little_endian from scanners) without NumPy
// structured-dtype overhead.
//
// type codes: 0 = float32, 1 = float64.  swap: nonzero = byteswap needed.
// offs/types are per-column (x,y,z).  Returns 0 on success.
int t3n_extract_xyz(const uint8_t* buf, long count, long stride,
                    const long* offs, const int* types, int swap,
                    double* out) {
    for (int c = 0; c < 3; ++c) {
        long off = offs[c];
        int t = types[c];
        for (long i = 0; i < count; ++i) {
            const uint8_t* p = buf + i * stride + off;
            double v;
            if (t == 0) {
                uint32_t u;
                memcpy(&u, p, 4);
                if (swap) u = __builtin_bswap32(u);
                float fv;
                memcpy(&fv, &u, 4);
                v = (double)fv;
            } else {
                uint64_t u;
                memcpy(&u, p, 8);
                if (swap) u = __builtin_bswap64(u);
                double dv;
                memcpy(&dv, &u, 8);
                v = dv;
            }
            out[3 * i + c] = v;
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Threaded batch min/max + centroid (host-side cloud stats for ingest)
// ---------------------------------------------------------------------------
// Used by the data-loading path to compute per-cloud bounds without a NumPy
// pass per cloud; one call, all threads.
void t3n_cloud_stats(const double* pts, long n, double* lo, double* hi,
                     double* centroid) {
    if (n <= 0) return;
    unsigned nt = std::thread::hardware_concurrency();
    if (nt == 0) nt = 1;
    if ((long)nt > n / 4096 + 1) nt = (unsigned)(n / 4096 + 1);
    std::vector<std::array<double, 9>> parts(nt);
    std::vector<std::thread> threads;
    long per = (n + nt - 1) / nt;
    for (unsigned t = 0; t < nt; ++t) {
        threads.emplace_back([&, t]() {
            long a = (long)t * per, b = a + per < n ? a + per : n;
            double l[3] = {1e300, 1e300, 1e300};
            double h[3] = {-1e300, -1e300, -1e300};
            double s[3] = {0, 0, 0};
            for (long i = a; i < b; ++i)
                for (int d = 0; d < 3; ++d) {
                    double v = pts[3 * i + d];
                    if (v < l[d]) l[d] = v;
                    if (v > h[d]) h[d] = v;
                    s[d] += v;
                }
            parts[t] = {l[0], l[1], l[2], h[0], h[1], h[2], s[0], s[1], s[2]};
        });
    }
    for (auto& th : threads) th.join();
    double l[3] = {1e300, 1e300, 1e300}, h[3] = {-1e300, -1e300, -1e300},
           s[3] = {0, 0, 0};
    for (auto& p : parts)
        for (int d = 0; d < 3; ++d) {
            if (p[d] < l[d]) l[d] = p[d];
            if (p[3 + d] > h[d]) h[d] = p[3 + d];
            s[d] += p[6 + d];
        }
    for (int d = 0; d < 3; ++d) {
        lo[d] = l[d];
        hi[d] = h[d];
        centroid[d] = s[d] / (double)n;
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// KD partition permutation (large-cloud block-sparse NN preparation)
// ---------------------------------------------------------------------------
// Recursive widest-axis median split grouping points into `block`-sized
// leaves — same partition rule as the NumPy kd_perm (ops/nn_sparse.py:75),
// but in-place on an index array with std::nth_element (no per-level array
// copies) and the top recursion levels fanned out over threads.  Measured
// ~50x faster than the NumPy recursion at 1M points (1.8 s -> ~35 ms).

static void t3n_kd_rec(const double* pts, long* idx, long n, long block,
                       int depth) {
    if (n <= block) return;
    double lo[3] = {1e300, 1e300, 1e300};
    double hi[3] = {-1e300, -1e300, -1e300};
    for (long i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d) {
            double v = pts[3 * idx[i] + d];
            if (v < lo[d]) lo[d] = v;
            if (v > hi[d]) hi[d] = v;
        }
    int ax = 0;
    double span = hi[0] - lo[0];
    for (int d = 1; d < 3; ++d)
        if (hi[d] - lo[d] > span) { span = hi[d] - lo[d]; ax = d; }
    long nb = n / block;  // blocks this span will produce
    long k = (n % block == 0) ? (nb / 2) * block : n / 2;
    if (k == 0) k = n / 2;
    std::nth_element(idx, idx + k, idx + n, [pts, ax](long a, long b) {
        return pts[3 * a + ax] < pts[3 * b + ax];
    });
    if (depth < 3 && n > 65536) {
        std::thread left(t3n_kd_rec, pts, idx, k, block, depth + 1);
        t3n_kd_rec(pts, idx + k, n - k, block, depth + 1);
        left.join();
    } else {
        t3n_kd_rec(pts, idx, k, block, depth);
        t3n_kd_rec(pts, idx + k, n - k, block, depth);
    }
}

extern "C" void t3n_kd_perm(const double* pts, long n, long block, long* idx) {
    for (long i = 0; i < n; ++i) idx[i] = i;
    if (block < 1) return;
    t3n_kd_rec(pts, idx, n, block, 0);
}
