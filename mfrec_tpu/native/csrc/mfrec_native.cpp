// mfrec_tpu native runtime helpers (C ABI, loaded via ctypes).
//
// The reference's ingest path is a per-rating python loop over a
// scipy.sparse.lil_matrix (reference base.py:823-828, example1b:40-41) and
// its kernel-feed construction iterates a COO python iterator
// (base.py:1115-1131).  These helpers provide the native fast path for the
// host-side data plane: text-file rating parsing, counting sort by key,
// bincount and CSR pointer assembly.  Everything has a numpy fallback in
// mfrec_tpu/native/__init__.py.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cerrno>

extern "C" {

// Count data rows (lines with at least one digit) in a text file.
long mn_count_rows(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    long rows = 0;
    char buf[1 << 16];
    bool has_data = false;
    size_t got;
    while ((got = std::fread(buf, 1, sizeof(buf), f)) > 0) {
        for (size_t j = 0; j < got; ++j) {
            char c = buf[j];
            if (c == '\n') {
                if (has_data) ++rows;
                has_data = false;
            } else if (c >= '0' && c <= '9') {
                has_data = true;
            }
        }
    }
    if (has_data) ++rows;
    std::fclose(f);
    return rows;
}

// Parse "user item rating [extra...]" rows (any non-numeric separators).
// Fills the preallocated arrays; returns rows parsed, or -1 on error.
long mn_parse_ratings(const char* path, int32_t* users, int32_t* items,
                      float* vals, long cap) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    // Read whole file.
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    char* data = (char*)std::malloc(size + 1);
    if (!data) { std::fclose(f); return -1; }
    if ((long)std::fread(data, 1, size, f) != size) {
        std::free(data); std::fclose(f); return -1;
    }
    data[size] = '\0';
    std::fclose(f);

    long n = 0;
    char* p = data;
    char* end = data + size;
    while (p < end && n < cap) {
        // Parse up to 3 numeric fields on this line.
        double fields[3];
        int nf = 0;
        while (p < end && *p != '\n') {
            if ((*p >= '0' && *p <= '9') || *p == '-' || *p == '+'
                || *p == '.') {
                char* q;
                double v = std::strtod(p, &q);
                if (q == p) { ++p; continue; }
                if (nf < 3) fields[nf] = v;
                ++nf;
                p = q;
            } else {
                ++p;
            }
        }
        if (p < end) ++p;  // skip newline
        if (nf >= 3) {
            users[n] = (int32_t)fields[0];
            items[n] = (int32_t)fields[1];
            vals[n] = (float)fields[2];
            ++n;
        }
    }
    std::free(data);
    return n;
}

// Stable counting sort by int32 key in [0, nkeys); writes the permutation.
void mn_counting_sort(const int32_t* keys, long n, long nkeys,
                      int64_t* perm) {
    int64_t* counts = (int64_t*)std::calloc(nkeys + 1, sizeof(int64_t));
    if (!counts) return;
    for (long j = 0; j < n; ++j) ++counts[keys[j] + 1];
    for (long k = 0; k < nkeys; ++k) counts[k + 1] += counts[k];
    for (long j = 0; j < n; ++j) perm[counts[keys[j]]++] = j;
    std::free(counts);
}

// CSR row pointers from sorted-or-unsorted COO keys (bincount + cumsum).
void mn_csr_pointers(const int32_t* keys, long n, long nrows, int64_t* ptr) {
    std::memset(ptr, 0, (nrows + 1) * sizeof(int64_t));
    for (long j = 0; j < n; ++j) ++ptr[keys[j] + 1];
    for (long r = 0; r < nrows; ++r) ptr[r + 1] += ptr[r];
}

// Gather int32 / float32 arrays through an int64 permutation.
void mn_gather_i32(const int32_t* src, const int64_t* perm, long n,
                   int32_t* dst) {
    for (long j = 0; j < n; ++j) dst[j] = src[perm[j]];
}

void mn_gather_f32(const float* src, const int64_t* perm, long n,
                   float* dst) {
    for (long j = 0; j < n; ++j) dst[j] = src[perm[j]];
}

}  // extern "C"
