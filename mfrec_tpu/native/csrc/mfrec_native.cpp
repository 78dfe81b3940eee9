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

// Parse one line's numeric fields into users/items/vals[n]; returns 1 if
// the line held >= 3 numeric fields.  [line, end) is NUL-terminated at
// *end so strtod cannot run past it.
static int mn_parse_line(char* p, char* end, int32_t* users, int32_t* items,
                         float* vals, long n) {
    double fields[3];
    int nf = 0;
    while (p < end) {
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
    if (nf < 3) return 0;
    users[n] = (int32_t)fields[0];
    items[n] = (int32_t)fields[1];
    vals[n] = (float)fields[2];
    return 1;
}

// Parse "user item rating [extra...]" rows (any non-numeric separators).
// Fills the preallocated arrays; returns rows parsed, or -1 on error.
// STREAMING: reads the file through a fixed 1 MiB window (partial tail
// lines carry over between reads), so peak host memory is the output
// arrays only — ingest of out-of-core-sized rating files never holds
// the text in RAM (the reference ingests via a per-rating python loop
// into a lil_matrix, base.py:823-828).
long mn_parse_ratings(const char* path, int32_t* users, int32_t* items,
                      float* vals, long cap) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    const size_t BUF = 1 << 20;
    char* buf = (char*)std::malloc(BUF + 1);
    if (!buf) { std::fclose(f); return -1; }
    size_t have = 0;     // carried-over partial line at buf[0..have)
    long n = 0;
    bool discarding = false;   // inside a pathological >1MiB line
    for (;;) {
        size_t got = std::fread(buf + have, 1, BUF - have, f);
        size_t len = have + got;
        bool eof = got == 0;
        if (discarding) {
            // a line longer than the window is malformed for this
            // format: skip to its terminating newline WITHOUT parsing
            // (parsing the window in pieces would split a numeric token
            // straddling the boundary into two bogus ratings)
            char* nl = (char*)std::memchr(buf, '\n', len);
            if (!nl) {
                if (eof) break;
                have = 0;
                continue;
            }
            discarding = false;
            size_t rem = len - (nl + 1 - buf);
            std::memmove(buf, nl + 1, rem);
            have = rem;
            continue;
        }
        char* parse_end;             // parse complete lines only
        if (eof) {
            parse_end = buf + len;
        } else {
            char* last_nl = (char*)memrchr(buf, '\n', len);  // glibc ext
            if (!last_nl) {
                if (len < BUF) { have = len; continue; }  // short read
                discarding = true;   // window full, no newline: drop line
                have = 0;
                continue;
            } else {
                parse_end = last_nl + 1;
            }
        }
        char save = *parse_end;
        *parse_end = '\0';
        char* p = buf;
        while (p < parse_end && n < cap) {
            char* nl = (char*)std::memchr(p, '\n', parse_end - p);
            char* line_end = nl ? nl : parse_end;
            char save2 = *line_end;
            *line_end = '\0';
            n += mn_parse_line(p, line_end, users, items, vals, n);
            *line_end = save2;
            p = nl ? nl + 1 : parse_end;
        }
        *parse_end = save;
        size_t rem = len - (parse_end - buf);
        if (rem) std::memmove(buf, parse_end, rem);
        have = rem;
        if (eof || n >= cap) break;
    }
    std::free(buf);
    std::fclose(f);
    return n;
}

// Stable counting sort by int32 key in [0, nkeys); writes the permutation.
// Returns 0 on success, -1 if the counts allocation failed (perm is then
// untouched — the caller must fall back, not consume it).
int mn_counting_sort(const int32_t* keys, long n, long nkeys,
                     int64_t* perm) {
    int64_t* counts = (int64_t*)std::calloc(nkeys + 1, sizeof(int64_t));
    if (!counts) return -1;
    for (long j = 0; j < n; ++j) ++counts[keys[j] + 1];
    for (long k = 0; k < nkeys; ++k) counts[k + 1] += counts[k];
    for (long j = 0; j < n; ++j) perm[counts[keys[j]]++] = j;
    std::free(counts);
    return 0;
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
