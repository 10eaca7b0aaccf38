// ncio — native data-path core for the NetCDF-classic codec and text ingest.
//
// The framework's Python layer parses NetCDF headers (a few hundred bytes);
// everything measured in gigabytes goes through these routines: big-endian
// <-> host decode, strided record-variable gather, and GRAW radiosonde text
// tokenization.  Replaces the role the reference delegated to
// xarray/netCDF4/pandas C extensions (not available in this image) with a
// dependency-free C++17 core exposed through a minimal C ABI for ctypes.
//
// Build: make (g++ -O3 -march=native -shared -fPIC -fopenmp).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

template <typename T, T (*SWAP)(T)>
void swap_copy(void* dst, const void* src, size_t n) {
    const T* s = static_cast<const T*>(src);
    T* d = static_cast<T*>(dst);
#pragma omp parallel for if (n > (size_t)1 << 20) schedule(static)
    for (long long i = 0; i < (long long)n; ++i) d[i] = SWAP(s[i]);
}

}  // namespace

extern "C" {

// Byteswap `n` elements of `width` bytes (1 = memcpy) from src to dst.
// Returns 0 on success, -1 on unsupported width.
int ncio_byteswap(void* dst, const void* src, size_t n, int width) {
    switch (width) {
        case 1: std::memcpy(dst, src, n); return 0;
        case 2: swap_copy<uint16_t, bswap16>(dst, src, n); return 0;
        case 4: swap_copy<uint32_t, bswap32>(dst, src, n); return 0;
        case 8: swap_copy<uint64_t, bswap64>(dst, src, n); return 0;
        default: return -1;
    }
}

// Gather a record variable out of the interleaved record section:
// for r in [0, numrecs): copy `per_rec` elements of `width` bytes from
// base + r*recsize into dst (contiguous), byteswapping.  This is the single
// pass that replaces the Python per-record frombuffer loop.
int ncio_gather_records(void* dst, const void* base, size_t numrecs,
                        size_t recsize, size_t per_rec, int width) {
    if (width != 1 && width != 2 && width != 4 && width != 8) return -1;
    char* d = static_cast<char*>(dst);
    const char* s = static_cast<const char*>(base);
    const size_t chunk = per_rec * (size_t)width;
#pragma omp parallel for if (numrecs * per_rec > (size_t)1 << 20) \
    schedule(static)
    for (long long r = 0; r < (long long)numrecs; ++r) {
        ncio_byteswap(d + (size_t)r * chunk, s + (size_t)r * recsize,
                      per_rec, width);
    }
    return 0;
}

// Tokenize a whitespace-separated numeric table (the GRAW `*_Profile.txt`
// radiosonde format): rows [skip_header, n_lines - skip_footer), first
// `ncols` columns parsed as double.  Rows with fewer than `ncols` numeric
// leading tokens are skipped (header/footer junk tolerance).  Writes up to
// `max_rows * ncols` doubles row-major into `out`; returns the number of
// parsed rows, or -1 if the file can't be read.
long long ncio_parse_table(const char* path, int ncols, int skip_header,
                           int skip_footer, double* out, long long max_rows) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    char* buf = static_cast<char*>(std::malloc((size_t)size + 1));
    if (!buf) { std::fclose(f); return -1; }
    size_t got = std::fread(buf, 1, (size_t)size, f);
    std::fclose(f);
    buf[got] = '\0';

    // index line starts
    long long n_lines = 0;
    for (size_t i = 0; i < got; ++i)
        if (buf[i] == '\n') ++n_lines;
    if (got > 0 && buf[got - 1] != '\n') ++n_lines;

    long long row = 0;
    long long line_idx = -1;
    char* p = buf;
    while (p < buf + got && row < max_rows) {
        ++line_idx;
        char* line_end = static_cast<char*>(std::memchr(p, '\n', buf + got - p));
        if (!line_end) line_end = buf + got;
        *line_end = '\0';
        if (line_idx >= skip_header && line_idx < n_lines - skip_footer) {
            char* q = p;
            int col = 0;
            double vals[64];
            while (col < ncols && col < 64) {
                char* end = nullptr;
                double v = std::strtod(q, &end);
                if (end == q) break;
                vals[col++] = v;
                q = end;
            }
            if (col == ncols) {
                std::memcpy(out + row * ncols, vals,
                            sizeof(double) * (size_t)ncols);
                ++row;
            }
        }
        p = line_end + 1;
    }
    std::free(buf);
    return row;
}

int ncio_version(void) { return 1; }

}  // extern "C"

// ---------------------------------------------------------------------------
// Parallel file loader: the ingest layer opens hundreds of small NetCDFs per
// radiosonde launch (the reference's hot ingest loop, MWR_read_in_module.py
// get_tbs_from_l1); reading them through one OpenMP pool overlaps the
// per-file syscall + page-cache latency.
// ---------------------------------------------------------------------------

extern "C" {

// Size of each file in bytes (-1 when unreadable).
void ncio_file_sizes(const char* const* paths, long long n, long long* sizes) {
#pragma omp parallel for schedule(dynamic)
    for (long long i = 0; i < n; ++i) {
        FILE* f = std::fopen(paths[i], "rb");
        if (!f) { sizes[i] = -1; continue; }
        std::fseek(f, 0, SEEK_END);
        sizes[i] = std::ftell(f);
        std::fclose(f);
    }
}

// Read file i fully into dst[i] (caller-allocated, sizes[i] bytes).
// status[i]: 0 ok, -1 failed.
void ncio_read_files(const char* const* paths, long long n,
                     char* const* dst, const long long* sizes, int* status) {
#pragma omp parallel for schedule(dynamic)
    for (long long i = 0; i < n; ++i) {
        status[i] = -1;
        if (sizes[i] < 0) continue;
        FILE* f = std::fopen(paths[i], "rb");
        if (!f) continue;
        size_t got = std::fread(dst[i], 1, (size_t)sizes[i], f);
        std::fclose(f);
        if ((long long)got == sizes[i]) status[i] = 0;
    }
}

}  // extern "C"
