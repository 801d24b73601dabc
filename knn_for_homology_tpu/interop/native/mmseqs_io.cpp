// Native MMseqs2 database record IO — the host-side hot path of the bridge.
//
// The reference's only performance-critical host code path is the prefilter
// writer / result reader (reference: seqvec_search/mmseqs/_write_prefilter_db.py,
// _read_results_db.py — per-line Python string handling over millions of
// records). This C++ implementation does the same byte formats with buffered
// IO and raw number parsing; knn_for_homology_tpu/interop/native/__init__.py
// binds it via ctypes with a pure-Python fallback.
//
// Build: make (g++ -O3 -shared -fPIC).

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Record {
    int64_t query_id;
    std::vector<int64_t> targets;
    std::vector<double> evalues;
};

struct ParseHandle {
    std::vector<Record> records;
    int64_t total_entries = 0;
};

bool read_file(const std::string& path, std::string* out) {
    FILE* fp = std::fopen(path.c_str(), "rb");
    if (!fp) return false;
    std::fseek(fp, 0, SEEK_END);
    long size = std::ftell(fp);
    std::fseek(fp, 0, SEEK_SET);
    out->resize(size);
    size_t got = size ? std::fread(&(*out)[0], 1, size, fp) : 0;
    std::fclose(fp);
    return (long)got == size;
}

// A read-only mmap of one data file. UniRef90-scale result DBs are tens of
// GB (the reference mmap'd them for the same reason,
// reference: seqvec_search/mmseqs/_read_results_db.py:17-56) — mapping lets
// the kernel page in only the bytes a record actually touches instead of
// heap-copying whole files.
struct MappedFile {
    const char* base = nullptr;
    int64_t size = 0;
    bool ok = false;

    explicit MappedFile(const std::string& path) {
        int fd = ::open(path.c_str(), O_RDONLY);
        if (fd < 0) return;
        struct stat st;
        if (::fstat(fd, &st) != 0) { ::close(fd); return; }
        size = (int64_t)st.st_size;
        if (size == 0) { ::close(fd); ok = true; return; }  // empty split
        void* p = ::mmap(nullptr, (size_t)size, PROT_READ, MAP_PRIVATE, fd, 0);
        ::close(fd);  // the mapping keeps its own reference
        if (p == MAP_FAILED) return;
        base = (const char*)p;
        ok = true;
    }
    MappedFile(const MappedFile&) = delete;
    MappedFile& operator=(const MappedFile&) = delete;
    MappedFile(MappedFile&& o) noexcept
        : base(o.base), size(o.size), ok(o.ok) {
        o.base = nullptr; o.size = 0;
    }
    ~MappedFile() {
        if (base) ::munmap((void*)base, (size_t)size);
    }
};

// Split data files addressed as one contiguous byte range (the C++ twin of
// ConcatBuffer in interop/mmseqs_format.py). Records never span splits.
struct MultiMap {
    std::vector<MappedFile> maps;
    std::vector<int64_t> starts;  // cumulative global offset of each file
    bool ok = true;

    void add(const std::string& path) {
        int64_t start = starts.empty()
            ? 0 : starts.back() + maps.back().size;
        maps.emplace_back(path);
        starts.push_back(start);
        if (!maps.back().ok) ok = false;
    }
    // global [offset, offset+size) → pointer inside one file, or nullptr
    const char* at(int64_t offset, int64_t size) const {
        for (size_t i = 0; i < maps.size(); ++i) {
            int64_t rel = offset - starts[i];
            if (rel >= 0 && rel + size <= maps[i].size)
                return maps[i].base + rel;
        }
        return nullptr;
    }
};

}  // namespace

extern "C" {

// Parse a result DB. data_paths: '\n'-separated list of data files in order.
// Returns an opaque handle (nullptr on failure); sets n_queries / n_entries.
void* rr_open(const char* index_path, const char* data_paths,
              int evalue_col, int64_t* n_queries, int64_t* n_entries) {
    std::string index_buf;
    if (!read_file(index_path, &index_buf)) return nullptr;

    // mmap the data files; records are addressed by global offset
    MultiMap data;
    {
        const char* p = data_paths;
        while (*p) {
            const char* end = std::strchr(p, '\n');
            size_t len = end ? (size_t)(end - p) : std::strlen(p);
            data.add(std::string(p, len));
            p += len + (end ? 1 : 0);
            if (!end) break;
        }
        if (!data.ok) return nullptr;
    }

    auto handle = new ParseHandle();
    const char* p = index_buf.c_str();
    const char* index_end = p + index_buf.size();
    while (p < index_end) {
        char* next = nullptr;
        int64_t qid = std::strtoll(p, &next, 10);
        if (next == p) break;
        p = next + 1;  // skip tab
        int64_t offset = std::strtoll(p, &next, 10);
        p = next + 1;
        int64_t size = std::strtoll(p, &next, 10);
        p = next;
        while (p < index_end && (*p == '\n' || *p == '\r')) ++p;

        Record rec;
        rec.query_id = qid;
        const char* r = data.at(offset, size);
        if (!r) { delete handle; return nullptr; }
        const char* r_end = r + size - 1;  // -1 drops the trailing NUL
        while (r < r_end) {
            char* rn = nullptr;
            int64_t target = std::strtoll(r, &rn, 10);
            if (rn == r) break;
            rec.targets.push_back(target);
            // advance over columns to the E-value column (tab-separated)
            const char* col = rn;
            double ev = 0.0;
            for (int c = 1; col < r_end && *col != '\n'; ++col) {
                if (*col == '\t') {
                    if (c == evalue_col) {
                        ev = std::strtod(col + 1, nullptr);
                        break;
                    }
                    ++c;
                }
            }
            rec.evalues.push_back(ev);
            const char* nl = (const char*)std::memchr(r, '\n', r_end - r);
            if (!nl) break;
            r = nl + 1;
        }
        handle->total_entries += (int64_t)rec.targets.size();
        handle->records.push_back(std::move(rec));
    }
    *n_queries = (int64_t)handle->records.size();
    *n_entries = handle->total_entries;
    return handle;
}

void rr_fill(void* h, int64_t* query_ids, int64_t* counts,
             int64_t* targets, double* evalues) {
    auto handle = static_cast<ParseHandle*>(h);
    int64_t pos = 0;
    for (size_t i = 0; i < handle->records.size(); ++i) {
        const Record& rec = handle->records[i];
        query_ids[i] = rec.query_id;
        counts[i] = (int64_t)rec.targets.size();
        std::memcpy(targets + pos, rec.targets.data(),
                    rec.targets.size() * sizeof(int64_t));
        std::memcpy(evalues + pos, rec.evalues.data(),
                    rec.evalues.size() * sizeof(double));
        pos += (int64_t)rec.targets.size();
    }
}

void rr_close(void* h) { delete static_cast<ParseHandle*>(h); }

// Write a prefilter DB data+index pair. hits laid out [nq, k] with
// already-translated MMseqs target ids; -1 = missing. Returns 0 on success.
int pf_write(const char* data_path, const char* index_path,
             const int64_t* query_mmseqs_ids, int64_t nq,
             const int64_t* hit_ids, const double* scores_x100, int64_t k) {
    FILE* data = std::fopen(data_path, "wb");
    if (!data) return 1;
    FILE* index = std::fopen(index_path, "wb");
    if (!index) { std::fclose(data); return 1; }
    std::vector<char> buf(1 << 20);
    std::setvbuf(data, buf.data(), _IOFBF, buf.size());
    int64_t offset = 0;
    char line[64];
    for (int64_t q = 0; q < nq; ++q) {
        int64_t length = 0;
        for (int64_t j = 0; j < k; ++j) {
            int64_t hit = hit_ids[q * k + j];
            if (hit == -1) continue;
            int n = std::snprintf(line, sizeof(line), "%lld\t%lld\t0\n",
                                  (long long)hit,
                                  (long long)scores_x100[q * k + j]);
            std::fwrite(line, 1, n, data);
            length += n;
        }
        std::fputc('\0', data);
        length += 1;
        std::fprintf(index, "%lld\t%lld\t%lld\n",
                     (long long)query_mmseqs_ids[q], (long long)offset,
                     (long long)length);
        offset += length;
    }
    std::fclose(data);
    std::fclose(index);
    return 0;
}

}  // extern "C"
