// Native feature-file ingest — the host-side data plane.
//
// Parses the 3-line-per-image text interchange format (file name line,
// class name line, whitespace-separated float vector line) with the exact
// load semantics of the reference loader qt_cpp/db_features.cpp:44-116:
//   - leading whitespace stripped from the class name (:59)
//   - records whose class name contains a skip substring are dropped (:60-64)
//   - the number of distinct classes can be capped; parsing STOPS at the
//     first record of a class beyond the cap (:66-70)
//   - features with |f| < 1e-4 are zeroed (:85-87)
//   - rows are L2-normalized (or sum-normalized for chi2/KL) (:90-101)
//
// Design: one sequential pass indexes record offsets and resolves class ids
// (class identity assignment is order-dependent, so it cannot be
// parallelized), then the float parsing of feature lines — the actual hot
// loop — fans out across worker threads writing directly into the caller's
// [N, D] buffer. Exposed as a C ABI for ctypes (no pybind11 dependency).

#include <atomic>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kZeroEps = 1e-4f;  // db_features.cpp:85-87

struct Record {
    const char* name_begin;
    size_t name_len;
    const char* feat_begin;
    size_t feat_len;
    int label;
};

struct FirDB {
    std::string buffer;  // whole file
    std::vector<Record> records;
    std::vector<std::string> class_names;
    std::vector<std::string> file_names;
    int features_count = 0;
    std::vector<float> features;  // [N * D]
};

inline const char* next_line(const char* p, const char* end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    return nl ? nl + 1 : end;
}

void parse_feature_line(const Record& rec, int features_count, bool l2,
                        float* out_row) {
    const char* p = rec.feat_begin;
    const char* end = rec.feat_begin + rec.feat_len;
    double sum = 0.0;
    int i = 0;
    for (; i < features_count && p < end; ++i) {
        char* next = nullptr;
        float v = strtof(p, &next);
        if (next == p) break;
        p = next;
        if (std::fabs(v) < kZeroEps) v = 0.0f;  // zero BEFORE normalization
        out_row[i] = v;
        if (l2)
            sum += static_cast<double>(v) * v;
        else
            sum += v;
    }
    for (; i < features_count; ++i) out_row[i] = 0.0f;  // short row: pad
    double denom = l2 ? std::sqrt(sum) : sum;
    if (denom == 0.0) denom = 1.0;
    float inv = static_cast<float>(1.0 / denom);
    for (int j = 0; j < features_count; ++j) out_row[j] *= inv;
}

}  // namespace

extern "C" {

FirDB* fir_load_features(const char* path, int features_count,
                         const char** skip_substrings, int n_skip,
                         int max_classes, int l2_normalize, int n_threads) {
    std::ifstream ifs(path, std::ios::binary | std::ios::ate);
    if (!ifs) return nullptr;
    auto db = new FirDB();
    db->features_count = features_count;
    size_t size = static_cast<size_t>(ifs.tellg());
    db->buffer.resize(size);
    ifs.seekg(0);
    ifs.read(&db->buffer[0], size);

    const char* p = db->buffer.data();
    const char* end = p + size;
    std::unordered_map<std::string, int> class_index;

    // pass 1: sequential record indexing + class resolution
    while (p < end) {
        const char* name_line = p;
        const char* class_line = next_line(p, end);
        if (class_line >= end) break;
        const char* feat_line = next_line(class_line, end);
        if (feat_line >= end) break;
        const char* after = next_line(feat_line, end);
        p = after;

        // trim the class name (leading whitespace + trailing \r\n)
        const char* cb = class_line;
        const char* ce = feat_line;
        while (cb < ce && std::isspace(static_cast<unsigned char>(*cb))) ++cb;
        while (ce > cb && (ce[-1] == '\n' || ce[-1] == '\r')) --ce;
        std::string cname(cb, ce - cb);

        bool skip = false;
        for (int s = 0; s < n_skip; ++s) {
            if (cname.find(skip_substrings[s]) != std::string::npos) {
                skip = true;
                break;
            }
        }
        if (skip) continue;

        auto it = class_index.find(cname);
        int label;
        if (it == class_index.end()) {
            if (max_classes > 0 &&
                static_cast<int>(class_index.size()) >= max_classes)
                break;  // reference BREAKS at the cap (db_features.cpp:66-70)
            label = static_cast<int>(class_index.size());
            class_index.emplace(cname, label);
            db->class_names.push_back(cname);
        } else {
            label = it->second;
        }

        const char* ne = class_line;
        while (ne > name_line && (ne[-1] == '\n' || ne[-1] == '\r')) --ne;
        Record rec;
        rec.name_begin = name_line;
        rec.name_len = static_cast<size_t>(ne - name_line);
        rec.feat_begin = feat_line;
        const char* fe = after;
        while (fe > feat_line && (fe[-1] == '\n' || fe[-1] == '\r')) --fe;
        rec.feat_len = static_cast<size_t>(fe - feat_line);
        rec.label = label;
        db->records.push_back(rec);
    }

    // pass 2: parallel float parsing
    size_t n = db->records.size();
    db->features.resize(n * static_cast<size_t>(features_count));
    if (n_threads <= 0)
        n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads < 1) n_threads = 1;
    bool l2 = l2_normalize != 0;
    std::atomic<size_t> cursor{0};
    auto worker = [&]() {
        constexpr size_t kChunk = 64;
        for (;;) {
            size_t start = cursor.fetch_add(kChunk);
            if (start >= n) return;
            size_t stop = std::min(start + kChunk, n);
            for (size_t i = start; i < stop; ++i) {
                parse_feature_line(db->records[i], features_count, l2,
                                   &db->features[i * features_count]);
            }
        }
    };
    std::vector<std::thread> threads;
    for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
    worker();
    for (auto& t : threads) t.join();

    db->file_names.reserve(n);
    for (auto& rec : db->records)
        db->file_names.emplace_back(rec.name_begin, rec.name_len);
    return db;
}

int fir_num_images(FirDB* db) {
    return db ? static_cast<int>(db->records.size()) : 0;
}

int fir_num_classes(FirDB* db) {
    return db ? static_cast<int>(db->class_names.size()) : 0;
}

int fir_features_count(FirDB* db) { return db ? db->features_count : 0; }

void fir_copy_features(FirDB* db, float* out) {
    memcpy(out, db->features.data(), db->features.size() * sizeof(float));
}

void fir_copy_labels(FirDB* db, int32_t* out) {
    for (size_t i = 0; i < db->records.size(); ++i)
        out[i] = db->records[i].label;
}

int fir_class_name(FirDB* db, int idx, char* buf, int buflen) {
    if (!db || idx < 0 || idx >= static_cast<int>(db->class_names.size()))
        return -1;
    const std::string& s = db->class_names[idx];
    int n = static_cast<int>(std::min<size_t>(s.size(), buflen - 1));
    memcpy(buf, s.data(), n);
    buf[n] = '\0';
    return n;
}

int fir_file_name(FirDB* db, int idx, char* buf, int buflen) {
    if (!db || idx < 0 || idx >= static_cast<int>(db->file_names.size()))
        return -1;
    const std::string& s = db->file_names[idx];
    int n = static_cast<int>(std::min<size_t>(s.size(), buflen - 1));
    memcpy(buf, s.data(), n);
    buf[n] = '\0';
    return n;
}

void fir_free(FirDB* db) { delete db; }

}  // extern "C"
