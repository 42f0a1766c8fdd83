// Native BM25 inverted index — C++ implementation of the host-side lexical
// component (the reference's LexicalIndex is native Rust, rag_engine.rs:
// 2083-2237; this is its C++ counterpart for the TPU framework's host
// runtime). Exposed through a C ABI consumed via ctypes
// (rust_local_rag_tpu/ops/native_bm25.py).
//
// Semantics match ops/bm25.py: tokens are lowercased alphanumeric runs with
// UTF-8 byte length >= 3; BM25 k1=1.5 b=0.75; idf = max(ln((N-df+.5)/(df+.5)), 0).
//
// Tokenization lives on the PYTHON side (ops/bm25.tokenize — Unicode-aware
// splitting and lowercasing, bit-identical to the pure-Python index); the
// wrapper ships pre-tokenized text through bm25_add_tokens /
// bm25_score_tokens ('\x01'-joined UTF-8 tokens, no further filtering).
// The byte-level bm25_add_chunk / bm25_score entry points remain for ABI
// compat but apply ASCII-only rules (non-ASCII bytes treated as letters).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Index {
    // term -> (slot -> tf)
    std::unordered_map<std::string, std::unordered_map<int64_t, int32_t>> postings;
    std::unordered_map<int64_t, int64_t> doc_lengths;
    std::unordered_map<int64_t, std::vector<std::string>> doc_terms;  // unique terms per doc
    int64_t total_docs = 0;
    int64_t total_length = 0;
};

inline bool is_token_byte(unsigned char c) {
    return std::isalnum(c) || c >= 0x80;
}

void tokenize(const char* text, size_t len, std::vector<std::string>& out) {
    std::string cur;
    for (size_t i = 0; i < len; i++) {
        unsigned char c = (unsigned char)text[i];
        if (is_token_byte(c)) {
            cur.push_back((char)std::tolower(c));
        } else if (!cur.empty()) {
            if (cur.size() >= 3) out.push_back(cur);
            cur.clear();
        }
    }
    if (cur.size() >= 3) out.push_back(cur);
}

// Pre-tokenized input: tokens joined by '\x01'. No filtering — the caller
// (Python wrapper) already applied the Unicode-aware tokenization rules.
void split_pretokenized(const char* text, size_t len,
                        std::vector<std::string>& out) {
    std::string cur;
    for (size_t i = 0; i < len; i++) {
        char c = text[i];
        if (c == '\x01') {
            if (!cur.empty()) { out.push_back(cur); cur.clear(); }
        } else {
            cur.push_back(c);
        }
    }
    if (!cur.empty()) out.push_back(cur);
}

void remove_slot(Index* idx, int64_t slot);

void add_tokens(Index* idx, int64_t slot, std::vector<std::string>& tokens) {
    if (idx->doc_terms.count(slot)) remove_slot(idx, slot);
    if (tokens.empty()) return;

    std::unordered_map<std::string, int32_t> counts;
    for (auto& t : tokens) counts[t]++;

    int64_t doc_length = 0;
    std::vector<std::string> uniq;
    uniq.reserve(counts.size());
    for (auto& kv : counts) {
        doc_length += kv.second;
        idx->postings[kv.first][slot] = kv.second;
        uniq.push_back(kv.first);
    }
    idx->doc_lengths[slot] = doc_length;
    idx->doc_terms[slot] = std::move(uniq);
    idx->total_docs++;
    idx->total_length += doc_length;
}

int64_t score_tokens(Index* idx, std::vector<std::string>& tokens,
                     int64_t limit, int64_t* out_slots, float* out_scores) {
    if (idx->total_docs == 0 || limit <= 0 || tokens.empty()) return 0;
    std::sort(tokens.begin(), tokens.end());
    tokens.erase(std::unique(tokens.begin(), tokens.end()), tokens.end());

    const double k1 = 1.5, b = 0.75;
    const double avg_dl = (double)idx->total_length / (double)idx->total_docs;

    std::unordered_map<int64_t, double> scores;
    for (const auto& term : tokens) {
        auto pit = idx->postings.find(term);
        if (pit == idx->postings.end()) continue;
        double df = (double)pit->second.size();
        double idf = std::log(((double)idx->total_docs - df + 0.5) / (df + 0.5));
        if (idf < 0.0) idf = 0.0;
        for (const auto& kv : pit->second) {
            auto lit = idx->doc_lengths.find(kv.first);
            if (lit == idx->doc_lengths.end() || lit->second == 0) continue;
            double dl = (double)lit->second;
            double tf = (double)kv.second;
            double denom = tf + k1 * (1.0 - b + b * (dl / avg_dl));
            if (denom == 0.0) continue;
            scores[kv.first] += idf * (tf * (k1 + 1.0)) / denom;
        }
    }

    std::vector<std::pair<int64_t, double>> rows(scores.begin(), scores.end());
    std::sort(rows.begin(), rows.end(),
              [](const auto& a, const auto& b) { return a.second > b.second; });
    int64_t n = std::min<int64_t>(limit, (int64_t)rows.size());
    for (int64_t i = 0; i < n; i++) {
        out_slots[i] = rows[i].first;
        out_scores[i] = (float)rows[i].second;
    }
    return n;
}

void remove_slot(Index* idx, int64_t slot) {
    auto it = idx->doc_terms.find(slot);
    if (it != idx->doc_terms.end()) {
        for (const auto& term : it->second) {
            auto pit = idx->postings.find(term);
            if (pit != idx->postings.end()) {
                pit->second.erase(slot);
                if (pit->second.empty()) idx->postings.erase(pit);
            }
        }
        idx->doc_terms.erase(it);
        auto lit = idx->doc_lengths.find(slot);
        if (lit != idx->doc_lengths.end()) {
            idx->total_length = std::max<int64_t>(0, idx->total_length - lit->second);
            idx->doc_lengths.erase(lit);
        }
        if (idx->total_docs > 0) idx->total_docs--;
    } else {
        idx->doc_lengths.erase(slot);
    }
    if (idx->total_docs == 0) idx->total_length = 0;
}

}  // namespace

extern "C" {

void* bm25_create() { return new Index(); }

void bm25_destroy(void* h) { delete (Index*)h; }

void bm25_add_chunk(void* h, int64_t slot, const char* text, int64_t len) {
    std::vector<std::string> tokens;
    tokenize(text, (size_t)len, tokens);
    add_tokens((Index*)h, slot, tokens);
}

// Unicode-correct ingestion path: `toks` is '\x01'-joined pre-tokenized text.
void bm25_add_tokens(void* h, int64_t slot, const char* toks, int64_t len) {
    std::vector<std::string> tokens;
    split_pretokenized(toks, (size_t)len, tokens);
    add_tokens((Index*)h, slot, tokens);
}

void bm25_remove_chunk(void* h, int64_t slot) { remove_slot((Index*)h, slot); }

int32_t bm25_contains(void* h, int64_t slot) {
    return ((Index*)h)->doc_terms.count(slot) ? 1 : 0;
}

int64_t bm25_num_docs(void* h) { return ((Index*)h)->total_docs; }

// Scores the query; writes up to `limit` (slot, score) pairs sorted by
// descending score. Returns the number written.
int64_t bm25_score(void* h, const char* query, int64_t qlen, int64_t limit,
                   int64_t* out_slots, float* out_scores) {
    std::vector<std::string> tokens;
    tokenize(query, (size_t)qlen, tokens);
    return score_tokens((Index*)h, tokens, limit, out_slots, out_scores);
}

// Unicode-correct scoring path: `toks` is '\x01'-joined pre-tokenized text.
int64_t bm25_score_tokens(void* h, const char* toks, int64_t qlen,
                          int64_t limit, int64_t* out_slots,
                          float* out_scores) {
    std::vector<std::string> tokens;
    split_pretokenized(toks, (size_t)qlen, tokens);
    return score_tokens((Index*)h, tokens, limit, out_slots, out_scores);
}

// Bulk-drop any slot NOT present in `valid` (sorted ascending, nv entries).
void bm25_drop_stale(void* h, const int64_t* valid, int64_t nv) {
    Index* idx = (Index*)h;
    std::vector<int64_t> doomed;
    for (const auto& kv : idx->doc_terms) {
        if (!std::binary_search(valid, valid + nv, kv.first)) {
            doomed.push_back(kv.first);
        }
    }
    for (int64_t slot : doomed) remove_slot(idx, slot);
}

}  // extern "C"
