// Native unigram-sentencepiece Viterbi encoder.
//
// C++ twin of data/tokenizer.SentencePieceUnigramTokenizer._encode_text —
// the data factory tokenizes millions of ASR transcripts (reference:
// args.py max_input_tokens over HowTo100M/VidChapters-7M scale), and the
// pure-Python Viterbi is the collate bottleneck there. Exact same
// semantics: byte-level Viterbi (piece matches on valid UTF-8 can only
// start/end at code-point boundaries, so byte == char segmentation),
// strict-improvement tie-breaks in (i asc, j asc, unk last) order, and a
// one-CODEPOINT unk fallback. Normalization stays in Python; this
// receives the normalized UTF-8 string.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Encoder {
    std::unordered_map<std::string, int32_t> piece_to_id;
    std::vector<double> scores;
    std::unordered_set<std::string> prefixes;  // proper prefixes of pieces
    int64_t max_piece_bytes = 0;
    double unk_score = 0.0;
    int32_t unk_id = 2;
};

constexpr double kNegInf = -std::numeric_limits<double>::infinity();

inline bool is_continuation(unsigned char c) { return (c & 0xC0) == 0x80; }

}  // namespace

extern "C" {

void* spm_create(const char* const* pieces, const double* scores, int64_t n,
                 int32_t unk_id, double unk_score) {
    auto* e = new Encoder();
    e->scores.assign(scores, scores + n);
    e->piece_to_id.reserve(static_cast<size_t>(n) * 2);
    e->unk_id = unk_id;
    e->unk_score = unk_score;
    for (int64_t i = 0; i < n; ++i) {
        std::string p(pieces[i]);
        int64_t len = static_cast<int64_t>(p.size());
        if (len > e->max_piece_bytes) e->max_piece_bytes = len;
        // every proper prefix, for early exit in the match loop
        for (size_t l = 1; l < p.size(); ++l) {
            e->prefixes.insert(p.substr(0, l));
        }
        e->piece_to_id.emplace(std::move(p), static_cast<int32_t>(i));
    }
    return e;
}

void spm_destroy(void* h) { delete static_cast<Encoder*>(h); }

// Viterbi-encode one normalized UTF-8 string. Returns the id count, or
// -needed when out_cap is too small (caller retries with a bigger buffer).
int64_t spm_encode(void* h, const char* text, int32_t* out_ids,
                   int64_t out_cap) {
    const Encoder& e = *static_cast<Encoder*>(h);
    const int64_t n = static_cast<int64_t>(std::strlen(text));
    if (n == 0) return 0;
    std::vector<double> best(n + 1, kNegInf);
    std::vector<int64_t> back_pos(n + 1, -1);
    std::vector<int32_t> back_id(n + 1, e.unk_id);
    best[0] = 0.0;
    std::string key;
    key.reserve(static_cast<size_t>(e.max_piece_bytes));
    for (int64_t i = 0; i < n; ++i) {
        if (best[i] == kNegInf) continue;
        const int64_t j_max = std::min(n, i + e.max_piece_bytes);
        key.clear();
        for (int64_t j = i + 1; j <= j_max; ++j) {
            key.push_back(text[j - 1]);
            auto it = e.piece_to_id.find(key);
            if (it != e.piece_to_id.end()) {
                const double sc = best[i] + e.scores[it->second];
                if (sc > best[j]) {
                    best[j] = sc;
                    back_pos[j] = i;
                    back_id[j] = it->second;
                }
            } else if (e.prefixes.find(key) == e.prefixes.end()) {
                break;  // no piece extends this substring
            }
        }
        // unk fallback consumes one code point
        int64_t k = i + 1;
        while (k < n && is_continuation(static_cast<unsigned char>(text[k])))
            ++k;
        const double sc = best[i] + e.unk_score;
        if (sc > best[k]) {
            best[k] = sc;
            back_pos[k] = i;
            back_id[k] = e.unk_id;
        }
    }
    // backtrace (count first, then fill reversed)
    int64_t count = 0;
    for (int64_t j = n; j > 0; j = back_pos[j]) ++count;
    if (count > out_cap) return -count;
    int64_t w = count;
    for (int64_t j = n; j > 0; j = back_pos[j]) out_ids[--w] = back_id[j];
    return count;
}

}  // extern "C"
