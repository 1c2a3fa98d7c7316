// fastllama_tpu native runtime components (C ABI, loaded via ctypes).
//
// The TPU engine's compute path is JAX/XLA/Pallas; this library covers the
// host-side systems work the C++ reference keeps native: the tokenizer's
// greedy BPE merge loop (the per-request hot path of
// /root/reference/src/transformer/tokenizer.cpp:247-327 — semantics
// reimplemented, not translated) with an open-addressing string hashmap for
// vocab lookup (the role of the reference's FastHashMap, fasthashmap.hpp).
//
// Build: make -C csrc    ->  csrc/build/libftl_native.so
// Python fallback exists in fastllama_tpu/loaders/tokenizer.py; the binding
// (fastllama_tpu/loaders/native.py) verifies availability at import.

#include <cstddef>
#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// FNV-1a open-addressing map: string piece -> token id.  Sized at build time
// (vocab is immutable after construction), power-of-two buckets, linear
// probing.  ~3x faster than std::unordered_map<string,int> for short keys.
// ---------------------------------------------------------------------------
struct VocabMap {
    struct Slot {
        const char* key = nullptr;
        uint32_t len = 0;
        int32_t id = -1;
    };
    std::vector<Slot> slots;
    uint64_t mask = 0;

    static uint64_t hash(const char* s, size_t n) {
        uint64_t h = 1469598103934665603ull;
        for (size_t i = 0; i < n; ++i) {
            h ^= (unsigned char)s[i];
            h *= 1099511628211ull;
        }
        return h;
    }

    void build(size_t n_items) {
        size_t cap = 16;
        while (cap < n_items * 2) cap <<= 1;
        slots.assign(cap, Slot{});
        mask = cap - 1;
    }

    void insert(const char* key, uint32_t len, int32_t id) {
        uint64_t i = hash(key, len) & mask;
        while (slots[i].key != nullptr) {
            if (slots[i].len == len && memcmp(slots[i].key, key, len) == 0) {
                slots[i].id = id;  // last duplicate wins (dict semantics)
                return;
            }
            i = (i + 1) & mask;
        }
        slots[i] = Slot{key, len, id};
    }

    int32_t find(const char* key, size_t len) const {
        uint64_t i = hash(key, len) & mask;
        while (slots[i].key != nullptr) {
            if (slots[i].len == len && memcmp(slots[i].key, key, len) == 0)
                return slots[i].id;
            i = (i + 1) & mask;
        }
        return -1;
    }
};

struct Tokenizer {
    std::vector<std::string> texts;
    std::vector<float> scores;
    VocabMap map;
    int32_t underline_id = -1;

    int32_t lookup(const char* s, size_t n) const {
        // reference tokenizer.cpp:236-239: unconditional, even when -1
        if (n == 1 && s[0] == ' ') return underline_id;
        return map.find(s, n);
    }
};

}  // namespace

extern "C" {

// texts: concatenated UTF-8 pieces; offsets: n+1 cumulative byte offsets.
void* flt_tokenizer_new(const char* texts, const int64_t* offsets,
                        const float* scores, int64_t n,
                        const char* conn_tag) {
    auto* tk = new Tokenizer();
    tk->texts.reserve(n);
    tk->scores.assign(scores, scores + n);
    for (int64_t i = 0; i < n; ++i)
        tk->texts.emplace_back(texts + offsets[i], offsets[i + 1] - offsets[i]);
    tk->map.build(n);
    for (int64_t i = 0; i < n; ++i)
        tk->map.insert(tk->texts[i].data(), (uint32_t)tk->texts[i].size(),
                       (int32_t)i);
    // empty conn tag = no space->underline mapping (the reference's
    // llama2.c-bin path leaves _conn_tag unset)
    tk->underline_id = strlen(conn_tag)
        ? tk->map.find(conn_tag, strlen(conn_tag)) : -1;
    return tk;
}

void flt_tokenizer_free(void* h) { delete (Tokenizer*)h; }

// Greedy BPE encode; returns token count (<= max_out) or -1 on overflow.
// Semantics match the reference (tokenizer.cpp:247-327): UTF-8 chunking with
// byte fallback at id byte+3, then repeated highest-score adjacent merges.
int64_t flt_tokenizer_encode(void* h, const char* text, int64_t text_len,
                             int32_t bos_id, int32_t add_bos,
                             int32_t* out, int64_t max_out) {
    const auto* tk = (const Tokenizer*)h;
    std::vector<int32_t> toks;
    toks.reserve((size_t)text_len + 2);
    if (add_bos) toks.push_back(bos_id);

    // UTF-8 chunking + byte fallback
    for (int64_t i = 0; i < text_len;) {
        int64_t n = 1;
        while (i + n < text_len && (text[i + n] & 0xC0) == 0x80 && n < 4) ++n;
        int32_t id = tk->lookup(text + i, (size_t)n);
        if (id >= 0) {
            toks.push_back(id);
        } else {
            for (int64_t j = 0; j < n; ++j)
                toks.push_back((int32_t)(unsigned char)text[i + j] + 3);
        }
        i += n;
    }

    // greedy highest-score merge loop
    std::string buf;
    while (true) {
        float best_score = -1e10f;
        int32_t best_id = -1;
        std::ptrdiff_t best_idx = -1;
        for (size_t i = 0; i + 1 < toks.size(); ++i) {
            const auto& a = tk->texts[(size_t)toks[i]];
            const auto& b = tk->texts[(size_t)toks[i + 1]];
            buf.assign(a);
            buf.append(b);
            int32_t id = tk->lookup(buf.data(), buf.size());
            if (id != -1 && tk->scores[(size_t)id] > best_score) {
                best_score = tk->scores[(size_t)id];
                best_id = id;
                best_idx = (ptrdiff_t)i;
            }
        }
        if (best_idx < 0) break;
        toks[(size_t)best_idx] = best_id;
        toks.erase(toks.begin() + best_idx + 1);
    }

    if ((int64_t)toks.size() > max_out) return -1;
    memcpy(out, toks.data(), toks.size() * sizeof(int32_t));
    return (int64_t)toks.size();
}

}  // extern "C"
