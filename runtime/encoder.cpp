// Fast word-level corpus encoder.
//
// The corpus is whitespace-separated node-id tokens plus a closed special
// set; bulk tokenization of a large pool (reddit-scale: ~10^6 lines) is a
// hot host-side path on every trainer start. This replaces the per-line
// Python dict lookups with a single pass over a contiguous text buffer
// and one hash lookup per token (reference equivalent:
// tokenizers.WordLevel via utils/tokenizer.py:10-68 — a Rust wheel the
// TPU build does not depend on).
//
// C ABI, consumed through ctypes (rag4dyg_tpu/utils/native.py).

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Encoder {
  std::unordered_map<std::string, int32_t> vocab;
};

}  // namespace

extern "C" {

// vocab_buf: all token strings joined by '\n' (ids = position order).
void* enc_create(const char* vocab_buf, int32_t n_tokens) {
  auto* enc = new Encoder();
  enc->vocab.reserve(static_cast<size_t>(n_tokens) * 2);
  const char* p = vocab_buf;
  for (int32_t i = 0; i < n_tokens; ++i) {
    const char* nl = std::strchr(p, '\n');
    size_t len = nl ? static_cast<size_t>(nl - p) : std::strlen(p);
    enc->vocab.emplace(std::string(p, len), i);
    if (!nl) break;
    p = nl + 1;
  }
  return enc;
}

void enc_destroy(void* handle) { delete static_cast<Encoder*>(handle); }

// Encode n_lines lines; line i spans text[line_offsets[i],
// line_offsets[i+1]) (so line_offsets has n_lines+1 entries). Tokens
// beyond max_len are LEFT-truncated (keep the trailing max_len — the
// reference's truncation_side='left'). Writes ids row-major into
// out_ids[n_lines][out_stride] and lengths into out_lens. Returns 0, or
// 1-based line number of the first line containing an unknown token.
int64_t enc_encode_batch(void* handle, const char* text,
                         const int64_t* line_offsets, int64_t n_lines,
                         int32_t max_len, int32_t* out_ids,
                         int32_t* out_lens, int32_t out_stride) {
  const auto& vocab = static_cast<Encoder*>(handle)->vocab;
  std::vector<int32_t> ids;
  for (int64_t li = 0; li < n_lines; ++li) {
    const char* p = text + line_offsets[li];
    const char* end = text + line_offsets[li + 1];
    ids.clear();
    while (p < end) {
      while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' ||
                         *p == '\n'))
        ++p;
      const char* tok = p;
      while (p < end && *p != ' ' && *p != '\t' && *p != '\r' && *p != '\n')
        ++p;
      if (p == tok) break;
      auto it = vocab.find(std::string(tok, static_cast<size_t>(p - tok)));
      if (it == vocab.end()) return li + 1;  // unknown token
      ids.push_back(it->second);
    }
    size_t n = ids.size();
    size_t start = 0;
    if (max_len > 0 && n > static_cast<size_t>(max_len)) {
      start = n - static_cast<size_t>(max_len);  // left truncation
      n = static_cast<size_t>(max_len);
    }
    out_lens[li] = static_cast<int32_t>(n);
    int32_t* row = out_ids + li * out_stride;
    for (size_t j = 0; j < n; ++j) row[j] = ids[start + j];
  }
  return 0;
}

}  // extern "C"
