// Native string interner: the host-side hash map behind the engine's global
// string dictionary (sqlrs_tpu/data/strings.py).
//
// The reference keeps strings as native Arrow Utf8 arrays (reference
// src/types/mod.rs:23); this engine dictionary-encodes every distinct string
// to an int32 code so device arrays never hold bytes. Code assignment is the
// one per-distinct-string host loop in the bulk-load path, and a Python dict
// insert per distinct value dominated TPC-H SF1 ingest (millions of
// near-unique comment strings). This interner owns the bytes->code map in
// C++: one pass over a numpy 'U' (UCS4) buffer assigns codes in
// first-appearance order at ~100M+ strings/s, and Python only materializes
// the value list for rendering.
//
// Keys are the UCS4 code-unit bytes trimmed at the first NUL (identical to
// Python str identity for NUL-free strings; Python singles encode via
// 'utf-32-le'). The map is process-global and append-only, matching the
// engine's dictionary semantics (codes are globally comparable).
//
// Build: make -C native   (produces libsqlrs_intern.so)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Entry {
  uint64_t hash = 0;
  uint64_t offset = 0;  // into arena (byte offset)
  uint32_t len = 0;     // bytes
  int32_t code = -1;    // -1 = empty slot
};

struct Interner {
  std::vector<Entry> slots;
  std::vector<char> arena;
  int64_t count = 0;

  Interner() { slots.resize(1 << 16); }

  static uint64_t hash_bytes(const char* p, size_t n) {
    // FNV-1a 64
    uint64_t h = 1469598103934665603ull;
    for (size_t i = 0; i < n; i++) {
      h ^= (unsigned char)p[i];
      h *= 1099511628211ull;
    }
    // finalize (splitmix-style) so linear probing sees spread bits
    h ^= h >> 33;
    h *= 0xff51afd7ed558ccdull;
    h ^= h >> 33;
    return h;
  }

  void grow() {
    std::vector<Entry> old;
    old.swap(slots);
    slots.resize(old.size() * 2);
    size_t mask = slots.size() - 1;
    for (const Entry& e : old) {
      if (e.code < 0) continue;
      size_t i = e.hash & mask;
      while (slots[i].code >= 0) i = (i + 1) & mask;
      slots[i] = e;
    }
  }

  // returns code; *is_new set when freshly assigned (code == next expected)
  int32_t intern(const char* p, size_t n, int32_t next_code, int* is_new) {
    if (count * 2 >= (int64_t)slots.size()) grow();
    uint64_t h = hash_bytes(p, n);
    size_t mask = slots.size() - 1;
    size_t i = h & mask;
    while (true) {
      Entry& e = slots[i];
      if (e.code < 0) {
        e.hash = h;
        e.offset = arena.size();
        e.len = (uint32_t)n;
        e.code = next_code;
        arena.insert(arena.end(), p, p + n);
        count++;
        *is_new = 1;
        return next_code;
      }
      if (e.hash == h && e.len == n &&
          memcmp(arena.data() + e.offset, p, n) == 0) {
        *is_new = 0;
        return e.code;
      }
      i = (i + 1) & mask;
    }
  }
};

Interner g_interner;

}  // namespace

extern "C" {

// Bulk-intern n fixed-width UCS4 rows (numpy 'U<width>' buffer). Codes are
// assigned in first-appearance order starting at next_code. codes_out: n
// int32. new_rows_out (caller-allocated, capacity n): input row index of
// each NEW string, in code order. Returns the number of new strings.
int64_t sqlrs_intern_bulk_ucs4(const uint32_t* data, int64_t n,
                               int64_t width, int32_t next_code,
                               int32_t* codes_out, int64_t* new_rows_out) {
  int64_t n_new = 0;
  for (int64_t r = 0; r < n; r++) {
    const uint32_t* row = data + r * width;
    int64_t len = 0;
    while (len < width && row[len] != 0) len++;
    int is_new = 0;
    int32_t code = g_interner.intern((const char*)row, (size_t)len * 4,
                                     next_code + (int32_t)n_new, &is_new);
    codes_out[r] = code;
    if (is_new) {
      new_rows_out[n_new] = r;
      n_new++;
    }
  }
  return n_new;
}

// Single intern of UCS4 bytes (Python side encodes str via 'utf-32-le').
// Sets *is_new; when new, the assigned code is next_code.
int32_t sqlrs_intern_one(const char* bytes, int64_t n_bytes,
                         int32_t next_code, int32_t* is_new) {
  int tmp = 0;
  int32_t code = g_interner.intern(bytes, (size_t)n_bytes, next_code, &tmp);
  *is_new = tmp;
  return code;
}

int64_t sqlrs_intern_count() { return g_interner.count; }

}  // extern "C"
