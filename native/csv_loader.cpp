// Native columnar CSV loader.
//
// The host-side native piece of the storage layer (SURVEY.md §2: the
// reference's storage is native Rust over arrow-csv, reference
// src/storage/csv.rs:90-141 / src/function/table/read_csv.rs:17-198; this is
// the from-scratch C++ equivalent producing dense fixed-width columns +
// validity masks ready for device upload).
//
// Semantics mirror sqlrs_tpu/storage/csv.py (the always-available Python
// fallback and source of truth): RFC-4180 quoting with "" escaping, blank
// lines skipped, short rows padded with empty (NULL) fields, per-column type
// inference over the first INFER_ROWS data rows in the order
// Boolean > Int64 > Double > Date32 > Utf8, empty fields are NULL for
// non-utf8 columns and empty strings for utf8.
//
// C ABI (ctypes-friendly): csv_load() parses the whole file into an opaque
// result; accessors expose per-column typed buffers; csv_free() releases.
//
// Build: make -C native   (produces libsqlrs_csv.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cctype>
#include <string>
#include <vector>

namespace {

constexpr int kInferRows = 10;

enum TypeCode : int32_t {
  T_INT64 = 0,
  T_DOUBLE = 1,
  T_BOOL = 2,
  T_DATE32 = 3,
  T_UTF8 = 4,
};

struct Column {
  std::string name;
  int32_t type = T_UTF8;
  std::vector<int64_t> i64;
  std::vector<double> f64;
  std::vector<int32_t> i32;  // date32
  std::vector<uint8_t> b8;   // bool data
  std::vector<uint8_t> valid;
  // utf8: concatenated bytes + offsets (n+1)
  std::string bytes;
  std::vector<int64_t> offsets;
};

struct CsvResult {
  int64_t n_rows = 0;
  std::vector<Column> cols;
  std::string error;
};

// ---- field scanning ---------------------------------------------------------

// Parse the raw file into rows of fields (handles quotes, CRLF).
void split_rows(const std::string& text, char delim,
                std::vector<std::vector<std::string>>* rows) {
  std::vector<std::string> row;
  std::string field;
  bool in_quotes = false;
  bool field_started = false;
  size_t n = text.size();
  for (size_t i = 0; i < n; i++) {
    char c = text[i];
    if (in_quotes) {
      if (c == '"') {
        if (i + 1 < n && text[i + 1] == '"') {
          field += '"';
          i++;
        } else {
          in_quotes = false;
        }
      } else {
        field += c;
      }
      continue;
    }
    if (c == '"' ) {
      in_quotes = true;
      field_started = true;
      continue;
    }
    if (c == delim) {
      row.push_back(field);
      field.clear();
      field_started = false;
      continue;
    }
    if (c == '\r') continue;
    if (c == '\n') {
      if (!row.empty() || !field.empty() || field_started) {
        row.push_back(field);
        rows->push_back(std::move(row));
        row.clear();
        field.clear();
        field_started = false;
      }
      // blank line: skipped entirely (arrow-csv behavior)
      continue;
    }
    field += c;
    field_started = true;
  }
  if (!row.empty() || !field.empty() || field_started) {
    row.push_back(field);
    rows->push_back(std::move(row));
  }
}

// ---- type inference ----------------------------------------------------------

bool is_int(const std::string& s) {
  if (s.empty()) return false;
  size_t i = (s[0] == '-') ? 1 : 0;
  if (i == s.size()) return false;
  for (; i < s.size(); i++)
    if (!isdigit(static_cast<unsigned char>(s[i]))) return false;
  return true;
}

bool is_float(const std::string& s) {
  if (s.empty()) return false;
  char* end = nullptr;
  strtod(s.c_str(), &end);
  return end == s.c_str() + s.size();
}

bool is_bool(const std::string& s) {
  return s == "true" || s == "false" || s == "True" || s == "False" ||
         s == "TRUE" || s == "FALSE";
}

bool is_date(const std::string& s) {
  if (s.size() != 10 || s[4] != '-' || s[7] != '-') return false;
  for (int i : {0, 1, 2, 3, 5, 6, 8, 9})
    if (!isdigit(static_cast<unsigned char>(s[i]))) return false;
  return true;
}

int32_t infer_type(const std::vector<std::vector<std::string>>& rows,
                   size_t col, size_t limit) {
  bool any = false, all_b = true, all_i = true, all_f = true, all_d = true;
  for (size_t r = 0; r < rows.size() && r < limit; r++) {
    const std::string& v = col < rows[r].size() ? rows[r][col] : std::string();
    if (v.empty()) continue;
    any = true;
    all_b = all_b && is_bool(v);
    all_i = all_i && is_int(v);
    all_f = all_f && is_float(v);
    all_d = all_d && is_date(v);
  }
  if (!any) return T_UTF8;
  if (all_b) return T_BOOL;
  if (all_i) return T_INT64;
  if (all_f) return T_DOUBLE;
  if (all_d) return T_DATE32;
  return T_UTF8;
}

// days since unix epoch (Howard Hinnant's civil-date algorithm, matching
// sqlrs_tpu/types/values.py days_from_civil)
int32_t days_from_civil(int y, int m, int d) {
  y -= m <= 2;
  int era = (y >= 0 ? y : y - 399) / 400;
  int yoe = y - era * 400;
  int doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
  int doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
  return era * 146097 + doe - 719468;
}

}  // namespace

extern "C" {

void* csv_load(const char* path, char delim, int has_header) {
  auto* res = new CsvResult();
  FILE* f = fopen(path, "rb");
  if (!f) {
    res->error = "cannot open file";
    return res;
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string text(size, '\0');
  size_t rd = fread(text.data(), 1, size, f);
  fclose(f);
  text.resize(rd);

  std::vector<std::vector<std::string>> rows;
  split_rows(text, delim, &rows);
  if (rows.empty()) {
    res->error = "empty csv file";
    return res;
  }

  size_t ncols = rows[0].size();
  size_t first_data = 0;
  std::vector<std::string> names;
  if (has_header) {
    for (auto& h : rows[0]) {
      // trim
      size_t a = h.find_first_not_of(" \t");
      size_t b = h.find_last_not_of(" \t");
      names.push_back(a == std::string::npos ? "" : h.substr(a, b - a + 1));
    }
    first_data = 1;
  } else {
    for (size_t i = 0; i < ncols; i++)
      names.push_back("column_" + std::to_string(i + 1));
  }
  size_t n = rows.size() - first_data;
  res->n_rows = static_cast<int64_t>(n);
  res->cols.resize(ncols);

  for (size_t c = 0; c < ncols; c++) {
    Column& col = res->cols[c];
    col.name = names[c];
    // inference over first kInferRows data rows
    std::vector<std::vector<std::string>> sample(
        rows.begin() + first_data,
        rows.begin() + first_data + std::min(n, static_cast<size_t>(kInferRows)));
    col.type = infer_type(sample, c, kInferRows);
    col.valid.assign(n, 1);
    switch (col.type) {
      case T_INT64: col.i64.assign(n, 0); break;
      case T_DOUBLE: col.f64.assign(n, 0.0); break;
      case T_BOOL: col.b8.assign(n, 0); break;
      case T_DATE32: col.i32.assign(n, 0); break;
      case T_UTF8: col.offsets.assign(1, 0); break;
    }
    for (size_t r = 0; r < n; r++) {
      const std::vector<std::string>& row = rows[first_data + r];
      const std::string v = c < row.size() ? row[c] : std::string();
      if (col.type == T_UTF8) {
        col.bytes += v;
        col.offsets.push_back(static_cast<int64_t>(col.bytes.size()));
        continue;  // empty string stays valid "" for utf8
      }
      if (v.empty()) {
        col.valid[r] = 0;
        continue;
      }
      switch (col.type) {
        case T_INT64:
          if (!is_int(v)) { res->error = "invalid integer at row " + std::to_string(r); return res; }
          col.i64[r] = strtoll(v.c_str(), nullptr, 10);
          break;
        case T_DOUBLE:
          col.f64[r] = strtod(v.c_str(), nullptr);
          break;
        case T_BOOL:
          col.b8[r] = (v == "true" || v == "True" || v == "TRUE") ? 1 : 0;
          break;
        case T_DATE32: {
          int y = atoi(v.substr(0, 4).c_str());
          int m = atoi(v.substr(5, 2).c_str());
          int d = atoi(v.substr(8, 2).c_str());
          col.i32[r] = days_from_civil(y, m, d);
          break;
        }
        default: break;
      }
    }
  }
  return res;
}

const char* csv_error(void* h) {
  auto* r = static_cast<CsvResult*>(h);
  return r->error.empty() ? nullptr : r->error.c_str();
}

int64_t csv_num_rows(void* h) { return static_cast<CsvResult*>(h)->n_rows; }
int64_t csv_num_cols(void* h) {
  return static_cast<int64_t>(static_cast<CsvResult*>(h)->cols.size());
}
const char* csv_col_name(void* h, int64_t i) {
  return static_cast<CsvResult*>(h)->cols[i].name.c_str();
}
int32_t csv_col_type(void* h, int64_t i) {
  return static_cast<CsvResult*>(h)->cols[i].type;
}
const void* csv_col_data(void* h, int64_t i) {
  Column& c = static_cast<CsvResult*>(h)->cols[i];
  switch (c.type) {
    case T_INT64: return c.i64.data();
    case T_DOUBLE: return c.f64.data();
    case T_BOOL: return c.b8.data();
    case T_DATE32: return c.i32.data();
    default: return nullptr;
  }
}
const uint8_t* csv_col_valid(void* h, int64_t i) {
  return static_cast<CsvResult*>(h)->cols[i].valid.data();
}
const char* csv_col_str_bytes(void* h, int64_t i) {
  return static_cast<CsvResult*>(h)->cols[i].bytes.data();
}
const int64_t* csv_col_str_offsets(void* h, int64_t i) {
  return static_cast<CsvResult*>(h)->cols[i].offsets.data();
}
void csv_free(void* h) { delete static_cast<CsvResult*>(h); }

}  // extern "C"
