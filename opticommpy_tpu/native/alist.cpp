// Fast ALIST parity-check-matrix parser (native data loader).
//
// The reference ships ~39 MB of ALIST code matrices (optic/comm/ALIST/,
// consumed by fec.py:811 readAlist) and parses them with a per-line Python
// loop; at DVB-S2 size (64800 columns) that costs seconds per file. This
// loader tokenizes the whole file in one pass and returns the nonzero
// support as (row, col) int32 edge arrays — the exact structure the BP
// decoder's graph builder wants — in tens of milliseconds.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this environment).
// Build: g++ -O2 -shared -fPIC alist.cpp -o libalist.so

#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

struct AlistData {
  int n;        // columns (variable nodes)
  int m;        // rows (check nodes)
  int max_col;  // max variable-node degree
  int max_row;  // max check-node degree
  long long nnz;
  int* rows;  // edge row indices, 0-based
  int* cols;  // edge col indices, 0-based
};

// Parse `path`; returns NULL on any I/O or format error. The caller must
// release the result with alist_free().
AlistData* alist_parse(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return NULL;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size <= 0) {
    fclose(f);
    return NULL;
  }
  char* buf = (char*)malloc((size_t)size + 1);
  if (!buf) {
    fclose(f);
    return NULL;
  }
  size_t rd = fread(buf, 1, (size_t)size, f);
  fclose(f);
  buf[rd] = '\0';

  // Tokenize line-by-line, mirroring the line semantics of the reference
  // reader (fec.py:811): skip blank lines; within the n variable-node lines,
  // every positive integer is a check-row index (1-based), zeros are padding.
  char* p = buf;
  char* end = buf + rd;
  AlistData* out = NULL;
  int n = 0, m = 0, max_col = 0, max_row = 0;
  int header_vals[4];
  int header_cnt = 0;
  int line_idx = 0;  // index over non-blank lines
  long long cap = 0, nnz = 0;
  int* rows = NULL;
  int* cols = NULL;

  while (p < end) {
    // find line extent
    char* q = p;
    while (q < end && *q != '\n') q++;
    // parse ints in [p, q)
    bool blank = true;
    char* s = p;
    while (s < q) {
      while (s < q && (*s == ' ' || *s == '\t' || *s == '\r')) s++;
      if (s >= q) break;
      bool neg = false;
      if (*s == '-') {
        neg = true;
        s++;
      }
      if (*s < '0' || *s > '9') goto fail;  // non-numeric token
      long v = 0;
      while (s < q && *s >= '0' && *s <= '9') v = v * 10 + (*s++ - '0');
      if (neg) v = -v;
      blank = false;
      // dispatch by logical line index
      if (line_idx == 0 || line_idx == 1) {
        if (header_cnt < 4) header_vals[header_cnt++] = (int)v;
      } else if (line_idx >= 4 && line_idx < 4 + n) {
        if (v > 0) {
          if (v > m) goto fail;
          if (nnz == cap) {
            cap = cap ? cap * 2 : 4096;
            rows = (int*)realloc(rows, sizeof(int) * (size_t)cap);
            cols = (int*)realloc(cols, sizeof(int) * (size_t)cap);
            if (!rows || !cols) goto fail;
          }
          rows[nnz] = (int)v - 1;
          cols[nnz] = line_idx - 4;
          nnz++;
        }
      }
      // degree lines (2, 3) and check-node lines (redundant) are skipped
    }
    if (!blank) {
      line_idx++;
      if (line_idx == 2) {
        if (header_cnt < 4) goto fail;
        n = header_vals[0];
        m = header_vals[1];
        max_col = header_vals[2];
        max_row = header_vals[3];
        if (n <= 0 || m <= 0) goto fail;
      }
    }
    p = q + 1;
  }
  if (line_idx < 4 + n) goto fail;  // truncated file

  out = (AlistData*)malloc(sizeof(AlistData));
  if (!out) goto fail;
  out->n = n;
  out->m = m;
  out->max_col = max_col;
  out->max_row = max_row;
  out->nnz = nnz;
  out->rows = rows;
  out->cols = cols;
  free(buf);
  return out;

fail:
  free(rows);
  free(cols);
  free(buf);
  return NULL;
}

void alist_free(AlistData* d) {
  if (!d) return;
  free(d->rows);
  free(d->cols);
  free(d);
}

}  // extern "C"
