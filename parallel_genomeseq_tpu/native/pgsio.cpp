// Native IO layer: the host-side C++ component of the framework.
//
// The reference's native surface is C++ end-to-end; on TPU the compute core
// is the Pallas kernel (compiled native by Mosaic), and this module provides
// the native host runtime for the data path, replacing:
//   - MPI_File_read_at_all fixed-record slicing (mpi_sw_solve_small.cpp:49-59)
//     -> pgs_read_records: positioned reads of fixed-size records with
//        per-process offset/count, no interpreter in the loop;
//   - the drivers' inline FASTA readers (sw_solve_small.cpp:20-31)
//     -> pgs_read_fasta: header-skipping, newline-stripping single pass;
//   - the ground-truth CSV parse (sw_solve_small.cpp:56-67)
//     -> pgs_parse_gt_csv: packs SEQ bytes into a fixed-stride matrix and
//        POS into an int64 vector;
//   - the align_output.csv writer (sw_solve_small.cpp:91-93)
//     -> pgs_write_align_output.
//
// Exposed as plain C symbols for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// Read a FASTA file: skip '>' header lines, strip newlines, concatenate.
// Returns sequence length, or -1 on error; writes at most cap bytes.
int64_t pgs_read_fasta(const char* path, char* out, int64_t cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t n = 0;
  char line[1 << 16];
  while (fgets(line, sizeof line, f)) {
    if (line[0] == '>') continue;
    for (char* p = line; *p; ++p) {
      if (*p == '\n' || *p == '\r') continue;
      if (n < cap) out[n] = *p;
      ++n;
    }
  }
  fclose(f);
  return n <= cap ? n : -2;  // -2: buffer too small (caller retries)
}

// Positioned fixed-record read: records of record_size bytes (payload +
// 1-byte newline terminator, like the reference's 126-byte read records).
// Copies n_rec records starting at start_rec into out (record_size-1 payload
// bytes per record, newline dropped). Returns records actually read.
int64_t pgs_read_records(const char* path, int64_t record_size,
                         int64_t start_rec, int64_t n_rec, uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, (long)(start_rec * record_size), SEEK_SET) != 0) {
    fclose(f);
    return -1;
  }
  std::vector<uint8_t> buf((size_t)record_size);
  int64_t got = 0;
  for (; got < n_rec; ++got) {
    size_t r = fread(buf.data(), 1, (size_t)record_size, f);
    if (r < (size_t)record_size - 1) break;  // allow missing final newline
    memcpy(out + got * (record_size - 1), buf.data(), (size_t)record_size - 1);
  }
  fclose(f);
  return got;
}

// Count fixed-size records in a file.
int64_t pgs_count_records(const char* path, int64_t record_size) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  int64_t size = ftell(f);
  fclose(f);
  return (size + record_size - 1) / record_size;
}

// Parse ground-truth CSV (header line, then index,QNAME,SEQ,POS rows).
// Packs SEQ into seq_out (row-major, stride seq_cap, NUL padded), lengths
// into len_out, POS into pos_out. Returns row count, or -1 on error,
// -2 if any SEQ exceeds seq_cap, -(3) if more than max_rows.
int64_t pgs_parse_gt_csv(const char* path, int64_t seq_cap, int64_t max_rows,
                         uint8_t* seq_out, int32_t* len_out, int64_t* pos_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[1 << 16];
  int64_t row = -1;  // header occupies the first line
  while (fgets(line, sizeof line, f)) {
    if (row >= max_rows) {
      fclose(f);
      return -3;
    }
    if (row >= 0) {
      // split: index,QNAME,SEQ,POS
      char* p = line;
      char* fields[4] = {nullptr, nullptr, nullptr, nullptr};
      int fi = 0;
      fields[fi++] = p;
      for (; *p && fi < 4; ++p) {
        if (*p == ',') {
          *p = 0;
          fields[fi++] = p + 1;
        }
      }
      if (fi < 4) {
        fclose(f);
        return -1;
      }
      const char* seq = fields[2];
      int64_t len = (int64_t)strlen(seq);
      if (len > seq_cap) {
        fclose(f);
        return -2;
      }
      memcpy(seq_out + row * seq_cap, seq, (size_t)len);
      len_out[row] = (int32_t)len;
      pos_out[row] = atoll(fields[3]);
    }
    ++row;
  }
  fclose(f);
  return row < 0 ? 0 : row;
}

// Write align_output.csv: echoes the input CSV rows with ", pos, score"
// appended (the reference driver's output format, sw_solve_small.cpp:91-93).
// scores are written without decimals when integral.
int64_t pgs_write_align_output(const char* in_path, const char* out_path,
                               const int64_t* pos, const double* score,
                               int64_t n) {
  FILE* fi = fopen(in_path, "rb");
  if (!fi) return -1;
  FILE* fo = fopen(out_path, "wb");
  if (!fo) {
    fclose(fi);
    return -1;
  }
  char line[1 << 16];
  int64_t row = -1;
  while (fgets(line, sizeof line, fi)) {
    size_t len = strlen(line);
    while (len && (line[len - 1] == '\n' || line[len - 1] == '\r')) line[--len] = 0;
    if (row == -1) {
      fprintf(fo, "%s,pos_pred,score\n", line);
    } else {
      if (row >= n) break;
      double s = score[row];
      if (s == (double)(int64_t)s) {
        fprintf(fo, "%s,%lld,%lld\n", line, (long long)pos[row], (long long)s);
      } else {
        fprintf(fo, "%s,%lld,%g\n", line, (long long)pos[row], s);
      }
    }
    ++row;
  }
  fclose(fi);
  fclose(fo);
  return row;
}

}  // extern "C"
