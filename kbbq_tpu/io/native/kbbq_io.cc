// kbbq-tpu native IO codec: multithreaded BGZF + FASTQ scanning.
//
// Reference analog: htslib's bgzf.c / kseq (SURVEY.md §3.1 C7).  The
// reference links htslib; this is our own TPU-host-side implementation
// (no htslib in this environment, SURVEY.md H7).  Exposed as a C ABI for
// ctypes (no pybind11 in this environment).
//
// Build: make -C kbbq_tpu/io/native   ->  libkbbq_io.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------- BGZF

struct BgzfBlock {
  size_t in_off;     // offset of compressed payload
  size_t in_len;     // compressed payload length
  size_t out_off;    // offset in decompressed stream
  uint32_t isize;    // uncompressed size
  uint32_t crc;
};

// Scan BGZF blocks. Returns number of blocks, or -1 on parse error.
// Fills per-block arrays (caller allocates to capacity cap).
static int64_t scan_blocks(const uint8_t* in, size_t n,
                           std::vector<BgzfBlock>& blocks,
                           size_t* total_out) {
  static const uint8_t EOF_MARKER[28] = {
      0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff, 0x06, 0x00,
      0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0, 0, 0, 0, 0,
      0, 0, 0, 0};
  size_t off = 0, out = 0;
  while (off < n) {
    if (n - off >= 28 && memcmp(in + off, EOF_MARKER, 28) == 0) {
      off += 28;
      continue;
    }
    if (n - off < 18) return -1;
    if (in[off] != 31 || in[off + 1] != 139 || in[off + 2] != 8 ||
        !(in[off + 3] & 4))
      return -1;
    uint16_t xlen;
    memcpy(&xlen, in + off + 10, 2);
    size_t xoff = off + 12, xend = xoff + xlen;
    int64_t bsize = -1;
    while (xoff + 4 <= xend) {
      uint8_t si1 = in[xoff], si2 = in[xoff + 1];
      uint16_t slen;
      memcpy(&slen, in + xoff + 2, 2);
      if (si1 == 66 && si2 == 67 && slen == 2) {
        uint16_t bs;
        memcpy(&bs, in + xoff + 4, 2);
        bsize = (int64_t)bs + 1;
      }
      xoff += 4 + slen;
    }
    if (bsize < 0 || off + (size_t)bsize > n) return -1;
    BgzfBlock b;
    b.in_off = off + 12 + xlen;
    b.in_len = (size_t)bsize - 12 - xlen - 8;
    memcpy(&b.crc, in + off + bsize - 8, 4);
    memcpy(&b.isize, in + off + bsize - 4, 4);
    b.out_off = out;
    out += b.isize;
    blocks.push_back(b);
    off += bsize;
  }
  *total_out = out;
  return (int64_t)blocks.size();
}

// Pass 1: report decompressed size (-1 = error).
int64_t kbbq_bgzf_size(const uint8_t* in, size_t n) {
  std::vector<BgzfBlock> blocks;
  size_t total = 0;
  if (scan_blocks(in, n, blocks, &total) < 0) return -1;
  return (int64_t)total;
}

// Pass 2: decompress all blocks into out (must be kbbq_bgzf_size bytes).
// Returns 0 on success.
int32_t kbbq_bgzf_decompress(const uint8_t* in, size_t n, uint8_t* out,
                             size_t out_len, int32_t nthreads) {
  std::vector<BgzfBlock> blocks;
  size_t total = 0;
  if (scan_blocks(in, n, blocks, &total) < 0 || total != out_len) return -1;
  if (nthreads < 1) nthreads = 1;
  std::vector<int32_t> errs(nthreads, 0);
  auto work = [&](int t) {
    for (size_t i = t; i < blocks.size(); i += nthreads) {
      const BgzfBlock& b = blocks[i];
      z_stream zs;
      memset(&zs, 0, sizeof zs);
      if (inflateInit2(&zs, -15) != Z_OK) { errs[t] = 1; return; }
      zs.next_in = const_cast<Bytef*>(in + b.in_off);
      zs.avail_in = (uInt)b.in_len;
      zs.next_out = out + b.out_off;
      zs.avail_out = b.isize;
      int r = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      if (r != Z_STREAM_END && !(r == Z_OK && b.isize == 0) &&
          !(r == Z_BUF_ERROR && b.isize == 0)) { errs[t] = 2; return; }
      if (crc32(0, out + b.out_off, b.isize) != b.crc) { errs[t] = 3; return; }
    }
  };
  std::vector<std::thread> ths;
  for (int t = 0; t < nthreads; t++) ths.emplace_back(work, t);
  for (auto& th : ths) th.join();
  for (int e : errs) if (e) return e;
  return 0;
}

// Compress into BGZF blocks (+ EOF). Caller provides out buffer of
// capacity out_cap; returns bytes written or -1 if out of space.
int64_t kbbq_bgzf_compress(const uint8_t* in, size_t n, uint8_t* out,
                           size_t out_cap, int32_t level,
                           int32_t nthreads) {
  const size_t CHUNK = 0xff00;
  size_t nblocks = (n + CHUNK - 1) / CHUNK;
  if (nblocks == 0) nblocks = 0;
  if (nthreads < 1) nthreads = 1;

  std::vector<std::vector<uint8_t>> outs(nblocks);
  std::vector<int32_t> errs(nthreads, 0);
  auto work = [&](int t) {
    for (size_t i = t; i < nblocks; i += nthreads) {
      size_t s = i * CHUNK;
      size_t len = (s + CHUNK <= n) ? CHUNK : n - s;
      uint8_t cbuf[0x11000];
      z_stream zs;
      memset(&zs, 0, sizeof zs);
      if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                       Z_DEFAULT_STRATEGY) != Z_OK) { errs[t] = 1; return; }
      zs.next_in = const_cast<Bytef*>(in + s);
      zs.avail_in = (uInt)len;
      zs.next_out = cbuf;
      zs.avail_out = sizeof cbuf;
      int r = deflate(&zs, Z_FINISH);
      size_t clen = sizeof cbuf - zs.avail_out;
      deflateEnd(&zs);
      if (r != Z_STREAM_END) { errs[t] = 2; return; }
      size_t bsize = clen + 12 + 6 + 8;
      std::vector<uint8_t>& o = outs[i];
      o.resize(bsize);
      uint8_t hdr[18] = {31, 139, 8, 4, 0, 0, 0, 0, 0, 255, 6, 0,
                         66, 67, 2, 0, 0, 0};
      uint16_t bs16 = (uint16_t)(bsize - 1);
      memcpy(hdr + 16, &bs16, 2);
      memcpy(o.data(), hdr, 18);
      memcpy(o.data() + 18, cbuf, clen);
      uint32_t crc = crc32(0, in + s, (uInt)len);
      uint32_t il = (uint32_t)len;
      memcpy(o.data() + 18 + clen, &crc, 4);
      memcpy(o.data() + 18 + clen + 4, &il, 4);
    }
  };
  std::vector<std::thread> ths;
  for (int t = 0; t < nthreads; t++) ths.emplace_back(work, t);
  for (auto& th : ths) th.join();
  for (int e : errs) if (e) return -2;

  static const uint8_t EOF_MARKER[28] = {
      0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff, 0x06, 0x00,
      0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0, 0, 0, 0, 0,
      0, 0, 0, 0};
  size_t pos = 0;
  for (auto& o : outs) {
    if (pos + o.size() > out_cap) return -1;
    memcpy(out + pos, o.data(), o.size());
    pos += o.size();
  }
  if (pos + 28 > out_cap) return -1;
  memcpy(out + pos, EOF_MARKER, 28);
  return (int64_t)(pos + 28);
}

// --------------------------------------------------------------- FASTQ

// Scan a FASTQ buffer for record line offsets.  Writes 8 int64 per
// record: name_start, name_end, seq_start, seq_end, plus_start(unused=0),
// 0, qual_start, qual_end.  Returns record count, or -1-errpos on error.
int64_t kbbq_fastq_index(const uint8_t* buf, size_t n, int64_t* out,
                         size_t cap_records) {
  size_t off = 0;
  int64_t nrec = 0;
  while (off < n) {
    if (buf[off] != '@') return -1;
    const uint8_t* p1 = (const uint8_t*)memchr(buf + off, '\n', n - off);
    if (!p1) return -1;
    size_t name_s = off + 1, name_e = p1 - buf;
    size_t seq_s = name_e + 1;
    const uint8_t* p2 = (const uint8_t*)memchr(buf + seq_s, '\n', n - seq_s);
    if (!p2) return -1;
    size_t seq_e = p2 - buf;
    size_t plus_s = seq_e + 1;
    if (plus_s >= n || buf[plus_s] != '+') return -1;
    const uint8_t* p3 = (const uint8_t*)memchr(buf + plus_s, '\n',
                                               n - plus_s);
    if (!p3) return -1;
    size_t qual_s = (p3 - buf) + 1;
    if (qual_s >= n) return -1;
    const uint8_t* p4 = (const uint8_t*)memchr(buf + qual_s, '\n',
                                               n - qual_s);
    size_t qual_e = p4 ? (size_t)(p4 - buf) : n;
    if (qual_e - qual_s != seq_e - seq_s) return -1;
    if ((size_t)nrec < cap_records) {
      int64_t* r = out + nrec * 8;
      r[0] = (int64_t)name_s; r[1] = (int64_t)name_e;
      r[2] = (int64_t)seq_s;  r[3] = (int64_t)seq_e;
      r[4] = 0;               r[5] = 0;
      r[6] = (int64_t)qual_s; r[7] = (int64_t)qual_e;
    }
    nrec++;
    off = qual_e + 1;
  }
  return nrec;
}

// ------------------------------------------------------- pass-4 recal
//
// Per-base recalibrated-quality gather (reference analog: the per-read
// qual rewrite in pub:src/kbbq/recalibrateutils.cc pass 4).  The device
// twin is ops/recal.py::apply_recal_table; the resident pipeline runs
// pass 4 on the host to avoid shipping [N, L] qualities back through the
// device link, and this native kernel replaces the NumPy fallback's ~10
// full-array temporaries with one fused pass (bit-identical by
// construction: all-integer math).
//
// recal: int8 [nrg, nq, nc, nd]; codes/quals int8 [N, L]; mask uint8
// [N, L]; rgs int32 [N]; seconds uint8 [N]; out int8 [N, L].
// min_usable_q / dinuc_invalid passed in so constants.py stays the
// single source of truth.
void kbbq_apply_recal(const int8_t* recal, int32_t nrg, int32_t nq,
                      int32_t nc, int32_t nd, const int8_t* codes,
                      const int8_t* quals, const uint8_t* mask,
                      const int32_t* rgs, const uint8_t* seconds,
                      int64_t N, int64_t L, int32_t min_usable_q,
                      int32_t dinuc_invalid, int8_t* out,
                      int32_t threads) {
  (void)nrg;
  if (threads < 1) threads = 1;
  auto work = [&](int64_t r0, int64_t r1) {
    for (int64_t i = r0; i < r1; i++) {
      const int8_t* c = codes + i * L;
      const int8_t* q = quals + i * L;
      const uint8_t* m = mask + i * L;
      int8_t* o = out + i * L;
      int32_t sec = seconds[i] ? 1 : 0;
      const int8_t* tab_rg = recal + (int64_t)rgs[i] * nq * nc * nd;
      int32_t prev = 4;
      for (int64_t j = 0; j < L; j++) {
        int32_t cj = c[j], q0 = q[j];
        if (!m[j] || cj == 4 || q0 < min_usable_q) {
          o[j] = (int8_t)q0;
          prev = cj;
          continue;
        }
        int32_t qc = q0 < 0 ? 0 : (q0 > nq - 1 ? nq - 1 : q0);
        int32_t cyc = (int32_t)(j * 2) + sec;
        int32_t din = (j > 0 && prev != 4 && cj != 4) ? prev * 4 + cj
                                                      : dinuc_invalid;
        o[j] = tab_rg[((int64_t)qc * nc + cyc) * nd + din];
        prev = cj;
      }
    }
  };
  if (threads == 1 || N < 4096) {
    work(0, N);
    return;
  }
  std::vector<std::thread> pool;
  int64_t step = (N + threads - 1) / threads;
  for (int32_t t = 0; t < threads; t++) {
    int64_t r0 = t * step, r1 = r0 + step > N ? N : r0 + step;
    if (r0 >= r1) break;
    pool.emplace_back(work, r0, r1);
  }
  for (auto& th : pool) th.join();
}

// ------------------------------------------------- host->device packers
//
// The device-resident pipeline ships 2-bit/4-bit palette indices instead
// of raw bytes (pipeline/resident.py).  The numpy version of this pack
// (LUT fancy-index + four shifted slices) costs ~1 s over 60 MB on this
// host and runs under the GIL, where it contends with the relay client's
// polling threads (measured 4x inflation while a pass-3 dispatch was in
// flight).  One fused multithreaded pass at memory bandwidth instead.

// 256-entry byte histogram (palette detection), threaded.
void kbbq_byte_hist(const uint8_t* in, int64_t n, int64_t* out,
                    int32_t threads) {
  if (threads < 1) threads = 1;
  std::vector<std::vector<int64_t>> part(threads,
                                         std::vector<int64_t>(256, 0));
  auto work = [&](int32_t t, int64_t r0, int64_t r1) {
    auto& h = part[t];
    for (int64_t i = r0; i < r1; i++) h[in[i]]++;
  };
  std::vector<std::thread> pool;
  int64_t step = (n + threads - 1) / threads;
  for (int32_t t = 0; t < threads; t++) {
    int64_t r0 = t * step, r1 = r0 + step > n ? n : r0 + step;
    if (r0 >= r1) break;
    pool.emplace_back(work, t, r0, r1);
  }
  for (auto& th : pool) th.join();
  for (int v = 0; v < 256; v++) {
    int64_t s = 0;
    for (auto& h : part) s += h[v];
    out[v] = s;
  }
}

// Fused LUT + quarter-plane 2-bit pack: out[i, j] = lut[in[i, j]]
//                                               | lut[in[i, j+Lq]] << 2
//                                               | lut[in[i, j+2Lq]] << 4
//                                               | lut[in[i, j+3Lq]] << 6
// where Lq = ceil(L/4) and columns past L read as 0 (same layout as
// pipeline/resident.py::_pack_quarters on the LUT-mapped array).
void kbbq_pack_lut2(const uint8_t* in, int64_t nrows, int64_t L,
                    const uint8_t* lut, uint8_t* out, int32_t threads) {
  if (threads < 1) threads = 1;
  int64_t Lq = (L + 3) / 4;
  auto get = [&](const uint8_t* row, int64_t j) -> uint8_t {
    return j < L ? lut[row[j]] : 0;
  };
  auto work = [&](int64_t r0, int64_t r1) {
    for (int64_t i = r0; i < r1; i++) {
      const uint8_t* row = in + i * L;
      uint8_t* o = out + i * Lq;
      for (int64_t j = 0; j < Lq; j++)
        o[j] = (uint8_t)(get(row, j) | (get(row, j + Lq) << 2) |
                         (get(row, j + 2 * Lq) << 4) |
                         (get(row, j + 3 * Lq) << 6));
    }
  };
  if (threads == 1 || nrows < 4096) {
    work(0, nrows);
    return;
  }
  std::vector<std::thread> pool;
  int64_t step = (nrows + threads - 1) / threads;
  for (int32_t t = 0; t < threads; t++) {
    int64_t r0 = t * step, r1 = r0 + step > nrows ? nrows : r0 + step;
    if (r0 >= r1) break;
    pool.emplace_back(work, r0, r1);
  }
  for (auto& th : pool) th.join();
}

// Fused LUT + half-plane 4-bit pack: out[i, j] = lut[in[i, j]]
//                                            | lut[in[i, j+Lh]] << 4,
// Lh = ceil(L/2); columns past L read as 0.
void kbbq_pack_lut4(const uint8_t* in, int64_t nrows, int64_t L,
                    const uint8_t* lut, uint8_t* out, int32_t threads) {
  if (threads < 1) threads = 1;
  int64_t Lh = (L + 1) / 2;
  auto get = [&](const uint8_t* row, int64_t j) -> uint8_t {
    return j < L ? lut[row[j]] : 0;
  };
  auto work = [&](int64_t r0, int64_t r1) {
    for (int64_t i = r0; i < r1; i++) {
      const uint8_t* row = in + i * L;
      uint8_t* o = out + i * Lh;
      for (int64_t j = 0; j < Lh; j++)
        o[j] = (uint8_t)(get(row, j) | (get(row, j + Lh) << 4));
    }
  };
  if (threads == 1 || nrows < 4096) {
    work(0, nrows);
    return;
  }
  std::vector<std::thread> pool;
  int64_t step = (nrows + threads - 1) / threads;
  for (int32_t t = 0; t < threads; t++) {
    int64_t r0 = t * step, r1 = r0 + step > nrows ? nrows : r0 + step;
    if (r0 >= r1) break;
    pool.emplace_back(work, r0, r1);
  }
  for (auto& th : pool) th.join();
}

// ------------------------------------------------ host covariate accum
//
// Pass-3 accumulate twin of ops/covariate.py::accumulate_covariates,
// run on the HOST over sparse device error indices so the [N, L]
// reported-quality array never crosses the device link at all (the
// palette-packed quals h2d was the single largest remaining transfer —
// ~1.9 s for 30 MB through the axon tunnel, inflating pass-1 wall ~4x).
// All-integer +1 counts in int64: bit-identical to the device MXU
// histogram under any order/threading (adds commute; SURVEY.md H5).
//
// err_idx: sorted unique flat indices i*L + j of walk-marked bases
// (n_err of them); tables are int64 [nrg, nq, nc] (cyc) and
// [nrg, nq, nd] (dinuc), zeroed by the caller.
void kbbq_accum_cov(const int8_t* codes, const int8_t* quals,
                    const uint8_t* mask, const int32_t* rgs,
                    const uint8_t* seconds, const uint32_t* err_idx,
                    int64_t n_err, int64_t N, int64_t L, int32_t nrg,
                    int32_t nq, int32_t nc, int32_t nd,
                    int32_t min_usable_q, int64_t* cyc_total,
                    int64_t* cyc_errors, int64_t* din_total,
                    int64_t* din_errors, int32_t threads) {
  if (threads < 1) threads = 1;
  const int64_t ncyc = (int64_t)nrg * nq * nc;
  const int64_t ndin = (int64_t)nrg * nq * nd;
  // per-thread partials; cap threads so partials stay under ~256 MB
  // when nrg is large
  while (threads > 1 &&
         (int64_t)threads * (ncyc + ndin) * 2 * 8 > (256LL << 20))
    threads--;
  if (N < 4096) threads = 1;
  std::vector<std::vector<int64_t>> part(
      threads, std::vector<int64_t>(2 * (ncyc + ndin), 0));
  auto work = [&](int32_t t, int64_t r0, int64_t r1) {
    int64_t* ct = part[t].data();
    int64_t* ce = ct + ncyc;
    int64_t* dt = ce + ncyc;
    int64_t* de = dt + ndin;
    // first error index at or past this thread's row range
    const uint32_t lo = (uint64_t)r0 * L > 0xFFFFFFFFull
                            ? 0xFFFFFFFFu
                            : (uint32_t)((uint64_t)r0 * L);
    int64_t e = std::lower_bound(err_idx, err_idx + n_err, lo) - err_idx;
    for (int64_t i = r0; i < r1; i++) {
      const int8_t* c = codes + i * L;
      const int8_t* q = quals + i * L;
      const uint8_t* m = mask + i * L;
      const int32_t sec = seconds[i] ? 1 : 0;
      const int64_t rq0 = (int64_t)rgs[i] * nq;
      int32_t prev = 4;
      const uint64_t base = (uint64_t)i * L;
      for (int64_t j = 0; j < L; j++) {
        const int32_t cj = c[j], q0 = q[j];
        bool iserr = false;
        if (e < n_err && err_idx[e] == base + (uint64_t)j) {
          iserr = true;
          e++;
        }
        if (!m[j] || cj == 4 || q0 < min_usable_q) {
          prev = cj;
          continue;
        }
        const int32_t qc = q0 < 0 ? 0 : (q0 > nq - 1 ? nq - 1 : q0);
        const int64_t rq = rq0 + qc;
        const int32_t cyc = (int32_t)(j * 2) + sec;
        ct[rq * nc + cyc]++;
        if (iserr) ce[rq * nc + cyc]++;
        if (j > 0 && prev != 4 && cj != 4) {
          const int32_t din = prev * 4 + cj;
          dt[rq * nd + din]++;
          if (iserr) de[rq * nd + din]++;
        }
        prev = cj;
      }
    }
  };
  if (threads == 1) {
    work(0, 0, N);
  } else {
    std::vector<std::thread> pool;
    int64_t step = (N + threads - 1) / threads;
    for (int32_t t = 0; t < threads; t++) {
      int64_t r0 = t * step, r1 = r0 + step > N ? N : r0 + step;
      if (r0 >= r1) break;
      pool.emplace_back(work, t, r0, r1);
    }
    for (auto& th : pool) th.join();
  }
  for (int32_t t = 0; t < threads; t++) {
    const int64_t* p = part[t].data();
    for (int64_t x = 0; x < ncyc; x++) cyc_total[x] += p[x];
    p += ncyc;
    for (int64_t x = 0; x < ncyc; x++) cyc_errors[x] += p[x];
    p += ncyc;
    for (int64_t x = 0; x < ndin; x++) din_total[x] += p[x];
    p += ndin;
    for (int64_t x = 0; x < ndin; x++) din_errors[x] += p[x];
  }
}

// Decode FASTQ records into padded [n, stride] arrays in one pass:
// codes via the caller's 256-entry encode LUT, quals = byte-33 clipped
// to [0,93], mask = j < len (padding: code 4 / qual 0 / mask 0).  The
// numpy path materialized two [n, stride] int64 index arrays per chunk
// (~70 ns/base); this is a straight LUT copy (~2 ns/base, threaded).
void kbbq_fastq_extract(const uint8_t* buf, const int64_t* seq_starts,
                        const int64_t* qual_starts, const int64_t* lens,
                        int64_t n, int32_t stride, const int8_t* enc_lut,
                        int8_t* codes, int8_t* quals, uint8_t* mask,
                        int32_t nthreads) {
  if (nthreads < 1 || n < 256) nthreads = 1;
  const int T = nthreads;
  auto work = [&](int t) {
    for (int64_t i = t; i < n; i += T) {
      const uint8_t* s = buf + seq_starts[i];
      const uint8_t* q = buf + qual_starts[i];
      int8_t* oc = codes + i * stride;
      int8_t* oq = quals + i * stride;
      uint8_t* om = mask + i * stride;
      int32_t L = (int32_t)lens[i];
      for (int32_t j = 0; j < L; j++) {
        oc[j] = enc_lut[s[j]];
        int v = (int)q[j] - 33;
        oq[j] = (int8_t)(v < 0 ? 0 : (v > 93 ? 93 : v));
        om[j] = 1;
      }
      for (int32_t j = L; j < stride; j++) {
        oc[j] = 4; oq[j] = 0; om[j] = 0;
      }
    }
  };
  if (T == 1) { work(0); return; }
  std::vector<std::thread> ths;
  for (int t = 0; t < T; t++) ths.emplace_back(work, t);
  for (auto& th : ths) th.join();
}

// Overwrite quality-line bytes in an output FASTQ buffer from padded
// [n, stride] int8 phred values (prefix-masked rows): the only-quals-
// change invariant's write side.
void kbbq_fastq_write_quals(uint8_t* out, const int64_t* qual_starts,
                            const int64_t* lens, const int8_t* new_quals,
                            int64_t n, int32_t stride, int32_t nthreads) {
  if (nthreads < 1 || n < 256) nthreads = 1;
  const int T = nthreads;
  auto work = [&](int t) {
    for (int64_t i = t; i < n; i += T) {
      uint8_t* o = out + qual_starts[i];
      const int8_t* q = new_quals + i * stride;
      int32_t L = (int32_t)lens[i];
      for (int32_t j = 0; j < L; j++) o[j] = (uint8_t)(q[j] + 33);
    }
  };
  if (T == 1) { work(0); return; }
  std::vector<std::thread> ths;
  for (int t = 0; t < T; t++) ths.emplace_back(work, t);
  for (auto& th : ths) th.join();
}

// ----------------------------------------------------------------- BAM

// Scan complete BAM records in buf[start..n): out_offs[i] = body offset,
// out_sizes[i] = body size.  Returns the record count (<= cap) and sets
// *end_out just past the last complete record.  Malformed size -> -1.
// (htslib walks this boundary per bam_read1 call; we index a whole
// decoded span at once so Python never loops per record.)
int64_t kbbq_bam_offsets(const uint8_t* buf, int64_t n, int64_t start,
                         int64_t* out_offs, int64_t* out_sizes,
                         int64_t cap, int64_t* end_out) {
  int64_t off = start, cnt = 0;
  while (off + 4 <= n && cnt < cap) {
    int32_t sz;
    memcpy(&sz, buf + off, 4);
    if (sz <= 0) return -1;
    if (off + 4 + sz > n) break;
    out_offs[cnt] = off + 4;
    out_sizes[cnt] = sz;
    off += 4 + (int64_t)sz;
    cnt++;
  }
  *end_out = off;
  return cnt;
}

// Decode a group of same-length BAM records' seq+qual into machine
// order (reverse-strand records reverse-complemented, quals reversed —
// kbbq's CReadData semantics, SURVEY.md C5).  seq_off/qual_off are
// per-record byte offsets into buf (qual_off may point at an OQ value
// when oq_mode=1: value bytes are phred+33).  Outputs are [nrec, L]
// int8 row-major with row stride out_stride.
void kbbq_bam_decode(const uint8_t* buf, const int64_t* seq_off,
                     const int64_t* qual_off, const uint8_t* rev,
                     int64_t nrec, int32_t L, int32_t oq_mode,
                     int8_t* out_codes, int8_t* out_quals,
                     int64_t out_stride, int32_t nthreads) {
  // 4-bit nibble -> 2-bit code (A=1,C=2,G=4,T=8 per SAM spec; else N=4)
  static const int8_t nib[16] = {4, 0, 1, 4, 2, 4, 4, 4,
                                 3, 4, 4, 4, 4, 4, 4, 4};
  if (nthreads < 1 || nrec < 1024) nthreads = 1;
  const int T = nthreads;
  auto work = [&](int t) {
    for (int64_t i = t; i < nrec; i += T) {
      const uint8_t* s = buf + seq_off[i];
      int8_t* oc = out_codes + i * out_stride;
      for (int32_t j = 0; j < L; j++) {
        uint8_t b = s[j >> 1];
        oc[j] = nib[(j & 1) ? (b & 0xF) : (b >> 4)];
      }
      const uint8_t* q = buf + qual_off[i];
      int8_t* oq = out_quals + i * out_stride;
      if (oq_mode) {
        for (int32_t j = 0; j < L; j++) {
          int v = (int)q[j] - 33;
          oq[j] = (int8_t)(v < 0 ? 0 : (v > 93 ? 93 : v));
        }
      } else {
        for (int32_t j = 0; j < L; j++)
          oq[j] = (int8_t)(q[j] > 93 ? 93 : q[j]);
      }
      if (rev[i]) {
        for (int32_t a = 0, b = L - 1; a < b; a++, b--) {
          int8_t c = oc[a]; oc[a] = oc[b]; oc[b] = c;
          c = oq[a]; oq[a] = oq[b]; oq[b] = c;
        }
        for (int32_t j = 0; j < L; j++)
          if (oc[j] < 4) oc[j] = (int8_t)(3 - oc[j]);
      }
    }
  };
  if (T == 1) {
    work(0);
    return;
  }
  std::vector<std::thread> ths;
  for (int t = 0; t < T; t++) ths.emplace_back(work, t);
  for (auto& th : ths) th.join();
}

}  // extern "C"
