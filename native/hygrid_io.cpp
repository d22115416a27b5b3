// hygrid_io: native raster tile loader with a threaded prefetch pool.
//
// The reference's raster runtime is the GDAL C library driven one
// synchronous ReadAsArray at a time (Image.py:89-107); its streaming tile
// interface is an empty stub (Image.py:81-88).  This is the TPU-native
// replacement: band-sequential raw rasters on disk, a pthread pool that
// preads tiles into a ring of reusable buffers ahead of the consumer, so
// host IO overlaps device compute (the loader feeds jax.device_put /
// tiled resampling).
//
// C API (ctypes-friendly, no C++ types across the boundary):
//   hg_loader_create(paths, nfiles, H, W, C, elem_size,
//                    tile_rows, tile_cols, nthreads, depth) -> handle
//   hg_loader_enqueue(handle, file_idx, row0, col0) -> ticket (>=0) or -1
//   hg_loader_next(handle, out_buf, meta[4]) -> ticket or -1
//       (blocks; returns tiles in ticket order; meta = {file, row0, col0,
//        valid_rows<<32 | valid_cols})
//   hg_loader_destroy(handle)
//
// Build: make -C native   (produces libhygrid_io.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

struct Request {
  int64_t ticket;
  int32_t file_idx;
  int64_t row0, col0;
};

struct Done {
  std::vector<uint8_t> data;
  int64_t file_idx, row0, col0, valid_rows, valid_cols;
};

struct Loader {
  std::vector<std::string> paths;
  std::vector<int> fds;
  int64_t H, W, C, esz, tr, tc;
  size_t tile_bytes;

  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::deque<Request> pending;
  std::map<int64_t, Done> done;  // ticket -> tile
  int64_t next_ticket = 0;
  int64_t next_out = 0;
  bool stopping = false;
  std::vector<std::thread> workers;

  ~Loader() {
    {
      std::lock_guard<std::mutex> l(mu);
      stopping = true;
    }
    cv_work.notify_all();
    for (auto& t : workers) t.join();
    for (int fd : fds)
      if (fd >= 0) close(fd);
  }

  void worker() {
    for (;;) {
      Request req;
      {
        std::unique_lock<std::mutex> l(mu);
        cv_work.wait(l, [&] { return stopping || !pending.empty(); });
        if (stopping && pending.empty()) return;
        req = pending.front();
        pending.pop_front();
      }
      Done d;
      d.file_idx = req.file_idx;
      d.row0 = req.row0;
      d.col0 = req.col0;
      d.valid_rows = std::max<int64_t>(
          0, std::min(tr, H - req.row0));
      d.valid_cols = std::max<int64_t>(
          0, std::min(tc, W - req.col0));
      d.data.assign(tile_bytes, 0);
      int fd = fds[req.file_idx];
      // band-sequential layout: C planes of H*W elements
      for (int64_t c = 0; c < C; ++c) {
        for (int64_t r = 0; r < d.valid_rows; ++r) {
          off_t off = (((c * H) + req.row0 + r) * W + req.col0) * esz;
          uint8_t* dst = d.data.data() +
                         ((c * tr + r) * tc) * esz;
          ssize_t want = d.valid_cols * esz;
          ssize_t got = pread(fd, dst, want, off);
          (void)got;  // short reads leave zero padding, matching edge tiles
        }
      }
      {
        std::lock_guard<std::mutex> l(mu);
        done.emplace(req.ticket, std::move(d));
      }
      cv_done.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* hg_loader_create(const char** paths, int32_t nfiles, int64_t H,
                       int64_t W, int64_t C, int32_t elem_size,
                       int64_t tile_rows, int64_t tile_cols,
                       int32_t nthreads, int32_t /*depth*/) {
  auto* L = new Loader();
  L->H = H;
  L->W = W;
  L->C = C;
  L->esz = elem_size;
  L->tr = tile_rows;
  L->tc = tile_cols;
  L->tile_bytes = (size_t)C * tile_rows * tile_cols * elem_size;
  for (int i = 0; i < nfiles; ++i) {
    L->paths.emplace_back(paths[i]);
    int fd = open(paths[i], O_RDONLY);
    if (fd < 0) {
      delete L;
      return nullptr;
    }
    L->fds.push_back(fd);
  }
  if (nthreads < 1) nthreads = 1;
  for (int i = 0; i < nthreads; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

int64_t hg_loader_enqueue(void* handle, int32_t file_idx, int64_t row0,
                          int64_t col0) {
  auto* L = static_cast<Loader*>(handle);
  if (!L || file_idx < 0 || file_idx >= (int32_t)L->fds.size()) return -1;
  int64_t ticket;
  {
    std::lock_guard<std::mutex> l(L->mu);
    ticket = L->next_ticket++;
    L->pending.push_back({ticket, file_idx, row0, col0});
  }
  L->cv_work.notify_one();
  return ticket;
}

int64_t hg_loader_next(void* handle, void* out, int64_t* meta) {
  auto* L = static_cast<Loader*>(handle);
  if (!L) return -1;
  std::unique_lock<std::mutex> l(L->mu);
  int64_t want = L->next_out;
  if (want >= L->next_ticket) return -1;  // nothing enqueued
  L->cv_done.wait(l, [&] { return L->done.count(want) > 0; });
  Done d = std::move(L->done[want]);
  L->done.erase(want);
  L->next_out++;
  l.unlock();
  memcpy(out, d.data.data(), L->tile_bytes);
  if (meta) {
    meta[0] = d.file_idx;
    meta[1] = d.row0;
    meta[2] = d.col0;
    meta[3] = (d.valid_rows << 32) | d.valid_cols;
  }
  return want;
}

void hg_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

// TIFF-variant LZW decode (Compression=5): MSB-first bit packing,
// ClearCode 256, EOI 257, 9->12-bit codes with the TIFF "early change".
// Exactly mirrors the pure-Python codec in image/codecs.py (_lzw_decode);
// the Python side prefers this (~100x) and falls back when the library is
// missing.  Returns bytes written, -1 if dst overflows, -2 on a corrupt
// stream (the Python twin raises there).
int64_t hg_lzw_decode(const uint8_t* src, int64_t n, uint8_t* dst,
                      int64_t cap) {
  static_assert(sizeof(int16_t) == 2, "");
  int16_t prev[4096];
  uint8_t suffix[4096], firstb[4096];
  int32_t length[4096];
  for (int i = 0; i < 256; ++i) {
    prev[i] = -1;
    suffix[i] = firstb[i] = (uint8_t)i;
    length[i] = 1;
  }
  int next = 258, width = 9;
  uint32_t buf = 0;
  int nbits = 0;
  int64_t pos = 0, out = 0;
  int prevcode = -1;

  auto emit = [&](int code) -> bool {
    int32_t l = length[code];
    if (out + l > cap) return false;
    int c = code;
    for (int32_t i = l - 1; i >= 0; --i) {
      dst[out + i] = suffix[c];
      c = prev[c];
    }
    out += l;
    return true;
  };

  while (true) {
    while (nbits < width) {
      if (pos >= n) return out;
      buf = (buf << 8) | src[pos++];
      nbits += 8;
    }
    int code = (int)((buf >> (nbits - width)) & ((1u << width) - 1));
    nbits -= width;
    if (code == 257) return out;  // EOI
    if (code == 256) {            // CLEAR
      next = 258;
      width = 9;
      prevcode = -1;
      continue;
    }
    if (prevcode < 0) {
      if (code >= next || code >= 256) return -2;  // first code is a literal
      if (!emit(code)) return -1;
      prevcode = code;
    } else if (code < next && code != 256 && code != 257) {
      if (next < 4096) {
        prev[next] = (int16_t)prevcode;
        suffix[next] = firstb[code];
        firstb[next] = firstb[prevcode];
        length[next] = length[prevcode] + 1;
        ++next;
      }
      if (!emit(code)) return -1;
      prevcode = code;
    } else if (code == next && next < 4096) {  // the KwKwK case
      prev[next] = (int16_t)prevcode;
      suffix[next] = firstb[prevcode];
      firstb[next] = firstb[prevcode];
      length[next] = length[prevcode] + 1;
      ++next;
      if (!emit(next - 1)) return -1;
      prevcode = next - 1;
    } else {
      return -2;
    }
    if (next == 511) width = 10;
    else if (next == 1023) width = 11;
    else if (next == 2047) width = 12;
  }
}

// Convenience: synchronous band-sequential raw raster write (used by the
// Python side to materialise .hgraw files).
int32_t hg_write_raw(const char* path, const void* data, int64_t nbytes) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  size_t n = fwrite(data, 1, (size_t)nbytes, f);
  fclose(f);
  return n == (size_t)nbytes ? 0 : -1;
}

}  // extern "C"
