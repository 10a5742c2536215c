// Packed record file format + mmap reader for production training IO.
//
// Role in the framework: the reference feeds training from thousands of
// small image files through torch DataLoader worker processes (native C++
// underneath). The TPU-native equivalent packs preprocessed records into
// one sequential file and serves random access over mmap — zero-copy,
// OS-page-cached, no per-item open()/stat() syscalls, CRC-checked.
//
// Format:
//   header:  8 bytes magic "H3DRREC1"
//   record:  u64 little-endian payload length
//            u32 little-endian CRC32 (IEEE) of the payload
//            payload bytes
//
// C ABI (driven from Python via ctypes; see data/recordio.py):
//   writer:  rio_writer_open / rio_write / rio_writer_close
//   reader:  rio_reader_open (builds the offset index)
//            rio_num_records / rio_record_size
//            rio_read  -> copies payload, returns -2 on CRC mismatch
//            rio_reader_close

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'H', '3', 'D', 'R', 'R', 'E', 'C', '1'};

uint32_t crc32_ieee(const uint8_t* data, size_t n) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      table[i] = c;
    }
    init = true;
  }
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i) c = table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

struct Writer {
  FILE* f = nullptr;
};

struct Reader {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  std::vector<size_t> offsets;  // payload offsets
  std::vector<size_t> lengths;
  std::vector<uint32_t> crcs;
};

}  // namespace

extern "C" {

void* rio_writer_open(const char* path) {
  FILE* f = fopen(path, "wb");
  if (!f) return nullptr;
  if (fwrite(kMagic, 1, 8, f) != 8) {
    fclose(f);
    return nullptr;
  }
  auto* w = new Writer();
  w->f = f;
  return w;
}

long rio_write(void* handle, const char* buf, long n) {
  auto* w = static_cast<Writer*>(handle);
  if (!w || !w->f || n < 0) return -1;
  uint64_t len = static_cast<uint64_t>(n);
  uint32_t crc = crc32_ieee(reinterpret_cast<const uint8_t*>(buf), n);
  if (fwrite(&len, 8, 1, w->f) != 1) return -1;
  if (fwrite(&crc, 4, 1, w->f) != 1) return -1;
  if (n > 0 && fwrite(buf, 1, n, w->f) != static_cast<size_t>(n)) return -1;
  return n;
}

void rio_writer_close(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  if (w) {
    if (w->f) fclose(w->f);
    delete w;
  }
}

void* rio_reader_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 8) {
    close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  const uint8_t* p = static_cast<const uint8_t*>(base);
  if (memcmp(p, kMagic, 8) != 0) {
    munmap(base, st.st_size);
    close(fd);
    return nullptr;
  }
  auto* r = new Reader();
  r->fd = fd;
  r->base = p;
  r->size = st.st_size;
  size_t off = 8;
  while (off + 12 <= r->size) {
    uint64_t len;
    uint32_t crc;
    memcpy(&len, p + off, 8);
    memcpy(&crc, p + off + 8, 4);
    off += 12;
    if (off + len > r->size) break;  // truncated tail: stop at last full record
    r->offsets.push_back(off);
    r->lengths.push_back(len);
    r->crcs.push_back(crc);
    off += len;
  }
  return r;
}

long rio_num_records(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  return r ? static_cast<long>(r->offsets.size()) : -1;
}

long rio_record_size(void* handle, long i) {
  auto* r = static_cast<Reader*>(handle);
  if (!r || i < 0 || i >= static_cast<long>(r->offsets.size())) return -1;
  return static_cast<long>(r->lengths[i]);
}

// Returns bytes copied, -1 on bad args, -2 on CRC mismatch.
long rio_read(void* handle, long i, char* out, long cap) {
  auto* r = static_cast<Reader*>(handle);
  if (!r || i < 0 || i >= static_cast<long>(r->offsets.size())) return -1;
  size_t len = r->lengths[i];
  if (cap < static_cast<long>(len)) return -1;
  const uint8_t* src = r->base + r->offsets[i];
  if (crc32_ieee(src, len) != r->crcs[i]) return -2;
  memcpy(out, src, len);
  return static_cast<long>(len);
}

void rio_reader_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  if (r) {
    if (r->base) munmap(const_cast<uint8_t*>(r->base), r->size);
    if (r->fd >= 0) close(r->fd);
    delete r;
  }
}

}  // extern "C"
