// Native packed-shard reader for the subgc_tpu production input path.
//
// Replaces per-image zip+pickle decodes (the reference's HybridLoader,
// dataloaders/dataloader.py:14-37) with an mmap'ed fixed-record shard
// (format: subgc_tpu/data/packed.py).  The reader exposes zero-copy
// pointers into the mapping through a C ABI for ctypes; records are padded
// at pack time so no per-item work happens at load.

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kMagic = 0x5355424743504B31ULL;

struct Header {
  uint64_t magic;
  uint32_t n_images, obj_num, rel_num, feat_dim;
  uint32_t n_obj_cls, n_rel_cls, max_subg, reserved;
  uint64_t record_size;
};

struct Shard {
  int fd = -1;
  const uint8_t* base = nullptr;   // whole file
  size_t size = 0;
  Header hdr{};
  const uint8_t* records() const { return base + 64; }
};

}  // namespace

extern "C" {

// Open a shard; returns an opaque handle or nullptr.
void* subgc_packed_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
  if ((size_t)st.st_size < 64) { close(fd); return nullptr; }  // < header
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (mem == MAP_FAILED) { close(fd); return nullptr; }
  auto* sh = new Shard();
  sh->fd = fd;
  sh->base = (const uint8_t*)mem;
  sh->size = st.st_size;
  memcpy(&sh->hdr, sh->base, sizeof(Header) < 48 ? sizeof(Header) : 48);
  // overflow-safe record-bound check: reject rather than let a corrupt
  // header's n_images * record_size wrap past the mapped size
  if (sh->hdr.magic != kMagic || sh->hdr.record_size == 0 ||
      (size_t)sh->hdr.n_images >
          ((size_t)st.st_size - 64) / sh->hdr.record_size) {
    munmap(mem, st.st_size);
    close(fd);
    delete sh;
    return nullptr;
  }
  // advise the kernel we'll read records randomly
  madvise(mem, st.st_size, MADV_RANDOM);
  return sh;
}

void subgc_packed_close(void* handle) {
  auto* sh = (Shard*)handle;
  if (!sh) return;
  munmap((void*)sh->base, sh->size);
  close(sh->fd);
  delete sh;
}

uint32_t subgc_packed_count(void* handle) {
  return ((Shard*)handle)->hdr.n_images;
}

// Copy the 48-byte header into out (n_images, dims, record_size).
void subgc_packed_header(void* handle, uint8_t* out) {
  memcpy(out, ((Shard*)handle)->base, 48);
}

// Pointer to record i (zero-copy; valid while the shard stays open).
const uint8_t* subgc_packed_record(void* handle, uint32_t i) {
  auto* sh = (Shard*)handle;
  if (i >= sh->hdr.n_images) return nullptr;
  return sh->records() + (size_t)i * sh->hdr.record_size;
}

// Gather all img_ids into out[n_images] (one pass, sequential).
void subgc_packed_ids(void* handle, int64_t* out) {
  auto* sh = (Shard*)handle;
  for (uint32_t i = 0; i < sh->hdr.n_images; i++)
    memcpy(&out[i], subgc_packed_record(handle, i), sizeof(int64_t));
}

// Batched gather: copy the records at indices[0..n) contiguously into out.
// The copy runs in-native (one memcpy per record) so python overhead is
// one call per batch, not per field.  Returns the number of rows copied:
// an out-of-range index stops the gather (the caller raises) instead of
// memcpy'ing from a null record pointer.
uint32_t subgc_packed_gather(void* handle, const uint32_t* indices,
                             uint32_t n, uint8_t* out) {
  auto* sh = (Shard*)handle;
  const size_t rs = sh->hdr.record_size;
  for (uint32_t j = 0; j < n; j++) {
    const uint8_t* rec = subgc_packed_record(handle, indices[j]);
    if (!rec) return j;
    memcpy(out + (size_t)j * rs, rec, rs);
  }
  return n;
}

}  // extern "C"
