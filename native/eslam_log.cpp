// Binary sensor/trajectory log runtime for slam_eslam_tpu.
//
// Native-equivalent of the Rock/orogen logging infrastructure the
// reference ecosystem relies on for replaying robot traverses (the
// reference library itself is fed by orogen tasks outside the repo;
// its test harness synthesises data in-process).  This runtime provides:
//
//   * a compact, versioned, append-only binary log of typed records
//     (contact states, orientations, laser scans, ground-truth poses),
//   * an mmap-backed reader with an in-memory record index for O(1)
//     random access,
//   * an asynchronous double-buffered prefetcher (pthread worker) that
//     stages decoded frames into host buffers so the TPU feed path
//     never blocks on disk IO.
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (slam_eslam_tpu/io/logio.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <pthread.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x474c5345;  // "ESLG"
constexpr uint32_t kVersion = 1;

#pragma pack(push, 1)
struct FileHeader {
  uint32_t magic;
  uint32_t version;
};

struct RecordHeader {
  uint32_t type;
  uint32_t size;       // payload bytes
  uint64_t timestamp;  // nanoseconds
};
#pragma pack(pop)

enum RecordType : uint32_t {
  kContactState = 1,
  kOrientation = 2,
  kLaserScan = 3,
  kPose = 4,
  kDistanceImage = 5,
};

struct Writer {
  FILE* f = nullptr;
};

struct Record {
  RecordHeader hdr;
  const uint8_t* payload;
};

struct Reader {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;
  std::vector<Record> index;
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------- writer

void* eslam_log_writer_open(const char* path) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  FileHeader h{kMagic, kVersion};
  if (std::fwrite(&h, sizeof h, 1, f) != 1) {
    std::fclose(f);
    return nullptr;
  }
  auto* w = new Writer();
  w->f = f;
  return w;
}

int eslam_log_writer_append(void* handle, uint32_t type, uint64_t timestamp,
                            const void* payload, uint32_t size) {
  auto* w = static_cast<Writer*>(handle);
  if (!w || !w->f) return -1;
  RecordHeader rh{type, size, timestamp};
  if (std::fwrite(&rh, sizeof rh, 1, w->f) != 1) return -1;
  if (size && std::fwrite(payload, 1, size, w->f) != size) return -1;
  return 0;
}

void eslam_log_writer_close(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  if (!w) return;
  if (w->f) std::fclose(w->f);
  delete w;
}

// ---------------------------------------------------------------- reader

void* eslam_log_reader_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < sizeof(FileHeader)) {
    ::close(fd);
    return nullptr;
  }
  void* map = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  const auto* data = static_cast<const uint8_t*>(map);
  const auto* fh = reinterpret_cast<const FileHeader*>(data);
  if (fh->magic != kMagic || fh->version != kVersion) {
    ::munmap(map, st.st_size);
    ::close(fd);
    return nullptr;
  }

  auto* r = new Reader();
  r->fd = fd;
  r->data = data;
  r->size = st.st_size;

  size_t off = sizeof(FileHeader);
  while (off + sizeof(RecordHeader) <= r->size) {
    const auto* rh = reinterpret_cast<const RecordHeader*>(data + off);
    size_t end = off + sizeof(RecordHeader) + rh->size;
    if (end > r->size) break;  // truncated tail: ignore
    r->index.push_back(Record{*rh, data + off + sizeof(RecordHeader)});
    off = end;
  }
  return r;
}

int64_t eslam_log_reader_count(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  return r ? static_cast<int64_t>(r->index.size()) : -1;
}

// Fills type/timestamp/size for record i; returns payload pointer (valid
// until reader close) or null.
const void* eslam_log_reader_get(void* handle, int64_t i, uint32_t* type,
                                 uint64_t* timestamp, uint32_t* size) {
  auto* r = static_cast<Reader*>(handle);
  if (!r || i < 0 || i >= static_cast<int64_t>(r->index.size())) return nullptr;
  const Record& rec = r->index[i];
  if (type) *type = rec.hdr.type;
  if (timestamp) *timestamp = rec.hdr.timestamp;
  if (size) *size = rec.hdr.size;
  return rec.payload;
}

void eslam_log_reader_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  if (!r) return;
  if (r->data) ::munmap(const_cast<uint8_t*>(r->data), r->size);
  if (r->fd >= 0) ::close(r->fd);
  delete r;
}

// ---------------------------------------------------------- async feeder
//
// A pthread worker decodes/copies upcoming records into a ring of host
// buffers ahead of the consumer.  The consumer takes stable pointers —
// each slot stays valid until the consumer advances past it.

struct Feeder {
  Reader* reader = nullptr;
  size_t slots = 0;
  size_t slot_bytes = 0;
  std::vector<std::vector<uint8_t>> buffers;
  std::vector<RecordHeader> headers;
  // ring state
  int64_t head = 0;      // next record the worker will stage
  int64_t tail = 0;      // next record the consumer will take
  int64_t released = 0;  // records whose slots may be reused
  bool stop = false;
  pthread_t worker{};
  pthread_mutex_t mu = PTHREAD_MUTEX_INITIALIZER;
  pthread_cond_t cv_space = PTHREAD_COND_INITIALIZER;
  pthread_cond_t cv_data = PTHREAD_COND_INITIALIZER;
};

namespace {

void* feeder_main(void* arg) {
  auto* fd = static_cast<Feeder*>(arg);
  const int64_t n = static_cast<int64_t>(fd->reader->index.size());
  pthread_mutex_lock(&fd->mu);
  while (!fd->stop && fd->head < n) {
    while (!fd->stop &&
           fd->head - fd->released >= static_cast<int64_t>(fd->slots)) {
      pthread_cond_wait(&fd->cv_space, &fd->mu);
    }
    if (fd->stop || fd->head >= n) break;
    const int64_t i = fd->head;
    const Record& rec = fd->reader->index[i];
    pthread_mutex_unlock(&fd->mu);

    // copy outside the lock (the slot is not yet published)
    const size_t slot = static_cast<size_t>(i) % fd->slots;
    auto& buf = fd->buffers[slot];
    if (buf.size() < rec.hdr.size) buf.resize(rec.hdr.size);
    std::memcpy(buf.data(), rec.payload, rec.hdr.size);
    fd->headers[slot] = rec.hdr;

    pthread_mutex_lock(&fd->mu);
    fd->head = i + 1;
    pthread_cond_signal(&fd->cv_data);
  }
  pthread_mutex_unlock(&fd->mu);
  return nullptr;
}

}  // namespace

void* eslam_feeder_create(void* reader_handle, uint32_t slots) {
  auto* r = static_cast<Reader*>(reader_handle);
  if (!r || slots < 2) return nullptr;
  auto* fd = new Feeder();
  fd->reader = r;
  fd->slots = slots;
  fd->buffers.resize(slots);
  fd->headers.resize(slots);
  if (pthread_create(&fd->worker, nullptr, feeder_main, fd) != 0) {
    delete fd;
    return nullptr;
  }
  return fd;
}

// Blocks until the next record is staged; returns payload pointer, or
// null at end of log.  The pointer stays valid until the next call
// (the slot of record i is only released for reuse when i+1 is taken).
const void* eslam_feeder_next(void* handle, uint32_t* type,
                              uint64_t* timestamp, uint32_t* size) {
  auto* fd = static_cast<Feeder*>(handle);
  if (!fd) return nullptr;
  const int64_t n = static_cast<int64_t>(fd->reader->index.size());
  pthread_mutex_lock(&fd->mu);
  // release the previously returned record's slot
  if (fd->released < fd->tail) {
    fd->released = fd->tail;
    pthread_cond_signal(&fd->cv_space);
  }
  if (fd->tail >= n) {
    pthread_mutex_unlock(&fd->mu);
    return nullptr;
  }
  while (fd->head <= fd->tail && !fd->stop) {
    pthread_cond_wait(&fd->cv_data, &fd->mu);
  }
  const int64_t i = fd->tail;
  fd->tail = i + 1;
  pthread_mutex_unlock(&fd->mu);

  const size_t slot = static_cast<size_t>(i) % fd->slots;
  const RecordHeader& rh = fd->headers[slot];
  if (type) *type = rh.type;
  if (timestamp) *timestamp = rh.timestamp;
  if (size) *size = rh.size;
  return fd->buffers[slot].data();
}

void eslam_feeder_destroy(void* handle) {
  auto* fd = static_cast<Feeder*>(handle);
  if (!fd) return;
  pthread_mutex_lock(&fd->mu);
  fd->stop = true;
  pthread_cond_broadcast(&fd->cv_space);
  pthread_cond_broadcast(&fd->cv_data);
  pthread_mutex_unlock(&fd->mu);
  pthread_join(fd->worker, nullptr);
  delete fd;
}

}  // extern "C"
