// Native IO runtime for vectordb_tpu: binary WAL framing and snapshot
// writing with fsync + atomic rename. Plays the role of the reference
// engine's C++ persistence layer (table_segment_mvp.cpp:939-1010 atomic
// snapshot writes, write_ahead_log.hpp:71-91 append path) for the TPU
// engine; loaded from Python via ctypes (see vectordb_tpu/native.py).
//
// Build: make -C native   (produces libvdbnative.so)

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/stat.h>
#include <sys/uio.h>
#include <unistd.h>

namespace {

// CRC-32 (IEEE, zlib-compatible), table-based.
uint32_t crc_table[256];
bool crc_init_done = false;

void crc_init() {
  if (crc_init_done) return;
  for (uint32_t n = 0; n < 256; n++) {
    uint32_t c = n;
    for (int k = 0; k < 8; k++)
      c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc_table[n] = c;
  }
  crc_init_done = true;
}

uint32_t crc32_ieee(const uint8_t* buf, uint64_t len) {
  crc_init();
  uint32_t c = 0xFFFFFFFFu;
  for (uint64_t i = 0; i < len; i++)
    c = crc_table[(c ^ buf[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

int write_all(int fd, const uint8_t* data, uint64_t len) {
  while (len > 0) {
    ssize_t w = ::write(fd, data, len);
    if (w < 0) {
      if (errno == EINTR) continue;
      return -errno;
    }
    data += w;
    len -= static_cast<uint64_t>(w);
  }
  return 0;
}

}  // namespace

extern "C" {

// Append one framed WAL entry: <u64 id><u8 type><u32 crc><u64 len><payload>.
// fd is the (already open, append-mode) binary log file descriptor.
// Returns 0 on success, -errno on failure.
int vdb_wal_append(int fd, uint64_t id, uint8_t type,
                   const uint8_t* payload, uint64_t len, int do_fsync) {
  uint8_t head[21];
  std::memcpy(head, &id, 8);
  head[8] = type;
  uint32_t crc = crc32_ieee(payload, len);
  std::memcpy(head + 9, &crc, 4);
  std::memcpy(head + 13, &len, 8);
  struct iovec iov[2];
  iov[0].iov_base = head;
  iov[0].iov_len = sizeof(head);
  iov[1].iov_base = const_cast<uint8_t*>(payload);
  iov[1].iov_len = len;
  uint64_t total = sizeof(head) + len;
  uint64_t written = 0;
  int iov_idx = 0;
  uint64_t iov_off = 0;
  while (written < total) {
    ssize_t w = ::writev(fd, iov + iov_idx, 2 - iov_idx);
    if (w < 0) {
      if (errno == EINTR) continue;
      return -errno;
    }
    written += static_cast<uint64_t>(w);
    // Advance iovecs.
    uint64_t adv = static_cast<uint64_t>(w) + iov_off;
    while (iov_idx < 2 && adv >= iov[iov_idx].iov_len) {
      adv -= iov[iov_idx].iov_len;
      iov_idx++;
    }
    if (iov_idx < 2) {
      iov[iov_idx].iov_base =
          static_cast<uint8_t*>(iov[iov_idx].iov_base) + adv;
      iov[iov_idx].iov_len -= adv;
      iov_off = 0;
    }
  }
  if (do_fsync) {
    if (::fsync(fd) != 0) return -errno;
  }
  return 0;
}

// Write a snapshot file atomically: header bytes + n data sections are
// written to "<path>.tmp", fsync'd, then renamed over path (the reference's
// tmp+rename+fsync discipline, table_segment_mvp.cpp:946-1004).
// Returns total bytes written, or -errno.
int64_t vdb_snapshot_write(const char* path, const uint8_t* header,
                           uint64_t header_len, const uint8_t** sections,
                           const uint64_t* lens, int n_sections) {
  std::string tmp = std::string(path) + ".tmp";
  int fd = ::open(tmp.c_str(), O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return -errno;
  int64_t total = 0;
  int rc = write_all(fd, header, header_len);
  total += static_cast<int64_t>(header_len);
  for (int i = 0; rc == 0 && i < n_sections; i++) {
    rc = write_all(fd, sections[i], lens[i]);
    total += static_cast<int64_t>(lens[i]);
  }
  if (rc == 0 && ::fsync(fd) != 0) rc = -errno;
  if (::close(fd) != 0 && rc == 0) rc = -errno;
  if (rc != 0) {
    ::unlink(tmp.c_str());
    return rc;
  }
  if (::rename(tmp.c_str(), path) != 0) {
    int e = -errno;
    ::unlink(tmp.c_str());
    return e;
  }
  return total;
}

// Read an entire file into a caller-provided buffer (size from
// vdb_file_size). Returns bytes read or -errno.
int64_t vdb_file_size(const char* path) {
  struct stat st;
  if (::stat(path, &st) != 0) return -errno;
  return static_cast<int64_t>(st.st_size);
}

int64_t vdb_file_read(const char* path, uint8_t* buf, uint64_t cap) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -errno;
  int64_t total = 0;
  while (static_cast<uint64_t>(total) < cap) {
    ssize_t r = ::read(fd, buf + total, cap - total);
    if (r < 0) {
      if (errno == EINTR) continue;
      int e = -errno;
      ::close(fd);
      return e;
    }
    if (r == 0) break;
    total += r;
  }
  ::close(fd);
  return total;
}

uint32_t vdb_crc32(const uint8_t* buf, uint64_t len) {
  return crc32_ieee(buf, len);
}

// Reverse-edge insertion for graph construction (the role of the reference
// NSG InterInsert, nsg.cpp:583-653): for every forward edge u -> v, append
// u into v's free adjacency slots, rank-capped at r_total. adjacency is
// [n, r_total] int32 with forward edges already in the first `degree`
// columns (-1 padding). fill_out is [n] int32 receiving the final edge
// counts. One linear pass over the edge list.
void vdb_reverse_edges(const int32_t* fwd, int64_t n, int degree,
                       int r_total, int32_t* adjacency, int32_t* fill_out) {
  for (int64_t u = 0; u < n; u++) {
    int c = 0;
    const int32_t* row = adjacency + u * r_total;
    while (c < degree && row[c] >= 0) c++;
    fill_out[u] = c;
  }
  for (int64_t u = 0; u < n; u++) {
    const int32_t* row = fwd + u * static_cast<int64_t>(degree);
    for (int e = 0; e < degree; e++) {
      int32_t v = row[e];
      if (v < 0) break;
      int32_t f = fill_out[v];
      if (f < r_total) {
        adjacency[static_cast<int64_t>(v) * r_total + f] =
            static_cast<int32_t>(u);
        fill_out[v] = f + 1;
      }
    }
  }
}

// Incremental BFS reachability over a padded adjacency matrix (the role
// of the reference NSG connectivity check, nsg.cpp:687-775). Marks every
// row reachable from `seeds` in `reached` ([n] u8, 1 = reached; rows
// already 1 are not re-expanded, so repeated calls absorb new components
// incrementally). Returns the number of NEWLY reached rows. queue is a
// caller-provided [n] int32 scratch buffer. The numpy equivalent
// materializes an [frontier, r_total] gather + sort per level — ~GBs of
// temporaries at 10M rows; this is one linear pass over the edges.
int64_t vdb_bfs_reach(const int32_t* adjacency, int64_t n, int r_total,
                      const int32_t* seeds, int64_t n_seeds,
                      uint8_t* reached, int32_t* queue) {
  int64_t head = 0, tail = 0, newly = 0;
  for (int64_t i = 0; i < n_seeds; i++) {
    int32_t s = seeds[i];
    if (s < 0 || s >= n || reached[s]) continue;
    reached[s] = 1;
    queue[tail++] = s;
    newly++;
  }
  while (head < tail) {
    int64_t u = queue[head++];
    const int32_t* row = adjacency + u * r_total;
    for (int e = 0; e < r_total; e++) {
      int32_t v = row[e];
      if (v < 0 || v >= n) continue;
      if (!reached[v]) {
        reached[v] = 1;
        queue[tail++] = v;
        newly++;
      }
    }
  }
  return newly;
}

}  // extern "C"
