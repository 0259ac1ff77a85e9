// Native TFRecord IO: CRC32C (Castagnoli, slice-by-8) + record indexing.
//
// The reference leans on TensorFlow's C++ tf.data runtime for its input
// pipeline; this is the equivalent native surface for the TPU framework's
// TF-free reader (tf_eager_object_detection_tpu/data/tfrecord.py): checksum
// computation and one-pass record indexing run in C++, python slices records
// out of a memory view. Built by native/build.sh into libtfrecord_io.so and
// loaded via ctypes (pure-python fallback stays in place).

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

uint32_t kTable[8][256];
bool kInit = false;

void init_tables() {
  if (kInit) return;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
    kTable[0][i] = c;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = kTable[0][i];
    for (int s = 1; s < 8; ++s) {
      c = kTable[0][c & 0xFF] ^ (c >> 8);
      kTable[s][i] = c;
    }
  }
  kInit = true;
}

uint32_t crc32c_impl(const uint8_t* data, size_t n, uint32_t crc) {
  init_tables();
  crc = ~crc;
  while (n >= 8) {
    uint64_t w;
    memcpy(&w, data, 8);
    w ^= crc;
    crc = kTable[7][w & 0xFF] ^ kTable[6][(w >> 8) & 0xFF] ^
          kTable[5][(w >> 16) & 0xFF] ^ kTable[4][(w >> 24) & 0xFF] ^
          kTable[3][(w >> 32) & 0xFF] ^ kTable[2][(w >> 40) & 0xFF] ^
          kTable[1][(w >> 48) & 0xFF] ^ kTable[0][(w >> 56) & 0xFF];
    data += 8;
    n -= 8;
  }
  while (n--) crc = kTable[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
  return ~crc;
}

}  // namespace

extern "C" {

uint32_t crc32c(const uint8_t* data, uint64_t n) {
  return crc32c_impl(data, static_cast<size_t>(n), 0);
}

uint32_t masked_crc32c(const uint8_t* data, uint64_t n) {
  uint32_t c = crc32c_impl(data, static_cast<size_t>(n), 0);
  return ((c >> 15) | (c << 17)) + 0xA282EAD8u;
}

// Index the records of a TFRecord file: writes (payload offset, length)
// pairs. Call with capacity 0 to get the record count. Returns the number
// of records, or -1 on framing error / unreadable file. verify != 0 checks
// both CRCs of every record.
int64_t tfrecord_index(const char* path, uint64_t* offsets, uint64_t* lengths,
                       int64_t capacity, int verify) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t count = 0;
  uint8_t header[12];
  // buffer reused for payloads when verifying
  uint8_t* buf = nullptr;
  size_t buf_cap = 0;
  while (true) {
    size_t got = fread(header, 1, 12, f);
    if (got == 0) break;  // clean EOF
    if (got != 12) { count = -1; break; }
    uint64_t len;
    uint32_t hcrc;
    memcpy(&len, header, 8);
    memcpy(&hcrc, header + 8, 4);
    if (verify && masked_crc32c(header, 8) != hcrc) { count = -1; break; }
    long payload_off = ftell(f);
    if (count < capacity) {
      offsets[count] = static_cast<uint64_t>(payload_off);
      lengths[count] = len;
    }
    if (verify) {
      if (len > buf_cap) {
        delete[] buf;
        buf = new uint8_t[len];
        buf_cap = len;
      }
      if (fread(buf, 1, len, f) != len) { count = -1; break; }
      uint8_t tail[4];
      if (fread(tail, 1, 4, f) != 4) { count = -1; break; }
      uint32_t dcrc;
      memcpy(&dcrc, tail, 4);
      if (masked_crc32c(buf, len) != dcrc) { count = -1; break; }
    } else {
      if (fseek(f, static_cast<long>(len) + 4, SEEK_CUR) != 0) { count = -1; break; }
    }
    ++count;
  }
  delete[] buf;
  fclose(f);
  return count;
}

}  // extern "C"
