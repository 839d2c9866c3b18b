// Native host-ingest library: GZIP TFRecord reader + SequenceExample decoder.
//
// TPU-native replacement for the TF C++ tf.data runtime the reference leans
// on (TFRecordDataset(compression='GZIP') + parse_single_sequence_example,
// /root/reference/dataloader/outdoor_data_mfcc.py:62,297). One call decodes
// one per-second shard file (12 frames of acoustic image / raw audio /
// video bytes) straight into caller-provided NumPy buffers — no Python
// allocations, no protobuf runtime, no TF. Exposed to Python via ctypes
// (acoustic_image_generation_tpu/data/native.py); the pure-Python codec in
// data/proto.py is the behavioral reference and test oracle.
//
// Wire format notes:
//  - TFRecord framing: u64 length | u32 masked crc32c | payload | u32 crc.
//    CRC verification is optional (off by default on the hot path; the
//    gzip stream already carries a CRC32 of the uncompressed data).
//  - SequenceExample subset (written by convert_data.py:247-279):
//      1: context   { 1: map entry { 1: key, 2: Feature } }
//      2: feature_lists { 1: map entry { 1: key, 2: FeatureList { 1: Feature } } }
//      Feature: 1: BytesList { 1: bytes }, 3: Int64List { 1: varint }.
//
// Build: g++ -O3 -march=native -shared -fPIC ingest.cc -o libaig_ingest.so -lz

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ----------------------------------------------------------------- errors

thread_local std::string g_error;

int fail(const std::string& msg) {
  g_error = msg;
  return -1;
}

// ----------------------------------------------------------------- crc32c
//
// TFRecord framing checksums use CRC32-C (Castagnoli, reflected poly
// 0x82F63B78) with the "masked" form ((crc >> 15 | crc << 17) + 0xa282ead8).
// Slicing-by-8 table implementation; tables built eagerly at load time
// (a static initializer) — decode_file_into runs on multiple loader
// threads with the GIL released, so a lazy first-use flag would race.

uint32_t g_crc_tab[8][256];

int crc32c_init() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c >> 1) ^ (0x82F63B78u & (0u - (c & 1)));
    g_crc_tab[0][i] = c;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = g_crc_tab[0][i];
    for (int t = 1; t < 8; ++t) {
      c = g_crc_tab[0][c & 0xFF] ^ (c >> 8);
      g_crc_tab[t][i] = c;
    }
  }
  return 0;
}

const int g_crc_init_done = crc32c_init();

uint32_t crc32c(const uint8_t* p, size_t len) {
  uint32_t c = 0xFFFFFFFFu;
  while (len >= 8) {
    uint32_t lo;
    uint32_t hi;
    std::memcpy(&lo, p, 4);
    std::memcpy(&hi, p + 4, 4);
    lo ^= c;
    c = g_crc_tab[7][lo & 0xFF] ^ g_crc_tab[6][(lo >> 8) & 0xFF] ^
        g_crc_tab[5][(lo >> 16) & 0xFF] ^ g_crc_tab[4][lo >> 24] ^
        g_crc_tab[3][hi & 0xFF] ^ g_crc_tab[2][(hi >> 8) & 0xFF] ^
        g_crc_tab[1][(hi >> 16) & 0xFF] ^ g_crc_tab[0][hi >> 24];
    p += 8;
    len -= 8;
  }
  while (len--) c = g_crc_tab[0][(c ^ *p++) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

uint32_t masked_crc32c(const uint8_t* p, size_t len) {
  uint32_t c = crc32c(p, len);
  return ((c >> 15) | (c << 17)) + 0xa282ead8u;
}

// ------------------------------------------------------------ gzip inflate

// Read a shard into memory, inflating when gzip-compressed (detected by
// magic bytes; uncompressed re-shards skip the zlib cost entirely).
// Returns 0 on success.
int read_gzip_file(const char* path, std::vector<uint8_t>* out) {
  FILE* raw = fopen(path, "rb");
  if (!raw) return fail(std::string("cannot open ") + path);
  uint8_t magic[2] = {0, 0};
  size_t got = fread(magic, 1, 2, raw);
  bool gz = got == 2 && magic[0] == 0x1f && magic[1] == 0x8b;
  out->clear();
  if (!gz) {
    // plain TFRecord file: slurp it
    fseek(raw, 0, SEEK_END);
    long size = ftell(raw);
    fseek(raw, 0, SEEK_SET);
    out->resize(size_t(size));
    size_t rd = fread(out->data(), 1, size_t(size), raw);
    fclose(raw);
    if (rd != size_t(size)) return fail(std::string("short read ") + path);
    return 0;
  }
  fclose(raw);
  gzFile f = gzopen(path, "rb");
  if (!f) return fail(std::string("cannot open ") + path);
  gzbuffer(f, 1 << 20);
  out->reserve(1 << 22);
  uint8_t chunk[1 << 20];
  int n;
  while ((n = gzread(f, chunk, sizeof(chunk))) > 0) {
    out->insert(out->end(), chunk, chunk + n);
  }
  int err = 0;
  gzerror(f, &err);
  gzclose(f);
  if (n < 0 || err != Z_OK) return fail(std::string("gzip error in ") + path);
  return 0;
}

// ------------------------------------------------------------ proto decode

struct Slice {
  const uint8_t* p;
  size_t len;
};

bool read_varint(const uint8_t*& p, const uint8_t* end, uint64_t* v) {
  uint64_t result = 0;
  int shift = 0;
  while (p < end) {
    uint8_t b = *p++;
    result |= uint64_t(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *v = result;
      return true;
    }
    shift += 7;
    if (shift > 63) return false;
  }
  return false;
}

bool read_tag(const uint8_t*& p, const uint8_t* end, uint32_t* field,
              uint32_t* wire) {
  uint64_t tag;
  if (!read_varint(p, end, &tag)) return false;
  *field = uint32_t(tag >> 3);
  *wire = uint32_t(tag & 7);
  return true;
}

bool read_len_delimited(const uint8_t*& p, const uint8_t* end, Slice* s) {
  uint64_t len;
  if (!read_varint(p, end, &len)) return false;
  if (p + len > end) return false;
  s->p = p;
  s->len = size_t(len);
  p += len;
  return true;
}

bool skip_field(const uint8_t*& p, const uint8_t* end, uint32_t wire) {
  switch (wire) {
    case 0: {  // varint
      uint64_t v;
      return read_varint(p, end, &v);
    }
    case 1:  // fixed64
      if (p + 8 > end) return false;
      p += 8;
      return true;
    case 2: {  // length-delimited
      Slice s;
      return read_len_delimited(p, end, &s);
    }
    case 5:  // fixed32
      if (p + 4 > end) return false;
      p += 4;
      return true;
    default:
      return false;
  }
}

// Feature { 1: BytesList {1: bytes}, 2: FloatList, 3: Int64List {1: varint} }
// Extract first bytes value and/or first int64 value.
bool parse_feature(Slice feat, Slice* bytes_out, int64_t* int_out,
                   bool* has_bytes, bool* has_int) {
  const uint8_t* p = feat.p;
  const uint8_t* end = feat.p + feat.len;
  *has_bytes = false;
  *has_int = false;
  uint32_t field, wire;
  while (p < end && read_tag(p, end, &field, &wire)) {
    if (field == 1 && wire == 2) {  // BytesList
      Slice bl;
      if (!read_len_delimited(p, end, &bl)) return false;
      const uint8_t* q = bl.p;
      const uint8_t* qend = bl.p + bl.len;
      uint32_t f2, w2;
      while (q < qend && read_tag(q, qend, &f2, &w2)) {
        if (f2 == 1 && w2 == 2) {
          if (!read_len_delimited(q, qend, bytes_out)) return false;
          *has_bytes = true;
        } else if (!skip_field(q, qend, w2)) {
          return false;
        }
      }
    } else if (field == 3 && wire == 2) {  // Int64List
      Slice il;
      if (!read_len_delimited(p, end, &il)) return false;
      const uint8_t* q = il.p;
      const uint8_t* qend = il.p + il.len;
      uint32_t f2, w2;
      while (q < qend && read_tag(q, qend, &f2, &w2)) {
        if (f2 == 1 && w2 == 0) {  // unpacked varint
          uint64_t v;
          if (!read_varint(q, qend, &v)) return false;
          *int_out = int64_t(v);
          *has_int = true;
        } else if (f2 == 1 && w2 == 2) {  // packed varints
          Slice packed;
          if (!read_len_delimited(q, qend, &packed)) return false;
          const uint8_t* r = packed.p;
          const uint8_t* rend = packed.p + packed.len;
          uint64_t v;
          while (r < rend && read_varint(r, rend, &v)) {
            *int_out = int64_t(v);
            *has_int = true;
          }
        } else if (!skip_field(q, qend, w2)) {
          return false;
        }
      }
    } else if (!skip_field(p, end, wire)) {
      return false;
    }
  }
  return true;
}

struct DecodeTargets {
  // caller buffers (already offset to this record's frame range)
  float* acoustic;
  int64_t acoustic_bytes;  // capacity in bytes
  int32_t* audio;
  int64_t audio_bytes;
  uint8_t* video;
  int64_t video_bytes;
  int32_t* action;
  int32_t* location;
  int32_t* frames_acoustic;
  int32_t* frames_audio;
  int32_t* frames_video;
  // running byte offsets so multi-record files append frames
  int64_t* acoustic_off;
  int64_t* audio_off;
  int64_t* video_off;
};

// FeatureList { repeated Feature feature = 1 } — append every bytes payload
// into dst (contiguous frames).
bool parse_feature_list(Slice fl, uint8_t* dst, int64_t cap, int64_t* written,
                        int32_t* frames) {
  const uint8_t* p = fl.p;
  const uint8_t* end = fl.p + fl.len;
  uint32_t field, wire;
  while (p < end && read_tag(p, end, &field, &wire)) {
    if (field == 1 && wire == 2) {
      Slice feat;
      if (!read_len_delimited(p, end, &feat)) return false;
      Slice bytes;
      int64_t iv;
      bool hb, hi;
      if (!parse_feature(feat, &bytes, &iv, &hb, &hi)) return false;
      if (hb) {
        if (*written + int64_t(bytes.len) > cap) return false;
        std::memcpy(dst + *written, bytes.p, bytes.len);
        *written += int64_t(bytes.len);
        (*frames)++;
      }
    } else if (!skip_field(p, end, wire)) {
      return false;
    }
  }
  return true;
}

bool key_is(Slice key, const char* name) {
  size_t n = std::strlen(name);
  return key.len == n && std::memcmp(key.p, name, n) == 0;
}

// Decode one SequenceExample payload.
int decode_sequence_example(const uint8_t* buf, size_t len,
                            const DecodeTargets& t) {
  const uint8_t* p = buf;
  const uint8_t* end = buf + len;
  uint32_t field, wire;
  while (p < end && read_tag(p, end, &field, &wire)) {
    if (field == 1 && wire == 2) {  // context Features
      Slice ctx;
      if (!read_len_delimited(p, end, &ctx)) return fail("bad context");
      const uint8_t* q = ctx.p;
      const uint8_t* qend = ctx.p + ctx.len;
      uint32_t f2, w2;
      while (q < qend && read_tag(q, qend, &f2, &w2)) {
        if (f2 == 1 && w2 == 2) {  // map entry
          Slice entry;
          if (!read_len_delimited(q, qend, &entry)) return fail("bad ctx entry");
          const uint8_t* r = entry.p;
          const uint8_t* rend = entry.p + entry.len;
          Slice key{nullptr, 0}, feat{nullptr, 0};
          uint32_t f3, w3;
          while (r < rend && read_tag(r, rend, &f3, &w3)) {
            if (f3 == 1 && w3 == 2) {
              if (!read_len_delimited(r, rend, &key)) return fail("bad key");
            } else if (f3 == 2 && w3 == 2) {
              if (!read_len_delimited(r, rend, &feat)) return fail("bad feat");
            } else if (!skip_field(r, rend, w3)) {
              return fail("bad ctx field");
            }
          }
          if (feat.p && key.p) {
            Slice bytes;
            int64_t iv;
            bool hb, hi;
            if (!parse_feature(feat, &bytes, &iv, &hb, &hi))
              return fail("bad ctx feature");
            if (hi) {
              if (key_is(key, "classes")) *t.action = int32_t(iv);
              if (key_is(key, "location")) *t.location = int32_t(iv);
            }
          }
        } else if (!skip_field(q, qend, w2)) {
          return fail("bad ctx tag");
        }
      }
    } else if (field == 2 && wire == 2) {  // feature_lists
      Slice fls;
      if (!read_len_delimited(p, end, &fls)) return fail("bad feature_lists");
      const uint8_t* q = fls.p;
      const uint8_t* qend = fls.p + fls.len;
      uint32_t f2, w2;
      while (q < qend && read_tag(q, qend, &f2, &w2)) {
        if (f2 == 1 && w2 == 2) {  // map entry
          Slice entry;
          if (!read_len_delimited(q, qend, &entry)) return fail("bad fl entry");
          const uint8_t* r = entry.p;
          const uint8_t* rend = entry.p + entry.len;
          Slice key{nullptr, 0}, fl{nullptr, 0};
          uint32_t f3, w3;
          while (r < rend && read_tag(r, rend, &f3, &w3)) {
            if (f3 == 1 && w3 == 2) {
              if (!read_len_delimited(r, rend, &key)) return fail("bad fl key");
            } else if (f3 == 2 && w3 == 2) {
              if (!read_len_delimited(r, rend, &fl)) return fail("bad fl val");
            } else if (!skip_field(r, rend, w3)) {
              return fail("bad fl field");
            }
          }
          if (key.p && fl.p) {
            if (t.acoustic && key_is(key, "audio/image")) {
              if (!parse_feature_list(fl, reinterpret_cast<uint8_t*>(t.acoustic),
                                      t.acoustic_bytes, t.acoustic_off,
                                      t.frames_acoustic))
                return fail("acoustic overflow/corrupt");
            } else if (t.audio && key_is(key, "audio/data")) {
              if (!parse_feature_list(fl, reinterpret_cast<uint8_t*>(t.audio),
                                      t.audio_bytes, t.audio_off,
                                      t.frames_audio))
                return fail("audio overflow/corrupt");
            } else if (t.video && key_is(key, "video/image")) {
              if (!parse_feature_list(fl, t.video, t.video_bytes, t.video_off,
                                      t.frames_video))
                return fail("video overflow/corrupt");
            }
          }
        } else if (!skip_field(q, qend, w2)) {
          return fail("bad fls tag");
        }
      }
    } else if (!skip_field(p, end, wire)) {
      return fail("bad top-level field");
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Decode one GZIP TFRecord shard (every SequenceExample record in the file,
// frames appended in order) into caller buffers. Null data pointers skip
// that modality. Returns 0 on success, -1 on error (see aig_last_error).
int aig_decode_file_v(const char* path, float* acoustic,
                      int64_t acoustic_bytes, int32_t* audio,
                      int64_t audio_bytes, uint8_t* video, int64_t video_bytes,
                      int32_t* action, int32_t* location, int32_t* frames_out,
                      int verify_crc) {
  std::vector<uint8_t> raw;
  if (read_gzip_file(path, &raw) != 0) return -1;

  DecodeTargets t{};
  t.acoustic = acoustic;
  t.acoustic_bytes = acoustic_bytes;
  t.audio = audio;
  t.audio_bytes = audio_bytes;
  t.video = video;
  t.video_bytes = video_bytes;
  t.action = action;
  t.location = location;
  int32_t fa = 0, fu = 0, fv = 0;
  int64_t ac_off = 0, au_off = 0, vi_off = 0;
  t.frames_acoustic = &fa;
  t.frames_audio = &fu;
  t.frames_video = &fv;
  t.acoustic_off = &ac_off;
  t.audio_off = &au_off;
  t.video_off = &vi_off;

  const uint8_t* p = raw.data();
  const uint8_t* end = p + raw.size();
  while (p < end) {
    if (p + 12 > end) return fail("truncated record header");
    uint64_t len;
    std::memcpy(&len, p, 8);
    if (verify_crc) {
      uint32_t want;
      std::memcpy(&want, p + 8, 4);
      if (masked_crc32c(p, 8) != want) return fail("length crc mismatch");
    }
    p += 12;  // length + masked length-crc
    if (p + len + 4 > end) return fail("truncated record payload");
    if (verify_crc) {
      uint32_t want;
      std::memcpy(&want, p + len, 4);
      if (masked_crc32c(p, size_t(len)) != want)
        return fail("payload crc mismatch");
    }
    if (decode_sequence_example(p, size_t(len), t) != 0) return -1;
    p += len + 4;  // payload + masked payload-crc
  }
  *frames_out = fa ? fa : (fu ? fu : fv);
  if ((acoustic && fa == 0) && (audio && fu == 0) && (video && fv == 0))
    return fail("no frames decoded");
  return 0;
}

// Back-compat entry point (no CRC verification).
int aig_decode_file(const char* path, float* acoustic, int64_t acoustic_bytes,
                    int32_t* audio, int64_t audio_bytes, uint8_t* video,
                    int64_t video_bytes, int32_t* action, int32_t* location,
                    int32_t* frames_out) {
  return aig_decode_file_v(path, acoustic, acoustic_bytes, audio, audio_bytes,
                           video, video_bytes, action, location, frames_out,
                           /*verify_crc=*/0);
}

const char* aig_last_error() { return g_error.c_str(); }

}  // extern "C"
