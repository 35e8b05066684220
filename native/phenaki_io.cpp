// phenaki_io: native host-side data runtime for the TPU framework.
//
// The reference (data.py:78-241) leans on PIL/cv2 for GIF/video decode — the
// hot host path that feeds the device. This library implements that path in
// C++: a self-contained GIF87a/89a codec (LZW decode + encode), bilinear
// resize + center-crop matching torchvision Resize(short-side)+CenterCrop
// semantics, and a std::thread batch loader that decodes a whole training
// batch in parallel and writes directly into one contiguous float32 buffer
// ready for jax.device_put.
//
// C ABI only (consumed from Python via ctypes). No external dependencies.
//
// Build: make -C native   (g++ -O3 -fPIC -shared)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// GIF decoding
// ---------------------------------------------------------------------------

struct ByteReader {
  const uint8_t* data;
  size_t size;
  size_t pos = 0;

  bool ok(size_t n) const { return pos + n <= size; }
  uint8_t u8() { return data[pos++]; }
  uint16_t u16() {  // little-endian
    uint16_t v = (uint16_t)(data[pos] | (data[pos + 1] << 8));
    pos += 2;
    return v;
  }
  void skip(size_t n) { pos += n; }
};

struct Rgb {
  uint8_t r, g, b;
};

struct GifFrame {
  std::vector<uint8_t> rgb;  // H*W*3, full canvas
  int delay_ms = 0;
};

struct LzwDecoder {
  // GIF-flavour LZW with variable code width and dictionary reset.
  static bool decode(ByteReader& br, int min_code_size,
                     std::vector<uint8_t>& out, size_t max_pixels) {
    const int clear_code = 1 << min_code_size;
    const int eoi_code = clear_code + 1;

    // dictionary as (prefix, suffix) pairs
    std::vector<int32_t> prefix(4096);
    std::vector<uint8_t> suffix(4096);
    std::vector<uint8_t> stack(4097);

    int code_size = min_code_size + 1;
    int next_code = eoi_code + 1;
    int max_code = (1 << code_size) - 1;

    uint32_t bits = 0;
    int nbits = 0;
    int prev = -1;
    uint8_t first_char = 0;

    // concatenated data sub-blocks
    size_t block_remaining = 0;
    bool terminated = false;  // consumed the 0-length terminator sub-block
    auto next_byte = [&](uint8_t& b) -> bool {
      while (block_remaining == 0) {
        if (!br.ok(1)) return false;
        block_remaining = br.u8();
        if (block_remaining == 0) {  // terminator
          terminated = true;
          return false;
        }
        if (!br.ok(block_remaining)) return false;
      }
      b = br.u8();
      block_remaining--;
      return true;
    };
    // skip any unread bytes of the current sub-block, then consume remaining
    // sub-blocks through the 0-length terminator, leaving the reader aligned
    // on the next GIF block
    auto drain = [&]() {
      br.skip(std::min(block_remaining, br.size - br.pos));
      block_remaining = 0;
      while (!terminated && br.ok(1)) {
        uint8_t n = br.u8();
        if (n == 0) break;
        if (!br.ok(n)) break;
        br.skip(n);
      }
    };

    while (out.size() < max_pixels) {
      while (nbits < code_size) {
        uint8_t b;
        if (!next_byte(b)) {  // ran out of data: accept partial
          drain();
          return true;
        }
        bits |= (uint32_t)b << nbits;
        nbits += 8;
      }
      int code = (int)(bits & max_code);
      bits >>= code_size;
      nbits -= code_size;

      if (code == clear_code) {
        code_size = min_code_size + 1;
        max_code = (1 << code_size) - 1;
        next_code = eoi_code + 1;
        prev = -1;
        continue;
      }
      if (code == eoi_code) {
        drain();
        return true;
      }

      int sp = 0;
      int cur = code;
      if (cur >= next_code) {
        // code not yet in dictionary: KwKwK case
        if (prev < 0 || cur > next_code) return false;
        stack[sp++] = first_char;
        cur = prev;
      }
      while (cur >= clear_code + 2) {
        stack[sp++] = suffix[cur];
        cur = prefix[cur];
        if (sp > 4096) return false;
      }
      first_char = (uint8_t)cur;
      stack[sp++] = (uint8_t)cur;

      while (sp > 0 && out.size() < max_pixels) out.push_back(stack[--sp]);

      if (prev >= 0 && next_code < 4096) {
        prefix[next_code] = prev;
        suffix[next_code] = first_char;
        next_code++;
        if (next_code > max_code && code_size < 12) {
          code_size++;
          max_code = (1 << code_size) - 1;
        }
      }
      prev = code;
    }
    drain();
    return true;
  }
};

// Deinterlace GIF rows in place (4-pass interlace scheme).
void deinterlace(std::vector<uint8_t>& idx, int w, int h) {
  std::vector<uint8_t> out(idx.size());
  static const int start[4] = {0, 4, 2, 1};
  static const int step[4] = {8, 8, 4, 2};
  int src_row = 0;
  for (int pass = 0; pass < 4; pass++) {
    for (int y = start[pass]; y < h; y += step[pass]) {
      std::memcpy(&out[(size_t)y * w], &idx[(size_t)src_row * w], w);
      src_row++;
    }
  }
  idx.swap(out);
}

// Full GIF decode: all frames composited to the logical screen.
bool gif_decode(const uint8_t* data, size_t size, int& W, int& H,
                std::vector<GifFrame>& frames) {
  ByteReader br{data, size};
  if (!br.ok(13)) return false;
  if (std::memcmp(data, "GIF87a", 6) != 0 && std::memcmp(data, "GIF89a", 6) != 0)
    return false;
  br.skip(6);
  W = br.u16();
  H = br.u16();
  uint8_t flags = br.u8();
  br.skip(2);  // bg color index, aspect

  Rgb global_ct[256];
  bool has_gct = flags & 0x80;
  int gct_size = 2 << (flags & 7);
  if (has_gct) {
    if (!br.ok((size_t)gct_size * 3)) return false;
    for (int i = 0; i < gct_size; i++) {
      global_ct[i] = {br.u8(), br.u8(), br.u8()};
    }
  }

  std::vector<uint8_t> canvas((size_t)W * H * 3, 0);
  std::vector<uint8_t> prev_canvas;
  int transparent_idx = -1;
  int disposal = 0;
  int delay_ms = 0;

  while (br.ok(1)) {
    uint8_t block = br.u8();
    if (block == 0x3B) break;  // trailer

    if (block == 0x21) {  // extension
      if (!br.ok(1)) return false;
      uint8_t label = br.u8();
      if (label == 0xF9) {  // graphic control
        if (!br.ok(6)) return false;
        br.skip(1);  // block size (=4)
        uint8_t gflags = br.u8();
        delay_ms = br.u16() * 10;
        int tidx = br.u8();
        br.skip(1);  // terminator
        disposal = (gflags >> 2) & 7;
        transparent_idx = (gflags & 1) ? tidx : -1;
      } else {
        // skip sub-blocks
        while (br.ok(1)) {
          uint8_t n = br.u8();
          if (n == 0) break;
          if (!br.ok(n)) return false;
          br.skip(n);
        }
      }
      continue;
    }

    if (block != 0x2C) return false;  // image descriptor expected
    if (!br.ok(9)) return false;
    int left = br.u16(), top = br.u16();
    int fw = br.u16(), fh = br.u16();
    uint8_t iflags = br.u8();
    bool interlaced = iflags & 0x40;

    Rgb local_ct[256];
    const Rgb* ct = global_ct;
    if (iflags & 0x80) {
      int lct_size = 2 << (iflags & 7);
      if (!br.ok((size_t)lct_size * 3)) return false;
      for (int i = 0; i < lct_size; i++) local_ct[i] = {br.u8(), br.u8(), br.u8()};
      ct = local_ct;
    }

    if (!br.ok(1)) return false;
    int min_code_size = br.u8();
    std::vector<uint8_t> idx;
    idx.reserve((size_t)fw * fh);
    if (!LzwDecoder::decode(br, min_code_size, idx, (size_t)fw * fh)) return false;
    idx.resize((size_t)fw * fh, 0);
    if (interlaced) deinterlace(idx, fw, fh);

    if (disposal == 3) prev_canvas = canvas;

    // composite onto canvas
    for (int y = 0; y < fh; y++) {
      int cy = top + y;
      if (cy >= H) break;
      for (int x = 0; x < fw; x++) {
        int cx = left + x;
        if (cx >= W) continue;
        int pi = idx[(size_t)y * fw + x];
        if (pi == transparent_idx) continue;
        size_t o = ((size_t)cy * W + cx) * 3;
        canvas[o] = ct[pi].r;
        canvas[o + 1] = ct[pi].g;
        canvas[o + 2] = ct[pi].b;
      }
    }

    frames.push_back({canvas, delay_ms});

    // apply disposal for next frame
    int frame_disposal = disposal;
    // GIF89a: a Graphic Control Extension applies ONLY to the block that
    // immediately follows it — reset per-frame state (a later frame without
    // its own GCE must not inherit this frame's transparency index)
    transparent_idx = -1;
    disposal = 0;
    delay_ms = 0;
    if (frame_disposal == 2) {
      // restore to background: clear the frame rect (to black)
      for (int y = 0; y < fh; y++) {
        int cy = top + y;
        if (cy >= H) break;
        for (int x = 0; x < fw; x++) {
          int cx = left + x;
          if (cx >= W) continue;
          size_t o = ((size_t)cy * W + cx) * 3;
          canvas[o] = canvas[o + 1] = canvas[o + 2] = 0;
        }
      }
    } else if (frame_disposal == 3 && !prev_canvas.empty()) {
      canvas = prev_canvas;
    }
  }
  return !frames.empty();
}

// ---------------------------------------------------------------------------
// GIF encoding (fixed 6x7x6 color cube + 4 grays palette, LZW compress)
// ---------------------------------------------------------------------------

struct BitWriter {
  std::vector<uint8_t>& out;
  uint32_t bits = 0;
  int nbits = 0;
  std::vector<uint8_t> block;

  explicit BitWriter(std::vector<uint8_t>& o) : out(o) { block.reserve(255); }

  void put(int code, int size) {
    bits |= (uint32_t)code << nbits;
    nbits += size;
    while (nbits >= 8) {
      block.push_back((uint8_t)(bits & 0xFF));
      bits >>= 8;
      nbits -= 8;
      if (block.size() == 255) flush_block();
    }
  }
  void flush_block() {
    if (block.empty()) return;
    out.push_back((uint8_t)block.size());
    out.insert(out.end(), block.begin(), block.end());
    block.clear();
  }
  void finish() {
    if (nbits > 0) {
      block.push_back((uint8_t)(bits & 0xFF));
      if (block.size() == 255) flush_block();
    }
    flush_block();
    out.push_back(0);  // block terminator
  }
};

// palette: 6*7*6 = 252 RGB cube + 4 extra grays = 256
constexpr int PR = 6, PG = 7, PB = 6;

void build_palette(uint8_t* pal /* 256*3 */) {
  int i = 0;
  for (int r = 0; r < PR; r++)
    for (int g = 0; g < PG; g++)
      for (int b = 0; b < PB; b++) {
        pal[i * 3 + 0] = (uint8_t)(r * 255 / (PR - 1));
        pal[i * 3 + 1] = (uint8_t)(g * 255 / (PG - 1));
        pal[i * 3 + 2] = (uint8_t)(b * 255 / (PB - 1));
        i++;
      }
  const int grays[4] = {32, 96, 160, 224};
  for (int k = 0; k < 4; k++) {
    pal[i * 3 + 0] = pal[i * 3 + 1] = pal[i * 3 + 2] = (uint8_t)grays[k];
    i++;
  }
}

inline uint8_t quantize_px(uint8_t r, uint8_t g, uint8_t b) {
  // nearest cube cell (rounding): cheap and deterministic
  int ri = (r * (PR - 1) + 127) / 255;
  int gi = (g * (PG - 1) + 127) / 255;
  int bi = (b * (PB - 1) + 127) / 255;
  int cr = ri * 255 / (PR - 1), cg = gi * 255 / (PG - 1), cb = bi * 255 / (PB - 1);
  // compare by max-channel error so the cube's worst-case bound (half a cube
  // step per channel) is never exceeded; grays only ever tighten it
  int cube_err = std::max({std::abs(r - cr), std::abs(g - cg), std::abs(b - cb)});
  uint8_t best = (uint8_t)((ri * PG + gi) * PB + bi);
  // also consider the 4 gray entries: near-neutral pixels land between the
  // coarse cube levels, and the grays halve their error
  const int grays[4] = {32, 96, 160, 224};
  for (int k = 0; k < 4; k++) {
    int gy = grays[k];
    int err = std::max({std::abs(r - gy), std::abs(g - gy), std::abs(b - gy)});
    if (err < cube_err) {
      cube_err = err;
      best = (uint8_t)(PR * PG * PB + k);
    }
  }
  return best;
}

void lzw_encode(const std::vector<uint8_t>& idx, int min_code_size,
                std::vector<uint8_t>& out) {
  const int clear_code = 1 << min_code_size;
  const int eoi_code = clear_code + 1;

  // dictionary: hash map from (prefix<<8 | suffix) -> code
  std::vector<int32_t> table(1 << 17);

  BitWriter bw(out);
  int code_size = min_code_size + 1;
  int next_code = eoi_code + 1;

  auto reset_table = [&]() {
    std::fill(table.begin(), table.end(), -1);
    code_size = min_code_size + 1;
    next_code = eoi_code + 1;
  };
  reset_table();
  bw.put(clear_code, code_size);

  if (idx.empty()) {
    bw.put(eoi_code, code_size);
    bw.finish();
    return;
  }

  int prev = idx[0];
  for (size_t i = 1; i < idx.size(); i++) {
    int c = idx[i];
    uint32_t key = ((uint32_t)prev << 8) | (uint32_t)c;
    uint32_t slot = (key * 2654435761u) >> 15 & (table.size() - 1);
    int found = -1;
    // open addressing: table stores (key<<12 | code)
    while (table[slot] != -1) {
      uint32_t stored = (uint32_t)table[slot];
      if ((stored >> 12) == key) {
        found = (int)(stored & 0xFFF);
        break;
      }
      slot = (slot + 1) & (table.size() - 1);
    }
    if (found >= 0) {
      prev = found;
      continue;
    }
    bw.put(prev, code_size);
    if (next_code < 4096) {
      table[slot] = (int32_t)((key << 12) | (uint32_t)next_code);
      if (next_code == (1 << code_size) && code_size < 12) code_size++;
      next_code++;
    } else {
      bw.put(clear_code, code_size);
      reset_table();
    }
    prev = c;
  }
  bw.put(prev, code_size);
  bw.put(eoi_code, code_size);
  bw.finish();
}

void write_u16(std::vector<uint8_t>& v, uint16_t x) {
  v.push_back((uint8_t)(x & 0xFF));
  v.push_back((uint8_t)(x >> 8));
}

// frames: F*H*W*3 uint8 -> animated GIF bytes
void gif_encode(const uint8_t* frames, int F, int H, int W, int delay_ms,
                int loop, std::vector<uint8_t>& out) {
  out.reserve((size_t)F * H * W / 4);
  const char* hdr = "GIF89a";
  out.insert(out.end(), hdr, hdr + 6);
  write_u16(out, (uint16_t)W);
  write_u16(out, (uint16_t)H);
  out.push_back(0xF7);  // GCT present, 256 entries, 8-bit color
  out.push_back(0);     // bg index
  out.push_back(0);     // aspect

  uint8_t pal[256 * 3];
  build_palette(pal);
  out.insert(out.end(), pal, pal + sizeof(pal));

  // netscape looping extension
  out.push_back(0x21);
  out.push_back(0xFF);
  out.push_back(11);
  const char* ns = "NETSCAPE2.0";
  out.insert(out.end(), ns, ns + 11);
  out.push_back(3);
  out.push_back(1);
  write_u16(out, (uint16_t)loop);
  out.push_back(0);

  std::vector<uint8_t> idx((size_t)H * W);
  for (int f = 0; f < F; f++) {
    // graphic control (delay)
    out.push_back(0x21);
    out.push_back(0xF9);
    out.push_back(4);
    out.push_back(0x04);  // disposal 1 (leave), no transparency
    write_u16(out, (uint16_t)(delay_ms / 10));
    out.push_back(0);
    out.push_back(0);

    // image descriptor (full frame, global palette)
    out.push_back(0x2C);
    write_u16(out, 0);
    write_u16(out, 0);
    write_u16(out, (uint16_t)W);
    write_u16(out, (uint16_t)H);
    out.push_back(0);

    const uint8_t* fr = frames + (size_t)f * H * W * 3;
    for (size_t p = 0; p < (size_t)H * W; p++)
      idx[p] = quantize_px(fr[p * 3], fr[p * 3 + 1], fr[p * 3 + 2]);

    out.push_back(8);  // LZW min code size
    lzw_encode(idx, 8, out);
  }
  out.push_back(0x3B);  // trailer
}

// ---------------------------------------------------------------------------
// Resize / crop (torchvision Resize(short side) + CenterCrop semantics,
// matching _ImageTransform in data/datasets.py)
// ---------------------------------------------------------------------------

// bilinear resize uint8 HWC -> uint8 HWC
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw, int c) {
  const float sy = (float)sh / dh;
  const float sx = (float)sw / dw;
  for (int y = 0; y < dh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    if (fy < 0) y0 = 0;
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      if (fx < 0) x0 = 0;
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int k = 0; k < c; k++) {
        float v00 = src[((size_t)y0 * sw + x0) * c + k];
        float v01 = src[((size_t)y0 * sw + x1) * c + k];
        float v10 = src[((size_t)y1 * sw + x0) * c + k];
        float v11 = src[((size_t)y1 * sw + x1) * c + k];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[((size_t)y * dw + x) * c + k] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

// resize short side to cover (th, tw), then center-crop, then optional hflip,
// then scale to float32 [0,1]; in: uint8 (sh, sw, 3), out: float32 (th, tw, 3)
void transform_frame(const uint8_t* src, int sh, int sw, float* out, int th,
                     int tw, bool hflip) {
  float scale = std::max((float)th / sh, (float)tw / sw);
  int rh = std::max((int)(sh * scale + 0.5f), th);
  int rw = std::max((int)(sw * scale + 0.5f), tw);
  std::vector<uint8_t> resized((size_t)rh * rw * 3);
  resize_bilinear(src, sh, sw, resized.data(), rh, rw, 3);
  int top = (rh - th) / 2;
  int left = (rw - tw) / 2;
  for (int y = 0; y < th; y++) {
    const uint8_t* row = &resized[((size_t)(top + y) * rw + left) * 3];
    float* orow = &out[(size_t)y * tw * 3];
    if (!hflip) {
      for (int x = 0; x < tw * 3; x++) orow[x] = row[x] * (1.0f / 255.0f);
    } else {
      for (int x = 0; x < tw; x++)
        for (int k = 0; k < 3; k++)
          orow[(size_t)x * 3 + k] =
              row[(size_t)(tw - 1 - x) * 3 + k] * (1.0f / 255.0f);
    }
  }
}

bool read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  buf.resize((size_t)n);
  size_t rd = std::fread(buf.data(), 1, (size_t)n, f);
  std::fclose(f);
  return rd == (size_t)n;
}

// decode one gif into float32 (num_frames, th, tw, 3) with pad/truncate
// (cast_num_frames semantics, reference data.py:30-39)
bool load_gif_transformed(const char* path, int num_frames, int th, int tw,
                          bool hflip, float* out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return false;
  int W = 0, H = 0;
  std::vector<GifFrame> frames;
  if (!gif_decode(buf.data(), buf.size(), W, H, frames)) return false;

  int use = std::min((int)frames.size(), num_frames);
  for (int f = 0; f < use; f++)
    transform_frame(frames[f].rgb.data(), H, W, out + (size_t)f * th * tw * 3,
                    th, tw, hflip);
  // zero-pad missing frames
  if (use < num_frames)
    std::memset(out + (size_t)use * th * tw * 3, 0,
                sizeof(float) * (size_t)(num_frames - use) * th * tw * 3);
  return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// exported C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Decode a GIF file into caller-provided info. Two-phase:
//   io_gif_probe(path, &W, &H, &F)  -> 0 on success
//   io_gif_decode(path, out)        -> fills F*H*W*3 uint8
int io_gif_probe(const char* path, int* W, int* H, int* F) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return -1;
  std::vector<GifFrame> frames;
  int w = 0, h = 0;
  if (!gif_decode(buf.data(), buf.size(), w, h, frames)) return -2;
  *W = w;
  *H = h;
  *F = (int)frames.size();
  return 0;
}

int io_gif_decode(const char* path, uint8_t* out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return -1;
  std::vector<GifFrame> frames;
  int w = 0, h = 0;
  if (!gif_decode(buf.data(), buf.size(), w, h, frames)) return -2;
  for (size_t f = 0; f < frames.size(); f++)
    std::memcpy(out + f * frames[f].rgb.size(), frames[f].rgb.data(),
                frames[f].rgb.size());
  return 0;
}

// Encode F*H*W*3 uint8 frames to an animated GIF file.
int io_gif_encode(const char* path, const uint8_t* frames, int F, int H, int W,
                  int delay_ms, int loop) {
  std::vector<uint8_t> out;
  gif_encode(frames, F, H, W, delay_ms, loop, out);
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  size_t wr = std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return wr == out.size() ? 0 : -2;
}

// Parallel batch load: n GIF paths -> float32 (n, num_frames, th, tw, 3).
// hflip_mask: per-item horizontal flip flags (may be NULL).
// Returns the number of successfully decoded items; failed items are zeroed.
int io_load_gif_batch(const char** paths, int n, int num_frames, int th,
                      int tw, const uint8_t* hflip_mask, float* out,
                      int num_threads) {
  if (num_threads <= 0)
    num_threads = (int)std::thread::hardware_concurrency();
  num_threads = std::max(1, std::min(num_threads, n));

  std::atomic<int> next(0), ok_count(0);
  const size_t item_size = (size_t)num_frames * th * tw * 3;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      bool hflip = hflip_mask != nullptr && hflip_mask[i] != 0;
      if (load_gif_transformed(paths[i], num_frames, th, tw, hflip,
                               out + (size_t)i * item_size)) {
        ok_count.fetch_add(1);
      } else {
        std::memset(out + (size_t)i * item_size, 0, sizeof(float) * item_size);
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok_count.load();
}

// Single-image transform: uint8 (sh, sw, 3) -> float32 (th, tw, 3)
// (Resize short-side + CenterCrop + optional hflip + [0,1] scale).
void io_transform_image(const uint8_t* src, int sh, int sw, float* out, int th,
                        int tw, int hflip) {
  transform_frame(src, sh, sw, out, th, tw, hflip != 0);
}

int io_version() { return 1; }

}  // extern "C"
