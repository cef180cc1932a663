// Standalone corruption-fuzz harness for the native codec (built with
// -fsanitize=address,undefined by tests/test_robustness.py).  Reads corpus
// JPEG files, then decodes thousands of randomly corrupted / truncated
// variants: every outcome must be a clean decode or a thrown Error — any
// OOB access trips the sanitizer and exits nonzero.
//
// Usage: fuzz_decode <iterations> <seed> corpus1.jpg [corpus2.jpg ...]

#include "../libmodjpeg_tpu/codec/native/codec.cpp"

#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <random>

static std::vector<uint8_t> slurp(const char* path) {
  std::ifstream f(path, std::ios::binary);
  return std::vector<uint8_t>((std::istreambuf_iterator<char>(f)),
                              std::istreambuf_iterator<char>());
}

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s <iters> <seed> corpus...\n", argv[0]);
    return 2;
  }
  long iters = std::atol(argv[1]);
  std::mt19937 rng((unsigned)std::atol(argv[2]));
  std::vector<std::vector<uint8_t>> corpus;
  for (int i = 3; i < argc; ++i) {
    corpus.push_back(slurp(argv[i]));
    if (corpus.back().empty()) {
      std::fprintf(stderr, "empty corpus file %s\n", argv[i]);
      return 2;
    }
  }

  // sanity: every corpus file decodes clean, and re-encodes in every mode
  // under the sanitizer (covers the encode walkers + bit emission too)
  for (auto& data : corpus) {
    mjt::Decoder dec;
    dec.decode(data.data(), data.size());
    for (int options = 0; options < 8; ++options) {
      if ((options & 4) && (options & 1)) continue;  // arith ignores optimize
      mjt::Encoder enc;
      enc.img = dec.img;
      enc.opt.optimize = (options & 1) != 0;
      enc.opt.progressive = (options & 2) != 0;
      enc.opt.arithmetic = (options & 4) != 0;
      enc.opt.restart_interval = (int)(rng() % 3);
      enc.opt.nthreads = 2;
      enc.encode();
      mjt::Decoder dec2;
      dec2.decode(enc.out.data(), enc.out.size());
      for (int c = 0; c < dec.img.ncomps; ++c)
        if (dec.img.coefs[c] != dec2.img.coefs[c]) {
          std::fprintf(stderr, "roundtrip mismatch (options=%d)\n", options);
          return 1;
        }
    }
  }

  // Big restart-free sequential corpus entry: tile corpus[0]'s
  // coefficients past the SELF-SYNC size gate (>=1536 MCUs, >=256 KB) so
  // corruption fuzz also drives the round-5 speculative split — its
  // misparse-restart loop, generation-gated copy, and serial fallback all
  // run on hostile bytes under the sanitizer.  First assert the clean big
  // file decodes bit-identically serial vs threaded.
  {
    mjt::Decoder base;
    base.decode(corpus[0].data(), corpus[0].size());
    mjt::Encoder enc;
    enc.img = base.img;
    // 6x4 tiling: 24x the area pushes a ~13 KB q85 fixture past the
    // self-sync gate (>=1536 MCUs AND >=256 KB of entropy bytes)
    const int RX = 6, RY = 4;
    for (int c = 0; c < enc.img.ncomps; ++c) {
      mjt::ComponentInfo& ci = enc.img.comps[c];
      int pw = ci.padded_w, ph = ci.padded_h;
      std::vector<int16_t> big((size_t)pw * RX * ph * RY * 64);
      for (int ty = 0; ty < RY; ++ty)
        for (int r = 0; r < ph; ++r)
          for (int tx = 0; tx < RX; ++tx)
            std::memcpy(&big[(((size_t)(ty * ph + r) * pw * RX) + tx * pw) *
                             64],
                        &enc.img.coefs[c][(size_t)r * pw * 64],
                        (size_t)pw * 64 * sizeof(int16_t));
      enc.img.coefs[c] = std::move(big);
      ci.padded_w = pw * RX;
      ci.padded_h = ph * RY;
      ci.width_in_blocks *= RX;
      ci.height_in_blocks *= RY;
    }
    enc.img.width *= RX;
    enc.img.height *= RY;
    enc.img.mcus_wide *= RX;
    enc.img.mcus_high *= RY;
    enc.opt.nthreads = 2;
    enc.encode();
    mjt::Decoder d1, d2;
    d1.nthreads = 1;
    d1.decode(enc.out.data(), enc.out.size());
    d2.nthreads = 2;
    d2.decode(enc.out.data(), enc.out.size());
    for (int c = 0; c < d1.img.ncomps; ++c)
      if (d1.img.coefs[c] != d2.img.coefs[c]) {
        std::fprintf(stderr, "selfsync mismatch vs serial (comp %d)\n", c);
        return 1;
      }
    corpus.push_back(std::move(enc.out));

    // band-splice roundtrip on the clean big file: decode only rows
    // [3, 9), re-encode via prefix byte-copy + band + suffix bit copy —
    // must reproduce the original byte for byte under the sanitizer
    mjt::Decoder db;
    db.begin(corpus.back().data(), corpus.back().size());
    mjt::Decoder::BandOut bo;
    db.finish_band(3, 9, &bo);
    int64_t sp[16] = {bo.pre.prefix_raw, bo.pre.partial_bits,
                      bo.pre.partial_byte, bo.pre.preds[0], bo.pre.preds[1],
                      bo.pre.preds[2], bo.pre.preds[3], bo.suffix_bitpos,
                      bo.preds1[0], bo.preds1[1], bo.preds1[2],
                      bo.preds1[3], bo.end_bitpos, 0, 0, 0};
    const int16_t* bplanes[4] = {nullptr, nullptr, nullptr, nullptr};
    for (int c = 0; c < db.img.ncomps; ++c) bplanes[c] = db.img.coefs[c].data();
    int64_t blen = 0;
    char berr[256];
    uint8_t* bbuf = mjt_encode_splice_band(
        corpus.back().data(), (int64_t)corpus.back().size(), sp, 3, 9,
        bplanes, &blen, berr, sizeof(berr));
    if (!bbuf || blen != (int64_t)corpus.back().size() ||
        std::memcmp(bbuf, corpus.back().data(), (size_t)blen) != 0) {
      std::fprintf(stderr, "band splice roundtrip mismatch\n");
      return 1;
    }
    delete[] bbuf;
  }

  long ok = 0, err = 0;
  for (long t = 0; t < iters; ++t) {
    // every 5th iteration fuzzes the big self-sync entry (it is ~16x the
    // work of the small files, so weighting it 1/5 keeps runtime sane)
    size_t pick = (t % 5 == 0) ? corpus.size() - 1 : t % (corpus.size() - 1);
    std::vector<uint8_t> data = corpus[pick];
    int flips = 1 + (int)(rng() % 6);
    for (int f = 0; f < flips; ++f)
      data[2 + rng() % (data.size() - 2)] = (uint8_t)rng();
    if (rng() % 10 < 3) data.resize(2 + rng() % (data.size() - 2));
    try {
      mjt::Decoder dec;
      dec.max_pixel = 1 << 26;  // cap crafted huge frames (big entry fits)
      dec.nthreads = 1 + (int)(rng() % 3);
      if (rng() % 4 == 0) {
        // band-splice decode on hostile bytes: the prefix/suffix index
        // walks and seam bookkeeping must fail cleanly, never crash
        dec.begin(data.data(), data.size());
        mjt::Decoder::BandOut bo;
        dec.finish_band((long)(rng() % 8), (long)(2 + rng() % 16), &bo);
      } else {
        dec.decode(data.data(), data.size());
      }
      ++ok;
    } catch (const std::exception&) {
      ++err;
    }
  }
  std::printf("fuzz_decode: %ld decoded, %ld clean errors, 0 crashes\n", ok, err);
  return 0;
}
