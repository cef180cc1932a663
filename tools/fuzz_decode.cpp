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

  long ok = 0, err = 0;
  for (long t = 0; t < iters; ++t) {
    std::vector<uint8_t> data = corpus[t % corpus.size()];
    int flips = 1 + (int)(rng() % 6);
    for (int f = 0; f < flips; ++f)
      data[2 + rng() % (data.size() - 2)] = (uint8_t)rng();
    if (rng() % 10 < 3) data.resize(2 + rng() % (data.size() - 2));
    try {
      mjt::Decoder dec;
      dec.max_pixel = 1 << 24;  // cap crafted huge frames
      dec.nthreads = 1 + (int)(rng() % 3);
      dec.decode(data.data(), data.size());
      ++ok;
    } catch (const std::exception&) {
      ++err;
    }
  }
  std::printf("fuzz_decode: %ld decoded, %ld clean errors, 0 crashes\n", ok, err);
  return 0;
}
