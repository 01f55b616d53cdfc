// Parity oracle: runs the reference's ACTUAL C++ inference pipeline
// (PartsBasedDetector<float>::detect, compiled in place from
// /root/reference/src — demo flow per src/demo.cpp:63-116 minus
// highgui) on a FileStorage XML model and a raw image, and prints the
// candidate set for cross-implementation tests.
//
// Usage: pbd_ref_oracle model.xml image.raw
//   image.raw = three little-endian int32 (h, w, c) then h*w*c uint8
//               bytes, row-major, channel-interleaved (c must be 3).
// Output: first line = candidate count; then one line per candidate,
//   sorted by descending root score:
//     component score x0 y0 w0 h0 x1 y1 w1 h1 ...
//
// HOG mode: pbd_ref_oracle --hog image.raw sbin interval out.bin
//   runs HOGFeatures<float>::pyramid and writes every scale to out.bin
//   as [int32 nscales] then per scale [int32 rows, cols] + float32
//   row-major data (rows x cols with cols = Wc*flen interleaved).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <vector>

#include "Candidate.hpp"
#include "FileStorageModel.hpp"
#include "HOGFeatures.hpp"
#include "PartsBasedDetector.hpp"

static bool readRaw(const char* path, cv::Mat& im) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  int32_t h = 0, w = 0, c = 0;
  f.read(reinterpret_cast<char*>(&h), 4);
  f.read(reinterpret_cast<char*>(&w), 4);
  f.read(reinterpret_cast<char*>(&c), 4);
  if (!f || h <= 0 || w <= 0 || c != 3) return false;
  im.create(h, w, CV_8UC3);
  f.read(reinterpret_cast<char*>(im.data),
         static_cast<std::streamsize>(h) * w * 3);
  return bool(f);
}

static int hogMode(int argc, char** argv) {
  if (argc < 6) return 2;
  cv::Mat im;
  if (!readRaw(argv[2], im)) return 4;
  const int sbin = std::atoi(argv[3]);
  const int interval = std::atoi(argv[4]);
  HOGFeatures<float> hog(sbin, interval, 32, 18);
  std::vector<cv::Mat> feats;
  hog.pyramid(im, feats);
  std::ofstream out(argv[5], std::ios::binary);
  int32_t ns = static_cast<int32_t>(feats.size());
  out.write(reinterpret_cast<const char*>(&ns), 4);
  for (const cv::Mat& f : feats) {
    CV_Assert(f.type() == CV_32F && f.isContinuous());
    int32_t r = f.rows, c = f.cols;
    out.write(reinterpret_cast<const char*>(&r), 4);
    out.write(reinterpret_cast<const char*>(&c), 4);
    out.write(reinterpret_cast<const char*>(f.data),
              static_cast<std::streamsize>(r) * c * 4);
  }
  std::printf("%d\n", ns);
  return 0;
}

// Dump mode: pbd_ref_oracle --dump model.xml
// Prints the index tables FileStorageModel ACTUALLY parsed, one part
// per line: "part <p> parent <id> filterid <...> defid <...> biasid
// <...>" — used to pin the reference's defid-parsing defect
// (src/FileStorageModel.cpp:148-152 replaces any non-scalar defid list
// with the single entry 0).
static int dumpMode(int argc, char** argv) {
  if (argc < 3) return 2;
  FileStorageModel model;
  if (!model.deserialize(argv[2])) return 3;
  for (size_t c = 0; c < model.filterid().size(); ++c) {
    for (size_t p = 0; p < model.filterid()[c].size(); ++p) {
      std::printf("component %zu part %zu parent %d filterid", c, p,
                  model.parentid()[c][p]);
      for (int v : model.filterid()[c][p]) std::printf(" %d", v);
      std::printf(" defid");
      for (int v : model.defid()[c][p]) std::printf(" %d", v);
      std::printf(" biasid");
      for (int v : model.biasid()[c][p]) std::printf(" %d", v);
      std::printf("\n");
    }
  }
  return 0;
}

int main(int argc, char** argv) {
  if (argc >= 2 && std::strcmp(argv[1], "--hog") == 0) return hogMode(argc, argv);
  if (argc >= 2 && std::strcmp(argv[1], "--dump") == 0) return dumpMode(argc, argv);
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s model.xml image.raw\n", argv[0]);
    return 2;
  }
  FileStorageModel model;
  if (!model.deserialize(argv[1])) {
    std::fprintf(stderr, "model deserialize failed: %s\n", argv[1]);
    return 3;
  }
  PartsBasedDetector<float> pbd;
  pbd.distributeModel(model);

  std::ifstream f(argv[2], std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open image: %s\n", argv[2]);
    return 4;
  }
  int32_t h = 0, w = 0, c = 0;
  f.read(reinterpret_cast<char*>(&h), 4);
  f.read(reinterpret_cast<char*>(&w), 4);
  f.read(reinterpret_cast<char*>(&c), 4);
  if (!f || h <= 0 || w <= 0 || c != 3) {
    std::fprintf(stderr, "bad image header (h=%d w=%d c=%d)\n", h, w, c);
    return 5;
  }
  cv::Mat im(h, w, CV_8UC3);
  f.read(reinterpret_cast<char*>(im.data),
         static_cast<std::streamsize>(h) * w * 3);
  if (!f) {
    std::fprintf(stderr, "truncated image payload\n");
    return 6;
  }

  std::vector<Candidate> candidates;
  pbd.detect(im, candidates);
  Candidate::sort(candidates);

  std::printf("%zu\n", candidates.size());
  for (size_t i = 0; i < candidates.size(); ++i) {
    Candidate& cand = candidates[i];
    const std::vector<cv::Rect>& parts = cand.parts();
    std::printf("%d %.9g", cand.component(), cand.score());
    for (size_t p = 0; p < parts.size(); ++p) {
      std::printf(" %d %d %d %d", parts[p].x, parts[p].y, parts[p].width,
                  parts[p].height);
    }
    std::printf("\n");
  }
  return 0;
}
