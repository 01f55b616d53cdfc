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

// Raw-model mode: pbd_ref_oracle --detectraw model.bin image.raw
// RawModel fills the protected Model fields from a binary dump written
// by tests/refcpp/__init__.py::write_model_raw, bypassing ONLY the XML
// reader — whose defid handling destroys multi-mixture models
// (src/FileStorageModel.cpp:148-152, pinned by
// test_reference_xml_reader_drops_multimixture_defid) — so the
// reference's real distributeModel/HOG/conv/DP/backtrack pipeline can
// be exercised on faithful multi-mixture models too.
class RawModel : public Model {
 public:
  bool serialize(const std::string&) const { return false; }
  bool deserialize(const std::string& filename) {
    std::ifstream f(filename.c_str(), std::ios::binary);
    if (!f) return false;
    int32_t iv[5];
    f.read(reinterpret_cast<char*>(iv), sizeof(iv));
    if (!f || iv[0] != 0x50424431) return false;  // "PBD1"
    nscales_ = iv[1];
    binsize_ = iv[2];
    norient_ = iv[3];
    flen_ = iv[4];
    f.read(reinterpret_cast<char*>(&thresh_), 4);
    int32_t n = 0;
    f.read(reinterpret_cast<char*>(&n), 4);
    filtersw_.resize(n);
    filtersi_.resize(n);
    for (int32_t i = 0; i < n; ++i) {
      int32_t rc[2];
      f.read(reinterpret_cast<char*>(rc), 8);
      filtersw_[i].create(rc[0], rc[1], CV_32F);
      f.read(reinterpret_cast<char*>(filtersw_[i].data),
             static_cast<std::streamsize>(rc[0]) * rc[1] * 4);
      filtersi_[i] = i;
    }
    f.read(reinterpret_cast<char*>(&n), 4);
    defw_.resize(n);
    defi_.resize(n);
    anchors_.resize(n);
    for (int32_t i = 0; i < n; ++i) {
      float d[4];
      f.read(reinterpret_cast<char*>(d), 16);
      defw_[i].assign(d, d + 4);
      defi_[i] = i;
    }
    for (int32_t i = 0; i < n; ++i) {
      int32_t xy[2];
      f.read(reinterpret_cast<char*>(xy), 8);
      anchors_[i] = cv::Point(xy[0], xy[1]);
    }
    f.read(reinterpret_cast<char*>(&n), 4);
    biasw_.resize(n);
    biasi_.resize(n);
    f.read(reinterpret_cast<char*>(biasw_.data()),
           static_cast<std::streamsize>(n) * 4);
    for (int32_t i = 0; i < n; ++i) biasi_[i] = i;
    int32_t ncomp = 0;
    f.read(reinterpret_cast<char*>(&ncomp), 4);
    parentid_.resize(ncomp);
    filterid_.resize(ncomp);
    defid_.resize(ncomp);
    biasid_.resize(ncomp);
    for (int32_t c = 0; c < ncomp; ++c) {
      int32_t np = 0;
      f.read(reinterpret_cast<char*>(&np), 4);
      parentid_[c].resize(np);
      filterid_[c].resize(np);
      defid_[c].resize(np);
      biasid_[c].resize(np);
      for (int32_t p = 0; p < np; ++p) {
        f.read(reinterpret_cast<char*>(&parentid_[c][p]), 4);
        vectori* lists[3] = {&filterid_[c][p], &defid_[c][p],
                             &biasid_[c][p]};
        for (int t = 0; t < 3; ++t) {
          int32_t len = 0;
          f.read(reinterpret_cast<char*>(&len), 4);
          lists[t]->resize(len);
          f.read(reinterpret_cast<char*>(lists[t]->data()),
                 static_cast<std::streamsize>(len) * 4);
        }
      }
    }
    nparts_ = ncomp > 0 ? static_cast<int>(parentid_[0].size()) : 0;
    nmixtures_ =
        nparts_ > 0 ? static_cast<int>(filterid_[0][0].size()) : 0;
    return bool(f);
  }
};

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

static int runDetect(Model& model, const char* imgpath) {
  PartsBasedDetector<float> pbd;
  pbd.distributeModel(model);

  cv::Mat im;
  if (!readRaw(imgpath, im)) {
    std::fprintf(stderr, "cannot read image: %s\n", imgpath);
    return 4;
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

int main(int argc, char** argv) {
  if (argc >= 2 && std::strcmp(argv[1], "--hog") == 0) return hogMode(argc, argv);
  if (argc >= 2 && std::strcmp(argv[1], "--dump") == 0) return dumpMode(argc, argv);
  if (argc >= 4 && std::strcmp(argv[1], "--detectraw") == 0) {
    RawModel model;
    if (!model.deserialize(argv[2])) {
      std::fprintf(stderr, "raw model deserialize failed: %s\n", argv[2]);
      return 3;
    }
    return runDetect(model, argv[3]);
  }
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s model.xml image.raw\n", argv[0]);
    return 2;
  }
  FileStorageModel model;
  if (!model.deserialize(argv[1])) {
    std::fprintf(stderr, "model deserialize failed: %s\n", argv[1]);
    return 3;
  }
  return runDetect(model, argv[2]);
}
