// Drop-in definitions for SpatialConvolutionEngine (declared in the
// reference's include/SpatialConvolutionEngine.hpp), replacing the one
// reference TU whose OpenCV-3 branch is broken as shipped:
// src/SpatialConvolutionEngine.cpp:90 passes cv::Size(-1,-1) as the
// whole-image size, which the vendored FilterEngine asserts on
// (src/filter.cpp:248-250) — the sentinel was only understood by the
// OpenCV-2 apply() overload (the `#if CV_MAJOR_VERSION == 2` branch at
// :87-88). This TU reproduces the *intended* semantics exactly as the
// OpenCV-2 path computed them — per-channel same-size correlation via
// the reference's own vendored createLinearFilter/FilterEngine
// machinery (channels 0..C-2 zero-padded, last channel one-padded,
// src/SpatialConvolutionEngine.cpp:139-156), summed across channels —
// with the correct whole-image extent passed to apply().
#include <cassert>

#include "SpatialConvolutionEngine.hpp"

using namespace cv;

SpatialConvolutionEngine::SpatialConvolutionEngine(int type, size_t flen)
    : type_(type), flen_(flen) {}

SpatialConvolutionEngine::~SpatialConvolutionEngine() {}

void SpatialConvolutionEngine::convolve(const Mat& feature,
                                        vectorFilterEngine& filter, Mat& pdf,
                                        const size_t stride) {
  assert(feature.depth() == type_);
  vectorMat featurev;
  split(feature.reshape(stride), featurev);

  const Size fsize = featurev[0].size();
  pdf = Mat::zeros(fsize, type_);
  for (size_t c = 0; c < stride; ++c) {
    Mat pdfc(fsize, type_);
    // whole image = the channel plane itself (no submatrix), anchored
    // at the origin — what Rect(0,0,-1,-1) meant to the OpenCV-2 apply
    filter[c]->apply(featurev[c], pdfc, fsize, Point(0, 0));
    pdf += pdfc;
  }
}

void SpatialConvolutionEngine::pdf(const vectorMat& features,
                                   vector2DMat& responses) {
  const size_t M = features.size();
  const size_t N = filters_.size();
  responses.resize(M, vectorMat(N));
  for (size_t n = 0; n < N; ++n) {
    for (size_t m = 0; m < M; ++m) {
      Mat response;
      convolve(features[m], filters_[n], response, flen_);
      responses[m][n] = response;
    }
  }
}

void SpatialConvolutionEngine::setFilters(const vectorMat& filters) {
  const size_t N = filters.size();
  filters_.clear();
  filters_.resize(N);
  const size_t C = flen_;
  for (size_t n = 0; n < N; ++n) {
    vectorMat filtervec;
    vectorFilterEngine filter_engines(C);
    split(filters[n].reshape(C), filtervec);
    for (size_t m = 0; m + 1 < C; ++m) {
      filter_engines[m] =
          createLinearFilter(type_, type_, filtervec[m], Point(-1, -1), 0,
                             BORDER_CONSTANT, -1, Scalar(0, 0, 0, 0));
    }
    filter_engines[C - 1] =
        createLinearFilter(type_, type_, filtervec[C - 1], Point(-1, -1), 0,
                           BORDER_CONSTANT, -1, Scalar(1, 1, 1, 1));
    filters_[n] = filter_engines;
  }
}
