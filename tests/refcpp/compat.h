// Build-compat shim: compiles the reference's OpenCV-3-era C++ sources
// (/root/reference/src, read-only, never copied) against the OpenCV 4.6
// that is installed here. Two gaps to bridge:
//  - the vendored FilterEngine backport and its call sites are guarded
//    by `#if CV_MAJOR_VERSION == 3` (src/filter.cpp:44-47,
//    include/filterengine.hpp:40); force the guard on so the backport
//    provides cv::FilterEngine/createLinearFilter, which OpenCV 4
//    removed from the public API,
//  - OpenCV 4 dropped the C-API error-code macros; map the ones the
//    reference uses onto the cv::Error enum.
// Prepended to every reference TU via `g++ -include compat.h`.
#pragma once
#include <opencv2/core/version.hpp>
#include <opencv2/core/base.hpp>
#define CV_StsUnsupportedFormat cv::Error::StsUnsupportedFormat
#define CV_StsNotImplemented    cv::Error::StsNotImplemented
#define CV_StsBadArg            cv::Error::StsBadArg
#define CV_StsBadSize           cv::Error::StsBadSize
#define CV_StsOutOfRange        cv::Error::StsOutOfRange
#define CV_StsError             cv::Error::StsError
#undef CV_MAJOR_VERSION
#define CV_MAJOR_VERSION 3
