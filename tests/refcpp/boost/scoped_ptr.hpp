// Minimal stand-in for boost::scoped_ptr (boost is not installed in
// this image). PartsBasedDetector.hpp only needs reset()/operator->
// (include/PartsBasedDetector.hpp:158-160); back it with unique_ptr.
#pragma once
#include <memory>
namespace boost {
template <typename T>
class scoped_ptr {
 public:
  scoped_ptr() {}
  explicit scoped_ptr(T* p) : p_(p) {}
  void reset(T* p = nullptr) { p_.reset(p); }
  T* get() const { return p_.get(); }
  T& operator*() const { return *p_; }
  T* operator->() const { return p_.get(); }
  explicit operator bool() const { return bool(p_); }

 private:
  std::unique_ptr<T> p_;
};
}  // namespace boost
