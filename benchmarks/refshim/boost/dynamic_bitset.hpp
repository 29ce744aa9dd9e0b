// Minimal drop-in for boost::dynamic_bitset<> as used by the reference
// engine's NSG build (test/set via operator[], ctor (n, value)).
// Exists because this image has no Boost headers and zero egress.
#pragma once
#include <cstddef>
#include <vector>

namespace boost {

template <typename Block = unsigned long>
class dynamic_bitset {
 public:
  dynamic_bitset() = default;
  dynamic_bitset(std::size_t n, unsigned long value = 0) : bits_(n, false) {
    for (std::size_t i = 0; i < n && value; ++i, value >>= 1)
      bits_[i] = value & 1;
  }
  class reference {
   public:
    reference(std::vector<bool>& v, std::size_t i) : v_(v), i_(i) {}
    operator bool() const { return v_[i_]; }
    reference& operator=(bool b) { v_[i_] = b; return *this; }
   private:
    std::vector<bool>& v_;
    std::size_t i_;
  };
  reference operator[](std::size_t i) { return reference(bits_, i); }
  bool operator[](std::size_t i) const { return bits_[i]; }
  bool test(std::size_t i) const { return bits_[i]; }
  void set(std::size_t i, bool v = true) { bits_[i] = v; }
  void reset() { bits_.assign(bits_.size(), false); }
  std::size_t size() const { return bits_.size(); }

 private:
  std::vector<bool> bits_;
};

}  // namespace boost
