// Minimal drop-in for boost::detail::spinlock (no Boost in this image).
#pragma once
#include <atomic>

namespace boost {
namespace detail {

struct spinlock {
  std::atomic_flag flag = ATOMIC_FLAG_INIT;
  void lock() { while (flag.test_and_set(std::memory_order_acquire)) {} }
  void unlock() { flag.clear(std::memory_order_release); }
  bool try_lock() { return !flag.test_and_set(std::memory_order_acquire); }
};

}  // namespace detail
}  // namespace boost
