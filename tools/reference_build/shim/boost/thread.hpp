#pragma once
namespace boost {
template <class T>
class thread_specific_ptr {
  static thread_local T* p_;
public:
  T* get() { return p_; }
  void reset(T* np) { delete p_; p_ = np; }
  T* operator->() { return p_; }
};
template <class T> thread_local T* thread_specific_ptr<T>::p_ = nullptr;
}
