#pragma once
namespace boost {
template <class Engine, class Dist>
struct variate_generator {
  Engine eng_; Dist dist_;
  variate_generator(Engine e, Dist d) : eng_(e), dist_(d) {}
  auto operator()() { return dist_(*eng_); }
};
}
