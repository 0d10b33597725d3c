#pragma once
namespace boost {
template <class RealType = double>
struct bernoulli_distribution {
  RealType p_;
  explicit bernoulli_distribution(RealType p = 0.5) : p_(p) {}
  template <class Engine> bool operator()(Engine& eng) {
    return ((double)(eng() - Engine::min()) /
            ((double)Engine::max() - Engine::min() + 1.0)) < (double)p_;
  }
};
}
