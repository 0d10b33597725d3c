"""Optimizers with the reference's exact update rules.

Ports the semantics (not the code) of the tiny-dnn-derived optimizer set
(include/utils/optimizer.h:23-193, src/utilities/optimizer.cpp). The
important quirk: the reference's Adam keeps running decay powers that
START at b1/b2 (optimizer.h:99-100: ``b1_t(0.9), b2_t(0.999)``), i.e. on
the first update the bias correction is 1-b1 (a step-1 correction), and
epsilon sits INSIDE the sqrt: W -= alpha * m_hat / sqrt(v_hat + eps).

API is optax-style pure functions over pytrees:
    state = opt.init(params)
    params, state = opt.update(grads, state, params)
Defaults match global.h:29-40 (lr 0.01 for bare adam; the model passes
the CLI learning rate).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    m: Any
    v: Any
    b1_t: jnp.ndarray
    b2_t: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Adam:
    lr: float = 0.01
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8

    def init(self, params) -> AdamState:
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamState(
            m=zeros,
            v=jax.tree.map(jnp.zeros_like, params),
            b1_t=jnp.asarray(self.b1, jnp.float32),
            b2_t=jnp.asarray(self.b2, jnp.float32),
        )

    def update(self, grads, state: AdamState, params):
        b1, b2 = self.b1, self.b2
        m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.v, grads)
        b1_t, b2_t = state.b1_t, state.b2_t

        def step(w, m, v):
            return w - self.lr * (m / (1 - b1_t)) / jnp.sqrt(v / (1 - b2_t) + self.eps)

        new_params = jax.tree.map(step, params, m, v)
        return new_params, AdamState(m=m, v=v, b1_t=b1_t * b1, b2_t=b2_t * b2)


class SGDState(NamedTuple):
    pass


@dataclasses.dataclass(frozen=True)
class SGD:
    """gradient_descent (optimizer.cpp:50-54): W -= lr*(dW + lambda*W)."""

    lr: float = 0.01
    weight_decay: float = 0.0

    def init(self, params) -> SGDState:
        return SGDState()

    def update(self, grads, state: SGDState, params):
        new = jax.tree.map(
            lambda w, g: w - self.lr * (g + self.weight_decay * w), params, grads
        )
        return new, state


class MomentumState(NamedTuple):
    dw_prev: Any


@dataclasses.dataclass(frozen=True)
class Momentum:
    """momentum (optimizer.cpp:57-66): V = mu*V - lr*(dW + W*lambda); W += V."""

    lr: float = 0.01
    mu: float = 0.9
    weight_decay: float = 0.0

    def init(self, params) -> MomentumState:
        return MomentumState(dw_prev=jax.tree.map(jnp.zeros_like, params))

    def update(self, grads, state: MomentumState, params):
        vel = jax.tree.map(
            lambda v, g, w: self.mu * v - self.lr * (g + w * self.weight_decay),
            state.dw_prev, grads, params,
        )
        new = jax.tree.map(lambda w, v: w + v, params, vel)
        return new, MomentumState(dw_prev=vel)


@dataclasses.dataclass(frozen=True)
class Nesterov:
    """nesterov_momentum (optimizer.cpp:66-74):
    V = mu*Vprev - lr*(dW + W*lambda); W += -mu*Vprev + (1+mu)*V."""

    lr: float = 0.01
    mu: float = 0.9
    weight_decay: float = 0.0

    def init(self, params) -> MomentumState:
        return MomentumState(dw_prev=jax.tree.map(jnp.zeros_like, params))

    def update(self, grads, state: MomentumState, params):
        vel = jax.tree.map(
            lambda v, g, w: self.mu * v - self.lr * (g + w * self.weight_decay),
            state.dw_prev, grads, params,
        )
        new = jax.tree.map(
            lambda w, vp, v: w - self.mu * vp + (1 + self.mu) * v,
            params, state.dw_prev, vel,
        )
        return new, MomentumState(dw_prev=vel)


class AdagradState(NamedTuple):
    g2: Any


@dataclasses.dataclass(frozen=True)
class Adagrad:
    """adagrad (optimizer.cpp:4-11): g2 += dW^2; W -= lr*dW/(sqrt(g2)+eps)."""

    lr: float = 0.01
    eps: float = 1e-8

    def init(self, params) -> AdagradState:
        return AdagradState(g2=jax.tree.map(jnp.zeros_like, params))

    def update(self, grads, state: AdagradState, params):
        g2 = jax.tree.map(lambda a, g: a + g * g, state.g2, grads)
        new = jax.tree.map(
            lambda w, g, a: w - self.lr * g / (jnp.sqrt(a) + self.eps),
            params, grads, g2,
        )
        return new, AdagradState(g2=g2)


class RMSpropState(NamedTuple):
    g2: Any


@dataclasses.dataclass(frozen=True)
class RMSprop:
    """RMSprop (optimizer.cpp:13-20): g2 = mu*g2+(1-mu)dW^2;
    W -= lr*dW/sqrt(g2+eps)."""

    lr: float = 0.0001
    mu: float = 0.99
    eps: float = 1e-8

    def init(self, params) -> RMSpropState:
        return RMSpropState(g2=jax.tree.map(jnp.zeros_like, params))

    def update(self, grads, state: RMSpropState, params):
        g2 = jax.tree.map(
            lambda a, g: self.mu * a + (1 - self.mu) * g * g, state.g2, grads
        )
        new = jax.tree.map(
            lambda w, g, a: w - self.lr * g / jnp.sqrt(a + self.eps),
            params, grads, g2,
        )
        return new, RMSpropState(g2=g2)


class AdamaxState(NamedTuple):
    m: Any
    u: Any
    b1_t: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Adamax:
    """adamax (optimizer.cpp:37-48)."""

    lr: float = 0.002
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8

    def init(self, params) -> AdamaxState:
        return AdamaxState(
            m=jax.tree.map(jnp.zeros_like, params),
            u=jax.tree.map(jnp.zeros_like, params),
            b1_t=jnp.asarray(self.b1, jnp.float32),
        )

    def update(self, grads, state: AdamaxState, params):
        b1, b2 = self.b1, self.b2
        m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.m, grads)
        u = jax.tree.map(lambda u, g: jnp.maximum(b2 * u, jnp.abs(g)), state.u, grads)
        b1_t = state.b1_t
        new = jax.tree.map(
            lambda w, m, u: w - (self.lr / (1 - b1_t)) * (m / (u + self.eps)),
            params, m, u,
        )
        return new, AdamaxState(m=m, u=u, b1_t=b1_t * b1)


OPTIMIZERS = {
    "adam": Adam,
    "sgd": SGD,
    "momentum": Momentum,
    "nesterov": Nesterov,
    "adagrad": Adagrad,
    "rmsprop": RMSprop,
    "adamax": Adamax,
}
