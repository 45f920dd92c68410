"""Linear Kalman filter (reference stp3/utils/tools.py:392-437 defines an
unused ``KalmanFilter`` nn.Module; provided here as a pure-jnp utility for
trajectory smoothing / tracking consumers).

State-space model:
    x_{t+1} = F x_t + w,  w ~ N(0, Q)
    z_t     = H x_t + v,  v ~ N(0, R)
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class KalmanState(NamedTuple):
    x: jnp.ndarray   # (n,) state mean
    p: jnp.ndarray   # (n, n) state covariance


class KalmanFilter:
    def __init__(self, f, h, q, r):
        self.f = jnp.asarray(f)
        self.h = jnp.asarray(h)
        self.q = jnp.asarray(q)
        self.r = jnp.asarray(r)

    def init(self, x0, p0) -> KalmanState:
        return KalmanState(jnp.asarray(x0), jnp.asarray(p0))

    def predict(self, s: KalmanState) -> KalmanState:
        x = self.f @ s.x
        p = self.f @ s.p @ self.f.T + self.q
        return KalmanState(x, p)

    def update(self, s: KalmanState, z) -> KalmanState:
        y = jnp.asarray(z) - self.h @ s.x
        inn_cov = self.h @ s.p @ self.h.T + self.r
        k = s.p @ self.h.T @ jnp.linalg.inv(inn_cov)
        x = s.x + k @ y
        p = (jnp.eye(s.p.shape[0]) - k @ self.h) @ s.p
        return KalmanState(x, p)

    def filter(self, s0: KalmanState, zs: jnp.ndarray) -> Tuple[KalmanState, jnp.ndarray]:
        """Run predict+update over a sequence zs (T, m) with lax.scan."""
        def step(s, z):
            s = self.update(self.predict(s), z)
            return s, s.x
        return jax.lax.scan(step, s0, jnp.asarray(zs))
