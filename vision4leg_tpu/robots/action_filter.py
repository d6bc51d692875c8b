"""Butterworth low-pass action filter, jittable.

Reference: vision4leg/robots/action_filter.py (ActionFilterButter, default
order 2 lowpass with highcut [4.0] Hz at the control sampling rate
1/(time_step * action_repeat), minitaur.py:1445-1459).  Coefficients are
computed once at build time with scipy; the per-step IIR update is a pure
function of an (x_hist, y_hist) state so it nests in the jitted env step.

Default off in all shipped configs (enable_action_filter: false).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct
from scipy import signal

ACTION_FILTER_ORDER = 2
ACTION_FILTER_HIGH_CUT = 4.0


class ButterCoeffs(NamedTuple):
  b: tuple  # (order+1,) numerator
  a: tuple  # (order+1,) denominator (a[0] == 1)


@struct.dataclass
class FilterState:
  xhist: jnp.ndarray  # (order, num_joints) past inputs, newest first
  yhist: jnp.ndarray  # (order, num_joints) past outputs, newest first


def make_coeffs(sampling_rate: float,
                highcut: float = ACTION_FILTER_HIGH_CUT,
                order: int = ACTION_FILTER_ORDER) -> ButterCoeffs:
  b, a = signal.butter(order, highcut / (sampling_rate / 2.0),
                       btype="low")
  return ButterCoeffs(b=tuple(float(x) for x in b),
                      a=tuple(float(x) for x in a / a[0]))


def init_state(num_joints: int, init_value: jnp.ndarray,
               order: int = ACTION_FILTER_ORDER) -> FilterState:
  """init_history (action_filter.py): prefill with the default pose so the
  filter starts at steady state."""
  tile = jnp.tile(init_value[None], (order, 1))
  return FilterState(xhist=tile, yhist=tile)


def apply(coeffs: ButterCoeffs, state: FilterState,
          x: jnp.ndarray) -> Tuple[FilterState, jnp.ndarray]:
  """Direct-form-I IIR step: y = b0 x + sum b_i x_-i - sum a_i y_-i."""
  b = jnp.asarray(coeffs.b)
  a = jnp.asarray(coeffs.a)
  y = b[0] * x
  for i in range(state.xhist.shape[0]):
    y = y + b[i + 1] * state.xhist[i] - a[i + 1] * state.yhist[i]
  new = FilterState(
      xhist=jnp.concatenate([x[None], state.xhist[:-1]], axis=0),
      yhist=jnp.concatenate([y[None], state.yhist[:-1]], axis=0))
  return new, y
