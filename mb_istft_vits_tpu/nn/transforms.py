"""Piecewise rational-quadratic spline transforms (neural spline flows).

Behavior contract: reference `transforms.py` — softmax-binned widths/heights,
softplus derivatives, linear tails, analytic forward and quadratic-root
inverse with logabsdet. The reference's boolean-mask scatter
(`transforms.py:77-92`) is replaced by `jnp.where` selects — identical math,
static shapes, jit-friendly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted(bin_locations: jnp.ndarray, inputs: jnp.ndarray,
                  eps: float = 1e-6) -> jnp.ndarray:
    """Vectorized bin lookup (reference transforms.py:47-52)."""
    bin_locations = bin_locations.at[..., -1].add(eps)
    idx = jnp.sum(inputs[..., None] >= bin_locations, axis=-1) - 1
    return jnp.clip(idx, 0, bin_locations.shape[-1] - 2)


def rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Monotone RQ spline on [left,right]x[bottom,top]
    (reference transforms.py:96-193). inputs assumed inside the interval
    (callers clamp); returns (outputs, logabsdet)."""
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    if inverse:
        bin_idx = _searchsorted(cumheights, inputs)[..., None]
    else:
        bin_idx = _searchsorted(cumwidths, inputs)[..., None]

    def gather(t, idx):
        return jnp.take_along_axis(t, idx, axis=-1)[..., 0]

    input_cumwidths = gather(cumwidths, bin_idx)
    input_bin_widths = gather(widths, bin_idx)
    input_cumheights = gather(cumheights, bin_idx)
    delta = heights / widths
    input_delta = gather(delta, bin_idx)
    input_derivatives = gather(derivatives, bin_idx)
    input_derivatives_plus_one = gather(derivatives[..., 1:], bin_idx)
    input_heights = gather(heights, bin_idx)

    d_sum = input_derivatives + input_derivatives_plus_one - 2 * input_delta

    if inverse:
        diff = inputs - input_cumheights
        a = diff * d_sum + input_heights * (input_delta - input_derivatives)
        b = input_heights * input_derivatives - diff * d_sum
        c = -input_delta * diff
        discriminant = b * b - 4 * a * c
        discriminant = jnp.maximum(discriminant, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * input_bin_widths + input_cumwidths
        theta_one_minus_theta = root * (1 - root)
        denominator = input_delta + d_sum * theta_one_minus_theta
        derivative_numerator = input_delta**2 * (
            input_derivatives_plus_one * root**2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - root) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, -logabsdet
    else:
        theta = (inputs - input_cumwidths) / input_bin_widths
        theta_one_minus_theta = theta * (1 - theta)
        numerator = input_heights * (
            input_delta * theta**2 + input_derivatives * theta_one_minus_theta
        )
        denominator = input_delta + d_sum * theta_one_minus_theta
        outputs = input_cumheights + numerator / denominator
        derivative_numerator = input_delta**2 * (
            input_derivatives_plus_one * theta**2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - theta) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, logabsdet


def unconstrained_rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear tails outside [-tail_bound, tail_bound]
    (reference transforms.py:55-94)."""
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    pad_widths = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    unnormalized_derivatives = jnp.pad(unnormalized_derivatives, pad_widths)
    constant = float(np.log(np.expm1(1 - min_derivative)))
    unnormalized_derivatives = unnormalized_derivatives.at[..., 0].set(constant)
    unnormalized_derivatives = unnormalized_derivatives.at[..., -1].set(constant)

    clamped = jnp.clip(inputs, -tail_bound, tail_bound)
    spline_out, spline_logdet = rational_quadratic_spline(
        clamped,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        inverse=inverse,
        left=-tail_bound,
        right=tail_bound,
        bottom=-tail_bound,
        top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    outputs = jnp.where(inside, spline_out, inputs)
    logabsdet = jnp.where(inside, spline_logdet, 0.0)
    return outputs, logabsdet


def piecewise_rational_quadratic_transform(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tails: str = None,
    tail_bound: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatcher (reference transforms.py:12-44)."""
    if tails is None:
        return rational_quadratic_spline(
            inputs, unnormalized_widths, unnormalized_heights,
            unnormalized_derivatives, inverse=inverse,
        )
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented")
    return unconstrained_rational_quadratic_spline(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, inverse=inverse, tail_bound=tail_bound,
    )
