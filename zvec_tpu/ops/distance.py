"""Dense distance matrices on the MXU.

TPU-native replacement for the reference's ISA-dispatched SIMD distance matrix
kernels (`src/ailego/math/distance.h:24`, `inner_product_matrix.h`,
`euclidean_distance_matrix*.cc`): every metric reduces to one batched matmul
(queries x codes^T on the MXU) plus cheap VPU epilogues, so there is no per-ISA
dispatch — XLA tiles onto the hardware.

Score conventions (must match the reference oracles in
`python/tests/detail/distance_helper.py:58-115`):
  - L2     -> SQUARED euclidean distance, ascending (smaller = closer)
  - COSINE -> 1 - cosine_similarity, ascending
  - IP     -> raw dot product, DESCENDING (larger = closer)

Internally every search works on a uniform "similarity" (larger = better):
  IP: dot; L2: -squared_l2; COSINE: cosine_similarity.
`similarity_to_score` converts back to user-facing scores at the boundary.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..typing.enum import MetricType

__all__ = [
    "ip_matrix",
    "squared_l2_matrix",
    "cosine_distance_matrix",
    "hamming_distance_matrix",
    "l2_norms",
    "similarity_matrix",
    "similarity_to_score",
    "score_to_similarity",
]


def l2_norms(x: jax.Array) -> jax.Array:
    """Squared L2 norm of each row. (N, D) -> (N,)."""
    x = x.astype(jnp.float32)
    return jnp.sum(x * x, axis=-1)


def _f32_dot(q: jax.Array, x: jax.Array) -> jax.Array:
    return jax.lax.dot_general(
        q,
        x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def ip_matrix(
    q: jax.Array,
    x: jax.Array,
    dequant: tuple | None = None,
    int4_packed: bool = False,
) -> jax.Array:
    """Inner products: (Q, D) x (N, D) -> (Q, N).

    `Precision.HIGHEST` keeps fp32 accumulate on the MXU (default is bf16
    passes); distance parity with the fp32 reference requires it.

    `dequant=(scale, bias)` scores float queries against affine-quantized
    integer codes without materializing dequantized vectors (the asymmetric
    scoring of the reference's `quantized_integer_metric.cc`):
      dot(q, c*scale + bias) = scale * dot(q, c) + bias * sum(q).

    `int4_packed`: `x` holds two int4 codes per byte ((N, ceil(D/2)) int8,
    low nibble = even element). The dot splits into even/odd halves so the
    packed array never expands in HBM:
      dot(q, c) = dot(q_even, lo_nibbles) + dot(q_odd, hi_nibbles).
    """
    if int4_packed:
        lo = jnp.left_shift(x, 4) >> 4  # sign-extended low nibble
        hi = x >> 4
        d2 = x.shape[-1]
        q_even = q[:, 0 : 2 * d2 : 2]
        q_odd = q[:, 1 : 2 * d2 : 2]
        if q_odd.shape[1] < d2:  # odd logical D: pad-query column is zero
            q_odd = jnp.pad(q_odd, ((0, 0), (0, d2 - q_odd.shape[1])))
        dots = _f32_dot(q_even, lo.astype(jnp.float32)) + _f32_dot(
            q_odd, hi.astype(jnp.float32)
        )
    else:
        if x.dtype != jnp.float32:
            x = x.astype(jnp.float32)
        dots = _f32_dot(q, x)
    if dequant is not None:
        scale, bias = dequant
        dots = scale * dots + bias * jnp.sum(q, axis=-1, keepdims=True)
    return dots


def squared_l2_matrix(
    q: jax.Array,
    x: jax.Array,
    x_sq_norms: jax.Array | None = None,
    dequant: tuple | None = None,
    int4_packed: bool = False,
) -> jax.Array:
    """Squared euclidean distances: ||q||^2 + ||x||^2 - 2 q.x -> (Q, N).

    `x_sq_norms` may be precomputed once per code block. With `dequant` it
    must be the squared norms of the DEQUANTIZED codes.
    """
    if x_sq_norms is None:
        assert not int4_packed, "packed int4 codes require precomputed norms"
        x_sq_norms = l2_norms(x)
    q_sq = l2_norms(q)
    dots = ip_matrix(q, x, dequant, int4_packed)
    d = q_sq[:, None] + x_sq_norms[None, :] - 2.0 * dots
    return jnp.maximum(d, 0.0)


def cosine_distance_matrix(
    q: jax.Array,
    x: jax.Array,
    x_sq_norms: jax.Array | None = None,
    dequant: tuple | None = None,
    int4_packed: bool = False,
) -> jax.Array:
    """1 - cosine similarity -> (Q, N). Zero vectors get distance 0 (reference
    oracle convention, `distance_helper.py:73-74`)."""
    return 1.0 - _cosine_similarity_matrix(q, x, x_sq_norms, dequant, int4_packed)


def _cosine_similarity_matrix(q, x, x_sq_norms=None, dequant=None, int4_packed=False):
    if x_sq_norms is None:
        assert not int4_packed, "packed int4 codes require precomputed norms"
        x_sq_norms = l2_norms(x)
    q_sq = l2_norms(q)
    dots = ip_matrix(q, x, dequant, int4_packed)
    denom = jnp.sqrt(q_sq)[:, None] * jnp.sqrt(x_sq_norms)[None, :]
    # Zero-magnitude convention: similarity 1 => distance 0 (reference oracle,
    # `distance_helper.py:73-74` returns 0.0 when either magnitude is 0).
    return jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 1.0)


def hamming_distance_matrix(q_bits: jax.Array, x_bits: jax.Array) -> jax.Array:
    """Hamming distance over packed binary codes (uint8): (Q, B) x (N, B) -> (Q, N).

    Popcount of XOR, computed via a 16-entry nibble LUT on the VPU (the TPU
    equivalent of the reference's `distance_matrix_popcnt.i` kernels).
    """
    q_bits = q_bits.astype(jnp.uint8)
    x_bits = x_bits.astype(jnp.uint8)
    xor = jnp.bitwise_xor(q_bits[:, None, :], x_bits[None, :, :])
    lo = xor & 0x0F
    hi = (xor >> 4) & 0x0F
    popc = _NIBBLE_POPCOUNT[lo] + _NIBBLE_POPCOUNT[hi]
    return jnp.sum(popc.astype(jnp.int32), axis=-1)


_NIBBLE_POPCOUNT = jnp.array(
    [0, 1, 1, 2, 1, 2, 2, 3, 1, 2, 2, 3, 2, 3, 3, 4], dtype=jnp.uint8
)


def similarity_matrix(
    q: jax.Array,
    x: jax.Array,
    metric: MetricType,
    x_sq_norms: jax.Array | None = None,
    dequant: tuple | None = None,
    int4_packed: bool = False,
) -> jax.Array:
    """Uniform larger-is-better similarity for any metric: (Q, N)."""
    metric = MetricType(metric)
    if metric == MetricType.IP:
        return ip_matrix(q, x, dequant, int4_packed)
    if metric == MetricType.L2:
        return -squared_l2_matrix(q, x, x_sq_norms, dequant, int4_packed)
    if metric == MetricType.COSINE:
        return _cosine_similarity_matrix(q, x, x_sq_norms, dequant, int4_packed)
    if metric == MetricType.HAMMING:
        # q and x arrive as ±1 vectors (engines unpack bit codes; see
        # quantize.bits_to_pm1): hamming = ||q - x||^2 / 4 rides the MXU.
        return -squared_l2_matrix(q, x, x_sq_norms, dequant, int4_packed) * 0.25
    raise ValueError(f"unsupported metric {metric}")


def similarity_to_score(sim, metric: MetricType):
    """Convert internal similarity back to the user-facing score convention."""
    metric = MetricType(metric)
    if metric == MetricType.IP:
        return sim
    if metric in (MetricType.L2, MetricType.HAMMING):
        return -sim  # squared L2 / hamming distance, ascending
    if metric == MetricType.COSINE:
        return 1.0 - sim  # cosine distance
    raise ValueError(f"unsupported metric {metric}")


def score_to_similarity(score, metric: MetricType):
    metric = MetricType(metric)
    if metric == MetricType.IP:
        return score
    if metric in (MetricType.L2, MetricType.HAMMING):
        return -score
    if metric == MetricType.COSINE:
        return 1.0 - score
    raise ValueError(f"unsupported metric {metric}")
