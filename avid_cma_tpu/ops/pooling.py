"""Adaptive pooling (torch AdaptiveMaxPool semantics) for probe heads.

Capability reference: eval configs instantiate torch pooling ops by
string, e.g. "AdaptiveMaxPool3d((1, 12, 12))"
(configs/benchmark/kinetics/8x224x224-linear.yaml pooling_ops;
utils/eval_utils.py:221-242 eval()s them).

torch semantics: output bin i covers [floor(i*n/o), ceil((i+1)*n/o)).
Output sizes are static and tiny (<=12), so we unroll to a fixed set of
slice+max ops — XLA fuses them; no dynamic shapes.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _bounds(n: int, o: int):
    return [(i * n // o, -(-(i + 1) * n // o)) for i in range(o)]


def adaptive_max_pool(
    x: jnp.ndarray, out_size: Sequence[int], spatial_axes: Sequence[int]
) -> jnp.ndarray:
    """Adaptive max pool over `spatial_axes` to `out_size` (same rank)."""
    assert len(out_size) == len(spatial_axes)
    for axis, o in zip(spatial_axes, out_size):
        n = x.shape[axis]
        if o == 1:
            x = jnp.max(x, axis=axis, keepdims=True)
            continue
        pieces = [
            jnp.max(
                jax.lax.slice_in_dim(x, s, e, axis=axis),
                axis=axis, keepdims=True,
            )  # static contiguous slice, not an iota gather
            for s, e in _bounds(n, o)
        ]
        x = jnp.concatenate(pieces, axis=axis)
    return x


_POOL_RE = re.compile(r"AdaptiveMaxPool(\d)d\(\((.*?)\)\)")


def parse_pooling_op(spec: Optional[str]) -> Optional[Tuple[int, Tuple[int, ...]]]:
    """Parse torch-style pooling strings from the YAML configs. Returns
    (ndim, out_size) or None."""
    if spec is None:
        return None
    m = _POOL_RE.match(spec.replace(" ", ""))
    if not m:
        raise ValueError(f"unsupported pooling op {spec!r}")
    ndim = int(m.group(1))
    sizes = tuple(int(s) for s in m.group(2).split(",") if s)
    assert len(sizes) == ndim, spec
    return ndim, sizes


def apply_pooling_op(x: jnp.ndarray, spec: Optional[str]) -> jnp.ndarray:
    """Apply a config pooling string to a channels-last feature map:
    3d -> (B, T, H, W, C), 2d -> (B, H, W, C)."""
    parsed = parse_pooling_op(spec)
    if parsed is None:
        return x
    ndim, sizes = parsed
    spatial = tuple(range(1, 1 + ndim))
    assert x.ndim == ndim + 2, (x.shape, spec)
    return adaptive_max_pool(x, sizes, spatial)
