"""Differentiable 1D transfer-function texture lookup.

Replicates the reference's ``sampler1D`` fetch semantics
(``src/rendering/offscreen_pass.cpp:1125-1150``): linear filtering at texel
centers with CLAMP_TO_EDGE addressing.  The table is a dense float
``(N, 4)`` RGBA array; the lookup is linear interpolation, so gradients flow
from pixels to table entries — this is what makes the TF optimizable
(BASELINE config 3), which the ImGui editor of the reference cannot do.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_tf(table: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Sample the TF table at normalized density ``t`` (any shape).

    ``table``: ``(N, 4)`` float RGBA.  Returns ``t.shape + (4,)``.

    GPU linear-sampler semantics: texel i covers ``[i/N, (i+1)/N)`` with its
    center at ``(i+0.5)/N``; a fetch at coordinate u interpolates the two
    nearest texel centers, with out-of-range indices clamped to the edge
    (CLAMP_TO_EDGE).  Out-of-[0,1] coordinates (densities outside the density
    window) therefore return the edge color, like the reference.
    """
    n = table.shape[0]
    x = t * n - 0.5
    i0 = jnp.floor(x)
    w = (x - i0)[..., None]
    i0 = i0.astype(jnp.int32)
    lo = jnp.clip(i0, 0, n - 1)
    hi = jnp.clip(i0 + 1, 0, n - 1)
    return table[lo] * (1.0 - w) + table[hi] * w
