"""Pallas TPU kernels for the gdia lattice shift-MAC primitives.

The gdia fast paths (mesh/gdia.py) express every linear-weight Gauss
operator and the SpMV off-diagonal product as

    out[c, s] = sum_k coeffs[k, c, s] * x[s + offsets[k]]

with static offsets (plane steps of the lattice embedding). In XLA each
dynamic-slice + FMA materializes a full (n,) intermediate (measured: the
9-column gradient MAC at 922k cells moves ~16 GB of HBM for an op whose
inputs+outputs are ~160 MB — the slice chain defeats fusion).

Kernel shape: the K shifted copies of x are prepared OUTSIDE the kernel
(K cheap pad+slice ops — Mosaic cannot address unaligned 1-D dynamic
slices in VMEM, offsets like +-1 are not multiples of the 1024-lane
tile), then one grid sweep contracts them against the coefficient
planes entirely on-chip: HBM traffic = xs + coeffs + out, the
speed-of-light for the op, with zero intermediate materializations.

Layout: all arrays are CELL-AXIS-LAST ((K, C, n) coefficients, (C, n)
outputs) so the minor dimension is the large one — (n, 3)-minor arrays
tile as 3->128 lanes on TPU (42x memory inflation), the root cause of
the original slowdowns.

Reference counterpart: lduMatrixATmul.C:43-140's gathered SpMV —
re-founded as a VMEM-blocked stencil kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_BLOCK = 16384          # lanes per grid step (128-aligned)


def use_pallas(x) -> bool:
    """Real TPU only (the CPU test tier runs the XLA fallback; the
    dedicated correctness test runs the kernel in interpret mode)."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon") \
            and x.dtype == jnp.float32
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mac_pallas(xs, coeffs, *, interpret=False):
    """xs (K, n_pad), coeffs (K, C, n_pad) -> (C, n_pad); n_pad a
    multiple of the block."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, C, n_pad = coeffs.shape
    B = min(_BLOCK, n_pad)
    grid = n_pad // B

    def kernel(xs_ref, c_ref, out_ref):
        acc = c_ref[0] * xs_ref[0][None, :]
        for k in range(1, K):
            acc = acc + c_ref[k] * xs_ref[k][None, :]
        out_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, n_pad), coeffs.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((K, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, B), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xs, coeffs)


def _shifted_stack(x, offsets, D, pad_to=None):
    """(K, n [+pad]) stack of zero-filled shifts of x (result[k][s] =
    x[s + offsets[k]])."""
    n = x.shape[0]
    extra = 0 if pad_to is None else pad_to - n
    xp = jnp.pad(x, (D, D + extra))
    rows = [lax.dynamic_slice_in_dim(xp, D + o, n + extra)
            for o in offsets]
    return jnp.stack(rows, axis=0)


def shift_mac_cols(x, coeffs, offsets, *, interpret=False):
    """out[c] = sum_k coeffs[k, c, :] * shift(x, offsets[k]) with
    zero-fill outside [0, n). x (n,), coeffs (K, C, n) -> (C, n).

    Dispatches to the Pallas kernel on TPU (fp32), else to a
    column-major XLA fallback (one slice + one (C, n) FMA per offset —
    still minor-axis-n layouts throughout)."""
    K, C, n = coeffs.shape
    D = max(1, max(abs(o) for o in offsets))
    if interpret or use_pallas(x):
        nb = -(-n // _BLOCK) * _BLOCK
        xs = _shifted_stack(x, offsets, D, pad_to=nb)
        cp = coeffs if nb == n else jnp.pad(
            coeffs, ((0, 0), (0, 0), (0, nb - n)))
        out = _mac_pallas(xs, cp, interpret=interpret)
        return out[:, :n]
    xs = None
    xp = jnp.pad(x, (D, D))
    acc = None
    for k, o in enumerate(offsets):
        sl = lax.dynamic_slice_in_dim(xp, D + o, n)
        term = coeffs[k] * sl[None, :]
        acc = term if acc is None else acc + term
    return acc
