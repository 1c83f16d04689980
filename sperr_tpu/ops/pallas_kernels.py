"""Pallas TPU kernels for the codec's hot dense ops.

The lifting wavelet is HBM-bandwidth-bound; under plain XLA each lifting step
and gather/scatter can materialize an intermediate, costing several HBM
passes per level.  These kernels keep a whole 2D plane (or a row/column
block) resident in VMEM and run *all* lifting steps of a full 2D level —
both axes — in one pass: one HBM read + one HBM write per level.

A second kernel fuses the quantization epilogue (rint, sign split, magnitude,
per-block max) so the encode path emits quantized integers in the same pass
that consumes wavelet coefficients.

All kernels also run under `interpret=True` on CPU, which is how the test
suite validates them without TPU hardware.

TPU lowering status (Mosaic, jax 0.9): the quantization kernel compiles for
TPU; the whole-plane lifting kernels are blocked on Mosaic's missing
strided-gather / minor-dim reshape lowerings (the even/odd deinterleave) and
currently serve as interpret-mode prototypes — the XLA engine
(ops/cdf97_jax.py) is the production TPU transform path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.dims import calc_approx_detail_len, num_of_xforms
from .cdf97_np import ALPHA, BETA, DELTA, EPSILON, GAMMA, INV_EPSILON


# ---------------------------------------------------------------------------
# In-kernel lifting along a given axis of a VMEM-resident block.
# Uses the same slice/concat structure as cdf97_jax (boundary-clamped).
# ---------------------------------------------------------------------------
def _sl(x, axis, start, stop, step=None):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, stop, step)
    return x[tuple(idx)]


def _deinterleave(seg, axis: int):
    """Split even/odd positions along `axis` via reshape (no strided gather,
    which Mosaic does not lower)."""
    n = seg.shape[axis]
    a = axis if axis >= 0 else seg.ndim + axis
    if n % 2 == 0:
        shape = list(seg.shape)
        shape[a : a + 1] = [n // 2, 2]
        z = seg.reshape(shape)
        even = _sl(z, a + 1, 0, 1).reshape(
            [*seg.shape[:a], n // 2, *seg.shape[a + 1 :]]
        )
        odd = _sl(z, a + 1, 1, 2).reshape(
            [*seg.shape[:a], n // 2, *seg.shape[a + 1 :]]
        )
        return even, odd
    body = _sl(seg, a, 0, n - 1)
    shape = list(body.shape)
    shape[a : a + 1] = [n // 2, 2]
    z = body.reshape(shape)
    even_b = _sl(z, a + 1, 0, 1).reshape([*seg.shape[:a], n // 2, *seg.shape[a + 1 :]])
    odd = _sl(z, a + 1, 1, 2).reshape([*seg.shape[:a], n // 2, *seg.shape[a + 1 :]])
    even = jnp.concatenate([even_b, _sl(seg, a, n - 1, n)], a)
    return even, odd


def _analysis(x, axis: int, length: int):
    """One forward level over x[..., :length] along `axis` (static shapes)."""
    full = x.shape[axis]
    seg = _sl(x, axis, 0, length) if length < full else x
    n = length
    el, ol = n - n // 2, n // 2
    even, odd = _deinterleave(seg, axis)
    dt = x.dtype

    def nbrs(even, odd):
        if el == ol:
            e_r = jnp.concatenate(
                [_sl(even, axis, 1, ol), _sl(even, axis, el - 1, el)], axis
            )
            o_l = jnp.concatenate(
                [_sl(odd, axis, 0, 1), _sl(odd, axis, 0, el - 1)], axis
            )
            o_r = odd
        else:
            e_r = _sl(even, axis, 1, ol + 1)
            o_l = jnp.concatenate([_sl(odd, axis, 0, 1), odd], axis)
            o_r = jnp.concatenate([odd, _sl(odd, axis, ol - 1, ol)], axis)
        return e_r, o_l, o_r

    e_r, _, _ = nbrs(even, odd)
    odd = odd + dt.type(ALPHA) * (_sl(even, axis, 0, ol) + e_r)
    _, o_l, o_r = nbrs(even, odd)
    even = even + dt.type(BETA) * (o_l + o_r)
    e_r, _, _ = nbrs(even, odd)
    odd = odd + dt.type(GAMMA) * (_sl(even, axis, 0, ol) + e_r)
    _, o_l, o_r = nbrs(even, odd)
    even = dt.type(EPSILON) * (even + dt.type(DELTA) * (o_l + o_r))
    odd = odd * dt.type(-INV_EPSILON)

    out = jnp.concatenate([even, odd], axis)
    if length < full:
        out = jnp.concatenate([out, _sl(x, axis, length, None)], axis)
    return out


def _synthesis(x, axis: int, length: int):
    full = x.shape[axis]
    seg = _sl(x, axis, 0, length) if length < full else x
    n = length
    el, ol = n - n // 2, n // 2
    even = _sl(seg, axis, 0, el)
    odd = _sl(seg, axis, el, None)
    dt = x.dtype

    def nbrs(even, odd):
        if el == ol:
            e_r = jnp.concatenate(
                [_sl(even, axis, 1, ol), _sl(even, axis, el - 1, el)], axis
            )
            o_l = jnp.concatenate(
                [_sl(odd, axis, 0, 1), _sl(odd, axis, 0, el - 1)], axis
            )
            o_r = odd
        else:
            e_r = _sl(even, axis, 1, ol + 1)
            o_l = jnp.concatenate([_sl(odd, axis, 0, 1), odd], axis)
            o_r = jnp.concatenate([odd, _sl(odd, axis, ol - 1, ol)], axis)
        return e_r, o_l, o_r

    odd = odd * dt.type(-EPSILON)
    _, o_l, o_r = nbrs(even, odd)
    even = even * dt.type(INV_EPSILON) - dt.type(DELTA) * (o_l + o_r)
    e_r, _, _ = nbrs(even, odd)
    odd = odd - dt.type(GAMMA) * (_sl(even, axis, 0, ol) + e_r)
    _, o_l, o_r = nbrs(even, odd)
    even = even - dt.type(BETA) * (o_l + o_r)
    e_r, _, _ = nbrs(even, odd)
    odd = odd - dt.type(ALPHA) * (_sl(even, axis, 0, ol) + e_r)

    # Re-interleave: place approx at even positions, detail at odd.
    if n % 2 == 0:
        st = jnp.stack([even, odd], axis=axis + 1 if axis >= 0 else x.ndim + axis + 1)
        shape = list(seg.shape)
        a = axis if axis >= 0 else x.ndim + axis
        shape[a] = n
        out = st.reshape(shape)
    else:
        a = axis if axis >= 0 else x.ndim + axis
        st = jnp.stack([_sl(even, a, 0, el - 1), odd], axis=a + 1)
        shape = list(seg.shape)
        shape[a] = n - 1
        out = jnp.concatenate([st.reshape(shape), _sl(even, a, el - 1, el)], a)
    if length < full:
        out = jnp.concatenate([out, _sl(x, axis, length, None)], axis)
    return out


# ---------------------------------------------------------------------------
# Fused whole-plane kernels: all levels, both axes, in VMEM.
# ---------------------------------------------------------------------------
def _dwt2d_full_kernel(levels, in_ref, out_ref):
    x = in_ref[0]  # 2D view: Mosaic supports only 2D strided gathers
    ny, nx = x.shape[-2], x.shape[-1]
    for lev in range(levels):
        lx, _ = calc_approx_detail_len(nx, lev)
        ly, _ = calc_approx_detail_len(ny, lev)
        x = _analysis(x, -1, lx) if ly == ny else _partial_rows(x, lx, ly, fwd=True)
        if ly == ny and lx == nx:
            x = _analysis(x, -2, ly)
        else:
            x = _partial_cols(x, lx, ly, fwd=True)
    out_ref[0] = x


def _partial_rows(x, lx, ly, fwd: bool):
    top = _sl(x, -2, 0, ly)
    top = _analysis(top, -1, lx) if fwd else _synthesis(top, -1, lx)
    return jnp.concatenate([top, _sl(x, -2, ly, None)], -2)


def _partial_cols(x, lx, ly, fwd: bool):
    left = _sl(x, -1, 0, lx)
    left = _analysis(left, -2, ly) if fwd else _synthesis(left, -2, ly)
    return jnp.concatenate([left, _sl(x, -1, lx, None)], -1)


def _idwt2d_full_kernel(levels, in_ref, out_ref):
    x = in_ref[0]
    ny, nx = x.shape[-2], x.shape[-1]
    for lev in range(levels, 0, -1):
        lx, _ = calc_approx_detail_len(nx, lev - 1)
        ly, _ = calc_approx_detail_len(ny, lev - 1)
        if ly == ny and lx == nx:
            x = _synthesis(x, -2, ly)
        else:
            x = _partial_cols(x, lx, ly, fwd=False)
        x = _synthesis(x, -1, lx) if ly == ny else _partial_rows(x, lx, ly, fwd=False)
    out_ref[0] = x


def dwt2d_pallas(x, levels: int | None = None, interpret: bool = False):
    """Full 2D forward transform of a batch of planes, one HBM pass total.

    x: (B, ny, nx); the whole (ny, nx) plane must fit VMEM (f32 up to
    ~1024^2 on 16MB VMEM cores).
    """
    B, ny, nx = x.shape
    levels = num_of_xforms(min(nx, ny)) if levels is None else levels
    kern = functools.partial(_dwt2d_full_kernel, levels)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, ny, nx), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, ny, nx), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


def idwt2d_pallas(x, levels: int | None = None, interpret: bool = False):
    B, ny, nx = x.shape
    levels = num_of_xforms(min(nx, ny)) if levels is None else levels
    kern = functools.partial(_idwt2d_full_kernel, levels)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, ny, nx), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, ny, nx), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


# ---------------------------------------------------------------------------
# Fused quantization epilogue: rint + |.| + sign + per-block max in one pass.
# ---------------------------------------------------------------------------
def _quantize_kernel(inv_q_ref, coeff_ref, mags_ref, signs_ref, maxmag_ref):
    b = pl.program_id(0)
    inv = inv_q_ref[b, 0]
    ll = jnp.rint(coeff_ref[...] * inv)
    signs_ref[...] = ll >= 0
    mags = jnp.abs(ll).astype(jnp.int32)
    mags_ref[...] = mags
    maxmag_ref[b, 0] = jnp.max(mags)


@functools.partial(jax.jit, static_argnames=("interpret", "rows"))
def quantize_pallas(coeffs, q, interpret: bool = False, rows: int = 256):
    """coeffs: (B, n); q: (B,). Returns (mags i32, signs bool, maxmag i32).

    Internally tiles each chunk as (rows, 128)-shaped VMEM blocks; n is
    zero-padded to a multiple of rows*128 (padding quantizes to 0 and does
    not affect magnitudes or the per-chunk max).
    """
    B, n = coeffs.shape
    tile = rows * 128
    n_pad = -n % tile
    if n_pad:
        coeffs = jnp.pad(coeffs, ((0, 0), (0, n_pad)))
    nt = (n + n_pad) // tile
    c3 = coeffs.reshape(B * nt, rows, 128)
    inv = jnp.repeat((1.0 / q).astype(coeffs.dtype), nt).reshape(B * nt, 1)

    mags, signs, maxmag = pl.pallas_call(
        _quantize_kernel,
        grid=(B * nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * nt, rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((B * nt, rows, 128), jnp.bool_),
            jax.ShapeDtypeStruct((B * nt, 1), jnp.int32),
        ],
        interpret=interpret,
    )(inv, c3)
    mags = mags.reshape(B, n + n_pad)[:, :n]
    signs = signs.reshape(B, n + n_pad)[:, :n]
    maxmag = jnp.max(maxmag.reshape(B, nt), axis=1)
    return mags, signs, maxmag
