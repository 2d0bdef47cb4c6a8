"""Weight-only INT8/INT4 quantization with dequant fused into Pallas matmuls.

The TPU replacement for the reference's fp16 cuBLASLt fused-dense path
(reference: csrc/fused_dense_lib/fused_dense.cpp): instead of fusing bias+gelu
epilogues (XLA does that), the Pallas kernel here fuses the *dequantization* of
INT8/INT4 weights into the GEMM so weights stream from HBM at 1-2 bytes/param —
the decisive optimization for memory-bound decode.

Layout conventions:
  * quantized linear params: {'q': int8 (in, out) [or (in/2, out) packed int4],
    'scale': f32 (groups, out), 'bias': optional (out,), 'bits': 8|4}
  * symmetric per-output-channel scales; optional grouping along the `in`
    axis (group_size) for INT4 quality (per-sense-per-channel scales for the
    sense table are built on top of this in models/quantized.py).
  * INT4 packs two consecutive `in` rows per int8: low nibble = even row.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["q", "scale", "bias"],
                   meta_fields=["bits", "d_out"])
@dataclasses.dataclass
class QuantWeight:
    """Quantized (in, out) kernel. `bits`/`d_out` are static pytree metadata so
    QuantWeight leaves flow through scan/vmap/jit like plain arrays.

    q: int8 (in, out) [int4: (in/2, out) packed]; scale: f32 (groups, out);
    d_out: logical out width (q may be 128-padded)."""
    q: jax.Array
    scale: jax.Array
    bias: Optional[jax.Array]
    bits: int
    d_out: int


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["q", "scale"], meta_fields=["bits"])
@dataclasses.dataclass
class QuantTable:
    """Quantized gather table (e.g. the (V, nv, d) sense table):
    q int8 (V, ..., d[/2]); scale f32 (V, ..., 1) per-row scales."""
    q: jax.Array
    scale: jax.Array
    bits: int


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------- quantize

def quantize_weight(w: jax.Array, bits: int = 8,
                    group_size: Optional[int] = None) -> QuantWeight:
    """Symmetric weight-only quantization of an (in, out) kernel.

    scale has shape (n_groups, out) with n_groups = in/group_size (1 if
    group_size is None). The out dim is zero-padded to a multiple of 128 so
    Pallas tiles always divide; d_out records the logical width.
    """
    assert bits in (8, 4)
    d_in, d_out = w.shape
    pad_out = _round_up(d_out, 128) - d_out
    if pad_out:
        w = jnp.pad(w, ((0, 0), (0, pad_out)))
    gs = group_size if group_size is not None else d_in
    assert d_in % gs == 0
    wf = w.astype(jnp.float32).reshape(d_in // gs, gs, d_out + pad_out)
    qmax = 127.0 if bits == 8 else 7.0
    absmax = jnp.max(jnp.abs(wf), axis=1)                     # (groups, out)
    scale = jnp.maximum(absmax / qmax, 1e-10)
    q = jnp.clip(jnp.round(wf / scale[:, None, :]), -qmax, qmax)
    q = q.reshape(d_in, d_out + pad_out).astype(jnp.int8)
    if bits == 4:
        q = pack_int4(q)
    return QuantWeight(q=q, scale=scale, bias=None, bits=bits, d_out=d_out)


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack int8 values in [-8, 7] pairwise along axis 0 into int8 bytes.
    int32 arithmetic throughout: Mosaic has no uint8 casts."""
    lo = q[0::2].astype(jnp.int32) & 0xF
    hi = (q[1::2].astype(jnp.int32) & 0xF) << 4
    packed = lo | hi
    # values >= 128 wrap to negative int8
    return jnp.where(packed >= 128, packed - 256, packed).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4: (in/2, out) int8 -> (in, out) int8 in [-8, 7]."""
    u = packed.astype(jnp.int32) & 0xFF
    lo = u & 0xF
    hi = (u >> 4) & 0xF
    # sign-extend 4-bit two's complement
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    d2, n = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * d2, n).astype(jnp.int8)


def dequantize_weight(qw: QuantWeight, dtype=jnp.bfloat16) -> jax.Array:
    q = qw.q
    if qw.bits == 4:
        q = unpack_int4(q)
    d_in, d_pad = q.shape
    groups = qw.scale.shape[0]
    gs = d_in // groups
    wf = q.astype(jnp.float32).reshape(groups, gs, d_pad) * qw.scale[:, None, :]
    return wf.reshape(d_in, d_pad)[:, :qw.d_out].astype(dtype)


# ---------------------------------------------------------------- kernel

def _qmm_kernel(x_ref, q_ref, scale_ref, o_ref, acc_ref, *,
                bits: int, n_k_blocks: int, groups_per_block: int,
                block_k: int):
    """One (block_m, block_n) output tile; grid dim 2 iterates k-blocks.

    The scale rows covering this k-block arrive as (groups_per_block, block_n);
    dequant happens on the int8 tile in VMEM right before the MXU dot.
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0]                                   # (block_m, block_k)
    q = q_ref[0]                                   # (block_k[/2], block_n) int8
    if bits == 4:
        q = unpack_int4(q)
    scale = scale_ref[0]                           # (groups_per_block, block_n)
    # dequantize tile: int8 -> f32 * scale -> x.dtype
    qf = q.astype(jnp.float32).reshape(groups_per_block,
                                       block_k // groups_per_block, -1)
    w = (qf * scale[:, None, :]).reshape(block_k, -1).astype(x.dtype)
    acc_ref[:] += jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == n_k_blocks - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def quant_matmul(x: jax.Array, qw: QuantWeight, *, block_m: int = 256,
                 block_n: int = 512, block_k: int = 512,
                 out_dtype=None) -> jax.Array:
    """x (..., in) @ dequant(qw) -> (..., out), dequant fused in VMEM.

    Weights stream from HBM as INT8/INT4; the MXU sees bf16 tiles.
    """
    out_dtype = out_dtype or x.dtype
    orig_shape = x.shape
    d_in = orig_shape[-1]
    x2 = x.reshape(-1, d_in)
    m = x2.shape[0]
    q, scale, bits = qw.q, qw.scale, qw.bits
    d_out = q.shape[1]          # padded width; logical width is qw['d_out']
    groups = scale.shape[0]
    group_size = d_in // groups

    def pick_block(dim, target):
        """Largest multiple of 128 that divides dim and is <= target."""
        cand = (min(target, dim) // 128) * 128
        while cand >= 128:
            if dim % cand == 0:
                return cand
            cand -= 128
        return dim  # dim < 128: use it whole

    block_m = min(block_m, _round_up(m, 8))
    if groups == 1:
        block_k = pick_block(d_in, block_k)
    else:
        # The scale block must satisfy sublane tiling: groups_per_block is
        # either a multiple of 8 or the full group axis, so pick block_k =
        # 8*group_size when that divides d_in cleanly, else take all of k.
        cand = 8 * group_size
        if cand < d_in and d_in % cand == 0 and cand % 128 == 0:
            block_k = cand
        else:
            block_k = d_in
    block_n = pick_block(d_out, block_n)

    m_pad = _round_up(m, block_m)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    assert d_in % block_k == 0 and d_out % block_n == 0, (d_in, d_out)
    n_k_blocks = d_in // block_k
    pack = 2 if bits == 4 else 1
    groups_per_block = max(block_k // group_size, 1)

    grid = (m_pad // block_m, d_out // block_n, n_k_blocks)

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, bits=bits, n_k_blocks=n_k_blocks,
                          groups_per_block=groups_per_block, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_m, block_k),
                         lambda mi, ni, ki: (0, mi, ki)),
            pl.BlockSpec((1, block_k // pack, block_n),
                         lambda mi, ni, ki: (0, ki, ni)),
            pl.BlockSpec((1, groups_per_block, block_n),
                         (lambda mi, ni, ki: (0, 0, ni)) if groups == 1
                         else (lambda mi, ni, ki: (0, ki, ni))),
        ],
        out_specs=pl.BlockSpec((1, block_m, block_n),
                               lambda mi, ni, ki: (0, mi, ni)),
        out_shape=jax.ShapeDtypeStruct((1, m_pad, d_out), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        interpret=_interpret(),
    )(x2[None], q[None], scale[None])
    out = out[0]
    if m_pad != m:
        out = out[:m]
    out = out[:, :qw.d_out]
    return out.reshape(*orig_shape[:-1], qw.d_out)


def quant_matmul_xla(x: jax.Array, qw: QuantWeight, out_dtype=None) -> jax.Array:
    """XLA fallback: dequantize then matmul (correct everywhere; no BW win)."""
    out_dtype = out_dtype or x.dtype
    w = dequantize_weight(qw, x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(out_dtype)


# ---------------------------------------------------------------- linear API

def quantize_linear_params(p: dict, bits: int = 8,
                           group_size: Optional[int] = None) -> QuantWeight:
    """Quantize a dense.linear param dict {'kernel', 'bias'?}."""
    qp = quantize_weight(p["kernel"], bits, group_size)
    return dataclasses.replace(qp, bias=p.get("bias"))


def is_quantized(p) -> bool:
    return isinstance(p, QuantWeight)


def quant_linear(x: jax.Array, qp: QuantWeight, *,
                 use_kernel: bool = True) -> jax.Array:
    """Quantized analogue of dense.linear.

    INT8 with per-output-channel scales takes the XLA fused path: the
    int8->bf16 convert fuses into the dot (weights stream at 1 byte/param)
    and the scale applies to the output — measured 48us vs 122us for the
    Pallas kernel on the (32,768)x(768,50264) lm-head GEMM on v5e. The
    Pallas kernel remains the INT4 path (XLA has no packed-int4 dot)."""
    if qp.bits == 8 and qp.scale.shape[0] == 1 and not _interpret():
        compute = jnp.bfloat16 if x.dtype != jnp.float32 else jnp.float32
        y = jnp.dot(x.astype(compute), qp.q.astype(compute),
                    preferred_element_type=jnp.float32)
        y = (y * qp.scale[0])[..., :qp.d_out].astype(x.dtype)
    elif use_kernel and not _interpret():
        y = quant_matmul(x, qp)
    else:
        y = quant_matmul_xla(x, qp)
    if qp.bias is not None:
        y = (y.astype(jnp.float32) + qp.bias.astype(jnp.float32)).astype(y.dtype)
    return y


def pack_int4_last(q: jax.Array) -> jax.Array:
    """Pack int8 values in [-8, 7] pairwise along the LAST axis (for gathered
    tables like the sense table, where rows are fetched whole)."""
    lo = q[..., 0::2].astype(jnp.int32) & 0xF
    hi = (q[..., 1::2].astype(jnp.int32) & 0xF) << 4
    packed = lo | hi
    return jnp.where(packed >= 128, packed - 256, packed).astype(jnp.int8)


def unpack_int4_last(packed: jax.Array) -> jax.Array:
    u = packed.astype(jnp.int32) & 0xFF
    lo = u & 0xF
    hi = (u >> 4) & 0xF
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(*packed.shape[:-1], 2 * packed.shape[-1]).astype(jnp.int8)


# ---------------------------------------------------------------- activations

def quantize_activations_int8(x: jax.Array, axis: int = -1):
    """Dynamic per-row INT8 activation quantization (for the INT8 KV cache).
    Returns (q, scale) with x ~= q * scale."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127
                 ).astype(jnp.int8)
    return q, scale


def quantize_activations_int4(x: jax.Array, axis: int = -1):
    """Dynamic per-row INT4 activation quantization (for the INT4-packed KV /
    sense caches). Returns (q, scale): q int8 nibble values in [-7, 7] (NOT
    yet packed — pair packing along the position axis is the CACHE layout,
    see pack_int4_pairs / the nibble read-modify-write in models/gpt.py)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax / 7.0, 1e-10)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -7, 7
                 ).astype(jnp.int8)
    return q, scale


# ------------------------------------------------------- int4 pair packing
#
# Cache packing convention (decode caches): ADJACENT POSITIONS share a byte —
# packed index j holds position 2j in the LOW nibble and 2j+1 in the HIGH
# nibble. Consumers never interleave: the decode kernels unpack into the
# (even, odd) SPLIT halves and run the softmax jointly over both score
# vectors (ops/decode_attention.decode_attention_flat_int4), so a window
# prefix of w positions is exactly the first w/2 packed columns.

def pack_int4_pairs(q: jax.Array, axis: int) -> jax.Array:
    """Pack int8 nibble values in [-8, 7] pairwise along `axis` (which must
    have even length): out[.., j, ..] = (q[.., 2j+1, ..] << 4) | (q[.., 2j, ..] & 0xF)."""
    n = q.shape[axis]
    assert n % 2 == 0, (axis, q.shape)
    lo = jax.lax.slice_in_dim(q, 0, n, stride=2, axis=axis).astype(jnp.int32)
    hi = jax.lax.slice_in_dim(q, 1, n, stride=2, axis=axis).astype(jnp.int32)
    packed = (lo & 0xF) | ((hi & 0xF) << 4)
    return jnp.where(packed >= 128, packed - 256, packed).astype(jnp.int8)


def unpack_int4_pairs_split(p4: jax.Array):
    """(lo, hi) int8 nibble values, sign-extended, NO interleave — the even
    and odd position halves the decode kernels consume directly."""
    u = p4.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(u, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(u, 24), 28)
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def unpack_int4_pairs(p4: jax.Array, axis: int) -> jax.Array:
    """Full interleaved unpack along `axis` (prefill-time dequant): inverse of
    pack_int4_pairs."""
    axis = axis % p4.ndim
    lo, hi = unpack_int4_pairs_split(p4)
    stacked = jnp.stack([lo, hi], axis=axis + 1)
    shape = list(p4.shape)
    shape[axis] = 2 * shape[axis]
    return stacked.reshape(shape)


def interleave_pair_scales(sc2: jax.Array) -> jax.Array:
    """(..., 2, n) per-(parity, packed-col) scales -> (..., 2n) per-position
    scales (prefill-time dequant companion of unpack_int4_pairs)."""
    assert sc2.shape[-2] == 2, sc2.shape
    n = sc2.shape[-1]
    return jnp.swapaxes(sc2, -1, -2).reshape(*sc2.shape[:-2], 2 * n)


def rmw_nibble(old: jax.Array, nib: jax.Array, parity: jax.Array) -> jax.Array:
    """Replace one nibble of packed int8 bytes: parity 0 -> low nibble,
    1 -> high. `parity` broadcasts against `old` (per-row parities for
    serving-slot writes). The single-position decode write is a
    read-modify-write of one packed byte column."""
    o = old.astype(jnp.int32)
    n = nib.astype(jnp.int32) & 0xF
    even = (o & ~0xF) | n
    odd = (o & 0xF) | (n << 4)
    b = jnp.where(parity == 0, even, odd) & 0xFF
    return jnp.where(b >= 128, b - 256, b).astype(jnp.int8)


def dequantize_activations(q: jax.Array, scale: jax.Array,
                           dtype=jnp.bfloat16) -> jax.Array:
    return (q.astype(jnp.float32) * scale).astype(dtype)
