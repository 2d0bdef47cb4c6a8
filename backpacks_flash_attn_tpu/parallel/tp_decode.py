"""Latency-optimized tensor-parallel decode: shard_map + ppermute overlap.

parallel/serving.py scales decode with bare pjit: XLA inserts one all-reduce
after every row-parallel matmul and, at decode shapes (s=1, a few KB per
collective), serializes compute behind each one. This module is the
hand-scheduled alternative for the multi-host / decode-LATENCY regime
(SURVEY.md §7.3 "decode-latency collectives"; the reference reaches the same
regime with Megatron process groups + custom all_reduce launches,
flash_attn/ops/fused_dense.py:132-172, flash_attn/utils/distributed.py:18-74):

  * the whole decode step runs inside ONE shard_map over a (data, model)
    mesh — slots shard over 'data' (zero collectives), weights shard over
    'model' Megatron-style (Wqkv/fc1 column, out_proj/fc2 row, lm_head and
    wte vocab-sharded, contextualization senses head-sharded);
  * every all-reduce is a hand-written ppermute ring (`ring_psum`), so one
    logical collective becomes tp-1 small collective-permutes the TPU's
    latency-hiding scheduler can start early and finish late;
  * the local batch is split into two microbatches whose phases are
    STAGGERED: while microbatch A's partial-sum ring is in flight, the
    program computes microbatch B's next phase (attention, MLP, or the
    backpack tail). 3 of the 4 per-layer rings overlap compute this way —
    the collectives ride ICI/DCN behind the MXU instead of in front of it.

Correctness is oracle-tested against models/backpack.backpack_forward_with_cache
on the virtual 8-device CPU mesh (tests/parallel/test_tp_decode.py); the
latency comparison vs bare pjit runs via benchmarks in bench_tp_decode.py
when multi-chip hardware is available.

Cache layout: unlike the single-chip flat-E caches (E = batch*heads,
batch-major — see models/gpt.KVCache), the TP cache keeps batch and heads as
separate axes so heads/senses can shard over 'model' while batch shards over
'data'. `to_tp_cache`/`from_tp_cache` convert losslessly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import BackpackConfig
from ..models import backpack as bp
from ..models import gpt as gpt_lib
from ..ops import dense, norms, quant, rotary
from ..ops.decode_attention import decode_attention

Params = Any


# ------------------------------------------------------------ local linears

def _local_linear(x, p, *, apply_bias: bool = True):
    """Per-shard dense projection, f32 accumulation: plain {'kernel','bias'?}
    dicts or INT8 QuantWeight shards (the ops/quant.py XLA pattern — the
    int8->bf16 convert fuses into the dot so the weight shard streams at
    1 byte/param, per-out-channel scales apply to the f32 partials).
    apply_bias=False for row-parallel shards: their bias is added once after
    the ring psum."""
    if isinstance(p, quant.QuantWeight):
        compute = jnp.bfloat16 if x.dtype != jnp.float32 else jnp.float32
        y = jnp.dot(x.astype(compute), p.q.astype(compute),
                    preferred_element_type=jnp.float32)
        y = y * p.scale[0]
        b = p.bias
    else:
        y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
        b = p.get("bias")
    if apply_bias and b is not None:
        y = y + b.astype(jnp.float32)
    return y


def _bias_of(p):
    return p.bias if isinstance(p, quant.QuantWeight) else p["bias"]


# ------------------------------------------------------------ ring psum

def ring_psum(x, axis_name: str, tp: int, overlap=None):
    """All-reduce `x` over `axis_name` as a tp-1 step ppermute ring.

    overlap: optional thunk executed after the FIRST permute is issued —
    program-ordered between ring steps so the latency-hiding scheduler can
    run the collective behind it. Returns (reduced, overlap_result).

    A ring moves (tp-1)·|x| bytes per device vs the all-reduce's optimal
    2·(tp-1)/tp·|x|, but decode collectives are latency-bound (KBs), and
    tp-1 independent permutes give the scheduler tp-1 chances to overlap
    instead of one monolithic fused all-reduce."""
    if tp == 1:
        return x, (overlap() if overlap is not None else None)
    perm = [(i, (i + 1) % tp) for i in range(tp)]
    acc, buf, ov = x, x, None
    for i in range(tp - 1):
        buf = lax.ppermute(buf, axis_name, perm)
        if i == 0 and overlap is not None:
            ov = overlap()
        acc = acc + buf
    return acc, ov


# ------------------------------------------------------------ param permute

def _strip_out_pad(qw: quant.QuantWeight) -> quant.QuantWeight:
    """Drop quantize_weight's 128-multiple out-axis zero padding: the TP body
    maps contiguous out-columns to head/sense groups, so padded columns would
    land whole on the last shard and break the mapping."""
    if qw.q.shape[-1] == qw.d_out:
        return qw
    return dataclasses.replace(qw, q=qw.q[..., :qw.d_out],
                               scale=qw.scale[..., :qw.d_out])


def permute_for_tp_decode(params: Params, cfg: BackpackConfig) -> Params:
    """Reorder the packed projection kernels so a contiguous 'model'-axis
    chunk is a per-device head/sense group.

    Wqkv packs its out dim (3, h, dh)-major (models/gpt.py:152): a plain
    column chunk would split q/k/v, not heads. Permuted to (h, 3, dh) a chunk
    is `h/tp` whole heads. Same for the contextualization Wqkv's (2, nv, dnv)
    packing -> (nv, 2, dnv). Lossless relayout; only valid for this module's
    step functions.

    INT8 QuantWeight trees (models/quantized.py) permute q, per-out-channel
    scales and bias identically; the out-axis pad is stripped first
    (_strip_out_pad) and the explicit 'lm_head' kernel is dropped — the body
    computes vocab-sharded logits straight from the INT8 wte shard, whose
    per-row scales are numerically identical to the lm_head quantization
    (both are absmax-over-d/127). INT4 stays on the pjit path
    (parallel/serving.py): packed nibbles don't column-shard."""
    d = cfg.n_embd
    h, dh = cfg.n_head, cfg.head_dim
    nv, dnv = cfg.num_senses, cfg.sense_head_dim

    def perm_out(x, packs, n_grp, grp_d):
        """Permute the LAST axis from (packs, n_grp, grp_d)-major to
        (n_grp, packs, grp_d)-major."""
        y = x.reshape(*x.shape[:-1], packs, n_grp, grp_d)
        return jnp.swapaxes(y, -3, -2).reshape(x.shape)

    def perm_lin(p, packs, n_grp, grp_d):
        if isinstance(p, quant.QuantWeight):
            assert p.bits == 8, "tp_decode takes INT8 trees; INT4 uses pjit"
            p = _strip_out_pad(p)
            return dataclasses.replace(
                p,
                q=perm_out(p.q, packs, n_grp, grp_d),
                scale=perm_out(p.scale, packs, n_grp, grp_d),
                bias=(perm_out(p.bias, packs, n_grp, grp_d)
                      if p.bias is not None else None))
        return {"kernel": perm_out(p["kernel"], packs, n_grp, grp_d),
                "bias": perm_out(p["bias"], packs, n_grp, grp_d)}

    out = jax.tree.map(lambda x: x, params)  # fresh dict spine, shared leaves
    out["gpt"] = dict(out["gpt"])
    gl = dict(out["gpt"]["layers"])
    gl["Wqkv"] = perm_lin(gl["Wqkv"], 3, h, dh)
    if isinstance(gl.get("out_proj"), quant.QuantWeight):
        gl["out_proj"] = _strip_out_pad(gl["out_proj"])
        gl["mlp"] = {"fc1": _strip_out_pad(gl["mlp"]["fc1"]),
                     "fc2": _strip_out_pad(gl["mlp"]["fc2"])}
    out["gpt"]["layers"] = gl
    out["gpt"].pop("lm_head", None)
    out["ctx_attn"] = {"Wqkv": perm_lin(out["ctx_attn"]["Wqkv"], 2, nv, dnv)}
    return out


def tp_decode_param_specs(params: Params) -> Params:
    """PartitionSpec tree for permute_for_tp_decode output. Everything not
    listed (norms, wpe, the content MLP) is replicated — at s=1 the content
    net is a few tiny GEMMs and replicated compute beats a collective. The
    precomputed sense TABLE (quantized trees) shards over senses instead:
    it is the largest inference tensor (V x nv x d) and the tail only reads
    local senses anyway."""
    specs = jax.tree.map(lambda _: P(), params)

    def lin(p, kernel_spec, bias_spec, scale_spec):
        if isinstance(p, quant.QuantWeight):
            return dataclasses.replace(
                jax.tree.map(lambda _: P(), p), q=kernel_spec,
                scale=scale_spec,
                bias=bias_spec if p.bias is not None else None)
        out = {"kernel": kernel_spec}
        if "bias" in p:
            out["bias"] = bias_spec
        return out

    gl_p = params["gpt"]["layers"]
    col3 = dict(kernel_spec=P(None, None, "model"),
                bias_spec=P(None, "model"), scale_spec=P(None, None, "model"))
    row3 = dict(kernel_spec=P(None, "model", None), bias_spec=P(),
                scale_spec=P())
    specs["gpt"]["layers"]["Wqkv"] = lin(gl_p["Wqkv"], **col3)
    specs["gpt"]["layers"]["out_proj"] = lin(gl_p["out_proj"], **row3)
    specs["gpt"]["layers"]["mlp"]["fc1"] = lin(gl_p["mlp"]["fc1"], **col3)
    specs["gpt"]["layers"]["mlp"]["fc2"] = lin(gl_p["mlp"]["fc2"], **row3)
    specs["ctx_attn"] = {"Wqkv": lin(params["ctx_attn"]["Wqkv"],
                                     kernel_spec=P(None, "model"),
                                     bias_spec=P("model"),
                                     scale_spec=P(None, "model"))}
    wte = params["gpt"]["wte"]
    if isinstance(wte, dict):    # INT8 row-quantized {'q', 'row_scale'}
        specs["gpt"]["wte"] = {"q": P("model", None),
                               "row_scale": P("model", None)}
    else:
        specs["gpt"]["wte"] = P("model", None)
    table = params["content"].get("table") if "content" in params else None
    if table is not None:
        specs["content"]["table"] = dataclasses.replace(
            jax.tree.map(lambda _: P(), table),
            q=P(None, "model", None), scale=P(None, "model", None))
    return specs


# ------------------------------------------------------------ TP cache

class TPDecodeCache(NamedTuple):
    """Head/sense-split decode cache (see module docstring):
      k:        (L, B, h, dk, S)   transposed keys
      v:        (L, B, h, S, dk)
      ctx_k:    (B, nv, dnv_pad, S)
      content:  (B, nv, S, d)
      *_scale:  f32 dequant scales (int8 caches only)
      length:   () or (B,)"""
    k: jax.Array
    v: jax.Array
    ctx_k: jax.Array
    content: jax.Array
    length: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None
    ctx_k_scale: Optional[jax.Array] = None
    content_scale: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.content.dtype == jnp.int8


def to_tp_cache(cache: bp.BackpackCache, cfg: BackpackConfig) -> TPDecodeCache:
    """Split the flat-E single-chip cache's E axes into (batch, heads)."""
    L, E, dk, S = cache.gpt.k.shape
    h, nv = cfg.n_head, cfg.num_senses
    b = E // h

    def r(x, *shape):
        return None if x is None else x.reshape(*shape)

    return TPDecodeCache(
        k=cache.gpt.k.reshape(L, b, h, dk, S),
        v=cache.gpt.v.reshape(L, b, h, S, dk),
        k_scale=r(cache.gpt.k_scale, L, b, h, S),
        v_scale=r(cache.gpt.v_scale, L, b, h, S),
        ctx_k=cache.ctx_k.reshape(b, nv, -1, S),
        ctx_k_scale=r(cache.ctx_k_scale, b, nv, S),
        content=cache.content.reshape(b, nv, S, cfg.n_embd),
        content_scale=r(cache.content_scale, b, nv, S),
        length=cache.length)


def from_tp_cache(cache: TPDecodeCache, cfg: BackpackConfig) -> bp.BackpackCache:
    L, b, h, dk, S = cache.k.shape
    nv = cfg.num_senses

    def r(x, *shape):
        return None if x is None else x.reshape(*shape)

    gpt_cache = gpt_lib.KVCache(
        k=cache.k.reshape(L, b * h, dk, S),
        v=cache.v.reshape(L, b * h, S, dk),
        length=cache.length,
        k_scale=r(cache.k_scale, L, b * h, S),
        v_scale=r(cache.v_scale, L, b * h, S))
    return bp.BackpackCache(
        gpt=gpt_cache,
        ctx_k=cache.ctx_k.reshape(b * nv, -1, S),
        ctx_k_scale=r(cache.ctx_k_scale, b * nv, S),
        content=cache.content.reshape(b * nv, S, cfg.n_embd),
        content_scale=r(cache.content_scale, b * nv, S),
        length=cache.length)


def tp_cache_specs(cache: TPDecodeCache) -> TPDecodeCache:
    def opt(spec):
        return lambda x: spec if x is not None else None
    vec = jnp.asarray(cache.length).ndim == 1
    return TPDecodeCache(
        k=P(None, "data", "model", None, None),
        v=P(None, "data", "model", None, None),
        k_scale=opt(P(None, "data", "model", None))(cache.k_scale),
        v_scale=opt(P(None, "data", "model", None))(cache.v_scale),
        ctx_k=P("data", "model", None, None),
        ctx_k_scale=opt(P("data", "model", None))(cache.ctx_k_scale),
        content=P("data", "model", None, None),
        content_scale=opt(P("data", "model", None))(cache.content_scale),
        length=P("data") if vec else P())


def tp_cache_shardings(cache: TPDecodeCache, mesh: Mesh):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s) if s is not None else None,
        tp_cache_specs(cache),
        is_leaf=lambda x: isinstance(x, P) or x is None)


# ------------------------------------------------------------ the step

def _quant_store(buf, new, li, r0, offset, vec, *, col_axis):
    """Write `new` (per-mb rows, ...) into the 5D layer buffer at column
    `offset` of axis `col_axis` (absolute on the (L, b, g, ...) buffer).
    Scalar offsets write in place; per-row offsets go through the vmapped
    row write on a layer-mb slice (the serving path, matching gpt._store)."""
    g = buf.shape[2]
    nb = new.shape[0] // g
    new5 = new.reshape((1, nb, g) + new.shape[1:])
    if not vec:
        idx = [0] * buf.ndim
        idx[0], idx[1], idx[col_axis] = li, r0, offset
        return lax.dynamic_update_slice(buf, new5.astype(buf.dtype),
                                        tuple(idx))
    sizes = (1, nb) + buf.shape[2:]
    start = (li, r0) + (0,) * (buf.ndim - 2)
    block = lax.dynamic_slice(buf, start, sizes)
    flat = block.reshape((nb * g,) + block.shape[3:])
    rows = new
    off_rows = jnp.repeat(offset, g)
    flat = gpt_lib.update_rows_axis(flat, rows, off_rows, col_axis - 2)
    return lax.dynamic_update_slice(buf, flat.reshape(sizes), start)


def _bp_store(buf, new, r0, offset, vec, *, col_axis):
    """Same as _quant_store for the 4D backpack buffers (B, nv, ...)."""
    g = buf.shape[1]
    nb = new.shape[0] // g
    new4 = new.reshape((nb, g) + new.shape[1:])
    if not vec:
        idx = [0] * buf.ndim
        idx[0], idx[col_axis] = r0, offset
        return lax.dynamic_update_slice(buf, new4.astype(buf.dtype),
                                        tuple(idx))
    sizes = (nb,) + buf.shape[1:]
    start = (r0,) + (0,) * (buf.ndim - 1)
    block = lax.dynamic_slice(buf, start, sizes)
    flat = block.reshape((nb * g,) + block.shape[2:])
    rows = new
    flat = gpt_lib.update_rows_axis(flat, rows, jnp.repeat(offset, g),
                                    col_axis - 1)
    return lax.dynamic_update_slice(buf, flat.reshape(sizes), start)


def _build_body(cfg: BackpackConfig, mesh: Mesh, *,
                window: Optional[int] = None,
                microbatches: int = 2):
    """Per-device decode-step body (runs inside shard_map): the overlapped
    layer schedule over local slots/heads. Shared by the jitted single-step
    wrapper (make_tp_decode_step) and the scan harness (make_tp_decode_scan)."""
    dp = mesh.shape["data"]
    tp = mesh.shape["model"]
    h, nv, d = cfg.n_head, cfg.num_senses, cfg.n_embd
    assert h % tp == 0 and nv % tp == 0, (h, nv, tp)
    assert cfg.padded_vocab_size % tp == 0, (cfg.padded_vocab_size, tp)
    h_loc, nv_loc = h // tp, nv // tp
    dk = cfg.head_dim
    dnv, dnv_pad = cfg.sense_head_dim, cfg.sense_head_dim_padded
    assert not cfg.attn_dwconv, "cached decode does not support attn_dwconv"

    def body(params, tokens, cache):
        bl = tokens.shape[0]
        t = lax.axis_index("model")
        offset = cache.length
        vec = jnp.asarray(offset).ndim == 1
        new_len = offset + 1
        quantized = cache.quantized
        S = cache.k.shape[-1]
        W = min(window, S) if window is not None else S

        n_mb = microbatches if bl >= microbatches else 1
        mb_rows = [bl // n_mb + (1 if i < bl % n_mb else 0)
                   for i in range(n_mb)]
        mb_r0 = [sum(mb_rows[:i]) for i in range(n_mb)]

        def off_mb(i):
            return offset[mb_r0[i]:mb_r0[i] + mb_rows[i]] if vec else offset

        # ---- embedding: vocab-sharded gather + ring psum (one per step);
        # INT8 wte shards ({'q','row_scale'}) dequantize their local rows
        wte_loc = params["gpt"]["wte"]
        quant_wte = isinstance(wte_loc, dict)
        v_loc = (wte_loc["q"] if quant_wte else wte_loc).shape[0]
        ids_loc = tokens - t * v_loc
        ok = (ids_loc >= 0) & (ids_loc < v_loc)
        ids_c = jnp.clip(ids_loc, 0, v_loc - 1)
        if quant_wte:
            rows = (jnp.take(wte_loc["q"], ids_c, axis=0).astype(jnp.float32)
                    * jnp.take(wte_loc["row_scale"], ids_c, axis=0)
                    ).astype(jnp.bfloat16)
        else:
            rows = jnp.take(wte_loc, ids_c, axis=0)
        emb_part = jnp.where(ok[..., None], rows, jnp.zeros((), rows.dtype))
        emb, _ = ring_psum(emb_part, "model", tp)

        # content net: issued FIRST so the scheduler can run it under the
        # stack's first rings. With a precomputed sense table the table is
        # sense-sharded and this gather yields the LOCAL nv_loc senses;
        # otherwise the content MLP runs replicated on the psum'd embedding.
        senses = bp.content_forward(params, cfg, tokens, embedded=emb)
        senses_local = senses.shape[2] != nv   # sense-sharded table gather

        if cfg.n_positions > 0:
            pos = (offset[:, None] if vec else offset) + jnp.zeros(
                (bl, 1), jnp.int32)
            emb = emb + jnp.take(params["gpt"]["wpe"], pos, axis=0
                                 ).astype(emb.dtype)
        gp = params["gpt"]
        hidden, residual = norms.dropout_add_layer_norm(
            emb, None, gp["ln_0"]["weight"], gp["ln_0"]["bias"],
            0.0, cfg.layer_norm_epsilon)

        scales = gpt_lib._softmax_scales(cfg)

        # ---- GPT stack: staggered dual-microbatch layer scan
        def attn_phase(i, hid, lp, scale, li, bufs):
            k_all, v_all, ks_all, vs_all = bufs
            nb, r0 = mb_rows[i], mb_r0[i]
            e_mb = nb * h_loc
            qkv = _local_linear(hid, lp["Wqkv"]).astype(hid.dtype)
            qkv = qkv.reshape(nb, 1, h_loc, 3, dk)
            q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
            if cfg.rotary_emb_dim > 0:
                q, k = rotary.apply_rotary_qk(
                    q, k, cfg.rotary_emb_dim, seqlen_offset=off_mb(i),
                    scale_base=cfg.rotary_emb_scale_base)
            kt_new = k.transpose(0, 2, 3, 1).reshape(e_mb, dk, 1)
            v_new = v.transpose(0, 2, 1, 3).reshape(e_mb, 1, dk)
            if quantized:
                from ..ops import quant
                k8, ks = quant.quantize_activations_int8(kt_new, axis=1)
                v8, vs = quant.quantize_activations_int8(v_new, axis=2)
                k_all = _quant_store(k_all, k8, li, r0, off_mb(i), vec,
                                     col_axis=4)
                v_all = _quant_store(v_all, v8, li, r0, off_mb(i), vec,
                                     col_axis=3)
                ks_all = _quant_store(ks_all, ks[:, 0, :], li, r0, off_mb(i),
                                      vec, col_axis=3)
                vs_all = _quant_store(vs_all, vs[..., 0], li, r0, off_mb(i),
                                      vec, col_axis=3)
            else:
                k_all = _quant_store(k_all, kt_new, li, r0, off_mb(i), vec,
                                     col_axis=4)
                v_all = _quant_store(v_all, v_new, li, r0, off_mb(i), vec,
                                     col_axis=3)
            # window folded into the ONE layer slice (models/gpt._layer:
            # a second [:W] slice would copy whole layers per step)
            kt_c = lax.dynamic_slice(k_all, (li, r0, 0, 0, 0),
                                     (1, nb, h_loc, dk, W)
                                     ).reshape(e_mb, dk, W)
            v_c = lax.dynamic_slice(v_all, (li, r0, 0, 0, 0),
                                    (1, nb, h_loc, W, dk)
                                    ).reshape(e_mb, W, dk)
            k_sc = v_sc = None
            if quantized:
                k_sc = lax.dynamic_slice(ks_all, (li, r0, 0, 0),
                                         (1, nb, h_loc, W)).reshape(e_mb, W)
                v_sc = lax.dynamic_slice(vs_all, (li, r0, 0, 0),
                                         (1, nb, h_loc, W)).reshape(e_mb, W)
            lens = (jnp.repeat(off_mb(i) + 1, h_loc) if vec
                    else new_len)
            qf = (q[:, 0].astype(jnp.float32) * scale).astype(q.dtype
                                                              ).reshape(e_mb, dk)
            ctx = decode_attention(qf, kt_c, k_sc, v_c, v_sc, lens)
            ctx = ctx.reshape(nb, 1, h_loc * dk)
            part = _local_linear(ctx, lp["out_proj"], apply_bias=False)
            return part, (k_all, v_all, ks_all, vs_all)

        def mlp_phase(hid, lp):
            y = _local_linear(hid, lp["mlp"]["fc1"]).astype(hid.dtype)
            y = dense.ACTIVATIONS[cfg.activation](y)
            return _local_linear(y, lp["mlp"]["fc2"], apply_bias=False)

        def add_norm(part, bias, res, lp, which):
            x = (part + bias).astype(hidden.dtype)
            return norms.dropout_add_layer_norm(
                x, res, lp[which]["weight"], lp[which]["bias"],
                0.0, cfg.layer_norm_epsilon)

        def scan_body(carry, xs):
            hs, rs, bufs = carry
            lp, scale, li = xs
            hs, rs = list(hs), list(rs)
            ob = _bias_of(lp["out_proj"])
            fb = _bias_of(lp["mlp"]["fc2"])
            if n_mb == 1:
                p0, bufs = attn_phase(0, hs[0], lp, scale, li, bufs)
                a0, _ = ring_psum(p0, "model", tp)
                hs[0], rs[0] = add_norm(a0, ob, rs[0], lp, "norm1")
                m0 = mlp_phase(hs[0], lp)
                f0, _ = ring_psum(m0, "model", tp)
                hs[0], rs[0] = add_norm(f0, fb, rs[0], lp, "norm2")
            else:
                # staggered schedule: each ring's latency is covered by the
                # other microbatch's compute (3 of 4 rings overlapped)
                box = [bufs]

                def attn1():
                    p, box[0] = attn_phase(1, hs[1], lp, scale, li, box[0])
                    return p
                p0, box[0] = attn_phase(0, hs[0], lp, scale, li, box[0])
                a0, p1 = ring_psum(p0, "model", tp, overlap=attn1)
                hs[0], rs[0] = add_norm(a0, ob, rs[0], lp, "norm1")
                a1, m0 = ring_psum(p1, "model", tp,
                                   overlap=lambda: mlp_phase(hs[0], lp))
                hs[1], rs[1] = add_norm(a1, ob, rs[1], lp, "norm1")
                f0, m1 = ring_psum(m0, "model", tp,
                                   overlap=lambda: mlp_phase(hs[1], lp))
                hs[0], rs[0] = add_norm(f0, fb, rs[0], lp, "norm2")
                f1, _ = ring_psum(m1, "model", tp)
                hs[1], rs[1] = add_norm(f1, fb, rs[1], lp, "norm2")
                bufs = box[0]
            return (tuple(hs), tuple(rs), bufs), None

        hs0 = tuple(hidden[mb_r0[i]:mb_r0[i] + mb_rows[i]]
                    for i in range(n_mb))
        rs0 = tuple(residual[mb_r0[i]:mb_r0[i] + mb_rows[i]]
                    for i in range(n_mb))
        dummy = jnp.zeros((1,))
        bufs0 = (cache.k, cache.v,
                 cache.k_scale if quantized else dummy,
                 cache.v_scale if quantized else dummy)
        xs = (gp["layers"], scales, jnp.arange(cfg.n_layer))
        (hs, _, bufs), _ = lax.scan(scan_body, (hs0, rs0, bufs0), xs)
        k_all, v_all, ks_all, vs_all = bufs

        # ---- backpack tail, same stagger: ctx qk + cache update +
        # fused alpha-row contraction (partial over local senses) -> ring
        bpbufs = [cache.ctx_k, cache.content,
                  cache.ctx_k_scale if quantized else dummy,
                  cache.content_scale if quantized else dummy]
        sscale = dnv ** -0.5

        def tail_phase(i, hid):
            ctx_k, content, ctx_ks, content_s = bpbufs
            nb, r0 = mb_rows[i], mb_r0[i]
            e_mb = nb * nv_loc
            qk = _local_linear(hid, params["ctx_attn"]["Wqkv"]
                               ).astype(hid.dtype)
            qk = qk.reshape(nb, 1, nv_loc, 2, dnv)
            q, k = qk[..., 0, :], qk[..., 1, :]
            k_flat = k.transpose(0, 2, 3, 1).reshape(e_mb, dnv, 1)
            if dnv_pad != dnv:
                k_flat = jnp.pad(k_flat, ((0, 0), (0, dnv_pad - dnv), (0, 0)))
            # local senses: already local when the sense table is sharded
            # over 'model'; a sense-offset slice of the replicated MLP
            # output otherwise
            sl = lax.dynamic_slice(
                senses, (r0, 0, 0 if senses_local else t * nv_loc, 0),
                (nb, 1, nv_loc, d))
            s_t = sl.transpose(0, 2, 1, 3).reshape(e_mb, 1, d)
            if quantized:
                from ..ops import quant
                k8, ksc = quant.quantize_activations_int8(k_flat, axis=1)
                s8, ssc = quant.quantize_activations_int8(s_t, axis=2)
                ctx_k = _bp_store(ctx_k, k8, r0, off_mb(i), vec, col_axis=3)
                ctx_ks = _bp_store(ctx_ks, ksc[:, 0, :], r0, off_mb(i), vec,
                                   col_axis=2)
                content = _bp_store(content, s8, r0, off_mb(i), vec,
                                    col_axis=2)
                content_s = _bp_store(content_s, ssc[..., 0], r0, off_mb(i),
                                      vec, col_axis=2)
            else:
                ctx_k = _bp_store(ctx_k, k_flat, r0, off_mb(i), vec,
                                  col_axis=3)
                content = _bp_store(content, s_t, r0, off_mb(i), vec,
                                    col_axis=2)
            bpbufs[:] = [ctx_k, content, ctx_ks, content_s]
            kt_c = lax.dynamic_slice(ctx_k, (r0, 0, 0, 0),
                                     (nb, nv_loc, dnv_pad, W)
                                     ).reshape(e_mb, dnv_pad, W)
            c_c = lax.dynamic_slice(content, (r0, 0, 0, 0),
                                    (nb, nv_loc, W, d)).reshape(e_mb, W, d)
            k_sc = v_sc = None
            if quantized:
                k_sc = lax.dynamic_slice(ctx_ks, (r0, 0, 0),
                                         (nb, nv_loc, W)).reshape(e_mb, W)
                v_sc = lax.dynamic_slice(content_s, (r0, 0, 0),
                                         (nb, nv_loc, W)).reshape(e_mb, W)
            lens = jnp.repeat(off_mb(i) + 1, nv_loc) if vec else new_len
            qf = (q[:, 0].astype(jnp.float32) * sscale).astype(q.dtype
                                                               ).reshape(e_mb, dnv)
            if dnv_pad != dnv:
                qf = jnp.pad(qf, ((0, 0), (0, dnv_pad - dnv)))
            out = decode_attention(qf, kt_c, k_sc, c_c, v_sc, lens)
            return out.reshape(nb, nv_loc, d).sum(
                axis=1, keepdims=True).astype(jnp.float32)

        def lm_local(out_full):
            """Vocab-sharded tied-head logits. INT8 wte: logits = (out @
            q.T) * row_scale — same math as the single-chip quantized
            lm_head (ops/quant.quant_linear int8 path), since quantize_weight
            on wte.T and the per-row embedding quantization produce identical
            scales (absmax over d / 127)."""
            if quant_wte:
                compute = jnp.bfloat16
                y = jnp.dot(out_full.astype(compute),
                            wte_loc["q"].T.astype(compute),
                            preferred_element_type=jnp.float32)
                return y * wte_loc["row_scale"][:, 0]
            return jnp.dot(out_full.astype(hidden.dtype), wte_loc.T,
                           preferred_element_type=jnp.float32)

        if n_mb == 1:
            o0 = tail_phase(0, hs[0])
            O0, _ = ring_psum(o0, "model", tp)
            logits_loc = lm_local(O0)
        else:
            o0 = tail_phase(0, hs[0])
            O0, o1 = ring_psum(o0, "model", tp,
                               overlap=lambda: tail_phase(1, hs[1]))
            O1, l0 = ring_psum(o1, "model", tp,
                               overlap=lambda: lm_local(O0))
            logits_loc = jnp.concatenate([l0, lm_local(O1)], axis=0)
        logits = lax.all_gather(logits_loc, "model", axis=2, tiled=True)

        ctx_k, content, ctx_ks, content_s = bpbufs
        new_cache = TPDecodeCache(
            k=k_all, v=v_all, ctx_k=ctx_k, content=content, length=new_len,
            k_scale=ks_all if quantized else None,
            v_scale=vs_all if quantized else None,
            ctx_k_scale=ctx_ks if quantized else None,
            content_scale=content_s if quantized else None)
        return logits, new_cache

    return body


def make_tp_decode_step(cfg: BackpackConfig, mesh: Mesh, *,
                        window: Optional[int] = None,
                        microbatches: int = 2):
    """Build the overlapped TP decode step over `mesh` ('data', 'model').

    Returns (step, prepare):
      step(params, tokens, cache) -> (logits (b, 1, V) f32, cache) — jitted,
        cache donated; tokens (b, 1) int32; params from `prepare`.
      prepare(params, cache) -> (tp_params, tp_cache) — permutes the packed
        kernels (permute_for_tp_decode), converts the cache (to_tp_cache if
        given a flat BackpackCache), and device_puts both with TP shardings.

    Requirements: n_head and num_senses divisible by the model-axis size,
    vocab divisible too. Takes bf16/f32 params OR INT8 QuantWeight trees
    from models/quantized.quantize_backpack_params (the flagship north-star
    config: INT8 weights + INT8 caches on the latency-optimized path);
    INT4 packed trees stay on the pjit path in parallel/serving.py.
    window: static length bucket as in backpack_forward_with_cache.
    """
    body = _build_body(cfg, mesh, window=window, microbatches=microbatches)

    def step(params, tokens, cache):
        pspecs = tp_decode_param_specs(params)
        cspecs = tp_cache_specs(cache)
        fn = jax.shard_map(
            functools.partial(body),
            mesh=mesh, in_specs=(pspecs, P("data", None), cspecs),
            out_specs=(P("data", None, None), cspecs), check_vma=False)
        return fn(params, tokens, cache)

    jit_step = jax.jit(step, donate_argnums=(2,))

    def prepare(params, cache):
        tp_params = permute_for_tp_decode(params, cfg)
        specs = tp_decode_param_specs(tp_params)
        tp_params = jax.device_put(
            tp_params, jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                                    is_leaf=lambda x: isinstance(x, P)))
        if isinstance(cache, bp.BackpackCache):
            cache = to_tp_cache(cache, cfg)
        cache = jax.device_put(cache, tp_cache_shardings(cache, mesh))
        return tp_params, cache

    return jit_step, prepare


def make_tp_decode_scan(cfg: BackpackConfig, mesh: Mesh, *, steps: int,
                        window: Optional[int] = None,
                        microbatches: int = 2, donate: bool = True):
    """Greedy-decode `steps` tokens inside ONE shard_map (lax.scan over the
    overlapped step body). This is the timing harness for bench_tp_decode.py:
    a single dispatch amortizes the tunnel RTT over >=hundreds of steps (the
    only trustworthy measurement here — utils/benchmark.py), and it is also
    the shape a real serving host would compile for multi-token scheduling
    quanta. Returns scan(params, tokens, cache) -> (tokens (b, 1), cache),
    jitted with the cache donated; inputs from make_tp_decode_step's prepare."""
    body = _build_body(cfg, mesh, window=window, microbatches=microbatches)

    def local_scan(params, tokens, cache):
        def one(carry, _):
            tok, cch = carry
            logits, cch = body(params, tok, cch)
            nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
            return (nxt, cch), None

        (tok, cache), _ = lax.scan(one, (tokens, cache), None, length=steps)
        return tok, cache

    def scan(params, tokens, cache):
        pspecs = tp_decode_param_specs(params)
        cspecs = tp_cache_specs(cache)
        fn = jax.shard_map(
            local_scan, mesh=mesh,
            in_specs=(pspecs, P("data", None), cspecs),
            out_specs=(P("data", None), cspecs), check_vma=False)
        return fn(params, tokens, cache)

    return jax.jit(scan, donate_argnums=(2,) if donate else ())
