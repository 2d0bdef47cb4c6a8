"""GPT-2/GPT-3 style decoder, TPU-native.

Re-design of the reference's GPTModel/GPTLMHeadModel
(reference: flash_attn/models/gpt.py:175-282) as pure functions over a dict
pytree of parameters:

  * Layers are stored stacked on a leading (n_layer, ...) axis and executed
    with lax.scan — one trace/compile for all layers, and sharding annotations
    apply uniformly per-leaf (the pjit analogue of the reference's per-layer
    Parallel* module variants).
  * The reference's reordered residual ("Attn/MLP -> Dropout -> Add -> LN",
    gpt.py:197-206) is kept exactly: the final ln_f lives as the last layer's
    norm2 and the first ln_1 is hoisted to ln_0, so checkpoint import
    (remap_state_dict_gpt2, gpt.py:285-340) is a pure key remap.
  * Residual stream is carried in fp32 (gpt.py:231-240) with bf16 activations.
  * Decode uses a static-shape KV cache updated via dynamic_update_slice —
    the XLA-friendly analogue of MHA._update_kv_cache (modules/mha.py:356-380).
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import GPTConfig
from ..ops import dense, norms, rotary
from ..ops.attention import mha, mha_qkv_packed
from ..ops.decode_attention import decode_attention

Params = Dict[str, Any]


def _softmax_scales(cfg: GPTConfig) -> jnp.ndarray:
    """Per-layer softmax scale; reference: flash_attn/models/gpt.py:46-50."""
    scale = cfg.head_dim ** -0.5
    layer_idx = jnp.arange(cfg.n_layer, dtype=jnp.float32)
    if cfg.scale_attn_by_inverse_layer_idx:
        return scale / (layer_idx + 1.0)
    return jnp.full((cfg.n_layer,), scale, jnp.float32)


# ---------------------------------------------------------------- init

def init_gpt(cfg: GPTConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """GPT-2-paper init with 1/sqrt(2*n_layer) residual-out rescale
    (reference: flash_attn/models/gpt.py:154-172)."""
    d, v = cfg.n_embd, cfg.padded_vocab_size
    keys = jax.random.split(key, 4 + cfg.n_layer)
    std = cfg.initializer_range
    out_std = std / (2 * cfg.n_layer) ** 0.5

    params: Params = {
        "wte": (jax.random.normal(keys[0], (v, d)) * std).astype(dtype),
        "ln_0": norms.init_layer_norm(d, dtype),
    }
    if cfg.n_positions > 0:
        params["wpe"] = (jax.random.normal(keys[1], (cfg.n_positions, d)) * std
                         ).astype(dtype)

    def init_layer(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        layer = {
            "Wqkv": dense.init_linear(k1, d, 3 * d, std=std, dtype=dtype),
            "out_proj": dense.init_linear(k2, d, d, std=out_std, dtype=dtype),
            "norm1": norms.init_layer_norm(d, dtype),
            "norm2": norms.init_layer_norm(d, dtype),
        }
        if cfg.moe_experts > 0:
            from ..ops import moe as moe_lib
            layer["moe"] = moe_lib.init_switch_moe(
                k3, d, cfg.inner_dim, cfg.moe_experts, std=std, dtype=dtype)
        else:
            layer["mlp"] = dense.init_mlp(k3, d, cfg.inner_dim, std=std,
                                          out_std=out_std, dtype=dtype)
        if cfg.attn_dwconv:
            # causal depthwise conv on the qkv projection (reference:
            # attn_dwconv flag, gpt.py:51-61; Conv1d k=3 pad=2 groups=3d
            # trimmed to seqlen, mha.py:335-341)
            layer["dwconv"] = {
                "w": (jax.random.normal(k4, (3, 3 * d)) * std).astype(dtype),
                "b": jnp.zeros((3 * d,), dtype),
            }
        return layer

    layers = [init_layer(k) for k in keys[4:]]
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return params


# Multi-token cached steps at or below this width take the flat-layout
# contraction instead of the relayout-heavy generic prefill branch (see
# gpt_forward_with_cache); speculative verification uses s = spec_tokens+1.
FLAT_MULTI_MAX = 8


# ---------------------------------------------------------------- KV cache

class KVCache(NamedTuple):
    """Static-shape per-layer KV cache, stacked over layers, pre-flattened to
    the exact operand shapes of the decode contraction (E = batch * n_head):

      k:       (n_layer, E, head_dim, max_seqlen)  — TRANSPOSED key cache:
               the per-step score is a batched (1, dk) @ (dk, S) matvec with
               no relayout of the cache
      v:       (n_layer, E, max_seqlen, head_dim)
      k_scale/v_scale: (n_layer, E, max_seqlen) f32 dequant scales (int8 only)

    The flattened-E layout is load-bearing for performance: reshaping a 4D
    (b, h, ...) carried cache to (E, ...) inside the decode scan makes XLA
    relayout-copy the whole cache EVERY step (~2.5ms/step for backpack-small
    on v5e, measured); storing it flat keeps the step at the memory roofline.

    `length` is scalar (uniform batch) or (batch,) per-slot (serving).
    """
    k: jax.Array
    v: jax.Array
    length: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None
    # ---- staging block (serving; see init_kv_cache(stage=...)): small-s
    # writes append here at the SCALAR stage_ptr instead of streaming the
    # window prefix per step (the per-row masked write); flush_kv_cache
    # merges every ~C steps. k_stage (L, E, C, dk) — C on sublanes;
    # v_stage (L, E, C, dv); *_sc (L, E, C); stage_pos (b, C) logical
    # positions (-1 free); base_len (b,) = lengths at the last flush.
    k_stage: Optional[jax.Array] = None
    v_stage: Optional[jax.Array] = None
    ks_stage: Optional[jax.Array] = None
    vs_stage: Optional[jax.Array] = None
    stage_pos: Optional[jax.Array] = None
    stage_ptr: Optional[jax.Array] = None
    base_len: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8

    @property
    def bits(self) -> int:
        """Stored cache precision: 16 (fp), 8, or 4 (pair-packed nibbles —
        discriminated STRUCTURALLY by the scale layout: int4 scales carry the
        extra (even, odd) parity axis, (L, E, 2, S/2) vs int8's (L, E, S),
        so the flag never needs a traced field)."""
        if self.k.dtype != jnp.int8:
            return 16
        return 4 if (self.k_scale is not None
                     and self.k_scale.ndim == 4) else 8

    @property
    def staged(self) -> bool:
        return self.k_stage is not None


def init_kv_cache(cfg: GPTConfig, batch: int, max_seqlen: int,
                  dtype=jnp.bfloat16, per_slot: bool = False,
                  stage: int = 0, bits: int = 8) -> KVCache:
    """per_slot=True: (b,) per-row length counters for serving slots.
    stage > 0 (requires per_slot) adds a `stage`-column staging block so
    small-s decode writes are scalar-pointer appends instead of per-row
    window-prefix streams — see KVCache field docs and flush_kv_cache.
    bits=4 (with dtype=int8) stores PAIR-PACKED int4 caches — half the HBM
    stream of the measured cache-bound decode (ops/decode_attention int4
    block): k (L, E, dk, S/2) / v (L, E, S/2, dk) bytes with (L, E, 2, S/2)
    per-(parity, position) scales. Decode s==1 writes are nibble RMWs; s>1
    writes require EVEN offsets; staging is int8-only."""
    e, dh, S = batch * cfg.n_head, cfg.head_dim, max_seqlen
    k_scale = v_scale = None
    packed4 = dtype == jnp.int8 and bits == 4
    if packed4:
        assert S % 2 == 0, S
        # stage > 0: STAGED low-bit decode — appends ride the int8 staging
        # block (small in-place writes, never a kernel operand), the packed
        # main cache stays read-only within a scan segment so the
        # pass-through Pallas kernel reads it copy-free, and flush packs
        # stage -> main (see NOTES round-5 copy-semantics ladder)
        stage_kw = {}
        if stage > 0:
            assert per_slot, "staging is a serving-slot (per_slot) feature"
            L, C = cfg.n_layer, stage
            stage_kw = dict(
                k_stage=jnp.zeros((L, e, C, dh), jnp.int8),
                v_stage=jnp.zeros((L, e, C, dh), jnp.int8),
                ks_stage=jnp.ones((L, e, C), jnp.float32),
                vs_stage=jnp.ones((L, e, C), jnp.float32),
                stage_pos=jnp.full((batch, C), -1, jnp.int32),
                stage_ptr=jnp.zeros((), jnp.int32),
                base_len=jnp.zeros((batch,), jnp.int32),
            )
        k_scale = jnp.ones((cfg.n_layer, e, 2, S // 2), jnp.float32)
        v_scale = jnp.ones((cfg.n_layer, e, 2, S // 2), jnp.float32)
        return KVCache(
            k=jnp.zeros((cfg.n_layer, e, dh, S // 2), jnp.int8),
            v=jnp.zeros((cfg.n_layer, e, S // 2, dh), jnp.int8),
            length=jnp.zeros((batch,) if per_slot else (), jnp.int32),
            k_scale=k_scale, v_scale=v_scale, **stage_kw)
    if dtype == jnp.int8:
        # two separate allocations: a single shared array would put the SAME
        # buffer behind both fields, and any donating jit over the cache
        # (e.g. the serving engine's admission insert) then fails with
        # "attempt to donate the same buffer twice"
        k_scale = jnp.ones((cfg.n_layer, e, S), jnp.float32)
        v_scale = jnp.ones((cfg.n_layer, e, S), jnp.float32)
    stage_kw = {}
    if stage > 0:
        assert per_slot, "staging is a serving-slot (per_slot) feature"
        L, C = cfg.n_layer, stage
        stage_kw = dict(
            k_stage=jnp.zeros((L, e, C, dh), dtype),
            v_stage=jnp.zeros((L, e, C, dh), dtype),
            ks_stage=(jnp.ones((L, e, C), jnp.float32)
                      if dtype == jnp.int8 else None),
            vs_stage=(jnp.ones((L, e, C), jnp.float32)
                      if dtype == jnp.int8 else None),
            stage_pos=jnp.full((batch, C), -1, jnp.int32),
            stage_ptr=jnp.zeros((), jnp.int32),
            base_len=jnp.zeros((batch,), jnp.int32),
        )
    return KVCache(k=jnp.zeros((cfg.n_layer, e, dh, S), dtype),
                   v=jnp.zeros((cfg.n_layer, e, S, dh), dtype),
                   length=jnp.zeros((batch,) if per_slot else (), jnp.int32),
                   k_scale=k_scale, v_scale=v_scale, **stage_kw)


def flush_kv_cache(cache: KVCache, window: Optional[int] = None) -> KVCache:
    """Merge the staging block into the main cache and reset the stage.

    A one-hot MXU scatter over the staged columns' logical positions — the
    SAME full-prefix stream a single per-slot masked write costs, paid once
    per ~C decode steps instead of every step. base_len advances to length;
    stale staged duplicates (speculative rollbacks) were already
    invalidated on write, so valid staged entries are unique per position.
    window bounds the streamed prefix exactly like the bucketed reads."""
    if not cache.staged:
        return cache
    if cache.bits == 4:
        return _flush_kv_cache_packed(cache, window)
    b, C = cache.stage_pos.shape
    e = cache.k.shape[1]
    h = e // b
    S = cache.k.shape[-1]
    w = min(window, S) if window is not None else S
    valid = (cache.stage_pos >= 0) & (cache.stage_pos
                                      < cache.length[:, None])       # (b, C)
    pos = jnp.arange(w, dtype=jnp.int32)
    onehot = ((pos[None, :, None] == cache.stage_pos[:, None, :])
              & valid[:, None, :])                                   # (b,w,C)
    oh = jnp.repeat(onehot, h, axis=0).astype(jnp.float32)           # (E,w,C)
    wrote = oh.sum(axis=2) > 0.5                                     # (E, w)

    def merge(buf, st, layout):
        if buf is None:
            return None
        view = jax.lax.slice_in_dim(buf, 0, w,
                                    axis=3 if layout == "kt" else 2)
        stf = st.astype(jnp.float32)
        if layout == "kt":      # buf (L,E,dk,S); st (L,E,C,dk)
            delta = jnp.einsum("ewc,lecd->ledw", oh, stf)
            m = wrote[None, :, None, :]
        elif layout == "v":     # buf (L,E,S,dv); st (L,E,C,dv)
            delta = jnp.einsum("ewc,lecd->lewd", oh, stf)
            m = wrote[None, :, :, None]
        else:                   # 'sc': buf (L,E,S); st (L,E,C)
            delta = jnp.einsum("ewc,lec->lew", oh, stf)
            m = wrote[None]
        view = jnp.where(m, delta.astype(buf.dtype), view)
        return jax.lax.dynamic_update_slice(buf, view, (0,) * buf.ndim)

    return cache._replace(
        k=merge(cache.k, cache.k_stage, "kt"),
        v=merge(cache.v, cache.v_stage, "v"),
        k_scale=(merge(cache.k_scale, cache.ks_stage, "sc")
                 if cache.k_scale is not None else None),
        v_scale=(merge(cache.v_scale, cache.vs_stage, "sc")
                 if cache.v_scale is not None else None),
        stage_pos=jnp.full_like(cache.stage_pos, -1),
        stage_ptr=jnp.zeros_like(cache.stage_ptr),
        base_len=jnp.broadcast_to(cache.length, cache.base_len.shape))


def _flush_kv_cache_packed(cache: KVCache,
                           window: Optional[int] = None) -> KVCache:
    """flush_kv_cache for the PACKED int4 main cache: dequantize the staged
    int8 columns, re-quantize per position to int4, and splice the nibbles
    into the packed window (unpack -> masked update -> repack of the first
    ceil(window/2) columns — one amortized pass per ~stage-cap steps)."""
    from ..ops import quant
    b, C = cache.stage_pos.shape
    L, e = cache.k.shape[0], cache.k.shape[1]
    h = e // b
    S2 = cache.k.shape[-1]
    w2 = min(-(-window // 2), S2) if window is not None else S2
    valid = (cache.stage_pos >= 0) & (cache.stage_pos
                                      < cache.length[:, None])
    st_pos_e = jnp.repeat(cache.stage_pos, h, axis=0)        # (E, C)
    valid_e = jnp.repeat(valid, h, axis=0)
    kf = cache.k_stage.astype(jnp.float32) * cache.ks_stage[..., None]
    vf = cache.v_stage.astype(jnp.float32) * cache.vs_stage[..., None]
    cols = jnp.arange(w2, dtype=jnp.int32)

    def scatter(parity, stf):
        hit = ((st_pos_e[:, None, :] == 2 * cols[None, :, None] + parity)
               & valid_e[:, None, :])                        # (E, w2, C)
        delta = jnp.einsum("ewc,lecd->lewd", hit.astype(jnp.float32), stf)
        return delta, hit.any(axis=2)                        # .., (E, w2)

    def merge_nib(buf, scale_buf, stf, kt_layout):
        view = (jax.lax.slice_in_dim(buf, 0, w2, axis=3) if kt_layout
                else jax.lax.slice_in_dim(buf, 0, w2, axis=2))
        lo, hi = quant.unpack_int4_pairs_split(view)
        new_scale = scale_buf
        for parity in (0, 1):
            delta, wrote = scatter(parity, stf)              # (L,E,w2,d)
            absmax = jnp.max(jnp.abs(delta), axis=-1, keepdims=True)
            sc = jnp.maximum(absmax / 7.0, 1e-10)
            nib = jnp.clip(jnp.round(delta / sc), -7, 7).astype(jnp.int8)
            if kt_layout:
                nib = jnp.swapaxes(nib, 2, 3)                # (L,E,d,w2)
                m = wrote[None, :, None, :]
            else:
                m = wrote[None, :, :, None]
            if parity == 0:
                lo = jnp.where(m, nib, lo)
            else:
                hi = jnp.where(m, nib, hi)
            scv = jax.lax.slice_in_dim(
                new_scale[:, :, parity], 0, w2, axis=2)      # (L, E, w2)
            scv = jnp.where(wrote[None], sc[..., 0], scv)
            new_scale = new_scale.at[:, :, parity, :w2].set(scv)
        packed = ((lo.astype(jnp.int32) & 0xF)
                  | ((hi.astype(jnp.int32) & 0xF) << 4))
        packed = jnp.where(packed >= 128, packed - 256,
                           packed).astype(jnp.int8)
        starts = (0,) * buf.ndim
        return jax.lax.dynamic_update_slice(buf, packed, starts), new_scale

    k_new, ks_new = merge_nib(cache.k, cache.k_scale, kf, True)
    v_new, vs_new = merge_nib(cache.v, cache.v_scale, vf, False)
    return cache._replace(
        k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new,
        stage_pos=jnp.full_like(cache.stage_pos, -1),
        stage_ptr=jnp.zeros_like(cache.stage_ptr),
        base_len=jnp.broadcast_to(cache.length, cache.base_len.shape))


# ---------------------------------------------------------------- forward

def causal_dwconv3(x: jax.Array, p: dict) -> jax.Array:
    """Causal depthwise width-3 conv over the sequence: out[t] covers
    x[t-2..t] (reference: Conv1d(k=3, padding=2, groups=C) trimmed to s,
    mha.py:335-341). Expressed as three shifted adds — XLA fuses this into
    the surrounding elementwise stream; no conv primitive needed."""
    b, s, c = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 0), (0, 0)))
    w = p["w"].astype(x.dtype)
    out = (xp[:, 0:s] * w[0] + xp[:, 1:s + 1] * w[1] + xp[:, 2:s + 2] * w[2])
    return out + p["b"].astype(x.dtype)


# BACKPACKS_PACKED_QKV=1 routes attention through the packed-qkv flash
# entry. Default OFF: the packed (b,s,3,h,d)->(3,b,h,s,d) transform
# measured SLOWER end-to-end on v5e (r4c 216.9 / r4d 204.7-unpacked
# ms/step at the same kernel config) despite replacing more ops — XLA fuses
# the per-tensor slice+swapaxes chains better than the profile's line
# attribution suggested (the "25ms qkv formatting" was scan residual
# stacking).
_PACKED_QKV = os.environ.get("BACKPACKS_PACKED_QKV", "0") == "1"


def _block(hidden, residual, layer_params, scale, cfg: GPTConfig, *,
           train: bool, rngs, use_flash: bool, key_padding_mask):
    """One pre-norm block with reordered residual
    (reference: flash_attn/modules/block.py:62-106)."""
    qkv = dense.linear(hidden, layer_params["Wqkv"])
    b, s, _ = qkv.shape
    if cfg.attn_dwconv:
        qkv = causal_dwconv3(qkv, layer_params["dwconv"])
    qkv = qkv.reshape(b, s, 3, cfg.n_head, cfg.head_dim)
    r_attn, r_d1, r_d2 = (jax.random.split(rngs, 3) if rngs is not None
                          else (None, None, None))
    if (use_flash and cfg.rotary_emb_dim == 0 and key_padding_mask is None
            and _PACKED_QKV):
        # keep qkv packed into the flash kernel: one layout transform
        # instead of three slice+transpose chains (and one on the way back)
        ctx = mha_qkv_packed(qkv, causal=True, softmax_scale=scale,
                             dropout_p=cfg.attn_pdrop, dropout_rng=r_attn,
                             deterministic=not train)
    else:
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if cfg.rotary_emb_dim > 0:
            q, k = rotary.apply_rotary_qk(
                q, k, cfg.rotary_emb_dim,
                scale_base=cfg.rotary_emb_scale_base)
        ctx = mha(q, k, v, causal=True, softmax_scale=scale,
                  key_padding_mask=key_padding_mask,
                  dropout_p=cfg.attn_pdrop, dropout_rng=r_attn,
                  deterministic=not train, use_flash=use_flash)
    mixer_out = dense.linear(ctx.reshape(b, s, cfg.n_embd),
                             layer_params["out_proj"])
    hidden, residual = norms.dropout_add_layer_norm(
        mixer_out, residual, layer_params["norm1"]["weight"],
        layer_params["norm1"]["bias"], cfg.resid_pdrop, cfg.layer_norm_epsilon,
        rng=r_d1, deterministic=not train)
    if "moe" in layer_params:
        from ..ops import moe as moe_lib
        # capacity drops are a training-throughput construct; inference runs
        # drop-free (C = s) so eval logits are routing-complete and cached
        # decode (s=1 steps, C=1 each) matches the full forward exactly
        cf = (cfg.moe_capacity_factor if train
              else float(cfg.moe_experts))
        mlp_out, aux = moe_lib.switch_moe(
            hidden, layer_params["moe"], capacity_factor=cf,
            activation=cfg.activation)
    else:
        mlp_out = dense.mlp(hidden, layer_params["mlp"], cfg.activation)
        aux = jnp.zeros((), jnp.float32)
    hidden, residual = norms.dropout_add_layer_norm(
        mlp_out, residual, layer_params["norm2"]["weight"],
        layer_params["norm2"]["bias"], cfg.resid_pdrop, cfg.layer_norm_epsilon,
        rng=r_d2, deterministic=not train)
    return hidden, residual, aux


def take_embedding(wte, input_ids: jax.Array) -> jax.Array:
    """Embedding gather; wte may be a plain (V, d) array or an INT8 row-quantized
    dict {'q': (V, d) int8, 'row_scale': (V, 1)}."""
    if isinstance(wte, dict):
        rows = jnp.take(wte["q"], input_ids, axis=0).astype(jnp.float32)
        scales = jnp.take(wte["row_scale"], input_ids, axis=0)
        return (rows * scales).astype(jnp.bfloat16)
    return jnp.take(wte, input_ids, axis=0)


def embed(params: Params, cfg: GPTConfig, input_ids: jax.Array,
          position_ids: Optional[jax.Array] = None,
          dtype=None) -> jax.Array:
    """Word + learned-position embeddings (reference: modules/embedding.py:11-39)."""
    hidden = take_embedding(params["wte"], input_ids)
    if cfg.n_positions > 0:
        if position_ids is None:
            position_ids = jnp.arange(input_ids.shape[1])[None, :]
        hidden = hidden + jnp.take(params["wpe"], position_ids, axis=0
                                   ).astype(hidden.dtype)
    return hidden.astype(dtype) if dtype is not None else hidden


def remat_wrap(fn, mode):
    """Apply a rematerialization mode to a block function.

    mode: False/"none" — save everything (XLA stacks per-layer residuals
    with dynamic-update-slice when the block runs under scan);
    True/"full" — jax.checkpoint: save only block inputs, recompute the
    whole block in the backward (O(1)-block activation memory);
    "dots" — checkpoint with the dots-saveable policy: matmul outputs are
    saved, elementwise chains (gelu, dropout masks, LN stats) are
    recomputed — the middle ground between the 2x-forward cost of "full"
    and the full activation-save traffic of "none"."""
    if mode in (False, None, "none"):
        return fn
    if mode in (True, "full"):
        return jax.checkpoint(fn)
    if mode == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    raise ValueError(f"unknown remat mode: {mode!r}")


def gpt_forward(params: Params, cfg: GPTConfig, input_ids: jax.Array, *,
                position_ids: Optional[jax.Array] = None,
                train: bool = False, rng: Optional[jax.Array] = None,
                use_flash: bool = True,
                key_padding_mask: Optional[jax.Array] = None,
                remat=False, scan_unroll: int = 1) -> jax.Array:
    """Full forward; returns post-final-LN hidden states (b, s, d)
    (the analogue of GPTModel.forward, reference gpt.py:224-246).

    remat rematerializes each block in the backward pass — see remat_wrap
    for the modes (False / True / "dots") — the TPU lever the reference
    pulls with checkpoint_lvl recompute policies (ops/fused_dense.py:175-235).
    scan_unroll unrolls the layer scan (scan_unroll=n_layer removes the
    dynamic-update-slice stacking of saved activations entirely at the cost
    of an n_layer-times-larger HLO)."""
    hidden = embed(params, cfg, input_ids, position_ids)
    r_emb, r_layers = (jax.random.split(rng) if rng is not None else (None, None))
    hidden, residual = norms.dropout_add_layer_norm(
        hidden, None, params["ln_0"]["weight"], params["ln_0"]["bias"],
        cfg.embd_pdrop, cfg.layer_norm_epsilon, rng=r_emb,
        deterministic=not train)

    scales = _softmax_scales(cfg)
    layer_rngs = (jax.random.split(r_layers, cfg.n_layer)
                  if r_layers is not None else None)

    def block_fn(hidden, residual, layer_params, scale, lrng):
        return _block(hidden, residual, layer_params, scale, cfg,
                      train=train, rngs=lrng, use_flash=use_flash,
                      key_padding_mask=key_padding_mask)

    block_fn = remat_wrap(block_fn, remat)

    def scan_body(carry, xs):
        hidden, residual, aux_sum = carry
        if layer_rngs is not None:
            layer_params, scale, lrng = xs
        else:
            (layer_params, scale), lrng = xs, None
        hidden, residual, aux = block_fn(hidden, residual, layer_params,
                                         scale, lrng)
        return (hidden, residual, aux_sum + aux), None

    xs = ((params["layers"], scales, layer_rngs) if layer_rngs is not None
          else (params["layers"], scales))
    (hidden, _, aux_sum), _ = jax.lax.scan(
        scan_body, (hidden, residual, jnp.zeros((), jnp.float32)), xs,
        unroll=scan_unroll)
    if cfg.moe_experts > 0:
        # mean Switch balance loss across layers (== 1 at perfect balance)
        return hidden, aux_sum / cfg.n_layer
    return hidden


def _masked_row_write(buf: jax.Array, new: jax.Array, offsets: jax.Array,
                      axis: int) -> jax.Array:
    """buf <- new written along `axis` at PER-ROW offsets (b,), without XLA
    scatter.

    A vmapped dynamic_update_slice with per-row offsets lowers to scatter,
    which XLA:TPU serializes into a per-row loop — measured at ~138ms/step
    on the per-slot decode path (bench_results/spec_r3.json) vs ~3ms for the
    scalar-length path: a silent ~50x tax on the WHOLE serving engine, every
    step, every layer. Instead:

      * s == 1 (the decode hot path): a one-hot select along the axis —
        buf = where(pos == offset, new, buf). Fused elementwise, one pass.
      * s > 1 (admission prefill / speculative verification): a one-hot
        MATMUL — delta[..., S, :] = onehot[S, s] @ new[..., s, :] rides the
        MXU and is exact for cache values (int8 fits f32 accumulation).
    """
    S = buf.shape[axis]
    s = new.shape[axis]
    b = buf.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, S), 1)
    off = offsets.reshape(b, *([1] * (buf.ndim - 1)))
    posx = pos.reshape(b, *([1] * (axis - 1)), S,
                       *([1] * (buf.ndim - axis - 1)))
    if s == 1:
        # new's size-1 axis broadcasts across S inside the select
        return jnp.where(posx == off, new.astype(buf.dtype), buf)
    # one-hot matmul: onehot (b, S, s); contract new's s-axis on the MXU
    onehot = (pos[:, :, None] - offsets[:, None, None]
              == jnp.arange(s, dtype=jnp.int32)[None, None, :])
    nf = jnp.moveaxis(new.astype(jnp.float32), axis, -1)   # (b, ..., s)
    bcast = "".join(chr(ord("u") + i) for i in range(buf.ndim - 2))
    delta = jnp.einsum(f"bMs,b{bcast}s->b{bcast}M", onehot.astype(jnp.float32),
                       nf)
    delta = jnp.moveaxis(delta, -1, axis)
    inside = (posx >= off) & (posx < off + s)
    return jnp.where(inside, delta.astype(buf.dtype), buf)


def _update_rows(buf: jax.Array, new: jax.Array,
                 offsets: jax.Array) -> jax.Array:
    """buf (b, S, ...) <- new (b, s, ...) written at per-row offsets (b,) —
    the serving-slot cache write (each slot is at its own decode position)."""
    return _masked_row_write(buf, new, offsets, axis=1)


def update_rows_axis(buf: jax.Array, new: jax.Array, offsets,
                     axis: int) -> jax.Array:
    """buf (b, ...) <- new (b, ...) written along `axis` (absolute, counting
    the batch axis) at a scalar or per-row (b,) offset."""
    if jnp.asarray(offsets).ndim == 1:
        return _masked_row_write(buf, new, offsets, axis)
    idx = [0] * buf.ndim
    idx[axis] = offsets
    return jax.lax.dynamic_update_slice(buf, new.astype(buf.dtype),
                                        tuple(idx))


def update_rows_axis_windowed(buf: jax.Array, new: jax.Array, offsets,
                              axis: int, window: Optional[int]) -> jax.Array:
    """update_rows_axis restricted to the first `window` columns: the
    per-row masked write streams the whole buffer along `axis`, but writes
    always land below the active length bucket (callers guarantee
    max(offsets)+s <= window), so only the bucket prefix needs the pass —
    the same static length-bucketing that cuts decode READ traffic."""
    S = buf.shape[axis]
    if (window is None or window >= S
            or jnp.asarray(offsets).ndim == 0):
        return update_rows_axis(buf, new, offsets, axis)
    view = jax.lax.slice_in_dim(buf, 0, window, axis=axis)
    view = update_rows_axis(view, new, offsets, axis)
    return jax.lax.dynamic_update_slice(buf, view.astype(buf.dtype),
                                        (0,) * buf.ndim)


# ------------------------------------------------------------ int4 writes

def rmw_nibble_axis_windowed(buf: jax.Array, nib: jax.Array, offsets,
                             axis: int, window: Optional[int] = None
                             ) -> jax.Array:
    """Write ONE position's int4 nibble values into a pair-packed cache.

    buf: packed bytes with the packed-column axis at `axis` (width S/2);
    nib: nibble values in [-7, 7] with size 1 on `axis`; offsets: scalar or
    per-row (b,) POSITION offsets — packed column = offset // 2, parity =
    offset % 2 (low/high nibble). Scalar offsets read-modify-write a single
    byte column (two small dynamic slices); per-row offsets stream the first
    ceil(window/2) packed columns, like the int8 masked row write."""
    from ..ops import quant
    S2 = buf.shape[axis]
    off = jnp.asarray(offsets)
    if off.ndim == 0:
        starts = [0] * buf.ndim
        starts[axis] = off // 2
        sizes = list(buf.shape)
        sizes[axis] = 1
        old = jax.lax.dynamic_slice(buf, tuple(starts), tuple(sizes))
        new = quant.rmw_nibble(old, nib.astype(jnp.int8), off % 2)
        return jax.lax.dynamic_update_slice(buf, new, tuple(starts))
    b = buf.shape[0]
    w2 = S2 if window is None else min(-(-window // 2), S2)
    view = (jax.lax.slice_in_dim(buf, 0, w2, axis=axis) if w2 < S2 else buf)
    bshape = [1] * buf.ndim
    bshape[0] = b
    colx = (off // 2).reshape(bshape)
    parx = (off % 2).reshape(bshape)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, w2), 1)
    posx = pos.reshape(b, *([1] * (axis - 1)), w2,
                       *([1] * (buf.ndim - axis - 1)))
    mixed = quant.rmw_nibble(view, nib.astype(jnp.int8), parx)
    view = jnp.where(posx == colx, mixed, view)
    if w2 == S2:
        return view
    return jax.lax.dynamic_update_slice(buf, view, (0,) * buf.ndim)


def store_split8_step(buf: jax.Array, val: jax.Array, offsets,
                      window: Optional[int] = None) -> jax.Array:
    """Write ONE position into an EVEN/ODD SPLIT int8 key cache:
    buf (E, dk, 2, S/2) <- val (E, dk, 1) at (parity, packed col) =
    (offset % 2, offset // 2). The split layout gives the int8
    contextualization keys the same packed-column windowing as the int4
    caches without nibble packing (int4 keys measured +1.19 ppl;
    ops/decode_attention mixed block)."""
    off = jnp.asarray(offsets)
    if off.ndim == 0:
        return jax.lax.dynamic_update_slice(
            buf, val.astype(buf.dtype)[..., None],
            (0, 0, off % 2, off // 2))
    e, dk, _, S2 = buf.shape
    w2 = S2 if window is None else min(-(-window // 2), S2)
    view = (jax.lax.slice_in_dim(buf, 0, w2, axis=3) if w2 < S2 else buf)
    pos = jax.lax.broadcasted_iota(jnp.int32, (e, 1, 1, w2), 3)
    par = jax.lax.broadcasted_iota(jnp.int32, (e, 1, 2, 1), 2)
    hit = ((pos == (off // 2)[:, None, None, None])
           & (par == (off % 2)[:, None, None, None]))
    view = jnp.where(hit, val.astype(buf.dtype)[..., None], view)
    if w2 == S2:
        return view
    return jax.lax.dynamic_update_slice(buf, view, (0, 0, 0, 0))


def update_pair_scale(scale_buf: jax.Array, val: jax.Array, offsets,
                      window: Optional[int] = None) -> jax.Array:
    """scale_buf (E, 2, S/2) <- val (E,) written at (parity, packed column)
    = (offset % 2, offset // 2); offsets scalar or per-row (E,)."""
    off = jnp.asarray(offsets)
    if off.ndim == 0:
        return jax.lax.dynamic_update_slice(
            scale_buf, val.reshape(-1, 1, 1).astype(scale_buf.dtype),
            (0, off % 2, off // 2))
    e, _, S2 = scale_buf.shape
    w2 = S2 if window is None else min(-(-window // 2), S2)
    view = (jax.lax.slice_in_dim(scale_buf, 0, w2, axis=2)
            if w2 < S2 else scale_buf)
    pos = jax.lax.broadcasted_iota(jnp.int32, (e, 1, w2), 2)
    par = jax.lax.broadcasted_iota(jnp.int32, (e, 2, 1), 1)
    hit = (pos == (off // 2)[:, None, None]) & (par == (off % 2)[:, None, None])
    view = jnp.where(hit, val[:, None, None].astype(scale_buf.dtype), view)
    if w2 == S2:
        return view
    return jax.lax.dynamic_update_slice(scale_buf, view, (0, 0, 0))


def gpt_forward_with_cache(
    params: Params, cfg: GPTConfig, input_ids: jax.Array, cache: KVCache, *,
    use_flash: bool = True, window: Optional[int] = None,
) -> Tuple[jax.Array, KVCache]:
    """Forward over `input_ids` starting at position cache.length, updating the
    KV cache. Handles both prefill (s > 1, length == 0) and incremental decode
    (s == 1). Replaces the reference decode protocol of mha.py:425-440.

    cache.length may be a scalar (uniform batch) or a (b,) vector of per-row
    lengths (continuous-batching serving slots). With vector lengths and
    s > 1, each row's new tokens must start at ITS offset with no gaps —
    the serving engine prefills fresh slots (offset 0) batch-1 and scatters.

    window: STATIC upper bound on the valid cache length after this call
    (caller-guaranteed: max(length)+s <= window). Decode then reads only the
    first `window` cache columns — the length-bucketing that cuts the
    memory-bound cache traffic early in a sequence. A static slice, chosen by
    the host per dispatch (serving) or per scan segment (bench), NOT a
    traced lax.cond — in-program branching forces XLA into defensive
    full-cache copies on the scan carry (measured 5x decode slowdown).
    """
    b, s = input_ids.shape
    # cached decode would need a 2-token qkv history per layer for the conv
    # window (the reference also excludes it: mha.py:359)
    assert not cfg.attn_dwconv, "cached decode does not support attn_dwconv"
    offset = cache.length
    vec = jnp.asarray(offset).ndim == 1
    if vec:
        position_ids = offset[:, None] + jnp.arange(s)[None, :]
    else:
        position_ids = offset + jnp.arange(s)[None, :]
    hidden = embed(params, cfg, input_ids, position_ids)
    hidden, residual = norms.dropout_add_layer_norm(
        hidden, None, params["ln_0"]["weight"], params["ln_0"]["bias"],
        0.0, cfg.layer_norm_epsilon)

    scales = _softmax_scales(cfg)
    new_len = offset + s
    quantized = cache.quantized
    q4 = cache.bits == 4
    if q4:
        assert s == 1 or not (vec and not cache.staged), \
            "int4 caches: multi-token writes need a uniform (scalar) offset"
        assert not (cache.staged and s > 1), \
            "staged int4 caches: single-token decode only (flush + use the" \
            " unstaged path for prefill/verification)"
    # packed-axis window: w positions = ceil(w/2) packed byte columns
    win4 = (-(-window // 2)) if (q4 and window is not None) else None

    # The stacked caches ride the scan CARRY (not xs/ys): dynamic-update-slice
    # on a carried buffer compiles to an in-place write, whereas xs/ys would
    # copy the full (n_layer, b, S, h, dh) cache every decode step.
    h, dk = cfg.n_head, cfg.head_dim
    e = b * h

    def _layer(all_buf, li, win_axis=None, win=None):
        """One layer of the stacked cache, optionally with the static
        `window` folded into the SAME dynamic_slice along win_axis (`win`
        overrides the width — packed int4 buffers halve it). A
        separate [:window] slice after the layer slice breaks the fusion
        into the attention consumer and XLA materializes a full-layer copy
        per step (profiled: 2 x 816us/step at batch 128)."""
        shape = list(all_buf.shape)
        shape[0] = 1
        w = window if win is None else win
        if win_axis is not None and w is not None:
            shape[win_axis] = min(w, shape[win_axis])
        zeros = (0,) * (all_buf.ndim - 1)
        return jax.lax.dynamic_slice(all_buf, (li,) + zeros, tuple(shape))[0]

    def _store(all_buf, li, new, axis):
        """Write `new` (E, ...) into layer li at the (scalar or per-row)
        offset along `axis` of the per-layer (E, ...) view.

        Scalar offsets write the small block straight into the stacked buffer
        (an in-place dynamic_update_slice on the scan carry — no layer copy);
        per-row offsets (serving) use the masked row write on the layer's
        WINDOW prefix (writes land below the active length bucket)."""
        if not vec:
            idx = [0] * all_buf.ndim
            idx[0] = li
            idx[axis + 1] = offset
            return jax.lax.dynamic_update_slice(
                all_buf, new.astype(all_buf.dtype)[None], tuple(idx))
        layer = _layer(all_buf, li, win_axis=axis + 1)
        layer = update_rows_axis(layer, new, jnp.repeat(offset, h), axis)
        zeros = (0,) * (all_buf.ndim - 1)
        return jax.lax.dynamic_update_slice(all_buf, layer[None],
                                            (li,) + zeros)

    # ---- staging (serving): small-s writes append at the SCALAR stage
    # pointer — an in-place dynamic_update_slice, NO window-prefix stream.
    staged = (cache.staged and vec and s <= FLAT_MULTI_MAX
              and s <= cache.k_stage.shape[2] if cache.staged else False)
    new_stage_pos = new_stage_ptr = None
    if cache.staged:
        # universal invalidation: any staged entry at/past this write's
        # offset is stale (speculative rollback reuse, slot re-prefill)
        inval = jnp.where(cache.stage_pos >= offset[:, None],
                          jnp.int32(-1), cache.stage_pos)
        if staged:
            cols = (offset[:, None] + jnp.arange(s)[None, :]).astype(
                jnp.int32)
            new_stage_pos = jax.lax.dynamic_update_slice(
                inval, cols, (0, cache.stage_ptr))
            new_stage_ptr = cache.stage_ptr + s
        else:
            new_stage_pos, new_stage_ptr = inval, cache.stage_ptr

    def _store_stage(all_buf, li, new):
        """Append `new` (E, s, d) or (E, s) at (layer li, stage_ptr)."""
        idx = [0] * all_buf.ndim
        idx[0], idx[2] = li, cache.stage_ptr
        return jax.lax.dynamic_update_slice(
            all_buf, new.astype(all_buf.dtype)[None], tuple(idx))

    # ---- int4 pair-packed writes (see init_kv_cache(bits=4))
    def _store4_step(all_buf, li, nib, axis):
        """ONE position's nibble values into layer li: a read-modify-write
        of a single packed byte column (scalar offsets) or a masked RMW over
        the window's packed prefix (per-row serving offsets)."""
        from ..ops import quant as quant_lib
        if not vec:
            starts = [0] * all_buf.ndim
            starts[0] = li
            starts[axis + 1] = offset // 2
            sizes = list(all_buf.shape)
            sizes[0] = 1
            sizes[axis + 1] = 1
            old = jax.lax.dynamic_slice(all_buf, tuple(starts), tuple(sizes))
            new = quant_lib.rmw_nibble(old, nib[None], offset % 2)
            return jax.lax.dynamic_update_slice(all_buf, new, tuple(starts))
        layer = _layer(all_buf, li, win_axis=axis + 1, win=win4)
        layer = rmw_nibble_axis_windowed(layer, nib, jnp.repeat(offset, h),
                                         axis)
        zeros = (0,) * (all_buf.ndim - 1)
        return jax.lax.dynamic_update_slice(all_buf, layer[None],
                                            (li,) + zeros)

    def _store4_scale(all_buf, li, val):
        """Per-position dequant scale (E,) at (parity, packed col)."""
        if not vec:
            return jax.lax.dynamic_update_slice(
                all_buf, val.reshape(1, -1, 1, 1).astype(all_buf.dtype),
                (li, 0, offset % 2, offset // 2))
        layer = _layer(all_buf, li, win_axis=3, win=win4)
        layer = update_pair_scale(layer, val, jnp.repeat(offset, h))
        return jax.lax.dynamic_update_slice(all_buf, layer[None],
                                            (li, 0, 0, 0))

    def _store4_prefill(all_buf, li, nib, axis):
        """Pack s positions pairwise along `axis` and write the packed block
        at column offset//2. Offsets must be EVEN for s > 1 (init-time
        contract); an odd s leaves the final high nibble zero — masked by
        `length` and overwritten in place by the next step's RMW."""
        from ..ops import quant as quant_lib
        if s % 2:
            pad = [(0, 0)] * nib.ndim
            pad[axis] = (0, 1)
            nib = jnp.pad(nib, pad)
        packed = quant_lib.pack_int4_pairs(nib, axis)
        starts = [0] * all_buf.ndim
        starts[0] = li
        starts[axis + 1] = offset // 2
        return jax.lax.dynamic_update_slice(all_buf, packed[None],
                                            tuple(starts))

    def _store4_prefill_scale(all_buf, li, sc):
        """sc (E, s) per-position scales -> the (E, 2, ceil(s/2)) parity
        block at packed column offset//2."""
        if s % 2:
            sc = jnp.pad(sc, ((0, 0), (0, 1)), constant_values=1.0)
        sc2 = sc.reshape(e, -1, 2).swapaxes(1, 2)
        return jax.lax.dynamic_update_slice(
            all_buf, sc2[None].astype(all_buf.dtype), (li, 0, 0, offset // 2))

    def scan_body(carry, xs):
        (hidden, residual, k_all, v_all, ks_all, vs_all,
         kst_all, vst_all, kss_all, vss_all) = carry
        layer_params, scale, li = xs
        qkv = dense.linear(hidden, layer_params["Wqkv"])
        qkv = qkv.reshape(b, s, 3, cfg.n_head, cfg.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if cfg.rotary_emb_dim > 0:
            # rotary applied BEFORE the cache update, so cached keys are
            # already rotated (reference mha.py:426-431)
            q, k = rotary.apply_rotary_qk(q, k, cfg.rotary_emb_dim,
                                          seqlen_offset=offset,
                                          scale_base=cfg.rotary_emb_scale_base)
        # cache layouts: kt (E, dk, S) / v (E, S, dv) / scales (E, S)
        v_new = v.transpose(0, 2, 1, 3).reshape(e, s, dk)
        if staged:
            # append to the staging block at the scalar pointer; the MAIN
            # cache is untouched until flush_kv_cache
            k_st_new = k.transpose(0, 2, 1, 3).reshape(e, s, dk)
            if quantized:
                from ..ops import quant
                k8s, kss = quant.quantize_activations_int8(k_st_new, axis=2)
                v8s, vss = quant.quantize_activations_int8(v_new, axis=2)
                kst_all = _store_stage(kst_all, li, k8s)
                vst_all = _store_stage(vst_all, li, v8s)
                kss_all = _store_stage(kss_all, li, kss[..., 0])
                vss_all = _store_stage(vss_all, li, vss[..., 0])
            else:
                kst_all = _store_stage(kst_all, li, k_st_new)
                vst_all = _store_stage(vst_all, li, v_new)
        else:
            kt_new = k.transpose(0, 2, 3, 1).reshape(e, dk, s)
            if q4:
                from ..ops import quant
                k4q, ks = quant.quantize_activations_int4(kt_new, axis=1)
                v4q, vs = quant.quantize_activations_int4(v_new, axis=2)
                if s == 1:
                    k_all = _store4_step(k_all, li, k4q, axis=2)
                    v_all = _store4_step(v_all, li, v4q, axis=1)
                    ks_all = _store4_scale(ks_all, li, ks[:, 0, 0])
                    vs_all = _store4_scale(vs_all, li, vs[:, 0, 0])
                else:
                    k_all = _store4_prefill(k_all, li, k4q, axis=2)
                    v_all = _store4_prefill(v_all, li, v4q, axis=1)
                    ks_all = _store4_prefill_scale(ks_all, li, ks[:, 0, :])
                    vs_all = _store4_prefill_scale(vs_all, li, vs[..., 0])
            elif quantized:
                from ..ops import quant
                k8, ks = quant.quantize_activations_int8(kt_new, axis=1)
                v8, vs = quant.quantize_activations_int8(v_new, axis=2)
                k_all = _store(k_all, li, k8, axis=2)
                v_all = _store(v_all, li, v8, axis=1)
                ks_all = _store(ks_all, li, ks[:, 0, :], axis=1)
                vs_all = _store(vs_all, li, vs[..., 0], axis=1)
            else:
                k_all = _store(k_all, li, kt_new, axis=2)
                v_all = _store(v_all, li, v_new, axis=1)
        if not (q4 and s == 1):
            # per-layer windowed views for the XLA branches (fused into the
            # contractions). The q4 s==1 branch instead hands the FULL
            # stacked buffers to the stacked Pallas kernel — a pallas
            # operand cannot fuse these slices and would materialize a
            # cache copy per step (measured 4x the int8 path,
            # bench_results/headline_r5d.txt).
            kt_cache = _layer(k_all, li, win_axis=3, win=win4)
            v_cache = _layer(v_all, li, win_axis=2, win=win4)
            k_sc = (_layer(ks_all, li, win_axis=3 if q4 else 2, win=win4)
                    if quantized else None)
            v_sc = (_layer(vs_all, li, win_axis=3 if q4 else 2, win=win4)
                    if quantized else None)
            S = kt_cache.shape[-1]
        if staged and q4:
            # staged low-bit decode: Pallas main segment over the READ-ONLY
            # packed cache (pass-through aliasing, valid to base_len) +
            # XLA stage segment, merged flash-style
            from ..ops.decode_attention import (
                decode_attention_int4_staged_ml, merge_softmax_segments,
                stage_segment_attention)
            base_e = jnp.repeat(cache.base_len, h)
            lens_e = jnp.repeat(new_len, h)
            pos_e = jnp.repeat(new_stage_pos, h, axis=0)
            qf = (q[:, 0].astype(jnp.float32) * scale).astype(
                q.dtype).reshape(e, dk)
            (o_m, m_m, l_m, k_all, ks_all, v_all, vs_all) = \
                decode_attention_int4_staged_ml(
                    li, qf, k_all, ks_all, v_all, vs_all, base_e,
                    window_cols=win4)
            k_st = _layer(kst_all, li)
            v_st = _layer(vst_all, li)
            ks_st = _layer(kss_all, li)
            vs_st = _layer(vss_all, li)
            o_s, m_s, l_s = stage_segment_attention(qf, k_st, ks_st, v_st,
                                                    vs_st, pos_e, lens_e)
            ctx = merge_softmax_segments(o_m, m_m, l_m, o_s, m_s, l_s)
            ctx = ctx.reshape(b, 1, h, dk)
        elif staged:
            from ..ops.decode_attention import (
                decode_attention_flat_multi_staged,
                decode_attention_flat_staged)
            k_st = _layer(kst_all, li)
            v_st = _layer(vst_all, li)
            ks_st = _layer(kss_all, li) if quantized else None
            vs_st = _layer(vss_all, li) if quantized else None
            base_e = jnp.repeat(cache.base_len, h)
            lens_e = jnp.repeat(new_len, h)
            pos_e = jnp.repeat(new_stage_pos, h, axis=0)
            qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
            if s == 1:
                ctx = decode_attention_flat_staged(
                    qf[:, 0].reshape(e, dk), kt_cache, k_sc, v_cache, v_sc,
                    base_e, k_st, ks_st, v_st, vs_st, pos_e, lens_e)
                ctx = ctx.reshape(b, 1, h, dk)
            else:
                q_flat = qf.transpose(0, 2, 1, 3).reshape(e, s, dk)
                ctx = decode_attention_flat_multi_staged(
                    q_flat, kt_cache, k_sc, v_cache, v_sc, base_e,
                    k_st, ks_st, v_st, vs_st, pos_e, lens_e)
                ctx = ctx.reshape(b, h, s, dk).transpose(0, 2, 1, 3)
        elif s == 1:
            # single-pass decode over the stored-precision flat cache
            lens = jnp.repeat(new_len, h) if vec else new_len
            q_flat = (q[:, 0].astype(jnp.float32) * scale).astype(
                q.dtype).reshape(e, dk)
            if q4:
                from ..ops.decode_attention import \
                    decode_attention_int4_stacked
                # the cache buffers are donated through the kernel and the
                # RETURNED aliases must become the carry (see the stacked
                # entry's contract)
                ctx, k_all, ks_all, v_all, vs_all = \
                    decode_attention_int4_stacked(
                        li, q_flat, k_all, ks_all, v_all, vs_all, lens,
                        window_cols=win4)
            else:
                ctx = decode_attention(q_flat, kt_cache, k_sc, v_cache,
                                       v_sc, lens)
            ctx = ctx.reshape(b, 1, h, dk)
        elif s <= FLAT_MULTI_MAX and not q4:
            # multi-query decode (speculative verification, small chunked
            # prefill): the flat-layout contraction generalizes to t query
            # rows — no (b, S, h, d) relayout and no dequantized cache copy
            # per step, both of which the generic prefill branch below pays
            from ..ops.decode_attention import decode_attention_flat_multi
            lens = jnp.repeat(new_len, h) if vec else new_len
            qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
            q_flat = qf.transpose(0, 2, 1, 3).reshape(e, s, dk)
            ctx = decode_attention_flat_multi(q_flat, kt_cache, k_sc,
                                              v_cache, v_sc, lens)
            ctx = ctx.reshape(b, h, s, dk).transpose(0, 2, 1, 3)
        else:
            # Prefill: attend over the cache with a causal offset. When
            # offset == 0 this is plain causal self-attention on fresh K/V.
            # The (E,)->(b,S,h,d) relayout of the cache happens once per
            # prefill (compute-bound), never in the decode loop.
            if q4:
                from ..ops import quant
                kd = (quant.unpack_int4_pairs(kt_cache, axis=2
                                              ).astype(jnp.float32)
                      * quant.interleave_pair_scales(k_sc)[:, None, :]
                      ).astype(q.dtype)
                vd = (quant.unpack_int4_pairs(v_cache, axis=1
                                              ).astype(jnp.float32)
                      * quant.interleave_pair_scales(v_sc)[..., None]
                      ).astype(q.dtype)
                S = 2 * S
            elif quantized:
                kd = (kt_cache.astype(jnp.float32)
                      * k_sc[:, None, :]).astype(q.dtype)
                vd = (v_cache.astype(jnp.float32)
                      * v_sc[..., None]).astype(q.dtype)
            else:
                kd, vd = kt_cache.astype(q.dtype), v_cache.astype(q.dtype)
            kd = kd.reshape(b, h, dk, S).transpose(0, 3, 1, 2)  # (b, S, h, dk)
            vd = vd.reshape(b, h, S, dk).transpose(0, 2, 1, 3)  # (b, S, h, dv)
            lens = (new_len.astype(jnp.int32) if vec
                    else jnp.full((b,), new_len, jnp.int32))
            ctx = mha(q, kd, vd, causal=True, softmax_scale=scale,
                      seq_lengths=lens, use_flash=use_flash,
                      q_offset=offset)
        mixer_out = dense.linear(ctx.reshape(b, s, cfg.n_embd),
                                 layer_params["out_proj"])
        hidden, residual = norms.dropout_add_layer_norm(
            mixer_out, residual, layer_params["norm1"]["weight"],
            layer_params["norm1"]["bias"], 0.0, cfg.layer_norm_epsilon)
        if "moe" in layer_params:
            from ..ops import moe as moe_lib
            # drop-free at inference (see _block)
            mlp_out, _ = moe_lib.switch_moe(
                hidden, layer_params["moe"],
                capacity_factor=float(cfg.moe_experts),
                activation=cfg.activation)
        else:
            mlp_out = dense.mlp(hidden, layer_params["mlp"], cfg.activation)
        hidden, residual = norms.dropout_add_layer_norm(
            mlp_out, residual, layer_params["norm2"]["weight"],
            layer_params["norm2"]["bias"], 0.0, cfg.layer_norm_epsilon)
        return (hidden, residual, k_all, v_all, ks_all, vs_all,
                kst_all, vst_all, kss_all, vss_all), None

    dummy = jnp.zeros((1,))  # placeholder carry when the cache is fp
    carry0 = (hidden, residual, cache.k, cache.v,
              cache.k_scale if quantized else dummy,
              cache.v_scale if quantized else dummy,
              cache.k_stage if cache.staged else dummy,
              cache.v_stage if cache.staged else dummy,
              cache.ks_stage if cache.staged and quantized else dummy,
              cache.vs_stage if cache.staged and quantized else dummy)
    xs = (params["layers"], scales, jnp.arange(cfg.n_layer))
    (hidden, _, new_k, new_v, new_ks, new_vs,
     new_kst, new_vst, new_kss, new_vss), _ = jax.lax.scan(
        scan_body, carry0, xs)
    return hidden, KVCache(
        k=new_k, v=new_v, length=new_len,
        k_scale=new_ks if quantized else None,
        v_scale=new_vs if quantized else None,
        k_stage=new_kst if cache.staged else None,
        v_stage=new_vst if cache.staged else None,
        ks_stage=new_kss if cache.staged and quantized else None,
        vs_stage=new_vss if cache.staged and quantized else None,
        stage_pos=new_stage_pos, stage_ptr=new_stage_ptr,
        # a big-s write on a staged cache lands in the MAIN cache (masked
        # row write), so those rows' flushed horizon advances with it
        base_len=(cache.base_len if staged or not cache.staged else
                  jnp.broadcast_to(new_len, cache.base_len.shape)))


# ---------------------------------------------------------------- LM head

def init_gpt_lm(cfg: GPTConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """GPTLMHeadModel: lm_head is weight-tied to wte (reference gpt.py:270-271),
    so the param tree is identical to the base model's."""
    return init_gpt(cfg, key, dtype)


def lm_logits(params: Params, cfg: GPTConfig, hidden: jax.Array) -> jax.Array:
    """Tied lm_head: hidden @ wte^T (reference gpt.py:270-280). Quantized
    param trees carry an explicit 'lm_head' quantized (d, V) kernel.

    Logits come back in hidden's dtype (f32 accumulation on the MXU, one
    rounding on output): at batch 32 x 512 x 50264 an f32 logits buffer is
    3.3 GB that the CE residual save and backward then stream twice more —
    ~10 GB/step of pure logits traffic (r3 profile: gpt.py lm_head fusions
    21.7 ms + CE 4.4 ms, all at HBM rates). The reference's xentropy kernel
    reads fp16 logits and computes the lse in fp32 in-register
    (csrc/xentropy/xentropy_kernel.cu) — bf16 logits + in-fusion f32
    reductions (ops/cross_entropy.py:27) is the same numerics class.
    BACKPACKS_F32_LOGITS=1 restores the f32 buffer for A/Bs."""
    if "lm_head" in params:
        from ..ops import quant
        return quant.quant_linear(hidden, params["lm_head"],
                                  ).astype(jnp.float32)
    if os.environ.get("BACKPACKS_F32_LOGITS", "0") == "1":
        return jnp.dot(hidden, params["wte"].T,
                       preferred_element_type=jnp.float32)
    if hidden.dtype == jnp.bfloat16 and params["wte"].dtype == jnp.bfloat16:
        # emit bf16 straight from the GEMM — the pref=f32 + astype form
        # leaves it to XLA whether the convert fuses into the GEMM epilogue
        # or streams the full f32 buffer first
        return jnp.dot(hidden, params["wte"].T)
    return jnp.dot(hidden, params["wte"].T,
                   preferred_element_type=jnp.float32).astype(hidden.dtype)


def gpt_lm_forward(params: Params, cfg: GPTConfig, input_ids: jax.Array,
                   **kw):
    """logits (b, s, V); with cfg.moe_experts > 0: (logits, moe_aux)."""
    out = gpt_forward(params, cfg, input_ids, **kw)
    if cfg.moe_experts > 0:
        hidden, aux = out
        return lm_logits(params, cfg, hidden), aux
    return lm_logits(params, cfg, out)
