"""Switch-style mixture-of-experts MLP with expert parallelism.

The reference has no MoE (SURVEY.md §2.7 "EP: none"); this is the
TPU-native building block for the one mesh axis the rest of parallel/
doesn't cover. The formulation is Mesh-TensorFlow/GSPMD-style: routing is
expressed as dense one-hot dispatch/combine einsums so the whole layer is
static-shaped and XLA inserts the expert all-to-alls purely from sharding
annotations (experts' leading axis P('expert')):

  router:   logits = x @ W_r            (b, s, E)
  top-1:    gate_e = softmax(logits)[argmax]; position-in-expert by cumsum;
            tokens beyond the static capacity C = ceil(s/E * cf) are DROPPED
            (output 0 for them — the Switch Transformer contract)
  dispatch: (b, s, E, C) one-hot;  expert_in = einsum('bsec,bsd->ebcd')
  experts:  per-expert FFN on (E, b, C, d) — leading dim shards over mesh
  combine:  out = einsum('ebcd,bsec->bsd', expert_out, dispatch * gate)

Also returns the Switch load-balancing auxiliary loss
E * sum_e fraction_routed_e * mean_prob_e (== 1 at perfect balance).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from . import dense


def init_switch_moe(key: jax.Array, d: int, inner: int, n_experts: int, *,
                    std: float = 0.02, dtype=jnp.float32) -> Dict:
    k_r, k1, k2 = jax.random.split(key, 3)
    return {
        "router": (jax.random.normal(k_r, (d, n_experts)) * std
                   ).astype(dtype),
        "fc1": {"kernel": (jax.random.normal(k1, (n_experts, d, inner))
                           * std).astype(dtype),
                "bias": jnp.zeros((n_experts, inner), dtype)},
        "fc2": {"kernel": (jax.random.normal(k2, (n_experts, inner, d))
                           * std).astype(dtype),
                "bias": jnp.zeros((n_experts, d), dtype)},
    }


def quantize_moe_params(params: Dict, *, act_dtype=jnp.bfloat16) -> Dict:
    """INT8 weight-only expert FFNs: per-(expert, out-channel) symmetric
    scales (absmax over the contraction axis), biases/router at activation
    precision. The quantized tree runs through the SAME switch_moe — the
    einsums detect {'q','scale'} kernels and fuse the int8->bf16 convert
    into the dot (the ops/quant.quant_linear INT8 XLA path lifted to the
    stacked-expert shape), so expert weights stream from HBM at 1 byte/param
    — the decode lever, since ALL experts' weights stream every step under
    the dense dispatch formulation. Works on per-layer (E, d, h) and
    layer-stacked (L, E, d, h) kernels alike (scan strips the L axis).
    INT4 experts would need the packed Pallas kernel path; not worth it
    while experts are 2/12ths of decode weight traffic."""
    def qkernel(w):
        wf = w.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
        scale = jnp.maximum(absmax / 127.0, 1e-10)
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        return {"q": q, "scale": scale.astype(jnp.float32)}

    return {
        "router": params["router"].astype(jnp.float32),
        "fc1": {"kernel": qkernel(params["fc1"]["kernel"]),
                "bias": params["fc1"]["bias"].astype(act_dtype)},
        "fc2": {"kernel": qkernel(params["fc2"]["kernel"]),
                "bias": params["fc2"]["bias"].astype(act_dtype)},
    }


def _expert_einsum(spec: str, x: jax.Array, kern) -> jax.Array:
    """Expert-stacked dot. Quantized kernels ({'q' int8, 'scale'
    (E, 1, out)}) run the convert-fused INT8 einsum; the scale applies to
    the f32 product (broadcast over the batch/capacity dims)."""
    if isinstance(kern, dict):
        compute = jnp.bfloat16 if x.dtype != jnp.float32 else jnp.float32
        y = jnp.einsum(spec, x.astype(compute), kern["q"].astype(compute),
                       preferred_element_type=jnp.float32)
        return (y * kern["scale"][:, None]).astype(x.dtype)
    return jnp.einsum(spec, x, kern)


def switch_moe(x: jax.Array, params: Dict, *,
               capacity_factor: float = 1.25,
               activation: str = "gelu_new"
               ) -> Tuple[jax.Array, jax.Array]:
    """x (b, s, d) -> (out (b, s, d), aux_loss scalar). Top-1 routing with a
    static per-row capacity; see module docstring. Accepts fp or
    quantize_moe_params trees."""
    b, s, d = x.shape
    E = params["router"].shape[-1]
    C = max(int(math.ceil(s / E * capacity_factor)), 1)

    logits = jnp.einsum("bsd,de->bse", x.astype(jnp.float32),
                        params["router"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)                    # (b, s)
    gate = jnp.take_along_axis(probs, expert[..., None], -1)[..., 0]
    onehot = jax.nn.one_hot(expert, E, dtype=jnp.float32)  # (b, s, E)

    # position of each token within its expert's capacity buffer
    pos = jnp.cumsum(onehot, axis=1) * onehot - 1.0        # (b, s, E)
    kept = (pos >= 0) & (pos < C)
    dispatch = (jax.nn.one_hot(pos.astype(jnp.int32), C, dtype=jnp.float32)
                * kept[..., None])                         # (b, s, E, C)

    expert_in = jnp.einsum("bsec,bsd->ebcd", dispatch,
                           x.astype(jnp.float32)).astype(x.dtype)
    act = dense.ACTIVATIONS[activation]
    h = _expert_einsum("ebcd,edh->ebch", expert_in, params["fc1"]["kernel"])
    h = act(h + params["fc1"]["bias"][:, None, None, :])
    expert_out = (_expert_einsum("ebch,ehd->ebcd", h,
                                 params["fc2"]["kernel"])
                  + params["fc2"]["bias"][:, None, None, :])

    combine = dispatch * gate[..., None, None]             # (b, s, E, C)
    out = jnp.einsum("ebcd,bsec->bsd", expert_out.astype(jnp.float32),
                     combine).astype(x.dtype)

    # Switch load-balancing loss (Fedus et al. 2021, eq. 4)
    frac_routed = jnp.mean(onehot, axis=(0, 1))            # (E,)
    mean_prob = jnp.mean(probs, axis=(0, 1))               # (E,)
    aux = E * jnp.sum(frac_routed * mean_prob)
    return out, aux


def moe_param_specs(params: Dict):
    """PartitionSpecs for expert parallelism: expert-stacked FFN kernels
    shard their leading axis over 'expert'; the router replicates."""
    from jax.sharding import PartitionSpec as P
    return {
        "router": P(),
        "fc1": {"kernel": P("expert", None, None), "bias": P("expert", None)},
        "fc2": {"kernel": P("expert", None, None), "bias": P("expert", None)},
    }
