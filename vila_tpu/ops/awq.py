"""AWQ: activation-aware weight quantization for the W4A16 deployment path.

The reference ships its W4 deployment through mit-han-lab/llm-awq
(reference README.md:245-255): plain round-to-nearest int4 loses accuracy
because ~1% of input channels carry activation outliers; AWQ searches a
per-input-channel scale s (from calibration activations) that multiplies
weight rows UP (protecting salient channels) and divides the activation
side DOWN — folded into the preceding op so inference kernels are
unchanged. This module is the TPU-native equivalent: the search runs as
batched XLA (every grid candidate quantized at once, `vmap` over the
alpha grid), and folding targets the vila_tpu fused-QKV/gate-up layout.

Scale-fold pairs (same set as llm-awq's `auto_scale` for LLaMA-family):
  * input_layernorm      -> qkv_proj rows      (s divides the ln scale)
  * post_attention_ln    -> gate_up_proj rows
  * up_proj columns      -> down_proj rows     (silu(g)*u / s == silu(g)*(u/s))
  * v_proj columns       -> o_proj rows        (GQA: s is group-constant,
                                                reduced by mean over each
                                                KV group before folding)

Calibration: `collect_act_stats` re-walks the decoder with the SAME ops
the model uses (rms_norm / apply_rope / multi_head_attention) and captures
per-channel mean |x| for each linear input, plus a row subsample for the
exact-MSE search. `tests/test_awq.py` pins the walk's final hidden state
to `qwen2.forward(return_hidden=True)` so the duplicate cannot drift.

No code from llm-awq is used; the algorithm is from the AWQ paper
(arXiv:2306.00978), re-derived for stacked-(L, din, dout) JAX params.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vila_tpu.ops.quant import DEFAULT_GROUP

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# Core scale search
# --------------------------------------------------------------------------


def _rtn_dequant(w: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Round-to-nearest int4 quantize+dequantize along the input dim.

    Mirrors quantize_w4's numerics (symmetric [-8, 7], per-(group, out)
    scale = amax/7) without the tiled packing — the search only needs the
    reconstruction, and this form stays a single fused XLA graph under
    vmap over the candidate grid."""
    din, dout = w.shape[-2:]
    g = w.reshape(*w.shape[:-2], din // group_size, group_size, dout)
    amax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(g / scale), -8, 7)
    return (q * scale).reshape(w.shape)


def search_awq_scales(
    w: jnp.ndarray,  # (din, dout) f32/bf16
    x_sample: jnp.ndarray,  # (m, din) calibration input rows
    act_amax: Optional[jnp.ndarray] = None,  # (din,) mean |x| per channel
    n_grid: int = 20,
    group_size: int = DEFAULT_GROUP,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AWQ grid search: s = normalize(act_amax ** alpha), alpha on a grid.

    Loss is the TRUE reconstruction error on the calibration rows:
        || x @ w  -  (x / s) @ rtn(w * s) ||^2
    (llm-awq's auto_scale objective). Returns (s (din,), best_loss ()).
    alpha=0 (s==1) is in the grid, so AWQ can never be worse than RTN on
    the calibration set."""
    w32 = jnp.asarray(w, jnp.float32)
    x32 = jnp.asarray(x_sample, jnp.float32)
    if act_amax is None:
        act_amax = jnp.mean(jnp.abs(x32), axis=0)
    a = jnp.maximum(jnp.asarray(act_amax, jnp.float32), 1e-8)
    ref = x32 @ w32

    alphas = jnp.linspace(0.0, 1.0, n_grid)

    def loss_for(alpha):
        s = a**alpha
        # normalize to geometric mean 1 (scale-free: only the RELATIVE
        # per-channel factor matters; keeps folded ln scales near 1)
        s = s / jnp.exp(jnp.mean(jnp.log(s)))
        wq = _rtn_dequant(w32 * s[:, None], group_size)
        out = (x32 / s[None, :]) @ wq
        return jnp.sum((out - ref) ** 2), s

    # lax.map (sequential), NOT vmap: a vmapped grid materializes n_grid
    # f32 dequant copies of the weight at once (~5 GB for the 8B down_proj)
    losses, scales = jax.lax.map(loss_for, alphas)
    best = jnp.argmin(losses)
    return scales[best], losses[best]


def fit_group(din: int, group_size: int = DEFAULT_GROUP) -> int:
    """Largest group <= group_size under quantize_llm_params' rule (the
    group must divide HALF the contraction — the packed-nibble layout)."""
    half = din // 2
    g = min(group_size, max(half, 1))
    while half % g != 0:
        g -= 1
    return g


def search_awq_scales_stacked(
    w: jnp.ndarray,  # (L, din, dout)
    x_sample: jnp.ndarray,  # (L, m, din)
    n_grid: int = 20,
    group_size: int = DEFAULT_GROUP,
) -> jnp.ndarray:
    """Per-layer AWQ search over stacked weights -> (L, din) scales.

    Sequential over layers (lax.map) to bound peak memory at one layer's
    f32 reconstruction."""
    g = fit_group(w.shape[-2], group_size)
    fn = functools.partial(search_awq_scales, n_grid=n_grid, group_size=g)
    s, _ = jax.lax.map(lambda wx: fn(wx[0], wx[1]), (w, x_sample))
    return s


# --------------------------------------------------------------------------
# Calibration walk (bf16 params, BEFORE quantization)
# --------------------------------------------------------------------------


def collect_act_stats(
    params: Params,
    cfg,  # qwen2.LLMConfig
    input_ids: jnp.ndarray,  # (B, S) calibration token ids
    sample_rows: int = 128,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """Run the bf16 decoder over calibration ids, capturing each linear
    family's input rows: {'qkv': (L, m, D), 'o': (L, m, Hq*hd),
    'gate_up': (L, m, D), 'down': (L, m, I), 'hidden': (B, S, D)}.

    `hidden` is the final rms-normed hidden state — tests pin it against
    qwen2.forward(return_hidden=True) so this walk can't drift from the
    model. The row subsample (same indices every layer) keeps memory at
    L * m * I instead of L * B*S * I."""
    from vila_tpu.models import qwen2
    from vila_tpu.ops.attention import multi_head_attention
    from vila_tpu.ops.norms import rms_norm
    from vila_tpu.ops.rope import apply_rope, rope_cos_sin

    dtype = cfg.compute_dtype
    b, s = input_ids.shape
    h = qwen2.embed_tokens(params, cfg, input_ids)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    cos, sin = rope_cos_sin(
        positions, cfg.head_dim_, cfg.rope_theta, cfg.rope_linear_scaling
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    m = min(sample_rows, b * s)
    row_idx = jax.random.choice(
        rng, b * s, shape=(m,), replace=(m > b * s)
    )

    def take(x3):  # (B, S, C) -> (m, C) f32 subsample
        return x3.reshape(b * s, -1).astype(jnp.float32)[row_idx]

    lp_all = params["layers"]
    nq = cfg.num_attention_heads * cfg.head_dim_
    nkv = cfg.num_key_value_heads * cfg.head_dim_

    def layer_fn(h, xs):
        l, lp = xs

        def lin(x, name):
            y = jnp.dot(x, lp[name]["kernel"].astype(dtype))
            if "bias" in lp[name]:
                y = y + lp[name]["bias"].astype(dtype)
            return y

        x = rms_norm(h, lp["input_layernorm"]["scale"], cfg.rms_norm_eps)
        qkv_in = take(x)
        if "qkv_proj" in lp:
            qkv = lin(x, "qkv_proj")
            q, k, v = (
                qkv[..., :nq],
                qkv[..., nq : nq + nkv],
                qkv[..., nq + nkv :],
            )
        else:
            q, k, v = lin(x, "q_proj"), lin(x, "k_proj"), lin(x, "v_proj")
        q = apply_rope(
            q.reshape(b, s, cfg.num_attention_heads, cfg.head_dim_), cos, sin
        )
        k = apply_rope(
            k.reshape(b, s, cfg.num_key_value_heads, cfg.head_dim_), cos, sin
        )
        v = v.reshape(b, s, cfg.num_key_value_heads, cfg.head_dim_)
        attn = multi_head_attention(q, k, v, causal=True)
        attn = attn.reshape(b, s, nq)
        o_in = take(attn)
        h = h + lin(attn, "o_proj")

        x = rms_norm(
            h, lp["post_attention_layernorm"]["scale"], cfg.rms_norm_eps
        )
        gu_in = take(x)
        if "gate_up_proj" in lp:
            gu = lin(x, "gate_up_proj")
            gate = gu[..., : cfg.intermediate_size]
            up = gu[..., cfg.intermediate_size :]
        else:
            gate, up = lin(x, "gate_proj"), lin(x, "up_proj")
        mid = jax.nn.silu(gate) * up
        down_in = take(mid)
        h = h + lin(mid, "down_proj")
        return h, {
            "qkv": qkv_in, "o": o_in, "gate_up": gu_in, "down": down_in
        }

    L = cfg.num_hidden_layers
    h, caps = jax.lax.scan(
        layer_fn, h, (jnp.arange(L, dtype=jnp.int32), lp_all)
    )
    h = rms_norm(h, params["norm"]["scale"], cfg.rms_norm_eps)
    caps["hidden"] = h
    return caps


# --------------------------------------------------------------------------
# Scale folding (stacked (L, ...) param trees, pre-quantization)
# --------------------------------------------------------------------------


def apply_awq(
    llm_params: Params,
    cfg,
    act_stats: Dict[str, jnp.ndarray],
    n_grid: int = 20,
    group_size: int = DEFAULT_GROUP,
) -> Params:
    """Fold AWQ scales into a bf16 qwen2 param tree (per-layer kernels
    q/k/v/gate/up/down/o, stacked on L). Returns a NEW tree whose bf16
    forward is numerically unchanged (scales cancel exactly in pairs) but
    whose `quantize_llm_params` output is activation-aware.

    Call order: collect_act_stats -> apply_awq -> quantize_llm_params."""
    src = llm_params["layers"]
    out_layers = {k: dict(v) for k, v in src.items()}
    f32 = jnp.float32

    def kern(name):
        return src[name]["kernel"].astype(f32)

    # ---- pair 1: input_layernorm -> q/k/v rows -------------------------
    qkv_cat = jnp.concatenate(
        [kern("q_proj"), kern("k_proj"), kern("v_proj")], axis=-1
    )
    s_qkv = search_awq_scales_stacked(
        qkv_cat, act_stats["qkv"], n_grid=n_grid, group_size=group_size
    )  # (L, D)
    for name in ("q_proj", "k_proj", "v_proj"):
        out_layers[name]["kernel"] = (
            kern(name) * s_qkv[:, :, None]
        ).astype(src[name]["kernel"].dtype)
    ln = out_layers["input_layernorm"]
    ln["scale"] = (ln["scale"].astype(f32) / s_qkv).astype(ln["scale"].dtype)

    # ---- pair 2: v columns -> o rows (GQA group-constant) --------------
    grp = cfg.num_attention_heads // max(cfg.num_key_value_heads, 1)
    hd = cfg.head_dim_
    Hkv = cfg.num_key_value_heads
    L = kern("o_proj").shape[0]
    s_o_raw = search_awq_scales_stacked(
        kern("o_proj"), act_stats["o"], n_grid=n_grid, group_size=group_size
    )  # (L, Hq*hd)
    # reduce to one factor per (kv head, dim): geometric mean over the group
    s_g = jnp.exp(
        jnp.mean(
            jnp.log(jnp.maximum(s_o_raw.reshape(L, Hkv, grp, hd), 1e-8)),
            axis=2,
        )
    )  # (L, Hkv, hd)
    s_o = jnp.repeat(s_g, grp, axis=1).reshape(L, Hkv * grp * hd)
    out_layers["o_proj"]["kernel"] = (
        kern("o_proj") * s_o[:, :, None]
    ).astype(src["o_proj"]["kernel"].dtype)
    vk = out_layers["v_proj"]["kernel"].astype(f32)
    out_layers["v_proj"]["kernel"] = (
        vk / s_g.reshape(L, 1, Hkv * hd)
    ).astype(src["v_proj"]["kernel"].dtype)
    if "bias" in src["v_proj"]:
        vb = src["v_proj"]["bias"].astype(f32)
        out_layers["v_proj"]["bias"] = (
            vb / s_g.reshape(L, Hkv * hd)
        ).astype(src["v_proj"]["bias"].dtype)

    # ---- pair 3: post_attention_layernorm -> gate/up rows ---------------
    gu_cat = jnp.concatenate([kern("gate_proj"), kern("up_proj")], axis=-1)
    s_gu = search_awq_scales_stacked(
        gu_cat, act_stats["gate_up"], n_grid=n_grid, group_size=group_size
    )
    for name in ("gate_proj", "up_proj"):
        out_layers[name]["kernel"] = (
            kern(name) * s_gu[:, :, None]
        ).astype(src[name]["kernel"].dtype)
    ln2 = out_layers["post_attention_layernorm"]
    ln2["scale"] = (
        ln2["scale"].astype(f32) / s_gu
    ).astype(ln2["scale"].dtype)

    # ---- pair 4: up columns -> down rows --------------------------------
    s_dn = search_awq_scales_stacked(
        kern("down_proj"), act_stats["down"],
        n_grid=n_grid, group_size=group_size,
    )  # (L, I)
    out_layers["down_proj"]["kernel"] = (
        kern("down_proj") * s_dn[:, :, None]
    ).astype(src["down_proj"]["kernel"].dtype)
    upk = out_layers["up_proj"]["kernel"].astype(f32)
    out_layers["up_proj"]["kernel"] = (
        upk / s_dn[:, None, :]
    ).astype(src["up_proj"]["kernel"].dtype)
    if "bias" in src["up_proj"]:
        ub = src["up_proj"]["bias"].astype(f32)
        out_layers["up_proj"]["bias"] = (
            ub / s_dn
        ).astype(src["up_proj"]["bias"].dtype)

    out = dict(llm_params)
    out["layers"] = out_layers
    return out


def awq_quantize_llm(
    llm_params: Params,
    cfg,
    calib_ids: jnp.ndarray,  # (B, S) calibration token ids
    n_grid: int = 20,
    group_size: int = DEFAULT_GROUP,
    fuse: bool = True,
    sample_rows: int = 128,
) -> Params:
    """One-call AWQ pipeline: calibrate -> fold scales -> quantize_w4.

    Drop-in replacement for quantize_llm_params when calibration ids are
    available (vila-upload --awq / weights_tools)."""
    from vila_tpu.ops.quant import quantize_llm_params

    stats = collect_act_stats(
        llm_params, cfg, calib_ids, sample_rows=sample_rows
    )
    folded = apply_awq(
        llm_params, cfg, stats, n_grid=n_grid, group_size=group_size
    )
    return quantize_llm_params(
        folded, bits=4, group_size=group_size, fuse=fuse, cfg=cfg
    )
