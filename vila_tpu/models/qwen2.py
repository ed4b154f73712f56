"""Qwen2/Llama-family decoder-only LM — functional JAX, scan-over-layers.

Capability parity with the reference's LLM path (NVILA uses HF Qwen2 via
`build_llm_and_tokenizer`, llava/model/language_model/builder.py:64).
Numerics match HF `modeling_qwen2` at float32: RMSNorm and softmax statistics
in float32, rotate-half RoPE with float32 cos/sin, GQA, SwiGLU MLP.

TPU-first design choices (vs. the torch reference):
  * Parameters are a plain pytree with all decoder layers **stacked on a
    leading axis** and the forward pass is a single `lax.scan` — one compiled
    layer body regardless of depth, natural target for remat and GSPMD
    sharding rules.
  * The KV cache is an explicit functional value (donated between decode
    steps), storing a per-slot validity mask so left-padded batched decode
    needs no attention-mask plumbing.
  * Packed training sequences use segment-ids masking instead of varlen
    unpadding (reference: llava/model/utils/packing.py).
"""

from __future__ import annotations

import dataclasses

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vila_tpu.ops.attention import multi_head_attention
from vila_tpu.ops.norms import rms_norm
from vila_tpu.ops.rope import apply_rope, rope_cos_sin

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 151936
    hidden_size: int = 1536
    intermediate_size: int = 8960
    num_hidden_layers: int = 28
    num_attention_heads: int = 12
    num_key_value_heads: int = 2
    head_dim: Optional[int] = None
    rope_theta: float = 1e6
    rope_linear_scaling: float = 1.0  # context-extension linear RoPE scaling
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    qkv_bias: bool = True  # Qwen2: q/k/v have bias, o_proj does not
    max_position_embeddings: int = 32768
    dtype: str = "float32"  # compute dtype
    # False | True (full recompute, minimum memory) | "dots" (keep matmul
    # outputs resident; recompute only elementwise — higher MFU)
    remat: Any = False
    # COAT-parity FP8 training: decoder matmuls run E4M3 fwd / E5M2 bwd
    # (llava/model/coat/, llava/model/qlinear_te.py:20). ops/fp8.py.
    # False | True/"tensor" (per-tensor scales) | "group" (per-group 128
    # scales, COAT real_quantization recipe).
    fp8_matmul: Any = False

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def from_hf_config(cls, hf: dict, **overrides) -> "LLMConfig":
        """Build from an HF Qwen2/Llama config dict (config.json contents)."""
        rope_scaling = hf.get("rope_scaling") or {}
        linear = 1.0
        if rope_scaling.get("rope_type", rope_scaling.get("type")) == "linear":
            linear = float(rope_scaling.get("factor", 1.0))
        kw = dict(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            num_key_value_heads=hf.get(
                "num_key_value_heads", hf["num_attention_heads"]
            ),
            head_dim=hf.get("head_dim"),
            rope_theta=hf.get("rope_theta", 10000.0),
            rope_linear_scaling=linear,
            rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            qkv_bias=hf.get("model_type", "qwen2") == "qwen2"
            or hf.get("attention_bias", False),
            max_position_embeddings=hf.get("max_position_embeddings", 32768),
        )
        kw.update(overrides)
        return cls(**kw)


# --------------------------------------------------------------------------
# Parameter init
# --------------------------------------------------------------------------


def init_params(
    rng: jax.Array, cfg: LLMConfig, param_dtype=jnp.float32
) -> Params:
    """Random-init parameters (normal(0.02) like HF), layers stacked on axis 0."""
    L = cfg.num_hidden_layers
    D = cfg.hidden_size
    I = cfg.intermediate_size
    hd = cfg.head_dim_
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads

    keys = iter(jax.random.split(rng, 16))

    def dense(key, shape):
        return (0.02 * jax.random.normal(key, shape, jnp.float32)).astype(param_dtype)

    layers = {
        "input_layernorm": {"scale": jnp.ones((L, D), param_dtype)},
        "q_proj": {"kernel": dense(next(keys), (L, D, Hq * hd))},
        "k_proj": {"kernel": dense(next(keys), (L, D, Hkv * hd))},
        "v_proj": {"kernel": dense(next(keys), (L, D, Hkv * hd))},
        "o_proj": {"kernel": dense(next(keys), (L, Hq * hd, D))},
        "post_attention_layernorm": {"scale": jnp.ones((L, D), param_dtype)},
        "gate_proj": {"kernel": dense(next(keys), (L, D, I))},
        "up_proj": {"kernel": dense(next(keys), (L, D, I))},
        "down_proj": {"kernel": dense(next(keys), (L, I, D))},
    }
    if cfg.qkv_bias:
        layers["q_proj"]["bias"] = jnp.zeros((L, Hq * hd), param_dtype)
        layers["k_proj"]["bias"] = jnp.zeros((L, Hkv * hd), param_dtype)
        layers["v_proj"]["bias"] = jnp.zeros((L, Hkv * hd), param_dtype)

    params: Params = {
        "embed_tokens": {"embedding": dense(next(keys), (cfg.vocab_size, D))},
        "layers": layers,
        "norm": {"scale": jnp.ones((D,), param_dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": dense(next(keys), (D, cfg.vocab_size))}
    return params


# --------------------------------------------------------------------------
# KV cache
# --------------------------------------------------------------------------


def init_cache(
    cfg: LLMConfig, batch: int, max_len: int, dtype=None,
    per_slot_fill: bool = False,
) -> Params:
    """Pre-allocated decode cache. `valid` marks written, non-padding slots.

    With ``per_slot_fill`` the write cursor is a per-row vector ``(B,)``
    instead of a shared scalar: each batch row advances independently, which
    is what the continuous-batching scheduler (`serving/batcher.py`) needs —
    rows hold different requests at different depths.
    """
    dtype = dtype or cfg.compute_dtype
    L = cfg.num_hidden_layers
    # KV stored FLAT (heads*head_dim fused) so the decode megakernel can DMA
    # a layer's KV as one contiguous (S, Hkv*hd) block straight out of the
    # cache — a (.., Hkv, hd) layout gets transposed by XLA (S into
    # sublanes) and any reshape back costs a full-cache relayout.
    shape = (
        L, batch, max_len, cfg.num_key_value_heads * cfg.head_dim_,
    )
    fill_shape = (batch,) if per_slot_fill else ()
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "valid": jnp.zeros((batch, max_len), jnp.bool_),
        "fill": jnp.zeros(fill_shape, jnp.int32),
    }


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def _linear(x, p, dtype, fp8: bool = False):
    if "packed" in p:  # W4A16/W8A16 slot (ops/quant.py)
        from vila_tpu.ops.quant import quantized_linear

        return quantized_linear(x, p, dtype)
    if fp8:  # COAT-style FP8 training path (ops/fp8.py)
        if fp8 == "group":
            from vila_tpu.ops.fp8 import fp8_linear_grouped as fp8_fn
        else:
            from vila_tpu.ops.fp8 import fp8_linear as fp8_fn

        y = fp8_fn(x, p["kernel"].astype(dtype))
        if "bias" in p:
            y = y + p["bias"].astype(dtype)
        return y
    y = jnp.dot(x, p["kernel"].astype(dtype))
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def w4_matmul_stacked_dispatch(x2, packed, scales, layer_index,
                               scale_planes=None):
    """Stacked quantized matmul: decode kernel for tiny m; prefill kernel
    otherwise. `scale_planes` is the hoisted (s_lo5, s_hi5) pair from
    quant.prefill_scale_planes — compute it OUTSIDE the layer scan (the
    slice+reshape copies the whole stacked scale tensor per call)."""
    from vila_tpu.ops.quant import w4_matmul_decode, w4_matmul_prefill

    if x2.shape[0] <= 32:
        return w4_matmul_decode(x2, packed, scales, layer_index=layer_index)
    return w4_matmul_prefill(
        x2, packed, scales, layer_index=layer_index,
        scale_planes=scale_planes,
    )


def forward(
    params: Params,
    cfg: LLMConfig,
    *,
    input_ids: Optional[jnp.ndarray] = None,  # (B, S)
    inputs_embeds: Optional[jnp.ndarray] = None,  # (B, S, D)
    positions: Optional[jnp.ndarray] = None,  # (B, S) RoPE positions
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S) packing segments
    token_valid: Optional[jnp.ndarray] = None,  # (B, S) False for padding
    cache: Optional[Params] = None,
    last_token_only: bool = False,
    gather_position: Optional[jnp.ndarray] = None,  # (B,) per-sample index
    return_hidden: bool = False,
    attn_impl: str = "auto",
    sp: Optional[Any] = None,  # parallel.sp.SPConfig: MM-SP attention
    cache_append: Optional[Any] = None,  # deferred sharded-cache append hook
) -> Tuple[jnp.ndarray, Optional[Params]]:
    """Run the decoder. Returns (logits_or_hidden, updated_cache).

    With `cache`, the S new tokens are written at slots [fill, fill+S) and
    attend to every previously-valid slot plus themselves (causally).
    A vector `fill` (see `init_cache(per_slot_fill=True)`) writes each row
    at its own cursor — the continuous-batching decode path.
    Without `cache`, standard causal (optionally packed) attention.

    With `cache_append` (requires `cache`, scalar fill, and a callable
    `attn_impl`), the layer scan never WRITES the cache: a
    `dynamic_update_slice` at a dynamic `fill` into a sequence-SHARDED
    cache makes GSPMD all-gather the full cache per layer (30 GB at the
    8B/1M shape — measured by the real TPU compiler, scripts/
    longctx_onchip.py). Instead each layer (a) attends over the read-only
    old cache via `attn_impl` — which receives the chunk's freshly
    projected `new_k`/`new_v` to LSE-merge intra-chunk attention — and
    (b) emits its new KV rows as scan outputs; after the scan ONE
    `cache_append(k, v, valid, k_new, v_new, token_valid, fill)` call
    (e.g. a shard_map local update, inference/long_context.py) writes all
    L layers' rows into the sharded buffers with no collectives.

    With `sp` (an active `vila_tpu.parallel.sp.SPConfig`), the cache-free
    attention runs sequence-parallel — ring/Ulysses/hybrid under shard_map
    over the mesh — the TPU equivalent of the reference's monkey-patched
    MM-SP attention (train/sequence_parallel/monkey_patch.py:133-239).
    Inputs must already be laid out for the configured ring layout
    (`parallel.sp.zigzag_batch` for zigzag).
    """
    dtype = cfg.compute_dtype
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(params, cfg, input_ids)
    h = inputs_embeds.astype(dtype)
    b, s, _ = h.shape

    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
        if cache is not None:
            f = cache["fill"]
            positions = positions + (f[:, None] if f.ndim else f)

    cos, sin = rope_cos_sin(
        positions, cfg.head_dim_, cfg.rope_theta, cfg.rope_linear_scaling
    )

    deferred = cache_append is not None
    if deferred:
        assert cache is not None and callable(attn_impl), (
            "cache_append requires a cache and a callable attn_impl"
        )
        assert cache["fill"].ndim == 0, (
            "deferred append supports scalar fill only"
        )

    new_valid = None
    q_slots = kv_slots = kv_seg = q_seg = None
    write_rows = None  # (b, s) per-row write indices when fill is a vector
    if cache is not None:
        fill = cache["fill"]
        max_len = cache["k"].shape[2]
        if token_valid is None:
            token_valid = jnp.ones((b, s), jnp.bool_)
        if fill.ndim:  # per-slot fill (continuous batching)
            write_rows = fill[:, None] + jnp.arange(s, dtype=jnp.int32)[None]
            new_valid = cache["valid"].at[
                jnp.arange(b)[:, None], write_rows
            ].set(token_valid, mode="drop")
            q_slots = write_rows
        else:
            if deferred:
                # the hook updates `valid` locally per shard; a DUS here
                # would all-gather the sharded (B, S) slab every step
                new_valid = None
            else:
                new_valid = jax.lax.dynamic_update_slice(
                    cache["valid"], token_valid, (0, fill)
                )
            # Mask by slot index (writes are sequential) + slot validity.
            q_slots = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32), (b, s)
            ) + fill
        kv_slots = jnp.broadcast_to(
            jnp.arange(max_len, dtype=jnp.int32), (b, max_len)
        )
        # Deferred mode attends old rows via the cache (pre-append valid)
        # and the current chunk via new_k/new_v passed to the hook.
        kv_seg = (
            cache["valid"] if deferred else new_valid
        ).astype(jnp.int32)
        q_seg = jnp.ones((b, s), jnp.int32)

    fp8 = cfg.fp8_matmul
    nq = cfg.num_attention_heads * cfg.head_dim_
    nkv = cfg.num_key_value_heads * cfg.head_dim_

    # Stacked-quantized weights (L, nj, half, bout) must NOT be sliced by
    # lax.scan — the per-layer slice materializes a copy and halves HBM
    # bandwidth. They stay whole; the kernel selects the layer via a
    # scalar-prefetch index (ops/quant.py w4_matmul_decode stacked form).
    all_layers = params["layers"]
    q_stacked = {
        name: slot
        for name, slot in all_layers.items()
        if isinstance(slot, dict)
        and "packed" in slot
        and slot["packed"].ndim == 4
    }
    sliced_layers = {
        name: (
            {k: v for k, v in slot.items() if k not in ("packed", "scales")}
            if name in q_stacked
            else slot
        )
        for name, slot in all_layers.items()
    }

    # Prefill-sized calls use the prefill kernel, whose stacked form wants
    # kernel-ready 5D scale planes. Compute them HERE — outside the layer
    # scan — once per forward; inside the scan body the slice+reshape
    # copies the whole stacked scale tensor per layer (~0.47 ms/layer,
    # ~13 ms per 8B prefill, measured on v5e).
    q_planes = {}
    if b * s > 32 and q_stacked:
        from vila_tpu.ops.quant import prefill_scale_planes

        q_planes = {
            name: prefill_scale_planes(slot["packed"], slot["scales"])
            for name, slot in q_stacked.items()
        }

    def _qlinear_stacked(x2, name, lp, l):
        slot = q_stacked[name]
        lead = x2.shape[:-1]
        m = 1
        for v in lead:
            m *= v
        y = w4_matmul_stacked_dispatch(
            x2.reshape(m, x2.shape[-1]).astype(jnp.bfloat16),
            slot["packed"], slot["scales"], l,
            scale_planes=q_planes.get(name),
        ).astype(dtype)
        y = y.reshape(*lead, y.shape[-1])
        if "bias" in lp[name]:
            y = y + lp[name]["bias"].astype(dtype)
        return y

    def lin(x, name, lp, l):
        if name in q_stacked:
            return _qlinear_stacked(x, name, lp, l)
        return _linear(x, lp[name], dtype, fp8)

    def _attend(q, k, v, ck_all, cv_all, l):
        """RoPE + cache update + attention; shared by the plain and fused
        layer bodies. q/k/v: (b, s, H*hd) flat projections."""
        q = q.reshape(b, s, cfg.num_attention_heads, cfg.head_dim_)
        k = k.reshape(b, s, cfg.num_key_value_heads, cfg.head_dim_)
        v = v.reshape(b, s, cfg.num_key_value_heads, cfg.head_dim_)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if cache is not None and deferred:
            # Read-only old-cache attention; the hook folds in the chunk's
            # own rows (replicated, small) with an LSE merge. New rows are
            # returned for the post-scan cache_append.
            kf = k.reshape(b, s, -1)
            vf = v.reshape(b, s, -1)
            ck = jax.lax.dynamic_index_in_dim(ck_all, l, 0, keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(cv_all, l, 0, keepdims=False)
            max_len = ck.shape[1]
            ck = ck.reshape(
                b, max_len, cfg.num_key_value_heads, cfg.head_dim_
            )
            cv = cv.reshape(
                b, max_len, cfg.num_key_value_heads, cfg.head_dim_
            )
            attn = attn_impl(
                q, ck.astype(dtype), cv.astype(dtype),
                causal=True,
                q_positions=q_slots,
                kv_positions=kv_slots,
                q_segment_ids=q_seg,
                kv_segment_ids=kv_seg,
                new_k=k.astype(dtype),
                new_v=v.astype(dtype),
                new_kv_positions=q_slots,
                new_kv_seg=token_valid.astype(jnp.int32),
            )
            attn = attn.reshape(
                b, s, cfg.num_attention_heads * cfg.head_dim_
            )
            return attn, ck_all, cv_all, (kf, vf)

        if cache is not None:
            fill = cache["fill"]
            kf = k.reshape(b, s, -1)  # flat (b, s, Hkv*hd) cache rows
            vf = v.reshape(b, s, -1)
            # Read the layer's slice FIRST, then write the tiny s-token
            # update into the carried buffer: read-old-then-update lets XLA
            # keep the (L, ...) cache update in place. (Write-then-slice
            # forces a full-cache copy per layer — ~3 ms/step on the 8B
            # shape.)
            ck = jax.lax.dynamic_index_in_dim(ck_all, l, 0, keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(cv_all, l, 0, keepdims=False)
            if write_rows is not None:
                rows = jnp.arange(b)[:, None]
                rr = jnp.broadcast_to(rows, (b, s))
                l_idx = jnp.broadcast_to(l, (b, s))
                ck = ck.at[rr, write_rows].set(
                    kf.astype(ck.dtype), mode="drop"
                )
                cv = cv.at[rr, write_rows].set(
                    vf.astype(cv.dtype), mode="drop"
                )
                ck_all = ck_all.at[l_idx, rr, write_rows].set(
                    kf.astype(ck_all.dtype), mode="drop"
                )
                cv_all = cv_all.at[l_idx, rr, write_rows].set(
                    vf.astype(cv_all.dtype), mode="drop"
                )
            else:
                ck = jax.lax.dynamic_update_slice(
                    ck, kf.astype(ck.dtype), (0, fill, 0)
                )
                cv = jax.lax.dynamic_update_slice(
                    cv, vf.astype(cv.dtype), (0, fill, 0)
                )
                ck_all = jax.lax.dynamic_update_slice(
                    ck_all, kf.astype(ck_all.dtype)[None],
                    (l, 0, fill, 0),
                )
                cv_all = jax.lax.dynamic_update_slice(
                    cv_all, vf.astype(cv_all.dtype)[None],
                    (l, 0, fill, 0),
                )
            max_len = ck.shape[1]
            ck = ck.reshape(
                b, max_len, cfg.num_key_value_heads, cfg.head_dim_
            )
            cv = cv.reshape(
                b, max_len, cfg.num_key_value_heads, cfg.head_dim_
            )
            # attn_impl may be a CALLABLE with multi_head_attention's
            # signature (minus impl) — e.g. the long-context engine's
            # shard_map local-attention + LSE-merge over a seq-sharded
            # cache (inference/long_context.py)
            attend_fn = (
                attn_impl
                if callable(attn_impl)
                else functools.partial(multi_head_attention, impl=attn_impl)
            )
            attn = attend_fn(
                q, ck.astype(dtype), cv.astype(dtype),
                causal=True,
                q_positions=q_slots,
                kv_positions=kv_slots,
                q_segment_ids=q_seg,
                kv_segment_ids=kv_seg,
            )
        elif sp is not None and sp.active:
            from vila_tpu.parallel.sp import sp_attention

            attn = sp_attention(
                q, k, v, sp, causal=True, segment_ids=segment_ids
            )
        else:
            attn = multi_head_attention(
                q, k, v,
                causal=True,
                q_segment_ids=segment_ids,
                kv_segment_ids=segment_ids,
                impl=attn_impl,
            )

        attn = attn.reshape(b, s, cfg.num_attention_heads * cfg.head_dim_)
        return attn, ck_all, cv_all, None

    def layer_fn(carry, xs):
        # Decode: the FULL (L, ...) KV cache rides the scan carry and is
        # updated in place (donated loop buffer). Passing per-layer cache
        # through xs/ys instead makes XLA stack fresh ys and copy the
        # whole cache every step — profiled at ~0.75 ms/step on v5e for
        # the 8B shape (2× full-cache copies + per-layer update copies).
        h, ck_all, cv_all = carry
        l, lp = xs
        x = rms_norm(h, lp["input_layernorm"]["scale"], cfg.rms_norm_eps)
        if "qkv_proj" in lp:
            # fused projection (quantized decode path): one wide matmul
            qkv = lin(x, "qkv_proj", lp, l)
            q, k, v = (
                qkv[..., :nq],
                qkv[..., nq : nq + nkv],
                qkv[..., nq + nkv :],
            )
        else:
            q = lin(x, "q_proj", lp, l)
            k = lin(x, "k_proj", lp, l)
            v = lin(x, "v_proj", lp, l)
        attn, ck_all, cv_all, newkv = _attend(q, k, v, ck_all, cv_all, l)
        h = h + lin(_pad_attn(attn), "o_proj", lp, l)

        x = rms_norm(h, lp["post_attention_layernorm"]["scale"], cfg.rms_norm_eps)
        if "gate_up_proj" in lp:
            gu = lin(x, "gate_up_proj", lp, l)
            gate, up = gu[..., : cfg.intermediate_size], gu[..., cfg.intermediate_size :]
        else:
            gate = lin(x, "gate_proj", lp, l)
            up = lin(x, "up_proj", lp, l)
        h = h + lin(jax.nn.silu(gate) * up, "down_proj", lp, l)
        return (h, ck_all, cv_all), (newkv if deferred else None)

    def fused_layer_fn(carry, l):
        # Fused-kernel decode body (ops/fused_decode.py): the scan carries
        # the CURRENT layer's qkv projection, produced by the previous
        # layer's fused_down_qkv kernel, so each body is attention ->
        # [o+norm+gate_up] -> [down+norm+qkv_{l+1}] — two long weight
        # streams whose DMAs are all issued at kernel entry.
        from vila_tpu.ops import fused_decode

        h, qkv_flat, ck_all, cv_all = carry
        qkv = qkv_flat.reshape(b, s, -1).astype(dtype)
        q, k, v = (
            qkv[..., :nq],
            qkv[..., nq : nq + nkv],
            qkv[..., nq + nkv :],
        )
        attn, ck_all, cv_all, _newkv = _attend(q, k, v, ck_all, cv_all, l)
        h2, gu = fused_decode.fused_o_gateup(
            _pad_attn(attn).reshape(b * s, -1).astype(jnp.bfloat16),
            h.reshape(b * s, -1),
            l,
            q_stacked["o_proj"],
            q_stacked["gate_up_proj"],
            all_layers["post_attention_layernorm"]["scale"],
            eps=cfg.rms_norm_eps,
        )
        h2, qkv_next = fused_decode.fused_down_qkv(
            gu, h2, l,
            q_stacked["down_proj"],
            q_stacked["qkv_proj"],
            all_layers["input_layernorm"]["scale"],
            eps=cfg.rms_norm_eps,
        )
        return (h2.reshape(b, s, -1).astype(dtype), qkv_next,
                ck_all, cv_all), None

    use_fused = (
        cache is not None
        and not deferred
        and s == 1
        and b * s <= 32
        and {"qkv_proj", "o_proj", "gate_up_proj", "down_proj"}
        <= set(q_stacked)
        and all_layers["input_layernorm"]["scale"].ndim == 2
        and not os.environ.get("VILA_TPU_NO_FUSED_DECODE")
    )

    # Megakernel path: the whole layer (attention + 4 weight streams) in one
    # Pallas call (ops/fused_decode.py:fused_layer). Needs the GQA-padded
    # o_proj layout (quant.pad_o_heads), bs=1, and lane-aligned head_dim.
    grp = cfg.num_attention_heads // max(cfg.num_key_value_heads, 1)
    grp_pad = ((grp + 7) // 8) * 8
    o_din = (
        2 * q_stacked["o_proj"]["packed"].shape[-2]
        if "o_proj" in q_stacked else None
    )
    padded_o = (
        o_din == cfg.num_key_value_heads * grp_pad * cfg.head_dim_
        and grp_pad != grp
    )
    use_mega = (
        use_fused
        and b == 1
        and padded_o
        and (cfg.head_dim_ % 128 == 0 or jax.default_backend() != "tpu")
        and not os.environ.get("VILA_TPU_NO_MEGA_DECODE")
    )
    # Batched megakernel (fused_decode.fused_layer_batched): whole layer in
    # one Pallas call for 1 < bs <= 16 — the continuous-batching decode step.
    use_mega_b = (
        use_fused
        and 1 < b <= 16
        and padded_o
        and grp_pad == 8
        and (cfg.head_dim_ % 128 == 0 or jax.default_backend() != "tpu")
        and not os.environ.get("VILA_TPU_NO_MEGA_DECODE")
        and not os.environ.get("VILA_TPU_NO_MEGA_BATCHED")
    )

    def _pad_attn(attn):
        """(b, s, nq) -> (b, s, o_din): zero lanes for the GQA group pad
        (matches quant.pad_o_heads' zero weight rows)."""
        if not padded_o:
            return attn
        a = attn.reshape(
            b, s, cfg.num_key_value_heads, grp, cfg.head_dim_
        )
        a = jnp.pad(
            a, ((0, 0), (0, 0), (0, 0), (0, grp_pad - grp), (0, 0))
        )
        return a.reshape(b, s, -1)

    def mega_layer_fn(carry, l):
        from vila_tpu.ops import fused_decode

        h8, qkv8, ck_all, cv_all = carry
        qkv = qkv8[0:1][:, None, :].astype(dtype)  # (1, 1, dqkv)
        q = qkv[..., :nq].reshape(1, 1, cfg.num_attention_heads,
                                  cfg.head_dim_)
        k = qkv[..., nq: nq + nkv].reshape(1, 1, cfg.num_key_value_heads,
                                           cfg.head_dim_)
        v = qkv[..., nq + nkv:].reshape(1, 1, cfg.num_key_value_heads,
                                        cfg.head_dim_)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        fill = cache["fill"]
        ck_all = jax.lax.dynamic_update_slice(
            ck_all, k.reshape(1, 1, -1).astype(ck_all.dtype)[None],
            (l, 0, fill, 0),
        )
        cv_all = jax.lax.dynamic_update_slice(
            cv_all, v.reshape(1, 1, -1).astype(cv_all.dtype)[None],
            (l, 0, fill, 0),
        )
        scale = cfg.head_dim_ ** -0.5
        q32 = (q[0, 0].astype(jnp.float32) * scale).reshape(
            cfg.num_key_value_heads, grp, cfg.head_dim_
        )
        q32 = jnp.pad(
            q32, ((0, 0), (0, grp_pad - grp), (0, 0))
        ).reshape(cfg.num_key_value_heads * grp_pad, cfg.head_dim_)
        h8, qkv8 = fused_decode.fused_layer(
            q32.astype(jnp.bfloat16), mega_mask, h8, l,
            ck_all, cv_all,
            q_stacked["o_proj"], q_stacked["gate_up_proj"],
            q_stacked["down_proj"], q_stacked["qkv_proj"],
            all_layers["post_attention_layernorm"]["scale"],
            all_layers["input_layernorm"]["scale"],
            hkv=cfg.num_key_value_heads, hd=cfg.head_dim_,
            eps=cfg.rms_norm_eps,
            fill=fill,  # KV DMA streams only the live cache prefix
        )
        return (h8, qkv8.astype(jnp.bfloat16), ck_all, cv_all), None

    def mega_b_layer_fn(carry, l):
        from vila_tpu.ops import fused_decode

        hb, qkvb, ck_all, cv_all = carry  # hb (b, D), qkvb (b, dqkv)
        qkv = qkvb[:, None, :].astype(dtype)  # (b, 1, dqkv)
        q = qkv[..., :nq].reshape(b, 1, cfg.num_attention_heads,
                                  cfg.head_dim_)
        k = qkv[..., nq: nq + nkv].reshape(b, 1, cfg.num_key_value_heads,
                                           cfg.head_dim_)
        v = qkv[..., nq + nkv:].reshape(b, 1, cfg.num_key_value_heads,
                                        cfg.head_dim_)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kf = k.reshape(b, 1, -1)
        vf = v.reshape(b, 1, -1)
        fill = cache["fill"]
        if write_rows is not None:  # per-slot fill (continuous batching)
            rr = jnp.broadcast_to(jnp.arange(b)[:, None], (b, 1))
            l_idx = jnp.broadcast_to(l, (b, 1))
            ck_all = ck_all.at[l_idx, rr, write_rows].set(
                kf.astype(ck_all.dtype), mode="drop"
            )
            cv_all = cv_all.at[l_idx, rr, write_rows].set(
                vf.astype(cv_all.dtype), mode="drop"
            )
            last_written = write_rows[:, 0]
        else:
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, kf.astype(ck_all.dtype)[None], (l, 0, fill, 0)
            )
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, vf.astype(cv_all.dtype)[None], (l, 0, fill, 0)
            )
            last_written = fill
        scale = cfg.head_dim_ ** -0.5
        q32 = (q[:, 0].astype(jnp.float32) * scale).reshape(
            b, cfg.num_key_value_heads, grp, cfg.head_dim_
        )
        q32 = jnp.pad(
            q32, ((0, 0), (0, 0), (0, grp_pad - grp), (0, 0))
        ).reshape(b, cfg.num_key_value_heads * grp_pad, cfg.head_dim_)
        hb, qkvb = fused_decode.fused_layer_batched(
            q32.astype(jnp.bfloat16), mega_mask_b, hb, l,
            ck_all, cv_all,
            q_stacked["o_proj"], q_stacked["gate_up_proj"],
            q_stacked["down_proj"], q_stacked["qkv_proj"],
            all_layers["post_attention_layernorm"]["scale"],
            all_layers["input_layernorm"]["scale"],
            hkv=cfg.num_key_value_heads, hd=cfg.head_dim_,
            eps=cfg.rms_norm_eps,
            fill=last_written,  # per-row live-prefix KV streaming
        )
        return (hb, qkvb.astype(jnp.bfloat16), ck_all, cv_all), None

    body = layer_fn
    if cfg.remat:
        # remat=True -> full recompute (minimum memory). remat="dots" keeps
        # matmul outputs resident so the backward re-runs only elementwise
        # work — per-layer residency rises by the dot activations
        # (~S*(2*inter+3*D) bf16), bought back as MFU (the recompute
        # forward disappears from the critical path).
        policy = (
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if cfg.remat == "dots"
            else jax.checkpoint_policies.nothing_saveable
        )
        body = jax.checkpoint(layer_fn, policy=policy)

    L = cfg.num_hidden_layers
    layer_ids = jnp.arange(L, dtype=jnp.int32)
    if use_fused:
        # Layer 0's qkv is produced outside the scan; layer l's body then
        # emits layer l+1's.
        x0 = rms_norm(
            h, all_layers["input_layernorm"]["scale"][0], cfg.rms_norm_eps
        )
        qkv0 = _qlinear_stacked(
            x0, "qkv_proj", {"qkv_proj": {}}, jnp.zeros((), jnp.int32)
        )
        qslot = q_stacked["qkv_proj"]
        if "bias" in qslot:
            qkv0 = qkv0 + qslot["bias"][0].astype(dtype)
        if use_mega:
            mega_mask = jnp.where(
                new_valid[0], 0.0, -1e30
            )[None, :].astype(jnp.float32)
            d_model = h.shape[-1]
            h8 = jnp.broadcast_to(h.reshape(1, d_model), (8, d_model))
            qkv8 = jnp.broadcast_to(
                qkv0.reshape(1, -1).astype(jnp.bfloat16),
                (8, qkv0.shape[-1]),
            )
            carry0 = (h8, qkv8, cache["k"], cache["v"])
            (h8, _, new_k, new_v), _ = jax.lax.scan(
                mega_layer_fn, carry0, layer_ids
            )
            h = h8[0:1].reshape(1, 1, d_model).astype(dtype)
        elif use_mega_b:
            mega_mask_b = jnp.where(
                new_valid, 0.0, -1e30
            ).astype(jnp.float32)  # (b, S)
            d_model = h.shape[-1]
            carry0 = (
                h.reshape(b, d_model),
                qkv0.reshape(b, -1).astype(jnp.bfloat16),
                cache["k"], cache["v"],
            )
            (hb, _, new_k, new_v), _ = jax.lax.scan(
                mega_b_layer_fn, carry0, layer_ids
            )
            h = hb.reshape(b, 1, d_model).astype(dtype)
        else:
            carry0 = (
                h, qkv0.reshape(b * s, -1).astype(jnp.bfloat16),
                cache["k"], cache["v"],
            )
            (h, _, new_k, new_v), _ = jax.lax.scan(
                fused_layer_fn, carry0, layer_ids
            )
    else:
        xs = (layer_ids, sliced_layers)
        if cache is not None:
            carry0 = (h, cache["k"], cache["v"])
        else:
            dummy = jnp.zeros((0,), dtype)
            carry0 = (h, dummy, dummy)

        (h, new_k, new_v), layer_ys = jax.lax.scan(body, carry0, xs)

    new_cache = None
    if cache is not None:
        if deferred:
            # (L, b, s, Hkv*hd) stacked new rows -> one local sharded write
            k_rows, v_rows = layer_ys
            new_k, new_v, new_valid = cache_append(
                cache["k"], cache["v"], cache["valid"],
                k_rows, v_rows, token_valid, cache["fill"],
            )
        new_cache = {
            "k": new_k,
            "v": new_v,
            "valid": new_valid,
            "fill": cache["fill"] + s,
        }

    h = rms_norm(h, params["norm"]["scale"], cfg.rms_norm_eps)
    if gather_position is not None:
        # Right-padded prefill: keep each sample's last real token only,
        # so the vocab projection runs on (B, 1) not (B, S).
        h = h[jnp.arange(b), gather_position][:, None]
    elif last_token_only:
        h = h[:, -1:]
    if return_hidden:
        return h, new_cache
    return compute_logits(params, cfg, h), new_cache


def embed_tokens(params: Params, cfg: LLMConfig, input_ids: jnp.ndarray):
    return params["embed_tokens"]["embedding"].astype(cfg.compute_dtype)[
        input_ids
    ]


def compute_logits(params: Params, cfg: LLMConfig, hidden: jnp.ndarray):
    if cfg.tie_word_embeddings:
        w = params["embed_tokens"]["embedding"].T
    elif "packed" in params["lm_head"]:
        from vila_tpu.ops.quant import quantized_linear

        return quantized_linear(
            hidden, params["lm_head"], cfg.compute_dtype
        ).astype(jnp.float32)
    else:
        w = params["lm_head"]["kernel"]
    return jnp.dot(
        hidden,
        w.astype(cfg.compute_dtype),
        preferred_element_type=jnp.float32,
    )
