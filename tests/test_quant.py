"""W4 quantization kernels (tiled layout): pack/unpack roundtrip, fused
matmul vs dequantized reference (decode + prefill shapes), fused-projection
model forward."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vila_tpu.ops import quant


def make_qw(rng, din, dout, g=128):
    w = jnp.asarray(rng.normal(size=(din, dout)).astype(np.float32) * 0.02)
    return w, quant.quantize_w4(w, group_size=g)


def test_quantize_dequantize_roundtrip():
    rng = np.random.default_rng(0)
    w, q = make_qw(rng, 512, 256)
    w_hat = quant.dequantize(q)
    err = float(jnp.abs(w_hat.astype(jnp.float32) - w).max())
    amax = float(jnp.abs(w).max())
    assert err < amax / 6


def test_pick_bout_no_padding():
    assert quant.pick_bout(3584, 18944) in (512, 18944 // 37)
    # always divides
    for din, dout in ((3584, 4608), (18944, 3584), (3584, 152064)):
        b = quant.pick_bout(din, dout)
        assert dout % b == 0 and b % 128 == 0
        assert (din // 2) * b <= quant._VMEM_BLOCK_BUDGET


@pytest.mark.parametrize("m", [1, 3, 8])
@pytest.mark.parametrize("digits", [1, 2])
def test_w4_decode_matmul_matches_dequant(m, digits):
    rng = np.random.default_rng(1)
    din, dout = 512, 256
    w, q = make_qw(rng, din, dout)
    x = jnp.asarray(rng.normal(size=(m, din)).astype(np.float32))
    ref = x @ quant.dequantize(q).astype(jnp.float32)
    got = quant.w4_matmul_decode(
        x.astype(jnp.bfloat16), q["packed"], q["scales"], act_digits=digits
    )
    tol = 0.06 if digits == 1 else 0.03
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), rtol=tol, atol=tol
    )


@pytest.mark.parametrize("m", [64, 200])
def test_w4_prefill_matmul_matches_dequant(m):
    rng = np.random.default_rng(2)
    din, dout = 512, 256
    w, q = make_qw(rng, din, dout)
    x = jnp.asarray(rng.normal(size=(m, din)).astype(np.float32))
    ref = x @ quant.dequantize(q).astype(jnp.float32)
    got = quant.w4_matmul_prefill(
        x.astype(jnp.bfloat16), q["packed"], q["scales"], block_m=64
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )


def test_quantized_linear_dispatch():
    rng = np.random.default_rng(3)
    din, dout = 256, 128
    w, q = make_qw(rng, din, dout)
    p = {"packed": q["packed"], "scales": q["scales"]}
    for m in (1, 64):
        x = jnp.asarray(rng.normal(size=(m, din)).astype(np.float32))
        ref = x @ quant.dequantize(q).astype(jnp.float32)
        got = quant.quantized_linear(x, p, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0.05, atol=0.05
        )


@pytest.mark.parametrize("fuse", [False, True])
@pytest.mark.slow
def test_quantize_llm_params_forward(fuse):
    """End-to-end: a quantized tiny LLM decodes tokens close to bf16,
    with and without fused qkv/gate_up projections."""
    from vila_tpu.models import qwen2

    cfg = qwen2.LLMConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32", tie_word_embeddings=True,
    )
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_llm_params(params, group_size=128, fuse=fuse)
    if fuse:
        assert "qkv_proj" in qparams["layers"]
        assert "gate_up_proj" in qparams["layers"]
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 128, (1, 16)), jnp.int32
    )
    ref, _ = qwen2.forward(params, cfg, input_ids=ids)
    got, _ = qwen2.forward(qparams, cfg, input_ids=ids)
    agree = np.mean(
        np.asarray(ref).argmax(-1) == np.asarray(got).argmax(-1)
    )
    assert agree > 0.8, agree


def test_fused_equals_unfused():
    from vila_tpu.models import qwen2

    cfg = qwen2.LLMConfig(
        vocab_size=64, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    params = qwen2.init_params(jax.random.PRNGKey(1), cfg)
    q_f = quant.quantize_llm_params(params, fuse=True)
    q_u = quant.quantize_llm_params(params, fuse=False)
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, 64, (1, 12)), jnp.int32
    )
    a, _ = qwen2.forward(q_f, cfg, input_ids=ids)
    b, _ = qwen2.forward(q_u, cfg, input_ids=ids)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-2, rtol=0.05
    )


@pytest.mark.slow
def test_fused_decode_kernels_match_per_op_path(monkeypatch):
    """The fused two-stream decode scan (ops/fused_decode.py) reproduces the
    per-op quantized decode path: same cache decode, same greedy tokens,
    logits within quantization-noise tolerance."""
    from vila_tpu.models import qwen2

    cfg = qwen2.LLMConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32", tie_word_embeddings=True,
    )
    params = qwen2.init_params(jax.random.PRNGKey(2), cfg)
    qparams = quant.quantize_llm_params(params, group_size=128, fuse=True)
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(0, 128, (2, 6)), jnp.int32)

    def decode(n_steps):
        cache = qwen2.init_cache(cfg, batch=2, max_len=32)
        logits, cache = qwen2.forward(
            qparams, cfg, input_ids=prompt, cache=cache
        )
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        toks, outs = [tok], []
        for i in range(n_steps):
            pos = jnp.full((2, 1), prompt.shape[1] + i, jnp.int32)
            logits, cache = qwen2.forward(
                qparams, cfg, input_ids=tok[:, None], positions=pos,
                cache=cache,
            )
            outs.append(np.asarray(logits[:, 0]))
            tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            toks.append(np.asarray(tok))
        return np.stack(toks), np.stack(outs)

    monkeypatch.setenv("VILA_TPU_NO_FUSED_DECODE", "1")
    toks_ref, logits_ref = decode(4)
    monkeypatch.delenv("VILA_TPU_NO_FUSED_DECODE")
    toks_fused, logits_fused = decode(4)

    np.testing.assert_array_equal(toks_ref, toks_fused)
    np.testing.assert_allclose(logits_ref, logits_fused, atol=2e-2, rtol=0.05)


@pytest.mark.slow
def test_mega_decode_kernel_matches_per_op_path(monkeypatch):
    """The single-kernel decode layer (fused_decode.fused_layer: attention +
    o + gate_up + down + next-qkv) with the GQA-padded o layout reproduces
    the per-op path (greedy tokens identical, logits close)."""
    from vila_tpu.models import qwen2

    cfg = qwen2.LLMConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32", tie_word_embeddings=True,
    )
    params = qwen2.init_params(jax.random.PRNGKey(3), cfg)
    # cfg enables pad_o_heads: G=2 -> padded to 8 per kv head
    qparams = quant.quantize_llm_params(params, group_size=128, fuse=True,
                                        cfg=cfg)
    o_din = 2 * qparams["layers"]["o_proj"]["packed"].shape[-2]
    assert o_din == cfg.num_key_value_heads * 8 * cfg.head_dim_

    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(0, 128, (1, 5)), jnp.int32)

    def decode(n_steps):
        cache = qwen2.init_cache(cfg, batch=1, max_len=32)
        logits, cache = qwen2.forward(
            qparams, cfg, input_ids=prompt, cache=cache
        )
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        toks, outs = [np.asarray(tok)], []
        for i in range(n_steps):
            pos = jnp.full((1, 1), prompt.shape[1] + i, jnp.int32)
            logits, cache = qwen2.forward(
                qparams, cfg, input_ids=tok[:, None], positions=pos,
                cache=cache,
            )
            outs.append(np.asarray(logits[:, 0]))
            tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            toks.append(np.asarray(tok))
        return np.stack(toks), np.stack(outs)

    monkeypatch.setenv("VILA_TPU_NO_MEGA_DECODE", "1")
    toks_ref, logits_ref = decode(4)
    monkeypatch.delenv("VILA_TPU_NO_MEGA_DECODE")
    toks_mega, logits_mega = decode(4)

    np.testing.assert_array_equal(toks_ref, toks_mega)
    np.testing.assert_allclose(logits_ref, logits_mega, atol=3e-2, rtol=0.05)


def test_padded_o_batch_path(monkeypatch):
    """b>1 decode (continuous batching) with the padded o layout uses the
    A/B fused kernels with zero-padded attention lanes — same results as
    the unpadded layout."""
    from vila_tpu.models import qwen2

    cfg = qwen2.LLMConfig(
        vocab_size=64, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    params = qwen2.init_params(jax.random.PRNGKey(4), cfg)
    q_pad = quant.quantize_llm_params(params, fuse=True, cfg=cfg)
    q_plain = quant.quantize_llm_params(params, fuse=True)
    ids = jnp.asarray(
        np.random.default_rng(4).integers(0, 64, (2, 1)), jnp.int32
    )
    cache_a = qwen2.init_cache(cfg, batch=2, max_len=16)
    cache_b = qwen2.init_cache(cfg, batch=2, max_len=16)
    a, _ = qwen2.forward(q_pad, cfg, input_ids=ids, cache=cache_a)
    b, _ = qwen2.forward(q_plain, cfg, input_ids=ids, cache=cache_b)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-2, rtol=0.05)


# ---------------------------------------------------------------------------
# W8A8 (TinyChat vision recipe: int8 MXU dots, per-channel weight scales)
# ---------------------------------------------------------------------------


def test_w8a8_linear_accuracy():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(7, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 64)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.01)
    slot = quant.quantize_w8a8(w)
    slot["bias"] = b
    got = np.asarray(quant.w8a8_linear(x, slot, jnp.float32))
    ref = np.asarray(x @ w + b)
    # int8 x int8: ~1% relative error on the dot outputs
    denom = np.maximum(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).max() / denom < 0.03
    cos = (got * ref).sum() / (
        np.linalg.norm(got) * np.linalg.norm(ref) + 1e-9
    )
    assert cos > 0.999


def test_w8a8_stacked_slot_shapes():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(3, 32, 48)).astype(np.float32))
    slot = quant.quantize_w8a8(w)
    assert slot["w8"].shape == (3, 32, 48) and slot["w8"].dtype == jnp.int8
    assert slot["w_scale"].shape == (3, 48)


def test_quantize_siglip_w8a8_features_close():
    from vila_tpu.models import siglip

    cfg = siglip.SigLIPConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14,
        dtype="float32",
    )
    params = siglip.init_params(jax.random.PRNGKey(0), cfg)
    pixels = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 56, 56, 3)).astype(
            np.float32
        )
    )
    ref = np.asarray(siglip.forward(params, cfg, pixels))
    q = siglip.quantize_siglip_w8a8(params)
    got = np.asarray(siglip.forward(q, cfg, pixels))
    assert got.shape == ref.shape
    cos = (got * ref).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-9
    )
    assert float(cos.min()) > 0.995, float(cos.min())


def test_quantize_vit_w8a8_features_close():
    """W8A8 on the generic ViT towers (CLIP/InternViT shapes, incl.
    layer-scale + qk-norm extras which must pass through untouched)."""
    from vila_tpu.models import vit

    cfg = vit.ViTConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14,
        layer_scale=True, dtype="float32",
    )
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    pixels = jnp.asarray(
        np.random.default_rng(6).normal(size=(2, 56, 56, 3)).astype(
            np.float32
        )
    )
    ref = np.asarray(vit.forward(params, cfg, pixels))
    got = np.asarray(vit.forward(vit.quantize_vit_w8a8(params), cfg, pixels))
    cos = (got * ref).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-9
    )
    assert float(cos.min()) > 0.995, float(cos.min())


@pytest.mark.slow
def test_batched_mega_decode_matches_per_op_path(monkeypatch):
    """The batched megakernel (fused_decode.fused_layer_batched: per-slot
    attention + all four weight streams in one kernel, rows = batch slots)
    reproduces the per-op path at b=3, including a per-slot-fill cache with
    uneven cursors (the continuous-batching decode step)."""
    from vila_tpu.models import qwen2

    cfg = qwen2.LLMConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32", tie_word_embeddings=True,
    )
    params = qwen2.init_params(jax.random.PRNGKey(5), cfg)
    qparams = quant.quantize_llm_params(params, group_size=128, fuse=True,
                                        cfg=cfg)
    o_din = 2 * qparams["layers"]["o_proj"]["packed"].shape[-2]
    assert o_din == cfg.num_key_value_heads * 8 * cfg.head_dim_

    rng = np.random.default_rng(5)
    B = 3
    prompt = jnp.asarray(rng.integers(0, 128, (B, 5)), jnp.int32)

    def decode(n_steps, per_slot):
        cache = qwen2.init_cache(cfg, batch=B, max_len=32,
                                 per_slot_fill=per_slot)
        if per_slot:
            # uneven prefill: prefill each row separately then merge so the
            # fill cursors differ per slot
            caches = []
            for i in range(B):
                c1 = qwen2.init_cache(cfg, batch=1, max_len=32)
                n = 3 + i
                lg, c1 = qwen2.forward(
                    qparams, cfg, input_ids=prompt[i:i + 1, :n], cache=c1
                )
                caches.append((c1, lg))
            cache = {
                "k": jnp.concatenate([c["k"] for c, _ in caches], axis=1),
                "v": jnp.concatenate([c["v"] for c, _ in caches], axis=1),
                "valid": jnp.concatenate(
                    [c["valid"] for c, _ in caches], axis=0),
                "fill": jnp.asarray([3 + i for i in range(B)], jnp.int32),
            }
            logits = jnp.concatenate([lg[:, -1] for _, lg in caches])
        else:
            logits, cache = qwen2.forward(
                qparams, cfg, input_ids=prompt, cache=cache
            )
            logits = logits[:, -1]
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        toks, outs = [np.asarray(tok)], []
        for i in range(n_steps):
            f = cache["fill"]
            pos = (f[:, None] if f.ndim else
                   jnp.full((B, 1), prompt.shape[1] + i, jnp.int32))
            logits, cache = qwen2.forward(
                qparams, cfg, input_ids=tok[:, None],
                positions=None if f.ndim else pos, cache=cache,
            )
            outs.append(np.asarray(logits[:, 0]))
            tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            toks.append(np.asarray(tok))
        return np.stack(toks), np.stack(outs)

    for per_slot in (False, True):
        monkeypatch.setenv("VILA_TPU_NO_MEGA_BATCHED", "1")
        toks_ref, logits_ref = decode(4, per_slot)
        monkeypatch.delenv("VILA_TPU_NO_MEGA_BATCHED")
        toks_mega, logits_mega = decode(4, per_slot)
        np.testing.assert_array_equal(toks_ref, toks_mega)
        np.testing.assert_allclose(
            logits_ref, logits_mega, atol=3e-2, rtol=0.05
        )


def test_int8_dots_pin_precision_under_ambient_highest():
    """s8xs8 MXU matmuls take no contract precision: an ambient
    jax_default_matmul_precision=highest must not stamp fp32 precision
    onto them (Mosaic rejects it with "Bad lhs type" on real TPU, r5
    measured). The kernels pin Precision.DEFAULT explicitly; assert the
    traced jaxpr keeps it even when the global default says otherwise."""
    def int_dots(jaxpr):
        out = []
        for eq in jaxpr.eqns:
            if eq.primitive.name == "dot_general":
                if any(v.aval.dtype == jnp.int8 for v in eq.invars):
                    out.append(eq.params["precision"])
            for sub in eq.params.values():
                if hasattr(sub, "jaxpr"):
                    out.extend(int_dots(sub.jaxpr))
        return out

    a = jnp.zeros((8, 128), jnp.int8)
    b = jnp.zeros((128, 128), jnp.int8)
    with jax.default_matmul_precision("highest"):
        precs = int_dots(jax.make_jaxpr(quant._d8)(a, b).jaxpr)
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
        p = quant.quantize_w8a8(w)
        x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
        precs += int_dots(
            jax.make_jaxpr(
                lambda x: quant.w8a8_linear(x, p, jnp.float32))(x).jaxpr)
    assert precs, "no int8 dot_general found — kernel layout changed?"
    for pr in precs:
        assert pr != (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST), pr
