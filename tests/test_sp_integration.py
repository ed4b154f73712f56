"""MM-SP integration at the MODEL level: qwen2.forward(..., sp=SPConfig)
must produce the same logits/grads as the single-device forward, for ring
(contiguous + zigzag), Ulysses, and 2D hybrid layouts, on the 8-device
virtual CPU mesh. Mirrors the reference wiring of hybrid attention into
every LLM attention call (train/sequence_parallel/monkey_patch.py:133-239).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vila_tpu.models import qwen2
from vila_tpu.parallel import mesh as mesh_lib
from vila_tpu.parallel.ring_attention import zigzag_order
from vila_tpu.parallel.sp import SPConfig, sp_attention, zigzag_batch


def llm_cfg(**kw):
    kw.setdefault("vocab_size", 128)
    kw.setdefault("hidden_size", 64)
    kw.setdefault("intermediate_size", 128)
    kw.setdefault("num_hidden_layers", 2)
    kw.setdefault("num_attention_heads", 4)
    kw.setdefault("num_key_value_heads", 2)
    return qwen2.LLMConfig(**kw)


S = 64


def _inputs(b=2, s=S, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 120, size=(b, s)).astype(np.int32)
    pos = np.broadcast_to(np.arange(s, dtype=np.int32), (b, s)).copy()
    seg = np.ones((b, s), np.int32)
    seg[:, s // 2 :] = 2  # packed: two segments per row
    return ids, pos, seg


def _reference_logits(params, cfg, ids, pos, seg):
    logits, _ = qwen2.forward(
        params, cfg, input_ids=jnp.asarray(ids),
        positions=jnp.asarray(pos), segment_ids=jnp.asarray(seg),
        attn_impl="xla",
    )
    return np.asarray(logits, np.float32)


MESHES = [
    ("ring8-contig", dict(sp=8), "contiguous"),
    ("ring8-zigzag", dict(sp=8), "zigzag"),
    ("ulysses4-dp2", dict(dp=2, su=4), "contiguous"),
    ("hybrid-2x2-tp2", dict(sp=2, su=2, tp=2), "zigzag"),
]


@pytest.mark.parametrize("name,axes,layout", MESHES, ids=[m[0] for m in MESHES])
def test_model_logit_parity_under_sp(name, axes, layout):
    cfg = llm_cfg()
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    ids, pos, seg = _inputs()
    ref = _reference_logits(params, cfg, ids, pos, seg)

    mesh = mesh_lib.make_mesh(**axes)
    sp = SPConfig(mesh=mesh, ring_layout=layout)
    assert sp.active

    batch = {"input_ids": ids, "positions": pos, "segment_ids": seg}
    batch = zigzag_batch(batch, sp)

    def fwd(p, ids_, pos_, seg_):
        logits, _ = qwen2.forward(
            p, cfg, input_ids=ids_, positions=pos_, segment_ids=seg_,
            attn_impl="xla", sp=sp,
        )
        return logits

    logits = jax.jit(fwd)(
        params,
        jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["positions"]),
        jnp.asarray(batch["segment_ids"]),
    )
    logits = np.asarray(logits, np.float32)
    if sp.layout_for(S) == "zigzag":
        inv = np.empty(S, np.int64)
        inv[zigzag_order(S, sp.ring_degree)] = np.arange(S)
        logits = logits[:, inv]
    np.testing.assert_allclose(logits, ref, rtol=2e-4, atol=2e-4)


def test_grad_parity_under_sp_zigzag():
    """jax.grad through the SP forward == single-device grads."""
    cfg = llm_cfg(num_hidden_layers=1)
    params = qwen2.init_params(jax.random.PRNGKey(1), cfg)
    ids, pos, seg = _inputs(b=1)

    def ref_loss(p):
        logits, _ = qwen2.forward(
            p, cfg, input_ids=jnp.asarray(ids),
            positions=jnp.asarray(pos), segment_ids=jnp.asarray(seg),
            attn_impl="xla",
        )
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    g_ref = jax.grad(ref_loss)(params)

    mesh = mesh_lib.make_mesh(sp=4, su=2)
    sp = SPConfig(mesh=mesh, ring_layout="zigzag")
    order = zigzag_order(S, sp.ring_degree)
    inv = np.empty(S, np.int64)
    inv[order] = np.arange(S)

    def sp_loss(p):
        logits, _ = qwen2.forward(
            p, cfg,
            input_ids=jnp.asarray(ids[:, order]),
            positions=jnp.asarray(pos[:, order]),
            segment_ids=jnp.asarray(seg[:, order]),
            attn_impl="xla", sp=sp,
        )
        return jnp.mean(logits[:, inv].astype(jnp.float32) ** 2)

    g_sp = jax.jit(jax.grad(sp_loss))(params)
    flat_ref, _ = jax.tree.flatten(g_ref)
    flat_sp, _ = jax.tree.flatten(g_sp)
    for a, b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5
        )


def test_sp_attention_head_divisibility_error():
    mesh = mesh_lib.make_mesh(su=8)
    sp = SPConfig(mesh=mesh)
    q = jnp.zeros((1, 64, 4, 8))  # 4 heads, ulysses 8 -> error
    with pytest.raises(ValueError, match="Ulysses degree"):
        sp_attention(q, q[:, :, :2], q[:, :, :2], sp)


def test_train_loss_matches_no_sp():
    """End-to-end: train-step loss under zigzag MM-SP equals the plain
    single-device loss on the same (multimodal, packed) batch."""
    from vila_tpu.models import projector, siglip, vlm
    from vila_tpu.train.step import loss_fn

    cfg = vlm.VLMConfig(
        llm=llm_cfg(),
        vision=siglip.SigLIPConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        projector=projector.ProjectorConfig(
            projector_type="mlp_downsample", mm_hidden_size=32,
            hidden_size=64,
        ),
    )
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    b = 2
    ids, pos, seg = _inputs(b=b, seed=3)
    batch = {
        "input_ids": ids,
        "labels": ids.copy(),
        "positions": pos,
        "segment_ids": seg,
        "pixel_values": rng.integers(
            0, 255, size=(b, 1, 28, 28, 3)
        ).astype(np.uint8),
        "media_positions": np.full((b, 1), 2, np.int32),
    }

    ref_loss, _ = jax.jit(
        lambda p, bt: loss_fn(p, cfg, bt)
    )(params, {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = mesh_lib.make_mesh(dp=2, sp=2, su=2)
    sp = SPConfig(mesh=mesh, ring_layout="zigzag")
    zb = zigzag_batch(batch, sp)
    sp_loss, _ = jax.jit(
        lambda p, bt: loss_fn(p, cfg, bt, sp=sp)
    )(params, {k: jnp.asarray(v) for k, v in zb.items()})

    np.testing.assert_allclose(
        float(sp_loss), float(ref_loss), rtol=2e-5
    )
