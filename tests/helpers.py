"""Shared test fixtures: tiny models, tiny tokenizer (no network access)."""

import numpy as np


def make_tiny_tokenizer(vocab_size=256):
    """Build a small self-contained BPE tokenizer with a ChatML template."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders
    from transformers import PreTrainedTokenizerFast

    # Byte-level BPE with no merges: every byte is a token.
    vocab = {chr(i + 0x100): i for i in range(256)}
    # ByteLevel alphabet mapping: use the canonical byte-level charset.
    from tokenizers import pre_tokenizers as _pt

    alphabet = _pt.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    specials = ["<|endoftext|>", "<|im_start|>", "<|im_end|>"]
    for s in specials:
        vocab[s] = len(vocab)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        eos_token="<|im_end|>",
        pad_token="<|endoftext|>",
        additional_special_tokens=["<|im_start|>"],
    )
    fast.chat_template = (
        "{% for message in messages %}"
        "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] "
        "+ '<|im_end|>' + '\n' }}"
        "{% endfor %}"
        "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}"
        "{% endif %}"
    )
    fast.model_max_length = 4096
    return fast


def make_tiny_vlm_torch(seed=0, hidden_size=64, intermediate_size=112,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, vocab_size=512,
                        mm_scales=1):
    """Tiny HF torch components matching a vila_tpu VLMConfig.

    mm_scales > 1 widens the projector input for dynamic-S2 checkpoints
    (feature channels concatenate across scales)."""
    import torch
    from transformers import (
        Qwen2Config,
        Qwen2ForCausalLM,
        SiglipVisionConfig,
        SiglipVisionModel,
    )

    torch.manual_seed(seed)
    llm_hf = Qwen2Config(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=num_attention_heads,
        num_key_value_heads=num_key_value_heads,
        max_position_embeddings=1024,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    llm = Qwen2ForCausalLM(llm_hf).eval()

    vis_hf = SiglipVisionConfig(
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
        attn_implementation="eager",
    )
    vit = SiglipVisionModel(vis_hf).eval()

    import torch.nn as nn

    from vila_tpu.models import projector as projector_lib

    proj_cfg = projector_lib.ProjectorConfig(
        projector_type="mlp_downsample", mm_hidden_size=48 * mm_scales,
        hidden_size=hidden_size,
    )
    from test_projector_parity import build_torch_sequential

    proj = build_torch_sequential(proj_cfg).eval()
    return llm, vit, proj, llm_hf, vis_hf, proj_cfg


def save_tiny_checkpoint(tmpdir, seed=0, top_overrides=None, **dims):
    """Write a component-layout checkpoint directory from tiny torch models.

    top_overrides merges into the top-level config.json (e.g. dynamic_s2
    flags or a TSP video_encoder hydra dict)."""
    import json
    import os

    import torch
    from safetensors.torch import save_file

    llm, vit, proj, llm_hf, vis_hf, proj_cfg = make_tiny_vlm_torch(seed, **dims)

    llm_dir = os.path.join(tmpdir, "llm")
    os.makedirs(llm_dir, exist_ok=True)
    save_file(
        {k: v.contiguous() for k, v in llm.state_dict().items()},
        os.path.join(llm_dir, "model.safetensors"),
    )
    with open(os.path.join(llm_dir, "config.json"), "w") as f:
        json.dump(llm_hf.to_dict(), f)
    make_tiny_tokenizer().save_pretrained(llm_dir)

    vt_dir = os.path.join(tmpdir, "vision_tower")
    os.makedirs(vt_dir, exist_ok=True)
    save_file(
        {k: v.contiguous() for k, v in vit.state_dict().items()},
        os.path.join(vt_dir, "model.safetensors"),
    )
    with open(os.path.join(vt_dir, "config.json"), "w") as f:
        json.dump(vis_hf.to_dict(), f)

    proj_dir = os.path.join(tmpdir, "mm_projector")
    os.makedirs(proj_dir, exist_ok=True)
    save_file(
        {f"layers.{k}": v.contiguous() for k, v in proj.state_dict().items()},
        os.path.join(proj_dir, "model.safetensors"),
    )
    with open(os.path.join(proj_dir, "config.json"), "w") as f:
        json.dump({"mm_projector_type": "mlp_downsample"}, f)

    top = {
        "model_type": "llava",
        "image_aspect_ratio": "resize",
        "num_video_frames": 4,
        "mm_vision_select_layer": -2,
        "mm_vision_select_feature": "cls_patch",
        "mm_hidden_size": proj_cfg.mm_hidden_size,
    }
    top.update(top_overrides or {})
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump(top, f)
    return llm, vit, proj
