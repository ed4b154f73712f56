"""Prompt-lookup speculative decoding — greedy-exact, fully on-device.

Capability beyond the reference: NVlabs/VILA decodes strictly one token
per forward (HF `generate` in llava_arch.py:823). Decode on TPU is
weight-HBM-bound, so a forward over (1, gamma+1) tokens costs almost the
same as (1, 1); if a draft of gamma tokens can be guessed, verifying all
of them in one forward multiplies decode throughput by the acceptance
length. Prompt-lookup decoding (PLD — the draft-model-free scheme used by
vLLM / HF `prompt_lookup_num_tokens`) guesses by n-gram match against the
tokens already seen (prompt + generated), which is highly effective for
extractive/summarization/code-edit workloads where the output quotes long
spans of the input.

TPU-native design: the whole loop — 2-gram match over the history buffer,
draft gather, (gamma+1)-token verify forward, longest-prefix acceptance,
emit — runs inside ONE jitted `lax.while_loop` with static shapes and no
host round-trips (a host-driven loop would pay the device-tunnel RTT per
iteration). Greedy-exactness: with do_sample=False the emitted stream is
bit-identical to vanilla one-token greedy decode — every emitted token is
an argmax of the same logits the vanilla loop would compute (rejected
draft positions simply waste a lane of the verify forward).

Cache discipline (no rollback machinery): the verify forward writes K/V
and valid for all gamma+1 slots at [fill, fill+gamma+1); on acceptance of
k drafts the fill cursor is re-pinned to fill+k+1. Slots between the new
fill and the old write end hold rejected-token K/V, but every subsequent
iteration writes a full (gamma+1)-wide span starting at its fill, which
always covers the polluted suffix (new_fill + gamma >= old_fill + gamma).
Attention never reads them meanwhile: `qwen2.forward` masks KV by the
`valid` slab, which the next write's `dynamic_update_slice` refreshes
over exactly the same span. On loop exit `valid` is re-masked to
[0, fill) so a later vanilla (width-1) decode or a second chunk cannot
see stale slots.

RoPE positions are carried separately from the fill cursor: after a
right-padded prefill the cache cursor sits at the PADDED prompt length
while token positions continue from the true prompt length (same split
the vanilla decode loop makes in generate.py).
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from vila_tpu.models import qwen2


def build_spec_decode(cfg_llm) -> Any:
    """Returns jitted `spec_chunk(params, cur, prev, pos, cache, hist,
    hlen, max_out, gamma)` with (cache, hist) donated.

    Shapes (batch must be 1 — the engine's streaming path):
      cur, prev: (1,) int32   last emitted / second-to-last token
      pos:       () int32     true token position of `cur`
      hist:      (1, L) int32 prompt + emitted tokens (size with a
                              >= gamma slack past the emit budget)
      hlen:      () int32     number of live history tokens
    Returns (out, out_len, cur, prev, pos, cache, hist, hlen, n_iters):
      out: (max_out + gamma,) int32 — emitted tokens, out[:out_len] live
           (may overshoot max_out by up to gamma on the last iteration;
           callers truncate).
    """

    @functools.partial(
        jax.jit,
        static_argnames=("max_out", "gamma"),
        donate_argnums=(4, 5),
    )
    def spec_chunk(params, cur, prev, pos, cache, hist, hlen,
                   *, max_out, gamma):
        b, hist_l = hist.shape
        assert b == 1, "speculative decode is a bs=1 path"
        max_len = cache["k"].shape[2]
        span = gamma + 1
        ar_span = jnp.arange(span, dtype=jnp.int32)
        j_arr = jnp.arange(hist_l - 1, dtype=jnp.int32)
        out0 = jnp.zeros((max_out + gamma,), jnp.int32)
        llm = params["llm"] if "llm" in params else params

        def cond(carry):
            cache, _, hlen, _, _, _, out_len, _, _ = carry
            return (
                (out_len < max_out)
                & (cache["fill"] + span <= max_len)
                & (hlen + span <= hist_l)
            )

        def body(carry):
            cache, hist, hlen, cur, prev, pos, out_len, out, iters = carry
            fill = cache["fill"]

            # --- draft: last 2-gram matched against history ---
            match = (
                (hist[0, :-1] == prev[0])
                & (hist[0, 1:] == cur[0])
                & (j_arr < hlen - 2)  # exclude the live 2-gram itself
            )
            idx = jnp.max(jnp.where(match, j_arr, -1))
            cols = jnp.clip(idx + 2 + ar_span[:gamma], 0, hist_l - 1)
            draft = jnp.where(idx >= 0, hist[0, cols], 0)[None, :]  # (1, g)

            # --- verify forward over [cur, draft...] in one call ---
            seq = jnp.concatenate([cur[:, None], draft], axis=1)
            logits, cache = qwen2.forward(
                llm, cfg_llm, input_ids=seq,
                positions=(pos + ar_span)[None, :],
                cache=cache,
            )
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (1, g+1)

            # --- longest accepted prefix; emit k drafts + 1 bonus ---
            acc = (preds[:, :gamma] == draft).astype(jnp.int32)
            k = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)  # (1,) in [0, g]
            draft_pad = jnp.concatenate(
                [draft, jnp.zeros((1, 1), jnp.int32)], axis=1
            )
            emit = jnp.where(ar_span[None] < k[:, None], draft_pad, preds)
            count = k[0] + 1

            # re-pin the cursor just past the last ACCEPTED written slot
            cache = dict(cache, fill=fill + count)
            hist = jax.lax.dynamic_update_slice(hist, emit, (0, hlen))
            out = jax.lax.dynamic_update_slice(out, emit[0], (out_len,))
            new_cur = emit[:, k[0]]
            new_prev = jnp.where(k[0] > 0, emit[:, jnp.maximum(k[0] - 1, 0)],
                                 cur)
            return (cache, hist, hlen + count, new_cur, new_prev,
                    pos + count, out_len + count, out, iters + 1)

        carry = (cache, hist, hlen, cur, prev, pos,
                 jnp.zeros((), jnp.int32), out0, jnp.zeros((), jnp.int32))
        (cache, hist, hlen, cur, prev, pos, out_len, out, iters) = (
            jax.lax.while_loop(cond, body, carry)
        )
        # stale-slot hygiene: later width-1 decodes never overwrite the
        # rejected suffix, so mask it out of `valid` now
        live = (
            jnp.arange(max_len, dtype=jnp.int32)[None, :] < cache["fill"]
        )
        cache = dict(cache, valid=jnp.logical_and(cache["valid"], live))
        return out, out_len, cur, prev, pos, cache, hist, hlen, iters

    return spec_chunk


def init_history(
    prompt_ids, first_token: int, length: int
) -> Tuple[Any, Any]:
    """Host helper: (hist (1, length) int32, hlen ()) for a decoded prompt
    whose first generated token is already known."""
    import numpy as np

    n = int(prompt_ids.shape[0])
    hist = np.zeros((1, length), np.int32)
    hist[0, :n] = np.asarray(prompt_ids, np.int32)
    hist[0, n] = first_token
    return jnp.asarray(hist), jnp.asarray(n + 1, jnp.int32)
