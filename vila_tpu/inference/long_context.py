"""Long-context generation: sequence-sharded KV cache decode over a mesh.

LongVILA's point is long-context *inference*, not just training
(longvila/README.md:17 — 1M-token NIAH over multi-GPU ring attention). The
serial engine caps its KV cache at one chip's HBM; this module shards the
cache along the sequence axis of a `jax.sharding.Mesh` so context scales
with the number of chips:

  * **Chunked prefill**: the prompt streams through in fixed-size chunks;
    each chunk attends to the read-only old cache per shard (local
    online-softmax) plus its own replicated rows, merged with one
    LSE-weighted psum that rides ICI.
  * **Sharded decode**: per step the new token's q is replicated, attention
    reduces over every device's KV shard, and the new KV row lands on the
    shard owning the current fill slot.
  * **Collective-free append**: the cache is never written inside the
    layer scan — a dynamic_update_slice at a dynamic fill offset into a
    sequence-sharded dim makes GSPMD all-gather the WHOLE cache per layer
    (30 GB at the 8B/1M shape, measured by the real TPU compiler). Layers
    emit their new KV rows as scan outputs and one shard_map writes every
    layer's rows into the local shard (qwen2.forward `cache_append` mode).

Attention itself stays GSPMD/shard_map-hybrid (annotate shardings, one
psum merge) rather than a hand-written ring: decode is latency-bound on
one new token, where a one-shot psum LSE-merge beats P2P ring rotation.
The training-side ring/Ulysses kernels (parallel/ring_attention.py) remain
the throughput path for full-sequence work.

Capability parity: the inference side of
llava/eval/vision_niah_vila/eval_vision_niah.py (ring-attn decode), plus
`GenerationEngine(max_cache_len > 8192)` unlocked (r2 weak #9).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vila_tpu.models import qwen2


class LongContextEngine:
    """Generation over contexts larger than one chip's KV budget.

    seq_axes: mesh axis name(s) to shard the cache sequence dim over
    (default: every mesh axis, flattened).
    """

    def __init__(
        self,
        params: Dict[str, Any],
        llm_cfg,
        mesh,
        *,
        max_cache_len: int,
        prefill_chunk: int = 4096,
        seq_axes: Optional[Sequence[str]] = None,
        param_specs: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.params = params
        self.cfg = llm_cfg
        self.mesh = mesh
        self.seq_axes = tuple(seq_axes or mesh.axis_names)
        n_shards = 1
        for a in self.seq_axes:
            n_shards *= mesh.shape[a]
        assert max_cache_len % n_shards == 0, (max_cache_len, n_shards)
        assert max_cache_len % prefill_chunk == 0
        self.max_cache_len = max_cache_len
        self.prefill_chunk = prefill_chunk

        ax = self.seq_axes
        self._cache_shardings = {
            "k": NamedSharding(mesh, P(None, None, ax, None)),
            "v": NamedSharding(mesh, P(None, None, ax, None)),
            "valid": NamedSharding(mesh, P(None, ax)),
            "fill": NamedSharding(mesh, P()),
        }
        self._rep = NamedSharding(mesh, P())
        # Replicated params cap the model at (HBM - KV) per chip; at 8B/1M
        # the 16GB of bf16 weights alone exceed a v5e chip. FSDP-style
        # param_specs (parallel/mesh.py:llm_param_specs) shard the weights
        # over the same mesh; GSPMD all-gathers each layer's slice on use.
        if param_specs is None:
            self._param_sharding = self._rep
        else:
            self._param_sharding = jax.tree.map(
                lambda s: NamedSharding(mesh, s), param_specs,
                is_leaf=lambda x: isinstance(x, P),
            )

    def init_cache(self):
        with self.mesh:
            return jax.jit(
                lambda: qwen2.init_cache(
                    self.cfg, batch=1, max_len=self.max_cache_len
                ),
                out_shardings=self._cache_shardings,
            )()

    def _make_sharded_attend(self):
        """Deferred-append attention over the seq-sharded cache: shard_map
        runs memory-bounded local attention per device (q replicated, old
        KV local shard, cache READ-ONLY), folds in the current chunk's own
        replicated K/V rows, and merges everything with one LSE-weighted
        psum.

        Design notes:
          * Leaving this to GSPMD over `attention_xla` partitions the
            softmax but still materializes each device's (Sq, Skv/n) score
            slab — at 1M-token context that is gigabytes per layer. Local
            online-softmax + LSE merge keeps peak memory at (Sq, block)
            per device and the collective payload at one (Sq, Hq, D)
            tile, which rides ICI. Same recurrence as the training ring
            (parallel/ring_attention.py) minus the rotation — decode-side
            a one-shot psum beats P2P ring for a single chunk.
          * The chunk's rows are NOT read back from the cache: a
            dynamic_update_slice at a dynamic fill offset into the
            seq-sharded buffer makes GSPMD all-gather the whole cache per
            layer (the real TPU compiler reports a 30 GB gather at the
            8B/1M shape). The chunk K/V arrive as replicated extras
            (`new_k`/`new_v`, qwen2.forward cache_append mode), intra-
            chunk causal attention is computed identically on every
            device, and its statistics join the merge OUTSIDE the psum so
            they count once."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from vila_tpu.ops.attention import _NEG_INF, attention_blocked

        ax = self.seq_axes
        mesh = self.mesh

        def local_fn(q, k, v, qp, kvp, qs, kvs, nk, nv, nkvp, nkvs):
            acc, l, m = attention_blocked(
                q, k, v,
                causal=True,
                q_positions=qp,
                kv_positions=kvp,
                q_segment_ids=qs,
                kv_segment_ids=kvs,
                return_stats=True,
            )
            # chunk self-attention: replicated inputs, same result on
            # every device — merged once, outside the psum
            acc_c, l_c, m_c = attention_blocked(
                q, nk, nv,
                causal=True,
                q_positions=qp,
                kv_positions=nkvp,
                q_segment_ids=qs,
                kv_segment_ids=nkvs,
                return_stats=True,
            )
            m_g = jnp.maximum(jax.lax.pmax(m, ax), m_c)  # (B, Hq, Sq)
            w = jnp.exp(jnp.where(m <= _NEG_INF * 0.5, _NEG_INF, m - m_g))
            w_c = jnp.exp(
                jnp.where(m_c <= _NEG_INF * 0.5, _NEG_INF, m_c - m_g)
            )
            num = jax.lax.psum(
                acc * w.transpose(0, 2, 1)[..., None], ax
            ) + acc_c * w_c.transpose(0, 2, 1)[..., None]
            den = jax.lax.psum(l * w, ax) + l_c * w_c
            den = jnp.maximum(den, 1e-30).transpose(0, 2, 1)[..., None]
            return (num / den).astype(q.dtype)

        sharded = shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(
                P(), P(None, ax), P(None, ax),
                P(), P(None, ax), P(), P(None, ax),
                P(), P(), P(), P(),
            ),
            out_specs=P(),
            check_rep=False,
        )

        def attend(q, k, v, *, causal=True, q_positions=None,
                   kv_positions=None, q_segment_ids=None,
                   kv_segment_ids=None, new_k=None, new_v=None,
                   new_kv_positions=None, new_kv_seg=None, **_):
            assert causal and q_positions is not None
            assert new_k is not None, (
                "sharded attend requires qwen2.forward cache_append mode"
            )
            return sharded(
                q, k, v, q_positions, kv_positions,
                q_segment_ids, kv_segment_ids,
                new_k, new_v, new_kv_positions, new_kv_seg,
            )

        return attend

    def _flat_axis_index(self):
        """Linear shard index over self.seq_axes (major-to-minor, matching
        how GSPMD blocks a dim sharded over an axis tuple)."""
        ax = self.seq_axes
        sizes = [self.mesh.shape[a] for a in ax]

        def flat():
            idx = jnp.zeros((), jnp.int32)
            for a, size in zip(ax, sizes):
                idx = idx * size + jax.lax.axis_index(a)
            return idx

        return flat

    def _make_cache_append(self):
        """Collective-free append of the chunk's KV rows into the sharded
        cache: each device slices an s-row window of ITS shard around the
        global write offset, selects per row whether a new row lands there
        (handles chunks straddling a shard boundary), and writes the
        window back. Touches s rows per shard per step — the in-place
        update dynamic_update_slice would do on one chip, without the
        full-cache all-gather GSPMD inserts for a dynamic offset into a
        sharded dim."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        ax = self.seq_axes
        mesh = self.mesh
        flat_idx = self._flat_axis_index()

        def local_fn(ck, cv, valid, k_rows, v_rows, token_valid, fill):
            L, B, local_len, kvd = ck.shape
            s = k_rows.shape[2]
            # this shard's overlap with [fill, fill+s) is contiguous and at
            # most min(s, local_len) rows — one w-row window covers it even
            # when the chunk straddles several shards
            w = min(s, local_len)
            rel = fill - flat_idx() * local_len  # window start, this shard
            relc = jnp.clip(rel, 0, local_len - w)
            pos = relc + jnp.arange(w, dtype=jnp.int32)  # local slots
            src = pos - rel  # which chunk row lands at each slot
            sel = (src >= 0) & (src < s)
            srcc = jnp.clip(src, 0, s - 1)

            def write(buf, rows):
                old = jax.lax.dynamic_slice(
                    buf, (0, 0, relc, 0), (L, B, w, kvd)
                )
                new = jnp.where(
                    sel[None, None, :, None],
                    jnp.take(rows, srcc, axis=2).astype(buf.dtype),
                    old,
                )
                return jax.lax.dynamic_update_slice(
                    buf, new, (0, 0, relc, 0)
                )

            old_v = jax.lax.dynamic_slice(valid, (0, relc), (B, w))
            new_valid = jax.lax.dynamic_update_slice(
                valid,
                jnp.where(
                    sel[None, :], jnp.take(token_valid, srcc, axis=1), old_v
                ),
                (0, relc),
            )
            return write(ck, k_rows), write(cv, v_rows), new_valid

        return shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(
                P(None, None, ax, None), P(None, None, ax, None),
                P(None, ax), P(), P(), P(), P(),
            ),
            out_specs=(
                P(None, None, ax, None), P(None, None, ax, None),
                P(None, ax),
            ),
            check_rep=False,
        )

    @functools.cached_property
    def _prefill_chunk_fn(self):
        cfg = self.cfg
        attend = self._make_sharded_attend()
        append = self._make_cache_append()

        def step(params, embeds, token_valid, last, cache):
            logits, cache = qwen2.forward(
                params, cfg,
                inputs_embeds=embeds,
                token_valid=token_valid,
                cache=cache,
                gather_position=last,  # last REAL token (tail chunk is padded)
                attn_impl=attend,  # sharded memory-bounded attention
                cache_append=append,  # collective-free sharded KV write
            )
            return logits[:, 0], cache

        return jax.jit(
            step,
            donate_argnums=(4,),
            in_shardings=(
                self._param_sharding, self._rep, self._rep, self._rep,
                self._cache_shardings,
            ),
            out_shardings=(self._rep, self._cache_shardings),
        )

    @functools.cached_property
    def _decode_fn(self):
        cfg = self.cfg
        attend = self._make_sharded_attend()
        append = self._make_cache_append()

        def step(params, tok, positions, cache, steps):
            def body(carry, _):
                tok, cache, pos = carry
                logits, cache = qwen2.forward(
                    params, cfg,
                    input_ids=tok[:, None],
                    positions=pos[:, None],
                    cache=cache,
                    attn_impl=attend,
                    cache_append=append,
                )
                nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
                return (nxt, cache, pos + 1), nxt

            (tok, cache, positions), toks = jax.lax.scan(
                body, (tok, cache, positions), None, length=steps
            )
            return toks.T, tok, cache, positions

        return jax.jit(
            step,
            static_argnums=(4,),
            donate_argnums=(3,),
            in_shardings=(
                self._param_sharding, self._rep, self._rep,
                self._cache_shardings,
            ),
            out_shardings=(
                self._rep, self._rep, self._cache_shardings, self._rep
            ),
        )

    def prefill(self, embeds: jnp.ndarray, cache=None, progress=None):
        """Stream (1, S, D) prompt embeddings through in chunks. S need not
        be chunk-aligned; the tail chunk is right-padded. Returns
        (last_logits, cache, prompt_len). `progress(done, total)` is called
        after each chunk (multi-hour 1M-ctx prefills need a heartbeat)."""
        s = embeds.shape[1]
        c = self.prefill_chunk
        if cache is None:
            cache = self.init_cache()
        assert s <= self.max_cache_len, (s, self.max_cache_len)
        logits = None
        n_chunks = (s + c - 1) // c
        with self.mesh:
            for start in range(0, s, c):
                chunk = np.asarray(embeds[:, start : start + c])
                n = chunk.shape[1]
                if n < c:
                    chunk = np.pad(chunk, ((0, 0), (0, c - n), (0, 0)))
                tv = np.zeros((1, c), bool)
                tv[0, :n] = True
                logits, cache = self._prefill_chunk_fn(
                    self.params, chunk, tv, np.asarray([n - 1], np.int32),
                    cache,
                )
                if n < c:
                    # fill cursor advanced by the padded chunk; rewind
                    cache = dict(cache)
                    cache["fill"] = cache["fill"] - (c - n)
                if progress is not None:
                    jax.block_until_ready(logits)
                    progress(start // c + 1, n_chunks)
        return logits, cache, s

    def generate(
        self,
        embeds: jnp.ndarray,  # (1, S, D) prompt embeddings
        max_new_tokens: int,
        stop_ids: Sequence[int] = (),
        decode_chunk: int = 8,
        progress=None,
    ) -> List[int]:
        """Greedy generation: chunked sharded prefill + sharded decode."""
        logits, cache, s = self.prefill(embeds, progress=progress)
        first = int(jnp.argmax(logits[0]))
        stop = set(stop_ids)
        if first in stop:
            return []
        out = [first]
        if max_new_tokens <= 1:
            return out[: max_new_tokens]
        tok = np.asarray([first], np.int32)
        positions = np.asarray([s], np.int32)
        left = max_new_tokens - 1
        with self.mesh:
            while left > 0 and int(positions[0]) < self.max_cache_len:
                # bound the scan by remaining cache capacity too: each step
                # writes one KV row, and dynamic_update_slice would clamp
                # out-of-range writes into the final slot (silent cache
                # corruption) rather than failing
                steps = min(
                    decode_chunk, left, self.max_cache_len - int(positions[0])
                )
                toks, tokd, cache, posd = self._decode_fn(
                    self.params, tok, positions, cache, steps
                )
                tok = np.asarray(tokd)
                positions = np.asarray(posd)
                for t in np.asarray(toks)[0].tolist():
                    if t in stop:
                        return out
                    out.append(t)
                left -= steps
        return out
